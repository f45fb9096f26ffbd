package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import graft.model.Cf
import graft.store.{Dump, RrdStore}
import org.apache.spark.sql.SparkSession

/** The rrdcached serving surface (SURVEY.md §2.1 item 5;
  * /root/reference/src/rrd_daemon.c:2968-3141 command table,
  * doc/rrdcached.pod response protocol): a line-protocol front end over
  * one Spark session.
  *
  * Role split, mirroring the reference's daemon:
  *   - **UPDATE / BATCH** are journaled — each command becomes a file in
  *     the journal directory (a sibling of `root` by default, like
  *     `rrdcached -j`), which a Structured Streaming text source
  *     watches ([[StreamingIngest.runUpdates]]). The reference's journal
  *     + write-behind flush threads (rrd_daemon.c:304-329,1063-1188)
  *     are the streaming checkpoint + micro-batch cadence.
  *   - **FETCH / INFO / FIRST / LAST** are served inline from the store
  *     tables (rrd_daemon.c:2968-3141 handlers onto rrd_fetch_r etc.).
  *   - **FLUSH / PENDING** are no-ops by construction: a micro-batch
  *     either committed or will replay from the checkpoint.
  *
  * Responses follow the daemon's convention: a status line `N <text>`
  * where N ≥ 0 counts the payload lines that follow (negative = error,
  * doc/rrdcached.pod "Protocol").
  *
  * Scale note: this socket loop is the single-node convenience front
  * end (like rrdcached itself). The cluster-scale ingest path is the
  * same [[StreamingIngest.runUpdates]] query reading Kafka instead of
  * the spool directory; serving stays on the session.
  */
final class Daemon(spark: SparkSession, root: String, nowSec: Long = 0L,
    journalDir: Option[String] = None) {
  import Daemon.{Response, BinResponse}

  // the journal lives OUTSIDE the served data tree, like the
  // reference's `rrdcached -j journal_dir` (doc/rrdcached.pod) — a
  // spool under `root` would surface in LIST's directory walk
  // (rrd_list.c lists every subdirectory)
  private val spoolDir = journalDir.map(Paths.get(_)).getOrElse {
    val r = Paths.get(root).toAbsolutePath.normalize
    // a filesystem root has no file name to derive a sibling from —
    // require an explicit journal path instead of NPEing on getFileName
    require(r.getFileName != null,
      s"store root '$root' has no parent; pass journalDir explicitly")
    r.resolveSibling(s"${r.getFileName}.journal")
  }
  private val updatesReceived = new AtomicLong
  private val flushesReceived = new AtomicLong
  private val journalBytes = new AtomicLong
  // per-path last-update stamp (µs), seeded lazily from the store —
  // rrdcached's in-memory ci->last_update_stamp (rrd_daemon.c:1738-1742,
  // 1802-1810): stale samples are rejected SYNCHRONOUSLY at enqueue
  // time, not silently dropped by the downstream streaming gate
  private val lastStamps =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]
  @volatile private var ingestStats: Option[StreamingIngest.IngestStats] =
    None
  @volatile private var server: Option[ServerSocket] = None

  def spoolPath: String = spoolDir.toString

  /** Register the ingest query's write counters so STATS can report the
    * write side (pass the same [[StreamingIngest.IngestStats]] given to
    * [[StreamingIngest.runUpdates]]). */
  def attachIngest(stats: StreamingIngest.IngestStats): Unit =
    ingestStats = Some(stats)

  private def storePath(p: String): String = {
    require(!p.contains(".."), s"path '$p' escapes the root")
    s"$root/$p"
  }

  /** Shared FETCH/FETCHBIN argument parse + window fetch (the
    * reference's handle_request_fetch_parse): (start, end, step,
    * ds names, ts-ordered rows). */
  private def fetchParsed(cmd: LineProtocol.Command)
      : (Long, Long, Long, Seq[String], Array[org.apache.spark.sql.Row]) = {
    val path = storePath(cmd.path)
    val cf = Cf.parse(cmd.args.headOption.getOrElse("AVERAGE"))
    val end = cmd.args.lift(2).map(_.toLong).getOrElse(nowSec)
    val start = cmd.args.lift(1).map(_.toLong).getOrElse(end - 86400)
    val schema = RrdStore.readSchema(path)
    val dss = if (cmd.args.length > 3) cmd.args.drop(3)
      else schema.ds.map(_.name)
    // display-sized by protocol semantics, but nothing stops a client
    // requesting a year at 1-second resolution — the same pre-flight
    // cap as Xport.collect (worst case: the finest RRA's step)
    // a nonpositive schema step is a corrupt store: refuse rather than
    // bypass the cap
    require(schema.stepSec > 0, s"corrupt store: step ${schema.stepSec}")
    require(
      (end - start) / schema.stepSec <= graft.query.Xport.MaxCollectRows,
      s"FETCH window of ${(end - start) / schema.stepSec} rows exceeds " +
        s"the daemon reply cap ${graft.query.Xport.MaxCollectRows} — narrow " +
        "the window or fetch a coarser-step RRA")
    val f = RrdStore.fetchAll(spark, path, cf, dss, Seq("k"),
        start, end, schema.stepSec)
      .orderBy("ts").collect()
    val step = if (f.length >= 2)
      f(1).getLong(1) - f(0).getLong(1) else schema.stepSec
    (f.headOption.map(_.getLong(1) - step).getOrElse(start),
      f.lastOption.map(_.getLong(1)).getOrElse(end), step, dss, f)
  }

  /** Execute a FETCHBIN with real binary framing (direct connections;
    * [[handle]] routes here so raw bytes never pass through the text
    * renderer). Column-major per-DS buffers like the reference's
    * per-field dbuffer loop; unknowns are NaN doubles. */
  def executeFetchBin(line: String): Either[Response, BinResponse] = try {
    val cmd = LineProtocol.parse(line)
    require(cmd.verb == "FETCHBIN", s"not a FETCHBIN: ${cmd.verb}")
    val (s0, e0, step, dss, f) = fetchParsed(cmd)
    val header = Seq("FlushVersion: 1", s"Start: $s0", s"End: $e0",
      s"Step: $step", s"DSCount: ${dss.length}")
    val parts = dss.zipWithIndex.map { case (ds, i) =>
      val bb = java.nio.ByteBuffer.allocate(f.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      f.foreach(r => bb.putDouble(
        if (r.isNullAt(2 + i)) Double.NaN else r.getDouble(2 + i)))
      (s"DSName-$ds: BinaryData ${f.length} 8 LITTLE", bb.array())
    }
    Right(BinResponse(header.length + parts.length, "Success",
      header, parts))
  } catch {
    case e: Exception => Left(Response(-1,
      Option(e.getMessage).getOrElse(e.toString)
        .linesIterator.mkString(" ")))
  }

  /** Journal an UPDATE command: one atomically-created spool file per
    * command (the text file source picks up whole new files only). */
  private def spool(line: String): Response = {
    Files.createDirectories(spoolDir)
    val tmp = spoolDir.resolve(s".${java.util.UUID.randomUUID}.tmp")
    Files.write(tmp, (line + "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, spoolDir.resolve(s"${System.nanoTime}-" +
      s"${updatesReceived.incrementAndGet}.cmds"),
      StandardCopyOption.ATOMIC_MOVE)
    journalBytes.addAndGet(line.length + 1L)
    Response(0, "errors, enqueued by the streaming journal")
  }

  /** Execute one protocol line (everything except BATCH framing, which
    * [[serve]] handles inline). */
  def execute(line: String): Response = try {
    val cmd = LineProtocol.parse(line)
    cmd.verb match {
      case "UPDATE" =>
        // our protocol extension: a leading --skip-past-updates/-s
        // (forwarded by the CLI's --daemon path) opts into the local
        // `-s` semantics — silently skip non-advancing samples. Without
        // it, match rrdcached's enqueue-time gate (rrd_daemon.c:1802):
        // the valid prefix spools, then the stale sample errors.
        val skipPast = cmd.args.headOption
          .exists(a => a == "--skip-past-updates" || a == "-s")
        val vals = if (skipPast) cmd.args.tail else cmd.args
        // keyed by the NORMALIZED store path: two spellings of the same
        // store must share one stamp, or a stale sample accepted via the
        // second spelling is silently dropped downstream instead of
        // erroring here
        val last = lastStamps.computeIfAbsent(storePath(cmd.path), p =>
          new AtomicLong(
            try RrdStore.lastUpdateUs(spark, p)
            catch { case _: Exception => 0L }))
        // the in-memory stamp advances only AFTER the spool write
        // succeeds — advancing first would blackhole every retry of the
        // same samples when the spool throws (disk full): the lock spans
        // gate + spool so concurrent updates serialize per store, same
        // as rrdcached's per-cache_item mutex
        val (r, stale) = last.synchronized {
          var cur = last.get
          val acc = Seq.newBuilder[String]
          var firstStale: Option[Long] = None
          vals.foreach { v =>
            val ts = graft.ingest.UpdateParser
              .parseTime(v.takeWhile(_ != ':'), nowSec)
            if (ts > cur) {
              // without -s the reference stops at the first stale sample
              // (rrd_daemon.c:1802 goto done) — later in-order samples
              // are NOT enqueued; with -s each is judged independently
              if (skipPast || firstStale.isEmpty) { cur = ts; acc += v }
            } else if (firstStale.isEmpty) firstStale = Some(ts)
          }
          val accepted = acc.result()
          val resp = if (accepted.nonEmpty)
            spool((s"UPDATE ${cmd.path}" +: accepted).mkString(" "))
          else Response(0, "errors, nothing new to enqueue")
          last.set(cur) // spool succeeded (spool throws -> no advance)
          (resp, firstStale)
        }
        stale match {
          case Some(ts) if !skipPast => Response(-1,
            s"illegal attempt to update using time ${ts / 1000000} when " +
              s"last update time is ${last.get / 1000000} " +
              "(minimum one second step)")
          case _ => r
        }
      case "FLUSH" =>
        flushesReceived.incrementAndGet()
        Response(0, s"Nothing to flush: ${cmd.path}.")
      case "FLUSHALL" =>
        // rrd_daemon.c:1530-1540: trigger writing of ALL pending
        // updates, return immediately. Journaled spool files are the
        // pending set; the streaming query drains them on its own
        // cadence, so the trigger is (like FLUSH) already satisfied.
        flushesReceived.incrementAndGet()
        Response(0, "Started flush.")
      case "WROTE" =>
        // journal-replay marker (rrd_daemon.c:2277-2300, context
        // JOURNAL): "this file's accumulated values were flushed before
        // the crash — discard them during replay". Our replay is the
        // streaming checkpoint: consumed spool files are deleted
        // (cleanSource=delete), so the discard has already happened by
        // construction; acknowledge for replay-stream compatibility.
        Response(0, s"Nothing to discard: ${cmd.path} (checkpointed)")
      case "PENDING" => Response(0, s"updates pending")
      case "FORGET" => Response(0, s"Gone!")
      case "PING" => Response(0, "PONG") // rrd_daemon.c:3325-3330
      case "DUMP" =>
        // rrd_daemon.c:1842-1891 relays rrd_dump_cb_r's XML over the
        // socket; the reference then closes the connection to mark the
        // end — under the line protocol the N-line payload frame
        // already delimits it, so the connection stays usable.
        val xml = graft.store.RrdXml
          .dumpXmlString(spark, storePath(cmd.path))
          .linesIterator.toSeq
        Response(xml.size, s"Dump of ${cmd.path} follows", xml)
      case "QUEUE" =>
        // rrd_daemon.c's QUEUE: one "<pending-updates> <path>" line per
        // queued file; here the queue is the journal, one file per
        // spooled UPDATE command. The streaming source consumes/deletes
        // spool files concurrently, so a file listed a moment ago may be
        // gone by the read — skip it (it is no longer queued) instead of
        // failing the whole reply; sort for a deterministic payload.
        val counts =
          if (Files.exists(spoolDir))
            scala.jdk.CollectionConverters.IteratorHasAsScala(
              Files.list(spoolDir).iterator).asScala
              .filter(_.toString.endsWith(".cmds"))
              .flatMap { f =>
                try Some(LineProtocol.parse(new String(
                  Files.readAllBytes(f), StandardCharsets.UTF_8).trim).path)
                catch { case _: Exception => None }
              }
              .toSeq.groupBy(identity).view.mapValues(_.size)
              .toSeq.sortBy(_._1)
          else Seq.empty
        Response(counts.size, "in queue",
          counts.map { case (p, n) => s"$n $p" })
      case "SUSPEND" | "RESUME" | "SUSPENDALL" | "RESUMEALL" =>
        // flush throttling has no analog under streaming-journal
        // ingestion (there is no per-file write-behind tree to pause);
        // acknowledged for client parity like FLUSH
        Response(0, s"${cmd.verb} acknowledged")
      case "HELP" =>
        val verbs = Seq("UPDATE", "FETCH", "FETCHBIN", "CREATE", "TUNE",
          "INFO", "FIRST", "LAST", "FLUSH", "FLUSHALL", "WROTE", "PENDING",
          "FORGET", "QUEUE", "LIST", "STATS", "BATCH", "SUSPEND", "RESUME",
          "SUSPENDALL", "RESUMEALL", "PING", "DUMP", "HELP", "QUIT")
        Response(verbs.size, "Command overview", verbs)
      case "FIRST" =>
        val idx = cmd.args.headOption.map(_.toInt).getOrElse(0)
        val ts = RrdStore.firstTime(spark, storePath(cmd.path), idx)
        Response(1, "First UPDATE time", Seq(ts.toString))
      case "LAST" =>
        // true last_up (rrd_last): newest RAW sample from the ingest
        // tail, finest rollup slot for tail-less stores
        val ts = RrdStore.lastUpdateSec(spark, storePath(cmd.path))
        Response(1, "Last UPDATE time", Seq(ts.toString))
      case "INFO" =>
        val kv = Dump.info(spark, storePath(cmd.path))
        Response(kv.size, s"Info for ${cmd.path}",
          kv.map { case (k, v) => s"$k = $v" })
      case "FETCH" =>
        val (s0, e0, step, dss, f) = fetchParsed(cmd)
        val header = Seq(s"FlushVersion: 1",
          s"Start: $s0", s"End: $e0",
          s"Step: $step", s"DSCount: ${dss.length}",
          s"DSName: ${dss.mkString(" ")}")
        val rows = f.map { r =>
          val vs = dss.indices.map(i =>
            if (r.isNullAt(2 + i)) "nan" else r.getDouble(2 + i).toString)
          s"${r.getLong(1)}: ${vs.mkString(" ")}"
        }
        Response(header.length + rows.length,
          s"Success (${rows.length} rows)", header ++ rows.toSeq)
      case "FETCHBIN" =>
        // inside BATCH (or any text-only context) the binary framing
        // cannot ride the line protocol — degrade to FETCH's text form;
        // direct connections get the real framing via executeFetchBin
        execute(line.replaceFirst("(?i)FETCHBIN", "FETCH"))
      case "CREATE" =>
        // CREATE <file> [-b start] [-s step] [-O] DS:... RRA:...
        // (rrd_daemon.c:3119-3127; AT syntax deliberately not accepted)
        var (start, step, noOverwrite) = (nowSec, 300L, false)
        val specs = Seq.newBuilder[String]
        var i = 0
        while (i < cmd.args.length) {
          cmd.args(i) match {
            case "-b" => start = cmd.args(i + 1).toLong; i += 2
            case "-s" =>
              step = graft.model.Scaled(cmd.args(i + 1), 1L); i += 2
            case "-O" => noOverwrite = true; i += 1
            case spec => specs += spec; i += 1
          }
        }
        RrdStore.create(storePath(cmd.path),
          graft.model.RrdSchema.parse(step, start, specs.result()),
          noOverwrite)
        // a re-created store starts empty: drop the cached stamp or the
        // old store's last-update time would reject valid new samples
        lastStamps.remove(storePath(cmd.path))
        Response(0, s"RRD created OK (${cmd.path})")
      case "TUNE" =>
        // TUNE <file> --heartbeat ds:s | --minimum ds:v | ... —
        // delegate to the command facade's tune surface
        new graft.cli.Commands(spark, nowSec)
          .tune(storePath(cmd.path), cmd.args)
        Response(0, s"Tuned ${cmd.path}")
      case "LIST" =>
        val tokens = cmd.path +: cmd.args
        val sub = tokens.filterNot(_ == "RECURSIVE")
          .find(_.startsWith("/")).getOrElse("/")
        val base = if (sub == "/") root else storePath(sub.drop(1))
        val names = Dump.list(base, tokens.contains("RECURSIVE"))
        Response(names.size, "RRDs", names)
      case "STATS" =>
        // the reference's nine counters (doc/rrdcached.pod:652-672),
        // mapped onto the streaming architecture: the write queue is the
        // unconsumed spool (exact when the file source runs with
        // cleanSource=delete, cumulative journal size otherwise); the
        // daemon's AVL file tree is the store directory tree; journal
        // rotation is micro-batch checkpoint commits
        val spooled =
          if (Files.exists(spoolDir))
            Files.list(spoolDir).filter(_.toString.endsWith(".cmds"))
              .count()
          else 0L
        val stores = Dump.list(root, recursive = true)
        val depth = (0L +: stores.map(
          _.count(_ == '/').toLong + 1L)).max
        val w = ingestStats
        val stats = Seq(
          s"QueueLength: $spooled",
          s"UpdatesReceived: ${updatesReceived.get}",
          s"FlushesReceived: ${flushesReceived.get}",
          s"UpdatesWritten: ${w.map(_.updatesWritten.get).getOrElse(0L)}",
          s"DataSetsWritten: ${w.map(_.dataSetsWritten.get).getOrElse(0L)}",
          s"TreeNodesNumber: ${stores.size}",
          s"TreeDepth: $depth",
          s"JournalBytes: ${journalBytes.get}",
          s"JournalRotate: ${w.map(_.journalRotate.get).getOrElse(0L)}")
        Response(stats.length, "Statistics follow", stats)
      case "QUIT" => Response(-1, "closing connection")
      case other => Response(-1, s"Unknown command: $other")
    }
  } catch {
    case e: Exception => Response(-1, s"error: ${e.getMessage}")
  }

  /** Start the accept loop; returns the bound port (pass 0 for an
    * ephemeral one). One thread per connection — the daemon is a
    * convenience front end, not the cluster ingest path. */
  def start(port: Int = 0): Int = {
    val ss = new ServerSocket(port)
    server = Some(ss)
    val t = new Thread(() => {
      try while (!ss.isClosed) {
        val sock = ss.accept()
        new Thread(() => handle(sock), "graft-daemon-conn").start()
      } catch { case _: java.net.SocketException => () /* closed */ }
    }, "graft-daemon-accept")
    t.setDaemon(true)
    t.start()
    ss.getLocalPort
  }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    // raw byte stream, not a Writer: FETCHBIN interleaves binary blobs
    // with the text lines, and a charset encoder would mangle them
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    def writeText(s: String): Unit = {
      out.write(s.getBytes(StandardCharsets.UTF_8))
      out.flush()
    }
    try {
      var batch: Option[Vector[String]] = None
      var line = in.readLine()
      while (line != null) {
        val trimmed = line.trim
        (batch, trimmed) match {
          case (None, "BATCH") =>
            batch = Some(Vector.empty)
            writeText(Response(0, "Go ahead.  End with dot '.'.").render)
          case (Some(cmds), ".") =>
            val errs = cmds.zipWithIndex.flatMap { case (c, i) =>
              val r = execute(c)
              if (r.status < 0) Seq(s"${i + 1} ${r.text}") else Nil
            }
            writeText(Response(errs.size, "errors", errs).render)
            batch = None
          case (Some(cmds), c) => batch = Some(cmds :+ c)
          case (None, "QUIT") | (None, "") =>
            sock.close(); return
          case (None, c) if c.toUpperCase.startsWith("FETCHBIN") =>
            executeFetchBin(c) match {
              case Right(b) => b.write(out)
              case Left(r) => writeText(r.render)
            }
          case (None, c) =>
            writeText(execute(c).render)
        }
        line = if (sock.isClosed) null else in.readLine()
      }
    } catch { case _: java.io.IOException => () }
    finally if (!sock.isClosed) sock.close()
  }

  def stop(): Unit = { server.foreach(_.close()); server = None }
}

object Daemon {
  final case class Response(status: Int, text: String,
      payload: Seq[String] = Nil) {
    def render: String =
      (s"$status $text" +: payload).mkString("", "\n", "\n")
  }

  /** FETCHBIN reply (rrd_daemon.c handle_request_fetchbin +
    * add_binary_response_info): text header lines, then per-DS a
    * `DSName-<ds>: BinaryData <records> <rsize> <endian>` line followed
    * by the raw little-endian doubles and one `\n`. The status count is
    * header + one line per binary part (the blob belongs to its header
    * line), matching the reference's `field_cnt + 5`. */
  final case class BinResponse(status: Int, text: String,
      header: Seq[String], parts: Seq[(String, Array[Byte])]) {
    def write(os: java.io.OutputStream): Unit = {
      val head = (s"$status $text" +: header).mkString("", "\n", "\n")
      os.write(head.getBytes(StandardCharsets.UTF_8))
      parts.foreach { case (h, bytes) =>
        os.write((h + "\n").getBytes(StandardCharsets.UTF_8))
        os.write(bytes)
        os.write('\n')
      }
      os.flush()
    }
  }
}
