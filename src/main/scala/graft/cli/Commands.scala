package graft.cli

import graft.model.{Cf, RrdSchema}
import graft.store.{Dump, Modify, RrdStore, RrdXml}
import graft.time.AtTime
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The command surface (SURVEY.md §7 item 6;
  * /root/reference/src/rrd_tool.c:696-851 dispatch): every reference
  * command a user runs today, re-expressed over the store — results come
  * back as DataFrames / values instead of stdout text.
  *
  * {{{
  * create <path> --start <at> --step <s> DS:… RRA:…
  * update <path> [--template a:b] <time:v1:v2> …
  * fetch <path> <CF> --start <at> --end <at> [--resolution <s>]
  * xport / graphv --start --end <DEF:…|CDEF:…|…>   (GraphScript)
  * first/last/lastupdate/info/dump/restore/tune/resize/list
  * }}}
  */
final class Commands(spark: SparkSession, nowSec: Long = 0L,
    series: Seq[String] = Seq("k"), defaultKey: Seq[Any] = Seq("rrd")) {

  /** AT grammar, with plain non-negative integers accepted as epoch
    * seconds (the reference disambiguates short digit strings as
    * HHMM/dates; for an API the literal epoch is the less surprising
    * reading). A bare NEGATIVE integer is now-relative seconds, like
    * rrd_parsetime's `--start -86400` idiom — reading it as a negative
    * epoch would silently produce a pre-1970 window. */
  private def at(spec: String): Long = at(spec, AtTime.RefTimes(nowSec))
  private def at(spec: String, ref: AtTime.RefTimes): Long =
    if (spec.matches("\\d+")) spec.toLong
    else if (spec.matches("-\\d+")) nowSec + spec.toLong
    else AtTime.parse(spec, ref)

  /** rrd_proc_start_end (rrd_fetch.c:154, rrd_parsetime.c): resolve the
    * --start/--end pair where either spec may anchor on the OTHER
    * ("--start end-1h", "--end start+1h"). The self-contained spec
    * resolves first and seeds the other's reference times. Mutual
    * anchoring (--end start+… with no explicit, self-contained --start)
    * errors exactly like the reference, a malformed spec surfaces its
    * OWN parse error (never misread as cross-anchoring), and an
    * inverted window (end < start) fails fast like rrd_fetch.c:175.
    * Defaults are the reference's: end = now, start = end - span. */
  private def window(opts: Map[String, String],
      span: Long): (Long, Long) = {
    val sSpec = opts.get("start")
    val eSpec = opts.get("end")
    // Which other-end anchor does a spec need? Detected by the parser's
    // precise "start undefined"/"end undefined" signals — any OTHER
    // failure is a genuine parse error and rethrows here, attributed to
    // the spec that actually failed.
    def anchorOf(spec: String): Option[String] =
      try { at(spec); None }
      catch {
        case e: IllegalArgumentException
            if e.getMessage == "start undefined" => Some("start")
        case e: IllegalArgumentException
            if e.getMessage == "end undefined" => Some("end")
      }
    def mutual() = throw new IllegalArgumentException(
      "the start and end times cannot be specified relative to each other")
    def selfRef(which: String) = throw new IllegalArgumentException(
      s"the $which time cannot be specified relative to itself")
    val (s, e) = eSpec.flatMap(anchorOf) match {
      case Some("start") =>
        // reference semantics: the DEFAULT start is itself end-relative
        // (end - span), so an absent or end-anchored start is circular
        val sRaw = sSpec.getOrElse(mutual())
        anchorOf(sRaw) match {
          case Some("start") => selfRef("start")
          case Some(_) => mutual()
          case None => ()
        }
        val s0 = at(sRaw)
        (s0, at(eSpec.get, AtTime.RefTimes(nowSec, startSec = Some(s0))))
      case Some(_) => selfRef("end") // "--end end-…"
      case None =>
        val e0 = eSpec.map(at(_)).getOrElse(nowSec)
        val s0 = sSpec match {
          case None => e0 - span
          case Some(sp) => anchorOf(sp) match {
            case Some("start") => selfRef("start") // "--start start+…"
            case _ => at(sp, AtTime.RefTimes(nowSec, endSec = Some(e0)))
          }
        }
        (s0, e0)
    }
    // rrd_fetch.c:175 errors only on an INVERTED window; an equal pair
    // (a zero-length window) is accepted like the reference accepts it
    require(s <= e, s"start ($s) should be less than end ($e)")
    (s, e)
  }

  /** create: "--start <at> --step <sec>" + DS:/RRA: specs
    * (rrd_create.c). Repeated `--source <store>` options prefill the
    * new store's RRAs (rrd_prefill_data via [[RrdStore.createFrom]]);
    * `DS:a=b[idx]:…` specs map target DSes onto source DSes. */
  def create(path: String, args: Seq[String]): Unit = {
    // valueless flag first (parseOpts would swallow the next spec as
    // its value), like fetch does for --align-start
    val noOverwrite = args.contains("--no-overwrite") || args.contains("-O")
    val args1 = args.filterNot(a => a == "--no-overwrite" || a == "-O")
    // parseOpts keeps only the last occurrence of a repeated option;
    // --source is the one reference flag that legitimately repeats
    val sources = args1.sliding(2).collect {
      case Seq("--source", s) => s }.toSeq
    val (opts, specs0) = parseOpts(args1)
    val split = specs0.map {
      case s if s.startsWith("DS:") => graft.model.DsDef.splitMapping(s)
      case s => (s, None)
    }
    val schema = RrdSchema.parse(
      graft.model.Scaled(opts.getOrElse("step", "300"), 1L),
      opts.get("start").map(at).getOrElse(nowSec),
      split.map(_._1))
    if (sources.isEmpty) RrdStore.create(path, schema, noOverwrite)
    else {
      if (noOverwrite) RrdStore.create(path, schema, noOverwrite = true)
      RrdStore.createFrom(spark, path, schema, sources, series,
        split.collect { case (s, Some((src, idx))) if s.startsWith("DS:") =>
          s.split(":")(1) -> RrdStore.DsMapping(Some(src), idx)
        }.toMap)
    }
  }

  /** update: parse "time:v1:v2" args against the schema and ingest
    * (single implicit series = this facade's defaultKey).
    *
    * Incremental, like the reference: new samples MERGE with existing
    * RRA history via [[RrdStore.appendBatch]] (a second
    * `update path 200:2` after `update path 100:1` keeps both);
    * Holt-Winters RRAs resume from the state sidecar. */
  def update(path: String, args0: Seq[String],
      template: Option[Seq[String]] = None): Unit = {
    import spark.implicits._
    // --daemon <host:port>: forward over the line protocol instead of
    // ingesting locally (rrd_tool.c:275-307 remote mode; rrdc_update)
    val (daemon, args1) = splitDaemon(args0)
    // --skip-past-updates (rrd_update.c:675-789): silently skip
    // non-advancing samples instead of erroring; the in-order remainder
    // still ingests
    val skipPast = args1.contains("--skip-past-updates") ||
      args1.contains("-s")
    val args = args1.filterNot(a =>
      a == "--skip-past-updates" || a == "-s")
    daemon match {
      case Some(c) =>
        // the flag forwards over the line protocol (instead of being
        // silently dropped like the reference CLI does) so remote
        // default behavior keeps the reference's error-on-stale
        // semantics and `-s` keeps the local skip semantics
        try {
          val r = c.update(path, args, skipPast = skipPast)
          require(!r.isError, s"daemon UPDATE failed: ${r.text}")
        } finally c.close()
      case None =>
        val schema = RrdStore.readSchema(path)
        // the reference's per-arg gate (rrd_update.c:1416-1423): each
        // sample must advance last_up µs-STRICTLY (hence lastUpdateUs,
        // not the second-truncated form), processed in command order.
        // Without the flag a stale sample errors — but like the
        // reference, which writes each arg before parsing the next, the
        // valid PREFIX is still ingested before the error surfaces.
        var lastUs = RrdStore.lastUpdateUs(spark, path)
        val accepted = Seq.newBuilder[(String, Long, Seq[Option[Double]])]
        var err: Option[IllegalArgumentException] = None
        val it = args.iterator
        while (err.isEmpty && it.hasNext) {
          val u = graft.ingest.UpdateParser.parse(it.next(), schema,
            template, nowSec)
          if (u.tsUs > lastUs) {
            lastUs = u.tsUs
            accepted += ((defaultKey.head.toString, u.tsUs,
              schema.ds.map(d => u.values(d.name))))
          } else if (!skipPast) err = Some(new IllegalArgumentException(
            s"illegal attempt to update using time ${u.tsUs / 1000000} " +
              s"when last update time is ${lastUs / 1000000} " +
              "(minimum one second step)"))
        }
        val rows = accepted.result()
        if (rows.isEmpty) { err.foreach(throw _); return }
        val withVs = schema.ds.zipWithIndex.foldLeft(
          rows.map { case (k, ts, vs) =>
            (k, ts, vs.map(_.map(Double.box).orNull))
          }.toDF("k", "ts_us", "__vs")) { case (d, (ds, i)) =>
          d.withColumn(ds.name,
            element_at(col("__vs"), i + 1).cast("double"))
        }.drop("__vs")
        RrdStore.appendBatch(spark, path, withVs, Seq("k"), "ts_us",
          "ts_us", schema.ds.map(d => d.name -> d.name).toMap)
        err.foreach(throw _) // prefix committed, THEN the error surfaces
    }
  }

  /** Strip `--daemon <host:port>` and open the client when present
    * (the reference's remote mode forwards the command to rrdcached,
    * rrd_tool.c:275-307). */
  private def splitDaemon(args: Seq[String])
      : (Option[graft.streaming.DaemonClient], Seq[String]) =
    args.indexOf("--daemon") match {
      case -1 => (None, args)
      case i =>
        require(i + 1 < args.length, "--daemon needs <host:port>")
        val addr = args(i + 1)
        val (host, port) = addr.lastIndexOf(':') match {
          case -1 => (addr, 42217) // the reference's default port
          case j => (addr.take(j), addr.drop(j + 1).toInt)
        }
        (Some(new graft.streaming.DaemonClient(host, port)),
          args.patch(i, Nil, 2))
    }

  /** fetch <CF> --start --end [--resolution] [--align-start] → aligned
    * grid frame. `--align-start` shifts BOTH ends down by
    * `start % resolution` (window length preserved) before the usual
    * grid alignment — rrd_fetch.c:169-173. */
  def fetch(path: String, cf: String, args0: Seq[String]): DataFrame = {
    val (daemon, args) = splitDaemon(args0)
    val alignStart = args.contains("--align-start") || args.contains("-a")
    val (opts, _) = parseOpts(
      args.filterNot(a => a == "--align-start" || a == "-a"))
    val (start0, end0) = window(opts, 86400L)
    daemon match {
      case Some(c) =>
        // served remotely (rrdc_fetch): the reference aligns start/end
        // BEFORE calling rrdc_fetch (rrd_fetch.c:169-200), so
        // --align-start shifts the window here too. --resolution cannot
        // travel over the wire (rrdcached FETCH has no resolution
        // field) but still drives the alignment delta, like the CLI.
        val resR = opts.get("resolution").map(_.toLong).getOrElse(1L)
        val deltaR =
          if (alignStart) java.lang.Math.floorMod(start0, resR) else 0L
        val reply = try {
          val r = c.fetch(path, cf, start0 - deltaR, end0 - deltaR)
          require(!r.isError, s"daemon FETCH failed: ${r.text}")
          r
        } finally c.close()
        val names = reply.payload.find(_.startsWith("DSName:"))
          .map(_.stripPrefix("DSName:").trim.split("\\s+").toSeq)
          .getOrElse(Seq.empty)
        val ds = opts.getOrElse("ds", names.head)
        val di = names.indexOf(ds)
        require(di >= 0, s"daemon FETCH has no DS '$ds' (has $names)")
        import spark.implicits._
        reply.payload
          .filter(_.headOption.exists(_.isDigit))
          .map { l =>
            val parts = l.split("[:\\s]+")
            val v = parts(1 + di)
            (defaultKey.head.toString, parts(0).toLong,
              if (v == "nan") null else Double.box(v.toDouble))
          }
          .toDF(series.head, "ts", ds)
      case None =>
        val schema = RrdStore.readSchema(path)
        // the reference defaults resolution to 1 (rrd_fetch.c:74
        // step_tmp) — RRA selection still picks the finest rollup, and
        // --align-start with the default shifts by start % 1 = 0, like
        // the reference (a schema.stepSec default made align-start
        // shift when the reference would not)
        val res = opts.get("resolution").map(_.toLong).getOrElse(1L)
        val delta =
          if (alignStart) java.lang.Math.floorMod(start0, res) else 0L
        val (start, end) = (start0 - delta, end0 - delta)
        val ds = opts.getOrElse("ds", schema.ds.head.name)
        RrdStore.fetch(spark, path, Cf.parse(cf), ds, series, start, end,
          res)
    }
  }

  /** updatev (rrd_update.c:300-364): [[update]] plus the verbose
    * return — the rollup rows (re)written by THIS call, as one long
    * frame `(rra, series…, ts, <ds columns>)` (the reference's
    * `[<ts>]RRA[<cf>][<steps>]DS[<name>] = v` info tree flattened).
    * "Written by this call" = slots past the store's pre-call
    * finalized-bucket horizon, which is exactly the set appendBatch
    * recomputes and merges. */
  def updatev(path: String, args: Seq[String],
      template: Option[Seq[String]] = None): DataFrame = {
    val tailPath = s"$path/tail"
    val before =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(tailPath)))
        spark.read.parquet(tailPath)
          .agg(max("__horizon")).first().getLong(0)
      else Long.MinValue
    update(path, args, template)
    val schema = RrdStore.readSchema(path)
    val union = schema.rras.indices
      .filter(i => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/rra$i")))
      .map(i => RrdStore.readRra(spark, s"$path/rra$i")
        .withColumn("rra", lit(i)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val dsCols = schema.ds.map(_.name).filter(union.columns.contains)
    union.where(col("ts") > before)
      .select(col("rra") +: series.map(col) :+ col("ts") :++
        dsCols.map(col): _*)
  }

  /** xport/graphv data outputs via [[GraphScript]]. */
  def graphv(args0: Seq[String]): GraphScript.Result = {
    // valueless flag stripped before parseOpts (like --align-start):
    // -o/--logarithmic switches the value axis to log scale, which
    // clips non-positive painted values from the range
    val logarithmic = args0.contains("--logarithmic") || args0.contains("-o")
    val args = args0.filterNot(a => a == "--logarithmic" || a == "-o")
    val (opts, stmts) = parseOpts(args)
    val (start, end) = window(opts, 86400L)
    GraphScript.run(spark, GraphScript.parse(stmts), start, end,
      series, defaultKey, logarithmic = logarithmic)
  }

  /** xport: the tabular frame of an XPORT script (rrd_xport.c) —
    * [[graphv]]'s result narrowed to the export frame. */
  def xport(args: Seq[String]): DataFrame =
    graphv(args).xport.getOrElse(
      spark.emptyDataFrame.withColumn("ts", lit(0L)).limit(0))

  /** flushcached (rrd_flushcached.c): with `--daemon <addr>` sends a
    * FLUSH per path over the line protocol; locally a no-op by
    * construction — a micro-batch either committed or will replay from
    * the streaming checkpoint, so there is never an unflushed in-memory
    * tree. */
  def flushcached(args: Seq[String]): Unit = {
    val (daemon, paths) = splitDaemon(args)
    daemon.foreach { c =>
      try paths.foreach { p =>
        val r = c.command(s"FLUSH $p")
        require(!r.isError, s"daemon FLUSH $p failed: ${r.text}")
      } finally c.close()
    }
  }

  /** rrd_first: geometric first slot of an RRA (works on a store with
    * no data, create-from-template-1's `rrdtool first` check). */
  def first(path: String, rraIdx: Int = 0): Long =
    RrdStore.firstTime(spark, path, rraIdx)

  /** rrd_last: the raw last-update time (`--daemon` serves it
    * remotely, rrdc_command LAST). */
  def last(path: String, args: Seq[String] = Nil): Long =
    splitDaemon(args) match {
      case (Some(c), _) =>
        try {
          val r = c.last(path)
          require(!r.isError, s"daemon LAST failed: ${r.text}")
          r.payload.head.toLong
        } finally c.close()
      case _ => RrdStore.lastUpdateSec(spark, path)
    }

  /** lastupdate: newest slot's values per DS. */
  def lastupdate(path: String): DataFrame = {
    val schema = RrdStore.readSchema(path)
    val finest = schema.rras.indices.minBy(schema.rras(_).pdpCnt)
    val t = RrdStore.readRra(spark, s"$path/rra$finest")
    t.orderBy(col("ts").desc).limit(1)
  }

  /** info, optionally served remotely (`--daemon`, payload lines are
    * the same `key = value` pairs the local view renders). */
  def info(path: String, args: Seq[String] = Nil): Seq[(String, String)] =
    splitDaemon(args) match {
      case (Some(c), _) =>
        try {
          val r = c.info(path)
          require(!r.isError, s"daemon INFO failed: ${r.text}")
          r.payload.map { l =>
            val i = l.indexOf(" = ")
            l.take(i) -> l.drop(i + 3)
          }
        } finally c.close()
      case _ => Dump.info(spark, path)
    }
  def dump(path: String, out: String): Unit = Dump.dump(spark, path, out)
  def restore(in: String, path: String): Unit =
    Dump.restore(spark, in, path)
  /** Reference-format `<rrd>` XML interop (rrd_dump.c / rrd_restore.c):
    * `.xml` migration in and out of existing rrdtool deployments. */
  def dumpXml(path: String, outFile: String): Unit =
    RrdXml.dumpXml(spark, path, outFile, series)
  def restoreXml(inFile: String, path: String): Unit =
    RrdXml.restoreXml(spark, inFile, path,
      seriesKey = defaultKey.head.toString)
  def list(root: String, recursive: Boolean = false): Seq[String] =
    Dump.list(root, recursive)

  /** tune: "--heartbeat ds:s | --minimum ds:v | --maximum ds:v |
    * --data-source-type ds:DST | --data-source-rename old:new |
    * --alpha/--beta/--gamma v" (rrd_tune.c option surface; HW params
    * range-checked to (0,1) and rejected BEFORE any store change —
    * tests/tune2's out-of-range beta leaves the RRD untouched), plus
    * 1.9's modify ops as positional specs (rrd_modify.c:1311,1345,1382;
    * tests/modify1..5): `DS:<spec>` adds a DS, `DEL:<ds>` drops one,
    * `RRA:<spec>` adds an RRA (populated from siblings),
    * `DELRRA:<n>` drops one, `RRA#<n>:[+-=]<rows>` resizes one. */
  def tune(path: String, args: Seq[String]): Unit = {
    val (opts, rest) = parseOpts(args)
    rest.foreach {
      case s if s.startsWith("DEL:") => Modify.delDs(spark, path, s.drop(4))
      case s if s.startsWith("DELRRA:") =>
        Modify.delRra(path, s.drop(7).toInt)
      case s if s.startsWith("RRA#") =>
        val body = s.drop(4)
        val i = body.indexOf(':')
        val idx = body.take(i).toInt
        val spec = body.drop(i + 1)
        val cur = RrdStore.readSchema(path).rras(idx).rowCnt
        val target = spec.head match {
          case '+' => cur + spec.tail.toLong
          case '-' => cur - spec.tail.toLong
          case '=' => spec.tail.toLong
          case _ => spec.toLong
        }
        Modify.resize(spark, path, idx, target - cur, series)
      case s if s.startsWith("RRA:") => Modify.addRra(spark, path,
        graft.model.RraDef.parse(s, RrdStore.readSchema(path).stepSec),
        series)
      case s if s.startsWith("DS:") =>
        Modify.addDs(spark, path, graft.model.DsDef.parse(s))
      case other =>
        throw new IllegalArgumentException(s"unknown tune spec '$other'")
    }
    // validate every HW param before applying anything (atomic failure)
    Seq("alpha", "beta", "gamma").foreach(k => opts.get(k).foreach { v =>
      val x = v.toDouble
      require(x > 0.0 && x < 1.0, s"$k must be between 0 and 1 (got $v)")
    })
    def hwRras(pred: graft.model.Cf => Boolean): Seq[Int] =
      RrdStore.readSchema(path).rras.zipWithIndex.collect {
        case (r, i) if pred(r.cf) && r.hw.isDefined => i
      }
    opts.get("alpha").foreach { v =>
      hwRras(c => c == Cf.HwPredict || c == Cf.MhwPredict)
        .foreach(i => Modify.tuneHw(path, i)(_.copy(alpha = v.toDouble)))
    }
    opts.get("beta").foreach { v =>
      hwRras(c => c == Cf.HwPredict || c == Cf.MhwPredict)
        .foreach(i => Modify.tuneHw(path, i)(_.copy(beta = v.toDouble)))
    }
    opts.get("gamma").foreach { v =>
      hwRras(c => c == Cf.Seasonal || c == Cf.DevSeasonal)
        .foreach(i => Modify.tuneHw(path, i)(_.copy(gamma = v.toDouble)))
    }
    opts.get("aberrant-reset").foreach(_ =>
      Modify.aberrantReset(spark, path))
    def split(v: String): (String, String) = {
      val i = v.lastIndexOf(':'); (v.take(i), v.drop(i + 1))
    }
    opts.get("heartbeat").foreach { v =>
      val (ds, hb) = split(v); Modify.tuneHeartbeat(path, ds, hb.toLong)
    }
    opts.get("minimum").foreach { v =>
      val (ds, m) = split(v)
      Modify.tuneMin(path, ds, if (m == "U") None else Some(m.toDouble))
    }
    opts.get("maximum").foreach { v =>
      val (ds, m) = split(v)
      Modify.tuneMax(path, ds, if (m == "U") None else Some(m.toDouble))
    }
    opts.get("data-source-type").foreach { v =>
      val (ds, t) = split(v)
      Modify.tuneDst(path, ds, graft.model.Dst.parse(t))
    }
    opts.get("data-source-rename").foreach { v =>
      val (from, to) = split(v); Modify.renameDs(spark, path, from, to)
    }
  }

  /** resize <rra#> GROW|SHRINK <rows> with the reference verb's own
    * diagnostics (rrd_resize.c:40-81): rows must be >= 1, the RRA must
    * exist, and a SHRINK must leave at least one row. Unlike the
    * reference (which writes a new `resize.rrd`), the store resizes in
    * place — the sidecar swap in Modify.resize is already atomic. */
  def resize(path: String, rraIdx: Int, mode: String, rows: Long): Unit = {
    if (mode.toUpperCase != "GROW" && mode.toUpperCase != "SHRINK")
      throw new IllegalArgumentException("I can only GROW or SHRINK")
    if (rows < 1) throw new IllegalArgumentException(
      "Please grow or shrink with at least 1 row")
    val schema = graft.store.RrdStore.readSchema(path)
    if (rraIdx < 0 || rraIdx >= schema.rras.length)
      throw new IllegalArgumentException("no such RRA in this RRD")
    if (mode.toUpperCase == "SHRINK" && schema.rras(rraIdx).rowCnt <= rows)
      throw new IllegalArgumentException("This RRA is not that big")
    val delta = if (mode.toUpperCase == "GROW") rows else -rows
    Modify.resize(spark, path, rraIdx, delta, series)
  }

  /** The reference CLI argv form: `resize <file> <rra#> GROW|SHRINK
    * <rows>` (rrd_resize.c:33-49 — argc check, strtol parses). */
  def resize(path: String, args: Seq[String]): Unit = {
    if (args.length != 3)
      throw new IllegalArgumentException("wrong number of parameters")
    val rraIdx = try args(0).toInt catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"bad RRA index ${args(0)}") }
    val rows = try args(2).toLong catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"bad row count ${args(2)}") }
    resize(path, rraIdx, args(1), rows)
  }

  /** "--opt value" pairs split from positional args. */
  private def parseOpts(args: Seq[String]): (Map[String, String], Seq[String]) = {
    var opts = Map.empty[String, String]
    val rest = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--") && i + 1 < args.length) {
        opts += (a.drop(2) -> args(i + 1)); i += 2
      } else { rest += a; i += 1 }
    }
    (opts, rest.result())
  }
}
