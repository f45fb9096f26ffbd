package graft.store

import java.nio.file.{Files, Paths}

import graft.ingest.{Consolidate, Normalize, Rates}
import graft.model.{Cf, Dst, RraDef, RrdSchema}
import graft.query.Fetch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Materialized RRA store — the write side of the engine (SURVEY.md §2.2
  * "write to RRAs"; /root/reference/src/rrd_update.c:2333-2463 for the
  * row writes, rrd_create.c for the schema, rrd_fetch.c:344-441 for the
  * read-side RRA selection).
  *
  * One logical "RRD" = one directory:
  * {{{
  *   <path>/schema.rrd   create-spec lines: "step start" + DS:… + RRA:…
  *   <path>/rra<i>/      parquet rollup of RRA i: series cols + ts
  *                       (end-labeled epoch sec) + <ds> value columns
  * }}}
  *
  * Mapping the circular file to append storage (SURVEY §1.4): RRAs are
  * plain keyed tables; the cursor disappears, and the `row_cnt` retention
  * becomes a *time horizon* relative to each series' newest slot —
  * enforced as a read-time filter by [[fetch]] and made physical by
  * [[compact]]. On Delta the same pair is `DELETE WHERE` + `OPTIMIZE`.
  *
  * Scale design: [[update]] runs rate conversion (one window per series),
  * PDP normalization (bounded explode + one hash agg) and one CF
  * aggregation per RRA — each RRA append is a single shuffle keyed by
  * (series, slot); nothing is collected to the driver. Re-running update
  * overwrites each RRA table with newly consolidated data (idempotent
  * batch semantics); incremental micro-batches would instead append and
  * rely on compact() — both shapes keep the same table layout.
  */
object RrdStore extends Serializable {

  /** Write the schema sidecar (create; overwrite = destroy + recreate;
    * `noOverwrite` refuses an existing store — the --no-overwrite flag,
    * tests/create-no-overwrite). */
  def create(path: String, schema: RrdSchema,
      noOverwrite: Boolean = false): Unit = {
    val dir = Paths.get(path)
    if (noOverwrite && Files.exists(dir.resolve("schema.rrd")))
      throw new IllegalStateException(
        s"creating '$path': File exists (--no-overwrite)")
    Files.createDirectories(dir)
    val lines = Seq(s"${schema.stepSec} ${schema.startSec}") ++
      schema.ds.map(d => d.dst match {
        case Dst.Compute => s"DS:${d.name}:COMPUTE:${d.rpn.get}"
        case t => s"DS:${d.name}:${t.name}:${d.heartbeatSec}:" +
          s"${d.min.map(_.toString).getOrElse("U")}:" +
          s"${d.max.map(_.toString).getOrElse("U")}"
      }) ++
      schema.rras.map { r =>
        r.cf match {
          case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
            s"RRA:${r.cf.name}:${r.xff}:${r.pdpCnt}:${r.rowCnt}"
          case Cf.HwPredict | Cf.MhwPredict =>
            val h = r.hw.get
            s"RRA:${r.cf.name}:${r.rowCnt}:${h.alpha}:${h.beta}:${h.period}:" +
              s"${h.gamma}:${h.deltaPos}:${h.deltaNeg}:${h.failThreshold}:" +
              s"${h.windowLen}:${h.smoothingWindow}"
          case Cf.Seasonal | Cf.DevSeasonal =>
            val h = r.hw.get
            s"RRA:${r.cf.name}:${h.period}:${h.gamma}:1"
          case Cf.DevPredict => s"RRA:DEVPREDICT:${r.rowCnt}:1"
          case Cf.Failures =>
            val h = r.hw.get
            s"RRA:FAILURES:${r.rowCnt}:${h.failThreshold}:${h.windowLen}:1"
        }
      }
    Files.write(dir.resolve("schema.rrd"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  def readSchema(path: String): RrdSchema = {
    val lines = new String(
      Files.readAllBytes(Paths.get(path, "schema.rrd")), "UTF-8")
      .linesIterator.toSeq
    val Array(step, start) = lines.head.split(" ")
    RrdSchema.parse(step.toLong, start.toLong, lines.tail)
  }

  /** Ingest a batch of samples and (re)materialize every RRA rollup.
    *
    * @param samples  one row per sample
    * @param series   series key columns (the "file" identity)
    * @param tsUs     epoch-µs column; `tieBreak` orders equal timestamps
    * @param dsValues DS name → sample value column (COMPUTE DSes take
    *                 their RPN inputs from the other DSes' rates)
    */
  /** The reference's create initializes `last_up = --start`
    * (rrd_create.c), so the FIRST update after create measures its
    * interval against the create time instead of being an unknowable
    * first sample — `tests/vformatter1` expects one update on a fresh
    * GAUGE store to already yield a known PDP. Re-expressed as data: a
    * virtual all-unknown sample at startSec anchors each new series'
    * lag chain (GAUGE/ABSOLUTE become known if within heartbeat;
    * COUNTER-family rates still need a known previous VALUE and stay
    * unknown). Samples at or before startSec are dropped, exactly the
    * reference's `t <= last_up` gate for the first update. */
  private def seedStart(schema: RrdSchema, samples: DataFrame,
      series: Seq[String], tsUs: String,
      existingKeys: Option[DataFrame]): DataFrame = {
    val startUs = schema.startSec * 1000000L
    val live = samples.where(col(tsUs) > startUs)
    val keys0 = live.select(series.map(col): _*).distinct()
    val keys = existingKeys.fold(keys0)(ek =>
      keys0.join(ek.select(series.map(col): _*).distinct(),
        series, "left_anti"))
    val seed = samples.columns.foldLeft(keys) { (df, c) =>
      if (series.contains(c)) df
      else if (c == tsUs) df.withColumn(c, lit(startUs))
      else df.withColumn(c, lit(null).cast(samples.schema(c).dataType))
    }.select(samples.columns.toIndexedSeq.map(col): _*)
    live.unionByName(seed)
  }

  def update(spark: SparkSession, path: String, samples: DataFrame,
      series: Seq[String], tsUs: String, tieBreak: String,
      dsValues: Map[String, String],
      rateScale: Option[Int] = None): Unit = {
    val schema = readSchema(path)
    val seeded = seedStart(schema, samples, series, tsUs, None)
    // cache the SAMPLE-sized rated frame (one row per sample, windows
    // already run); every RRA consolidates from it. The PDP frame
    // itself is NOT cached: it is grid-sized (samples × gap/step — 128×
    // the sample count on sparse series) and materializing it evicted
    // everything else from the block store, while recomputing it is one
    // cheap map-side explode over this cache per consumer.
    val rated = ratedFrame(schema, seeded, series, tsUs, tieBreak,
      dsValues).persist()
    val pdp = pdpFrame(schema, rated, series, tsUs, rateScale)
    // 3. per-RRA consolidation + append. A HWPREDICT/MHWPREDICT RRA and
    // its contingent SEASONAL/DEVSEASONAL/DEVPREDICT/FAILURES rows (the
    // standard creation layout, rrd_create.c:1168-1245) materialize from
    // ONE HoltWinters pass per DS — the chain is a single recurrence.
    val hwFamily: Map[Cf, String] = Map(
      Cf.Seasonal -> "seasonal", Cf.DevSeasonal -> "devseasonal",
      Cf.DevPredict -> "devpredict", Cf.Failures -> "failures")
    // the plain-CF materializations are independent reads of the same
    // cache — submit them as concurrent jobs so a cluster's executors
    // stay busy through each one's small final stages (sequential
    // submission serializes the idle tails); SparkContext is
    // thread-safe for this by design
    val plainWrites = schema.rras.zipWithIndex.collect {
      case (rra, i)
          if Set[Cf](Cf.Average, Cf.Min, Cf.Max, Cf.Last)(rra.cf) =>
        concurrent.Future {
          plainRraFrame(schema, rra, pdp, series)
            .write.mode("overwrite").parquet(s"$path/rra$i")
        }(concurrent.ExecutionContext.global)
    }
    var familyWritten = Set.empty[Int]
    schema.rras.zipWithIndex.foreach { case (rra, i) =>
      rra.cf match {
        case Cf.Average | Cf.Min | Cf.Max | Cf.Last => () // running above
        case Cf.HwPredict | Cf.MhwPredict =>
          val h = rra.hw.get
          val spec = graft.hw.HoltWinters.HwSpec(h.alpha, h.beta,
            h.period.toInt, h.gamma, h.gamma,
            multiplicative = rra.cf == Cf.MhwPredict,
            deltaPos = h.deltaPos, deltaNeg = h.deltaNeg,
            failThreshold = h.failThreshold, windowLen = h.windowLen,
            smoothingWindow = h.smoothingWindow)
          // contingent members = the immediately following family CFs
          val members = ("hwpredict" -> i) +: schema.rras.zipWithIndex
            .drop(i + 1)
            .takeWhile(r => hwFamily.contains(r._1.cf))
            .map(r => hwFamily(r._1.cf) -> r._2)
          // ONE resumable pass per DS yields both the member rows AND
          // the recurrence state sidecar (a batch-built store must
          // continue ingesting via appendBatch — streaming HW); an
          // empty prior makes applyResumable identical to the full run
          // (StoreStreamingSpec: chunked == whole)
          val perDs = schema.ds.map { d =>
            val g = gridFill(pdp, series, s"pdp_${d.name}", schema.stepSec)
              .select(series.map(col) :+ col("pdp_ts").as("ts") :+
                col(s"pdp_${d.name}").as("v"): _*)
            val empty = spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](),
              graft.hw.HoltWinters.stateSchema(series.map(g.schema(_))))
            val (rows, states) = graft.hw.HoltWinters.applyResumable(
              g, series, "ts", "v", spec, empty, schema.stepSec)
            (d.name, rows.persist(), states)
          }
          // ONE n-way join carries every member column of every DS
          // (identical (series, ts) sets per DS); the per-member writes
          // are then projections of it
          val joined = perDs.map { case (ds, rows, _) =>
            rows.select(series.map(col) :+ col("ts") :++
              members.map { case (m, _) => col(m).as(s"${m}__$ds") }: _*)
          }.reduce(_.join(_, series :+ "ts", "outer"))
          members.foreach { case (member, idx) =>
            joined.select(series.map(col) :+ col("ts") :++
                perDs.map { case (ds, _, _) =>
                  col(s"${member}__$ds").as(ds) }: _*)
              .write.mode("overwrite").parquet(s"$path/rra$idx")
          }
          perDs.foreach { case (ds, rows, states) =>
            writeSwap(states, s"$path/hwstate/rra$i/$ds")
            rows.unpersist()
          }
          familyWritten ++= members.map(_._2)
        case _ if familyWritten.contains(i) => () // written with its family
        case other =>
          throw new IllegalArgumentException(
            s"RRA $i ($other) has no preceding HWPREDICT to depend on")
      }
    }
    plainWrites.foreach(f =>
      concurrent.Await.result(f, concurrent.duration.Duration.Inf))
    rated.unpersist()
  }

  /** Stage 1 of the reference's update dataflow: per-DS rate conversion
    * over the sample frame (plain DSTs first, then COMPUTE over them) —
    * series cols + `tsUs` + one `rate_<ds>` column per DS. One row per
    * SAMPLE, windows already evaluated: this is the frame worth
    * caching. */
  private def ratedFrame(schema: RrdSchema, samples: DataFrame,
      series: Seq[String], tsUs: String, tieBreak: String,
      dsValues: Map[String, String]): DataFrame = {
    val (computeDs, plainDs) = schema.ds.partition(_.dst == Dst.Compute)
    val rated0 = plainDs.foldLeft(samples) { (df, d) =>
      Rates.withRate(df, series, tsUs, tieBreak, dsValues(d.name), d)
        .withColumnRenamed("rate", s"rate_${d.name}")
    }
    computeDs.foldLeft(rated0) { (df, d) =>
      Rates.withComputeRate(df,
        plainDs.map(p => p.name -> s"rate_${p.name}").toMap, d,
        out = s"rate_${d.name}")
    }
  }

  /** Stage 2: PDP normalization of a [[ratedFrame]] — series cols +
    * `pdp_ts` + one `pdp_<ds>` column per DS. ALL DS columns normalize
    * in one [[Normalize.pdpAll]] pass: the per-DS form exploded the
    * same grid once per DS and outer-joined grid-sized frames (one full
    * shuffle per DS); the combined pass is one explode, one
    * sample-sized edge aggregation, no join, identical rows. */
  private def pdpFrame(schema: RrdSchema, rated: DataFrame,
      series: Seq[String], tsUs: String,
      rateScale: Option[Int]): DataFrame =
    Normalize.pdpAll(rated, series, tsUs,
        schema.ds.map(d => s"rate_${d.name}" -> s"pdp_${d.name}"),
        schema.stepSec, rateScale)
      .select(series.map(col) :+ col("pdp_ts") :++
        schema.ds.map(d => col(s"pdp_${d.name}")): _*)

  /** Consolidate one plain-CF RRA from the PDP frame: series cols +
    * `ts` (end-labeled sec) + one value column per DS — all DS columns
    * in one [[Consolidate.cdpAll]] aggregation (the per-DS form joined
    * bucket-grained frames once per DS). */
  private def plainRraFrame(schema: RrdSchema, rra: RraDef, pdp: DataFrame,
      series: Seq[String]): DataFrame =
    Consolidate.cdpAll(pdp, series, "pdp_ts",
        schema.ds.map(d => s"pdp_${d.name}" -> d.name),
        schema.stepSec, rra.pdpCnt, rra.cf, rra.xff)
      .withColumnRenamed("cdp_ts", "ts")

  /** Per-target intra-JVM lock serializing the old-aside/move-in swap
    * protocol against read-path crash recovery: without it a concurrent
    * reader's [[recoverLeftovers]] can observe the transient
    * dst-missing/old-present state of an in-flight swap and "recover"
    * the .old dir back, making the writer's final move throw. Keyed by
    * normalized absolute path. Cross-PROCESS exclusion is the
    * deployment's single-writer contract (the reference holds the same
    * contract via rrdcached owning the file). */
  private val swapLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private[store] def withSwapLock[T](target: String)(f: => T): T = {
    val key = Paths.get(target).toAbsolutePath.normalize.toString
    swapLocks.computeIfAbsent(key, _ => new Object).synchronized(f)
  }

  /** Replace directory `target` with `tmp` in one rename pair (write the
    * final data ONCE, then swap — the round-2 write-read-rewrite dance
    * doubled the IO and had a crash window with no surviving copy). */
  private[store] def swapInto(tmp: String, target: String): Unit =
    withSwapLock(target) {
      val (t, g) = (Paths.get(tmp), Paths.get(target))
      val old = Paths.get(target + ".old")
      // a leftover .old with no target is the sole copy from a crashed
      // earlier swap — it is about to be replaced by `tmp` anyway, but
      // never hard-delete it while it is the only copy standing
      if (Files.exists(old) && !Files.exists(g)) Files.move(old, g)
      deleteRecursively(old)
      if (Files.exists(g)) Files.move(g, old)
      Files.move(t, g)
      deleteRecursively(old)
    }

  /** Write `df` next to `target`, then atomically swap it in. Safe when
    * `df` READS from `target` (the write hits the sibling tmp dir). */
  private[store] def writeSwap(df: DataFrame, target: String): Unit = {
    val tmp = target + ".next"
    df.write.mode("overwrite").parquet(tmp)
    swapInto(tmp, target)
  }

  /** Slots per time-bucket partition of an appendBatch-maintained RRA
    * table (`__tb = ts div (rraStep * BucketSlots)`). 512 slots keeps a
    * partition a few parquet row groups wide at typical series counts
    * while a steady append stream touches only the newest bucket. */
  private[store] val BucketSlots = 512L

  /** Crash recovery for the old-aside/move-in swap protocol: a crash
    * between `move(dst, old)` and `move(src, dst)` leaves the ONLY copy
    * of `target` (swapInto) or of one `__tb=` bucket (mergeInto) in a
    * `<target>.old*` sibling. Scan for such leftovers and either move
    * them back (dst missing — they are the sole copy) or delete them
    * (dst present — the replacement landed; the leftover is stale).
    * Must run BEFORE any read of `target` that feeds a rewrite, or the
    * rewrite is computed without the lost rows and recovery after the
    * fact would be overwritten. */
  private[graft] def recoverLeftovers(target: String): Unit =
      withSwapLock(target) {
    val g = Paths.get(target)
    val parent = g.getParent
    val name = g.getFileName.toString
    if (parent != null && Files.exists(parent)) {
      val leftovers = scala.util.Using.resource(Files.list(parent)) { s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(name + ".old"))
          .toList
      }
      leftovers.foreach { p =>
        val suffix = p.getFileName.toString.stripPrefix(name + ".old")
        val dst = if (suffix.isEmpty) g else g.resolve(suffix)
        if (Files.exists(dst)) deleteRecursively(p)
        else { // sole surviving copy — restore it
          if (suffix.nonEmpty) Files.createDirectories(g)
          Files.move(p, dst)
        }
      }
    }
  }

  /** Read an RRA table regardless of physical layout: flat (bulk
    * update/modify/restore writers) or `__tb=`-partitioned (appendBatch's
    * merge target). The partition column is derived from `ts` and never
    * part of the logical schema. */
  def readRra(spark: SparkSession, dir: String): DataFrame = {
    recoverLeftovers(dir)
    val df = spark.read.parquet(dir)
    if (df.columns.contains("__tb")) df.drop("__tb") else df
  }

  private def writeSwapPartitioned(df: DataFrame, target: String): Unit = {
    val tmp = target + ".next"
    df.write.mode("overwrite").partitionBy("__tb").parquet(tmp)
    swapInto(tmp, target)
  }

  /** Incremental micro-batch ingest — the streaming write path (the
    * reference's strictly-ordered `rrd_update` append; rrdcached's role
    * of write-behind batching is played by the caller's micro-batches).
    *
    * Unlike [[update]] (idempotent full-batch rematerialization), this
    * MERGES: new CDP rows replace same-(series, ts) rows and everything
    * else is kept. Cross-batch continuity comes from a raw-sample tail
    * sidecar (`<path>/tail`) holding, per series, every sample since the
    * last bucket horizon plus one older sample — exactly the reference's
    * `pdp_prep`/`cdp_prep` scratch, re-expressed as data. The horizon is
    * aligned to the LCM of all RRA steps, so every bucket the
    * recomputation emits past it is complete; rows at or before a
    * series' horizon are discarded rather than merged (their buckets
    * were finalized in earlier batches).
    *
    * Requires monotonic input per series (run [[graft.streaming
    * .StreamingIngest.monotonicGate]] upstream); same-(series, ts)
    * replays are deduped so foreachBatch retries stay idempotent.
    *
    * Holt-Winters RRAs stream too: the recurrence resumes from the
    * per-(series, DS) state sidecar (`<path>/hwstate/rra<i>/<ds>`,
    * the reference's `cdp_prep` scratch as data) and consumes only
    * CLOSED slots — ones whose step is fully covered by samples — so a
    * slot is never fed to the sequential model while a later sample
    * could still revise its PDP (the reference likewise runs the
    * aberrant chain only at PDP close-out, rrd_update.c:1694-1835).
    * State is written AFTER the member rows commit: a crash between the
    * two replays the batch against the old state and the merge dedups.
    *
    * Scale shape: per batch, one window pass per series over
    * (tail ∪ batch) — tail size is O(series × lcm-window) — then the
    * same bounded-explode + hash-agg pipeline as [[update]], and one
    * anti-join + union per RRA keyed (series, ts). On Delta the merge
    * is `MERGE INTO`; on parquet it rewrites the RRA, so size RRA
    * retention (compact) accordingly.
    */
  def appendBatch(spark: SparkSession, path: String, samples: DataFrame,
      series: Seq[String], tsUs: String, tieBreak: String,
      dsValues: Map[String, String],
      rateScale: Option[Int] = None): Unit = {
    val schema = readSchema(path)
    val lcmCnt = schema.rras.map(_.pdpCnt).reduce(lcm)
    val horizonStep = schema.stepSec * lcmCnt

    val keep = (series ++ Seq(tsUs, tieBreak).distinct ++
      schema.ds.filter(_.dst != Dst.Compute).map(d => dsValues(d.name))
        .distinct).distinct
    val tailPath = s"$path/tail"
    val tail =
      if (Files.exists(Paths.get(tailPath)))
        Some(spark.read.parquet(tailPath))
      else None
    // series the store has never seen get the create-time seed sample
    val fresh = seedStart(schema, samples.select(keep.map(col): _*),
        series, tsUs, tail)
      .withColumn("__horizon", lit(Long.MinValue))
    val all0 = tail.fold(fresh)(_.unionByName(fresh))
    // same-(series, ts) duplicates are replays of an already-ingested
    // sample (the gate forbids fresh ones) — keep one
    val all = all0.dropDuplicates(series :+ tsUs).persist()

    // sample-sized cache; the grid-sized PDP frame derives map-side
    // (same reasoning as update())
    val rated = ratedFrame(schema, all.drop("__horizon"), series, tsUs,
      tieBreak, dsValues).persist()
    val pdp = pdpFrame(schema, rated, series, tsUs, rateScale)
    // per-series finalized-bucket horizon from the previous batch (sec);
    // Long.MinValue (no tail yet) keeps everything
    val bFrame = all.groupBy(series.map(col): _*)
      .agg(max(col("__horizon")).as("__B"))
    // per-series closed-slot horizon: a slot is CLOSED once a sample at
    // or past its end exists (HW must never consume a revisable PDP)
    val closedF = all.groupBy(series.map(col): _*)
      .agg((expr(s"(max($tsUs) div 1000000) div ${schema.stepSec}") *
        schema.stepSec).as("__closed"))

    // Merge fresh rollup rows into rra<idx>, touching only the coarse
    // ts-bucket partitions the batch lands in. A steady append stream
    // writes the newest bucket and leaves the rest of the table's files
    // alone — the previous version rewrote the WHOLE table per
    // micro-batch, the one write-path scale-killer at 100 TB. A legacy
    // flat table migrates to the partitioned layout on its first merge
    // (one full rewrite, same cost as the old path).
    def mergeInto(freshRows: DataFrame, idx: Int): Unit = {
      val target = s"$path/rra$idx"
      // restore any crash-leftover .old buckets BEFORE reading the
      // table: the merged frame below is computed from `existing`, so a
      // bucket recovered later would be overwritten without its rows
      recoverLeftovers(target)
      val span = schema.stepSec * schema.rras(idx).pdpCnt * BucketSlots
      val fresh = freshRows.withColumn("__tb", expr(s"ts div $span"))
      if (!Files.exists(Paths.get(target))) {
        fresh.write.mode("overwrite").partitionBy("__tb").parquet(target)
      } else {
        val existing = spark.read.parquet(target)
        if (existing.columns.contains("__tb")) {
          // buckets the batch touches: bounded by batch-span/span + 1
          // per horizon replay — a tiny driver-side list
          val touched = fresh.select(col("__tb").cast("long"))
            .distinct().collect().map(_.getLong(0))
          val exTouched = existing
            .where(col("__tb").cast("long").isin(touched.toIndexedSeq: _*))
            .drop("__tb").withColumn("__tb", expr(s"ts div $span"))
          val merged = exTouched
            .join(fresh.select((series :+ "ts").map(col): _*),
              series :+ "ts", "left_anti")
            .unionByName(fresh)
          // stage the touched partitions, then swap ONLY their dirs —
          // same old-aside/move-in/clean protocol as swapInto (never
          // hard-delete the sole copy before the replacement is in
          // place; the .old holding dir lives OUTSIDE target so a
          // crash-leftover never pollutes partition discovery)
          val tmp = target + ".next"
          merged.write.mode("overwrite").partitionBy("__tb").parquet(tmp)
          withSwapLock(target) {
            touched.foreach { b =>
              val src = Paths.get(tmp, s"__tb=$b")
              val dst = Paths.get(target, s"__tb=$b")
              val old = Paths.get(target + s".old__tb=$b")
              deleteRecursively(old)
              if (Files.exists(dst)) Files.move(dst, old)
              if (Files.exists(src)) Files.move(src, dst)
              deleteRecursively(old)
            }
            deleteRecursively(Paths.get(tmp))
          }
        } else {
          val merged = existing
            .join(fresh.select((series :+ "ts").map(col): _*),
              series :+ "ts", "left_anti")
            .withColumn("__tb", expr(s"ts div $span"))
            .unionByName(fresh)
          writeSwapPartitioned(merged, target)
        }
      }
    }

    val hwFamily: Map[Cf, String] = Map(
      Cf.Seasonal -> "seasonal", Cf.DevSeasonal -> "devseasonal",
      Cf.DevPredict -> "devpredict", Cf.Failures -> "failures")
    var familyWritten = Set.empty[Int]
    schema.rras.zipWithIndex.foreach { case (rra, i) =>
      rra.cf match {
        case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
          // only COMPLETE buckets reach the table: the reference keeps
          // the live partial CDP in cdp_prep scratch, never in the
          // database (rrd_update.c:2006-2141) — and an early partial row
          // would drag the retention window one slot forward (tests/
          // tune1's 11th-row divergence). The tail sidecar replays its
          // samples, so the bucket lands once a sample closes it.
          val recomputed = plainRraFrame(schema, rra, pdp, series)
            .join(bFrame, series)
            .where(col("ts") > col("__B")).drop("__B")
            .join(closedF, series)
            .where(col("ts") <= col("__closed")).drop("__closed")
          mergeInto(recomputed, i)
        case Cf.HwPredict | Cf.MhwPredict =>
          val h = rra.hw.get
          val spec = graft.hw.HoltWinters.HwSpec(h.alpha, h.beta,
            h.period.toInt, h.gamma, h.gamma,
            multiplicative = rra.cf == Cf.MhwPredict,
            deltaPos = h.deltaPos, deltaNeg = h.deltaNeg,
            failThreshold = h.failThreshold, windowLen = h.windowLen,
            smoothingWindow = h.smoothingWindow)
          val members = ("hwpredict" -> i) +: schema.rras.zipWithIndex
            .drop(i + 1)
            .takeWhile(r => hwFamily.contains(r._1.cf))
            .map(r => hwFamily(r._1.cf) -> r._2)
          val perDs = schema.ds.map { d =>
            val pdpDs = pdp.join(closedF, series)
              .where(col("pdp_ts") <= col("__closed"))
              .select(series.map(col) :+ col("pdp_ts").as("ts") :+
                col(s"pdp_${d.name}").as("v"): _*)
            val statePath = s"$path/hwstate/rra$i/${d.name}"
            val prior =
              if (Files.exists(Paths.get(statePath)))
                spark.read.parquet(statePath)
              else {
                // history without state = a store whose sidecar was lost
                // (e.g. restored from a pre-state dump): refusing beats
                // silently restarting the model mid-history
                require(!Files.exists(Paths.get(s"$path/rra$i")),
                  s"HW RRA $i has history but no state sidecar " +
                    s"($statePath): rebuild with update() or restore " +
                    "from a dump that includes hwstate/")
                spark.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  graft.hw.HoltWinters.stateSchema(
                    series.map(pdpDs.schema(_))))
              }
            val (rows, states) = graft.hw.HoltWinters.applyResumable(
              pdpDs, series, "ts", "v", spec, prior, schema.stepSec)
            (d.name, rows.persist(), states, statePath)
          }
          // same one-join shape as update(): all member columns ride a
          // single n-way join, the merges project from it
          val joined = perDs.map { case (ds, out, _, _) =>
            out.select(series.map(col) :+ col("ts") :++
              members.map { case (m, _) => col(m).as(s"${m}__$ds") }: _*)
          }.reduce(_.join(_, series :+ "ts", "outer"))
          members.foreach { case (member, idx) =>
            mergeInto(joined.select(series.map(col) :+ col("ts") :++
              perDs.map { case (ds, _, _, _) =>
                col(s"${member}__$ds").as(ds) }: _*), idx)
          }
          // state LAST: a crash before this point replays against the
          // old state and the merges dedup the regenerated rows
          perDs.foreach { case (_, rows, states, statePath) =>
            writeSwap(states, statePath)
            rows.unpersist()
          }
          familyWritten ++= members.map(_._2)
        case _ if familyWritten.contains(i) => ()
        case other => throw new IllegalArgumentException(
          s"RRA $i ($other) has no preceding HWPREDICT to depend on")
      }
    }

    // trim the tail to the new horizon: floor(newest/L)·L per series,
    // keeping every sample past it plus the newest one at-or-before it
    // (the lag source for the first in-window interval)
    val hUs = horizonStep * 1000000L
    val wSer = Window.partitionBy(series.map(col): _*)
    val withB = all.drop("__horizon")
      .withColumn("__mx", max(col(tsUs)).over(wSer))
      .withColumn("__B", expr(s"__mx div $hUs") * horizonStep)
      .drop("__mx")
    val wOld = Window.partitionBy(series.map(col): _*)
      .orderBy(col(tsUs).desc)
    val young = withB.where(col(tsUs) > col("__B") * 1000000L)
    val oldNewest = withB.where(col(tsUs) <= col("__B") * 1000000L)
      .withColumn("__rn", row_number().over(wOld))
      .where(col("__rn") === 1).drop("__rn")
    writeSwap(
      young.unionByName(oldNewest)
        .withColumn("__horizon", col("__B")).drop("__B"),
      tailPath)
    rated.unpersist()
    all.unpersist()
  }

  private def lcm(a: Long, b: Long): Long = {
    @annotation.tailrec def gcd(x: Long, y: Long): Long =
      if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  /** One row per slot per series between that series' first and last
    * PDP — the continuous grid the sequential HW recurrence requires. */
  private def gridFill(pdp: DataFrame, series: Seq[String], value: String,
      stepSec: Long): DataFrame = {
    val bounds = pdp.groupBy(series.map(col): _*)
      .agg(min(col("pdp_ts")).as("__t0"), max(col("pdp_ts")).as("__t1"))
    val grid = bounds.select(series.map(col) :+
        explode(sequence(expr(s"__t0 div $stepSec"),
          expr(s"__t1 div $stepSec"))).as("__k"): _*)
      .select(series.map(col) :+ (col("__k") * stepSec).as("pdp_ts"): _*)
    grid.join(pdp.select(series.map(col) :+ col("pdp_ts") :+
        col(value): _*),
      series :+ "pdp_ts", "left")
  }

  /** One row per series: its newest slot. The tiny frame [[retained]]
    * and the fetch key set both derive from — an aggregate (partial
    * map-side, ~#series rows on the wire) instead of the previous
    * whole-table window (full exchange + sort per reference; guide
    * §2.3/§2.4). */
  private def lastPerSeries(df: DataFrame, series: Seq[String]): DataFrame =
    if (series.isEmpty) df.agg(max(col("ts")).as("__last"))
    else df.groupBy(series.map(col): _*).agg(max(col("ts")).as("__last"))

  /** [[retained]] against a precomputed [[lastPerSeries]] frame — the
    * fetch path shares one aggregate between the horizon filter and
    * the grid key set. Null-safe series equality (<=>) keeps a
    * null-keyed series grouped with itself, exactly as the window
    * partitioned it. */
  private def retainedWithLast(df: DataFrame, series: Seq[String],
      rra: RraDef, stepSec: Long, last: DataFrame): DataFrame = {
    val rraStep = stepSec * rra.pdpCnt
    val horizon = lit(rra.rowCnt * rraStep)
    val joined =
      if (series.isEmpty) df.crossJoin(last)
      else {
        val l = last.select(series.map(c => col(c).as(s"__k_$c")) :+
          col("__last"): _*)
        df.join(l, series.map(c => col(c) <=> col(s"__k_$c"))
          .reduce(_ && _))
      }
    joined.where(col("ts") > col("__last") - horizon)
      .drop(("__last" +: series.map("__k_" + _)): _*)
  }

  /** Retention horizon filter: keep slots within `rowCnt` rows of each
    * series' newest slot (the circular buffer's reach, rra_def_t.row_cnt).
    */
  private def retained(df: DataFrame, series: Seq[String], rra: RraDef,
      stepSec: Long): DataFrame =
    retainedWithLast(df, series, rra, stepSec, lastPerSeries(df, series))

  /** Rewrite an RRA table keeping only in-retention rows — the physical
    * half of retention (Delta: DELETE WHERE + OPTIMIZE). */
  def compact(spark: SparkSession, path: String, series: Seq[String]): Unit = {
    val schema = readSchema(path)
    schema.rras.zipWithIndex.foreach { case (rra, i) =>
      val p = s"$path/rra$i"
      if (Files.exists(Paths.get(p)))
        writeSwap(retained(readRra(spark, p), series, rra,
          schema.stepSec), p)
    }
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively(_))
    Files.deleteIfExists(p)
  }

  /** Recursive delete by path string (the one tree-removal helper —
    * callers used to each carry their own walk-and-delete copy). */
  private[graft] def deleteTree(path: String): Unit =
    deleteRecursively(Paths.get(path))

  /** updatev (rrd_update.c:300-364): like [[update]] but returns the
    * written rollup rows as one long frame
    * `(rra, series…, ts, <ds columns>)` — the info-tree
    * `[<ts>]RRA[<cf>][<steps>]DS[<name>] = <value>` flattened. */
  def updatev(spark: SparkSession, path: String, samples: DataFrame,
      series: Seq[String], tsUs: String, tieBreak: String,
      dsValues: Map[String, String],
      rateScale: Option[Int] = None): DataFrame = {
    update(spark, path, samples, series, tsUs, tieBreak, dsValues, rateScale)
    val schema = readSchema(path)
    val union = schema.rras.indices
      .filter(i => Files.exists(Paths.get(s"$path/rra$i")))
      .map(i => readRra(spark, s"$path/rra$i")
        .withColumn("rra", lit(i)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val dsCols = schema.ds.map(_.name).filter(union.columns.contains)
    union.select(col("rra") +: series.map(col) :+ col("ts") :++
      dsCols.map(col): _*)
  }

  /** `DS:a=b[idx]` prefill mapping (rrd_create.c:310-326 DS_RE):
    * optional source DS name and optional 1-BASED source-file index
    * restricting the search to one `--source` entry. An unmapped target
    * DS searches every source for a DS of its own name
    * (find_ds_match, rrd_create.c:2353-2373). */
  final case class DsMapping(srcDs: Option[String] = None,
      srcIndex: Option[Int] = None)

  /** Single-source convenience form of the multi-source [[createFrom]]. */
  def createFrom(spark: SparkSession, path: String, schema: RrdSchema,
      sourcePath: String, series: Seq[String],
      dsMap: Map[String, String]): Unit =
    createFrom(spark, path, schema, Seq(sourcePath), series,
      dsMap.map { case (k, v) => k -> DsMapping(Some(v)) })

  /** create --source prefill (rrd_prefill_data,
    * rrd_create.c:1888-2140): create `path` with `schema` and fill each
    * plain-CF RRA bin from the best coverage the source stores offer.
    *
    * Reference semantics re-expressed:
    *   - candidates per target DS = every RRA whose CF is AVERAGE or the
    *     target CF (select_create_candidates, rrd_create.c:1991-2002),
    *     from every source holding the mapped DS name, ordered per
    *     source by order_candidates (rrd_create.c:1946-1988: exact
    *     CF+bin-size match first, then AVERAGE over other CFs, then
    *     finer bins, then longer retention);
    *   - per target bin, candidate bins claim the seconds they overlap
    *     in that priority order — only *newly covered* seconds
    *     contribute (add_coverage interval merge, prefill_bin,
    *     rrd_create.c:2004-2121);
    *   - AVERAGE weighs each contribution by its newly covered seconds;
    *     MIN/MAX fold the contributing bin values; LAST keeps the last
    *     contribution in walk order (prefill_consolidate, 1888-1920);
    *   - the bin stays unknown unless covered seconds exceed xff·bin
    *     (min_required_coverage, rrd_create.c:2014, 2110).
    *
    * Incommensurate source/target steps (tests/create-with-source-4's
    * 67 s/73 s → 71 s) resolve through the same overlap arithmetic — no
    * divisibility requirement.
    *
    * Plan shape: per target RRA, one union of candidate rollup scans,
    * a bounded `explode(sequence)` onto overlapping target bins (the
    * Normalize trick — fan-out ≤ candBin/bin + 2), ONE shuffle on
    * (series, ds, bin) into a per-bin typed fold (groups are small:
    * Σ bin/candStep + candidates), then a pivot back to the wide RRA
    * layout. Nothing is collected to the driver.
    *
    * The pdp_prep/cdp_prep scratch transplant
    * (rrd_create.c:2140-2350) is not reproduced: this store's ingest
    * scratch is the raw-sample tail, which the sources (rollup-only
    * dumps) do not carry; the reference's own tests filter both subtrees
    * out of the comparison (tests/create-with-source-2:9-14).
    */
  def createFrom(spark: SparkSession, path: String, schema: RrdSchema,
      sources: Seq[String], series: Seq[String],
      dsMap: Map[String, DsMapping]): Unit = {
    create(path, schema)
    val srcSchemas = sources.map(readSchema)
    // source retention: the reference reads a circular buffer that holds
    // exactly row_cnt rows per RRA; this store's parquet may hold more
    // (retention is read-time), so clamp candidates to the same horizon
    val srcLastUp = sources.map(lastUpdateSec(spark, _))
    schema.rras.zipWithIndex.foreach { case (rra, i) =>
      rra.cf match {
        case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
          prefillRra(spark, path, schema, rra, i, sources, srcSchemas,
            srcLastUp, series, dsMap)
        case _ => () // HW families start cold, like the reference
      }
    }
  }

  private def prefillRra(spark: SparkSession, path: String,
      schema: RrdSchema, rra: RraDef, rraIdx: Int, sources: Seq[String],
      srcSchemas: Seq[RrdSchema], srcLastUp: Seq[Long],
      series: Seq[String], dsMap: Map[String, DsMapping]): Unit = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val bin = schema.stepSec * rra.pdpCnt
    // newest target row ends at last_up aligned down to the bin grid
    // (end_time_for_row_simple); rowCnt rows of retention behind it
    val lastTb = Math.floorDiv(schema.startSec, bin) * bin
    val firstTb = lastTb - (rra.rowCnt - 1) * bin

    // one candidate frame per (target DS, source RRA), priority-tagged
    val candFrames: Seq[DataFrame] = schema.ds.flatMap { d =>
      val m = dsMap.getOrElse(d.name, DsMapping())
      val mapped = m.srcDs.getOrElse(d.name)
      sources.zip(srcSchemas).zip(srcLastUp).zipWithIndex.flatMap {
        case (((sp, ss), lu), si) =>
        if (m.srcIndex.exists(_ != si + 1)) Nil // 1-based index gate
        else if (!ss.ds.exists(_.name == mapped)) Nil
        else {
          val selected = ss.rras.zipWithIndex.filter { case (r, _) =>
            r.cf == Cf.Average || r.cf == rra.cf }
          val ordered = selected.sortWith { case ((a, _), (b, _)) =>
            val (aB, bB) = (ss.stepSec * a.pdpCnt, ss.stepSec * b.pdpCnt)
            val aExact = a.cf == rra.cf && aB == bin
            val bExact = b.cf == rra.cf && bB == bin
            if (aExact != bExact) aExact
            else if (a.cf != b.cf) a.cf == Cf.Average
            else if (aB != bB) aB < bB
            else a.rowCnt > b.rowCnt
          }
          ordered.map { case (r, ri) => (sp, ss, lu, r, ri) }
        }
      }.zipWithIndex.flatMap { case ((sp, ss, lu, r, ri), p) =>
        val t = Paths.get(sp, s"rra$ri")
        if (!Files.exists(t)) None
        else {
          val candB = ss.stepSec * r.pdpCnt
          val newest = Math.floorDiv(lu, candB) * candB
          Some(spark.read.parquet(t.toString)
            .where(col(mapped).isNotNull &&
              col("ts") <= newest &&
              col("ts") > newest - r.rowCnt * candB)
            .select(series.map(col) :+ lit(d.name).as("ds") :+
              (col("ts") - candB).as("cs") :+ col("ts").as("ce") :+
              col(mapped).cast("double").as("v") :+ lit(p).as("p"): _*))
        }
      }
    }
    if (candFrames.isEmpty) return
    // a candidate bin [cs,ce) overlaps target bins (tb-bin, tb] for
    // aligned tb in (cs, ce+bin) — bounded fan-out, then one shuffle
    val exploded = candFrames.reduce(_.unionByName(_))
      .withColumn("tb", explode(sequence(
        (floor(col("cs").cast("double") / bin).cast("long") + 1L) * bin,
        (floor((col("ce") - 1L).cast("double") / bin).cast("long") + 1L) * bin,
        lit(bin))))
      .where(col("tb") >= firstTb && col("tb") <= lastTb)

    val inSchema = exploded.schema
    val sIdx = series.map(inSchema.fieldIndex)
    val (dsI, csI, ceI, vI, pI, tbI) = (inSchema.fieldIndex("ds"),
      inSchema.fieldIndex("cs"), inSchema.fieldIndex("ce"),
      inSchema.fieldIndex("v"), inSchema.fieldIndex("p"),
      inSchema.fieldIndex("tb"))
    val outSchema = StructType(
      series.map(inSchema(_)) :+ StructField("ts", LongType, false) :+
        StructField("ds", StringType, false) :+
        StructField("value", DoubleType, false))
    val cf = rra.cf
    val xff = rra.xff
    val folded = exploded.groupByKey { r: Row =>
      (sIdx :+ dsI :+ tbI).map { j =>
        val s = String.valueOf(r.get(j)); s"${s.length}:$s"
      }.mkString
    }(Encoders.STRING).flatMapGroups { (_: String, rows: Iterator[Row]) =>
      val rs = rows.toArray
      val head = rs.head
      val tb = head.getLong(tbI)
      prefillBin(
        rs.toSeq.map(r =>
          (r.getLong(csI), r.getLong(ceI), r.getDouble(vI), r.getInt(pI))),
        tb - bin, tb, cf, xff) match {
        case Some(value) =>
          Iterator.single(Row.fromSeq(sIdx.map(head.get) ++
            Seq(tb, head.getString(dsI), value)))
        case None => Iterator.empty
      }
    }(Encoders.row(outSchema)).toDF(outSchema.fieldNames.toIndexedSeq: _*)

    folded.groupBy(series.map(col) :+ col("ts"): _*)
      .pivot("ds", schema.ds.map(_.name))
      .agg(first("value"))
      .write.mode("overwrite").parquet(s"$path/rra$rraIdx")
  }

  /** One target bin of the prefill (prefill_bin, rrd_create.c:2004-2121):
    * walk candidate bins `(cs, ce, value, priority)` in (priority, time)
    * order over the half-open target window [tbS, tbE); only seconds no
    * earlier candidate covered contribute (add_coverage's interval
    * merge). AVERAGE weighs each contribution by its newly covered
    * seconds, MIN/MAX fold values, LAST keeps the last contribution in
    * walk order; below the xff coverage threshold the bin stays
    * unknown. Pure — property-tested against a per-second simulation. */
  private[graft] def prefillBin(cands: Seq[(Long, Long, Double, Int)],
      tbS: Long, tbE: Long, cf: Cf, xff: Double): Option[Double] = {
    val bin = tbE - tbS
    var covered = List.empty[(Long, Long)] // disjoint, unsorted ok
    var est = Double.NaN
    var total = 0L
    cands.sortBy(c => (c._4, c._1)).foreach { case (cs, ce, v, _) =>
      val s = math.max(cs, tbS)
      val e = math.min(ce, tbE)
      if (e > s) {
        var segs = List((s, e))
        covered.foreach { case (a, b) =>
          segs = segs.flatMap { case (x, y) =>
            if (b <= x || a >= y) List((x, y))
            else List((x, math.max(x, a)), (math.min(y, b), y))
              .filter(q => q._2 > q._1)
          }
        }
        val newly = segs.map(q => q._2 - q._1).sum
        if (newly > 0) {
          covered = segs ++ covered
          total += newly
          est = cf match { // prefill_consolidate, rrd_create.c:1888
            case Cf.Min => if (est.isNaN) v else math.min(est, v)
            case Cf.Max => if (est.isNaN) v else math.max(est, v)
            case Cf.Last => v
            case _ => // AVERAGE: weight by newly covered seconds
              (if (est.isNaN) 0.0 else est) + v / bin * newly
          }
        }
      }
    }
    if (total > xff * bin && !est.isNaN) // min_required_coverage
      Some(if (cf == Cf.Average) est / total * bin else est)
    else None
  }

  /** Fetch: select the best RRA (rrd_fetch.c:344-441 semantics via
    * [[Fetch.selectRra]]), apply the retention horizon, and return the
    * aligned per-series grid over (start, end] at the RRA's native step —
    * slots with no surviving row are null, mirroring
    * rrd_fetch.c:511-569's out-of-window NaN fill.
    */
  /** rrd_last (rrd_last.c): the raw last-update time — the newest
    * sample in the ingest tail; falls back to the finest rollup's
    * newest slot (stores materialized without a tail), then to the
    * create time (no data at all). */
  def lastUpdateSec(spark: SparkSession, path: String): Long =
    lastUpdateUs(spark, path) / 1000000L

  /** Microsecond-exact last_up — the update gate compares at µs
    * precision (rrd_update.c:1416-1423 checks last_up_usec too), so a
    * second-truncated value would let sub-second-stale samples through. */
  def lastUpdateUs(spark: SparkSession, path: String): Long = {
    val schema = readSchema(path)
    if (Files.exists(Paths.get(s"$path/tail"))) {
      val r = spark.read.parquet(s"$path/tail")
        .agg(max("ts_us")).first()
      if (r.isNullAt(0)) schema.startSec * 1000000L else r.getLong(0)
    } else {
      val finest = schema.rras.indices.minBy(schema.rras(_).pdpCnt)
      if (Files.exists(Paths.get(s"$path/rra$finest"))) {
        val r = readRra(spark, s"$path/rra$finest")
          .agg(max("ts")).first()
        if (r.isNullAt(0)) schema.startSec * 1000000L
        else r.getLong(0) * 1000000L
      } else schema.startSec * 1000000L
    }
  }

  /** rrd_first (rrd_first.c:84-123): the oldest slot RRA `rraIdx` CAN
    * hold — pure geometry over last_up, not written data:
    * floor(last_up/rraStep)·rraStep − (rows−1)·rraStep. The reference's
    * create-from-template test asserts this on a file with NO data. */
  def firstTime(spark: SparkSession, path: String, rraIdx: Int = 0): Long = {
    val schema = readSchema(path)
    val rra = schema.rras(rraIdx)
    val rraStep = schema.stepSec * rra.pdpCnt
    val lastUp = lastUpdateSec(spark, path)
    math.floorDiv(lastUp, rraStep) * rraStep - (rra.rowCnt - 1) * rraStep
  }

  def fetch(spark: SparkSession, path: String, cf: Cf, ds: String,
      series: Seq[String], startSec: Long, endSec: Long,
      requestedStepSec: Long): DataFrame =
    fetchAll(spark, path, cf, Seq(ds), series, startSec, endSec,
      requestedStepSec)

  /** [[fetch]] over several DS columns in one grid join (the daemon's
    * FETCH returns every DS of the file — rrd_fetch.c fills an
    * `rrd_value_t` row per slot). */
  def fetchAll(spark: SparkSession, path: String, cf: Cf, dss: Seq[String],
      series: Seq[String], startSec: Long, endSec: Long,
      requestedStepSec: Long): DataFrame =
    fetchAllWithStep(spark, path, cf, dss, series, startSec, endSec,
      requestedStepSec)._1

  /** [[fetchAll]] plus the CHOSEN RRA's step — callers that need the
    * resolution (the graph planner) read it here instead of probing the
    * returned grid with an extra collect (round-2 verdict, "What's
    * wrong" #6). */
  def fetchAllWithStep(spark: SparkSession, path: String, cf: Cf,
      dss: Seq[String], series: Seq[String], startSec: Long, endSec: Long,
      requestedStepSec: Long): (DataFrame, Long) = {
    val schema = readSchema(path)
    // a created-but-never-updated store has no rra<i> parquet yet; the
    // reference's fetch on such a file yields all-unknown rows, so an
    // empty typed frame (string series keys, long ts, double DSes) is
    // the right read
    def rraOrEmpty(i: Int): DataFrame =
      if (Files.exists(Paths.get(s"$path/rra$i")))
        readRra(spark, s"$path/rra$i")
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          series.map(org.apache.spark.sql.types.StructField(_,
            org.apache.spark.sql.types.StringType)) ++
          Seq(org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.LongType)) ++
          schema.ds.map(d => org.apache.spark.sql.types.StructField(d.name,
            org.apache.spark.sql.types.DoubleType))))
    // nowSec = the store's logical last_up: newest slot across the
    // finest RRA (metadata-only read of one small rollup)
    val rraIdx = schema.rras.indices.minBy(i => schema.rras(i).pdpCnt)
    val nowRow = rraOrEmpty(rraIdx).agg(max("ts")).first()
    val nowSec = if (nowRow.isNullAt(0)) schema.startSec
      else nowRow.getLong(0)
    val rra = Fetch.selectRra(schema, cf, startSec, endSec,
      requestedStepSec, nowSec)
    val i = schema.rras.indexOf(rra)
    val step = schema.stepSec * rra.pdpCnt
    val (s0, e0) = Fetch.align(startSec, endSec, step)
    val raw = rraOrEmpty(i)
    // ONE per-series max aggregate serves both the retention filter
    // and the grid key set (the previous shape ran a whole-table
    // window per reference plus a distinct over the filtered table —
    // three corpus-sized passes for what one partial-agg'd exchange
    // derives). The newest slot of a series always survives its own
    // horizon, so last's key set == the retained table's distinct keys.
    val last = lastPerSeries(raw, series)
    val roll = retainedWithLast(raw, series, rra, schema.stepSec, last)
    // per-series grid: distinct series keys × slots (broadcastable grid)
    val keys = last.select(series.map(col): _*)
    val grid = Fetch.grid(spark, s0, e0, step).crossJoin(keys)
    (grid.join(roll.select(series.map(col) :+ col("ts") :++ dss.map(col): _*),
        series :+ "ts", "left")
      .select(series.map(col) :+ col("ts") :++ dss.map(col): _*), step)
  }
}
