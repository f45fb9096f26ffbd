package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffolding for "execute a streaming transform for real and
  * hand back the sink as a batch frame" (q72's cdpStreamFileRun, q74's
  * gateFileRun): temp dirs, the file source → parquet sink wiring, the
  * micro-batch cadence, and cleanup.
  *
  * Cleanup discipline: the input and checkpoint dirs are dead the
  * moment the query stops and are deleted EAGERLY; only the sink dir
  * backs the returned frame and lives until JVM exit. All roots
  * register in one shared list drained by a SINGLE shutdown hook —
  * per-call `addShutdownHook` would accumulate one thread per run for
  * the life of the JVM (bench re-runs, test suites).
  */
object StreamRun {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = tracked.poll()
      while (p != null) { deleteTree(p); p = tracked.poll() }
    }))

  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(root)) { s =>
        s.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } catch { case _: Exception => () }

  /** State-store footprint of one [[run]]: maximum state rows and bytes
    * across the run's micro-batches, summed over stateful operators per
    * batch. The 100 TB question for any stateful streaming job is "how
    * does state grow with keys×windows" — ScaleBench records these for
    * q72/q74 at each scale factor and SCALE.md keeps the rows. `None`
    * means the query had no stateful operator (or no progress events). */
  final case class StateMetrics(maxRows: Long, maxBytes: Long)

  /** [[run]] discarding the state metrics — for callers that only want
    * the sink frame (the oracle queries, specs). */
  def toParquet(spark: SparkSession, input: DataFrame,
      transform: DataFrame => DataFrame,
      extraBatches: Seq[DataFrame]): DataFrame =
    run(spark, input, transform, extraBatches)._1

  /** Run `transform` over a file-source stream of `input` as a REAL
    * micro-batch query with an append-mode parquet sink.
    *
    * `extraBatches` land as one micro-batch each, in order, AFTER the
    * input batch — the lever for watermark/state cadence (a watermark
    * computed from batch N's data only takes effect in batch N+1, so
    * sentinel-driven eviction needs two appends; a late-data test needs
    * one).
    *
    * State metrics come from the query's progress buffer, which Spark
    * caps at `spark.sql.streaming.numRecentProgressUpdates` most-recent
    * batches; [[run]] raises the session's cap to ≥1000 so the max is
    * exact for any run under 1000 micro-batches (ours have ≤5 — a run
    * past the cap would report a tail-only max).
    *
    * @return (batch frame over the sink's parquet output (unordered),
    *         state footprint of the run)
    */
  def run(spark: SparkSession, input: DataFrame,
      transform: DataFrame => DataFrame,
      extraBatches: Seq[DataFrame]): (DataFrame, Option[StateMetrics]) = {
    val capKey = "spark.sql.streaming.numRecentProgressUpdates"
    val capPrev = spark.conf.getOption(capKey)
    if (spark.conf.get(capKey, "100").toInt < 1000)
      spark.conf.set(capKey, "1000")
    val root = java.nio.file.Files.createTempDirectory("graft-stream-")
    hookInstalled
    tracked.add(root)
    val inDir = root.resolve("in")
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt")
    // One SUBDIRECTORY per logical batch, made visible to the source's
    // glob by a single ATOMIC rename: the running query triggers
    // continuously, and a multi-file parquet commit into a watched dir
    // is non-atomic — a trigger landing mid-commit would split the
    // logical batch across two micro-batches (real flake: a
    // batch-internal duplicate pair then straddles the boundary and
    // the CDC gate's within-batch df misses it). Staging outside the
    // glob and renaming the whole directory is all-or-nothing, so a
    // listing sees either none or all of a batch's files.
    java.nio.file.Files.createDirectories(inDir)
    input.write.parquet(inDir.resolve("batch-0").toString)
    val src = spark.readStream.schema(input.schema)
      .parquet(inDir.toString + "/batch-*")
    val q = transform(src)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    val metrics =
      try {
        q.processAllAvailable() // batch 1: all input files
        extraBatches.zipWithIndex.foreach { case (b, i) =>
          val stage = root.resolve(s"stage-${i + 1}")
          b.write.parquet(stage.toString)
          java.nio.file.Files.move(stage,
            inDir.resolve(s"batch-${i + 1}"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          q.processAllAvailable()
        }
        // per-batch state footprint (rows, bytes) summed over stateful
        // operators; keep the run's maximum of each
        val perBatch = q.recentProgress.toSeq
          .map(_.stateOperators.toSeq)
          .filter(_.nonEmpty)
          .map(ops =>
            (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum))
        if (perBatch.isEmpty) None
        else Some(StateMetrics(
          perBatch.map(_._1).max, perBatch.map(_._2).max))
      } finally {
        q.stop()
        // restore the caller's progress-buffer cap (the raise is only
        // needed while THIS query's buffer accumulates; leaving it
        // mutated would leak the override to session co-tenants)
        capPrev match {
          case Some(v) => spark.conf.set(capKey, v)
          case None => spark.conf.unset(capKey)
        }
      }
    // input + checkpoint are dead once the query stops; only the sink
    // backs the returned frame
    deleteTree(inDir)
    deleteTree(ckpt)
    (spark.read.parquet(outDir), metrics)
  }

  /** [[run]] under `Trigger.AvailableNow` — the batch-job-over-a-stream
    * shape a scheduled 100 TB ingest actually runs: EVERY input frame
    * (including the watermark sentinel) lands in the source directory
    * BEFORE the query starts, the trigger drains all of it (one data
    * batch here — no rate-limit options set), runs the no-data batch
    * that lets the just-advanced watermark evict/emit closed windows,
    * and terminates on its own. Versus [[run]]'s per-append
    * `processAllAvailable` cadence this is the fewer-larger-batches
    * end of the axis: same transform, same sink, same state
    * semantics, fewer trigger/commit cycles — the pair of measurements
    * separates per-batch machinery cost from state I/O (SCALE.md,
    * q72_available_now).
    *
    * Output is identical to [[run]]'s for watermark-evicted operators:
    * AvailableNow keeps running micro-batches (including no-data ones,
    * `spark.sql.streaming.noDataMicroBatches.enabled` default true)
    * until the watermark stabilizes, so windows the sentinel closes are
    * flushed before termination — spec-pinned against [[run]]. */
  def runAvailableNow(spark: SparkSession, input: DataFrame,
      transform: DataFrame => DataFrame,
      preloaded: Seq[DataFrame]): (DataFrame, Option[StateMetrics]) = {
    val capKey = "spark.sql.streaming.numRecentProgressUpdates"
    val capPrev = spark.conf.getOption(capKey)
    if (spark.conf.get(capKey, "100").toInt < 1000)
      spark.conf.set(capKey, "1000")
    val root = java.nio.file.Files.createTempDirectory("graft-stream-")
    hookInstalled
    tracked.add(root)
    val inDir = root.resolve("in")
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt")
    input.write.parquet(inDir.toString)
    preloaded.foreach(_.write.mode("append").parquet(inDir.toString))
    val src = spark.readStream.schema(input.schema).parquet(inDir.toString)
    val q = transform(src)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val metrics =
      try {
        q.awaitTermination()
        val perBatch = q.recentProgress.toSeq
          .map(_.stateOperators.toSeq)
          .filter(_.nonEmpty)
          .map(ops =>
            (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum))
        if (perBatch.isEmpty) None
        else Some(StateMetrics(
          perBatch.map(_._1).max, perBatch.map(_._2).max))
      } finally {
        q.stop()
        capPrev match {
          case Some(v) => spark.conf.set(capKey, v)
          case None => spark.conf.unset(capKey)
        }
      }
    deleteTree(inDir)
    deleteTree(ckpt)
    (spark.read.parquet(outDir), metrics)
  }
}
