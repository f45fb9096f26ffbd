package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming sessionization — the gap-timeout event grouping every
  * activity pipeline needs (user sessions for engagement data, burst
  * grouping for telemetry, dialogue-turn grouping for training-data
  * assembly): events of one key belong to the same session while the
  * gap between consecutive event times is AT MOST `gapSec`; a strictly
  * larger gap closes the session (Spark merges session windows when
  * they overlap OR touch — start = event time, end = event time + gap,
  * and end == next start merges; boundary spec-pinned — so the
  * batch-SQL islands form must use `> gap` as its break condition to
  * agree).
  *
  * Spark-first shape: the BUILT-IN `session_window` event-time
  * aggregation under a watermark — no custom state code. Sessions are
  * state-store rows while OPEN; append-mode emission happens when the
  * watermark passes a session's end, which also evicts its state — so
  * state scales with keys × concurrently-open sessions, not with event
  * volume (the same law ScaleBench measures for the windowed CDP).
  *
  * Output per closed session: series key(s) + `n_events` +
  * `first_us`/`last_us` (min/max event time, µs) — the min/max
  * aggregates rather than the window bounds, so the output is
  * convention-free (Spark's window.end would bake in the gap).
  */
object StreamingSessionize {

  /** Session aggregation over a streaming frame of events. */
  def sessionStream(events: DataFrame, series: Seq[String],
      tsUsCol: String, gapSec: Long, latenessSec: Long): DataFrame = {
    // no positive-time filter (unlike the CDP stream, whose positive
    // domain is a reference contract): epoch-0 and pre-epoch events are
    // valid instants and the batch islands oracle counts them — only a
    // NULL event time (no instant at all) is excluded, and the q95
    // oracle filters null times EXPLICITLY to match (SQL windows would
    // otherwise order nulls last and fold them into the final session)
    val evt = events
      .where(col(tsUsCol).isNotNull)
      .withColumn("__evt", timestamp_micros(col(tsUsCol)))
      .withWatermark("__evt", s"$latenessSec seconds")
    evt
      .groupBy(series.map(col) :+
        session_window(col("__evt"), s"$gapSec seconds").as("__w"): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("first_us"),
        max(col(tsUsCol)).as("last_us"))
      .select(series.map(col) :+ col("n_events") :+ col("first_us") :+
        col("last_us"): _*)
  }

  /** Execute [[sessionStream]] as a REAL micro-batch query (file source
    * → session_window state → parquet sink) and return the closed
    * sessions as a batch frame plus the run's state footprint. The
    * `advance` sentinel appends TWICE — once to raise the watermark
    * past every real session, once more to run the batch that emits
    * and evicts them (the [[StreamingConsolidate]] cadence); the
    * sentinel's own session never closes, so it is absent from the
    * output (callers filter defensively anyway). */
  def sessionFileRunWithState(spark: SparkSession, input: DataFrame,
      advance: DataFrame, series: Seq[String], tsUsCol: String,
      gapSec: Long, latenessSec: Long)
      : (DataFrame, Option[StreamRun.StateMetrics]) = {
    val cols = series.map(col) :+ col(tsUsCol)
    StreamRun.run(spark, input.select(cols: _*),
      src => sessionStream(src, series, tsUsCol, gapSec, latenessSec),
      Seq(advance.select(cols: _*), advance.select(cols: _*)))
  }
}
