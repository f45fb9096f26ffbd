package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming complement of the seasonal-profile anomaly family
  * (graft.hw.SeasonalProfile, the batch analog of the reference's
  * aberrant-behavior chain /root/reference/src/rrd_hw.c): the
  * corpus-sized half of q100 — per-(series, hour) event COUNTING —
  * runs as a REAL micro-batch query (file source → tumbling
  * event-time window counts under a watermark → parquet sink), and
  * only the emitted, already-hour-sized count rows feed the exact
  * batch profile + flag stage. That split is the production shape: a
  * fleet streams its telemetry into hourly rollups continuously
  * (state ∝ OPEN windows × series, the q72 law — never event volume),
  * and anomaly scoring is a cheap batch pass over rollups whenever
  * the profile refreshes.
  *
  * Exactness: a tumbling `window()` aligns at the epoch, so
  * `unix_seconds(window.start) div bucketSec` IS the batch operator's
  * `ts_sec div bucketSec` bucket on the non-negative time domain (the
  * same `>= 0` contract, enforced here too) — the streamed counts are
  * bit-identical to the batch groupBy, and the downstream profile
  * stage is literally shared code, so the whole pipeline replays
  * under the q100 oracle unchanged (spec-pinned parity).
  */
object StreamingSeasonal {

  /** Tumbling per-bucket counts over a streaming frame. */
  def bucketCountStream(events: DataFrame, series: Seq[String],
      tsUsCol: String, bucketSec: Long, latenessSec: Long): DataFrame = {
    val evt = events
      .where(col(tsUsCol) >= 0) // the batch operator's domain contract
      .withColumn("__evt", timestamp_micros(col(tsUsCol)))
      .withWatermark("__evt", s"$latenessSec seconds")
    evt
      .groupBy(series.map(col) :+
        window(col("__evt"), s"$bucketSec seconds").as("__w"): _*)
      .agg(count(lit(1)).as("c"))
      .select(series.map(col) :+
        expr(s"unix_seconds(__w.start) div ${bucketSec}L").as("bucket") :+
        col("c"): _*)
  }

  /** Run the count half as a REAL micro-batch query, then the shared
    * exact profile + flag stage over the emitted rows. The `advance`
    * sentinel appends twice (raise the watermark past every real
    * window, then emit+evict — the StreamingConsolidate cadence); its
    * own window never closes, so callers filter its key. */
  def seasonalFileRunWithState(spark: SparkSession, input: DataFrame,
      advance: DataFrame, series: Seq[String], tsUsCol: String,
      bucketSec: Long, period: Int, k: Double, latenessSec: Long)
      : (DataFrame, Option[StreamRun.StateMetrics]) = {
    require(period > 0 && k >= 0, s"period=$period, k=$k")
    val cols = series.map(col) :+ col(tsUsCol)
    val (counts, st) = StreamRun.run(spark, input.select(cols: _*),
      src => bucketCountStream(src, series, tsUsCol, bucketSec,
        latenessSec),
      Seq(advance.select(cols: _*), advance.select(cols: _*)))
    val withPos = counts
      .withColumn("pos", pmod(col("bucket"), lit(period.toLong)))
    (graft.hw.SeasonalProfile.profiled(withPos, series, k), st)
  }
}
