package graft.hw

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-profile anomaly detection — the batch complement of the
  * Holt-Winters FAILURES chain (reference aberrant-behavior detection,
  * /root/reference/src/rrd_hw.c): instead of a recurrence carrying
  * exponential-smoothing state sample by sample, the whole history
  * aggregates into a per-(series, season-position) profile (mean and
  * standard deviation of the hourly event count), and a bucket is
  * anomalous when its count sits more than `k` standard deviations
  * from its position's mean. The profile form is what a large batch
  * pipeline actually runs over years of telemetry: two partial-agg'd
  * shuffles (bucket counts, then position profiles), a broadcast-sized
  * profile join back, no per-sample recurrence anywhere.
  *
  * Exactness discipline (the cross-engine hash gate covers mean, std,
  * and the flag): everything aggregates as INTEGER counts — Σc and
  * Σc² are exact longs; mean = Σc/n and s²/n are then single IEEE
  * divides; var = (Σc² − (Σc)²/n)/n and std = sqrt(var) (sqrt is
  * correctly rounded — the one libm-safe transcendental). The flag
  * compares |c − mean| > k·std MULTIPLICATIVELY — no z division, so a
  * zero-variance position (constant counts) flags nothing instead of
  * producing a NaN whose ordering differs across engines. Contract:
  * Σc per (series, position) must stay below 2^26 so (Σc)² is exact in
  * a double — loudly beyond any hourly telemetry (2^26 events/hour
  * sustained); the profile itself is #series × period rows.
  *
  * Output: (series…, bucket, pos, c, mean, std, is_anomaly) — one row
  * per OBSERVED bucket (empty hours are absent from both the profile
  * denominator and the output; a gap-filled variant would left-join a
  * generated grid first, the q03 idiom).
  */
object SeasonalProfile {

  def anomalies(events: DataFrame, series: Seq[String], tsSecCol: String,
      bucketSec: Long, period: Int, k: Double): DataFrame = {
    require(bucketSec > 0 && period > 0 && k >= 0,
      s"bucketSec=$bucketSec, period=$period, k=$k")
    val sc = series.map(col)
    val counts = events
      // non-negative time domain, enforced in the operator (and
      // mirrored by the oracle): below zero, truncating vs flooring
      // div and pmod-vs-C-modulo would bucket/position the two engines
      // differently — pre-epoch telemetry is out of contract here
      .where(col(tsSecCol) >= 0)
      .withColumn("bucket", expr(s"`$tsSecCol` div ${bucketSec}L"))
      .groupBy(sc :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("pos", pmod(col("bucket"), lit(period.toLong)))
    val prof = counts
      .groupBy(sc :+ col("pos"): _*)
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .select(sc ++ Seq(col("pos"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") /
            col("n").cast("double")) / col("n").cast("double"))
          .as("std")): _*)
    counts.join(broadcast(prof), series :+ "pos")
      .select(sc ++ Seq(col("bucket"), col("pos"), col("c"), col("mean"),
        col("std"),
        (abs(col("c").cast("double") - col("mean")) >
          lit(k) * col("std")).as("is_anomaly")): _*)
  }

}
