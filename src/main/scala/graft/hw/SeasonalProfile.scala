package graft.hw

import org.apache.spark.sql.{Column, DataFrame}
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
  * shuffles (bucket counts, then position profiles), a profile join
  * back, no per-sample recurrence anywhere.
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
  * Profile-join sizing: the profile is #series × period rows — tiny at
  * any telemetry scale measured, but unbounded in series cardinality,
  * so the join carries NO unconditional broadcast hint. AQE re-plans
  * it from the profile exchange's MEASURED size at runtime: broadcast
  * under `spark.sql.adaptive.autoBroadcastJoinThreshold`, plain
  * shuffle join past it (the 10⁸-series case) — bit-identical output
  * either way (spec-pinned both ways).
  */
object SeasonalProfile {

  /** One row per OBSERVED bucket: empty hours are absent from both the
    * profile denominator and the output — a series that goes silent
    * can never flag here. For outage detection use
    * [[anomaliesGapFilled]], which makes missing buckets explicit the
    * way the reference's dense PDP grid does.
    */
  def anomalies(events: DataFrame, series: Seq[String], tsSecCol: String,
      bucketSec: Long, period: Int, k: Double): DataFrame = {
    require(bucketSec > 0 && period > 0 && k >= 0,
      s"bucketSec=$bucketSec, period=$period, k=$k")
    val counts = bucketCounts(events, series, tsSecCol, bucketSec)
      .withColumn("pos", pmod(col("bucket"), lit(period.toLong)))
    profiled(counts, series, k)
  }

  /** Gap-filled variant — the outage detector: a dense per-series
    * bucket grid over the GLOBAL observed [min, max] span left-joins
    * the observed counts, so an empty bucket becomes an explicit
    * zero-count row that (a) enters its position's profile denominator
    * and (b) can flag. A series that goes silent — the anomaly class
    * the reference's FAILURES chain exists for, visible there because
    * the gridded PDP series makes missing data explicit
    * (/root/reference/src/rrd_fetch.c:511-569 null-fills the fetch
    * grid the same way) — flags here when its zero sits more than
    * k·std below its position's mean.
    *
    * Scale shape: output is DENSE — #series × nBuckets rows, the same
    * cardinality the reference's RRA would store for the span. The
    * span pre-flight is one two-long agg to the driver (the xport cap
    * idiom) and gates the grid LOUDLY; the grid itself generates
    * distributedly via a two-level chunked `sequence` explode (≤4096
    * elements per generated array, never one span-sized array per
    * series row).
    */
  def anomaliesGapFilled(events: DataFrame, series: Seq[String],
      tsSecCol: String, bucketSec: Long, period: Int, k: Double,
      maxGridBuckets: Long = 1L << 20): DataFrame = {
    require(bucketSec > 0 && period > 0 && k >= 0,
      s"bucketSec=$bucketSec, period=$period, k=$k")
    val sc = series.map(col)
    val ev = events.where(col(tsSecCol) >= 0)
      .withColumn("bucket", expr(s"`$tsSecCol` div ${bucketSec}L"))
    val counts0 = ev.groupBy(sc :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))
    val span = ev.agg(min(col("bucket")), max(col("bucket"))).head()
    // empty input: an empty series set makes the grid (and output)
    // empty through the same plan — no special-case schema
    val (minB, maxB) =
      if (span.isNullAt(0)) (0L, 0L)
      else (span.getLong(0), span.getLong(1))
    val nBuckets = maxB - minB + 1
    require(nBuckets <= maxGridBuckets,
      s"gap-filled grid spans $nBuckets buckets > " +
        s"maxGridBuckets=$maxGridBuckets (output is #series x " +
        "nBuckets rows BY DESIGN) — coarsen bucketSec, narrow the " +
        "input window, or raise the cap deliberately")
    val chunk = 4096L
    val seriesDf = ev.select(sc: _*).distinct()
    val grid = seriesDf
      .withColumn("__c0",
        explode(expr(s"sequence(${minB}L, ${maxB}L, ${chunk}L)")))
      .withColumn("bucket", explode(expr(
        s"sequence(__c0, least(__c0 + ${chunk - 1}L, ${maxB}L))")))
      .drop("__c0")
    val counts = grid.join(counts0, series :+ "bucket", "left")
      .select(sc ++ Seq(col("bucket"),
        coalesce(col("c"), lit(0L)).as("c")): _*)
      .withColumn("pos", pmod(col("bucket"), lit(period.toLong)))
    // The profile NEVER touches the dense frame: zero-count buckets
    // contribute nothing to Σc/Σc², so the integer sums aggregate the
    // OBSERVED counts only (corpus-sized, not grid-sized), and the
    // dense denominator n — the number of span buckets at each
    // position — is closed-form from (minB, maxB, period). Same longs,
    // same single IEEE divides, bit-identical to aggregating the
    // dense grid (the oracle does the latter; spec-pinned parity) —
    // but the expensive grid join runs ONCE, on the probe side only,
    // instead of once per join tree (measured 5.0-6.0× → ~3× at the
    // 100× replica ScaleBench row).
    // Both floor-div numerators sit in [-period, ∞) for the
    // non-negative bucket domain; one +period shift makes them
    // non-negative so truncating `div` IS floor division, and the
    // shifts cancel in the difference.
    val nExpr = expr(
      s"((${maxB}L - pos + ${period}L) div ${period}L) - " +
        s"((${minB - 1}L - pos + ${period}L) div ${period}L)")
    val obs = counts0
      .withColumn("pos", pmod(col("bucket"), lit(period.toLong)))
      .groupBy(sc :+ col("pos"): _*)
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("ss"))
    val prof = seriesDf
      .withColumn("pos", explode(expr(s"sequence(0L, ${period - 1}L)")))
      .join(obs, series :+ "pos", "left")
      .select(sc ++ Seq(col("pos"),
        coalesce(col("s"), lit(0L)).as("s"),
        coalesce(col("ss"), lit(0L)).as("ss")): _*)
      .withColumn("n", nExpr)
      .select(sc ++ Seq(col("pos"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") /
            col("n").cast("double")) / col("n").cast("double"))
          .as("std")): _*)
    counts.join(prof, series :+ "pos")
      .select(sc ++ Seq(col("bucket"), col("pos"), col("c"), col("mean"),
        col("std"),
        (abs(col("c").cast("double") - col("mean")) >
          lit(k) * col("std")).as("is_anomaly")): _*)
  }

  /** Median/MAD ROBUST variant of [[anomalies]] — the mean/std profile
    * is itself distorted by the outliers it hunts (one huge spike
    * inflates std enough to mask the next one; the classic breakdown
    * of moment-based detection the robust-statistics literature fixes
    * with the median absolute deviation): per (series, position) the
    * profile is the exact MEDIAN count and the exact MAD, and a bucket
    * flags when |c − med| > k · 1.4826 · MAD (1.4826 ≈ 1/Φ⁻¹(3/4), the
    * consistency constant making MAD comparable to σ under normality).
    *
    * Exactness: counts are integers, the median is the rank-⌈n/2⌉
    * VALUE (an integer — [[graft.ext.Curation.exactQuantilesPerGroups]],
    * the bounded typed aggregate, composite (series…, pos) key), so
    * |c − med| and the MAD are integers too; the only floating point
    * is the final (k · 1.4826) · MAD product — literal-exact in both
    * engines, compared MULTIPLICATIVELY (no z division → no NaN; a
    * zero-MAD position, where a strict majority of counts are
    * identical, flags ANY deviation — the documented sharp edge of
    * MAD detection, and exactly reproducible cross-engine because the
    * comparison is integer > 0).
    *
    * Scale shape: one bucket-count shuffle, then two bounded-aggregate
    * passes whose per-group state is the (series, position) bucket
    * list (≤ span/period values — loud maxSlots), and two
    * AQE-size-gated profile joins. No per-sample recurrence.
    *
    * Output: (series…, bucket, pos, c, med, mad, is_anomaly). */
  def robustAnomalies(events: DataFrame, series: Seq[String],
      tsSecCol: String, bucketSec: Long, period: Int,
      k: Double): DataFrame = {
    require(bucketSec > 0 && period > 0 && k >= 0,
      s"bucketSec=$bucketSec, period=$period, k=$k")
    val sc = series.map(col)
    val counts = bucketCounts(events, series, tsSecCol, bucketSec)
      .withColumn("pos", pmod(col("bucket"), lit(period.toLong)))
    val keys = series :+ "pos"
    val med = graft.ext.Curation.exactQuantilesPerGroups(
      counts, keys, col("c"), Seq(("med", 0.5)))
    val withMed = counts.join(med, keys)
      .withColumn("adev", abs(col("c") - col("med")))
    val mad = graft.ext.Curation.exactQuantilesPerGroups(
      withMed, keys, col("adev"), Seq(("mad", 0.5)))
    withMed.join(mad, keys)
      .select(sc ++ Seq(col("bucket"), col("pos"), col("c"), col("med"),
        col("mad"),
        (col("adev").cast("double") >
          lit(k) * lit(1.4826) * col("mad").cast("double"))
          .as("is_anomaly")): _*)
  }

  /** Observed (series, bucket) event counts — integer, partial-agg'd. */
  private def bucketCounts(events: DataFrame, series: Seq[String],
      tsSecCol: String, bucketSec: Long): DataFrame =
    events
      // non-negative time domain, enforced in the operator (and
      // mirrored by the oracle): below zero, truncating vs flooring
      // div and pmod-vs-C-modulo would bucket/position the two engines
      // differently — pre-epoch telemetry is out of contract here
      .where(col(tsSecCol) >= 0)
      .withColumn("bucket", expr(s"`$tsSecCol` div ${bucketSec}L"))
      .groupBy(series.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))

  /** Shared profile + flag stage over (series…, bucket, c, pos) rows:
    * exact-integer position profiles, then the multiplicative k·std
    * flag. The profile join is deliberately hint-free — see the object
    * doc for the AQE size gate. (package-visible: the streaming
    * complement feeds it the micro-batch-emitted counts.) */
  private[graft] def profiled(counts: DataFrame, series: Seq[String],
      k: Double): DataFrame = {
    val sc = series.map(col)
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
    counts.join(prof, series :+ "pos")
      .select(sc ++ Seq(col("bucket"), col("pos"), col("c"), col("mean"),
        col("std"),
        (abs(col("c").cast("double") - col("mean")) >
          lit(k) * col("std")).as("is_anomaly")): _*)
  }

}
