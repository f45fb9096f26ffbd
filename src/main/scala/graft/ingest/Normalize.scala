package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PDP normalization: realign irregular samples onto the fixed step grid
  * (SURVEY.md §2.2; normative doc /root/reference/doc/rrd_pdpcalc.pod;
  * code /root/reference/src/rrd_update.c:1599-1651,1739-1783).
  *
  * Each consecutive sample pair defines a coverage interval (t0, t1] with
  * one rate value; the interval is split across step boundaries with
  * time-overlap weights (`pre_int`/`post_int` in the reference), and each
  * step's PDP is the time-weighted average of the known rate seconds:
  *
  *   pdp(step k) = Σ rate·overlap / Σ known_overlap
  *   unknown iff unknown_time > step/2          (rrd_update.c:1775-1783)
  *
  * The heartbeat gate already ran in [[Rates]] (null rate ⇒ the whole
  * interval counts as unknown time).
  *
  * Spark shape: `explode(sequence(...))` fans each interval out to the
  * steps it overlaps, then one hash aggregation on (series, step). At
  * 100 TB this is a map-side expand (bounded by gap/step, itself bounded
  * by heartbeat/step) followed by a single shuffle on the grid key —
  * partial aggregation keeps the shuffle small (one row per series·step).
  */
object Normalize {

  /** PDPs on the `stepSec` grid, end-labeled: the PDP stamped `t` covers
    * (t-step, t]. Output: series columns + `pdp_ts` (epoch sec, bigint) +
    * `pdp` (double, null = unknown) + `known_us` (bigint).
    *
    * @param rateScale when the rate column is known to carry at most this
    *   many decimal digits (e.g. GAUGE over 2-decimal inputs), the
    *   rate·overlap products are summed as exact decimals — fully
    *   order-independent and bit-reproducible. Default: decimal-routed at
    *   scale 10 (deterministic to the last bit only when the scaled
    *   product stays under 2^53 — fine for typical rates).
    */
  def pdp(df: DataFrame, series: Seq[String], tsUs: String, rate: String,
      stepSec: Long, rateScale: Option[Int] = None): DataFrame = {
    val stepUs = stepSec * 1000000L
    val w = Window.partitionBy(series.map(col): _*).orderBy(col(tsUs))
    val t0 = lag(col(tsUs), 1).over(w)
    val t1 = col(tsUs)

    // internal names are __-prefixed so a user series column named "k"
    // or "r" cannot be captured by the explode/agg below
    val intervals = df
      .select(series.map(col) :+ t0.as("__t0") :+ t1.as("__t1") :+
        col(rate).as("__r"): _*)
      // monotonicity gate (rrd_update.c:1416-1423): drop the first sample
      // of each series and any non-advancing timestamp
      .where(col("__t0").isNotNull && col("__t1") > col("__t0"))
      // step index k covers ((k-1)·S, k·S]; (t0,t1] overlaps it iff
      // k > t0/S and (k-1) < t1/S  ⇒  k ∈ [t0 div S + 1, (t1-1) div S + 1]
      .withColumn("__k",
        explode(sequence(expr(s"__t0 div $stepUs + 1"),
          expr(s"(__t1 - 1) div $stepUs + 1"))))
      .withColumn("__ov",
        least(col("__t1"), col("__k") * stepUs) -
          greatest(col("__t0"), (col("__k") - 1) * stepUs))

    intervals
      .groupBy(series.map(col) :+ col("__k"): _*)
      .agg(
        sum(when(col("__r").isNotNull, col("__ov"))).as("__known"),
        // decimal-routed: order-independent, deterministic across engines
        (rateScale match {
          case Some(sc) => // exact: decimal rate × integer µs
            sum(col("__r").cast(DecimalType(18, sc)) * col("__ov"))
          case None => // (38,10): rate·µs products reach ~1e18 for counters
            sum((col("__r") * col("__ov")).cast(DecimalType(38, 10)))
        }).cast("double").as("__rate"))
      .select(series.map(col) :+
        (col("__k") * stepSec).as("pdp_ts") :+
        // unknown iff unknown time > step/2 (strict; reference counts whole
        // seconds, we count µs — finer, same rule)
        when(coalesce(col("__known"), lit(0L)) < stepUs - stepUs / 2,
          lit(null)).otherwise(col("__rate") / col("__known")).as("pdp") :+
        coalesce(col("__known"), lit(0L)).as("known_us"): _*)
  }
}
