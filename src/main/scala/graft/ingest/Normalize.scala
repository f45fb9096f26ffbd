package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
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
  * Spark shape: consecutive-sample intervals of one series are DISJOINT
  * in time, so a step can receive contributions from more than one
  * interval only at the interval's two EDGE steps (where a sample lands
  * mid-step). Everything strictly between them is fully covered by that
  * single interval — its PDP is the interval's rate outright, no
  * aggregation needed. The plan exploits this: only the ≤2 edge rows
  * per interval go through `explode` → shuffle → hash aggregation
  * (~2·intervals rows), while interior steps are emitted MAP-SIDE as
  * finished PDPs (no shuffle at all). With sparse samples (gap ≫ step,
  * bounded by heartbeat/step) this cuts the shuffled volume by the
  * fan-out factor — at sf0.1 events, 12.6 M exploded rows down to
  * ~0.2 M aggregated ones, and at 100 TB the shuffle stays proportional
  * to the SAMPLE count, not the grid size.
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
      stepSec: Long, rateScale: Option[Int] = None): DataFrame =
    pdpAll(df, series, tsUs, Seq(rate -> "pdp"), stepSec, rateScale)
      .withColumnRenamed("pdp_known_us", "known_us")

  /** Multi-column [[pdp]]: normalize every rate column in ONE pass.
    *
    * All rates of a sample frame share the same interval chain (the lag
    * is over the row, not the value), so per-DS invocations would
    * re-explode the same grid once per DS and then outer-join the
    * grid-sized results — one shuffle of the full step grid per DS. One
    * combined pass emits all `out` columns from a single explode with a
    * single sample-sized edge aggregation and NO join: exactly the rows
    * a per-column run joined on (series, pdp_ts) would produce,
    * bit-identically (each column's scalar chain is unchanged).
    *
    * Output: series + `pdp_ts` + per entry `<out>` (double PDP, null =
    * unknown) + `<out>_known_us` (bigint).
    */
  def pdpAll(df: DataFrame, series: Seq[String], tsUs: String,
      rates: Seq[(String, String)], stepSec: Long,
      rateScale: Option[Int] = None): DataFrame = {
    val stepUs = stepSec * 1000000L
    val w = Window.partitionBy(series.map(col): _*).orderBy(col(tsUs))
    val t0 = lag(col(tsUs), 1).over(w)
    val t1 = col(tsUs)

    // the decimal routing that makes sums order-independent and
    // cross-engine deterministic; term(r, ov) is one contribution
    def term(r: Column, ov: Column): Column = rateScale match {
      case Some(sc) => // exact: decimal rate × integer µs
        r.cast(DecimalType(18, sc)) * ov
      case None => // (38,10): rate·µs products reach ~1e18 for counters
        (r * ov).cast(DecimalType(38, 10))
    }

    // internal names are __-prefixed so a user series column named "k"
    // or "r" cannot be captured by the explode/agg below
    val intervals = df
      .select(series.map(col) :+ t0.as("__t0") :+ t1.as("__t1") :++
        rates.map { case (in, out) => col(in).as(s"__r_$out") }: _*)
      // monotonicity gate (rrd_update.c:1416-1423): drop the first sample
      // of each series and any non-advancing timestamp
      .where(col("__t0").isNotNull && col("__t1") > col("__t0"))
      // step index k covers ((k-1)·S, k·S]; (t0,t1] overlaps it iff
      // k > t0/S and (k-1) < t1/S  ⇒  k ∈ [t0 div S + 1, (t1-1) div S + 1]
      .withColumn("__kf", expr(s"__t0 div $stepUs + 1"))
      .withColumn("__kl", expr(s"(__t1 - 1) div $stepUs + 1"))

    // edge steps — the interval's first and last overlapped step, the
    // only ones a neighboring interval can also touch — go through the
    // real aggregation
    val edges = intervals
      .withColumn("__k", explode(
        when(col("__kf") === col("__kl"), array(col("__kf")))
          .otherwise(array(col("__kf"), col("__kl")))))
      .withColumn("__ov",
        least(col("__t1"), col("__k") * stepUs) -
          greatest(col("__t0"), (col("__k") - 1) * stepUs))
      .groupBy(series.map(col) :+ col("__k"): _*)
      .agg(aggExprs(rates, term).head, aggExprs(rates, term).tail: _*)
      .select(series.map(col) :+
        (col("__k") * stepSec).as("pdp_ts") :++
        rates.flatMap { case (_, out) => Seq(
          // unknown iff unknown time > step/2 (strict; reference counts
          // whole seconds, we count µs — finer, same rule)
          when(coalesce(col(s"__known_$out"), lit(0L)) <
              stepUs - stepUs / 2, lit(null))
            .otherwise(col(s"__rate_$out") / col(s"__known_$out"))
            .as(out),
          coalesce(col(s"__known_$out"), lit(0L))
            .as(s"${out}_known_us"))
        }: _*)

    // interior steps are fully covered by this one interval: emitted
    // finished, map-side, through the exact same scalar chain a
    // single-term aggregation would produce (bit-identical on both
    // decimal routes)
    val interior = intervals
      .where(col("__kl") - col("__kf") >= 2)
      .withColumn("__k",
        explode(sequence(col("__kf") + 1, col("__kl") - 1)))
      .select(series.map(col) :+
        (col("__k") * stepSec).as("pdp_ts") :++
        rates.flatMap { case (_, out) => Seq(
          when(col(s"__r_$out").isNull, lit(null)).otherwise(
            term(col(s"__r_$out"), lit(stepUs)).cast("double") /
              lit(stepUs)).as(out),
          when(col(s"__r_$out").isNull, lit(0L)).otherwise(lit(stepUs))
            .as(s"${out}_known_us"))
        }: _*)

    edges.unionByName(interior)
  }

  private def aggExprs(rates: Seq[(String, String)],
      term: (Column, Column) => Column): Seq[Column] =
    rates.flatMap { case (_, out) => Seq(
      sum(when(col(s"__r_$out").isNotNull, col("__ov")))
        .as(s"__known_$out"),
      sum(term(col(s"__r_$out"), col("__ov"))).cast("double")
        .as(s"__rate_$out"))
    }
}
