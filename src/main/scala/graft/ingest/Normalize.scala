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
    val term = termFn(rateScale)
    val intervals = intervalFrame(df, series, tsUs, rates, stepUs)
    val edges = edgePdps(intervals, series, rates, stepSec, stepUs, term)

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
          interiorPdp(out, term, stepUs).as(out),
          when(col(s"__r_$out").isNull, lit(0L)).otherwise(lit(stepUs))
            .as(s"${out}_known_us"))
        }: _*)

    edges.unionByName(interior)
  }

  /** The decimal routing that makes sums order-independent and
    * cross-engine deterministic; term(r, ov) is one contribution. */
  private def termFn(rateScale: Option[Int])
      : (Column, Column) => Column = (r, ov) => rateScale match {
    case Some(sc) => // exact: decimal rate × integer µs
      r.cast(DecimalType(18, sc)) * ov
    case None => // (38,10): rate·µs products reach ~1e18 for counters
      (r * ov).cast(DecimalType(38, 10))
  }

  /** Consecutive-sample intervals with their first/last overlapped step
    * indices. Internal names are __-prefixed so a user series column
    * named "k" or "r" cannot be captured by the explode/agg above. */
  private def intervalFrame(df: DataFrame, series: Seq[String],
      tsUs: String, rates: Seq[(String, String)],
      stepUs: Long): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy(col(tsUs))
    val t0 = lag(col(tsUs), 1).over(w)
    val t1 = col(tsUs)
    df.select(series.map(col) :+ t0.as("__t0") :+ t1.as("__t1") :++
        rates.map { case (in, out) => col(in).as(s"__r_$out") }: _*)
      // monotonicity gate (rrd_update.c:1416-1423): drop the first sample
      // of each series and any non-advancing timestamp
      .where(col("__t0").isNotNull && col("__t1") > col("__t0"))
      // step index k covers ((k-1)·S, k·S]; (t0,t1] overlaps it iff
      // k > t0/S and (k-1) < t1/S  ⇒  k ∈ [t0 div S + 1, (t1-1) div S + 1]
      .withColumn("__kf", expr(s"__t0 div $stepUs + 1"))
      .withColumn("__kl", expr(s"(__t1 - 1) div $stepUs + 1"))
  }

  /** Edge steps — the interval's first and last overlapped step, the
    * only ones a neighboring interval can also touch — through the real
    * per-step aggregation. Output: series + pdp_ts + per entry `<out>`
    * + `<out>_known_us`. */
  private def edgePdps(intervals: DataFrame, series: Seq[String],
      rates: Seq[(String, String)], stepSec: Long, stepUs: Long,
      term: (Column, Column) => Column): DataFrame =
    intervals
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

  /** The interior-step PDP scalar chain (null rate → unknown). */
  private def interiorPdp(out: String, term: (Column, Column) => Column,
      stepUs: Long): Column =
    when(col(s"__r_$out").isNull, lit(null)).otherwise(
      term(col(s"__r_$out"), lit(stepUs)).cast("double") / lit(stepUs))

  /** Fused [[pdp]] → `Consolidate.cdp`: identical output rows, one plan.
    *
    * The composed form generates the full PDP grid (12.6 M rows at
    * sf0.1, 1.26 B at the 100× replica) only to re-aggregate it
    * pdpCnt:1 immediately; profiled at sf0.1, that generate-then-reduce
    * round trip is ~1.5 s of q17's 1.8 s while the consolidation
    * aggregate over a materialized grid is 0.24 s. Here an interior
    * span explodes at CDP-WINDOW granularity — one row per touched
    * window carrying `weight` = covered steps — so the aggregation
    * input shrinks from grid-sized to ~(2·samples + touched windows).
    *
    * Bit-exactness vs the composed form (FusedCdpSpec pins all CFs,
    * both decimal routes):
    *   - edge PDP steps run the exact [[pdpAll]] edge aggregation and
    *     enter consolidation with weight 1 — the same double, cast to
    *     the same `sumType` decimal;
    *   - an interior span's window contribution is dec(v)·n, which in
    *     decimal arithmetic equals the sum of n copies of dec(v)
    *     EXACTLY, so AVERAGE sums, known counts, and the xff rule
    *     cannot diverge; MIN/MAX are weight-independent; LAST's
    *     tiebreak ordinal is the span's last covered step — the same
    *     winner the per-step form picks (per-step ordinals are unique
    *     within a series, and edge/interior steps never collide).
    *
    * Step indices must be positive (epoch time): the composed bucket
    * `(pdp_ts - 1) div cdpStep` truncates toward zero and the fused
    * ceil-division window arithmetic replays it only for k ≥ 1.
    *
    * Output: series + `cdp_ts` + `cdp` + `known_cnt`, exactly
    * `Consolidate.cdp`'s columns.
    */
  def pdpCdp(df: DataFrame, series: Seq[String], tsUs: String,
      rate: String, stepSec: Long, pdpCnt: Long, cf: graft.model.Cf,
      xff: Double, rateScale: Option[Int] = None,
      sumType: DecimalType = DecimalType(28, 10)): DataFrame = {
    val stepUs = stepSec * 1000000L
    val cdpStep = stepSec * pdpCnt
    val out = "pdp"
    val rates = Seq(rate -> out)
    val term = termFn(rateScale)
    val intervals = intervalFrame(df, series, tsUs, rates, stepUs)

    // edge PDPs with weight 1; bucket exactly as Consolidate.cdp does
    val edgeRows = edgePdps(intervals, series, rates, stepSec, stepUs, term)
      .select(series.map(col) :+
        ((expr(s"(pdp_ts - 1) div $cdpStep") + 1) * cdpStep).as("cdp_ts") :+
        col(out).as("__v") :+ lit(1L).as("__w") :+
        col("pdp_ts").as("__ord"): _*)

    // interior spans, exploded per touched CDP window: window j covers
    // steps ((j-1)·pdpCnt, j·pdpCnt], and for k ≥ 1 the composed bucket
    // formula reduces to j = ceil(k / pdpCnt)
    val spanRows = intervals
      .where(col("__kl") - col("__kf") >= 2)
      .withColumn("__a", col("__kf") + 1)
      .withColumn("__b", col("__kl") - 1)
      .withColumn("__j", explode(sequence(
        expr(s"(__a + ${pdpCnt - 1}) div $pdpCnt"),
        expr(s"(__b + ${pdpCnt - 1}) div $pdpCnt"))))
      .withColumn("__lastk", least(col("__b"), col("__j") * pdpCnt))
      .select(series.map(col) :+
        (col("__j") * cdpStep).as("cdp_ts") :+
        interiorPdp(out, term, stepUs).as("__v") :+
        (col("__lastk") -
          greatest(col("__a"), (col("__j") - 1) * pdpCnt + 1) + 1)
          .as("__w") :+
        (col("__lastk") * stepSec).as("__ord"): _*)

    val known = sum(when(col("__v").isNotNull, col("__w")))
    val cfVal = cf match {
      case graft.model.Cf.Average =>
        // weight as decimal(9,0), NOT the long's (20,0) promotion: with
        // sumType (18,10) the (20,0) product needs precision 39 and
        // Spark trims the scale to 9 — a last-ulp rounding the composed
        // form never does. (9,0) keeps p1+p2+1 ≤ 38 at scale 10: exact.
        sum(when(col("__v").isNotNull,
            col("__v").cast(sumType) * col("__w").cast(DecimalType(9, 0))))
          .cast("double") / known
      case graft.model.Cf.Min => min(col("__v"))
      case graft.model.Cf.Max => max(col("__v"))
      case graft.model.Cf.Last =>
        max_by(col("__v"), when(col("__v").isNotNull, struct(col("__ord"))))
      case other => throw new IllegalArgumentException(
        s"CF $other is not a consolidation aggregate (aberrant family)")
    }
    edgeRows.unionByName(spanRows)
      .groupBy(series.map(col) :+ col("cdp_ts"): _*)
      .agg(cfVal.as("cf_val"), coalesce(known, lit(0L)).as("known_cnt"))
      .select(series.map(col) :+ col("cdp_ts") :+
        when(lit(pdpCnt) - col("known_cnt") > lit(xff * pdpCnt), lit(null))
          .otherwise(col("cf_val")).as("cdp") :+
        col("known_cnt"): _*)
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
