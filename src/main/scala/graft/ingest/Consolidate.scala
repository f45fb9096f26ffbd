package graft.ingest

import graft.model.Cf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CDP consolidation: a CF over `pdpCnt` consecutive PDPs with the xff
  * unknown-tolerance rule (SURVEY.md §2.2;
  * /root/reference/src/rrd_update.c:2006-2141, xff test at 2040-2045):
  *
  *   CDP unknown  iff  unknown_pdp_cnt > pdp_cnt · xff      (strict)
  *   AVERAGE divides by the number of *known* PDPs
  *   MIN/MAX/LAST over the known PDPs
  *
  * One hash aggregation on (series, cdp bucket): partial (map-side)
  * aggregation then a shuffle that carries one row per output bucket —
  * the plan scales linearly and the shuffle is the minimum possible.
  *
  * Determinism: AVERAGE sums route through DECIMAL(38,20) so the result
  * is independent of partial-aggregation order and matches the DuckDB
  * oracle bit-exactly (see SparkEntry's `dsumOverCount` note).
  */
object Consolidate {

  /** Exact, order-independent sum: cast to decimal, sum, back to double.
    *
    * Scale choice matters two ways: 10 fractional digits round away the
    * binary representation error of few-decimal inputs (95.78 casts to
    * the clean decimal in every engine — the cross-engine oracle
    * contract), while small derived values (PDP rates ~1e-3) need the
    * wider scale 20 to keep 7 significant digits through a consolidation
    * (the reference-golden contract). Default is the oracle scale.
    */
  def dsum(c: Column,
      t: DecimalType = DecimalType(28, 10)): Column =
    sum(c.cast(t)).cast("double")

  /** Apply `cf` over known values of `v`; `ord` breaks LAST ties.
    *
    * `exactSums = false` is the opt-in DOUBLE-sum fast path for
    * non-oracle pipelines: it skips the decimal round-trip entirely,
    * which makes AVERAGE partial-aggregation-order-DEPENDENT in the
    * last ulps (a repartition or AQE re-plan can change the final bits).
    * Every oracle-anchored query stays on the exact route — the
    * cross-engine hash gate is the whole point of the decimal contract.
    * Prefer shrinking `sumType` to precision ≤ 18 first (compact-long
    * decimals, no BigDecimal allocation) when the value range allows;
    * it keeps exactness and captures most of the win (see SCALE.md).
    */
  def cfAgg(cf: Cf, v: Column, ord: Column,
      sumType: DecimalType = DecimalType(28, 10),
      exactSums: Boolean = true): Column = cf match {
    case Cf.Average if exactSums => dsum(v, sumType) / count(v)
    case Cf.Average => sum(v) / count(v)
    case Cf.Min => min(v)
    case Cf.Max => max(v)
    case Cf.Last => max_by(v, when(v.isNotNull, struct(ord))) // last known
    case other => throw new IllegalArgumentException(
      s"CF $other is not a consolidation aggregate (aberrant family)")
  }

  /** Consolidate end-labeled PDPs (`pdpTs` epoch sec on the `stepSec`
    * grid) into CDPs of `pdpCnt` steps. Output: series + `cdp_ts`
    * (end-labeled epoch sec) + `cdp` (null = unknown by xff) +
    * `known_cnt`.
    */
  def cdp(df: DataFrame, series: Seq[String], pdpTs: String, pdp: String,
      stepSec: Long, pdpCnt: Long, cf: Cf, xff: Double,
      sumType: DecimalType = DecimalType(28, 10),
      exactSums: Boolean = true): DataFrame = {
    val cdpStep = stepSec * pdpCnt
    val bucket = (expr(s"($pdpTs - 1) div $cdpStep") + 1) * cdpStep
    df.groupBy(series.map(col) :+ bucket.as("cdp_ts"): _*)
      .agg(
        cfAgg(cf, col(pdp), col(pdpTs), sumType, exactSums).as("cf_val"),
        count(col(pdp)).as("known_cnt"))
      .select(series.map(col) :+ col("cdp_ts") :+
        // xff: unknown PDPs (incl. grid slots with no row at all) vs budget
        when(lit(pdpCnt) - col("known_cnt") > lit(xff * pdpCnt), lit(null))
          .otherwise(col("cf_val")).as("cdp") :+
        col("known_cnt"): _*)
  }

  /** Multi-column [[cdp]]: consolidate every PDP column of a shared
    * frame in ONE aggregation. The per-column form aggregated the same
    * grid once per DS and outer-joined bucket-grained frames (one
    * shuffle per DS); all columns share the bucket key, so a combined
    * groupBy produces identical rows with a single shuffle and no join
    * (each column keeps its own known count for the xff rule). Output:
    * series + `cdp_ts` + one `<out>` column per entry.
    */
  def cdpAll(df: DataFrame, series: Seq[String], pdpTs: String,
      pdps: Seq[(String, String)], stepSec: Long, pdpCnt: Long, cf: Cf,
      xff: Double,
      sumType: DecimalType = DecimalType(28, 10)): DataFrame = {
    val cdpStep = stepSec * pdpCnt
    val bucket = (expr(s"($pdpTs - 1) div $cdpStep") + 1) * cdpStep
    val aggs = pdps.flatMap { case (in, out) => Seq(
      cfAgg(cf, col(in), col(pdpTs), sumType).as(s"__cf_$out"),
      count(col(in)).as(s"__kn_$out")) }
    df.groupBy(series.map(col) :+ bucket.as("cdp_ts"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(series.map(col) :+ col("cdp_ts") :++
        pdps.map { case (_, out) =>
          when(lit(pdpCnt) - col(s"__kn_$out") > lit(xff * pdpCnt),
            lit(null)).otherwise(col(s"__cf_$out")).as(out)
        }: _*)
  }
}
