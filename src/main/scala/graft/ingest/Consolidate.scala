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
  * Determinism: AVERAGE sums route through DECIMAL(38,10) so the result
  * is independent of partial-aggregation order and matches the DuckDB
  * oracle bit-exactly (see SparkEntry's `dsumOverCount` note).
  */
object Consolidate {

  /** Exact, order-independent sum: cast to decimal, sum, back to double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 10))).cast("double")

  /** Apply `cf` over known values of `v`; `ord` breaks LAST ties. */
  def cfAgg(cf: Cf, v: Column, ord: Column): Column = cf match {
    case Cf.Average => dsum(v) / count(v)
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
      stepSec: Long, pdpCnt: Long, cf: Cf, xff: Double): DataFrame = {
    val cdpStep = stepSec * pdpCnt
    val bucket = (expr(s"($pdpTs - 1) div $cdpStep") + 1) * cdpStep
    df.groupBy(series.map(col) :+ bucket.as("cdp_ts"): _*)
      .agg(
        cfAgg(cf, col(pdp), col(pdpTs)).as("cf_val"),
        count(col(pdp)).as("known_cnt"))
      .select(series.map(col) :+ col("cdp_ts") :+
        // xff: unknown PDPs (incl. grid slots with no row at all) vs budget
        when(lit(pdpCnt) - col("known_cnt") > lit(xff * pdpCnt), lit(null))
          .otherwise(col("cf_val")).as("cdp") :+
        col("known_cnt"): _*)
  }
}
