package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** VDEF aggregates: series → scalar (+timestamp) (SURVEY.md §2.5;
  * /root/reference/src/rrd_graph.c:5863-6119). All twelve ops.
  *
  * Input convention: a grid-aligned series frame — one row per slot,
  * end-labeled `ts` (epoch sec), nullable `v`. `steps` = total slot count
  * (nulls included), matching the reference's `(end-start)/step`.
  *
  * Determinism: sums route through DECIMAL(28,10) (exact for ≤2-decimal
  * inputs, and x·v / v² products of such inputs), so every scalar is a
  * fixed IEEE formula over exact sums — bit-reproducible across engines.
  * One shuffle per series; everything is partial-aggregated map-side.
  */
object Vdef {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast("double")

  /** AVERAGE / TOTAL / STDEV(population) / LSLSLOPE / LSLINT / LSLCORREL
    * as aggregate expressions (use inside a groupBy(series).agg(...)).
    * The timestamp-carrying ops (MAXIMUM/MINIMUM/FIRST/LAST) need a
    * window pass — see SparkEntry q06.
    */
  def average(v: Column): Column = dsum(v) / count(v)
  def total(v: Column, stepSec: Long): Column = dsum(v) * stepSec
  /** Population stddev via exact moments (ref does a two-pass Σ(x-avg)²;
    * same value, deterministic formula — rrd_graph.c:5987-5997). */
  def stdev(v: Column): Column = {
    val c = count(v).cast("double")
    val m1 = dsum(v) / c
    when(count(v) === 0, lit(null))
      .otherwise(sqrt(dsum(v * v) / c - m1 * m1))
  }

  /** Least-squares family over (slot index, value), NaN rows skipped but
    * keeping their x (rrd_graph.c:6065-6115). `x` must be the 0-based
    * slot index column. */
  def lslExprs(x: Column, v: Column): Map[String, Column] = {
    val known = v.isNotNull
    val cnt = count(v).cast("double")
    val sx = sum(when(known, x)).cast("double")
    val sxx = sum(when(known, x * x)).cast("double")
    val sy = dsum(v)
    val syy = dsum(v * v)
    val sxy = dsum(when(known, x.cast("double") * v))
    val slope = (sx * sy - cnt * sxy) / (sx * sx - cnt * sxx)
    val intercept = (sy - slope * sx) / cnt
    val correl = (sxy - (sx * sy) / cnt) /
      sqrt((sxx - (sx * sx) / cnt) * (syy - (sy * sy) / cnt))
    Map("lslslope" -> slope, "lslint" -> intercept, "lslcorrel" -> correl)
  }

  /** PERCENT (NaN-in-population, NaN sorts lowest) and PERCENTNAN
    * (known-only): 0-based index round(p·(n-1)/100) into the sorted
    * series (rrd_graph.c:5882-5939). Aggregate-expression forms:
    * `steps` must be the total-slot count expression, e.g. count(lit(1)).
    */
  def percent(v: Column, steps: Column, p: Double): Column = {
    val nulls = steps - count(v)
    val field = round(lit(p) * (steps.cast("double") - 1) / 100.0, 0)
      .cast("long")
    val kth = (field - nulls + 1).cast("int") // 1-based among known
    when(field < nulls, lit(null))
      .otherwise(element_at(array_sort(collect_list(v)), kth))
  }
  def percentNan(v: Column, p: Double): Column = {
    val field = round(lit(p) * (count(v).cast("double") - 1) / 100.0, 0)
      .cast("int")
    when(count(v) === 0, lit(null))
      .otherwise(element_at(array_sort(collect_list(v)), field + 1))
  }
}
