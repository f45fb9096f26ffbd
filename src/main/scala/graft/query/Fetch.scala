package graft.query

import graft.model.{Cf, RraDef, RrdSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-side fetch: RRA selection, window alignment, grid join, and
  * re-consolidation (SURVEY.md §2.3;
  * /root/reference/src/rrd_fetch.c:344-569, rrd_graph.c:786-956).
  */
object Fetch {

  /** Snap a requested [start, end] to the step grid the way the reference
    * does (/root/reference/src/rrd_fetch.c:445-448):
    * `start -= start % step; if (end % step) end += step - end % step`.
    */
  def align(startSec: Long, endSec: Long, stepSec: Long): (Long, Long) = {
    val s = startSec - floorMod(startSec, stepSec)
    val e = if (floorMod(endSec, stepSec) == 0) endSec
      else endSec + stepSec - floorMod(endSec, stepSec)
    (s, e)
  }
  private def floorMod(a: Long, b: Long): Long = java.lang.Math.floorMod(a, b)

  /** RRA best-match selection (/root/reference/src/rrd_fetch.c:344-441):
    * among RRAs with the requested CF (or any plain CF when pdpCnt == 1 —
    * a 1-step RRA holds raw PDPs whatever its CF), prefer full coverage of
    * [start, end] with minimal |step - requestedStep|; fall back to best
    * partial coverage (largest covered span, then smallest step delta).
    * `nowSec` stands in for last_up when computing each RRA's horizon.
    */
  def selectRra(schema: RrdSchema, cf: Cf, startSec: Long, endSec: Long,
      requestedStepSec: Long, nowSec: Long): RraDef = {
    val plain = Set[Cf](Cf.Average, Cf.Min, Cf.Max, Cf.Last)
    val candidates = schema.rras.filter(r =>
      r.cf == cf || (r.pdpCnt == 1L && plain(r.cf) && plain(cf)))
    require(candidates.nonEmpty, s"no RRA with CF $cf")
    def stepOf(r: RraDef) = schema.stepSec * r.pdpCnt
    def horizonStart(r: RraDef) = nowSec - schema.retentionSec(r)
    val full = candidates.filter(horizonStart(_) <= startSec)
    if (full.nonEmpty)
      full.minBy(r => math.abs(stepOf(r) - requestedStepSec))
    else
      candidates.maxBy(r =>
        (endSec - math.max(startSec, horizonStart(r)),
          -math.abs(stepOf(r) - requestedStepSec)))
  }

  /** Distributed end-labeled time grid: one row per step in (start, end].
    * `spark.range` partitions the grid — no driver-side materialization.
    */
  def grid(spark: SparkSession, startSec: Long, endSec: Long,
      stepSec: Long): DataFrame = {
    val n = (endSec - startSec) / stepSec
    spark.range(1, n + 1)
      .select((lit(startSec) + col("id") * stepSec).as("ts"))
  }

  /** Fetch: align the window, build the grid, left-join the rollup —
    * slots with no row become null (out-of-retention / never-written),
    * mirroring /root/reference/src/rrd_fetch.c:511-569. The join key is
    * the grid timestamp; with a broadcastable grid (bounded rows) Catalyst
    * picks a broadcast join and no extra shuffle of the rollup occurs.
    */
  def fetch(spark: SparkSession, rollup: DataFrame, tsCol: String,
      valueCols: Seq[String], startSec: Long, endSec: Long,
      stepSec: Long): DataFrame = {
    val (s, e) = align(startSec, endSec, stepSec)
    val g = grid(spark, s, e, stepSec)
    // rename the rollup's slot column: a source already named "ts" would
    // be ambiguous against the grid
    val r = rollup.select((tsCol +: valueCols).map(col): _*)
      .withColumnRenamed(tsCol, "__slot")
    g.join(r, g("ts") === col("__slot"), "left")
      .select(col("ts") +: valueCols.map(col): _*)
  }

  /** Re-consolidation to a coarser step (`rrd_reduce_data`,
    * /root/reference/src/rrd_graph.c:786-956): combine step-aligned rows
    * into buckets of `toStep`, AVERAGE over known values, MIN/MAX/LAST as
    * expected. No xff here — reduce keeps any bucket with ≥1 known value.
    */
  def reduce(df: DataFrame, series: Seq[String], tsCol: String,
      valueCol: String, toStepSec: Long, cf: Cf): DataFrame = {
    val bucket = (expr(s"($tsCol - 1) div $toStepSec") + 1) * toStepSec
    df.groupBy(series.map(col) :+ bucket.as("ts"): _*)
      .agg(graft.ingest.Consolidate
        .cfAgg(cf, col(valueCol), col(tsCol)).as(valueCol))
  }
}
