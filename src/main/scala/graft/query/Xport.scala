package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XPORT / SHIFT: the tabular multi-series output frame (SURVEY.md §2.3;
  * /root/reference/src/rrd_xport.c:260-430) and constant time-shift
  * (/root/reference/src/rrd_graph.c:1142-1163).
  */
object Xport {

  /** Time-shift a series frame: the value observed at t is presented at
    * t + shift (shift truncated to a step multiple by the caller, per
    * rrd_graph_helper.c:1822). */
  def shift(df: DataFrame, ts: String, shiftSec: Long): DataFrame =
    df.withColumn(ts, col(ts) + shiftSec)

  /** Common step of multiple series = gcd of their steps
    * (`rrd_lcd`, /root/reference/src/rrd_graph.c:1100-1116). */
  def commonStep(steps: Seq[Long]): Long = steps.reduce(gcd)
  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Build the xport frame: one row per slot of the common grid, one
    * column per named series, aligned by left joins (null = unknown,
    * rrd_xport.c:413-424). Each input is (ts, value) grid-aligned.
    * The grid side is a bounded `spark.range` — Catalyst broadcasts it;
    * each series joins without re-shuffling the grid.
    */
  def frame(spark: SparkSession, series: Map[String, DataFrame], ts: String,
      value: String, startSec: Long, endSec: Long,
      stepSec: Long): DataFrame = {
    val grid = Fetch.grid(spark, startSec, endSec, stepSec)
    series.foldLeft(grid) { case (acc, (name, df)) =>
      val s = df.select(col(ts).as(s"__ts_$name"), col(value).as(name))
      acc.join(s, acc("ts") === s(s"__ts_$name"), "left")
        .drop(s"__ts_$name")
    }
  }

  /** Pivot a long (key, ts, v) frame into xport columns in one hash
    * aggregation — the scalable form when all series share a source
    * (no per-series join chain; one shuffle on ts). */
  def pivotFrame(long: DataFrame, key: String, ts: String, value: String,
      names: Seq[String]): DataFrame = {
    val aggs = names.map(n =>
      max(when(col(key) === n, col(value))).as(n))
    long.groupBy(col(ts)).agg(aggs.head, aggs.tail: _*)
  }
}
