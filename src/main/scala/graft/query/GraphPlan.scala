package graft.query

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The gdes pipeline as a planner API (SURVEY.md §2.3/§3.3;
  * /root/reference/src/rrd_graph.c:962-1325 data_fetch + data_calc):
  * DEF binds vnames to fetched series, CDEF evaluates RPN over
  * time-aligned inputs, VDEF reduces a series to a (value, time) scalar
  * that later CDEFs consume as a constant (rrd_graph.c:1201-1210), SHIFT
  * displaces a series, XPORT assembles the common-grid frame.
  *
  * Reference semantics kept:
  *   - single forward pass: a vname may only reference earlier vnames
  *     (rrd_graph.c:1135-1139);
  *   - identical DEF fetches are shared, not re-read
  *     (rrd_graph.c:973-987 fetch dedup);
  *   - mixed-step CDEF inputs resample onto the gcd step, coarser series
  *     repeating their value across the finer slots
  *     (rrd_lcd at rrd_graph.c:1100-1116; repeat at rrd_rpncalc.c:674-676).
  *
  * Beyond the reference: `keyCols` makes the plan **multi-series** — one
  * reference "graph" evaluated per key (the 100 TB shape: a fleet of
  * rrdtool invocations as ONE partitioned dataflow). Every join carries
  * the key columns and every window function partitions by them, so no
  * stage serializes through a single partition (the round-2 `WindowExec:
  * No Partition Defined` risk). VDEFs become per-key aggregates that
  * substitute into later CDEFs via a key join instead of a literal.
  * PRINT stays single-series (a print line is one scalar by definition —
  * keyed plans read [[keyedScalarOf]] instead).
  *
  * Plan shape: every series is a grid frame (keys…, ts, value) built
  * from `spark.range` grids and broadcastable joins; CDEFs stay single
  * whole-stage projections; only unkeyed VDEFs materialize (two tiny
  * aggregate jobs each) — the DataFrame program mirrors the gdes DAG
  * 1:1 and Catalyst is the optimizer (SURVEY §3.3).
  */
object GraphPlan {
  /** One bound series: frame (keys…, ts, v) on the (startSec, endSec]
    * grid of `step`. */
  final case class Series(df: DataFrame, step: Long)
  /** A VDEF result: value + its timestamp (end-labeled slot). */
  final case class Scalar(value: Option[Double], tsSec: Option[Long])
}

final class GraphPlan(spark: SparkSession, startSec: Long, endSec: Long,
    timeZone: String = "UTC", keyCols: Seq[String] = Nil) {
  import GraphPlan.{Series, Scalar}

  private val series = mutable.LinkedHashMap.empty[String, Series]
  private val scalars = mutable.LinkedHashMap.empty[String, Scalar]
  // keyed plans: VDEF name -> (keys…, <name>) aggregate frame
  private val keyedScalars = mutable.LinkedHashMap.empty[String, DataFrame]
  private val defCache = mutable.HashMap.empty[Any, DataFrame]

  private def joinKeys: Seq[String] = keyCols :+ "ts"

  def seriesOf(vname: String): Series = series(vname)
  def scalarOf(vname: String): Scalar = scalars(vname)
  /** Per-key VDEF frame (keys…, value) — keyed plans only. */
  def keyedScalarOf(vname: String): DataFrame = keyedScalars(vname)

  /** DEF: bind a rollup (tsCol end-labeled, valueCol) fetched onto the
    * plan window at `step`. On keyed plans the rollup must carry the key
    * columns; the grid is keys × slots. `key` drives fetch dedup — DEFs
    * with the same key share one aligned frame. */
  def define(vname: String, rollup: DataFrame, tsCol: String,
      valueCol: String, step: Long, key: Any = null): GraphPlan = {
    val cacheKey = if (key != null) key else (rollup, tsCol, valueCol, step)
    val aligned = defCache.getOrElseUpdate(cacheKey, {
      if (keyCols.isEmpty)
        Fetch.fetch(spark, rollup.select(col(tsCol), col(valueCol)),
          tsCol, Seq(valueCol), startSec, endSec, step)
      else {
        val (s0, e0) = Fetch.align(startSec, endSec, step)
        val keys = rollup.select(keyCols.map(col): _*).distinct()
        val grid = Fetch.grid(spark, s0, e0, step).crossJoin(keys)
        val r = rollup
          .select((keyCols :+ tsCol :+ valueCol).map(col): _*)
          .withColumnRenamed(tsCol, "ts")
        grid.join(r, joinKeys, "left")
      }
    })
    series(vname) = Series(
      aligned.select((keyCols :+ "ts").map(col) :+
        col(valueCol).as(vname): _*), step)
    this
  }

  /** DEF over an already grid-aligned (keys…, ts, value) frame at
    * `step`. */
  def defineAligned(vname: String, frame: DataFrame, valueCol: String,
      step: Long): GraphPlan = {
    series(vname) = Series(
      frame.select((keyCols :+ "ts").map(col) :+
        col(valueCol).as(vname): _*), step)
    this
  }

  /** CDEF: RPN over earlier vnames; VDEF names substitute as constants
    * (literals on unkeyed plans, a key join on keyed ones). Result step
    * = gcd of the referenced series' steps. */
  def cdef(vname: String, rpn: String): GraphPlan = {
    val tokens = graft.rpn.RToken.tokenize(rpn)
    val refs = tokens.collect {
      case graft.rpn.RToken.Var(n) if series.contains(n) => n
      case graft.rpn.RToken.PrevVar(n) if series.contains(n) => n
    }.distinct
    require(refs.nonEmpty || keyCols.isEmpty,
      s"CDEF $vname references no series: a keyed plan cannot infer its keys")
    val step =
      if (refs.isEmpty) series.values.map(_.step).reduceOption(gcd)
        .getOrElse(endSec - startSec)
      else refs.map(series(_).step).reduce(gcd)
    val frame0 = refs.map(n => resampled(n, step))
      .reduceOption(_.join(_, joinKeys))
      .getOrElse(Fetch.grid(spark, startSec, endSec, step))
    // keyed VDEF references join in as per-key columns
    val keyedRefs = tokens.collect {
      case graft.rpn.RToken.Var(n) if keyedScalars.contains(n) => n
    }.distinct
    val frame = keyedRefs.foldLeft(frame0)((f, n) =>
      f.join(keyedScalars(n), keyCols, "left"))
    val w = if (keyCols.isEmpty) Window.orderBy(col("ts"))
      else Window.partitionBy(keyCols.map(col): _*).orderBy(col("ts"))
    val ctx = graft.rpn.RpnCompiler.Ctx(
      series = refs.map(n => n -> col(n)).toMap ++
        scalars.map { case (n, s) =>
          n -> s.value.map(lit(_).cast("double"))
            .getOrElse(lit(null).cast("double"))
        } ++ keyedRefs.map(n => n -> col(n)),
      tsSec = col("ts"), stepSec = step, window = w, timeZone = timeZone)
    val out = frame.withColumn(vname,
      graft.rpn.RpnCompiler.compileTokens(tokens, ctx))
    series(vname) = Series(
      out.select((keyCols :+ "ts").map(col) :+ col(vname): _*), step)
    this
  }

  /** SHIFT: present src's value observed at t at t+shift
    * (rrd_graph.c:1142-1163; shift pre-truncated to a step multiple). */
  def shift(vname: String, src: String, shiftSec: Long): GraphPlan = {
    val s = series(src)
    val moved = Xport.shift(
      s.df.withColumnRenamed(src, vname), "ts", shiftSec)
    // re-window onto the plan grid (slots shifted out become unknown)
    val grid =
      if (keyCols.isEmpty) Fetch.grid(spark, startSec, endSec, s.step)
      else Fetch.grid(spark, startSec, endSec, s.step)
        .crossJoin(s.df.select(keyCols.map(col): _*).distinct())
    series(vname) = Series(grid.join(moved, joinKeys, "left"), s.step)
    this
  }

  /** VDEF: reduce a series to (value, time) (rrd_graph.c:5863-6119).
    * `op` is the VDEF name: MAXIMUM MINIMUM AVERAGE STDEV TOTAL FIRST
    * LAST PERCENT PERCENTNAN LSLSLOPE LSLINT LSLCORREL.
    *
    * Unkeyed plans collect the scalar (two tiny driver jobs, as the
    * reference's vdef_calc). Keyed plans stay distributed: ONE groupBy
    * over the key columns, no driver value. */
  def vdef(vname: String, src: String, op: String,
      param: Double = Double.NaN): GraphPlan = {
    val s = series(src)
    val v = col(src)
    if (keyCols.nonEmpty) {
      val x = ((col("ts") - startSec) / s.step - 1).cast("long")
      val agg: Column = op match {
        case "MAXIMUM" => max(v)
        case "MINIMUM" => min(v)
        case "AVERAGE" => Vdef.average(v)
        case "STDEV" => Vdef.stdev(v)
        case "TOTAL" => Vdef.total(v, s.step)
        case "FIRST" => min_by(v, when(v.isNotNull, col("ts")))
        case "LAST" => max_by(v, when(v.isNotNull, col("ts")))
        case "PERCENT" => Vdef.percent(v, param)
        case "PERCENTNAN" => Vdef.percentNan(v, param)
        case "LSLSLOPE" | "LSLINT" | "LSLCORREL" =>
          Vdef.lslExprs(x, v)(op.toLowerCase)
        case other => throw new IllegalArgumentException(s"VDEF op $other")
      }
      keyedScalars(vname) = s.df.groupBy(keyCols.map(col): _*)
        .agg(agg.as(vname))
      return this
    }
    def one(c: Column): Option[Double] =
      Option(s.df.agg(c).first().get(0)).map {
        case d: java.lang.Double => d.doubleValue
        case other => other.toString.toDouble
      }
    def extreme(isMax: Boolean): Scalar = {
      val ext = one(if (isMax) max(v) else min(v))
      ext match {
        case None => Scalar(None, None)
        case Some(x) =>
          val t = s.df.where(v === x).agg(min(col("ts"))).first().getLong(0)
          Scalar(Some(x), Some(t))
      }
    }
    val res = op match {
      case "MAXIMUM" => extreme(isMax = true)
      case "MINIMUM" => extreme(isMax = false)
      case "AVERAGE" => Scalar(one(Vdef.average(v)), None)
      case "STDEV" => Scalar(one(Vdef.stdev(v)), None)
      case "TOTAL" => Scalar(one(Vdef.total(v, s.step)), None)
      case "FIRST" => // first known value; reports interval start
        val r = s.df.where(v.isNotNull).orderBy(col("ts")).limit(1)
          .select(v, col("ts")).collect().headOption
        Scalar(r.map(_.getDouble(0)), r.map(_.getLong(1) - s.step))
      case "LAST" =>
        val r = s.df.where(v.isNotNull).orderBy(col("ts").desc).limit(1)
          .select(v, col("ts")).collect().headOption
        Scalar(r.map(_.getDouble(0)), r.map(_.getLong(1)))
      case "PERCENT" =>
        Scalar(one(Vdef.percent(v, param)), None)
      case "PERCENTNAN" => Scalar(one(Vdef.percentNan(v, param)), None)
      case "LSLSLOPE" | "LSLINT" | "LSLCORREL" =>
        val x = ((col("ts") - startSec) / s.step - 1).cast("long")
        Scalar(one(Vdef.lslExprs(x, v)(op.toLowerCase)), None)
      case other => throw new IllegalArgumentException(s"VDEF op $other")
    }
    scalars(vname) = res
    this
  }

  /** XPORT frame over named series on their gcd grid. */
  def xport(names: Seq[String]): DataFrame = {
    val step = names.map(series(_).step).reduce(gcd)
    names.map(n => resampled(n, step)).reduce(_.join(_, joinKeys))
      .orderBy(joinKeys.map(col): _*)
  }

  /** PRINT a VDEF (print_calc): returns the formatted line. A print
    * line is one scalar — keyed plans aggregate per series and are read
    * via [[keyedScalarOf]] instead. */
  def print(vname: String, fmt: String, magfact: Double = -1.0):
      (String, Double) = {
    require(keyCols.isEmpty,
      s"PRINT $vname: a keyed plan has one scalar PER KEY — " +
        "read keyedScalarOf(vname) instead")
    Graphv.Print.format(fmt,
      scalars(vname).value.getOrElse(Double.NaN), magfact)
  }

  /** Repeat-resample a series onto a (finer) gcd grid: fine slot t reads
    * the coarse slot covering it (end-labeled ceil mapping). Public —
    * the graph front end builds its pixel frame from plan-resampled
    * series so mixed-step elements align the way data_proc expects. */
  def resampled(vname: String, toStep: Long): DataFrame = {
    val s = series(vname)
    if (s.step == toStep) s.df
    else {
      require(s.step % toStep == 0,
        s"gcd grid $toStep must divide ${s.step}")
      val grid =
        if (keyCols.isEmpty) Fetch.grid(spark, startSec, endSec, toStep)
        else Fetch.grid(spark, startSec, endSec, toStep)
          .crossJoin(s.df.select(keyCols.map(col): _*).distinct())
      val srcTs = (expr(s"(ts - 1) div ${s.step}") + 1) * s.step
      grid.withColumn("__src", srcTs)
        .join(s.df.withColumnRenamed("ts", "__src"),
          keyCols :+ "__src", "left")
        .drop("__src")
    }
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}
