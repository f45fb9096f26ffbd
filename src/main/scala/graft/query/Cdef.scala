package graft.query

import graft.rpn.{RpnCompiler, RpnInterpreter}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDEF evaluation over aligned series frames (SURVEY.md §2.3;
  * /root/reference/src/rrd_graph.c:1120-1325).
  *
  * Two execution paths:
  *   - [[compiled]]: RPN → one Column per expression — a single
  *     whole-stage-codegen projection, the fast path for everything
  *     except self-referential PREV / PREDICT*.
  *   - [[interpreted]]: per-series `flatMapGroups` running
  *     [[RpnInterpreter]] over the time-sorted slots — exact reference
  *     semantics for the sequential ops. Parallelism = series
  *     cardinality (each series is inherently sequential, like the
  *     reference's single-writer model); memory = one series window per
  *     task, bounded by the fetch range.
  */
object Cdef {

  /** Append one column per (name → RPN) over a frame with series-key
    * columns, slot column `ts` (epoch sec) and the vname value columns.
    */
  def compiled(df: DataFrame, series: Seq[String], ts: String,
      vnames: Seq[String], exprs: Map[String, String],
      stepSec: Long, timeZone: String = "UTC"): DataFrame = {
    val w = if (series.isEmpty) Window.orderBy(col(ts))
      else Window.partitionBy(series.map(col): _*).orderBy(col(ts))
    // earlier CDEFs are referenceable by later ones (single forward
    // pass over the gdes array, /root/reference/src/rrd_graph.c:1135-1139)
    var ctx = RpnCompiler.Ctx(
      series = vnames.map(n => n -> col(n)).toMap,
      tsSec = col(ts), stepSec = stepSec, window = w, timeZone = timeZone)
    exprs.foldLeft(df) { case (d, (name, e)) =>
      val out = d.withColumn(name, RpnCompiler.compile(e, ctx))
      ctx = ctx.copy(series = ctx.series + (name -> col(name)))
      out
    }
  }

  /** Interpreter path. Emits (series…, ts, out₁…outₙ) rows; input must be
    * grid-aligned (one row per slot). */
  def interpreted(df: DataFrame, series: Seq[String], ts: String,
      vnames: Seq[String], exprs: Map[String, String],
      stepSec: Long, timeZone: String = "UTC"): DataFrame = {
    val exprList = exprs.toSeq // fix iteration order
    val inSchema = df.schema
    val outSchema = StructType(
      series.map(s => inSchema(s)) :+
        StructField(ts, LongType, nullable = false) :++
        exprList.map { case (n, _) => StructField(n, DoubleType) })
    val tsIdx = inSchema.fieldIndex(ts)
    val vIdx = vnames.map(n => n -> inSchema.fieldIndex(n)).toMap
    val sIdx = series.map(inSchema.fieldIndex)

    // Length-prefixed key parts: collision-proof for any multi-column
    // series key (separator/concat schemes merge e.g. ("ab","c")/("a","bc")).
    df.groupByKey { (r: Row) =>
        sIdx.map { i =>
          val s = String.valueOf(r.get(i)); s"${s.length}:$s"
        }.mkString
      }(Encoders.STRING)
      .flatMapGroups { (_: String, rows: Iterator[Row]) =>
        val sorted = rows.toArray.sortBy(_.getLong(tsIdx))
        val tsArr = sorted.map(_.getLong(tsIdx))
        val seriesArr = vIdx.map { case (n, i) =>
          n -> sorted.map(r =>
            if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
        }
        val outs = exprList.map { case (_, e) =>
          RpnInterpreter.eval(e, seriesArr, tsArr, stepSec,
            timeZone = timeZone)
        }
        sorted.indices.iterator.map { i =>
          val keyVals = sIdx.map(sorted(i).get)
          val outVals = outs.map(a =>
            if (a(i).isNaN) null else java.lang.Double.valueOf(a(i)))
          Row.fromSeq(keyVals ++ Seq(tsArr(i)) ++ outVals)
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
