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

  /** Pivot a long (key, ts, v) frame into xport columns in one hash
    * aggregation — the scalable form when all series share a source
    * (no per-series join chain; one shuffle on ts). For series from
    * separate sources, union them into long form first. (A fold of one
    * left join per series — round 1's `frame` — is O(series) join
    * stages and was removed.) */
  def pivotFrame(long: DataFrame, key: String, ts: String, value: String,
      names: Seq[String]): DataFrame = {
    val aggs = names.map(n =>
      max(when(col(key) === n, col(value))).as(n))
    long.groupBy(col(ts)).agg(aggs.head, aggs.tail: _*)
  }

  // ---- serializers (rrd_xport_format_xmljson / _sv,
  // /root/reference/src/rrd_xport.c:486-513,614-711,713-1008). The
  // emitters run on a COLLECTED frame: an xport result is bounded by
  // (end-start)/step rows by construction (the reference materializes
  // the same matrix in memory).

  /** One xport result ready for serialization: `rows` sorted by ts,
    * one `Option[Double]` per legend entry. */
  final case class Result(startSec: Long, endSec: Long, stepSec: Long,
      legend: Seq[String], rows: Seq[(Long, Seq[Option[Double]])])

  /** Driver-collect ceiling for the xport/fetch serialization paths:
    * these sinks are DISPLAY formats by reference semantics (a report,
    * not a dataset), but nothing in the protocol stops a caller asking
    * for a year at 1-second step (~31 M rows through the driver). The
    * cap turns that OOM into a contract violation BEFORE any job runs
    * — the VDEF `maxSlots` idiom. 2^22 rows ≈ 48 days of 1-second
    * slots; larger extractions should stay a DataFrame (or
    * re-consolidate via reduce_data to a coarser step). */
  val MaxCollectRows: Long = 1L << 22

  /** Collect a grid frame into a [[Result]] (driver-side, bounded: the
    * row count is (end−start)/step by grid construction, checked
    * against `maxRows` arithmetically before any job runs). */
  def collect(df: DataFrame, ts: String, cols: Seq[String], startSec: Long,
      endSec: Long, stepSec: Long,
      maxRows: Long = MaxCollectRows): Result = {
    // a nonpositive step would zero the arithmetic guard and let an
    // unbounded frame through to collect() — fail it outright (every
    // grid this serializes is built with a positive step)
    require(stepSec > 0, s"xport step must be positive (got $stepSec)")
    val expect = (endSec - startSec) / stepSec
    require(expect <= maxRows,
      s"xport window of $expect rows ((end-start)/step) exceeds the " +
        s"driver-collect cap $maxRows — narrow the window, coarsen the " +
        "step (reduce_data), or keep the result distributed")
    val rows = df.orderBy(ts).collect().toSeq.map { r =>
      (r.getLong(r.fieldIndex(ts)), cols.map { c =>
        val i = r.fieldIndex(c)
        if (r.isNullAt(i)) None else Some(r.getDouble(i))
      })
    }
    Result(startSec, endSec, stepSec, cols, rows)
  }

  private def e10(v: Double): String =
    "%.10e".formatLocal(java.util.Locale.ROOT, v)

  /** `--json` output, byte-for-byte the reference layout
    * (rrd_xport.c:768-1008; null for NaN/Inf, %0.10e values). */
  def toJson(r: Result, showtime: Boolean = false): String = {
    val sb = new StringBuilder
    sb ++= "{ \"about\": \"RRDtool graph JSON output\",\n  \"meta\": {\n"
    sb ++= s"""    "start": ${r.startSec + r.stepSec},\n"""
    sb ++= s"""    "end": ${r.endSec},\n"""
    sb ++= s"""    "step": ${r.stepSec},\n"""
    sb ++= "    \"legend\": [\n"
    sb ++= r.legend.zipWithIndex.map { case (l, j) =>
      "      \"" + l.dropWhile(_.isWhitespace) +
        (if (j < r.legend.size - 1) "\"," else "\"")
    }.mkString("", "\n", "\n")
    sb ++= "          ]\n"
    sb ++= "     },\n  \"data\": [\n"
    val n = r.rows.size
    r.rows.zipWithIndex.foreach { case ((t, vs), i) =>
      sb ++= "    [ "
      if (showtime) sb ++= s""""$t","""
      sb ++= vs.map {
        case Some(v) if !v.isNaN && !v.isInfinite => e10(v)
        case _ => "null"
      }.mkString(", ")
      sb ++= (if (i < n - 1) " ],\n" else " ]\n")
    }
    sb ++= "  ]\n}\n"
    sb.toString
  }

  /** XML output (default format; `enumds` numbers the value tags v0…,
    * `showtime` adds `<t>`; NaN literal for unknowns). */
  def toXml(r: Result, showtime: Boolean = false,
      enumds: Boolean = false): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>\n\n<xport>\n  <meta>\n"
    sb ++= s"    <start>${r.startSec + r.stepSec}</start>\n"
    sb ++= s"    <end>${r.endSec}</end>\n"
    sb ++= s"    <step>${r.stepSec}</step>\n"
    sb ++= s"    <rows>${(r.endSec - r.startSec) / r.stepSec}</rows>\n"
    sb ++= s"    <columns>${r.legend.size}</columns>\n"
    sb ++= "    <legend>\n"
    r.legend.foreach(l => sb ++= s"      <entry>$l</entry>\n")
    sb ++= "    </legend>\n  </meta>\n  <data>\n"
    r.rows.foreach { case (t, vs) =>
      sb ++= "    <row>"
      if (showtime) sb ++= s"<t>$t</t>"
      vs.zipWithIndex.foreach { case (ov, j) =>
        val tag = if (enumds) s"v$j" else "v"
        val s = ov.filter(v => !v.isNaN).map(e10).getOrElse("NaN")
        sb ++= s"<$tag>$s</$tag>"
      }
      sb ++= "</row>\n"
    }
    sb ++= "  </data>\n</xport>\n"
    sb.toString
  }

  /** Separated-value output: ',' = CSV, '\t' = TSV, ';' = SSV
    * (rrd_xport_format_sv: quoted header + values, CRLF lines). */
  def toSv(r: Result, sep: Char): String = {
    val sb = new StringBuilder
    sb ++= "\"time\""
    r.legend.foreach(l =>
      sb ++= s"""$sep"${l.dropWhile(_.isWhitespace)}"""" )
    sb ++= "\r\n"
    r.rows.foreach { case (t, vs) =>
      sb ++= t.toString
      vs.foreach { ov =>
        val s = ov.filter(v => !v.isNaN).map(e10).getOrElse("NaN")
        sb ++= s"""$sep"$s""""
      }
      sb ++= "\r\n"
    }
    sb.toString
  }
}
