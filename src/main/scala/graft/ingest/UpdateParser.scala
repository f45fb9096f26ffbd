package graft.ingest

import graft.model.{Dst, RrdSchema}
import graft.time.AtTime
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `update` argument parser (SURVEY.md §2.2 item 11;
  * /root/reference/src/rrd_update.c:1303-1359 parse template/values,
  * 1368-1425 get_time_from_reading):
  *
  *   [--template ds1[:ds2…]]  time:v1[:v2…] …
  *
  * `time` is `N` (now), an epoch (optionally with fractional seconds),
  * or an AT-style expression (prefixed freely — the reference hands any
  * non-numeric first field to rrd_parsetime); values are decimal or `U`
  * (unknown); a template reorders/subsets the DS columns, unmentioned
  * DSes become unknown; COMPUTE DSes must be given as `U`
  * (rrd_update.c:1348-1353).
  */
object UpdateParser {

  final case class Update(tsUs: Long, values: Map[String, Option[Double]])

  /** Parse one update argument against the schema. */
  def parse(arg: String, schema: RrdSchema,
      template: Option[Seq[String]] = None,
      nowSec: Long = 0L): Update = {
    val parts = arg.split(":", -1).toIndexedSeq
    require(parts.length >= 2, s"bad update '$arg'")
    val tsUs = parseTime(parts.head, nowSec)
    val order = template.getOrElse(schema.ds.map(_.name))
    order.foreach(n => schema.dsByName(n)) // unknown DS name -> error
    require(parts.tail.length == order.length,
      s"expected ${order.length} data source readings, got ${parts.tail.length}")
    val supplied = order.zip(parts.tail.map(parseValue)).toMap
    schema.ds.foreach { d =>
      if (d.dst == Dst.Compute)
        require(supplied.get(d.name).forall(_.isEmpty),
          s"COMPUTE DS ${d.name} must be updated with 'U' (rrd_update.c:1348)")
    }
    Update(tsUs,
      schema.ds.map(d => d.name -> supplied.getOrElse(d.name, None)).toMap)
  }

  private def parseValue(s: String): Option[Double] =
    if (s == "U" || s.isEmpty) None else Some(s.toDouble)

  private val EpochRe = """(\d+)(?:\.(\d{1,6}))?""".r

  def parseTime(t: String, nowSec: Long): Long = t match {
    case "N" => nowSec * 1000000L
    case EpochRe(sec, frac) =>
      sec.toLong * 1000000L +
        Option(frac).map(f => (f + "0" * (6 - f.length)).toLong).getOrElse(0L)
    case at => // AT-style (get_time_from_reading -> rrd_parsetime)
      AtTime.parse(at, AtTime.RefTimes(nowSec)) * 1000000L
  }

  /** Bulk form: parse a column of epoch-timed update strings into one
    * row per update with typed per-DS columns — pure split/cast column
    * expressions, codegen-friendly, no driver loop. (`N`/AT times are a
    * client-side convenience resolved by [[parse]]; a 100 TB replay has
    * concrete timestamps.)
    */
  def parseUpdates(df: DataFrame, updateCol: String, schema: RrdSchema,
      template: Option[Seq[String]] = None): DataFrame = {
    val order = template.getOrElse(schema.ds.map(_.name))
    val parts = split(col(updateCol), ":")
    val tsUs = {
      val t = element_at(parts, 1)
      val sec = substring_index(t, ".", 1).cast("long") * 1000000L
      val frac = when(t.contains("."),
        rpad(substring_index(t, ".", -1), 6, "0").cast("long"))
        .otherwise(0L)
      sec + frac
    }
    val valueCols = schema.ds.map { d =>
      val idx = order.indexOf(d.name)
      if (idx < 0) lit(null).cast(DoubleType).as(d.name)
      else {
        val v = element_at(parts, idx + 2)
        when(v === "U" || v === "", lit(null))
          .otherwise(v.cast(DoubleType)).as(d.name)
      }
    }
    df.select(tsUs.as("ts_us") +: valueCols: _*)
  }
}
