package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.model.{Cf, Dst, DsDef, HwParams, RraDef, RrdSchema}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.types._
import org.w3c.dom.Element

/** Reference `<rrd>` XML dump interop (SURVEY.md §2.1 items 6-7;
  * /root/reference/src/rrd_dump.c:106-433 element layout,
  * rrd_restore.c parsing): lets an rrdtool user migrate an existing
  * file in (`restoreXml`) and export a store back out (`dumpXml`).
  *
  * Scope: this is the single-file migration format — one XML document
  * per series, driver-side, bounded by Σ row_cnt (exactly the circular
  * file's size). The 100 TB portable form stays [[Dump]]'s distributed
  * JSON-lines layout.
  *
  * Row timestamps are implicit in the reference format: the `<database>`
  * lists row_cnt values oldest-first and row i is stamped
  * `last_up - last_up % rra_step + (i - (n-1)) * rra_step`
  * (rrd_dump.c:408-433's `timer` walk) — reconstructed on restore, and
  * re-derived on dump so a dump→restore→dump cycle is a fixpoint
  * (tests/dump-restore).
  *
  * The reference also dumps live ingest scratch (`pdp_prep`/`cdp_prep`).
  * Our store keeps raw samples in the tail sidecar instead, so those
  * blocks are emitted with their fresh-create values (value NaN,
  * unknown_sec = last_up % step — rrd_create.c's initialization) and
  * accepted-but-ignored on restore; the database rows, schema, and
  * last_up carry all queryable state.
  */
object RrdXml {

  private def e10(v: Double): String =
    if (v.isNaN) "NaN"
    else "%.10e".formatLocal(java.util.Locale.ROOT, v)

  /** Dump one series of a store as a reference-format XML document. */
  def dumpXml(spark: SparkSession, storePath: String, outFile: String,
      series: Seq[String] = Seq("k")): Unit =
    Files.write(Paths.get(outFile),
      dumpXmlString(spark, storePath, series)
        .getBytes(StandardCharsets.UTF_8))

  /** [[dumpXml]] as a string — the daemon's DUMP relays it over the
    * socket (rrd_daemon.c:1842-1891 streams rrd_dump_cb_r output). */
  def dumpXmlString(spark: SparkSession, storePath: String,
      series: Seq[String] = Seq("k")): String = {
    val schema = RrdStore.readSchema(storePath)
    val lastUp = {
      val tail = Paths.get(storePath, "tail")
      if (Files.exists(tail))
        spark.read.parquet(tail.toString)
          .agg(max("ts_us")).first().getLong(0) / 1000000L
      else {
        val finest = schema.rras.indices.minBy(schema.rras(_).pdpCnt)
        RrdStore.readRra(spark, s"$storePath/rra$finest")
          .agg(max("ts")).first().getLong(0)
      }
    }
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n"
    sb ++= "<!-- Round Robin Database Dump -->\n<rrd>\n"
    sb ++= "\t<version>0003</version>\n"
    sb ++= s"\t<step>${schema.stepSec}</step> <!-- Seconds -->\n"
    sb ++= s"\t<lastupdate>$lastUp</lastupdate>\n\n"
    schema.ds.foreach { d =>
      sb ++= "\t<ds>\n"
      sb ++= s"\t\t<name> ${d.name} </name>\n"
      sb ++= s"\t\t<type> ${d.dst.name} </type>\n"
      if (d.dst == Dst.Compute)
        sb ++= s"\t\t<cdef> ${d.rpn.get} </cdef>\n"
      else {
        sb ++= s"\t\t<minimal_heartbeat>${d.heartbeatSec}</minimal_heartbeat>\n"
        sb ++= s"\t\t<min>${d.min.map(e10).getOrElse("NaN")}</min>\n"
        sb ++= s"\t\t<max>${d.max.map(e10).getOrElse("NaN")}</max>\n"
      }
      sb ++= "\n\t\t<!-- PDP Status -->\n"
      sb ++= "\t\t<last_ds>U</last_ds>\n"
      sb ++= "\t\t<value>NaN</value>\n"
      sb ++= s"\t\t<unknown_sec> ${lastUp % schema.stepSec} </unknown_sec>\n"
      sb ++= "\t</ds>\n\n"
    }
    sb ++= "\t<!-- Round Robin Archives -->\n"
    schema.rras.zipWithIndex.foreach { case (rra, i) =>
      val rraStep = schema.stepSec * rra.pdpCnt
      sb ++= "\t<rra>\n"
      sb ++= s"\t\t<cf>${rra.cf.name}</cf>\n"
      sb ++= s"\t\t<pdp_per_row>${rra.pdpCnt}</pdp_per_row> " +
        s"<!-- $rraStep seconds -->\n\n"
      sb ++= "\t\t<params>\n"
      rra.cf match {
        case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
          sb ++= s"\t\t<xff>${e10(rra.xff)}</xff>\n"
        case Cf.HwPredict | Cf.MhwPredict =>
          val h = rra.hw.get
          sb ++= s"\t\t<hw_alpha>${e10(h.alpha)}</hw_alpha>\n"
          sb ++= s"\t\t<hw_beta>${e10(h.beta)}</hw_beta>\n"
          sb ++= s"\t\t<dependent_rra_idx>${depIdx(schema, i)}</dependent_rra_idx>\n"
        case Cf.Seasonal | Cf.DevSeasonal =>
          val h = rra.hw.get
          sb ++= s"\t\t<seasonal_gamma>${e10(h.gamma)}</seasonal_gamma>\n"
          sb ++= s"\t\t<seasonal_smooth_idx>0</seasonal_smooth_idx>\n"
          sb ++= s"\t\t<smoothing_window>${e10(h.smoothingWindow)}</smoothing_window>\n"
          sb ++= s"\t\t<dependent_rra_idx>${depIdx(schema, i)}</dependent_rra_idx>\n"
        case Cf.Failures =>
          val h = rra.hw.get
          sb ++= s"\t\t<delta_pos>${e10(h.deltaPos)}</delta_pos>\n"
          sb ++= s"\t\t<delta_neg>${e10(h.deltaNeg)}</delta_neg>\n"
          sb ++= s"\t\t<window_len>${h.windowLen}</window_len>\n"
          sb ++= s"\t\t<failure_threshold>${h.failThreshold}</failure_threshold>\n"
          sb ++= s"\t\t<dependent_rra_idx>${depIdx(schema, i)}</dependent_rra_idx>\n"
        case Cf.DevPredict =>
          sb ++= s"\t\t<dependent_rra_idx>${depIdx(schema, i)}</dependent_rra_idx>\n"
      }
      sb ++= "\t\t</params>\n"
      sb ++= "\t\t<cdp_prep>\n"
      schema.ds.foreach { _ =>
        sb ++= "\t\t\t<ds>\n"
        sb ++= "\t\t\t<primary_value>NaN</primary_value>\n"
        sb ++= "\t\t\t<secondary_value>NaN</secondary_value>\n"
        rra.cf match {
          case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
            sb ++= "\t\t\t<value>NaN</value>\n"
            sb ++= s"\t\t\t<unknown_datapoints>${(lastUp % rraStep) / schema.stepSec}</unknown_datapoints>\n"
          case _ => () // HW scratch lives in the recurrence tables
        }
        sb ++= "\t\t\t</ds>\n"
      }
      sb ++= "\t\t</cdp_prep>\n"
      sb ++= "\t\t<database>\n"
      // newest row_cnt slots, oldest first, NaN where no slot exists —
      // the circular buffer's exact reach (bounded collect: row_cnt rows)
      val base = lastUp - lastUp % rraStep
      val values: Map[Long, Row] = {
        val p = s"$storePath/rra$i"
        if (Files.exists(Paths.get(p))) {
          val df = RrdStore.readRra(spark, p)
          df.where(col("ts") > base - rra.rowCnt * rraStep &&
              col("ts") <= base)
            .select((Seq("ts") ++ schema.ds.map(_.name)).map(col): _*)
            .collect().map(r => r.getLong(0) -> r).toMap
        } else Map.empty
      }
      ((rra.rowCnt - 1) to 0L by -1).foreach { back =>
        val ts = base - back * rraStep
        val vs = schema.ds.indices.map { d =>
          values.get(ts) match {
            case Some(r) if !r.isNullAt(d + 1) => e10(r.getDouble(d + 1))
            case _ => "NaN"
          }
        }
        sb ++= s"\t\t\t<!-- $ts --> <row>" +
          vs.map(v => s"<v>$v</v>").mkString + "</row>\n"
      }
      sb ++= "\t\t</database>\n\t</rra>\n"
    }
    sb ++= "</rrd>\n"
    sb.toString
  }

  /** The RRA index the aberrant family member feeds/reads
    * (rrd_create.c:1168-1245 layout: members point at their HWPREDICT). */
  private def depIdx(schema: RrdSchema, i: Int): Int = {
    val hwCfs: Set[Cf] = Set(Cf.Seasonal, Cf.DevSeasonal, Cf.DevPredict,
      Cf.Failures)
    if (hwCfs(schema.rras(i).cf))
      (i - 1 to 0 by -1).find(j =>
        schema.rras(j).cf == Cf.HwPredict ||
          schema.rras(j).cf == Cf.MhwPredict).getOrElse(0)
    else i + 1 // HWPREDICT points at its first dependent
  }

  /** Restore a reference-format XML dump into a store directory. */
  def restoreXml(spark: SparkSession, xmlFile: String, storePath: String,
      seriesKey: String = "rrd"): Unit = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // the reference DOCTYPE names a remote DTD — never fetch it
    dbf.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    val doc = dbf.newDocumentBuilder().parse(new java.io.File(xmlFile))
    val root = doc.getDocumentElement
    require(root.getTagName == "rrd", s"not an <rrd> document: $xmlFile")
    val step = text(root, "step").trim.toLong
    val lastUp = text(root, "lastupdate").trim.toLong

    val dss = children(root, "ds").map { d =>
      val dst = Dst.parse(text(d, "type").trim)
      if (dst == Dst.Compute)
        DsDef(text(d, "name").trim, dst, rpn = Some(text(d, "cdef").trim))
      else DsDef(text(d, "name").trim, dst,
        text(d, "minimal_heartbeat").trim.toLong,
        num(d, "min"), num(d, "max"))
    }

    val rraEls = children(root, "rra")
    val parsed = rraEls.map { r =>
      val cf = Cf.parse(text(r, "cf").trim)
      val pdpCnt = text(r, "pdp_per_row").trim.toLong
      val p = children(r, "params").head
      val rows = children(children(r, "database").head, "row")
      val data = rows.map(row => children(row, "v").map(v =>
        parseD(v.getTextContent.trim)))
      (cf, pdpCnt, p, rows.size.toLong, data)
    }
    // reconstruct HW parameters scattered across the family members
    val gammaPeriod = parsed.collectFirst {
      case (Cf.Seasonal, _, p, rowCnt, _) =>
        (numT(p, "seasonal_gamma").getOrElse(0.1), rowCnt,
          numT(p, "smoothing_window").getOrElse(0.05))
    }
    val failParams = parsed.collectFirst {
      case (Cf.Failures, _, p, _, _) =>
        (numT(p, "delta_pos").getOrElse(2.0),
          numT(p, "delta_neg").getOrElse(2.0),
          textOpt(p, "window_len").map(_.trim.toInt).getOrElse(9),
          textOpt(p, "failure_threshold").map(_.trim.toInt).getOrElse(7))
    }
    val rras = parsed.map { case (cf, pdpCnt, p, rowCnt, _) =>
      cf match {
        case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
          RraDef(cf, numT(p, "xff").getOrElse(0.5), pdpCnt, rowCnt)
        case Cf.HwPredict | Cf.MhwPredict =>
          val (g, per, sw) = gammaPeriod.getOrElse((0.1, 1L, 0.05))
          val (dp, dn, win, thr) = failParams.getOrElse((2.0, 2.0, 9, 7))
          RraDef(cf, rowCnt = rowCnt, hw = Some(HwParams(
            alpha = numT(p, "hw_alpha").getOrElse(0.1),
            beta = numT(p, "hw_beta").getOrElse(0.1),
            gamma = g, period = per, deltaPos = dp, deltaNeg = dn,
            failThreshold = thr, windowLen = win, smoothingWindow = sw)))
        case Cf.Seasonal | Cf.DevSeasonal =>
          RraDef(cf, rowCnt = rowCnt, hw = Some(HwParams(
            gamma = numT(p, "seasonal_gamma").getOrElse(0.1),
            period = rowCnt)))
        case Cf.DevPredict => RraDef(cf, rowCnt = rowCnt)
        case Cf.Failures =>
          val (dp, dn, win, thr) = failParams.get
          RraDef(cf, rowCnt = rowCnt, hw = Some(HwParams(deltaPos = dp,
            deltaNeg = dn, failThreshold = thr, windowLen = win)))
      }
    }
    RrdStore.create(storePath,
      RrdSchema(step, lastUp - lastUp % step, dss, rras))

    val tableSchema = StructType(
      StructField("k", StringType, nullable = false) +:
        StructField("ts", LongType, nullable = false) +:
        dss.map(d => StructField(d.name, DoubleType)))
    parsed.zipWithIndex.foreach { case ((_, pdpCnt, _, rowCnt, data), i) =>
      val rraStep = step * pdpCnt
      val base = lastUp - lastUp % rraStep
      val rows = data.zipWithIndex.flatMap { case (vs, idx) =>
        val ts = base - (rowCnt - 1 - idx) * rraStep
        // rows before the file held data are all-NaN filler — skip, the
        // store's grid join re-nulls them on fetch
        if (vs.forall(_.isEmpty)) None
        else Some(Row.fromSeq(seriesKey +: ts +:
          vs.map(_.map(Double.box).orNull)))
      }
      spark.createDataFrame(rows.asJava, tableSchema)
        .write.mode("overwrite").parquet(s"$storePath/rra$i")
    }
  }

  // ---- DOM helpers (direct children only — <rra> nests <ds> blocks) --
  private def children(e: Element, tag: String): Seq[Element] = {
    val out = Seq.newBuilder[Element]
    var n = e.getFirstChild
    while (n != null) {
      n match {
        case c: Element if c.getTagName == tag => out += c
        case _ => ()
      }
      n = n.getNextSibling
    }
    out.result()
  }
  private def text(e: Element, tag: String): String =
    children(e, tag).headOption.map(_.getTextContent)
      .getOrElse(throw new IllegalArgumentException(s"missing <$tag>"))
  private def textOpt(e: Element, tag: String): Option[String] =
    children(e, tag).headOption.map(_.getTextContent)
  private def parseD(s: String): Option[Double] =
    if (s.equalsIgnoreCase("NaN") || s == "U") None else Some(s.toDouble)
  private def num(e: Element, tag: String): Option[Double] =
    textOpt(e, tag).flatMap(t => parseD(t.trim))
  private def numT(e: Element, tag: String): Option[Double] = num(e, tag)
}
