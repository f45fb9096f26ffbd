package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** graphv DATA outputs (SURVEY.md §2.3 data_proc + PRINT/GPRINT;
  * rendering itself is out of scope): pixel resampling with STACK
  * accumulation and value-range calculation
  * (/root/reference/src/rrd_graph.c:1365-1543), and the PRINT/GPRINT
  * value formatters — printf numerics, SI autoscaling (%s/%S), and the
  * duration formatter (/root/reference/src/rrd_graph.c:1832-2113,
  * auto_scale at 6150-6188, strfduration at 1684-1808).
  */
object Graphv {

  /** One paintable graph element. `value` paints a constant (the
    * reference's yrule form, e.g. `LINE2:42`); `vname` paints a series
    * column of the aligned frame; `stack` adds onto the previous
    * element's painted value (STACK is pre-converted to LINE/AREA+stack,
    * rrd_graph.c:1454-1458); TICK never contributes to the value range.
    */
  final case class Element(
      vname: Option[String],
      value: Option[Double] = None,
      stack: Boolean = false,
      tick: Boolean = false,
      skipScale: Boolean = false) {
    require(vname.isDefined != value.isDefined, "vname xor constant")
  }
  object Element {
    def line(vname: String, stack: Boolean = false): Element =
      Element(Some(vname), stack = stack)
    def const(v: Double, stack: Boolean = false): Element =
      Element(None, Some(v), stack = stack)
    def tick(vname: String): Element =
      Element(Some(vname), tick = true)
  }

  /** data_proc: resample an aligned series frame onto the `xsize`-pixel
    * grid and stack.
    *
    * Pixel i's time is `start + trunc(pixstep·i)` and reads the source
    * slot `floor((t-start)/step)` — i.e. the end-labeled row stamped
    * `start + (idx+1)·step` (rrd_graph.c:1394-1443). Returns the pixel
    * frame `(px, gr_time, <one painted column per element>)` plus
    * (value_min, value_max) over finite painted non-TICK values.
    *
    * Plan shape: one `spark.range(xsize)` pixel grid, one broadcastable
    * equi-join per distinct source step against the frame, stack
    * accumulation as pure column arithmetic — no shuffle beyond the
    * joins, scales with pixels × elements.
    */
  def dataProc(spark: SparkSession, frame: DataFrame, ts: String,
      elements: Seq[(String, Element)], startSec: Long, endSec: Long,
      stepSec: Long, xsize: Int,
      logarithmic: Boolean = false): (DataFrame, Option[Double], Option[Double]) = {
    val pixstep = (endSec - startSec).toDouble / xsize
    val px = spark.range(xsize).select(col("id").as("px"),
      (lit(startSec) + (lit(pixstep) * col("id")).cast("long")).as("gr_time"))
    // source slot for each pixel (end-labeled row)
    val slotTs = (lit(startSec) +
      (((col("gr_time") - startSec) / stepSec).cast("long") + 1) * stepSec)
    val joined = px.withColumn("__slot", slotTs)
      .join(frame.withColumnRenamed(ts, "__slot"), Seq("__slot"), "left")
      .drop("__slot")
    // stack accumulation: acc += value when known; painted = null when
    // own value unknown (paintval survives for the next stacked element)
    var acc: Column = lit(0.0)
    val painted = elements.map { case (name, e) =>
      val v: Column = e.value.map(lit(_): Column).getOrElse(col(e.vname.get))
      if (!e.stack) acc = lit(0.0)
      val p = when(v.isNull, lit(null)).otherwise(acc + v)
      acc = acc + coalesce(v, lit(0.0))
      name -> p
    }
    val out = painted.foldLeft(joined) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }.select(col("px") +: col("gr_time") +: painted.map(p => col(p._1)): _*)
    // value range over finite painted non-TICK values
    val ranged = elements.zip(painted).collect {
      case ((_, e), (n, _)) if !e.tick && !e.skipScale => n
    }
    if (ranged.isEmpty) (out, None, None)
    else {
      val finMax: String => Column = n =>
        when(abs(col(n)) =!= lit(Double.PositiveInfinity), col(n))
      // log scale: non-positive painted values cannot appear on the
      // axis, so they are excluded from the MINIMUM (the maximum still
      // sees them — rrd_graph.c:1444-1449)
      val finMin: String => Column = n =>
        if (logarithmic) when(abs(col(n)) =!= lit(Double.PositiveInfinity)
          && col(n) > 0.0, col(n))
        else finMax(n)
      // least/greatest require arity >= 2 (single-element graphs are
      // common: tests/graph2 is one AREA)
      def fold(cs: Seq[Column], f: Seq[Column] => Column): Column =
        if (cs.size == 1) cs.head else f(cs)
      val row = out.agg(
        fold(ranged.map(n => min(finMin(n))), least(_: _*)).as("mn"),
        fold(ranged.map(n => max(finMax(n))), greatest(_: _*)).as("mx"))
        .first()
      var mn = Option(row.get(0)).map(_.asInstanceOf[Double])
      var mx = Option(row.get(1)).map(_.asInstanceOf[Double])
      if (logarithmic) {
        // no usable data on a log axis -> dummy range; a min at or
        // below zero collapses to way under max (rrd_graph.c:1470-1478)
        if (mn.isEmpty || mx.isEmpty || mx.exists(_ <= 0.0)) {
          mn = Some(0.0); mx = Some(5.1)
        }
        if (mn.exists(_ <= 0.0)) mn = Some(mx.get / 10e8)
      }
      (out, mn, mx)
    }
  }

  /** PRINT/GPRINT formatting (print_calc). */
  object Print {

    private val Symbols = "afpnum kMGTPE" // 10^-18 .. 10^18, base at idx 6

    /** auto_scale (rrd_graph.c:6150-6188): returns (scaled value, SI
      * symbol, magfact). */
    def autoScale(value: Double, base: Double = 1000.0):
        (Double, String, Double) = {
      if (value == 0.0 || value.isNaN) (value, " ", 1.0)
      else {
        val sindex = math.floor(math.log(math.abs(value)) / math.log(base)).toInt
        val magfact = math.pow(base, sindex)
        val symb = if (sindex <= 6 && sindex >= -6)
          Symbols.charAt(sindex + 6).toString else "?"
        (value / magfact, symb, magfact)
      }
    }

    /** Format one PRINT/GPRINT line. C printf numeric conversions
      * (%lf/%le/%lg and width/precision forms) map to their Java
      * equivalents; `%s`/`%S` trigger SI autoscaling with the symbol
      * substituted (print_calc, rrd_graph.c:1904-1925). `magfact`
      * threads the shared magnitude across consecutive %S lines
      * (pass the returned value to the next call). */
    def format(fmt: String, value: Double,
        magfactIn: Double = -1.0): (String, Double) = {
      var v = value
      var symb = ""
      var magfact = magfactIn
      var f = fmt
      if (f.contains("%S")) {
        if (magfact < 0.0) {
          val (sv, sy, mf) = autoScale(v, 1000.0)
          v = sv; symb = sy
          magfact = if (v == 0.0) -1.0 else mf
        } else { v /= magfact; symb = symbolFor(magfact) }
        f = f.replace("%S", "%s")
      } else if (f.contains("%s")) {
        val (sv, sy, _) = autoScale(v, 1000.0)
        v = sv; symb = sy
      }
      // C "%lf" == Java "%f" etc.; keep widths/precision ("%5.2lf").
      // C accepts a zero flag without a width ("%0.1lf",
      // tests/vformatter1) where Java's Formatter throws — the flag is
      // meaningless there, so drop it.
      val jf = f.replaceAll("%([-+ 0#]*)(\\d+)?(\\.\\d+)?l([fFeEgG])", "%$1$2$3$4")
        .replaceAll("%([-+ #]*)0(\\.)", "%$1$2")
      val line0 =
        if (jf.contains("%s")) jf.formatLocal(java.util.Locale.ROOT, v, symb)
        else jf.formatLocal(java.util.Locale.ROOT, v)
      // C printf renders non-finite doubles lowercase ("nan"/"inf");
      // Java gives "NaN"/"Infinity" — the reference goldens compare
      // post-`sed s/-nan/nan/` text (tests/functions:21)
      val line =
        if (java.lang.Double.isFinite(v)) line0
        else line0.replace("NaN", "nan").replace("Infinity", "inf")
      (line, magfact)
    }

    private def symbolFor(magfact: Double): String = {
      val sindex = math.round(math.log(magfact) / math.log(1000.0)).toInt
      if (sindex <= 6 && sindex >= -6) Symbols.charAt(sindex + 6).toString
      else "?"
    }

    /** Legacy PRINT:vname:CF form — the CF runs over the fetched slots
      * (print_calc's non-VDEF branch, rrd_graph.c:1862-1901: first
      * finite value seeds, AVERAGE divides by valid steps). */
    def legacyCf(values: Seq[Double], cf: graft.model.Cf): Double = {
      var printval = Double.NaN
      var valid = 0
      values.foreach { x =>
        if (java.lang.Double.isFinite(x)) {
          if (printval.isNaN) { printval = x; valid += 1 }
          else cf match {
            case graft.model.Cf.Average => printval += x; valid += 1
            case graft.model.Cf.Min => printval = math.min(printval, x)
            case graft.model.Cf.Max => printval = math.max(printval, x)
            case graft.model.Cf.Last => printval = x
            case other => throw new IllegalArgumentException(s"CF $other")
          }
        }
      }
      if (cf == graft.model.Cf.Average && valid > 1) printval / valid
      else printval
    }

    /** C strftime over an epoch second — the PRINT `:strftime` /
      * `:valstrftime` branch (rrd_graph.c:1990-2045; default format
      * `%Y-%m-%d %H:%M:%S`, rrd_graph.c:255). C-locale names, composite
      * conversions expanded recursively, unknown conversions kept
      * literally (glibc behavior). */
    def strftime(fmt: String, epochSec: Long,
        timeZone: String = "UTC"): String = {
      val zdt = java.time.Instant.ofEpochSecond(epochSec)
        .atZone(java.time.ZoneId.of(timeZone))
      val months = Array("January", "February", "March", "April", "May",
        "June", "July", "August", "September", "October", "November",
        "December")
      val days = Array("Monday", "Tuesday", "Wednesday", "Thursday",
        "Friday", "Saturday", "Sunday")
      val sb = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c != '%' || i + 1 >= fmt.length) { sb += c; i += 1 }
        else {
          val h12 = { val h = zdt.getHour % 12; if (h == 0) 12 else h }
          fmt.charAt(i + 1) match {
            case 'Y' => sb ++= zdt.getYear.toString
            case 'y' => sb ++= f"${zdt.getYear % 100}%02d"
            case 'C' => sb ++= f"${zdt.getYear / 100}%02d"
            case 'm' => sb ++= f"${zdt.getMonthValue}%02d"
            case 'd' => sb ++= f"${zdt.getDayOfMonth}%02d"
            case 'e' => sb ++= f"${zdt.getDayOfMonth}%2d"
            case 'H' => sb ++= f"${zdt.getHour}%02d"
            case 'k' => sb ++= f"${zdt.getHour}%2d"
            case 'I' => sb ++= f"$h12%02d"
            case 'l' => sb ++= f"$h12%2d"
            case 'M' => sb ++= f"${zdt.getMinute}%02d"
            case 'S' => sb ++= f"${zdt.getSecond}%02d"
            case 'j' => sb ++= f"${zdt.getDayOfYear}%03d"
            case 'a' => sb ++= days(zdt.getDayOfWeek.getValue - 1).take(3)
            case 'A' => sb ++= days(zdt.getDayOfWeek.getValue - 1)
            case 'b' | 'h' => sb ++= months(zdt.getMonthValue - 1).take(3)
            case 'B' => sb ++= months(zdt.getMonthValue - 1)
            case 'p' => sb ++= (if (zdt.getHour < 12) "AM" else "PM")
            case 'u' => sb ++= zdt.getDayOfWeek.getValue.toString
            case 'w' => sb ++= (zdt.getDayOfWeek.getValue % 7).toString
            case 'V' => sb ++= f"${zdt.get(java.time.temporal
              .IsoFields.WEEK_OF_WEEK_BASED_YEAR)}%02d"
            case 'G' => sb ++= zdt.get(java.time.temporal
              .IsoFields.WEEK_BASED_YEAR).toString
            case 's' => sb ++= epochSec.toString
            case 'z' => sb ++= zdt.getOffset.getId.replace(":", "")
              .replace("Z", "+0000")
            case 'Z' => sb ++= zdt.getZone
              .getDisplayName(java.time.format.TextStyle.SHORT,
                java.util.Locale.ROOT)
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case '%' => sb += '%'
            case 'c' => sb ++= strftime("%a %b %e %H:%M:%S %Y", epochSec, timeZone)
            case 'x' => sb ++= strftime("%m/%d/%y", epochSec, timeZone)
            case 'X' => sb ++= strftime("%H:%M:%S", epochSec, timeZone)
            case 'F' => sb ++= strftime("%Y-%m-%d", epochSec, timeZone)
            case 'T' => sb ++= strftime("%H:%M:%S", epochSec, timeZone)
            case 'D' => sb ++= strftime("%m/%d/%y", epochSec, timeZone)
            case 'R' => sb ++= strftime("%H:%M", epochSec, timeZone)
            case 'r' => sb ++= strftime("%I:%M:%S %p", epochSec, timeZone)
            case other => sb += '%' += other
          }
          i += 2
        }
      }
      sb.toString
    }

    /** time_clean (rrd_graph.c:1669-1682 shape): when a VDEF carries no
      * timestamp (`never`), strip the conversions and keep the literal
      * text. */
    /** The no-data form of a strftime PRINT: each conversion becomes
      * dashes shaped like its expected output (rrd_graph.c:6164-6315
      * time_clean table — %F -> "----------", %T -> "--:--:--", two-digit
      * fields -> "--", years -> "----"). */
    def timeClean(fmt: String): String = {
      val two = "CdgHImMSUVWy".toSet
      val sb = new StringBuilder
      var j = 0
      while (j < fmt.length) {
        val c = fmt.charAt(j)
        if (c == '%' && j + 1 < fmt.length) {
          fmt.charAt(j + 1) match {
            case 'E' | 'O' => sb += '-'; j += 3
            case x if two(x) => sb ++= "--"; j += 2
            case 'j' => sb ++= "---"; j += 2
            case 'G' | 'Y' => sb ++= "----"; j += 2
            case 'R' => sb ++= "--:--"; j += 2
            case 'T' => sb ++= "--:--:--"; j += 2
            case 'F' => sb ++= "----------"; j += 2
            case 'D' => sb ++= "--/--/--"; j += 2
            case 'n' => sb ++= "\r\n"; j += 2
            case 't' => sb += '\t'; j += 2
            case '%' => sb += '%'; j += 2
            case x @ (' ' | '.' | '@') => sb += '%'; sb += x; j += 2
            case _ => sb += '-'; j += 2
          }
        } else { sb += c; j += 1 }
      }
      sb.toString
    }

    /** strfduration (rrd_graph.c:1684-1808): %W/%d/%D/%h/%H/%m/%M/%s/%S/
      * %f fields with optional zero-pad/width/precision; duration is in
      * MILLISECONDS, negative renders a leading '-'. */
    def strfduration(fmt: String, durationMs: Double): String = {
      val seconds = math.abs(durationMs) / 1000.0
      val minutes = seconds / 60.0
      val hours = minutes / 60.0
      val days = hours / 24.0
      val weeks = days / 7.0
      val sb = new StringBuilder
      if (durationMs < 0) sb += '-'
      var i = 0
      def trunc(d: Double): Double = math.floor(math.abs(d)) * math.signum(d)
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c != '%') { sb += c; i += 1 }
        else {
          i += 1
          var zpad = false
          if (i < fmt.length && fmt.charAt(i) == '0') { zpad = true; i += 1 }
          var width = 0
          while (i < fmt.length && fmt.charAt(i).isDigit) {
            width = width * 10 + (fmt.charAt(i) - '0'); i += 1
          }
          var precision = 0
          if (i < fmt.length && fmt.charAt(i) == '.') {
            i += 1
            while (i < fmt.length && fmt.charAt(i).isDigit) {
              precision = precision * 10 + (fmt.charAt(i) - '0'); i += 1
            }
          }
          def put(x: Double): Unit = {
            // C truncates to `precision` digits before printing
            val pval = trunc(x * math.pow(10, precision)) /
              math.pow(10, precision)
            val w = if (width > 0) width.toString else ""
            val flag = if (zpad && width > 0) "0" else ""
            sb ++= s"%$flag$w.${precision}f"
              .formatLocal(java.util.Locale.ROOT, pval)
          }
          fmt.charAt(i) match {
            case '%' => sb += '%'
            case 'W' => put(weeks)
            case 'd' => put(days - trunc(weeks) * 7.0)
            case 'D' => put(days)
            case 'h' => put(hours - trunc(days) * 24.0)
            case 'H' => put(hours)
            case 'm' => put(minutes - trunc(hours) * 60.0)
            case 'M' => put(minutes)
            case 's' => put(seconds - trunc(minutes) * 60.0)
            case 'S' => put(seconds)
            case 'f' => put(math.abs(durationMs) - trunc(seconds) * 1000.0)
            case other => throw new IllegalArgumentException(
              s"wrong duration format %$other")
          }
          i += 1
        }
      }
      sb.toString
    }
  }
}
