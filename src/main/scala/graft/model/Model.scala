package graft.model

/** RRD data model: schema objects mirroring the reference's create-time
  * vocabulary (SURVEY.md §1; /root/reference/src/rrd_format.h:110-435),
  * re-expressed as plain case classes. In the Spark engine a "file" is a
  * logical series table plus this schema sidecar; RRAs become materialized
  * rollup DataFrames.
  */

/** Consolidation function (enum cf_en, /root/reference/src/rrd_format.h:179-202). */
sealed abstract class Cf(val name: String)
object Cf {
  case object Average extends Cf("AVERAGE")
  case object Min extends Cf("MIN")
  case object Max extends Cf("MAX")
  case object Last extends Cf("LAST")
  // Aberrant-behavior family (§2.6)
  case object HwPredict extends Cf("HWPREDICT")
  case object MhwPredict extends Cf("MHWPREDICT")
  case object Seasonal extends Cf("SEASONAL")
  case object DevSeasonal extends Cf("DEVSEASONAL")
  case object DevPredict extends Cf("DEVPREDICT")
  case object Failures extends Cf("FAILURES")

  val all: Seq[Cf] = Seq(Average, Min, Max, Last, HwPredict, MhwPredict,
    Seasonal, DevSeasonal, DevPredict, Failures)
  def parse(s: String): Cf = all.find(_.name == s.toUpperCase)
    .getOrElse(throw new IllegalArgumentException(s"unknown CF '$s'"))
}

/** DS type (enum dst_en, /root/reference/src/rrd_format.h:138-145). */
sealed abstract class Dst(val name: String)
object Dst {
  case object Counter extends Dst("COUNTER")   // unsigned int counter, 32/64-bit wrap
  case object Absolute extends Dst("ABSOLUTE") // resets on read: value/interval
  case object Gauge extends Dst("GAUGE")       // value is already a rate
  case object Derive extends Dst("DERIVE")     // signed counter, no wrap
  case object DCounter extends Dst("DCOUNTER") // double counter, direction-change reset
  case object DDerive extends Dst("DDERIVE")   // double derive
  case object Compute extends Dst("COMPUTE")   // RPN over other DSes

  val all: Seq[Dst] =
    Seq(Counter, Absolute, Gauge, Derive, DCounter, DDerive, Compute)
  def parse(s: String): Dst = all.find(_.name == s.toUpperCase)
    .getOrElse(throw new IllegalArgumentException(s"unknown DST '$s'"))
}

/** One data source (column). Mirrors ds_def_t
  * (/root/reference/src/rrd_format.h:170-174): name, type, heartbeat,
  * min/max clamp (None = unbounded "U"), or an RPN expression for COMPUTE.
  * DS name grammar per /root/reference/src/rrd_create.c:310-312.
  */
final case class DsDef(
    name: String,
    dst: Dst,
    heartbeatSec: Long = 600L,
    min: Option[Double] = None,
    max: Option[Double] = None,
    rpn: Option[String] = None) {
  require(DsDef.NameRe.matches(name), s"bad DS name '$name'")
  require((dst == Dst.Compute) == rpn.isDefined,
    "COMPUTE iff an RPN expression is given")
}
/** `rrd_scaled_duration` (/root/reference/src/rrd_utils.c:235-283):
  * `<digits>[smhdwMy]` — a BARE count inhibits both scaling and the
  * divisor check (it already IS a count of `divisor` units); a suffixed
  * value converts to seconds and must divide evenly by `divisor`.
  * Anything else (negative, non-numeric, unknown suffix like `2H`) is
  * rejected, matching tests/rrdcreate's diagnostics. */
object Scaled {
  private val Re = raw"(\d+)([smhdwMy])?".r
  def apply(token: String, divisor: Long): Long = token match {
    case Re(digits, null) =>
      val v = digits.toLong
      require(v > 0, s"value must be positive: '$token'")
      v
    case Re(digits, suf) =>
      val mult = suf match {
        case "s" => 1L
        case "m" => 60L
        case "h" => 3600L
        case "d" => 86400L
        case "w" => 604800L
        case "M" => 2678400L // 31 days
        case "y" => 31622400L // 366 days
      }
      val v = digits.toLong * mult
      require(v > 0, s"value must be positive: '$token'")
      require(v % divisor == 0,
        s"value would truncate when scaled: '$token' (divisor $divisor)")
      v / divisor
    case _ => throw new IllegalArgumentException(
      s"value must be (suffixed) positive number: '$token'")
  }
}

object DsDef {
  /** [a-zA-Z0-9_-]{1,19} per rrd_format.h:162-164 (length relaxed here,
    * validated only in compat mode). */
  val NameRe = "[a-zA-Z0-9_-]+".r

  private val MapRe =
    raw"DS:([a-zA-Z0-9_-]+)=([a-zA-Z0-9_-]+)(?:\[(\d+)\])?(:.*)".r

  /** Split the optional `=source[index]` prefill mapping off a DS spec
    * (DS_RE subgroups 2-3, rrd_create.c:310-326; index is 1-based into
    * the `--source` list). Returns the mapping-free spec plus
    * `(source DS name, optional source index)`. */
  def splitMapping(spec: String): (String, Option[(String, Option[Int])]) =
    spec match {
      case MapRe(name, src, idx, rest) =>
        (s"DS:$name$rest", Some((src, Option(idx).map(_.toInt))))
      case _ => (spec, None)
    }

  /** Parse "DS:name:TYPE:heartbeat:min:max" or "DS:name:COMPUTE:rpn"
    * (grammar: /root/reference/src/rrd_create.c:310-480; heartbeat is a
    * count-or-duration, rrd_create.c:1117-1132). */
  def parse(spec: String): DsDef = spec.split(":", -1).toList match {
    case "DS" :: name :: "COMPUTE" :: rest if rest.nonEmpty =>
      DsDef(name, Dst.Compute, rpn = Some(rest.mkString(":")))
    case "DS" :: name :: dst :: hb :: mn :: mx :: Nil =>
      DsDef(name, Dst.parse(dst), Scaled(hb, 1L),
        parseBound(mn), parseBound(mx))
    case "DS" :: name :: dst :: hb :: Nil =>
      DsDef(name, Dst.parse(dst), Scaled(hb, 1L))
    case _ => throw new IllegalArgumentException(s"bad DS spec '$spec'")
  }
  private def parseBound(s: String): Option[Double] =
    if (s == "U" || s.isEmpty) None else Some(s.toDouble)
}

/** One round-robin archive (materialized rollup). Mirrors rra_def_t
  * (/root/reference/src/rrd_format.h:267-275): CF, xff, PDPs per CDP, row
  * count (retention). Holt-Winters RRAs carry their parameters instead of
  * xff/pdpCnt (/root/reference/src/rrd_create.c:480-790).
  */
final case class RraDef(
    cf: Cf,
    xff: Double = 0.5,
    pdpCnt: Long = 1L,
    rowCnt: Long,
    hw: Option[HwParams] = None) {
  require(xff >= 0.0 && xff < 1.0, s"xff out of range: $xff")
  require(pdpCnt >= 1 && rowCnt >= 1, "pdpCnt/rowCnt must be >= 1")
}
object RraDef {
  /** Parse "RRA:CF:xff:steps:rows" or
    * "RRA:HWPREDICT:rows:alpha:beta:period" /
    * "RRA:SEASONAL:period:gamma:rra-num" /
    * "RRA:DEVPREDICT:rows:rra-num" / "RRA:FAILURES:rows:thr:win:rra-num"
    * (/root/reference/src/rrd_create.c:480-790). `steps` and `rows`
    * accept scaled durations relative to the file's `stepSec`
    * (rrd_create.c:567,616,659: steps scale by pdp_step, rows by
    * pdp_step·pdp_cnt; HW row counts by pdp_step). */
  def parse(spec: String, stepSec: Long = 1L): RraDef =
    spec.split(":", -1).toList match {
    case "RRA" :: cf :: rest =>
      (Cf.parse(cf), rest) match {
        case (c @ (Cf.Average | Cf.Min | Cf.Max | Cf.Last),
            xff :: steps :: rows :: Nil) =>
          val pdpCnt = Scaled(steps, stepSec)
          RraDef(c, xff.toDouble, pdpCnt, Scaled(rows, stepSec * pdpCnt))
        case (c @ (Cf.HwPredict | Cf.MhwPredict), rows :: a :: b :: per :: extra) =>
          // `period` scales like the row counts (the reference's
          // duration form `RRA:HWPREDICT:5d:0.1:0.0035:1d[:rra-num]`,
          // tests/rrdcreate "HWPREDICT equivalents"); a single trailing
          // field is the cross-link rra-num (our linkage is by family
          // position, so it carries no extra information); six trailing
          // fields persist tuned values the reference keeps in rra par
          // words: gamma, delta+/-, threshold, window, smoothing-window
          // (rrd_tune.c:344-360)
          val base = HwParams(alpha = a.toDouble, beta = b.toDouble,
            period = Scaled(per, stepSec))
          val tuned = extra match {
            case g :: dp :: dn :: thr :: win :: sw :: Nil =>
              base.copy(gamma = g.toDouble, deltaPos = dp.toDouble,
                deltaNeg = dn.toDouble, failThreshold = thr.toDouble.toInt,
                windowLen = win.toDouble.toInt,
                smoothingWindow = sw.toDouble)
            case Nil => base
            case n :: Nil if n.nonEmpty && n.forall(_.isDigit) =>
              base // optional rra-num cross-link (linkage is positional)
            case other => throw new IllegalArgumentException(
              s"bad HWPREDICT extras $other")
          }
          RraDef(c, rowCnt = Scaled(rows, stepSec), hw = Some(tuned))
        case (c @ (Cf.Seasonal | Cf.DevSeasonal), per :: g :: _) =>
          val period = Scaled(per, stepSec)
          RraDef(c, rowCnt = period,
            hw = Some(HwParams(gamma = g.toDouble, period = period)))
        case (Cf.DevPredict, rows :: _) =>
          RraDef(Cf.DevPredict, rowCnt = Scaled(rows, stepSec))
        case (Cf.Failures, rows :: thr :: win :: _) =>
          RraDef(Cf.Failures, rowCnt = Scaled(rows, stepSec),
            hw = Some(HwParams(failThreshold = thr.toInt, windowLen = win.toInt)))
        case _ => throw new IllegalArgumentException(s"bad RRA spec '$spec'")
      }
    case _ => throw new IllegalArgumentException(s"bad RRA spec '$spec'")
  }
}

/** Holt-Winters parameters (rra_def_t.par, /root/reference/src/rrd_format.h:223-259). */
final case class HwParams(
    alpha: Double = 0.1,
    beta: Double = 0.1,
    gamma: Double = 0.1,
    period: Long = 1L,
    deltaPos: Double = 2.0,
    deltaNeg: Double = 2.0,
    failThreshold: Int = 7,
    windowLen: Int = 9,
    smoothingWindow: Double = 0.05)

/** A full logical RRD: base step + DS columns + RRA rollups
  * (stat_head_t, /root/reference/src/rrd_format.h:114-131).
  */
final case class RrdSchema(
    stepSec: Long,
    startSec: Long,
    ds: Seq[DsDef],
    rras: Seq[RraDef]) {
  require(stepSec >= 1, "step must be >= 1s")
  require(ds.map(_.name).distinct.size == ds.size, "duplicate DS names")
  def dsByName(n: String): DsDef = ds.find(_.name == n)
    .getOrElse(throw new NoSuchElementException(s"no DS '$n'"))
  /** Retention horizon of an RRA in seconds. */
  def retentionSec(r: RraDef): Long = stepSec * r.pdpCnt * r.rowCnt
}
object RrdSchema {
  /** Parse a full create-style spec list:
    * `create(step, start, "DS:...", "RRA:...", ...)`.
    *
    * A lone HWPREDICT/MHWPREDICT RRA implicitly creates the four
    * contingent aberrant RRAs the reference adds
    * (create_hw_contingent_rras, /root/reference/src/rrd_create.c:
    * 1168-1249): SEASONAL and DEVSEASONAL of `period` rows with
    * gamma = alpha, DEVPREDICT mirroring the HW row count, FAILURES of
    * `period` rows with delta 2.0, threshold 7, window 9 (tests/tune2's
    * create shape). Declaring any SEASONAL RRA explicitly disables the
    * implicit set (the rra-num cross-linked form). */
  def parse(stepSec: Long, startSec: Long, specs: Seq[String]): RrdSchema = {
    val (dsSpecs, rraSpecs) = specs.partition(_.startsWith("DS:"))
    val parsed = rraSpecs.map(RraDef.parse(_, stepSec))
    val hwLone = parsed.find(r =>
      (r.cf == Cf.HwPredict || r.cf == Cf.MhwPredict) && r.hw.isDefined)
      .filterNot(_ => parsed.exists(_.cf == Cf.Seasonal))
    val rras = hwLone match {
      case Some(hw) =>
        val p = hw.hw.get
        parsed ++ Seq(
          RraDef(Cf.Seasonal, rowCnt = p.period,
            hw = Some(HwParams(gamma = p.alpha, period = p.period))),
          RraDef(Cf.DevSeasonal, rowCnt = p.period,
            hw = Some(HwParams(gamma = p.alpha, period = p.period))),
          RraDef(Cf.DevPredict, rowCnt = hw.rowCnt),
          RraDef(Cf.Failures, rowCnt = p.period,
            hw = Some(HwParams(period = p.period))))
      case None => parsed
    }
    RrdSchema(stepSec, startSec, dsSpecs.map(DsDef.parse), rras)
  }
}
