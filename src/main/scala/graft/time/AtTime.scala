package graft.time

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, ZoneId, ZoneOffset}

/** AT-style time specification parser (SURVEY.md §2.3; BNF
  * /root/reference/src/rrd_parsetime.c:36-111, keyword table 123-210;
  * examples /root/reference/doc/rrdfetch.pod). Pure function — no wall
  * clock inside; `now` is injected for determinism.
  *
  * Supported: `now|start|end|epoch` anchors, `N` (epoch seconds when
  * ≥ 8 digits — matches the reference's "at least 8 digits looks like an
  * epoch" heuristic), `midnight|noon|teatime|today|yesterday|tomorrow`,
  * `HH:MM [am|pm]`, `MM/DD/YYYY`, `DD.MM.YYYY`, `YYYYMMDD`, month names
  * (`jan 9`), day-of-week names, and chained signed offsets
  * `±N(s|min|h|d|w|mon|y)` — including the reference's bare-number
  * shorthand where a trailing sign-only offset means hours for times and
  * days for dates (rrd_parsetime.c:793-829).
  */
object AtTime {
  private val Utc: ZoneId = ZoneOffset.UTC

  /** `zone` is the reference's process TZ (rrd_parsetime works on
    * localtime/mktime): base keywords and offset arithmetic are
    * evaluated in wall-clock terms and converted to epoch once at the
    * end, so a `+1day` across a DST transition is 23 or 25 real hours —
    * exactly mktime's normalization. Gap times resolve forward by the
    * gap length and ambiguous (fall-back) times take the LATER
    * (standard-time) occurrence, matching glibc mktime with
    * tm_isdst = -1. Offset-free instant anchors (`now`, `start`, `end`,
    * `epoch`, numeric epochs) bypass the round trip entirely and are
    * returned verbatim, like the reference's localtime→mktime identity
    * (tm_isdst is filled in by localtime there). */
  final case class RefTimes(nowSec: Long,
      startSec: Option[Long] = None, endSec: Option[Long] = None,
      zone: ZoneId = ZoneOffset.UTC)

  private val Months = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul",
    "aug", "sep", "oct", "nov", "dec")
  private val Weekdays = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")

  /** Seconds per unit (keyword table rrd_parsetime.c:123-210; months are
    * calendar-aware, handled separately). */
  private def unitOf(u: String): Option[String] = u.toLowerCase match {
    case "s" | "sec" | "secs" | "second" | "seconds" => Some("s")
    case "min" | "mins" | "minute" | "minutes" => Some("min")
    case "h" | "hr" | "hour" | "hours" => Some("h")
    case "d" | "day" | "days" => Some("d")
    case "w" | "wk" | "week" | "weeks" => Some("w")
    case "mon" | "month" | "months" => Some("mon")
    case "y" | "yr" | "year" | "years" => Some("y")
    // bare m in a DURATION is minutes; in an offset chain it is
    // context-disambiguated by applyOffsets (rrd_parsetime.c:509-532)
    case "m" => Some("min")
    case _ => None
  }

  def parse(spec0: String, ref: RefTimes): Long = {
    val spec = spec0.trim.toLowerCase.replace(" ", " ")
    // split base and offset chain at the first +/- that isn't leading
    val (baseStr, offsetStr) = splitOffset(spec)
    // an offset-free instant anchor is the identity — never local-and-
    // back, which would shift instants inside the repeated DST hour
    val instantAnchor: Option[Long] = baseStr.trim match {
      case "" | "now" | "n" | "today" => Some(ref.nowSec)
      case "start" | "s" => ref.startSec
      case "end" | "e" => ref.endSec
      case "epoch" => Some(0L)
      case t if t.forall(_.isDigit) && t.length >= 8 && t.length != 8 =>
        Some(t.toLong)
      case _ => None
    }
    (instantAnchor, offsetStr) match {
      case (Some(sec), "") => sec
      case _ =>
        val base: LocalDateTime = parseBase(baseStr, ref)
        // one mktime at the end: spring-forward gap times shift forward
        // by the gap length, and ambiguous fall-back times take the
        // LATER (standard-time) occurrence — both measured against
        // glibc mktime with tm_isdst = -1, which is what the reference
        // calls for wall-clock specs
        applyOffsets(base, offsetStr, ref).atZone(ref.zone)
          .withLaterOffsetAtOverlap.toEpochSecond
    }
  }

  /** Scaled duration for CLI args like `1h30m` or plain seconds
    * (/root/reference/src/rrd_utils.c:235 suffix parser). */
  def parseDuration(s0: String): Long = {
    val s = s0.trim.toLowerCase
    val re = raw"(\d+)(s|m|min|h|d|w|mon|y)?".r
    re.findAllMatchIn(s).map { m =>
      val n = m.group(1).toLong
      Option(m.group(2)).map(unitOf(_).getOrElse("s")) match {
        case None | Some("s") => n
        case Some("min") => n * 60
        case Some("h") => n * 3600
        case Some("d") => n * 86400
        case Some("w") => n * 604800
        case Some("mon") => n * 2678400 // 31d, per rrd_parsetime NO_OFFSET use
        case Some("y") => n * 31622400 // 366d
        case _ => n
      }
    }.sum
  }

  private def splitOffset(spec: String): (String, String) = {
    var i = 1
    while (i < spec.length && spec(i) != '+' &&
      !(spec(i) == '-' && !spec(i - 1).isDigit && spec(i - 1) != '/' ||
        spec(i) == '-' && "dsywhm ".contains(spec(i - 1)) ||
        spec(i) == '-' && Weekdays.exists(w => spec.take(i).endsWith(w)))) i += 1
    if (i >= spec.length) (spec, "")
    else (spec.take(i).trim, spec.drop(i).trim)
  }

  private def parseBase(b0: String, ref: RefTimes): LocalDateTime = {
    def local(sec: Long): LocalDateTime =
      LocalDateTime.ofInstant(Instant.ofEpochSecond(sec), ref.zone)
    val now = local(ref.nowSec)
    def today = now.toLocalDate
    val b = b0.trim
    def at(d: LocalDate, t: LocalTime) = LocalDateTime.of(d, t)
    b match {
      case "" | "now" | "n" => now
      case "start" | "s" => local(ref.startSec.getOrElse(
        throw new IllegalArgumentException("start undefined")))
      case "end" | "e" => local(ref.endSec.getOrElse(
        throw new IllegalArgumentException("end undefined")))
      case "epoch" => local(0L)
      case "midnight" => at(today, LocalTime.MIDNIGHT)
      case "noon" => at(today, LocalTime.NOON)
      case "teatime" => at(today, LocalTime.of(16, 0)) // rrd_parsetime.c:137
      case "today" => now
      case "yesterday" => now.minusDays(1)
      case "tomorrow" => now.plusDays(1)
      case _ =>
        // time prefix? "HH:MM[am|pm]" optionally followed by a date
        val tm = raw"^(\d{1,2}):(\d{2})(am|pm)?\s*(.*)$$".r
        val md = raw"^(\d{1,2})/(\d{1,2})(?:/(\d{2,4}))?$$".r
        val dm = raw"^(\d{1,2})\.(\d{1,2})\.(\d{2,4})$$".r
        val ymd = raw"^(\d{4})(\d{2})(\d{2})$$".r
        val monName = raw"^([a-z]{3,9})\s+(\d{1,2})(?:\s+(\d{2,4}))?$$".r
        def year(y: String): Int = {
          val v = y.toInt
          if (y.length <= 2) { if (v > 37) 1900 + v else 2000 + v } else v
        }
        def dateOf(s: String): LocalDate = s.trim match {
          case "" => today
          case "today" => today
          case "yesterday" => today.minusDays(1)
          case "tomorrow" => today.plusDays(1)
          case md(m, d, y) => LocalDate.of(
            Option(y).map(year).getOrElse(today.getYear), m.toInt, d.toInt)
          case dm(d, m, y) => LocalDate.of(year(y), m.toInt, d.toInt)
          case ymd(y, m, d) => LocalDate.of(y.toInt, m.toInt, d.toInt)
          case monName(mn, d, y) if Months.exists(mn.startsWith) =>
            val mi = Months.indexWhere(mn.startsWith) + 1
            LocalDate.of(Option(y).map(year).getOrElse(today.getYear), mi, d.toInt)
          case w if Weekdays.contains(w.take(3)) =>
            val target = Weekdays.indexOf(w.take(3)) // 0=Sun
            val cur = today.getDayOfWeek.getValue % 7
            today.minusDays(Math.floorMod(cur - target, 7).toLong)
          case other => throw new IllegalArgumentException(s"bad date '$other'")
        }
        // TIME-OF-DAY DAY composition ("noon yesterday",
        // rrd_parsetime.c BNF: TIME [DAY])
        val namedTod = raw"^(midnight|noon|teatime)\s+(.+)$$".r
        b match {
          case namedTod(w, rest) =>
            val t = w match {
              case "midnight" => LocalTime.MIDNIGHT
              case "noon" => LocalTime.NOON
              case _ => LocalTime.of(16, 0)
            }
            at(dateOf(rest), t)
          case t if t.forall(_.isDigit) && t.length >= 8 && t.length != 8 =>
            LocalDateTime.ofInstant(Instant.ofEpochSecond(t.toLong), ref.zone)
          case ymd(y, m, d) => at(LocalDate.of(y.toInt, m.toInt, d.toInt),
            LocalTime.MIDNIGHT)
          case tm(h, mi, ap, rest) =>
            val h24 = (ap, h.toInt) match {
              case (null, hh) => hh
              case ("am", 12) => 0
              case ("am", hh) => hh
              case ("pm", 12) => 12
              case ("pm", hh) => hh + 12
              case (_, hh) => hh
            }
            at(dateOf(rest), LocalTime.of(h24, mi.toInt))
          case other => at(dateOf(other), LocalTime.MIDNIGHT)
        }
    }
  }

  private def applyOffsets(base: LocalDateTime, off: String,
      ref: RefTimes): LocalDateTime = {
    if (off.isEmpty) return base
    // sign optional on continuation pairs ("-1day2m" repeats the '-',
    // rrd_parsetime.c plus_minus doop < 0)
    val re = raw"([+-]?)\s*(\d+)\s*([a-z]*)".r
    var cur = base
    var op = 1
    // months-vs-minutes guessing state (rrd_parsetime.c:489-532): the
    // previous pair's unit decides a bare `m`; an explicit +/- resets it
    var prevMult: Option[String] = None
    re.findAllMatchIn(off.toLowerCase).foreach { m =>
      if (m.group(1).nonEmpty) {
        op = if (m.group(1) == "-") -1 else 1
        prevMult = None
      }
      val delta = m.group(2).toLong
      val n = delta * op
      val unit = m.group(3) match {
        case "m" => prevMult match { // rrd_parsetime.c:509-532
          case Some("d") | Some("w") | Some("mon") | Some("y") => "mon"
          case Some("s") | Some("min") | Some("h") => "min"
          // "in the context of RRD who needs less than 6 min deltas?"
          case _ => if (delta < 6) "mon" else "min"
        }
        case "" => "h"
        case u => unitOf(u).getOrElse(
          throw new IllegalArgumentException(s"bad unit '$u'"))
      }
      prevMult = Some(unit)
      unit match {
        case "s" => cur = cur.plusSeconds(n)
        case "min" => cur = cur.plusMinutes(n)
        case "h" => cur = cur.plusHours(n)
        case "d" => cur = cur.plusDays(n)
        case "w" => cur = cur.plusWeeks(n)
        case "mon" => cur = cur.plusMonths(n)
        case "y" => cur = cur.plusYears(n)
      }
    }
    cur
  }

  /** Convenience: `rrd_proc_start_end` pairing (rrd_fetch.c:154) — parse
    * start and end where each may reference the other's anchor. */
  def startEnd(startSpec: String, endSpec: String, nowSec: Long): (Long, Long) = {
    val end = parse(endSpec, RefTimes(nowSec))
    val start = parse(startSpec, RefTimes(nowSec, endSec = Some(end)))
    require(start < end, s"start $start must precede end $end")
    (start, end)
  }
}
