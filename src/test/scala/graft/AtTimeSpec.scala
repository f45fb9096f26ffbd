package graft

import graft.time.AtTime
import graft.time.AtTime.RefTimes
import org.scalatest.funsuite.AnyFunSuite

/** AT-style time grammar — cases from /root/reference/doc/rrdfetch.pod
  * ("AT-STYLE TIME SPECIFICATION") evaluated at a pinned `now`
  * (TZ pinned to UTC; the reference evaluates in local time).
  */
class AtTimeSpec extends AnyFunSuite {
  // now = 2024-01-15T12:34:56Z (Monday)
  private val now = 1705322096L
  private val ref = RefTimes(now)
  private def p(s: String): Long = AtTime.parse(s, ref)
  private val midnight = 1705276800L // 2024-01-15T00:00:00Z

  test("anchors") {
    assert(p("now") == now)
    assert(p("now-1h") == now - 3600)
    assert(p("now + 30 min") == now + 1800)
    assert(p("epoch") == 0L)
    assert(AtTime.parse("end-1d", RefTimes(now, endSec = Some(now))) ==
      now - 86400)
    assert(AtTime.parse("s+2h", RefTimes(now, startSec = Some(1000000L))) ==
      1000000L + 7200)
  }

  test("day references") {
    assert(p("midnight") == midnight)
    assert(p("noon") == midnight + 12 * 3600)
    assert(p("teatime") == midnight + 16 * 3600)
    assert(p("yesterday") == now - 86400)
    assert(p("tomorrow") == now + 86400)
  }

  test("clock times and dates") {
    assert(p("8:00") == midnight + 8 * 3600)
    assert(p("9:00am") == midnight + 9 * 3600)
    assert(p("9:00pm") == midnight + 21 * 3600)
    assert(p("12:15pm") == midnight + 12 * 3600 + 900)
    assert(p("01/09/2024") == 1704758400L)       // Jan 9 2024 midnight
    assert(p("09.01.2024") == 1704758400L)       // DD.MM.YYYY, same day
    assert(p("20240109") == 1704758400L)
    assert(p("jan 9") == 1704758400L)            // year defaults to now's
    assert(p("8:00 01/09/2024") == 1704758400L + 8 * 3600)
  }

  test("epoch seconds and offsets chains") {
    assert(p("1704067200") == 1704067200L)
    assert(p("now-1d-6h") == now - 86400 - 6 * 3600)
    assert(p("midnight+1w") == midnight + 7 * 86400)
    assert(p("noon-1mon") != 0) // calendar months apply
  }

  test("bare m months-vs-minutes guessing (rrd_parsetime.c:509-532)") {
    // previous unit d/w/mon/y -> months: now-1d2m = minus 1 day 2 months
    assert(p("now-1d2m") ==
      java.time.LocalDateTime.ofEpochSecond(now, 0, java.time.ZoneOffset.UTC)
        .minusDays(1).minusMonths(2).toEpochSecond(java.time.ZoneOffset.UTC))
    // previous unit s/min/h -> minutes
    assert(p("now-2h5m") == now - 2 * 3600 - 5 * 60)
    // no context: < 6 guesses months ("who needs less than 6 min
    // deltas?"), >= 6 guesses minutes
    assert(p("now-5m") ==
      java.time.LocalDateTime.ofEpochSecond(now, 0, java.time.ZoneOffset.UTC)
        .minusMonths(5).toEpochSecond(java.time.ZoneOffset.UTC))
    assert(p("now-10m") == now - 600)
    // an explicit sign resets the guessing state: the second -5m is
    // context-free again -> months
    assert(p("now-1d-5m") ==
      java.time.LocalDateTime.ofEpochSecond(now, 0, java.time.ZoneOffset.UTC)
        .minusDays(1).minusMonths(5).toEpochSecond(java.time.ZoneOffset.UTC))
  }

  test("durations (rrd_utils.c:235 suffixes)") {
    assert(AtTime.parseDuration("300") == 300L)
    assert(AtTime.parseDuration("5m") == 300L)
    assert(AtTime.parseDuration("2h") == 7200L)
    assert(AtTime.parseDuration("1d") == 86400L)
    assert(AtTime.parseDuration("1h30m") == 5400L)
  }

  test("start/end pairing (rrd_proc_start_end)") {
    val (s, e) = AtTime.startEnd("end-1d", "now", now)
    assert(e == now && s == now - 86400)
    assertThrows[IllegalArgumentException](AtTime.startEnd("now", "now-1h", now))
  }

  // ---- DST property tests, Europe/Zurich -------------------------------
  // The reference evaluates AT-specs through localtime/mktime
  // (rrd_parsetime.c:36-111), so day arithmetic is wall-clock: a day
  // across a transition is 23 or 25 real hours. Every expected epoch
  // below was computed with glibc mktime (tm_isdst = -1) under
  // TZ=Europe/Zurich — the exact call chain the reference makes.
  private val zrh = java.time.ZoneId.of("Europe/Zurich")
  // spring forward: 2024-03-31 02:00 CET -> 03:00 CEST
  private val nowSpring = 1711879200L // 2024-03-31 12:00 CEST
  // fall back: 2024-10-27 03:00 CEST -> 02:00 CET
  private val nowFall = 1730026800L // 2024-10-27 12:00 CET
  private def pz(s: String, at: Long): Long =
    AtTime.parse(s, RefTimes(at, zone = zrh))

  test("DST spring forward: the 23-hour day (Europe/Zurich)") {
    assert(pz("midnight", nowSpring) == 1711839600L) // 00:00 CET
    // midnight tomorrow is 23 real hours later: the day loses 02:00-03:00
    assert(pz("midnight tomorrow", nowSpring) == 1711922400L)
    assert(pz("midnight tomorrow", nowSpring) -
      pz("midnight", nowSpring) == 23 * 3600)
    // +1day across the gap = 23 real hours (mktime normalization);
    // -1day lands on a plain CET day = 24 real hours
    assert(pz("noon+1d", 1711796400L) == 1711879200L) // Mar30 noon -> Mar31
    assert(pz("midnight yesterday", nowSpring) == 1711753200L)
    assert(pz("midnight", nowSpring) -
      pz("midnight yesterday", nowSpring) == 24 * 3600)
  }

  test("DST spring forward: times in the missing hour shift forward") {
    // 02:30 does not exist on 2024-03-31; mktime resolves it forward
    // across the gap to 03:30 CEST
    assert(pz("2:30", nowSpring) == 1711848600L)
    // day-crossing wall-clock offset: midnight+26h = 01.04. 02:00 local,
    // which is only 25 real hours after midnight
    assert(pz("midnight+26", nowSpring) == 1711929600L)
    assert(pz("midnight+26", nowSpring) -
      pz("midnight", nowSpring) == 25 * 3600)
  }

  test("DST fall back: the 25-hour day and the ambiguous hour") {
    assert(pz("midnight", nowFall) == 1729980000L) // 00:00 CEST
    assert(pz("midnight tomorrow", nowFall) == 1730070000L) // 00:00 CET
    assert(pz("midnight tomorrow", nowFall) -
      pz("midnight", nowFall) == 25 * 3600)
    // 02:30 occurs twice; glibc mktime (isdst=-1) picks the LATER,
    // standard-time occurrence: 02:30 CET
    assert(pz("2:30", nowFall) == 1729992600L)
    // wall-clock +25h = 01:00 next day local = 26 real hours
    assert(pz("midnight+25", nowFall) == 1730073600L)
    assert(pz("midnight+25", nowFall) -
      pz("midnight", nowFall) == 26 * 3600)
  }

  test("DST: offset-free instant anchors are the identity, even inside " +
      "the repeated hour") {
    // 1729989000 = 2024-10-27 02:30 CEST, the EARLIER occurrence of the
    // ambiguous wall time: "now" must round-trip exactly, not jump to
    // the 02:30 CET occurrence one real hour later
    assert(pz("now", 1729989000L) == 1729989000L)
    assert(AtTime.parse("1729989000", RefTimes(nowFall, zone = zrh)) ==
      1729989000L)
    assert(AtTime.parse("end", RefTimes(nowFall, endSec = Some(1729989000L),
      zone = zrh)) == 1729989000L)
  }

  test("DST: UTC default is unaffected by the zone parameter") {
    // the same specs through the default-zone path still evaluate in UTC
    assert(p("midnight") == midnight)
    assert(AtTime.parse("midnight", RefTimes(nowSpring)) == 1711843200L)
  }
}
