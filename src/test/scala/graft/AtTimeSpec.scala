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
}
