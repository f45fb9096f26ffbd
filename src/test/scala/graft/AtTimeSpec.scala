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
