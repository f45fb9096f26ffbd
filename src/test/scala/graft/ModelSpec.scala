package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("DS spec grammar (rrd_create.c:310-480)") {
    val ds = DsDef.parse("DS:speed:COUNTER:600:U:U")
    assert(ds == DsDef("speed", Dst.Counter, 600L, None, None))
    val g = DsDef.parse("DS:temp:GAUGE:120:-40:80")
    assert(g.min.contains(-40.0) && g.max.contains(80.0))
    val c = DsDef.parse("DS:sum:COMPUTE:a,b,+")
    assert(c.dst == Dst.Compute && c.rpn.contains("a,b,+"))
    assertThrows[IllegalArgumentException](DsDef.parse("DS:bad name:GAUGE:600:U:U"))
    assertThrows[IllegalArgumentException](DsDef.parse("DS:x:NOPE:600:U:U"))
  }

  test("RRA spec grammar (rrd_create.c:480-790)") {
    val r = RraDef.parse("RRA:AVERAGE:0.5:6:10")
    assert(r == RraDef(Cf.Average, 0.5, 6L, 10L))
    val hw = RraDef.parse("RRA:HWPREDICT:1440:0.1:0.0035:288")
    assert(hw.cf == Cf.HwPredict && hw.hw.exists(_.period == 288L))
    val se = RraDef.parse("RRA:SEASONAL:288:0.1:2")
    assert(se.cf == Cf.Seasonal && se.hw.exists(_.gamma == 0.1))
    assertThrows[IllegalArgumentException](RraDef.parse("RRA:AVERAGE:1.5:6:10"))
  }

  test("scaled durations in create specs (tests/rrdcreate diagnostics)") {
    // rrd_scaled_duration: bare counts pass through, suffixed values
    // convert to seconds and must divide evenly by the divisor
    assert(Scaled("10", 300L) == 10L) // bare count: divisor inhibited
    assert(Scaled("15s", 5L) == 3L)
    assert(Scaled("1h", 10L) == 360L)
    assert(Scaled("2d", 86400L) == 2L)
    // tests/rrdcreate failure table
    assertThrows[IllegalArgumentException](Scaled("0", 1L)) // zero step
    assertThrows[IllegalArgumentException](Scaled("-1", 1L)) // negative
    assertThrows[IllegalArgumentException](Scaled("one", 1L)) // non-text
    assertThrows[IllegalArgumentException](Scaled("2H", 1L)) // bad suffix
    // misaligned RRA step: 15s at a 10s base step
    assertThrows[IllegalArgumentException](
      RraDef.parse("RRA:AVERAGE:0.5:15s:1h", stepSec = 10L))
    // misaligned RRA rows: 75s span over a 10s RRA step
    assertThrows[IllegalArgumentException](
      RraDef.parse("RRA:AVERAGE:0.5:10s:75s", stepSec = 10L))
    // zero RRA rows: 10s span at a 15s RRA step
    assertThrows[IllegalArgumentException](
      RraDef.parse("RRA:AVERAGE:0.5:15s:10s", stepSec = 5L))
    // valid rrdtool idiom: 5-minute CDPs kept for three days
    val r = RraDef.parse("RRA:AVERAGE:0.5:5m:3d", stepSec = 60L)
    assert(r.pdpCnt == 5L && r.rowCnt == 864L)
    // suffixed heartbeat
    assert(DsDef.parse("DS:v:GAUGE:2m:U:U").heartbeatSec == 120L)
  }

  test("tests/rrdcreate: duration-suffix specs equal their count forms") {
    // the reference's four checkequiv blocks: the same schema written
    // with bare step counts and with scaled-duration suffixes must
    // produce identical files (compared there via `rrdtool info`)
    val ct1 = RrdSchema.parse(1L, 0L, Seq("DS:watts:GAUGE:300:0:24000",
      "RRA:AVERAGE:0.5:1:864000", "RRA:AVERAGE:0.5:60:129600",
      "RRA:AVERAGE:0.5:3600:13392", "RRA:AVERAGE:0.5:86400:3660"))
    val dur1 = RrdSchema.parse(1L, 0L, Seq("DS:watts:GAUGE:5m:0:24000",
      "RRA:AVERAGE:0.5:1s:10d", "RRA:AVERAGE:0.5:1m:90d",
      "RRA:AVERAGE:0.5:1h:18M", "RRA:AVERAGE:0.5:1d:10y"))
    assert(ct1 == dur1)
    val ct5 = RrdSchema.parse(5L, 0L, Seq("DS:watts:GAUGE:300:0:24000",
      "RRA:AVERAGE:0.5:1:172800", "RRA:AVERAGE:0.5:12:129600",
      "RRA:AVERAGE:0.5:720:13392", "RRA:AVERAGE:0.5:17280:3660"))
    val dur5 = RrdSchema.parse(5L, 0L, Seq("DS:watts:GAUGE:5m:0:24000",
      "RRA:AVERAGE:0.5:5s:10d", "RRA:AVERAGE:0.5:1m:90d",
      "RRA:AVERAGE:0.5:1h:18M", "RRA:AVERAGE:0.5:1d:10y"))
    assert(ct5 == dur5)
    // HWPREDICT: the lone count form (implicit contingent family) ==
    // the duration form with the family spelled out and cross-linked
    val hwCt = RrdSchema.parse(300L, 0L, Seq(
      "DS:ifOutOctets:COUNTER:1800:0:4294967295",
      "RRA:AVERAGE:0.5:1:2016",
      "RRA:HWPREDICT:1440:0.1:0.0035:288"))
    val hwDur = RrdSchema.parse(300L, 0L, Seq(
      "DS:ifOutOctets:COUNTER:30m:0:4294967295",
      "RRA:AVERAGE:0.5:1:2016",
      "RRA:HWPREDICT:5d:0.1:0.0035:1d:3",
      "RRA:SEASONAL:1d:0.1:2", "RRA:DEVSEASONAL:1d:0.1:2",
      "RRA:DEVPREDICT:5d:5", "RRA:FAILURES:1d:7:9:5"))
    assert(hwCt.ds == hwDur.ds)
    assert(hwCt.rras.size == hwDur.rras.size)
    assert(hwCt.rras.map(r => (r.cf, r.pdpCnt, r.rowCnt)) ==
      hwDur.rras.map(r => (r.cf, r.pdpCnt, r.rowCnt)))
    // FETCH shapes: every mixed AVERAGE/MAX pair equivalent
    val fCt = RrdSchema.parse(10L, 0L, Seq("DS:ds0:GAUGE:300:0:U",
      "RRA:AVERAGE:0.5:30:3600", "RRA:AVERAGE:0.5:90:1200",
      "RRA:AVERAGE:0.5:360:1200", "RRA:MAX:0.5:360:1200",
      "RRA:AVERAGE:0.5:8640:600", "RRA:MAX:0.5:8640:600"))
    val fDur = RrdSchema.parse(10L, 0L, Seq("DS:ds0:GAUGE:5m:0:U",
      "RRA:AVERAGE:0.5:5m:300h", "RRA:AVERAGE:0.5:15m:300h",
      "RRA:AVERAGE:0.5:1h:50d", "RRA:MAX:0.5:1h:50d",
      "RRA:AVERAGE:0.5:1d:600d", "RRA:MAX:0.5:1d:600d"))
    assert(fCt == fDur)
  }

  test("schema assembly + retention") {
    val s = RrdSchema.parse(300L, 920804400L, Seq(
      "DS:speed:COUNTER:600:U:U",
      "RRA:AVERAGE:0.5:1:24", "RRA:AVERAGE:0.5:6:10"))
    assert(s.ds.size == 1 && s.rras.size == 2)
    assert(s.retentionSec(s.rras.head) == 300L * 24)
    assert(s.retentionSec(s.rras(1)) == 300L * 6 * 10)
  }
}
