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

  test("schema assembly + retention") {
    val s = RrdSchema.parse(300L, 920804400L, Seq(
      "DS:speed:COUNTER:600:U:U",
      "RRA:AVERAGE:0.5:1:24", "RRA:AVERAGE:0.5:6:10"))
    assert(s.ds.size == 1 && s.rras.size == 2)
    assert(s.retentionSec(s.rras.head) == 300L * 24)
    assert(s.retentionSec(s.rras(1)) == 300L * 6 * 10)
  }
}
