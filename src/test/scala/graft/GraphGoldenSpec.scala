package graft

import graft.cli.Commands

/** Ports of /root/reference/tests/graph1 and tests/graph2 — the
  * reference's graphv goldens driven END TO END through the Commands
  * facade (create → update → graphv), the way a reference user types
  * them.
  *
  * graph1 (`tests/graph1:17-31`, golden `graph1.output`): the rpn1 RRD
  * (COUNTER, step 300) with `VDEF:o=my-speed,MAXIMUM` printed as %lf →
  * `print[0] = "0.040000"`.
  *
  * graph2 (`tests/graph2:105-119`, golden `graph2.output`): the
  * DDERIVE/DCOUNTER store of tests/xport1 (same create + update list —
  * parsed here from the reference script itself), graphed at step 600
  * with the LEGACY `GPRINT:vname:CF:format` form
  * (rrd_graph.c:1862-1901) → legends `Current:0.03`, `Average:0.03`,
  * `Maximum:0.04`. The golden's `value_min/value_max`
  * (3.0e-02/4.0e-02) are the AXIS bounds after grid snapping
  * (rrd_graph.c horizontal_grid — rendering, out of scope); the data
  * range underneath them is asserted exactly against the xport1 golden
  * values instead.
  */
class GraphGoldenSpec extends SparkSuite {

  test("tests/graph1: graphv PRINT of VDEF MAXIMUM golden") {
    val c = new Commands(spark, nowSec = 920808900L)
    val path = java.nio.file.Files.createTempDirectory("graft_g1").toString
    c.create(path, Seq("--start", "920804400", "--step", "300",
      "DS:speed:COUNTER:600:U:U",
      "RRA:AVERAGE:0.5:1:24", "RRA:AVERAGE:0.5:6:10"))
    c.update(path, Seq(
      "920804700:12345", "920805000:12357", "920805300:12363",
      "920805600:12363", "920805900:12363", "920806200:12373",
      "920806500:12383", "920806800:12393", "920807100:12399",
      "920807400:12405", "920807700:12411", "920808000:12415",
      "920808300:12420", "920808600:12422", "920808900:12423"))
    val g = c.graphv(Seq("--start", "920804400", "--end", "920808000",
      s"DEF:my-speed=$path:speed:AVERAGE",
      "VDEF:o=my-speed,MAXIMUM",
      "PRINT:o:%lf"))
    assert(g.prints == Seq("0.040000")) // graph1.output:1
  }

  test("--logarithmic clips non-positive values from the range " +
      "(rrd_graph.c:1444-1449,1470-1478)") {
    val c = new Commands(spark, nowSec = 1000L)
    val path = java.nio.file.Files.createTempDirectory("graft_log").toString
    c.create(path, Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"))
    // painted values -5, 0.5, 2: the log minimum must skip the
    // non-positive ones, the maximum still sees every finite value
    c.update(path, Seq("10:-5", "20:0.5", "30:2"))
    val g = c.graphv(Seq("--logarithmic", "--start", "0", "--end", "30",
      s"DEF:v=$path:v:AVERAGE", "LINE1:v#000000"))
    assert(g.valueMin.contains(0.5) && g.valueMax.contains(2.0))
    // linear axis keeps the negative minimum
    val lin = c.graphv(Seq("--start", "0", "--end", "30",
      s"DEF:v=$path:v:AVERAGE", "LINE1:v#000000"))
    assert(lin.valueMin.contains(-5.0) && lin.valueMax.contains(2.0))
    // all-nonpositive data -> the reference's dummy log range
    // (min 0 -> 5.1, then min = max/10e8)
    val path2 = java.nio.file.Files.createTempDirectory("graft_log2").toString
    c.create(path2, Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"))
    c.update(path2, Seq("10:-1", "20:-2", "30:-3"))
    val g2 = c.graphv(Seq("--logarithmic", "--start", "0", "--end", "30",
      s"DEF:v=$path2:v:AVERAGE", "LINE1:v#000000"))
    assert(g2.valueMax.contains(5.1) &&
      g2.valueMin.contains(5.1 / 10e8))
  }

  test("tests/graph2: legacy GPRINT:vname:CF:format goldens") {
    // the update list is graph2's own (identical in tests/xport1, whose
    // script is the cleaner parse): "$RRDTOOL update ${BUILD}.rrd t:v:v …"
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/xport1")), "UTF-8")
    val updates = "\\d{10}:[-\\d.]+:[-\\d.]+".r
      .findAllIn(script).toSeq
    assert(updates.size == 394, s"reference script parse: ${updates.size}")

    val c = new Commands(spark, nowSec = 1300015721L)
    val path = java.nio.file.Files.createTempDirectory("graft_g2").toString
    c.create(path, Seq("--start", "1300000000", "--step", "60s",
      "DS:dv:DDERIVE:300:U:U", "DS:wh:DCOUNTER:300:0:U",
      "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:10:144"))
    c.update(path, updates)

    val g = c.graphv(Seq("--start", "1300000000", "--end", "1300015200",
      s"DEF:wh=$path:wh:AVERAGE:step=600",
      "AREA:wh#EA8F007F:5 Minute Average :STACK",
      "GPRINT:wh:LAST:Current\\:%4.2lf",
      "GPRINT:wh:AVERAGE:Average\\:%4.2lf",
      "GPRINT:wh:MAX:Maximum\\:%4.2lf"))
    // graph2.output legend[1..3]
    assert(g.prints == Seq("Current:0.03", "Average:0.03", "Maximum:0.04"))
    // data range under the snapped axis bounds: first/last wh values of
    // the xport1 json golden (max at 1300000800, last/min at 1300015200).
    // Tolerance ~1 unit in the 9th significant digit: the golden is
    // printf-rounded and the dcounter chain has known accumulation-order
    // FP ties vs C (XportGoldenSpec's goldenEq note)
    assert(math.abs(g.valueMax.get - 3.6845818542e-02) < 5e-11)
    assert(math.abs(g.valueMin.get - 3.0233410000e-02) < 5e-11)
  }
}
