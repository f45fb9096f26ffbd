package graft

import scala.collection.immutable.ListMap

import graft.model.{Cf, DsDef, Dst}
import graft.query.Graphv
import org.apache.spark.sql.functions._

/** Port of /root/reference/tests/rpn1 — the reference's own golden test,
  * same numbers (`rpn1.output:1-3`): a COUNTER RRD at step 300, 15
  * updates, then
  * {{{
  * DEF:my-speed=rpn1.rrd:speed:AVERAGE
  * CDEF:nonans01=my-speed,UN,0,my-speed,IF
  * CDEF:kmh=nonans01,3600,*
  * CDEF:fast…=kmh,100,GT,100,0,IF
  * CDEF:over=kmh,100,GT,kmh,100,-,0,IF
  * CDEF:good=kmh,100,GT,0,kmh,IF
  * VDEF f=AVERAGE(fast)  g=MAXIMUM(good)  o=MINIMUM(over)
  * PRINT:<v>:%lf  →  "30.769231" "72.000000" "0.000000"
  * }}}
  * The reference fetch window [start, end] is stamp-inclusive at both
  * ends (rows = (end-start)/step + 1, rrd_fetch.c:445-448), so the grid
  * here starts one step early to include the slot stamped at `start`.
  */
class Rpn1GoldenSpec extends SparkSuite {

  test("tests/rpn1 PRINT goldens") {
    import spark.implicits._
    val updates = Seq(
      920804700L -> 12345.0, 920805000L -> 12357.0, 920805300L -> 12363.0,
      920805600L -> 12363.0, 920805900L -> 12363.0, 920806200L -> 12373.0,
      920806500L -> 12383.0, 920806800L -> 12393.0, 920807100L -> 12399.0,
      920807400L -> 12405.0, 920807700L -> 12411.0, 920808000L -> 12415.0,
      920808300L -> 12420.0, 920808600L -> 12422.0, 920808900L -> 12423.0)
    val samples = updates.map { case (t, v) => ("rpn1", t * 1000000L, v) }
      .toDF("k", "ts_us", "value")

    // update: COUNTER DS, heartbeat 600, step 300 (RRA:AVERAGE:0.5:1:24)
    val rated = ingest.Rates.withRate(samples, Seq("k"), "ts_us", "ts_us",
      "value", DsDef("speed", Dst.Counter, 600L))
    val pdp = ingest.Normalize.pdp(rated, Seq("k"), "ts_us", "rate", 300L,
      rateScale = None)

    // DEF fetch over [920804400, 920808000] stamp-inclusive
    val frame = query.Fetch.fetch(spark,
      pdp.select(col("pdp_ts"), col("pdp").as("my-speed")),
      "pdp_ts", Seq("my-speed"), 920804400L - 300L, 920808000L, 300L)

    val cdefs = query.Cdef.compiled(frame, Nil, "ts", Seq("my-speed"),
      ListMap(
        "nonans01" -> "my-speed,UN,0,my-speed,IF",
        "kmh" -> "nonans01,3600,*",
        "fast" -> "kmh,100,GT,100,0,IF",
        "over" -> "kmh,100.000000000000000000000000000000000000,GT,kmh,100,-,0,IF",
        "good" -> "kmh,100,GT,0,kmh,IF"), 300L)

    val row = cdefs.agg(
      query.Vdef.average(col("fast")).as("f"),
      max(col("good")).as("g"),
      min(col("over")).as("o")).first()

    assert(Graphv.Print.format("%lf", row.getDouble(0))._1 == "30.769231")
    assert(Graphv.Print.format("%lf", row.getDouble(1))._1 == "72.000000")
    assert(Graphv.Print.format("%lf", row.getDouble(2))._1 == "0.000000")
  }

  test("PRINT SI autoscale %s/%S and shared magnitude") {
    // %s scales each value independently
    assert(Graphv.Print.format("%6.2lf %s", 1234567.0)._1 == "  1.23 M")
    assert(Graphv.Print.format("%6.2lf %s", 0.00042)._1 == "420.00 u")
    // %S pins the magnitude of the first non-zero line
    val (l1, mf) = Graphv.Print.format("%6.2lf %S", 1234567.0)
    assert(l1 == "  1.23 M")
    val (l2, _) = Graphv.Print.format("%6.2lf %S", 4200.0, mf)
    assert(l2 == "  0.00 M")
    // plain conversions
    assert(Graphv.Print.format("%le", 1234.5)._1 == "1.234500e+03")
    assert(Graphv.Print.format("%.1lf", 2.25)._1 == "2.2" ||
      Graphv.Print.format("%.1lf", 2.25)._1 == "2.3") // banker's at half
  }

  test("PRINT legacy CF form (print_calc non-VDEF branch)") {
    val xs = Seq(1.0, Double.NaN, 3.0, 5.0)
    assert(Graphv.Print.legacyCf(xs, Cf.Average) == 3.0)
    assert(Graphv.Print.legacyCf(xs, Cf.Min) == 1.0)
    assert(Graphv.Print.legacyCf(xs, Cf.Max) == 5.0)
    assert(Graphv.Print.legacyCf(xs, Cf.Last) == 5.0)
  }

  test("strfduration fields and truncation (rrd_graph.c:1684-1808)") {
    // 90061500 ms = 1d 1h 1m 1.5s
    val ms = ((24 * 3600 + 3600 + 60 + 1) * 1000 + 500).toDouble
    assert(Graphv.Print.strfduration("%D days %h:%02m:%02s", ms) ==
      "1 days 1:01:01")
    assert(Graphv.Print.strfduration("%H hours", ms) == "25 hours")
    assert(Graphv.Print.strfduration("%.1S s", 1500.0) == "1.5 s")
    assert(Graphv.Print.strfduration("%03m", 125000.0) == "002")
    assert(Graphv.Print.strfduration("%s", -2500.0) == "-2")
    assert(Graphv.Print.strfduration("100%%", 0.0) == "100%")
  }

  test("dataProc: pixel resample + STACK + range (rrd_graph.c:1365-1543)") {
    import spark.implicits._
    // 4 slots of two series on a 10s grid, 8 pixels over (0, 40]
    val frame = Seq(
      (10L, Some(1.0), Some(10.0)), (20L, Some(2.0), None),
      (30L, None, Some(30.0)), (40L, Some(4.0), Some(40.0))
    ).toDF("ts", "a", "b")
    val (out, mn, mx) = Graphv.dataProc(spark, frame, "ts",
      Seq("pa" -> Graphv.Element.line("a"),
        "pb" -> Graphv.Element.line("b", stack = true)),
      0L, 40L, 10L, 8)
    val rows = out.orderBy("px")
      .select("px", "gr_time", "pa", "pb")
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    // pixstep=5: pixels 0,1→slot 10; 2,3→20; 4,5→30; 6,7→40
    assert(rows(0) == ((0L, 0L, Some(1.0), Some(11.0))))
    assert(rows(2) == ((2L, 10L, Some(2.0), None))) // b unknown
    assert(rows(4) == ((4L, 20L, None, Some(30.0)))) // a unknown: paint 0+b
    assert(rows(6) == ((6L, 30L, Some(4.0), Some(44.0))))
    assert(mn.contains(1.0) && mx.contains(44.0))
  }
}
