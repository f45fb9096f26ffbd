package graft

import graft.cli.GraphScript
import graft.model._
import graft.store.RrdStore
import org.apache.spark.sql.functions._

/** Full-circle integration: the engine driven by the reference's own
  * command strings — tests/rpn1's create/update/graphv sequence runs
  * through RrdStore + GraphScript verbatim and reproduces the golden
  * PRINT lines (rpn1.output:1-3). */
class GraphScriptSpec extends SparkSuite {

  test("strftime matches the C conversions (values from GNU date)") {
    import graft.query.Graphv.Print.{strftime, timeClean}
    assert(strftime("%a %b %e %H:%M:%S %Y", 1300003020L)
      == "Sun Mar 13 07:57:00 2011")
    assert(strftime("%Y-%m-%d %H:%M:%S", 1300003020L)
      == "2011-03-13 07:57:00")
    assert(strftime("%j %u %w %V %G %s %C %I %p", 1300003020L)
      == "072 7 0 10 2011 1300003020 20 07 AM")
    assert(strftime("%c", 1300003020L) == "Sun Mar 13 07:57:00 2011")
    assert(strftime("%F %T %R 100%%", 1300003020L)
      == "2011-03-13 07:57:00 07:57 100%")
    // no-data form: conversions become output-shaped dashes
    // (rrd_graph.c:6164-6315; vformatter1's "---------- --:--:--")
    assert(timeClean("from %Y to %m") == "from ---- to --")
    assert(timeClean("%F %T") == "---------- --:--:--")
    assert(timeClean("%R %D %j 100%%") == "--:-- --/--/-- --- 100%")
  }

  test("tests/rpn1 via literal command strings against the store") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_gs").toString
    // rrdtool create rpn1.rrd --start 920804400
    //   DS:speed:COUNTER:600:U:U RRA:AVERAGE:0.5:1:24 RRA:AVERAGE:0.5:6:10
    RrdStore.create(path, RrdSchema(300L, 920804400L,
      Seq(DsDef("speed", Dst.Counter, 600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 24L),
        RraDef(Cf.Average, 0.5, 6L, 10L))))
    val updates = Seq(12345.0, 12357.0, 12363.0, 12363.0, 12363.0, 12373.0,
      12383.0, 12393.0, 12399.0, 12405.0, 12411.0, 12415.0, 12420.0,
      12422.0, 12423.0)
    val samples = updates.zipWithIndex.map { case (v, i) =>
      ("rpn1", (920804700L + i * 300L) * 1000000L, v)
    }.toDF("k", "ts_us", "value")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "ts_us",
      Map("speed" -> "value"))

    val r = GraphScript.run(spark, GraphScript.parse(Seq(
        s"DEF:my-speed=$path:speed:AVERAGE",
        "CDEF:nonans01=my-speed,UN,0,my-speed,IF",
        "CDEF:kmh=nonans01,3600,*",
        "CDEF:fast123456789012345678901234567890=kmh,100,GT,100,0,IF",
        "CDEF:over=kmh,100.000000000000000000000000000000000000,GT,kmh,100,-,0,IF",
        "CDEF:good=kmh,100,GT,0,kmh,IF",
        "VDEF:f=fast123456789012345678901234567890,AVERAGE",
        "VDEF:g=good,MAXIMUM",
        "VDEF:o=over,MINIMUM",
        "PRINT:f:%lf",
        "PRINT:g:%lf",
        "PRINT:o:%lf")),
      // the reference graphv window is stamp-inclusive at start
      920804400L - 300L, 920808000L, Seq("k"), Seq("rpn1"))
    assert(r.prints == Seq("30.769231", "72.000000", "0.000000"))
  }

  test("LINE/AREA/STACK elements resolve the value range; XPORT assembles") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_gs2").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100L))))
    val samples = (0 to 20).map(i => ("s1", i * 10000000L, i.toLong, 4.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    val r = GraphScript.run(spark, GraphScript.parse(Seq(
        s"DEF:a=$path:v:AVERAGE",
        "CDEF:b=a,2,*",
        "AREA:a#00ff00:base",
        "LINE2:b#ff0000:double:STACK",
        "XPORT:a:base", "XPORT:b:doubled")),
      0L, 200L, Seq("k"), Seq("s1"), xsize = 20)
    assert(r.valueMin.contains(4.0))
    assert(r.valueMax.contains(12.0)) // stacked: 4 + 8
    val x = r.xport.get.orderBy("ts")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(r.xportLegend == Seq("base", "doubled"))
    assert(x.drop(1).forall(t => t._2.contains(4.0) && t._3.contains(8.0)))
  }
}
