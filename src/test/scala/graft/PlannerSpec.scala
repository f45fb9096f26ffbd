package graft

import graft.ingest.UpdateParser
import graft.model.{Cf, DsDef, Dst, RraDef, RrdSchema}
import graft.query.GraphPlan
import graft.sources.DefSource
import org.apache.spark.sql.functions._

/** Coverage for the gdes planner, the update-string parser, and the
  * sql/cb DEF source dispatch. */
class PlannerSpec extends SparkSuite {

  private val schema = RrdSchema(300L, 0L,
    Seq(DsDef("a", Dst.Gauge, 600L), DsDef("b", Dst.Counter, 600L),
      DsDef("c", Dst.Compute, rpn = Some("a,b,+"))),
    Seq(RraDef(Cf.Average, 0.5, 1L, 100L)))

  test("update parser: times, U values, template, COMPUTE guard") {
    val u = UpdateParser.parse("920804700:12:34:U", schema)
    assert(u.tsUs == 920804700000000L)
    assert(u.values == Map("a" -> Some(12.0), "b" -> Some(34.0), "c" -> None))
    // fractional seconds
    assert(UpdateParser.parse("100.25:1:2:U", schema).tsUs == 100250000L)
    // N = now
    assert(UpdateParser.parse("N:1:2:U", schema, nowSec = 42L).tsUs
      == 42000000L)
    // template reorders and defaults the rest to unknown
    val t = UpdateParser.parse("10:5", schema, template = Some(Seq("b")))
    assert(t.values == Map("a" -> None, "b" -> Some(5.0), "c" -> None))
    // COMPUTE DS must be 'U'
    intercept[IllegalArgumentException] {
      UpdateParser.parse("10:1:2:3", schema)
    }
    // AT-style time
    assert(UpdateParser.parse("now-10s:1:2:U", schema, nowSec = 100L).tsUs
      == 90000000L)
  }

  test("update parser: bulk column form") {
    import spark.implicits._
    val df = Seq("100:1:2:U", "200.5:U:3:U", "300:4::U")
      .toDF("u")
    val out = UpdateParser.parseUpdates(df, "u", schema)
      .orderBy("ts_us")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(out(0) == ((100000000L, Some(1.0), Some(2.0), None)))
    assert(out(1) == ((200500000L, None, Some(3.0), None)))
    assert(out(2) == ((300000000L, Some(4.0), None, None)))
  }

  test("gdes planner: gcd resample repeats coarse values; VDEF substitutes") {
    import spark.implicits._
    // fine series at 10s, coarse at 30s over (0, 60]
    val fine = (1 to 6).map(i => (i * 10L, i.toDouble)).toDF("ts", "v")
    val coarse = Seq((30L, 100.0), (60L, 200.0)).toDF("ts", "v")
    val p = new GraphPlan(spark, 0L, 60L)
      .define("f", fine, "ts", "v", 10L)
      .define("c", coarse, "ts", "v", 30L)
      .cdef("sum", "f,c,+")
      .vdef("m", "f", "AVERAGE")
      .cdef("dev", "f,m,-")
    assert(p.scalarOf("m").value.contains(3.5))
    val rows = p.xport(Seq("f", "c", "sum", "dev"))
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // coarse value 100.0 repeats across slots 10..30
    assert(rows(0) == ((10L, Some(1.0), Some(100.0), Some(101.0), Some(-2.5))))
    assert(rows(2) == ((30L, Some(3.0), Some(100.0), Some(103.0), Some(-0.5))))
    assert(rows(5) == ((60L, Some(6.0), Some(200.0), Some(206.0), Some(2.5))))
  }

  test("gdes planner: VDEF extremes carry timestamps; DEF fetches dedup") {
    import spark.implicits._
    val f = Seq((10L, 5.0), (20L, 9.0), (30L, 9.0), (40L, 1.0)).toDF("ts", "v")
    val p = new GraphPlan(spark, 0L, 40L)
      .define("a", f, "ts", "v", 10L, key = "same")
      .define("b", f, "ts", "v", 10L, key = "same")
      .vdef("mx", "a", "MAXIMUM")
      .vdef("fst", "a", "FIRST")
      .vdef("lst", "a", "LAST")
    assert(p.scalarOf("mx") == GraphPlan.Scalar(Some(9.0), Some(20L))) // first hit
    assert(p.scalarOf("fst") == GraphPlan.Scalar(Some(5.0), Some(0L))) // interval start
    assert(p.scalarOf("lst") == GraphPlan.Scalar(Some(1.0), Some(40L)))
  }

  test("keyed planner: per-series CDEF/VDEF/SHIFT/XPORT, partitioned windows") {
    import spark.implicits._
    // two series, 10s steps over (0, 40]: x ramps 1..4, y ramps 10..40
    val rows = (1 to 4).flatMap(i => Seq(
      ("x", i * 10L, i.toDouble), ("y", i * 10L, i * 10.0)))
    val roll = rows.toDF("key", "ts", "v")
    val p = new GraphPlan(spark, 0L, 40L, keyCols = Seq("key"))
      .define("a", roll, "ts", "v", 10L)
      .vdef("m", "a", "AVERAGE") // per-key aggregate, no driver scalar
      .cdef("dev", "a,m,-")
      .cdef("tr", "a,20,TREND") // sequential op -> partitioned window
      .shift("ap", "a", 10L)
    val out = p.xport(Seq("a", "dev", "tr", "ap"))
    // every window in the plan partitions by the series key (no
    // single-partition WindowExec, round-2 verdict #5)
    val winSpecs = "windowspecdefinition\\([^)]*\\)".r
      .findAllIn(out.queryExecution.optimizedPlan.toString).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.contains("key")), winSpecs)
    val got = out.as[(String, Long, Option[Double], Option[Double],
      Option[Double], Option[Double])].collect().toSeq
    // per-key VDEF: mean(x)=2.5, mean(y)=25 -> dev at slot 10 = 1-2.5 / 10-25
    assert(got.find(r => r._1 == "x" && r._2 == 10L).get._4.contains(-1.5))
    assert(got.find(r => r._1 == "y" && r._2 == 10L).get._4.contains(-15.0))
    // TREND(20s) at slot 20: mean of slots 10,20 per key
    assert(got.find(r => r._1 == "x" && r._2 == 20L).get._5.contains(1.5))
    assert(got.find(r => r._1 == "y" && r._2 == 20L).get._5.contains(15.0))
    // SHIFT presents t-10's value at t, per key
    assert(got.find(r => r._1 == "x" && r._2 == 20L).get._6.contains(1.0))
    assert(got.find(r => r._1 == "y" && r._2 == 40L).get._6.contains(30.0))
    // keyed scalar frame is addressable; driver-side PRINT refuses loudly
    assert(p.keyedScalarOf("m").orderBy("key").as[(String, Double)]
      .collect().toSeq == Seq(("x", 2.5), ("y", 25.0)))
    intercept[IllegalArgumentException] { p.print("m", "%lf") }
  }

  test("sql// executes against a real embedded database with pushdown") {
    // Derby in-process (on the Spark classpath) stands in for libdbi's
    // sqlite3 shape: dbname IS the database, no host
    // (doc/rrdgraph_libdbi.pod:7 grammar; rrd_fetch_libdbi.c:30-200)
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:graftdb;create=true")
    val st = conn.createStatement()
    st.execute("CREATE TABLE vals (uts BIGINT, value DOUBLE, tag INT)")
    (1 to 8).foreach(i => st.execute(
      s"INSERT INTO vals VALUES (${i * 100}, ${i * 1.5}, ${if (i % 2 == 0) 7 else 3})"))
    st.close(); conn.close()

    val df = DefSource.resolve(spark,
      "sql//derby/dbname=memory:graftdb//VALS/UTS/VALUE/TAG=7")
    import spark.implicits._
    val rows = df.orderBy("ts_sec").as[(Long, Double)].collect().toSeq
    assert(rows == Seq((200L, 3.0), (400L, 6.0), (600L, 9.0), (800L, 12.0)))
    // the where-clause reaches the database as a pushed filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(TAG,7)"),
      plan.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("cb// callback source + sql// grammar parse") {
    import spark.implicits._
    DefSource.registerCallback("mysrc",
      s => { import s.implicits._; Seq((1L, 2.0)).toDF("ts_sec", "value") })
    val df = DefSource.resolve(spark, "cb//mysrc")
    assert(df.as[(Long, Double)].collect().toSeq == Seq((1L, 2.0)))

    val spec = DefSource.parseSql(
      "sql//mysql/host=127.0.0.1/dbname=rrd/username=u//vals/uts/value/key=7")
    assert(spec.driver == "mysql")
    assert(spec.jdbcUrl == "jdbc:mysql://127.0.0.1/rrd")
    assert(spec.table == "vals" && spec.tsCol == "uts" &&
      spec.valueCol == "value")
    assert(spec.wheres == Seq("key=7"))
    assert(spec.properties.getProperty("username") == "u")
  }
}
