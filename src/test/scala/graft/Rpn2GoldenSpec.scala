package graft

import scala.collection.immutable.ListMap

import graft.model.{DsDef, Dst}
import org.apache.spark.sql.functions._

/** Port of /root/reference/tests/rpn2 (+ rpn2.output): a DCOUNTER series
  * exported through 17 CDEFs under TZ=Europe/Zurich — the NEW* local-day
  * boundary ops across the 2006→2007 New Year (Sunday week start per the
  * C locale), self-referential PREV accumulators, the set ops
  * (AVG/SMIN/SMAX/MEDIAN/PERCENT/STDEV), and the xport JSON emitter.
  * Compared line-for-line after the harness's seddif normalization.
  */
class Rpn2GoldenSpec extends SparkSuite {

  private val FloatRe = "[-+]?\\d\\.\\d+e[-+]\\d+".r
  private def seddif(s: String): String =
    FloatRe.replaceAllIn(s, m =>
      "%.7e".formatLocal(java.util.Locale.ROOT, m.matched.toDouble))

  test("tests/rpn2 xport --json golden (TZ=Europe/Zurich)") {
    import spark.implicits._
    // create --step 7200 DS:speed:DCOUNTER:14000:U:U RRA:AVERAGE:0.5:1:30
    val updates = (0 to 18).map(i => (1167487200L + i * 7200L, i * 720.0))
    val samples = updates.map { case (t, v) => ("rpn2", t * 1000000L, v) }
      .toDF("k", "ts_us", "value")
    val rated = ingest.Rates.withRate(samples, Seq("k"), "ts_us", "ts_us",
      "value", DsDef("speed", Dst.DCounter, 14000L))
    val pdp = ingest.Normalize.pdp(rated, Seq("k"), "ts_us", "rate", 7200L)
    val frame = query.Fetch.fetch(spark,
      pdp.select(col("pdp_ts"), col("pdp").as("myspeed")),
      "pdp_ts", Seq("myspeed"), 1167487200L, 1167616800L, 7200L)

    val exprs = ListMap(
      "rday" -> "myspeed,POP,NEWDAY",
      "rweek" -> "myspeed,POP,NEWWEEK",
      "rmonth" -> "myspeed,POP,NEWMONTH",
      "ryear" -> "myspeed,POP,NEWYEAR",
      "day" -> "myspeed,STEPWIDTH,*,NEWDAY,0,PREV,IF,ADDNAN",
      "week" -> "myspeed,STEPWIDTH,*,NEWWEEK,0,PREV,IF,ADDNAN",
      "month" -> "myspeed,STEPWIDTH,*,NEWMONTH,0,PREV,IF,ADDNAN",
      "year" -> "myspeed,STEPWIDTH,*,NEWYEAR,0,PREV,IF,ADDNAN",
      "avg" -> "myspeed,POP,1,1,1,17,4,AVG",
      "smin" -> "myspeed,POP,3,4,5,2.2,4,SMIN",
      "smax" -> "myspeed,POP,3,4,5,2.2,4,SMAX",
      "med1" -> "myspeed,POP,3,4,5,2.2,4,MEDIAN",
      "med2" -> "myspeed,POP,3,4,5,2.2,11,5,MEDIAN",
      "stdev" -> "myspeed,POP,3,4,5,2.2,4,STDEV",
      "p9" -> "myspeed,POP,0.5,1,1,1,1,1,1,1,5,10,100,10,PERCENT",
      "pow" -> "myspeed,2,POW")
    // PREV is self-referential -> the sequential interpreter carries all
    // 16 CDEFs in one per-series pass, TZ'd like the reference harness
    val out = query.Cdef.interpreted(frame, Nil, "ts", Seq("myspeed"),
      exprs, 7200L, timeZone = "Europe/Zurich")

    val legend = Seq("myspeed", "day", "rday", "week", "rweek", "month",
      "rmonth", "year", "ryear", "avg", "smin", "smax", "med1", "med2",
      "p9", "pow", "stdev")
    val joined = frame.join(out.drop("myspeed"), Seq("ts"))
    val result = query.Xport.collect(joined, "ts", legend,
      1167487200L, 1167616800L, 7200L)
    val got = seddif(query.Xport.toJson(result))
    val expected = seddif(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/rpn2.output")), "UTF-8"))
    assert(got == expected)
  }
}
