package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics checks for the SparkEntry query registry at sf0.001.
  * (Numeric cross-engine equality is separately enforced by the DuckDB
  * oracle harness: tools/check.py over Verify's output.) */
class QueriesSpec extends SparkSuite {

  test("every query has an oracle and runs non-empty at sf0.001") {
    val qs = SparkEntry.queries
    val missing = qs.keySet -- SparkEntry.oracleSql.keySet
    // queries without an oracle are allowed (weaker rows-only check) but
    // every oracle must refer to an existing query
    assert((SparkEntry.oracleSql.keySet -- qs.keySet).isEmpty)
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
    assert(missing.forall(_.nonEmpty)) // touch to avoid unused warning
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("rate conversion: counter wrap and heartbeat null") {
    import spark.implicits._
    import graft.model.{DsDef, Dst}
    val df = Seq(
      ("s1", 1000000L, 0L, 100.0),
      ("s1", 2000000L, 1L, 400.0),   // rate 300/s
      ("s1", 3000000L, 2L, 100.0),   // wrap: (100-400+2^32-1)/1 = 4294966994
      ("s1", 20000000L, 3L, 200.0)   // 17s gap > hb 10 ⇒ null
    ).toDF("k", "ts_us", "id", "v")
    val out = ingest.Rates.withRate(df, Seq("k"), "ts_us", "id", "v",
        DsDef("v", Dst.Counter, heartbeatSec = 10L))
      .orderBy("ts_us").select("rate").as[Option[Double]].collect()
    assert(out(0).isEmpty)
    assert(out(1).contains(300.0))
    assert(out(2).contains(4294966995.0)) // (100-400) + 2^32-1
    assert(out(3).isEmpty)
  }

  test("Cdef.interpreted keeps colliding multi-column series keys apart") {
    import spark.implicits._
    import scala.collection.immutable.ListMap
    // ("ab","c") vs ("a","bc"): any separator-less concat merges them and
    // interleaves their slots; PREV-based ffill would then leak across.
    val df = Seq(
      ("ab", "c", 60L, Some(1.0)), ("ab", "c", 120L, None),
      ("a", "bc", 60L, Some(9.0)), ("a", "bc", 120L, None)
    ).toDF("k1", "k2", "ts", "v")
    val out = query.Cdef.interpreted(df, Seq("k1", "k2"), "ts", Seq("v"),
        ListMap("ffill" -> "v,UN,PREV,v,IF"), 60L)
      .orderBy("k1", "k2", "ts")
      .select("k1", "k2", "ts", "ffill")
      .as[(String, String, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("a", "bc", 60L, Some(9.0)), ("a", "bc", 120L, Some(9.0)),
      ("ab", "c", 60L, Some(1.0)), ("ab", "c", 120L, Some(1.0))))
  }

  test("consolidation xff rule (rrd_update.c:2040-2045)") {
    import spark.implicits._
    import graft.model.Cf
    // 4 PDPs per CDP, xff 0.5: bucket with 2 known of 4 passes (2 > 2 is
    // false), bucket with 1 known of 4 is unknown (3 > 2)
    val df = Seq(
      ("a", 300L, Some(1.0)), ("a", 600L, Some(3.0)), // 2 known, 2 missing
      ("b", 300L, Some(8.0))                          // 1 known, 3 missing
    ).toDF("k", "pdp_ts", "pdp")
    val out = ingest.Consolidate
      .cdp(df, Seq("k"), "pdp_ts", "pdp", 300L, 4L, Cf.Average, 0.5)
      .orderBy("k").select("cdp").as[Option[Double]].collect()
    assert(out(0).contains(2.0)) // (1+3)/2 known
    assert(out(1).isEmpty)       // xff exceeded
  }
}
