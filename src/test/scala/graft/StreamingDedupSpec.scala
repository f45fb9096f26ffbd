package graft

import graft.streaming.StreamingDedup

/** Pins the streaming exactly-once dedup (q87): redeliveries vanish,
  * genuinely new rows still append, and the state store holds exactly
  * one row per distinct key — the growth axis ScaleBench measures.
  */
class StreamingDedupSpec extends SparkSuite {

  test("redeliveries vanish, new rows append, state == distinct keys") {
    import spark.implicits._
    val input = (1L to 20L).map(i => (i, i * 10.0)).toDF("id", "v")
    // batch 2: redeliver half of batch 1 verbatim + two NEW keys
    val redelivered = ((1L to 20L by 2).map(i => (i, i * 10.0)) ++
      Seq((21L, 210.0), (22L, 220.0))).toDF("id", "v")
    val (out, st) = StreamingDedup.dedupFileRun(
      spark, input, redelivered, Seq("id"))
    val got = out.as[(Long, Double)].collect().toMap
    assert(got == (1L to 22L).map(i => i -> i * 10.0).toMap)
    val m = st.getOrElse(fail("streaming dedup must be stateful"))
    assert(m.maxRows == 22L,
      s"state must hold one row per distinct key, got ${m.maxRows}")
    assert(m.maxBytes > 0L)
  }

  test("within-batch duplicates also collapse to one row") {
    import spark.implicits._
    val input = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v")
    val (out, _) = StreamingDedup.dedupFileRun(
      spark, input, Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"))
    assert(out.count() == 2L)
  }
}
