package graft

import graft.streaming.{StreamingIngest, StreamRun}

/** Pins the StreamRun state-metrics contract ScaleBench depends on:
  * metrics return WITH the frame (no side channel), and the gate's
  * state footprint is exactly one `last_up` row per distinct series —
  * the "state grows ∝ series" law SCALE.md measures at 10×/100×.
  */
class StreamStateMetricsSpec extends SparkSuite {
  import StreamingIngest.GateRow

  test("gateFileRunWithState reports one state row per series") {
    import spark.implicits._
    val series = (1 to 7).map(i => s"s$i")
    val input = series.flatMap(k =>
      Seq(GateRow(k, 100, 1, 1.0), GateRow(k, 200, 2, 2.0))).toDS()
    val late = series.map(k => GateRow(k, 150, 3, 9.0)).toDS()
    val (out, st) = StreamingIngest.gateFileRunWithState(spark, input, late)
    assert(out.count() == series.size * 2L) // late rows all rejected
    val m = st.getOrElse(fail("stateful query must report metrics"))
    assert(m.maxRows == series.size.toLong,
      s"gate state must be one last_up row per series, got ${m.maxRows}")
    assert(m.maxBytes > 0L)
  }

  test("a stateless stream run reports no state metrics") {
    import spark.implicits._
    val input = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val (out, st) = StreamRun.run(spark, input,
      src => src.select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.upper(
          org.apache.spark.sql.functions.col("v")).as("v")),
      Seq.empty)
    assert(out.count() == 2L)
    assert(st.isEmpty, "a map-only stream has no stateful operators")
  }
}
