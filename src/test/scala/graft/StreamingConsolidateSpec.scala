package graft

import graft.ingest.Consolidate
import graft.model.Cf
import graft.streaming.StreamingConsolidate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One PDP sample on the step grid; None = unknown PDP. Top-level so the
  * product encoder does not capture the suite instance. */
case class CSample(series: String, tsUs: Long, v: Option[Double])

/** Streaming CDP consolidation: the event-time windowed aggregation must
  * (a) emit exactly the batch consolidator's rows once the watermark
  * closes each window — END-labeled, end-inclusive buckets, decimal-sum
  * AVERAGE, strict xff — and (b) drop samples arriving later than the
  * watermark without re-opening a closed CDP.
  */
class StreamingConsolidateSpec extends SparkSuite {
  import spark.implicits._

  private val step = 300L
  private val pdpCnt = 6L
  private def us(sec: Long): Long = sec * 1000000L

  test("windowed CDP equals the batch consolidator; late samples dropped") {
    implicit val sqlCtx = spark.sqlContext
    val onTime = Seq(
      // series a: full first bucket (incl. the exact 1800 boundary,
      // which must land in the bucket ENDING at 1800), sparse second
      CSample("a", us(300), Some(1.0)), CSample("a", us(600), Some(2.0)),
      CSample("a", us(900), None), CSample("a", us(1200), Some(4.0)),
      CSample("a", us(1500), Some(5.0)), CSample("a", us(1800), Some(6.0)),
      CSample("a", us(2100), Some(7.0)), CSample("a", us(3600), Some(8.0)),
      // series b: enough unknowns to trip xff=0.5 in its first bucket
      CSample("b", us(300), None), CSample("b", us(600), None),
      CSample("b", us(900), None), CSample("b", us(1200), None),
      CSample("b", us(1500), Some(9.0)), CSample("b", us(1800), Some(11.0)))
    // outside the reference's time domain (update times are positive):
    // must be DROPPED, not emitted under either bucketing convention
    val nonPositive = Seq(CSample("a", 0L, Some(999.0)),
      CSample("b", us(-600), Some(999.0)))

    val input = MemoryStream[CSample]
    val out = StreamingConsolidate.cdpStream(input.toDF(), Seq("series"),
      "tsUs", "v", step, pdpCnt, Cf.Average, xff = 0.5, latenessSec = 600)
    val q = out.writeStream.format("memory").queryName("cdp_stream")
      .outputMode("append").start()
    try {
      input.addData(onTime ++ nonPositive: _*)
      q.processAllAvailable()
      // advance the watermark far past every real window...
      input.addData(CSample("a", us(100000), Some(0.0)))
      q.processAllAvailable()
      // ...then a batch that (i) carries a sample 97.9 ks older than the
      // watermark — must be DROPPED, its bucket already closed — and
      // (ii) triggers eviction/emission of the closed windows
      input.addData(CSample("a", us(1500), Some(1000.0)))
      q.processAllAvailable()
      input.addData(CSample("a", us(100300), Some(0.0)))
      q.processAllAvailable()

      val got = spark.table("cdp_stream")
        .as[(String, Long, Option[Double], Long)].collect().toSet
        .filter(_._2 <= 3600) // the advancers' own windows never close
      val want = Consolidate.cdp(
          onTime.map(s => (s.series, s.tsUs / 1000000L, s.v)).toDF("series", "ts", "v"),
          Seq("series"), "ts", "v", step, pdpCnt, Cf.Average, 0.5)
        .as[(String, Long, Option[Double], Long)].collect().toSet
      assert(want.exists(r => r._1 == "b" && r._2 == 1800 && r._3.isEmpty),
        "fixture must exercise the xff-unknown CDP")
      assert(got == want,
        s"streaming vs batch CDP mismatch:\n got=$got\n want=$want")
    } finally q.stop()
  }

  test("MIN/MAX/LAST windowed CFs reuse the batch aggregates verbatim") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      CSample("a", us(300), Some(5.0)), CSample("a", us(600), Some(1.0)),
      CSample("a", us(900), Some(3.0)), CSample("a", us(1800), None))
    Seq(Cf.Min -> 1.0, Cf.Max -> 5.0, Cf.Last -> 3.0).foreach {
      case (cf, expect) =>
        val input = MemoryStream[CSample]
        val name = s"cdp_${cf.toString.toLowerCase}"
        val q = StreamingConsolidate.cdpStream(input.toDF(), Seq("series"),
            "tsUs", "v", step, pdpCnt, cf, xff = 0.9, latenessSec = 0)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          input.addData(rows: _*)
          q.processAllAvailable()
          input.addData(CSample("a", us(100000), Some(0.0)))
          q.processAllAvailable()
          input.addData(CSample("a", us(100300), Some(0.0)))
          q.processAllAvailable()
          val got = spark.table(name)
            .as[(String, Long, Option[Double], Long)].collect()
            .filter(_._2 <= 1800)
          assert(got.toSeq == Seq(("a", 1800L, Some(expect), 3L)), s"cf=$cf")
        } finally q.stop()
    }
  }

  test("AvailableNow drain emits exactly the per-append cadence's rows") {
    // the q72_available_now claim: preloading input + sentinel and
    // letting Trigger.AvailableNow run (one data batch + the no-data
    // flush batch) must produce the SAME sink rows as the three-batch
    // processAllAvailable cadence — the wall delta between the two
    // forms is then pure trigger/commit machinery, not semantics
    val input = Seq(
      CSample("a", us(300), Some(1.0)), CSample("a", us(600), Some(2.0)),
      CSample("a", us(1500), Some(5.0)), CSample("a", us(1800), Some(6.0)),
      CSample("a", us(2100), Some(7.0)), CSample("a", us(3600), Some(8.0)),
      CSample("b", us(300), None), CSample("b", us(600), None),
      CSample("b", us(900), None), CSample("b", us(1200), None),
      CSample("b", us(1500), Some(9.0)), CSample("b", us(1800), Some(11.0))
    ).map(s => (s.series, s.tsUs, s.v)).toDF("series", "tsUs", "v")
    val sentinel = Seq(("__wm", us(100000), Option.empty[Double]))
      .toDF("series", "tsUs", "v")
    def rows(r: (org.apache.spark.sql.DataFrame,
        Option[graft.streaming.StreamRun.StateMetrics])) =
      r._1.as[(String, Long, Option[Double], Long)].collect().toSet
        .filter(_._1 != "__wm")
    val perAppend = StreamingConsolidate.cdpStreamFileRunWithState(
      spark, input, sentinel, Seq("series"), "tsUs", "v", step, pdpCnt,
      Cf.Average, 0.5, latenessSec = 0)
    val availNow = StreamingConsolidate.cdpStreamAvailableNowRunWithState(
      spark, input, sentinel, Seq("series"), "tsUs", "v", step, pdpCnt,
      Cf.Average, 0.5, latenessSec = 0)
    val (pa, an) = (rows(perAppend), rows(availNow))
    assert(pa.nonEmpty, "fixture must emit closed windows")
    assert(an == pa,
      s"AvailableNow vs per-append mismatch:\n an=$an\n pa=$pa")
    assert(availNow._2.nonEmpty,
      "AvailableNow run must surface state metrics")
  }
}
