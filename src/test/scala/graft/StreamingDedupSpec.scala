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

  test("watermarked dedup: in-lag replays vanish, post-eviction re-admits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    def frame(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("id", "sec", "v")
        .select(col("id"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    // times offset from epoch 0 (the INITIAL watermark — a t=0 row
    // would tie it and be dropped as late). Batch 1: A at t=+0,
    // B at t=+100 -> watermark after batch 1 is +90, which EVICTS A's
    // state (+0 < +90) but keeps B's
    val t0 = 1000000L
    val input = frame(Seq((1L, t0, 1.0), (2L, t0 + 100, 2.0)))
    // batch 2: replay B inside its lag (dropped) and re-send key A at
    // t=+95 (state gone -> re-admitted: the documented bounded-state
    // trade)
    val late = frame(Seq((2L, t0 + 100, 2.0), (1L, t0 + 95, 9.0)))
    val (out, st) = StreamingDedup.dedupWithinWatermarkFileRun(
      spark, input, late, Seq("id"), "ts", "10 seconds")
    val got = out.select("id", "v").as[(Long, Double)].collect().toSeq
      .sorted
    assert(got == Seq((1L, 1.0), (1L, 9.0), (2L, 2.0)),
      s"expected A twice (evicted then re-admitted), B once: $got")
    val m = st.getOrElse(fail("stateful query must report metrics"))
    // bounded: the max in-flight state is the 2 batch-1 keys, never
    // the 3 deliveries
    assert(m.maxRows == 2L, s"state must stay within the lag: ${m.maxRows}")
  }

  test("within-batch duplicates also collapse to one row") {
    import spark.implicits._
    val input = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v")
    val (out, _) = StreamingDedup.dedupFileRun(
      spark, input, Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"))
    assert(out.count() == 2L)
  }

  test("streaming CDC gate: stream == batch-incremental == full re-mine " +
      "restricted to the batch; state rows == distinct chunk hashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.ext.Dedup
    import graft.streaming.StreamingCdcDedup
    val docs = Tables.documents(spark, sf)
    val thr = docs.count() * 4 / 5
    val corpus = docs.where(col("doc_id") < thr)
    val batch = docs.where(col("doc_id") >= thr)
    val (stats, st) = StreamingCdcDedup.cdcBatchStats(
      spark, corpus, batch, "doc_id", "text")
    val got = stats.as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    // identity 1: the batch incremental gate
    val inc = Dedup.incrementalCdcDedup(batch,
        Dedup.cdcChunkIndex(corpus, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == inc, "stream == batch incremental")
    // identity 2: the full re-mine restricted to batch docs
    val batchIds = batch.select(col("doc_id")).as[Long].collect().toSet
    val full = Dedup.cdcDedupStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().filter(r => batchIds(r._1)).sortBy(_._1).toSeq
    assert(got == full, "stream == full re-mine on batch docs")
    assert(got.exists(_._3 > 0), "batch must see corpus duplicates")
    // state law: one row per distinct chunk hash over corpus + batch
    val distinctHashes = Dedup.cdcChunks(docs, "doc_id", "text", 4, 16)
      .select(col("chunk_hash")).distinct().count()
    val m = st.getOrElse(fail("the CDC gate must be stateful"))
    assert(m.maxRows == distinctHashes,
      s"state rows ${m.maxRows} != distinct chunk hashes $distinctHashes")
  }

  test("streaming CDC gate mega-bucket skew: a chunk present in EVERY " +
      "batch doc gets correct verdicts under the default cap; a tiny " +
      "maxInstances ceiling fails loudly instead of buffering") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingCdcDedup
    // identical boilerplate text in every doc: all instances of each
    // chunk hash land in ONE flatMapGroupsWithState task's buffer —
    // the skew the batch families cap with maxDf
    val boiler = "nav bar home search about contact login logout"
    val corpus = Seq((1L, boiler)).toDF("doc_id", "text")
    val batch = (2L to 41L).map(i => (i, boiler)).toDF("doc_id", "text")
    val (out, _) = StreamingCdcDedup.cdcBatchStats(
      spark, corpus, batch, "doc_id", "text")
    val got = out.as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got.length == 40)
    // df = 41 for every chunk: every chunk of every batch doc is dup
    assert(got.forall(r => r._3 == r._2 && r._2 >= 1 && r._6 == 1.0),
      s"all-boilerplate batch docs must be fully duplicate: $got")
    // the loud ceiling: 40 instances of one hash in the arriving
    // micro-batch > maxInstances=8 — the gate must raise, not OOM
    val ex = intercept[Exception] {
      StreamingCdcDedup.cdcFileRun(spark, corpus, batch,
        "doc_id", "text", maxInstances = 8)._1.count()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("maxInstances")),
      s"expected the loud maxInstances error, got: ${msgs.take(3)}")
  }
}
