package graft

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Incremental exact-dedup ingest ledger: the three verdicts, the
  * corpus-hit priority rule, and the q46-style identity law against
  * exactGroups over the union.
  */
class ExactLedgerSpec extends SparkSuite {
  import spark.implicits._

  test("ledger verdicts: corpus dup, batch dup, new; corpus hit wins") {
    val corpus = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "aaa"), // in corpus -> dup_of_corpus, canonical 1
      (11L, "ccc"), // first anywhere -> new_unique
      (12L, "ccc"), // second in batch -> dup_in_batch, canonical 11
      (13L, "ddd"), // new
      (20L, "bbb"), // corpus hit ...
      (21L, "bbb")) // ... and BOTH batch copies point at corpus id 2
      .toDF("doc_id", "text")
    val dg = TextAnalysis.fingerprint(col("text"))
    val idx = Dedup.digestIndex(corpus, "doc_id", dg)
    val got = Dedup.exactDedupLedger(batch, idx, "doc_id", dg)
      .orderBy("doc_id")
      .select("doc_id", "status", "canonical_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (10L, "dup_of_corpus", 1L),
      (11L, "new_unique", 11L),
      (12L, "dup_in_batch", 11L),
      (13L, "new_unique", 13L),
      (20L, "dup_of_corpus", 2L),
      (21L, "dup_of_corpus", 2L)))
  }

  test("identity law: canonical == exactGroups min over the union (append-only ids)") {
    val docs = Tables.documents(spark, sf)
    val thr = docs.count() * 4 / 5
    val dg = TextAnalysis.fingerprintPrefix(col("text"), 2)
    val idx = Dedup.digestIndex(docs.where(col("doc_id") < thr),
      "doc_id", dg)
    val got = Dedup.exactDedupLedger(docs.where(col("doc_id") >= thr),
        idx, "doc_id", dg)
      .select("doc_id", "digest", "status", "canonical_id")
      .as[(Long, String, String, Long)].collect()
    assert(got.nonEmpty)
    // reference: min id per digest over the FULL union
    val unionMin = docs
      .select(col("doc_id"), dg.as("digest"))
      .groupBy("digest").agg(min("doc_id").as("m"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (id, d, st, canon) =>
      assert(canon == math.min(unionMin(d), id),
        s"doc $id digest $d: canonical $canon")
      st match {
        case "new_unique" => assert(canon == id)
        case _ => assert(canon < id)
      }
    }
    // verdict partition is total and consistent with the index
    val idxSet = idx.select("digest").as[String].collect().toSet
    got.foreach { case (id, d, st, _) =>
      if (idxSet(d)) assert(st == "dup_of_corpus", s"doc $id")
      else assert(st == "new_unique" || st == "dup_in_batch")
    }
  }

  /** Every ShuffleExchange sitting between a BUCKETED file scan and
    * its consuming join — the index re-shuffle the persisted layout
    * exists to eliminate. The walk STOPS at join nodes: an exchange of
    * a join RESULT (batch-sized by the gates' construction) is
    * legitimate even though its subtree transitively contains the
    * scan. Static plan (AQE off in the caller) so the walk sees final
    * operators. */
  private def indexSideExchanges(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // reaches a bucketed scan WITHOUT crossing another join (i.e. the
    // exchange input IS the index subplan, not a join result)
    def reachesBucketScan(n: SparkPlan): Boolean = n match {
      case _: BaseJoinExec => false
      case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
      case other => other.children.exists(reachesBucketScan)
    }
    p.collect {
      case e: ShuffleExchangeExec if reachesBucketScan(e.child) =>
        e.simpleStringWithNodeId()
    }
  }

  test("persisted BUCKETED indexes: both incremental gates plan ZERO " +
      "exchange on the corpus-sized index side and reproduce the " +
      "inline-index results exactly") {
    val docs = Tables.documents(spark, sf)
    val thr = docs.count() * 4 / 5
    val dg = TextAnalysis.fingerprintPrefix(col("text"), 2)
    val corpus = docs.where(col("doc_id") < thr)
    val batch = docs.where(col("doc_id") >= thr)
    Dedup.writeDigestIndexBucketed(
      Dedup.digestIndex(corpus, "doc_id", dg),
      "graft_test_q125_idx", buckets = 4)
    Dedup.writeBoilerplateChunkIndexBucketed(
      Dedup.boilerplateChunkIndex(corpus, "doc_id", "text", size = 4),
      "graft_test_q141_idx", buckets = 4)
    // broadcast off (at 100 TB the index never fits it) + AQE off so
    // the static plan is the one audited — the at-scale join shape
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val led = Dedup.exactDedupLedger(batch,
        spark.table("graft_test_q125_idx"), "doc_id", dg)
      val exL = indexSideExchanges(led.queryExecution.executedPlan)
      assert(exL.isEmpty,
        s"ledger re-shuffled the bucketed index:\n${exL.mkString("\n")}")
      val boil = Dedup.incrementalBoilerplateRemoval(batch,
        spark.table("graft_test_q141_idx"), "doc_id", "text",
        size = 4, minDocs = 2)
      val exB = indexSideExchanges(boil.queryExecution.executedPlan)
      assert(exB.isEmpty,
        s"gate re-shuffled the bucketed index:\n${exB.mkString("\n")}")
      // and the layout changes bytes, never content: bit-identical to
      // the inline-index forms
      val ledInline = Dedup.exactDedupLedger(batch,
          Dedup.digestIndex(corpus, "doc_id", dg), "doc_id", dg)
        .as[(Long, String, String, Long)].collect().sortBy(_._1)
      assert(led.as[(Long, String, String, Long)].collect()
        .sortBy(_._1).toSeq == ledInline.toSeq)
      val boilInline = Dedup.incrementalBoilerplateRemoval(batch,
          Dedup.boilerplateChunkIndex(corpus, "doc_id", "text", 4),
          "doc_id", "text", size = 4, minDocs = 2)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(boil.as[(Long, Long, Long, String)].collect()
        .sortBy(_._1).toSeq == boilInline.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql("DROP TABLE IF EXISTS graft_test_q125_idx")
      spark.sql("DROP TABLE IF EXISTS graft_test_q141_idx")
    }
  }

  test("CDC incremental gate: identity law vs the full re-mine; the " +
      "bucketed index plans ZERO index-side exchange") {
    val docs = Tables.documents(spark, sf)
    val thr = docs.count() * 4 / 5
    val corpus = docs.where(col("doc_id") < thr)
    val batch = docs.where(col("doc_id") >= thr)
    // identity law: the gate over (inline) index == the full re-mine
    // of corpus ∪ batch restricted to batch docs
    val inc = Dedup.incrementalCdcDedup(batch,
        Dedup.cdcChunkIndex(corpus, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val batchIds = batch.select(col("doc_id")).as[Long].collect().toSet
    val full = Dedup.cdcDedupStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double)].collect().filter(r => batchIds(r._1)).sortBy(_._1).toSeq
    assert(inc == full, "identity law")
    assert(inc.exists(_._3 > 0), "batch must see corpus duplicates")
    // bucketed layout: no corpus-sized exchange on the index side
    Dedup.writeCdcChunkIndexBucketed(
      Dedup.cdcChunkIndex(corpus, "doc_id", "text"),
      "graft_test_q161_idx", buckets = 4)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val gate = Dedup.incrementalCdcDedup(batch,
        spark.table("graft_test_q161_idx"), "doc_id", "text")
      val ex = indexSideExchanges(gate.queryExecution.executedPlan)
      assert(ex.isEmpty,
        s"gate re-shuffled the bucketed CDC index:\n${ex.mkString("\n")}")
      assert(gate.as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq == inc,
        "layout changes bytes, never content")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql("DROP TABLE IF EXISTS graft_test_q161_idx")
    }
  }
}
