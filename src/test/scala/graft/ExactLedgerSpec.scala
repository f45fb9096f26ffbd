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
}
