package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Pins the duplicated n-gram span operator against a brute-force
  * Scala computation on planted documents:
  *   - only CROSS-document repeats count (a gram repeated inside one
  *     doc and nowhere else is not duplicated);
  *   - covered_tokens is the interval UNION of hit spans (overlapping
  *     grams don't double-count);
  *   - docs shorter than n words, and docs with no duplicated grams,
  *     are absent;
  *   - real-corpus smoke: exact duplicate docs report full coverage.
  */
class DupSpanSpec extends SparkSuite {

  private def run(docs: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    Dedup.ngramDupCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  test("planted docs: cross-doc spans, interval union, absences") {
    // shared 4-gram span "a b c d" in docs 1 and 2 (overlapping grams in
    // doc 2 via "a b c d e": grams "a b c d" at pos 1 is shared; doc 2's
    // gram "b c d e" is unique) — doc 3 repeats a gram internally only,
    // doc 4 is too short, doc 5 shares nothing.
    val docs = Seq(
      1L -> "a b c d x y z w",   // 8 tokens, gram(1)="a b c d" shared
      2L -> "a b c d e f g h",   // gram(1) shared; others unique
      3L -> "p q r s t p q r s t", // internal repeat only: "p q r s" etc.
      4L -> "a b c",             // < n tokens
      5L -> "m n o u v w1 w2 w3")
    val got = run(docs, 4)
    // doc 3: its grams occur twice WITHIN the doc but in no other doc —
    // min(doc)=max(doc)=3, not duplicated. Absent.
    assert(got.keySet == Set(1L, 2L),
      s"expected docs 1,2 only, got ${got.keySet}")
    // doc 1: one hit position (pos 1), covers tokens 1..4 of 8
    assert(got(1L) == ((8L, 1L, 4L, 0.5)))
    // doc 2: one hit position (pos 1), covers 4 of 8
    assert(got(2L) == ((8L, 1L, 4L, 0.5)))
  }

  test("overlapping hit spans union, not sum") {
    // docs share a 5-token run "a b c d e" -> with n=4, hit positions
    // 1 and 2 in each; union covers tokens 1..5, not 8
    val docs = Seq(
      1L -> "a b c d e x y z",
      2L -> "a b c d e q r s")
    val got = run(docs, 4)
    assert(got(1L) == ((8L, 2L, 5L, 0.625)))
    assert(got(2L) == ((8L, 2L, 5L, 0.625)))
  }

  test("removeDuplicateSpans: excises covered tokens symmetrically, " +
      "passes clean docs through, empties fully covered docs") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d x y z w",   // shared gram "a b c d" -> drop 1..4
      2L -> "a b c d e f g h",   // same
      3L -> "p q r s t p q r s t", // internal repeat only: untouched
      4L -> "a b c",             // < n: untouched
      5L -> "a b c d",           // exactly the shared gram: fully covered
      6L -> "m n o u v w1 w2 w3") // shares nothing: untouched
    val got = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      "removal keeps EVERY doc's row")
    assert(got(1L) == ((8L, 4L, 0.5, "x y z w")))
    assert(got(2L) == ((8L, 4L, 0.5, "e f g h")))
    assert(got(3L) == ((10L, 10L, 1.0, "p q r s t p q r s t")))
    assert(got(4L) == ((3L, 3L, 1.0, "a b c")))
    assert(got(5L) == ((4L, 0L, 0.0, "")), "fully covered -> empty text")
    assert(got(6L) == ((8L, 8L, 1.0, "m n o u v w1 w2 w3")))
    // consistency with the coverage report on the real corpus:
    // kept_tokens = n_tok - covered_tokens for every covered doc
    val d = Tables.documents(spark, sf)
    val cover = Dedup.ngramDupCoverage(d, "doc_id", "text", 8)
      .select("doc_id", "covered_tokens")
      .as[(Long, Long)].collect().toMap
    val removed = Dedup.removeDuplicateSpans(d, "doc_id", "text", 8)
      .select("doc_id", "n_tok", "kept_tokens")
      .as[(Long, Long, Long)].collect()
    assert(removed.nonEmpty && cover.nonEmpty)
    removed.foreach { case (id, nTok, kept) =>
      assert(nTok - kept == cover.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("real corpus: near-dup docs carry shared spans, bounds hold") {
    val d = Tables.documents(spark, sf)
    val rows = Dedup.ngramDupCoverage(d, "doc_id", "text", n = 8).collect()
    // the fixture's planted near-dup groups share literal word runs
    assert(rows.nonEmpty, "near-dup fixture should share 8-gram spans")
    rows.foreach { r =>
      val (nTok, grams, cov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(grams >= 1 && cov >= 8 && cov <= nTok,
        s"bounds violated: $r")
      assert(r.getDouble(4) == cov.toDouble / nTok.toDouble)
    }
  }
}
