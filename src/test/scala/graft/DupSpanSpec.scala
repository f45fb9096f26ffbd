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

  test("linear rebuild (array_except gather) ≡ per-token membership " +
      "filter on the real corpus and on heavy-dup planted docs") {
    import spark.implicits._
    // the pre-round-12 rebuild form, kept here as the parity reference:
    // per-token array_contains over a brute-force-derived covered set
    // (O(n_tok·|cov|))
    def reference(df: org.apache.spark.sql.DataFrame, n: Int) = {
      df.where(col("text").isNotNull)
        .select(col("doc_id"), graft.ext.TextAnalysis.words(col("text"))
          .as("__ws"))
        .join(covSets(df, n), Seq("doc_id"), "left")
        .withColumn("__cov", coalesce(col("__cov"),
          expr("CAST(array() AS ARRAY<BIGINT>)")))
        .withColumn("__keep", expr(
          "filter(__ws, (w, i) -> NOT array_contains(__cov, " +
            "CAST(i + 1 AS BIGINT)))"))
        .select(col("doc_id"),
          org.apache.spark.sql.functions.size(col("__ws")).cast("long")
            .as("n_tok"),
          org.apache.spark.sql.functions.size(col("__keep")).cast("long")
            .as("kept_tokens"),
          array_join(col("__keep"), " ").as("clean_text"))
    }
    // heavy-dup planted corpus: every doc is one of 3 templates, so
    // almost every token is covered (the worst case for the old form)
    val heavy = (0L until 60L).map { i =>
      val t = i % 3
      (i, (0 until 40).map(j => s"w${t}_${j % 7}").mkString(" "))
    }
    for (df <- Seq(heavy.toDF("doc_id", "text"),
        Tables.documents(spark, sf))) {
      val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", 8)
        .select("doc_id", "n_tok", "kept_tokens", "clean_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      val want = reference(df, 8)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(got.length == want.length && got.nonEmpty)
      got.zip(want).foreach { case (g, w) => assert(g == w) }
    }
  }

  /** Brute-force covered-position sets (driver-side, independent of
    * the operator's gram relation) for the parity reference. */
  private def covSets(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val spark2 = df.sparkSession
    import spark2.implicits._
    val ws = df.select(col("doc_id"),
      graft.ext.TextAnalysis.words(col("text")).as("__w"))
      .as[(Long, Seq[String])].collect()
    val grams = ws.flatMap { case (id, w) =>
      if (w == null || w.length < n) Nil
      else (0 to w.length - n).map(i => (w.slice(i, i + n).mkString(" "),
        id, i + 1))
    }
    val dup = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      .keySet
    val cov = grams.filter(g => dup(g._1))
      .flatMap { case (_, id, p) => (p until p + n).map(id -> _.toLong) }
      .groupBy(_._1).map { case (id, xs) =>
        (id, xs.map(_._2).distinct.sorted.toArray)
      }
    cov.toSeq.toDF("doc_id", "__cov")
  }

  test("removeContaminatedSpans: benchmark grams excise from corpus " +
      "docs only; corpus-internal dups stay; fully quoted doc empties") {
    import spark.implicits._
    val bench = Seq(100L -> "eval item a b c d").toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "x a b c d y",        // carries bench 4-gram "a b c d"
      2L -> "p q r s p q r s",    // internal repeat, NOT in bench
      3L -> "a b c d",            // exactly the bench gram: empties
      4L -> "m n o u v w")        // clean
    val got = Dedup.removeContaminatedSpans(
        corpus.toDF("doc_id", "text"), bench, "doc_id", "text", n = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "corpus docs only")
    assert(got(1L) == ((6L, 2L, 2.0 / 6.0, "x y")))
    assert(got(2L) == ((8L, 8L, 1.0, "p q r s p q r s")),
      "corpus-internal duplication is not contamination")
    assert(got(3L) == ((4L, 0L, 0.0, "")))
    assert(got(4L) == ((6L, 6L, 1.0, "m n o u v w")))
    // overlapping bench grams union (bench has "a b c d" and "b c d e"
    // via a 5-token item): covered = tokens 1..5
    val bench2 = Seq(100L -> "a b c d e").toDF("doc_id", "text")
    val got2 = Dedup.removeContaminatedSpans(
        Seq(1L -> "a b c d e x y z").toDF("doc_id", "text"), bench2,
        "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
    assert(got2.toSeq == Seq((8L, 3L, "x y z")))
  }

  test("sourceOverlapMatrix: planted shared grid chunks count once " +
      "per pair, ordered, self-pairs absent") {
    import spark.implicits._
    // chunk size 2: "nav bar" in A(twice), B, C; "x y" in A and B;
    // "z w" in C only
    val docs = Seq(
      (1L, "nav bar q1 q2", "A"), (2L, "nav bar x y", "A"),
      (3L, "nav bar x y", "B"), (4L, "z w nav bar", "C"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlapMatrix(docs, "doc_id", "text",
        "source", size = 2)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    // A-B share {nav bar, x y} = 2; A-C and B-C share {nav bar} = 1
    assert(got.toSeq == Seq(("A", "B", 2L), ("A", "C", 1L),
      ("B", "C", 1L)))
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
