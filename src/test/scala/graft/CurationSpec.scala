package graft

import graft.ext.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation operators: decontamination, deterministic sampling, bounded
  * top-k. Each is pinned against an independent form — closed-form
  * expectations, a from-scratch digest computation, or the window-
  * function equivalent the bounded aggregator replaces.
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("repetition metrics: closed-form cases incl. the 1-word doc") {
    val docs = Seq(
      (1L, "a a a a"),          // one word: top_word 1.0; bigrams all "a a"
      (2L, "w x y z"),          // all distinct: top_word .25, no dup bigrams
      (3L, "solo"),             // no bigrams -> null bigram fractions
                                // (pass would be FALSE, not null:
                                // top_word 1.0 < 0.2 is false, and
                                // FALSE AND NULL = FALSE in both engines)
      (4L, "p q p q p")         // bigrams: p q (x2), q p (x2) -> all dup
    ).toDF("doc_id", "text")
    val m = graft.ext.TextAnalysis.repetitionExprs(col("text"))
    val got = docs.select(col("doc_id"), m("top_word_frac"),
        m("top_bigram_frac"), m("dup_bigram_frac")).orderBy("doc_id")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some(1.0), Some(1.0), Some(1.0)),
      (2L, Some(0.25), Some(1.0 / 3), Some(0.0)),
      (3L, Some(1.0), None, None),
      (4L, Some(3.0 / 5), Some(0.5), Some(1.0))))
  }

  test("repetition kernel is bit-identical to the column form") {
    // the typed kernel is the hot path; the column form remains the
    // documented oracle anchor — they must agree on every double,
    // including the real corpus and the degenerate shapes
    val crafted = Seq((9001L, "a a a a"), (9002L, "w x y z"),
      (9003L, "solo"), (9004L, "p q p q p")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(crafted)
    val m = graft.ext.TextAnalysis.repetitionExprs(col("text"))
    val viaCols = docs.select(col("doc_id"),
        m("top_word_frac").as("top_word_frac"),
        m("top_bigram_frac").as("top_bigram_frac"),
        m("dup_bigram_frac").as("dup_bigram_frac"))
      .orderBy("doc_id")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    val viaKernel = graft.ext.TextAnalysis
      .repetitionFrame(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    def bits(r: (Long, Option[Double], Option[Double], Option[Double])) =
      (r._1, r._2.map(java.lang.Double.doubleToLongBits),
        r._3.map(java.lang.Double.doubleToLongBits),
        r._4.map(java.lang.Double.doubleToLongBits))
    assert(viaKernel.map(bits) == viaCols.map(bits))
  }

  test("decontaminate flags planted shingle overlaps and nothing else") {
    val df = Seq(
      // bench slice (doc_id % 20 == 0)
      (0L, "alpha beta gamma delta"),
      (20L, "zz yy xx ww vv"),
      // shares 2 of its 4 shingles with bench doc 0 -> flagged
      (1L, "pre alpha beta gamma delta post"),
      // shares exactly 1 shingle -> below minHits, excluded
      (2L, "alpha beta gamma unrelated tail here"),
      // disjoint -> excluded
      (3L, "totally different words entirely")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(
        df.where($"doc_id" % 20 =!= 0), df.where($"doc_id" % 20 === 0),
        "doc_id", "text", k = 3, minHits = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    assert(r.getLong(1) == 4, "doc 1 has 4 distinct 3-shingles")
    assert(r.getLong(2) == 2, "2 of them appear in the bench set")
    assert(r.getDouble(3) == 0.5)
  }

  test("shingleRows kernel is bit-identical to the column-form explode") {
    val edge = Seq(
      (1L, "a b c d e"), (2L, "a"), (3L, ""), (4L, null),
      (5L, "x y x y x y"), // repeats collapse via the distinct set
      (6L, "a  b c")       // double space -> empty token inside shingles
    ).toDF("doc_id", "text")
    Seq(edge, Tables.documents(spark, sf)).foreach { df =>
      val got = ext.Dedup.shingleRows(df, "doc_id", "text", 3)
        .as[(Long, Long, String)].collect().toSet
      val want = df.select($"doc_id",
          ext.Dedup.shingles($"text", 3).as("sh"))
        .select($"doc_id", size($"sh").cast("long").as("n_sh"),
          explode($"sh").as("s"))
        .as[(Long, Long, String)].collect().toSet
      assert(got == want && want.nonEmpty)
      // the array kernel must match element-for-element IN ORDER
      // (array_distinct's first-occurrence order), nulls included
      val gotA = ext.Dedup.shingleArrays(df, "doc_id", "text", 3)
        .as[(Long, Option[Seq[String]])].collect().toMap
      val wantA = df.select($"doc_id", ext.Dedup.shingles($"text", 3))
        .as[(Long, Option[Seq[String]])].collect().toMap
      assert(gotA == wantA)
    }
  }

  /** The operator's uniform, recomputed from scratch (MessageDigest → top
    * 15 hex nibbles → /2^60), must match the Catalyst expression. */
  private def uniformOf(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16).toDouble /
      (1L << 60).toDouble
  }

  test("hashUniform matches an independent digest computation") {
    val got = spark.range(0, 200)
      .select($"id", Curation.hashUniform($"id").as("u"))
      .as[(Long, Double)].collect().toMap
    (0L until 200L).foreach { id =>
      assert(got(id) == uniformOf(id), s"id $id")
      assert(got(id) >= 0.0 && got(id) < 1.0)
    }
  }

  test("stratifiedSample keeps exactly the rows clearing their stratum rate") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val rates = Seq("en" -> 0.1, "fr" -> 0.3, "es" -> 0.6)
    val kept = Curation.stratifiedSample(
        Tables.documents(spark, sf), "doc_id", "lang", rates, 0.9)
      .select("doc_id").as[Long].collect().toSet
    val expected = docs.as[(Long, String)].collect().collect {
      case (id, lang)
          if uniformOf(id) < rates.toMap.getOrElse(lang, 0.9) => id
    }.toSet
    assert(expected.nonEmpty && expected.size < 500)
    assert(kept == expected)
  }

  test("temperatureResample: rates and kept set equal the closed form") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val byLang = docs.as[(Long, String)].collect().groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    val sorted = byLang.toIndexedSeq.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val norm = sorted.foldLeft(0.0) { case (a, (_, n)) =>
      a + math.sqrt(n.toDouble)
    }
    val target = total.toDouble * 0.5
    val rates = sorted.map { case (d, n) =>
      d -> math.min(1.0,
        (target * (math.sqrt(n.toDouble) / norm)) / n.toDouble)
    }.toMap
    val got = Curation.temperatureResample(
        Tables.documents(spark, sf), "doc_id", "lang", 0.5, 0.5)
      .select("doc_id", "lang", "u", "rate")
      .as[(Long, String, Double, Double)].collect()
    // every emitted row carries its domain's closed-form rate and the
    // operator's uniform, and clears the filter
    got.foreach { case (id, lang, u, r) =>
      assert(r == rates(lang), s"rate for $lang")
      assert(u == uniformOf(id) && u < r, s"doc $id")
    }
    val expected = docs.as[(Long, String)].collect().collect {
      case (id, lang) if uniformOf(id) < rates(lang) => id
    }.toSet
    assert(expected.nonEmpty && got.length == expected.size)
    assert(got.map(_._1).toSet == expected)
    // alpha=0.5 on this corpus upweights at least one tail language to
    // a strictly higher rate than the head language's
    val head = byLang.maxBy(_._2)._1
    assert(rates.values.exists(_ > rates(head)))
  }

  test("tokenBudgetCap keeps exactly the hash-order prefix under budget") {
    import org.apache.spark.sql.functions.{col, length}
    val budget = 2000L
    val got = Curation.tokenBudgetCap(Tables.documents(spark, sf),
        "doc_id", "lang", length(col("text")).cast("long"), budget)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    // independent recompute: per-lang (u, id)-sorted prefix sums
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n"))
      .as[(Long, String, Long)].collect()
    val want = docs.groupBy(_._2).flatMap { case (_, rows) =>
      val sorted = rows.sortBy { case (id, _, _) => (uniformOf(id), id) }
      var cum = 0L
      sorted.toSeq.flatMap { case (id, lang, n) =>
        cum += n
        if (cum <= budget) Some((id, lang, n, cum)) else None
      }
    }.toSet
    assert(want.nonEmpty && want.size < docs.length)
    assert(got.toSet == want)
    // kept set is a prefix: every kept cum is under budget and adding
    // any unkept doc of the same lang at its position would overflow
    got.foreach { case (_, _, _, cum) => assert(cum <= budget) }
  }

  test("chunkTokens: window grid, overlap, and full coverage") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = ext.TextAnalysis.chunkTokens(df, "doc_id", "text",
        size = 8, stride = 6)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_text"))
      .as[(Long, Long, Long, String)].collect()
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 1,7,13,19 -> sizes 8,8,8,2
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._3).toSeq == Seq(8L, 8L, 8L, 2L))
    assert(d1(0)._4 == (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1(1)._4 == (7 to 14).map(i => s"t$i").mkString(" "))
    assert(d1(3)._4 == "t19 t20")
    // consecutive windows overlap by size - stride tokens
    assert(d1(0)._4.split(" ").takeRight(2).toSeq ==
      d1(1)._4.split(" ").take(2).toSeq)
    // every token appears in some chunk (coverage law)
    val covered = d1.flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 20).map(i => s"t$i").toSet)
    // short doc: one sub-size chunk; empty text normalizes to one ""
    // token (split semantics) — one chunk of the empty token
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, 2L, "a b")))
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, 1L, "")))
  }

  test("trigramLmScore: closed-form probabilities on a planted corpus") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "xx", "ab ab ab"), (2L, "xx", "xy"),
      (3L, "xx", "abq")).toDF("doc_id", "lang", "text")
    // cap off (minCount 1, huge M): the uncapped closed form
    val got = ext.TextAnalysis.trigramLmScore(df, "doc_id", "lang",
        "text", minCount = 1L)
      .select(col("doc_id"), col("n_trigrams"), col("score"))
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, s) => (id, (n, s)) }.toMap
    // model over the 3 docs: "ab "x2, "b a"x2, " ab"x2, "abq"x1;
    // prefixes "ab"->3, "b "->2, " a"->2 — p as one exact divide each
    val pAb = 2.0 / 3.0
    val expA = Seq(pAb, 2.0 / 2.0, 2.0 / 2.0, pAb, 2.0 / 2.0, 2.0 / 2.0)
      .foldLeft(0.0)(_ + _) / 6
    val expC = Seq(1.0 / 3.0).foldLeft(0.0)(_ + _) / 1
    assert(got(1L) == ((6L, Some(expA))))
    assert(got(2L) == ((0L, None)), "sub-trigram docs score null")
    assert(got(3L) == ((1L, Some(expC))))
    // default min-count 2: the singleton "abq" leaves the model — doc 3
    // has no modeled trigrams (null score), and "ab" prefixes
    // renormalize to the kept counts (p("ab ") = 2/2)
    val capped = ext.TextAnalysis.trigramLmScore(df, "doc_id", "lang",
        "text")
      .select(col("doc_id"), col("n_trigrams"), col("score"))
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, s) => (id, (n, s)) }.toMap
    assert(capped(1L) == ((6L, Some(1.0))))
    assert(capped(3L) == ((0L, None)), "all-OOV docs score null")
  }

  test("trigramLmScore: the model stays bounded on a large-alphabet corpus") {
    import org.apache.spark.sql.functions.col
    // synthetic wide alphabet (the CJK case): 40 docs over 200 distinct
    // BMP code points from U+4E00, every trigram repeated twice so
    // minCount keeps them all — distinct trigrams ≫ the cap M=50
    val docs = (0 until 40).map { i =>
      val body = (0 until 60).map { j =>
        new String(Character.toChars(0x4E00 + (i * 61 + j * 7) % 200))
      }.mkString
      (i.toLong, if (i % 2 == 0) "zh" else "ja", body + body)
    }.toDF("doc_id", "lang", "text")
    val normed = docs.select(col("lang"),
      lower(trim(col("text"))).as("norm"))
    val full = ext.TextAnalysis.trigramModel(normed, 2L, Int.MaxValue)
    val capped = ext.TextAnalysis.trigramModel(normed, 2L, 50)
    val fullPerLang = full.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val capPerLang = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fullPerLang.values.forall(_ > 50),
      s"corpus not wide enough to bind the cap: $fullPerLang")
    assert(capPerLang.values.forall(_ <= 50), capPerLang.toString)
    // the cap keeps exactly the (n3 DESC, tri ASC) top-50 of the full
    // model — the deterministic boundary both engines replay
    val fullRows = full.as[(String, String, Long)].collect()
    val expect = fullRows.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      rows.sortBy { case (_, tri, n) => (-n, tri) }.take(50).iterator
    }.toSet
    assert(capped.as[(String, String, Long)].collect().toSet == expect)
    // and scoring still works end-to-end under the cap (bounded model,
    // in-model means in (0, 1])
    val scored = ext.TextAnalysis.trigramLmScore(docs, "doc_id", "lang",
        "text", minCount = 2L, maxTrigramsPerLang = 50)
      .as[(Long, String, Long, Option[Double])].collect()
    assert(scored.length == 40)
    scored.foreach { case (id, _, n, s) =>
      if (n > 0) {
        val v = s.getOrElse(fail(s"doc $id: null score with $n modeled"))
        assert(v > 0.0 && v <= 1.0, s"doc $id: score $v")
      } else assert(s.isEmpty)
    }
  }

  test("trigramLmScore on real documents: all scores in (0, 1]") {
    import org.apache.spark.sql.functions.col
    val rows = ext.TextAnalysis.trigramLmScore(
        Tables.documents(spark, sf), "doc_id", "lang", "text")
      .select(col("n_trigrams"), col("score"))
      .as[(Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, s) =>
      if (n == 0L) assert(s.isEmpty)
      else {
        val v = s.getOrElse(fail("score null with trigrams present"))
        assert(v > 0.0 && v <= 1.0, s"score $v out of range")
      }
    }
  }

  test("exactQuantilesPerGroup equals the window CEIL(q*n) rank form, ties included") {
    import org.apache.spark.sql.functions._
    // skewed groups with heavy value ties (the q91 shape)
    val rows = (0 until 3000).map { i =>
      val g = if (i % 4 < 3) "en" else s"g${i % 5}"
      (i.toLong, g, (i * 2654435761L % 97).toLong)
    }
    val df = rows.toDF("doc_id", "lang", "n_chars")
    val qs = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
    val got = Curation.exactQuantilesPerGroup(df, "lang", col("n_chars"), qs)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = df.select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val aggs = qs.map { case (nme, q) =>
      max(when(col("rn") === ceil(lit(q) * col("n")), col("n_chars"))).as(nme)
    }
    val ref = ranked.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
    assert(got.collect().map(_.toSeq).toSet ==
      ref.collect().map(_.toSeq).toSet)
  }

  test("exactQuantilesPerGroup: loud pre-flight guards (q range, non-integral values)") {
    import org.apache.spark.sql.functions._
    val df = (0 until 10).map(i => (i.toLong, "en", i.toLong))
      .toDF("doc_id", "lang", "n_chars")
    for (q <- Seq(0.0, 1.01, -0.5)) {
      val e = intercept[IllegalArgumentException] {
        Curation.exactQuantilesPerGroup(df, "lang", col("n_chars"),
          Seq(("p", q)))
      }
      assert(e.getMessage.contains("outside"))
    }
    // q = 1.0 is valid and returns the group maximum
    val m = Curation.exactQuantilesPerGroup(df, "lang", col("n_chars"),
      Seq(("pmax", 1.0))).collect()(0).getLong(1)
    assert(m == 9L)
    val e2 = intercept[IllegalArgumentException] {
      Curation.exactQuantilesPerGroup(df, "lang",
        col("n_chars").cast("double"), Seq(("p50", 0.5)))
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("exactQuantilesPerGroup preserves a non-string group type and " +
      "fails loudly on a null value") {
    import org.apache.spark.sql.functions._
    val df = (0 until 40).map(i => (i.toLong, (i % 3).toLong, i.toLong))
      .toDF("doc_id", "grp", "n_chars")
    val got = Curation.exactQuantilesPerGroup(df, "grp", col("n_chars"),
      Seq(("p50", 0.5)))
    // group column keeps its original LongType (the review finding: a
    // string-keyed typed path silently rewrote the schema)
    assert(got.schema("grp").dataType ==
      org.apache.spark.sql.types.LongType)
    val byG = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group g holds {g, g+3, ..., g+39-...}: 14/13/13 values; p50 is
    // the ceil(n/2)-th smallest
    assert(byG(0L) == 18L && byG(1L) == 19L && byG(2L) == 20L)
    val withNull = df.withColumn("n_chars",
      when(col("doc_id") === 7, lit(null)).otherwise(col("n_chars")))
    val e = intercept[Exception] { // raise_error: SparkRuntimeException
      Curation.exactQuantilesPerGroup(withNull, "grp", col("n_chars"),
        Seq(("p50", 0.5))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null value")))
  }

  test("sharded cumsums fail loudly on negative token counts") {
    import org.apache.spark.sql.functions._
    val df = (0 until 50).map(i => (i.toLong, "en",
      if (i == 31) -5L else (i % 7).toLong))
      .toDF("doc_id", "lang", "n_tokens")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val e1 = intercept[Exception] { // raise_error: SparkRuntimeException
      Curation.tokenBudgetCap(df, "doc_id", "lang", col("n_tokens"),
        budget = 100L, shards = 4).collect()
    }
    assert(msgs(e1).exists(_.contains("negative token count")))
    val e2 = intercept[Exception] { // raise_error: SparkRuntimeException
      Curation.packSequences(df, "doc_id", "lang", col("n_tokens"),
        budget = 100L).collect()
    }
    assert(msgs(e2).exists(_.contains("negative token count")))
    // the shards=1 window form has no prune and stays permissive (the
    // documented escape hatch for signed counts)
    assert(Curation.tokenBudgetCap(df, "doc_id", "lang", col("n_tokens"),
      budget = 100L, shards = 1).collect().nonEmpty)
  }

  test("bpePairCounts: vocabulary-weighted code-point pairs, " +
      "deterministic top-k") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "ab ab abc"), (2L, "ab xx"))
      .toDF("doc_id", "text")
    // vocab ab->3, abc->1, xx->1; pairs: "ab" 3+1, "bc" 1, "xx" 1
    val got = ext.TextAnalysis.bpePairCounts(docs, "text", 50)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 4L), ("bc", 1L), ("xx", 1L)))
    assert(ext.TextAnalysis.bpePairCounts(docs, "text", 1)
      .as[(String, Long)].collect().toSeq == Seq(("ab", 4L)))
    // pairs are CODE-POINT windows: a supplementary-plane char (one
    // code point, two UTF-16 units) pairs with its neighbor whole —
    // a code-unit window would emit a lone surrogate
    val uni = Seq((1L, "😀a b")).toDF("doc_id", "text")
    assert(ext.TextAnalysis.bpePairCounts(uni, "text", 10)
      .as[(String, Long)].collect().toSeq ==
      Seq((new String(Array(0x1F600, 'a'.toInt), 0, 2), 1L)))
  }

  test("bpeMerges: chained greedy merges — run parity for left=right, " +
      "re-mined counts, supplementary-plane symbols, loud exhaustion") {
    import org.apache.spark.sql.functions.col
    // vocab: "aaab" x3, "ab" x2 -> round 1 pairs: aa 2x3=6 (two per
    // "aaab": positions 1,2 -> ONE greedy merge each... counts though
    // are raw adjacent-pair counts: "aaab" has aa at 1,2 -> 2x3=6),
    // ab 3+2=5, xx... pick "aa" (6). Greedy rewrite of "aaab" with
    // (a,a): matches {1,2}, run parity keeps {1} -> [aa, a, b].
    // round 2 pairs over {[aa,a,b] x3, [a,b] x2}: (aa,a) 3, (a,b) 5,
    // (aa,b) 0... wait [aa,a,b] has (aa,a) and (a,b): so (a,b) 3+2=5
    // wins -> merge (a,b) -> {[aa,ab] x3, [ab] x2}.
    // round 3: (aa,ab) 3 is the only pair.
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val got = ext.TextAnalysis.bpeMerges(docs, "text", 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 6L), (2L, "a", "b", 5L),
      (3L, "aa", "ab", 3L)), got.toString)
    // odd self-run: "aaa" matches {1,2}, parity merges only position 1
    // (one merge per run of 2), so round 1 count is 2 but only ONE
    // merged symbol lands — visible in round 2's remaining pairs
    val odd = Seq((1L, "aaa aaa ac")).toDF("doc_id", "text")
    val got2 = ext.TextAnalysis.bpeMerges(odd, "text", 2)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: (a,a) 2x2=4... "aaa" pairs (1,2): 2 per word, x2 words
    // = 4; (a,c) 1 -> merge (a,a); rewrite "aaa" -> [aa, a]
    // round 2: (aa,a) 2, (a,c) 1 -> merge (aa,a) count 2
    assert(got2 == Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)),
      got2.toString)
    // supplementary-plane: symbols are CODE POINTS end to end
    val uni = Seq((1L, "😀a 😀a")).toDF("doc_id", "text")
    val got3 = ext.TextAnalysis.bpeMerges(uni, "text", 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got3 == Seq((1L, new String(Array(0x1F600), 0, 1), "a", 2L)))
    // merges beyond the vocabulary fail loudly, never truncate
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      ext.TextAnalysis.bpeMerges(tiny, "text", 3)
    }
    assert(e.getMessage.contains("exhausted"), e.getMessage)
  }

  test("shardManifest: assignment and positions equal the independent " +
      "digest computation; shards partition the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select("doc_id")
    val got = Curation.shardManifest(docs, "doc_id", 16)
      .as[(Long, Double, Long, Long)].collect()
    val ids = docs.as[Long].collect()
    assert(got.length == ids.length, "every row gets exactly one shard")
    // independent replay: shard = floor(u*16) clamped, pos = 1-based
    // rank by (u, id) within shard
    val expect = ids.map { id =>
      val u = uniformOf(id)
      (id, u, math.min(math.floor(u * 16).toLong, 15L))
    }.groupBy(_._3).toSeq.flatMap { case (shard, rows) =>
      rows.sortBy { case (id, u, _) => (u, id) }.zipWithIndex.map {
        case ((id, u, _), i) => (id, u, shard, (i + 1).toLong)
      }.toSeq
    }.toSet
    assert(got.toSet == expect)
    // deterministic across re-evaluation (no RNG/partition state)
    assert(Curation.shardManifest(docs.repartition(7), "doc_id", 16)
      .as[(Long, Double, Long, Long)].collect().toSet == got.toSet)
    assert(intercept[IllegalArgumentException] {
      Curation.shardManifest(docs, "doc_id", 0)
    }.getMessage.contains("numShards"))
  }

  test("exactQuantilesPerGroup refuses a group past maxSlots loudly") {
    import org.apache.spark.sql.functions._
    val df = (0 until 100).map(i => (i.toLong, "en", i.toLong))
      .toDF("doc_id", "lang", "n_chars")
    val e = intercept[org.apache.spark.SparkException] {
      Curation.exactQuantilesPerGroup(df, "lang", col("n_chars"),
        Seq(("p50", 0.5)), maxSlots = 10).collect()
    }
    assert(e.getMessage.contains("percentile_approx") ||
      Option(e.getCause).exists(_.getMessage.contains("percentile_approx")))
  }

  test("topKPerGroup equals the window row_number form, ties included") {
    // deliberate score collisions: 13 distinct scores over 500 rows
    val rows = (0 until 500).map { i =>
      (s"g${i % 7}", i.toLong, (i * 37 % 13) / 13.0)
    }
    val df = rows.toDF("lang", "doc_id", "score")
    val got = Curation.topKPerGroup(df, "lang", "doc_id", $"score", k = 5)
      .as[(String, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy("lang").orderBy(desc("score"), asc("doc_id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 5)
      .select($"lang", $"rank", $"doc_id", $"score")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("topKPerGroup on real documents matches the window form") {
    val d = Tables.documents(spark, sf)
    val q = ext.TextAnalysis.qualityExprs(col("text"))
    val scored = d.select($"lang", $"doc_id", q("distinct_ratio").as("score"))
    val got = Curation.topKPerGroup(scored, "lang", "doc_id", $"score", 5)
      .as[(String, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy("lang").orderBy(desc("score"), asc("doc_id"))
    val want = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 5).select($"lang", $"rank", $"doc_id", $"score")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("PII scrubbing: counts and redaction on planted and clean text") {
    val df = Seq(
      (1L, "mail a.b+c@x-y.org and 10.0.0.1 then d@e.io end"),
      (2L, "no pii here at all"),
      (3L, "999.999.999.999 1.2.3.4.5 not@tld a@b.c")
    ).toDF("doc_id", "text")
    val c = Curation.piiCounts($"text")
    val out = df.select($"doc_id", c("n_emails").as("e"), c("n_ips").as("i"),
        Curation.piiRedact($"text").as("r"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._2 == 2 && out(0)._3 == 1)
    assert(out(0)._4 == "mail <EMAIL> and <IP> then <EMAIL> end")
    // clean text: zero counts, redaction is the identity
    assert(out(1)._2 == 0 && out(1)._3 == 0 &&
      out(1)._4 == "no pii here at all")
    // conservative-by-design edges: 999.999.999.999 still matches the
    // \d{1,3} shape (flagging over-broad beats missing); a 5-octet run
    // matches on its first 4; 'not@tld' has no dot-TLD so no email;
    // 'a@b.c' has a 1-char TLD so no email
    assert(out(2)._2 == 0 && out(2)._3 == 2)
  }

  test("PII kernel is identical to the piiCounts/piiRedact column form") {
    // piiScrubFrame is the hot path; the column form stays the oracle
    // anchor — they must agree on every row, including nulls, the IP
    // inside an email's local part (counted, but consumed by the email
    // redaction), and the real corpus with planted PII
    val crafted = Seq(
      (9001L, Some("mail a.b+c@x-y.org and 10.0.0.1 then d@e.io end")),
      (9002L, Some("no pii here at all")),
      (9003L, Some("999.999.999.999 1.2.3.4.5 not@tld a@b.c")),
      (9004L, Some("ip-in-email 1.2.3.4@example.com and bare 5.6.7.8")),
      (9005L, None)
    ).toDF("doc_id", "text")
    val planted = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com from 10.0."),
      (col("doc_id") % 256).cast("string"), lit("."),
      (col("doc_id") % 100).cast("string"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(crafted)
    val c = Curation.piiCounts(planted)
    val viaCols = docs.select(col("doc_id"),
        c("n_emails").as("n_emails"), c("n_ips").as("n_ips"),
        Curation.piiRedact(planted).as("redacted"))
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().toSeq
    val viaKernel = Curation.piiScrubFrame(docs, "doc_id", planted)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().toSeq
    assert(viaKernel.size == viaCols.size && viaKernel.nonEmpty)
    viaKernel.zip(viaCols).foreach { case (k, cform) =>
      assert(k == cform, s"\n kernel=$k\n column=$cform")
    }
    // the null-text row must yield null counts and a null redaction
    val nullRow = viaKernel.find(_._1 == 9005L).get
    assert(nullRow == ((9005L, None, None, None)))
  }

  test("topKPerGroup handles NaN/±0/null scores like the window form") {
    // NaN sorts greatest (SQL ordering), -0.0 ties 0.0, nulls drop
    val rows = Seq(
      ("g", 1L, Some(Double.NaN)), ("g", 2L, Some(1.0)),
      ("g", 3L, Some(-0.0)), ("g", 4L, Some(0.0)),
      ("g", 5L, Some(Double.NaN)), ("g", 6L, None),
      ("g", 7L, Some(0.5)), ("g", 8L, Some(-1.0)))
    val df = rows.toDF("lang", "doc_id", "score")
    val got = Curation.topKPerGroup(df, "lang", "doc_id", $"score", k = 5)
      .as[(String, Long, Long, Double)].collect().toSet
    val w = Window.partitionBy("lang").orderBy(desc("score"), asc("doc_id"))
    val want = df.where($"score".isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= 5).select($"lang", $"rank", $"doc_id", $"score")
      .as[(String, Long, Long, Double)].collect().toSet
    // NaN != NaN under ==; compare via bit-exact rendering
    def key(t: (String, Long, Long, Double)) =
      (t._1, t._2, t._3, java.lang.Double.doubleToLongBits(
        if (t._4 == 0.0) 0.0 else t._4))
    assert(got.map(key) == want.map(key), s"\n got=$got\n want=$want")
    assert(got.map(_._3).intersect(Set(1L, 5L)).size == 2,
      "NaN rows must rank at the top, not vanish")
  }

  test("topKPerGroup refuses k <= 0 at call time") {
    val df = Seq(("g", 1L, 1.0)).toDF("lang", "doc_id", "score")
    intercept[IllegalArgumentException] {
      Curation.topKPerGroup(df, "lang", "doc_id", $"score", 0)
    }
  }

  test("topKPerGroup aggregates partially before the shuffle") {
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i / 100.0))
      .toDF("lang", "doc_id", "score")
    val plan = Curation.topKPerGroup(df, "lang", "doc_id", $"score", 5)
      .queryExecution.executedPlan.toString
    // typed Aggregator lowers to a two-phase ObjectHashAggregate: a
    // partial stage before the exchange keeps ≤ k rows per group per
    // task, so the shuffle is bounded regardless of corpus size
    assert(plan.toLowerCase.contains("partial_topkaggregator"),
      s"expected partial aggregation before the shuffle:\n$plan")
  }

  test("mixingManifest: floor copies + md5-gated fractional copy, " +
      "driver-replayed; loud guards on missing source and fan-out") {
    def u(s: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / (1L << 60).toDouble
    }
    val docs = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "source")
    val got = Curation.mixingManifest(docs, "doc_id", "source",
        Seq(("a", 2.5), ("b", 0.25)))
      .as[(Long, String, Long, Double)].collect()
      .sortBy(r => (r._1, r._3))
    val want = (0L until 40L).flatMap { i =>
      val (src, w) = if (i % 2 == 0) ("a", 2.5) else ("b", 0.25)
      val copies = math.floor(w).toLong +
        (if (u(i.toString) < w - math.floor(w)) 1L else 0L)
      (1L to copies).map(c => (i, src, c, u(s"$i:$c")))
    }.sortBy(r => (r._1, r._3))
    assert(got.toSeq == want)
    // expected-multiplicity sanity: source a emits 2-3 copies per doc,
    // source b 0-1, and the fractional gates fire for SOME docs
    val byCopy = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCopy("a") >= 40 && byCopy("a") <= 60)
    assert(byCopy.getOrElse("b", 0) <= 20)
    // missing source raises loudly
    val err = intercept[Exception] {
      Curation.mixingManifest(docs, "doc_id", "source",
        Seq(("a", 2.0))).collect()
    }
    assert(err.getMessage.contains("no declared weight") ||
      Option(err.getCause).exists(_.getMessage.contains(
        "no declared weight")))
    // fan-out guard is build-time
    intercept[IllegalArgumentException] {
      Curation.mixingManifest(docs, "doc_id", "source",
        Seq(("a", 99.0)))
    }
  }

  test("mixingManifest: thousands of sources plan and run (the map " +
      "lookup never grows a CASE/codegen tree), guard still loud") {
    val nSrc = 2000
    val docs = (0L until 4000L).map(i => (i, s"s${i % nSrc}"))
      .toDF("doc_id", "source")
    // weights: s0..s999 at 2.0, s1000.. at 1.0 -> exact copy counts
    val weights = (0 until nSrc).map(j =>
      (s"s$j", if (j < 1000) 2.0 else 1.0))
    val got = Curation.mixingManifest(docs, "doc_id", "source", weights)
    val perSource = got.groupBy("source")
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(perSource.size == nSrc)
    assert((0 until nSrc).forall(j =>
      perSource(s"s$j") == (if (j < 1000) 4L else 2L)),
      "integral weights give exact per-source multiplicity")
    // the weight literal is ONE constant in the plan, not a CASE tree
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CASE WHEN (source = s1999)"),
      "no per-source CASE chain in the plan")
    // a source outside the 2000 declared still raises loudly
    val docsBad = Seq((1L, "undeclared")).toDF("doc_id", "source")
    val err = intercept[Exception] {
      Curation.mixingManifest(docsBad, "doc_id", "source", weights)
        .collect()
    }
    assert(err.getMessage.contains("no declared weight") ||
      Option(err.getCause).exists(_.getMessage.contains(
        "no declared weight")))
    // duplicate-source manifests are a build-time error
    intercept[IllegalArgumentException] {
      Curation.mixingManifest(docs, "doc_id", "source",
        Seq(("a", 1.0), ("a", 2.0)))
    }
  }
}
