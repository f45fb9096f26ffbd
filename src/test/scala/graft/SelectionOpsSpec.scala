package graft

import graft.ext.{Curation, Similarity, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 selection/split operators: double-valued exact quantiles,
  * LM quality buckets, cluster-balanced diversity sampling,
  * hard-negative mining, and the leakage-free component-atomic split.
  * Each op is pinned against the independent (window / brute-force /
  * closed-form) form it replaces, plus its loud-contract edges.
  */
class SelectionOpsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------ double exact quantiles

  test("double quantiles equal the window-rank form incl. ties") {
    val rows = Seq(
      ("a", 3.5), ("a", -1.25), ("a", 3.5), ("a", 0.0), ("a", 7.0),
      ("b", 2.0), ("b", 2.0), ("b", 2.0),
      ("c", -5.5)).toDF("g", "v")
    val got = Curation.exactQuantilesPerGroupsDouble(rows, Seq("g"),
        col("v"), Seq(("p50", 0.5), ("p90", 0.9), ("max", 1.0)))
      .orderBy("g").as[(String, Double, Double, Double)].collect().toSeq
    // window reference: value at rank ceil(q*n), 1-based ascending
    def ref(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      s((math.ceil(q * s.length) - 1).toInt max 0)
    }
    val byG = Seq("a" -> Seq(3.5, -1.25, 3.5, 0.0, 7.0),
      "b" -> Seq(2.0, 2.0, 2.0), "c" -> Seq(-5.5))
    assert(got == byG.map { case (g, vs) =>
      (g, ref(vs, 0.5), ref(vs, 0.9), ref(vs, 1.0)) })
  }

  test("double quantiles refuse NaN and null loudly; −0.0 → 0.0") {
    val nan = Seq(("a", 1.0), ("a", Double.NaN)).toDF("g", "v")
    val e1 = intercept[org.apache.spark.SparkException] {
      Curation.exactQuantilesPerGroupsDouble(nan, Seq("g"), col("v"),
        Seq(("p50", 0.5))).collect()
    }
    assert(e1.getMessage.contains("NaN") ||
      e1.getCause.getMessage.contains("NaN"))
    val nul = Seq(("a", Some(1.0)), ("a", None)).toDF("g", "v")
    val e2 = intercept[Exception] {
      Curation.exactQuantilesPerGroupsDouble(nul, Seq("g"), col("v"),
        Seq(("p50", 0.5))).collect()
    }
    assert(e2.getMessage.contains("null value") ||
      e2.getCause.getMessage.contains("null value"))
    // −0.0 normalizes on entry: the selected value carries +0.0 bits
    val nz = Seq(("a", -0.0), ("a", -0.0)).toDF("g", "v")
    val v = Curation.exactQuantilesPerGroupsDouble(nz, Seq("g"),
        col("v"), Seq(("p50", 0.5)))
      .select(col("p50")).as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(v) == 0L)
  }

  // ------------------------------------------------ LM quality buckets

  test("quality buckets match independently computed tercile thresholds") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.lmQualityBuckets(docs, "doc_id", "lang",
        "text")
      .as[(Long, String, Long, Option[Double], String)].collect()
    assert(got.nonEmpty)
    // independent thresholds: sort each lang's scores, pick the exact
    // CEIL(n/3)/CEIL(2n/3) rank values, re-derive every bucket
    val scored = got.filter(_._4.isDefined)
    val th = scored.groupBy(_._2).map { case (lg, xs) =>
      val s = xs.map(_._4.get).sorted
      def at(q: Double) = s((math.ceil(q * s.length) - 1).toInt max 0)
      (lg, (at(1.0 / 3), at(2.0 / 3)))
    }
    got.foreach { case (id, lg, _, sc, bucket) =>
      val want = sc match {
        case None => "unscored"
        case Some(v) =>
          val (t1, t2) = th(lg)
          if (v <= t1) "tail" else if (v <= t2) "middle" else "head"
      }
      assert(bucket == want, s"doc $id ($lg, $sc): $bucket != $want")
    }
    // value-pure terciles: each bucket holds ≥ 1 doc per lang on this
    // corpus (degenerate all-equal-scores langs would collapse — not
    // this data), and bucket mass is n/3 ± ties
    th.keys.foreach { lg =>
      val bs = got.filter(g => g._2 == lg && g._4.isDefined)
        .groupBy(_._5).view.mapValues(_.length).toMap
      assert(Set("tail", "middle", "head").subsetOf(bs.keySet),
        s"$lg buckets: $bs")
    }
  }

  // ------------------------------------- cluster-balanced sampling

  test("diverse sample = per-cell lowest-u window form; partition-independent") {
    val e = Tables.embeddings(spark, sf)
    val got = Similarity.clusterBalancedSample(e, "vec_id", "embedding",
        64, perCell = 3, targetOccupancy = 16, probes = 2)
      .orderBy("cell", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // reference: the full assignment + a window row_number over (u, id)
    val cent = Similarity.seededCentroids(e, "vec_id", "embedding", 64,
      1.0 / 16)
    val asg = Similarity.ivfIndexDistributed(e, cent, "vec_id",
        "embedding", 64, probes = 2)
      .where(col("norm") > 0)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("u"), col("vec_id"))
    val ref = asg.select(col("cell"), col("vec_id"),
        Curation.hashUniform(col("vec_id")).as("u"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .orderBy("cell", "rank")
      .select(col("cell"), col("rank"), col("vec_id"), col("u"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == ref)
    // cells with ≥ perCell members keep exactly perCell; determinism
    // across a different physical partitioning
    val again = Similarity.clusterBalancedSample(e.repartition(7),
        "vec_id", "embedding", 64, perCell = 3, targetOccupancy = 16,
        probes = 2)
      .orderBy("cell", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == got)
    got.groupBy(_._1).foreach { case (_, xs) =>
      assert(xs.map(_._2).sorted == (1L to xs.length).toSeq)
      assert(xs.length <= 3)
    }
  }

  // ------------------------------------------- hard-negative mining

  test("hard negatives: filter-before-rank, zero-norm and same-label excluded") {
    def v(head: Double*) =
      (head ++ Seq.fill(64 - head.length)(0.0)).toArray
    val rows = Seq(
      (0L, v(1.0), 0L), // the query (label 0)
      (1L, v(2.0), 0L), // cosine 1.0 but SAME label — must not appear
      (2L, v(1.0, 1.0), 1L), // cos ≈ .707 — the true rank-1 negative
      (3L, v(0.0, 1.0), 1L), // cos 0 — rank 2
      (4L, v(0.0), 2L)) // zero norm — excluded entirely
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegativesTopK(
        rows.where(col("vec_id") === 0), rows, "vec_id", "embedding",
        "label", 64, k = 3)
      .orderBy("rank")
      .as[(Long, Long, Int, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._3, r._4, r._5)) == Seq(
      (1, 2L, 1L), (2, 3L, 1L)))
    assert(math.abs(got.head._6 - 1.0 / math.sqrt(2)) < 1e-15)
    // rank-then-filter would have returned vec 2 at rank 2 (behind the
    // same-label vec 1) — the rank-1 row above pins filter-first
  }

  test("hard negatives on the corpus: no same-label pair, k per query") {
    val e = Tables.embeddings(spark, sf)
    val got = Similarity.hardNegativesTopK(e.where(col("vec_id") < 8),
        e, "vec_id", "embedding", "label", 64, k = 4)
      .as[(Long, Long, Int, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r._2 != r._5), "same-label pair leaked")
    got.groupBy(_._1).foreach { case (q, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (1 to xs.length).toSeq)
      assert(xs.length == 4, s"query $q: ${xs.length} rows")
    }
  }

  // ------------------------------------------------ triplet mining

  test("triplets: hardest positive is LOWEST same-label cosine; violated margin") {
    def v(head: Double*) =
      (head ++ Seq.fill(64 - head.length)(0.0)).toArray
    val rows = Seq(
      (0L, v(1.0), 0L), // anchor
      (1L, v(1.0, 0.1), 0L), // positive, cos ≈ .995
      (2L, v(1.0, 2.0), 0L), // positive, cos ≈ .447 — the HARDEST
      (3L, v(1.0, 0.5), 1L), // negative, cos ≈ .894 — the hardest
      (4L, v(0.0, 1.0), 1L), // negative, cos 0
      (5L, v(0.0), 2L), // zero norm — ignored
      (9L, v(0.0, 0.0, 1.0), 7L)) // unique label (orthogonal to the
        // anchor, so it is not the hardest negative either): anchor 9
        // emits nothing, candidate 9 never wins
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.tripletMine(
        rows.where(col("vec_id").isin(0L, 9L)), rows, "vec_id",
        "embedding", "label", 64)
      .as[(Long, Long, Long, Double, Long, Double, Double)]
      .collect().toSeq
    assert(got.length == 1) // anchor 9 has no positive
    val t = got.head
    assert((t._1, t._3, t._5) == ((0L, 2L, 3L)))
    assert(math.abs(t._4 - 1.0 / math.sqrt(5)) < 1e-15)
    assert(math.abs(t._6 - 1.0 / math.sqrt(1.25)) < 1e-15)
    assert(t._7 == t._4 - t._6 && t._7 < 0) // violated triplet
  }

  // ------------------------------------------- padding efficiency

  test("padding report: smallest-bucket rule, truncation, exact ratios") {
    val docs = Seq((1L, 10L), (2L, 16L), (3L, 17L), (4L, 100L),
      (5L, 300L)).toDF("doc_id", "n")
    val got = graft.ext.Curation.paddingEfficiency(docs, "doc_id",
        col("n"), Seq(16, 32, 64, 128, 256))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (16L, 2L, 26L, 32L, 26.0 / 32.0), // 10 and the boundary 16
      (32L, 1L, 17L, 32L, 17.0 / 32.0),
      (128L, 1L, 100L, 128L, 100.0 / 128.0),
      (256L, 1L, 256L, 256L, 1.0))) // 300 truncates to 256
  }

  // ------------------------------------------- leakage-free split

  test("leakage split: component-atomic, total, singleton = own id") {
    val docs = Tables.documents(spark, sf)
    val cand = graft.ext.Dedup.lshCandidates(docs, "doc_id", "text",
        3, 16, 4)
      .where(col("sig_agreement") >= 0.25)
    val comp = graft.ext.Dedup.connectedComponents(cand, "id1", "id2")
    val got = Curation.leakageFreeSplit(docs, "doc_id", comp, "node",
        "component", trainFrac = 0.8)
      .as[(Long, Long, Double, String)].collect().toSeq
    // total: one row per document
    assert(got.length == docs.count())
    // atomic: a component never straddles the split
    got.groupBy(_._2).foreach { case (c, xs) =>
      assert(xs.map(_._4).distinct.length == 1,
        s"component $c straddles the split")
    }
    // members of real components carry their component id; docs in no
    // component are their own singleton
    val compMap = comp.as[(Long, Long)].collect().toMap
    got.foreach { case (id, c, u, sp) =>
      assert(c == compMap.getOrElse(id, id))
      assert(sp == (if (u < 0.8) "train" else "val"))
    }
    // both sides non-empty on this corpus
    assert(got.map(_._4).distinct.sorted == Seq("train", "val"))
  }

  test("leakage split refuses a components frame with duplicate nodes") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("node", "component")
    val e = intercept[Exception] {
      Curation.leakageFreeSplit(docs, "doc_id", dup, "node",
        "component", 0.8).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m =>
      m != null && m.contains("more than one row")))
  }
}
