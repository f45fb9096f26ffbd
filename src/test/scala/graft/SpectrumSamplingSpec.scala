package graft

import graft.ext.{Curation, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the corpus-map/sampling trio (q135/q136/q137):
  *   - clusterTopTerms: per-cell sizes and top terms equal a
  *     driver-side replay over the SAME deterministic assignment;
  *   - weightedSamplePerGroup: per-group bottom-k of the 52-bit
  *     min-ticket keys, replayed driver-side on integers;
  *   - vocabSpectrum: exact counts, dense ranks, cumulative fractions
  *     on a planted corpus and head-shorter-than-topN behavior.
  */
class SpectrumSamplingSpec extends SparkSuite {

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("vocabSpectrum: planted counts, rank density, exact cumulative " +
      "fractions, head shorter than topN") {
    import spark.implicits._
    // token mass: x*6, y*3, z*2, w*1 -> total 12
    val docs = Seq("x x x y y z", "x x x y z w").toDF("text")
    val got = TextAnalysis.vocabSpectrum(docs, "text", topN = 3)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "x", 6L), (2L, "y", 3L), (3L, "z", 2L)))
    assert(got.map(_._4).toSeq ==
      Seq(6.0 / 12.0, 9.0 / 12.0, 11.0 / 12.0))
    // topN past the vocabulary: every word once, ties by term ASC
    val all = TextAnalysis.vocabSpectrum(docs, "text", topN = 100)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(all.length == 4 && all.last._4 == 1.0)
    assert(all.map(_._1).toSeq == (1L to 4L).toSeq)
  }

  test("weightedSamplePerGroup: per-group bottom-k replayed on " +
      "integers; 52-bit keys; rank density; guard fires") {
    import spark.implicits._
    val rows = (0L until 240L).map(i =>
      (i, s"g${(i % 3)}", 1 + (i % 5).toInt))
    def key(id: Long, w: Int): Long =
      (1 to w).map(t => java.lang.Long.parseLong(
        md5hex(s"$id:$t").substring(0, 13), 16)).min
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.map { case (id, _, w) => (key(id, w), id) }.sorted.take(6)
        .zipWithIndex.map { case ((tk, id), i) =>
          (g, (i + 1).toLong, id, tk)
        }
    }.sortBy(r => (r._1, r._2))
    val got = Curation.weightedSamplePerGroup(
        rows.toDF("doc_id", "lang", "w"), "doc_id", "lang", col("w"),
        k = 6)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == expected)
    got.foreach { case (_, _, _, tk) =>
      assert(tk >= 0 && tk < (1L << 52), s"key out of 52-bit range: $tk")
    }
    intercept[Exception] {
      Curation.weightedSamplePerGroup(Seq((1L, "g", 99)).toDF(
        "doc_id", "lang", "w"), "doc_id", "lang", col("w"), k = 1,
        maxWeight = 8).collect()
    }
  }

  test("idfHashingVectorize: driver replay (UTF-8 fold order, incl. a " +
      "supplementary-char doc where UTF-16 order differs), OOV boost, " +
      "unit norm") {
    import spark.implicits._
    // U+FFFF (3-byte UTF-8: ef bf bf) sorts BEFORE U+10000 (4-byte:
    // f0 90 80 80) in UTF-8 byte order, but its UTF-16 code unit
    // ￿ sorts AFTER the surrogate \ud800 — the one ordering a
    // TreeMap with default compareTo would get wrong
    val supp = new String(Character.toChars(0x10000))
    val docs = Seq(
      (1L, "the the cat sat"), (2L, "the dog sat"),
      (3L, s"￿ $supp ￿"), (4L, "cat"))
      .toDF("doc_id", "text")
    val dim = 1 // every token shares bucket 0: fold order fully exposed
    val got = TextAnalysis.idfHashingVectorize(docs, "doc_id", "text",
        dim = dim, vocabSize = 2, l2Normalize = false)
      .as[(Long, Seq[Double])].collect().toMap
    // driver replay
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    def sign(w: String) = if ((md5(w)(7) & 0xf) >= 8) 1 else -1
    def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        if ((x(i) & 0xff) != (y(i) & 0xff)) return (x(i) & 0xff) < (y(i) & 0xff)
        i += 1
      }
      x.length < y.length
    }
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.trim.split(" ", -1) }
    val nDocs = toks.length.toLong
    val dfAll = toks.flatMap(_._2.distinct).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }
    val voc = dfAll.toSeq.sortBy { case (w, c) => (-c, w) }.take(2).toMap
    def weight(w: String) = {
      val dfw = voc.getOrElse(w, 0L)
      ((nDocs - dfw) + 0.5) / (dfw + 0.5)
    }
    val want = toks.map { case (id, ws) =>
      val acc = ws.groupBy(identity).toSeq
        .sortWith { case ((a, _), (b, _)) => utf8Lt(a, b) }
        .foldLeft(0.0) { case (s, (w, xs)) =>
          s + (sign(w) * xs.length).toDouble * weight(w)
        }
      id -> acc
    }.toMap
    got.foreach { case (id, v) =>
      assert(v.length == 1 && v.head == want(id), s"doc $id fold")
    }
    // the UTF-8 comparator really orders doc 3's tokens differently
    // from String.compareTo (the order the replay above pins; a
    // two-term fold commutes so the SUM can't distinguish them — the
    // ordering itself is the guarded property)
    assert(utf8Lt("￿", supp) && "￿".compareTo(supp) > 0,
      "fixture no longer distinguishes UTF-8 from UTF-16 order")
    // OOV boost: an unseen word weighs more than any vocab word
    assert(weight("zzz_unseen") > voc.keys.map(weight).max)
    // unit norm on the real corpus (normalized form)
    val nrm = TextAnalysis.idfHashingVectorize(
        Tables.documents(spark, sf), "doc_id", "text", dim = 16,
        vocabSize = 20)
      .as[(Long, Seq[Double])].collect()
    assert(nrm.nonEmpty)
    nrm.foreach { case (id, v) =>
      val n2 = v.foldLeft(0.0)((s, x) => s + x * x)
      assert(n2 == 0.0 || math.abs(n2 - 1.0) < 1e-12, s"doc $id: $n2")
    }
  }

  test("clusterTopTerms: sizes and top terms equal a driver replay " +
      "over the same deterministic assignment") {
    import spark.implicits._
    val d = Tables.documents(spark, sf)
    val k = 3
    val got = TextAnalysis.clusterTopTerms(d, "doc_id", "text", dim = 64,
        k = k, targetOccupancy = 16, probes = 2)
      .as[(Long, Long, Long, String, Long)].collect()
      .sortBy(r => (r._1, r._3))
    assert(got.nonEmpty)
    // replay: same vectorize + assignment calls, then driver-side
    // term counting and (count DESC, term ASC) top-k
    val vec = TextAnalysis.hashingVectorize(d, "doc_id", "text", 64)
    val cent = Similarity.seededCentroids(vec, "doc_id", "vec", 64,
      1.0 / 16)
    // doc -> cell (each doc exactly one cell)
    val docCell = Similarity.ivfIndexDistributed(vec, cent, "doc_id",
        "vec", 64, probes = 2)
      .where(col("norm") > 0).select("doc_id", "cell")
      .as[(Long, Long)].collect().toMap
    val toks = d.select(col("doc_id"),
        TextAnalysis.words(col("text")).as("ws"))
      .as[(Long, Seq[String])].collect()
    val byCell = toks.filter(t => docCell.contains(t._1))
      .groupBy(t => docCell(t._1))
    val want = byCell.toSeq.flatMap { case (cell, ds) =>
      val nDocs = ds.length.toLong
      val counts = ds.flatMap(_._2).groupBy(identity)
        .map { case (w, xs) => (w, xs.length.toLong) }.toSeq
      counts.sortBy { case (w, n) => (-n, w) }.take(k).zipWithIndex
        .map { case ((w, n), i) => (cell, nDocs, (i + 1).toLong, w, n) }
    }.sortBy(r => (r._1, r._3))
    assert(got.toSeq == want,
      s"first diff: ${got.toSeq.zip(want).find(p => p._1 != p._2)}")
  }
}
