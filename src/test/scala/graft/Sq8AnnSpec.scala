package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Pins the two-stage SQ8 ANN read path:
  *   - identity case: a corpus whose coordinates already sit on the
  *     code grid reconstructs exactly, so approx ordering == exact
  *     ordering and the output equals brute force;
  *   - real embeddings: recall@5 vs [[Similarity.bruteForceTopK]] is
  *     high (SQ8's 1/510-per-dim error rarely reorders neighbors);
  *   - the exact-cosine column equals brute force's for every
  *     (query, neighbor) the two share (same dot kernel).
  */
class Sq8AnnSpec extends SparkSuite {

  private val dim = 64

  test("grid-aligned corpus: sq8TopK equals brute force exactly") {
    import spark.implicits._
    // coordinates in {0, 1/255, ..., 255/255} with per-dim min 0 max 1:
    // codes reconstruct exactly, approx dot == exact dot
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      (i, Array.tabulate(dim)(_ => rnd.nextInt(256).toDouble / 255.0))
    } :+ (60L, Array.tabulate(dim)(i => i.toDouble / 255.0)) :+
      (61L, Array.fill(dim)(0.0).updated(0, 1.0))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 5)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "rank", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val got = key(Similarity.sq8TopK(q, df, "vec_id", "embedding", dim,
      k = 5, rerank = 62))
    val want = key(Similarity.bruteForceTopK(q, df, "vec_id", "embedding",
      dim, 5))
    assert(got == want)
  }

  test("real embeddings: recall@5 vs brute force and exact cosines") {
    val e = Tables.embeddings(spark, sf)
    val q = e.where(col("vec_id") < 20)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "cosine").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val got = pairs(Similarity.sq8TopK(q, e, "vec_id", "embedding", dim,
      k = 5, rerank = 20))
    val want = pairs(Similarity.bruteForceTopK(q, e, "vec_id", "embedding",
      dim, 5))
    val shared = got.keySet.intersect(want.keySet)
    val recall = shared.size.toDouble / want.size
    assert(recall >= 0.9, s"recall@5 too low: $recall")
    shared.foreach { p =>
      assert(got(p) == want(p), s"cosine drifts at $p")
    }
  }
}
