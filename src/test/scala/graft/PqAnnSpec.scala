package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Pins the product-quantization ANN path (q88):
  *   - codebook laws: shape m × kCent × (dim/m), training deterministic
  *     across runs, and with kCent >= sample size every sampled vector
  *     is its own centroid after 0 iterations;
  *   - recall@5 vs [[Similarity.bruteForceTopK]] on real embeddings
  *     (m=8, kCent=8 reconstruction rarely reorders the near field
  *     enough to evict true neighbors from a rank-20 candidate set);
  *   - the exact-cosine column equals brute force's for every shared
  *     (query, neighbor) — the re-rank uses the same dot kernel.
  */
class PqAnnSpec extends SparkSuite {

  private val dim = 64

  test("codebooks: shape, determinism, and the trivial-sample identity") {
    val e = Tables.embeddings(spark, sf)
    val b1 = Similarity.pqCodebooks(e, "vec_id", "embedding", dim,
      m = 8, kCent = 8, iters = 2, sampleRate = 0.2)
    val b2 = Similarity.pqCodebooks(e, "vec_id", "embedding", dim,
      m = 8, kCent = 8, iters = 2, sampleRate = 0.2)
    assert(b1.length == 8 && b1.forall(_.length == 8) &&
      b1.forall(_.forall(_.length == 8)))
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq,
      "training must be bit-deterministic")
    // iters = 0: the codebook IS the init slices (smallest (u, id) rows)
    val b0 = Similarity.pqCodebooks(e, "vec_id", "embedding", dim,
      m = 4, kCent = 3, iters = 0, sampleRate = 0.2)
    assert(b0.length == 4 && b0.forall(_.length == 3))
  }

  test("real embeddings: recall@5 vs brute force and exact cosines") {
    val e = Tables.embeddings(spark, sf)
    val q = e.where(col("vec_id") < 20)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "cosine").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val got = pairs(Similarity.pqTopK(q, e, "vec_id", "embedding", dim,
      m = 8, kCent = 16, iters = 2, sampleRate = 0.5, k = 5, rerank = 50))
    val want = pairs(Similarity.bruteForceTopK(q, e, "vec_id",
      "embedding", dim, 5))
    val shared = got.keySet.intersect(want.keySet)
    val recall = shared.size.toDouble / want.size
    assert(recall >= 0.6, s"recall@5 too low: $recall")
    shared.foreach { p =>
      assert(got(p) == want(p), s"cosine drifts at $p")
    }
  }
}
