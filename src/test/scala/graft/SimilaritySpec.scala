package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Embedding near-dup coverage over constructed clusters (the testdata
  * embeddings have no pairs above cosine ~0.5, so the operator is
  * exercised on vectors with known near-duplicates). */
class SimilaritySpec extends SparkSuite {

  test("cosineNearDupPairs finds perturbed duplicates, not cross-cluster pairs") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    // 10 cluster centers; each contributes an original + a 1%-perturbed
    // copy (near-dup) — plus lone noise vectors
    val rows = (0 until 10).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val near = base.map(x => x * (1 + 0.01 * rnd.nextDouble()))
      Seq((c.toLong * 2, base.map(_.toFloat).toSeq),
        (c.toLong * 2 + 1, near.map(_.toFloat).toSeq))
    } ++ (100 until 110).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)
        .map(_.toFloat).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        dim, tau = 0.999, planes = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // every constructed near-dup pair is found
    val expected = (0 until 10).map(c => (c.toLong * 2, c.toLong * 2 + 1)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected -- pairs}")
    // and nothing across clusters sneaks past tau
    assert(pairs.forall { case (a, b) => b == a + 1 && a % 2 == 0 })
  }
}
