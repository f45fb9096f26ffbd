package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Embedding standardization: the per-dimension two-level moment folds
  * (the q105 ordered-fold contract on the GLOBAL group), the fixed
  * one-pass std chain, and the std=0 transform rule.
  */
class EmbedStandardizeSpec extends SparkSuite {
  import spark.implicits._

  private def vrow(id: Long, head: Double*) =
    (id, (head ++ Seq.fill(64 - head.length)(0.0)).toArray)

  test("dim stats equal the locally replayed two-level fold across shards") {
    // ids straddle three 4096-blocks so level 2 really folds partials
    val rows = Seq(vrow(1L, 1.5, -2.0), vrow(2L, 2.5, 4.0),
      vrow(5000L, -3.25, 1.0), vrow(5001L, 0.5, 0.25),
      vrow(10000L, 7.0, -0.125))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.embeddingDimStats(df, "vec_id", "embedding", 64)
      .orderBy("dim").as[(Long, Long, Double, Double)].collect()
    assert(got.length == 64)
    assert(got.forall(_._2 == 5L))
    // local replay: same shard split, same fold orders, same op chain
    val byShard = rows.groupBy(t => t._1 / 4096).toSeq.sortBy(_._1)
    for (j <- 0 until 64) {
      var s = 0.0
      var ss = 0.0
      byShard.foreach { case (_, xs) =>
        var ps = 0.0
        var pss = 0.0
        xs.sortBy(_._1).foreach { t =>
          ps += t._2(j); pss += t._2(j) * t._2(j)
        }
        s += ps; ss += pss
      }
      val mean = s / 5.0
      val v2 = ss / 5.0 - mean * mean
      val std = if (v2 <= 0) 0.0 else math.sqrt(v2)
      assert(java.lang.Double.compare(got(j)._3, mean) == 0,
        s"dim ${j + 1} mean")
      assert(java.lang.Double.compare(got(j)._4, std) == 0,
        s"dim ${j + 1} std")
    }
  }

  test("constant dimension: std 0, z maps to 0.0; null/short excluded") {
    val df = Seq(
      (1L, Some(Array.fill(64)(3.0))),
      (2L, Some(Array.fill(64)(3.0))),
      (3L, None: Option[Array[Double]]),
      (4L, Some(Array(1.0, 2.0)))). // too short
      toDF("vec_id", "embedding")
    val st = Similarity.embeddingDimStats(df, "vec_id", "embedding", 64)
      .as[(Long, Long, Double, Double)].collect()
    assert(st.forall(r => r._2 == 2L && r._3 == 3.0 && r._4 == 0.0))
    val z = Similarity.standardizeEmbeddings(df, "vec_id", "embedding",
        64)
      .as[(Long, Seq[Double])].collect()
    assert(z.map(_._1).sorted.toSeq == Seq(1L, 2L))
    assert(z.forall(_._2.forall(_ == 0.0)))
  }

  test("standardized corpus has ~0 mean and ~unit variance per dim") {
    val e = Tables.embeddings(spark, sf)
    val z = Similarity.standardizeEmbeddings(e, "vec_id", "embedding",
        64)
      .as[(Long, Seq[Double])].collect()
    assert(z.nonEmpty)
    val n = z.length.toDouble
    for (j <- 0 until 64) {
      val xs = z.map(_._2(j))
      val m = xs.sum / n
      val v = xs.map(x => x * x).sum / n - m * m
      assert(math.abs(m) < 1e-9, s"dim $j mean $m")
      assert(math.abs(v - 1.0) < 1e-6, s"dim $j var $v")
    }
  }
}
