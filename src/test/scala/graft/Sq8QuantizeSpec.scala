package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Pins SQ8 scalar quantization:
  *   - closed-form codes on a crafted corpus (bounds, midpoints, the
  *     constant-dimension rule);
  *   - the reconstruction-error bound err ≤ range/510 (+1 ulp slack)
  *     per dimension on real embeddings;
  *   - idempotence: quantizing the dequantized corpus reproduces the
  *     same codes (the fixpoint property an SQ8 store depends on).
  */
class Sq8QuantizeSpec extends SparkSuite {

  test("closed-form codes: bounds, midpoint rounding, constant dim") {
    import spark.implicits._
    // dim 1 spans [0,10]; dim 2 is constant; dim 3 spans [-1,1]
    val df = Seq(
      (1L, Seq(0.0, 7.5, -1.0)),
      (2L, Seq(10.0, 7.5, 1.0)),
      (3L, Seq(5.0, 7.5, 0.0)),
      (4L, Seq(0.02, 7.5, -1.0))).toDF("id", "v")
    val out = Similarity.sq8Quantize(df, "id", "v", 3)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    // dim1: x*25.5 + .5 floored; dim2 constant -> 0; dim3: (x+1)*127.5
    assert(out(0)._2 == Seq(0, 0, 0))
    assert(out(1)._2 == Seq(255, 0, 255))
    assert(out(2)._2 == Seq(128, 0, 128)) // 127.5+0.5 = 128: half-up
    assert(out(3)._2 == Seq(1, 0, 0)) // 0.02*25.5+0.5 = 1.01 -> 1
  }

  test("reconstruction error bounded by range/510 on real embeddings") {
    val e = Tables.embeddings(spark, sf)
    val dim = 64
    val q = Similarity.sq8Quantize(e, "vec_id", "embedding", dim)
    val bounds = e.agg(
      (0 until dim).map(i =>
        (max(element_at(col("embedding"), i + 1)) -
          min(element_at(col("embedding"), i + 1))).as(s"r$i")).head,
      (0 until dim).map(i =>
        (max(element_at(col("embedding"), i + 1)) -
          min(element_at(col("embedding"), i + 1))).as(s"r$i")).tail: _*)
      .head()
    val maxRange = (0 until dim).map(bounds.getDouble).max
    val worst = q.agg(max(col("max_abs_err"))).head().getDouble(0)
    assert(worst <= maxRange / 510 * (1 + 1e-12),
      s"err $worst exceeds the half-step bound ${maxRange / 510}")
    assert(q.count() == e.count())
  }

  test("quantization is a fixpoint on dequantized vectors") {
    import spark.implicits._
    // deterministic subset (limit() may pick different rows per job,
    // and this test reads `e` in three separate jobs)
    val e = Tables.embeddings(spark, sf).where(col("vec_id") < 200)
    val dim = 64
    val codes1 = Similarity.sq8Quantize(e, "vec_id", "embedding", dim)
      .select(col("vec_id"), col("codes"))
    // rebuild a corpus from the dequantized grid and re-quantize: the
    // grid's per-dim min/max spans the SAME range (codes 0 and 255 are
    // attained), so every grid point maps back to its own code
    val mn = e.agg(
      (0 until dim).map(i =>
        min(element_at(col("embedding"), i + 1)).as(s"m$i")).head,
      (0 until dim).map(i =>
        min(element_at(col("embedding"), i + 1)).as(s"m$i")).tail: _*)
      .head()
    val mx = e.agg(
      (0 until dim).map(i =>
        max(element_at(col("embedding"), i + 1)).as(s"m$i")).head,
      (0 until dim).map(i =>
        max(element_at(col("embedding"), i + 1)).as(s"m$i")).tail: _*)
      .head()
    val mnA = array((0 until dim).map(i => lit(mn.getDouble(i))): _*)
    val rgA = array((0 until dim).map(i =>
      lit(mx.getDouble(i) - mn.getDouble(i))): _*)
    val deq = codes1.select(col("vec_id"),
      transform(col("codes"), (c, i) =>
        element_at(mnA, i + 1) +
          c.cast("double") * element_at(rgA, i + 1) / lit(255.0))
        .as("embedding"))
    val codes2 = Similarity.sq8Quantize(deq, "vec_id", "embedding", dim)
      .select(col("vec_id"), col("codes").as("codes2"))
    val diff = codes1.join(codes2, "vec_id")
      .where(col("codes") =!= col("codes2")).count()
    assert(diff == 0L, s"$diff vectors re-quantized to different codes")
  }
}
