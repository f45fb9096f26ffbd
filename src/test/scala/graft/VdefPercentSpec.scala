package graft

import graft.query.Vdef
import org.apache.spark.sql.functions._

/** The typed exact-percentile aggregate must (a) reproduce the previous
  * `collect_list + array_sort` column form bit-for-bit — including the
  * unknown-prefix rule of PERCENT, NaN sorting greatest (SQL order),
  * and the reference's round(p·(n-1)/100) selection — and (b) enforce
  * its window bound STRUCTURALLY: a group larger than `maxSlots` fails
  * loudly instead of silently collecting corpus-sized state.
  */
class VdefPercentSpec extends SparkSuite {
  import spark.implicits._

  /** The retired column form, kept verbatim as the parity anchor. */
  private def percentOld(v: org.apache.spark.sql.Column,
      steps: org.apache.spark.sql.Column, p: Double) = {
    val nulls = steps - count(v)
    val field = round(lit(p) * (steps.cast("double") - 1) / 100.0, 0)
      .cast("long")
    val kth = (field - nulls + 1).cast("int")
    when(field < nulls, lit(null))
      .otherwise(element_at(array_sort(collect_list(v)), kth))
  }
  private def percentNanOld(v: org.apache.spark.sql.Column, p: Double) = {
    val field = round(lit(p) * (count(v).cast("double") - 1) / 100.0, 0)
      .cast("int")
    when(count(v) === 0, lit(null))
      .otherwise(element_at(array_sort(collect_list(v)), field + 1))
  }

  private val fixture = Seq[(String, Option[Double])](
    // g1: nulls + NaN + duplicates — NaN must sort greatest (SQL order)
    ("g1", None), ("g1", Some(5.0)), ("g1", Some(1.0)), ("g1", None),
    ("g1", Some(Double.NaN)), ("g1", Some(3.0)), ("g1", Some(3.0)),
    // g2: all unknown — PERCENT lands in the unknown prefix
    ("g2", None), ("g2", None), ("g2", None),
    // g3: single known value
    ("g3", Some(7.5)),
    // g4: mostly unknown — low percentiles unknown, high ones known
    ("g4", None), ("g4", None), ("g4", None), ("g4", Some(2.0)),
    ("g4", Some(9.0)))

  test("typed aggregate equals the retired column form on every rank") {
    val df = fixture.toDF("g", "v")
    for (p <- Seq(0.0, 10.0, 25.0, 50.0, 75.0, 90.0, 95.0, 100.0)) {
      val got = df.groupBy("g").agg(
          Vdef.percent(col("v"), p).as("pct"),
          Vdef.percentNan(col("v"), p).as("pctnan"))
        .orderBy("g")
        .as[(String, Option[Double], Option[Double])].collect().toSeq
      val want = df.groupBy("g").agg(
          percentOld(col("v"), count(lit(1)), p).as("pct"),
          percentNanOld(col("v"), p).as("pctnan"))
        .orderBy("g")
        .as[(String, Option[Double], Option[Double])].collect().toSeq
      // NaN == NaN for this comparison: compare raw bits
      def bits(r: (String, Option[Double], Option[Double])) =
        (r._1, r._2.map(java.lang.Double.doubleToLongBits),
          r._3.map(java.lang.Double.doubleToLongBits))
      assert(got.map(bits) == want.map(bits), s"p=$p")
    }
  }

  test("window bound is structural: oversized groups fail loudly") {
    val big = spark.range(0, 10000)
      .select(lit("g").as("g"), col("id").cast("double").as("v"))
    val e = intercept[Exception] {
      big.groupBy("g").agg(Vdef.percent(col("v"), 50.0, maxSlots = 1000))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("maxSlots"))),
      s"expected a maxSlots failure, got $e")
    // ...and the same group size under the bound succeeds
    val ok = big.groupBy("g")
      .agg(Vdef.percent(col("v"), 50.0, maxSlots = 20000).as("p"))
      .as[(String, Double)].collect()
    assert(ok.toSeq == Seq(("g", 5000.0)) ||
      ok.toSeq == Seq(("g", 4999.0)), s"got ${ok.toSeq}")
  }
}
