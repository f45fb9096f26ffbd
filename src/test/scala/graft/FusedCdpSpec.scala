package graft

import graft.ingest.{Consolidate, Normalize}
import graft.model.Cf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins `Normalize.pdpCdp` (the fused PDP→CDP plan that consolidates
  * interior spans at window granularity) to the composed
  * `Consolidate.cdp(Normalize.pdp(...))` form BIT-FOR-BIT: same rows,
  * same known counts, byte-identical doubles — across all four CFs,
  * both decimal routes, and adversarial series shapes (sub-step
  * bursts, multi-window jumps, null-rate intervals, unaligned starts).
  * The fused form exists because the composed one generates the full
  * PDP grid only to reduce it pdpCnt:1 immediately (the q17 hot path).
  */
class FusedCdpSpec extends SparkSuite {

  private val stepSec = 60L
  private val pdpCnt = 12L

  private def randomSeries(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until 16).flatMap { s =>
      var t = 1700000000000000L + rnd.nextInt(120) * 1000000L +
        rnd.nextInt(1000000)
      (0 until 40 + rnd.nextInt(160)).map { _ =>
        // gaps 3 s .. 45 min: same-step bursts through multi-WINDOW
        // jumps (45 min > 12 × 60 s, so whole windows are span-only)
        t += (3 + rnd.nextInt(2700)) * 1000000L + rnd.nextInt(1000000)
        val r = if (rnd.nextInt(10) == 0) None
          else Some(math.round(rnd.nextDouble() * 20000 - 10000) / 100.0)
        (s"s$s", t, r)
      }
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Map[(String, Long), (Option[Long], Long)] =
    df.select("k", "cdp_ts", "cdp", "known_cnt").collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None
         else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(2))),
          r.getLong(3))
    }.toMap

  test("pdpCdp == Consolidate.cdp(pdp) bit-for-bit, all CFs x routes") {
    import spark.implicits._
    val df = randomSeries(7).map { case (k, t, r) =>
      (k, t, r.map(Double.box).orNull)
    }.toDF("k", "ts_us", "rate")
      .withColumn("rate", col("rate").cast("double"))

    for {
      cf <- Seq(Cf.Average, Cf.Min, Cf.Max, Cf.Last)
      (scale, sumType) <- Seq(
        (Some(2), DecimalType(18, 10)),
        (None, DecimalType(28, 10)))
    } {
      val composed = rows(Consolidate.cdp(
        Normalize.pdp(df, Seq("k"), "ts_us", "rate", stepSec,
          rateScale = scale),
        Seq("k"), "pdp_ts", "pdp", stepSec, pdpCnt, cf, 0.5,
        sumType = sumType))
      val fused = rows(Normalize.pdpCdp(df, Seq("k"), "ts_us", "rate",
        stepSec, pdpCnt, cf, 0.5, rateScale = scale, sumType = sumType))
      assert(fused.keySet == composed.keySet,
        s"$cf/$scale: window coverage differs")
      val bad = fused.collect {
        case (key, v) if composed(key) != v => (key, v, composed(key))
      }
      assert(bad.isEmpty,
        s"$cf/$scale: ${bad.size} mismatches, first: ${bad.headOption}")
    }
  }

  test("xff boundary and all-unknown windows match the composed form") {
    import spark.implicits._
    // one series: a long known run, then a null-rate run sized so some
    // windows sit exactly at the xff budget (6 of 12 unknown)
    val stepUs = stepSec * 1000000L
    val t0 = 1700000000000000L
    val samples =
      (1 to 40).map(i => ("a", t0 + i * stepUs, Some(50.0))) ++
      (41 to 80).map(i => ("a", t0 + i * stepUs, None)) ++
      (81 to 90).map(i => ("a", t0 + i * stepUs, Some(25.0)))
    val df = samples.map { case (k, t, r) =>
      (k, t, r.map(Double.box).orNull)
    }.toDF("k", "ts_us", "rate")
      .withColumn("rate", col("rate").cast("double"))
    val composed = rows(Consolidate.cdp(
      Normalize.pdp(df, Seq("k"), "ts_us", "rate", stepSec,
        rateScale = Some(2)),
      Seq("k"), "pdp_ts", "pdp", stepSec, pdpCnt, Cf.Average, 0.5,
      sumType = DecimalType(18, 10)))
    val fused = rows(Normalize.pdpCdp(df, Seq("k"), "ts_us", "rate",
      stepSec, pdpCnt, Cf.Average, 0.5, rateScale = Some(2),
      sumType = DecimalType(18, 10)))
    assert(fused == composed)
    // the shape actually exercises both branches of the xff rule
    assert(composed.values.exists(_._1.isEmpty), "no unknown CDP window")
    assert(composed.values.exists(_._1.nonEmpty), "no known CDP window")
  }
}
