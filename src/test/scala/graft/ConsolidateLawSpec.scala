package graft

import graft.ingest.Consolidate
import graft.model.Cf
import org.apache.spark.sql.functions._

/** Randomized equivalence of CDP consolidation against a brute-force
  * bucket walk (reference semantics rrd_update.c:2006-2141, xff rule at
  * 2040-2045).
  *
  * The subtle case the oracle exercises: grid slots with NO row at all
  * (the sparse frame a retention-trimmed store hands the consolidator)
  * must count as unknown PDPs for the xff budget — the operator derives
  * unknowns as `pdp_cnt - count(known)` rather than counting null rows,
  * and an edge bucket that only partially overlaps the data range must
  * consolidate to unknown unless enough known slots exist.
  */
class ConsolidateLawSpec extends SparkSuite {

  private val stepSec = 60L

  private def bruteForce(rows: Seq[(String, Long, Option[Double])],
      pdpCnt: Long, cf: Cf, xff: Double)
      : Map[(String, Long), (Option[Double], Long)] = {
    val cdpStep = stepSec * pdpCnt
    rows.groupBy { case (k, ts, _) => (k, ((ts - 1) / cdpStep + 1) * cdpStep) }
      .map { case (key, xs) =>
        val known = xs.collect { case (_, ts, Some(v)) => (ts, v) }
        val unknown = pdpCnt - known.size
        val cfVal: Option[Double] =
          if (known.isEmpty) None
          else Some(cf match {
            case Cf.Average => known.map(_._2).sum / known.size
            case Cf.Min => known.map(_._2).min
            case Cf.Max => known.map(_._2).max
            case Cf.Last => known.maxBy(_._1)._2
            case other => fail(s"unexpected $other")
          })
        val out = if (unknown > xff * pdpCnt) None else cfVal
        (key, (out, known.size.toLong))
      }
  }

  test("cdp == brute-force bucket walk across CFs, xff, sparse grids") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for {
      cf <- Seq(Cf.Average, Cf.Min, Cf.Max, Cf.Last)
      (pdpCnt, xff) <- Seq((3L, 0.5), (5L, 0.3), (6L, 0.7))
    } {
      // sparse frame: ~70% of grid slots carry a row, ~15% of present
      // rows are null PDPs, several series, unaligned first slots
      val rows: Seq[(String, Long, Option[Double])] = (0 until 6).flatMap {
        s =>
          val t0 = 1700000000L / stepSec * stepSec + rnd.nextInt(10) * stepSec
          (0 until 60).flatMap { i =>
            if (rnd.nextInt(10) < 3) None
            else Some((s"s$s", t0 + i * stepSec,
              if (rnd.nextInt(100) < 15) None
              else Some(rnd.nextDouble() * 100 - 50)))
          }
      }
      val df = rows.map { case (k, ts, v) => (k, ts, v.map(Double.box).orNull) }
        .toDF("k", "pdp_ts", "pdp")
        .withColumn("pdp", col("pdp").cast("double"))
      val got = Consolidate.cdp(df, Seq("k"), "pdp_ts", "pdp", stepSec,
          pdpCnt, cf, xff)
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            r.getLong(3)))).toMap
      val want = bruteForce(rows, pdpCnt, cf, xff)
      assert(got.keySet == want.keySet, s"$cf pdpCnt=$pdpCnt buckets")
      got.foreach { case (key, (v, kn)) =>
        val (wv, wkn) = want(key)
        assert(kn == wkn, s"$cf $key known_cnt")
        (v, wv) match {
          case (None, None) => ()
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
              s"$cf $key value $a != $b")
          case _ => fail(s"$cf xff=$xff $key unknown-ness: $v vs $wv")
        }
      }
    }
  }

  test("cdpAll over many columns == per-column cdp joined") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4).flatMap { s =>
      (0 until 40).map { i =>
        def v() = if (rnd.nextInt(10) == 0) null
          else Double.box(rnd.nextDouble() * 10)
        (s"s$s", 1700000000L / stepSec * stepSec + i * stepSec, v(), v(), v())
      }
    }
    val df = rows.toDF("k", "pdp_ts", "a", "b", "c")
      .select(col("k"), col("pdp_ts"), col("a").cast("double"),
        col("b").cast("double"), col("c").cast("double"))
    val cols = Seq("a" -> "ca", "b" -> "cb", "c" -> "cc")
    val all = Consolidate.cdpAll(df, Seq("k"), "pdp_ts", cols, stepSec,
      4L, Cf.Average, 0.5)
    val per = cols.map { case (in, out) =>
      Consolidate.cdp(df, Seq("k"), "pdp_ts", in, stepSec, 4L,
        Cf.Average, 0.5).select(col("k"), col("cdp_ts"),
        col("cdp").as(out))
    }.reduce(_.join(_, Seq("k", "cdp_ts"), "full"))
    assert(all.count() == per.count())
    val bad = all.alias("g").join(per.alias("w"), Seq("k", "cdp_ts"))
      .where(cols.map { case (_, out) =>
        (col(s"g.$out").isNull =!= col(s"w.$out").isNull) ||
          abs(col(s"g.$out") - col(s"w.$out")) > lit(0.0)
      }.reduce(_ || _))
    assert(bad.count() == 0, "cdpAll diverges from per-column cdp")
  }
}
