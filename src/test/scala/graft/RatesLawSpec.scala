package graft

import graft.ingest.Rates
import graft.model.{DsDef, Dst}
import org.apache.spark.sql.functions._

/** Randomized equivalence of the window-based DST rate conversion
  * against a driver-side walk of each series (reference semantics
  * rrd_update.c:1433-1597) — completing the ingest-chain law trio with
  * [[NormalizeLawSpec]] and [[ConsolidateLawSpec]].
  *
  * The oracle replays, per consecutive sample pair: the first-sample
  * unknown, the heartbeat gate, COUNTER's 2^32-1 then 2^64-2^32 wrap
  * corrections, DCOUNTER's direction-change reset, ABSOLUTE's
  * value/interval, and the min/max clamp — in plain doubles, the same
  * single-IEEE-op chains the column expressions compile to, so the
  * comparison is exact (bit-for-bit), not approximate.
  */
class RatesLawSpec extends SparkSuite {

  private def oracle(samples: Seq[(Long, Double)], spec: DsDef)
      : Seq[Option[Double]] = {
    val out = Seq.newBuilder[Option[Double]]
    var prev: Option[(Long, Double)] = None
    samples.foreach { case (t, v) =>
      val r: Option[Double] = prev match {
        case None => None
        case Some((t0, v0)) =>
          val interval = (t - t0).toDouble / 1e6
          if (interval > spec.heartbeatSec.toDouble) None
          else Some(spec.dst match {
            case Dst.Gauge => v
            case Dst.Absolute => v / interval
            case Dst.Counter =>
              var d = v - v0
              if (d < 0) d += 4294967295.0
              if (d < 0) d += 18446744069414584320.0
              d / interval
            case Dst.Derive | Dst.DDerive => (v - v0) / interval
            case Dst.DCounter =>
              if ((v > 0 && v0 > v) || (v < 0 && v > v0)) Double.NaN
              else (v - v0) / interval
            case other => fail(s"unexpected $other")
          }).filterNot(_.isNaN)
      }
      val clamped = r.filterNot(x =>
        spec.min.exists(x < _) || spec.max.exists(x > _))
      out += clamped
      prev = Some((t, v))
    }
    out.result()
  }

  test("withRate == per-series walk across DSTs, gates, and clamps") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val specs = Seq(
      DsDef("g", Dst.Gauge, 300L),
      DsDef("g2", Dst.Gauge, 300L, min = Some(-20.0), max = Some(60.0)),
      DsDef("a", Dst.Absolute, 300L),
      // values near the 32-bit wrap so both corrections fire
      DsDef("c", Dst.Counter, 300L),
      DsDef("d", Dst.Derive, 300L),
      DsDef("dc", Dst.DCounter, 300L))
    specs.foreach { spec =>
      val series: Map[String, Seq[(Long, Double)]] = (0 until 8).map { s =>
        var t = 1700000000000000L + rnd.nextInt(1000000)
        val n = 40 + rnd.nextInt(60)
        val xs = (0 until n).map { _ =>
          // gaps straddle the 300 s heartbeat so the gate fires
          t += (20 + rnd.nextInt(400)) * 1000000L + rnd.nextInt(1000000)
          val v = spec.dst match {
            case Dst.Counter =>
              // mix 32-bit and 64-bit counter magnitudes: a drop from a
              // 64-bit value leaves d + (2^32-1) still negative, so the
              // SECOND wrap correction (2^64-2^32) genuinely fires too
              if (rnd.nextBoolean()) (rnd.nextDouble() * 4294967295.0).floor
              else (rnd.nextDouble() * 1.8446744073e19).floor
            case Dst.DCounter => rnd.nextDouble() * 200 - 100
            case _ => rnd.nextDouble() * 100 - 30
          }
          (t, v)
        }
        (s"s$s", xs)
      }.toMap
      val df = series.toSeq.flatMap { case (k, xs) =>
        xs.zipWithIndex.map { case ((t, v), i) => (k, t, i.toLong, v) }
      }.toDF("k", "ts_us", "id", "v")
      val got = Rates.withRate(df, Seq("k"), "ts_us", "id", "v", spec)
        .select("k", "ts_us", "rate").collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      series.foreach { case (k, xs) =>
        val want = oracle(xs, spec)
        xs.zip(want).foreach { case ((t, _), w) =>
          assert(got((k, t)) === w,
            s"${spec.dst} $k@$t: got ${got((k, t))}, want $w")
        }
      }
    }
  }
}
