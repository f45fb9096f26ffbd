package graft

import graft.ingest.Normalize
import org.apache.spark.sql.functions._

/** Randomized equivalence of the production PDP-normalization plan
  * against a brute-force per-interval oracle.
  *
  * `Normalize.pdpAll` is the most rearranged operator in the engine:
  * edge steps shuffle through a hash aggregation while interior steps
  * are emitted finished map-side (the sample-sized-shuffle optimization,
  * see its scaladoc). The reference semantics it must preserve are
  * rrd_update.c:1599-1651,1739-1783 / doc/rrd_pdpcalc.pod: split each
  * sample interval across step boundaries by time overlap, PDP =
  * Σ rate·overlap / Σ known-overlap, unknown iff more than half the
  * step is unknown time.
  *
  * The oracle here is the UN-rearranged form: walk each series'
  * consecutive sample pairs on the driver and accumulate per-step
  * (rate·overlap, known-overlap) directly. Any double emission,
  * dropped edge, off-by-one step index, or wrong unknown rule in the
  * distributed plan shows up as a mismatch on some randomized shape —
  * irregular gaps, sub-step bursts, multi-step jumps, null-rate
  * (heartbeat-gated) intervals, and non-aligned start times are all in
  * the generator's range.
  */
class NormalizeLawSpec extends SparkSuite {

  private val stepSec = 60L
  private val stepUs = stepSec * 1000000L

  /** Driver-side reference normalization of one series' samples. */
  private def oracle(samples: Seq[(Long, Option[Double])])
      : Map[Long, (Option[Double], Long)] = {
    val acc = scala.collection.mutable.Map[Long, (Double, Long)]()
    samples.sliding(2).foreach {
      case Seq((t0, _), (t1, r)) if t1 > t0 =>
        var k = t0 / stepUs + 1
        val kl = (t1 - 1) / stepUs + 1
        while (k <= kl) {
          val ov = math.min(t1, k * stepUs) -
            math.max(t0, (k - 1) * stepUs)
          val (s, kn) = acc.getOrElse(k, (0.0, 0L))
          acc(k) = r match {
            case Some(v) => (s + v * ov, kn + ov)
            case None => (s, kn)
          }
          k += 1
        }
      case _ => ()
    }
    acc.toMap.map { case (k, (s, kn)) =>
      val pdp = if (kn < stepUs - stepUs / 2) None else Some(s / kn)
      (k * stepSec, (pdp, kn))
    }
  }

  test("pdpAll == brute-force interval walk on randomized series") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 24 series with adversarial shapes: gaps from 3 s (sub-step
    // bursts) to 500 s (multi-step jumps with interior fills), ~10% of
    // rates null (heartbeat-gated upstream), start times unaligned
    val series: Map[String, Seq[(Long, Option[Double])]] =
      (0 until 24).map { s =>
        var t = 1700000000000000L + rnd.nextInt(120) * 1000000L +
          rnd.nextInt(1000000)
        val n = 30 + rnd.nextInt(120)
        val samples = (0 until n).map { _ =>
          t += (3 + rnd.nextInt(498)) * 1000000L + rnd.nextInt(1000000)
          val r = if (rnd.nextInt(10) == 0) None
            else Some(rnd.nextDouble() * 200 - 100)
          (t, r)
        }
        (s"s$s", samples)
      }.toMap

    val df = series.toSeq.flatMap { case (k, xs) =>
      xs.map { case (t, r) => (k, t, r.map(Double.box).orNull) }
    }.toDF("k", "ts_us", "rate")
      .withColumn("rate", col("rate").cast("double"))

    val got = Normalize.pdp(df, Seq("k"), "ts_us", "rate", stepSec)
      .select("k", "pdp_ts", "pdp", "known_us")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getLong(3))))

    // the edge/interior union must cover each (series, step) ONCE
    val keys = got.map(_._1)
    assert(keys.length == keys.distinct.length,
      "duplicate (series, pdp_ts) rows — edge/interior overlap")

    val want = series.map { case (k, xs) => (k, oracle(xs)) }
    val wantKeys: Set[(String, Long)] = want.toSeq
      .flatMap { case (k, m) => m.keys.toSeq.map(ts => (k, ts)) }.toSet
    assert(keys.toSet == wantKeys, "step coverage differs from oracle")

    got.foreach { case ((k, ts), (pdp, knownUs)) =>
      val (wPdp, wKnown) = want(k)(ts)
      assert(knownUs == wKnown, s"$k@$ts known_us $knownUs != $wKnown")
      (pdp, wPdp) match {
        case (None, None) => ()
        case (Some(a), Some(b)) =>
          // the plan sums rate·µs as decimal(38,10); the oracle in
          // plain doubles — identical up to that rounding
          assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
            s"$k@$ts pdp $a != $b")
        case _ => fail(s"$k@$ts unknown-ness differs: $pdp vs $wPdp")
      }
    }
  }
}
