package graft

import graft.hw.HoltWinters
import graft.hw.HoltWinters.HwSpec
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the Holt-Winters core (the DataFrame wrapper is
  * exercised end-to-end by q33/q34 against the recursive-CTE oracle). */
class HoltWintersSpec extends AnyFunSuite {

  test("bootstrap + constant series converges to exact prediction") {
    val xs = Array.fill(12)(10.0)
    val r = HoltWinters.run(xs, HwSpec(0.1, 0.035, 4, 0.1, 0.1))
    // first cycle: seasonal coefs initialize (x - intercept = 0), no
    // prediction until a seasonal coef is seen one cycle later
    assert(r.hwpredict.take(4).forall(_.isNaN))
    // once warm, prediction is exactly the constant
    assert(r.hwpredict.drop(5).forall(_ == 10.0))
    assert(r.seasonal.forall(_ == 0.0))
    assert(r.failures.forall(_ == 0.0))
  }

  test("multiplicative: seasonal coefficients are ratios") {
    val xs = Array.fill(12)(10.0)
    val r = HoltWinters.run(xs,
      HwSpec(0.1, 0.035, 4, 0.1, 0.1, multiplicative = true))
    assert(r.seasonal.forall(_ == 1.0)) // x / intercept
    assert(r.hwpredict.drop(5).forall(_ == 10.0))
  }

  test("NaN handling: null_count defers slope application") {
    val spec = HwSpec(0.5, 0.5, 2, 0.5, 0.5)
    val xs = Array(10.0, 10.0, 10.0, Double.NaN, Double.NaN, 10.0)
    val r = HoltWinters.run(xs, spec)
    // gaps do not produce violations until a deviation exists, and the
    // prediction at t=5 uses null_count=3 (two NaN steps + reset rule)
    assert(!r.hwpredict(5).isNaN)
    assert(r.violation.sum >= 0) // windows shift without crashing
  }

  test("FAILURES window: persistent outliers trip the threshold") {
    val period = 4
    // two warm cycles of 100s, then a persistent level shift to 200
    val xs = Array.fill(8)(100.0) ++ Array.fill(10)(200.0)
    val r = HoltWinters.run(xs,
      HwSpec(0.1, 0.1, period, 0.1, 0.1, failThreshold = 2, windowLen = 3))
    assert(r.violation.take(8).sum == 0)
    assert(r.violation.drop(8).take(4).sum >= 2, "shift must violate")
    assert(r.failures.exists(_ == 1.0), "threshold 2/3 must trip")
  }

  test("runFrom chunked across batches == run whole (state round trip, smoother active)") {
    val spec = HwSpec(0.1, 0.035, 48, 0.1, 0.1) // offset 1: smoothing fires
    val rnd = new scala.util.Random(3)
    val pdp = Array.fill(200)(
      if (rnd.nextInt(20) == 0) Double.NaN else rnd.nextDouble() * 50)
    val whole = HoltWinters.run(pdp, spec)
    var st = HoltWinters.initState(spec)
    val outs = Seq(pdp.slice(0, 37), pdp.slice(37, 100), pdp.slice(100, 200))
      .map { p =>
        val (r, s) = HoltWinters.runFrom(p, spec, st)
        st = s // crosses cycle boundaries: smoothing state must carry over
        r
      }
    def bits(a: Seq[Double]): Seq[Long] =
      a.map(java.lang.Double.doubleToLongBits)
    assert(bits(outs.flatMap(_.hwpredict)) == bits(whole.hwpredict.toSeq))
    assert(bits(outs.flatMap(_.seasonal)) == bits(whole.seasonal.toSeq))
    assert(bits(outs.flatMap(_.devseasonal)) == bits(whole.devseasonal.toSeq))
    assert(bits(outs.flatMap(_.devpredict)) == bits(whole.devpredict.toSeq))
    assert(bits(outs.flatMap(_.failures)) == bits(whole.failures.toSeq))
    assert(st.t == 200L)
  }

  test("smoother: centered cyclic moving average + baseline (rrd_hw.c:128-330)") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    val baseline = HoltWinters.smooth(a, 1)
    assert(a(0) === (4.0 + 1.0 + 2.0) / 3)
    assert(a(1) === (1.0 + 2.0 + 3.0) / 3)
    assert(a(2) === (2.0 + 3.0 + 4.0) / 3)
    assert(a(3) === (3.0 + 4.0 + 1.0) / 3)
    assert(baseline === a.sum / 4)
  }

  test("smoother: any NaN aborts without modification") {
    val a = Array(1.0, Double.NaN, 3.0)
    val before = a.clone()
    val baseline = HoltWinters.smooth(a, 1)
    assert(baseline.isNaN)
    assert(a(0) == before(0) && a(2) == before(2))
  }
}
