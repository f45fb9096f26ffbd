package graft

import graft.rpn.RpnInterpreter
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests the reference lacks (SURVEY.md §5 plan item b):
  * algebraic laws of consolidation and the RPN NaN ordering, checked
  * over randomized series. Pure-core properties run on the interpreter
  * and the consolidation math directly (no Spark session needed).
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (the scalatestplus
    * bridge is not in the offline cache). */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = check1(g)(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    check1(Gen.zip(g1, g2))(t => f(t._1, t._2))
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    check1(Gen.zip(g1, g2, g3))(t => f(t._1, t._2, t._3))
  private def check1[A](g: Gen[A])(f: A => Unit): Unit = {
    val prop = Prop.forAll(g) { a =>
      try { f(a); true }
      catch { case _: org.scalatest.exceptions.TestCanceledException => true }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val values: Gen[Double] =
    Gen.frequency(
      8 -> Gen.choose(-1e6, 1e6),
      1 -> Gen.const(Double.NaN),
      1 -> Gen.const(0.0))
  private val seriesGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(values)

  private def known(xs: Seq[Double]): Seq[Double] = xs.filterNot(_.isNaN)

  test("AVERAGE · known-count == TOTAL / step (VDEF identity)") {
    forAll(seriesGen) { xs =>
      val k = known(xs)
      whenever(k.nonEmpty) {
        val avg = k.sum / k.size
        val total = k.sum * 300.0
        assert(math.abs(avg * k.size - total / 300.0) <=
          1e-9 * math.max(1.0, math.abs(total / 300.0)))
      }
    }
  }

  test("consolidation is associative for MIN/MAX over known values") {
    forAll(seriesGen, Gen.choose(1, 5)) { (xs, split) =>
      val k = known(xs)
      whenever(k.nonEmpty) {
        val (a, b) = k.splitAt(math.min(split, k.size - 1).max(0))
        def mm(s: Seq[Double], f: (Double, Double) => Double): Option[Double] =
          s.reduceOption(f)
        // min(min(A), min(B)) == min(A ++ B), same for max
        val direct = mm(k, math.min)
        val split2 = Seq(mm(a, math.min), mm(b, math.min)).flatten
          .reduceOption(math.min(_: Double, _: Double))
        assert(direct == split2)
        assert(mm(k, math.max) ==
          Seq(mm(a, math.max), mm(b, math.max)).flatten
            .reduceOption(math.max(_: Double, _: Double)))
      }
    }
  }

  test("AVERAGE re-consolidation with weights == direct average") {
    // avg over all == weighted avg of bucket avgs weighted by known count
    forAll(seriesGen, Gen.choose(1, 7)) { (xs, width) =>
      val k = known(xs)
      whenever(k.nonEmpty) {
        val buckets = xs.grouped(width).toSeq.map(known)
        val weighted = buckets.filter(_.nonEmpty)
          .map(b => (b.sum / b.size) * b.size).sum / k.size
        val direct = k.sum / k.size
        assert(math.abs(weighted - direct) <=
          1e-9 * math.max(1.0, math.abs(direct)))
      }
    }
  }

  test("NaN-first ordering is a total order (rrd_rpncalc.c:524-546)") {
    forAll(values, values, values) { (x, y, z) =>
      val ord = RpnInterpreter.nanFirst
      // antisymmetry + transitivity witnesses
      assert(Integer.signum(ord.compare(x, y)) ==
        -Integer.signum(ord.compare(y, x)))
      if (ord.compare(x, y) <= 0 && ord.compare(y, z) <= 0)
        assert(ord.compare(x, z) <= 0)
      // NaN sorts below everything
      assert(ord.compare(Double.NaN, x) <= 0)
    }
  }

  test("RPN MINNAN/MAXNAN ignore NaN; MIN/MAX propagate it") {
    val ts = Array(300L, 600L)
    forAll(values, values) { (a, b) =>
      val s = Map("a" -> Array(a, a), "b" -> Array(b, b))
      val minnan = RpnInterpreter.eval("a,b,MINNAN", s, ts, 300L)(0)
      val min = RpnInterpreter.eval("a,b,MIN", s, ts, 300L)(0)
      if (a.isNaN && b.isNaN) assert(minnan.isNaN && min.isNaN)
      else if (a.isNaN || b.isNaN) {
        assert(minnan == (if (a.isNaN) b else a))
        assert(min.isNaN)
      } else {
        assert(minnan == math.min(a, b) && min == math.min(a, b))
      }
    }
  }

  test("ADDNAN: NaN acts as zero unless both unknown") {
    val ts = Array(300L)
    forAll(values, values) { (a, b) =>
      val r = RpnInterpreter.eval("a,b,ADDNAN",
        Map("a" -> Array(a), "b" -> Array(b)), ts, 300L)(0)
      if (a.isNaN && b.isNaN) assert(r.isNaN)
      else if (a.isNaN) assert(r == b)
      else if (b.isNaN) assert(r == a)
      else assert(r == a + b)
    }
  }

  test("prefill coverage fold == per-second winner simulation") {
    // The store's prefillBin walks candidate bins in (priority, start)
    // order, counting only newly covered seconds (rrd_create.c's
    // add_coverage). Equivalent formulation: every SECOND of the target
    // bin belongs to the first candidate (in walk order) covering it.
    // The fold must match that brute force for every CF and threshold.
    import graft.model.Cf
    import graft.store.RrdStore
    val (tbS, tbE) = (100L, 160L)
    val candGen = for {
      cs <- Gen.choose(80L, 170L)
      len <- Gen.choose(1L, 40L)
      v <- Gen.choose(-100.0, 100.0)
      p <- Gen.choose(0, 3)
    } yield (cs, cs + len, v, p)
    val candsGen = Gen.listOfN(6, candGen)
    val cfGen = Gen.oneOf[Cf](Cf.Average, Cf.Min, Cf.Max, Cf.Last)
    forAll(candsGen, cfGen, Gen.choose(0.0, 0.9)) { (cands, cf, xff) =>
      val walk = cands.sortBy(c => (c._4, c._1))
      // per-second winner = first covering candidate in walk order
      val winners = (tbS until tbE).flatMap { sec =>
        walk.find(c => c._1 <= sec && sec < c._2).map(sec -> _)
      }
      val expected = if (winners.size > xff * (tbE - tbS)) {
        val contributing = walk.filter(c => winners.exists(_._2 == c))
        cf match {
          case Cf.Average => Some(
            winners.map(_._2._3).sum / winners.size)
          case Cf.Min => Some(contributing.map(_._3).min)
          case Cf.Max => Some(contributing.map(_._3).max)
          case Cf.Last => contributing.lastOption.map(_._3)
          case _ => None
        }
      } else None
      val got = RrdStore.prefillBin(cands, tbS, tbE, cf, xff)
      (expected, got) match {
        case (Some(e), Some(g)) =>
          assert(math.abs(e - g) <= 1e-9 * math.max(1.0, math.abs(e)),
            s"$cf xff=$xff cands=$cands: $g != $e")
        case (e, g) => assert(e == g, s"$cf xff=$xff cands=$cands")
      }
    }
  }

  test("update time parse keeps epoch microseconds exactly") {
    forAll(Gen.choose(0L, 2000000000L), Gen.choose(0L, 999999L)) {
      (sec, micro) =>
        val t = graft.ingest.UpdateParser.parseTime(f"$sec%d.$micro%06d", 0L)
        assert(t == sec * 1000000L + micro)
        assert(graft.ingest.UpdateParser.parseTime(sec.toString, 0L) ==
          sec * 1000000L)
    }
  }

  // ---- media codec round trips: arbitrary dims/content survive the
  // real containers bit-exactly (PNG is lossless 8-bit; WAV/AVI are PCM
  // /uncompressed — any padding, row-order, endianness, or header-size
  // bug shows up as a pixel/sample mismatch)

  test("PNG gray round trip is lossless for arbitrary dims and pixels") {
    forAll(Gen.choose(1, 40), Gen.choose(1, 40), Gen.choose(0L, Long.MaxValue)) {
      (w, h, seed) =>
        val rnd = new scala.util.Random(seed)
        val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
        val (w2, h2, back) = graft.ext.Multimodal.ImageCodec.decodeGray(
          graft.ext.Multimodal.ImageCodec.encodeGrayPng(w, h, px))
        assert(w2 == w && h2 == h)
        assert(back.toSeq == px.map(_ & 0xff).toSeq)
    }
  }

  test("WAV PCM16 round trip is lossless for arbitrary signals") {
    forAll(Gen.choose(1, 500), Gen.choose(0L, Long.MaxValue)) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val s = Array.fill(n)(rnd.nextInt(65536).toShort)
      val rate = 4000 + rnd.nextInt(44100)
      val (r2, back) = graft.ext.Multimodal.WavCodec.decodePcm16(
        graft.ext.Multimodal.WavCodec.encodePcm16(rate, s))
      assert(r2 == rate && back.toSeq == s.toSeq)
    }
  }

  test("AVI DIB round trip is lossless for arbitrary dims/frame counts") {
    forAll(Gen.choose(1, 24), Gen.choose(1, 12), Gen.choose(1, 6)) {
      (w, h, nf) =>
        val rnd = new scala.util.Random(w * 1000003L + h * 1009L + nf)
        val frames = Seq.fill(nf)(Array.fill(w * h)(rnd.nextInt(256).toByte))
        val (w2, h2, back) = graft.ext.Multimodal.AviCodec.decodeGrayFrames(
          graft.ext.Multimodal.AviCodec.encodeGrayAvi(w, h, 10, frames))
        assert(w2 == w && h2 == h && back.length == nf)
        frames.zip(back).foreach { case (f, b) =>
          assert(b.toSeq == f.map(_ & 0xff).toSeq)
        }
    }
  }
}
