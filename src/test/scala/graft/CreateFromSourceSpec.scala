package graft

import graft.cli.Commands
import graft.model.Cf
import graft.store.RrdStore
import org.apache.spark.sql.functions._

/** Ports of the reference's `create --source` prefill corpus
  * (tests/create-with-source-2 and -4, rrd_prefill_data
  * rrd_create.c:1888-2140):
  *
  *   - -2 shape: a store created from two single-DS sources must carry
  *     the SAME rollup data as the store the samples were ingested into
  *     directly — for every plain CF, across exact-match and coverage
  *     paths.
  *   - -4 shape: sources at steps 67 s and 73 s prefill a 71 s target
  *     through the interval-overlap consolidation (no divisibility
  *     anywhere); correctness asserted statistically exactly like the
  *     reference (ratio b/2/a: mean within 1e-3 of 1, stddev < 1/500).
  *   - the `DS:a=b[idx]` mapping grammar with its 1-based source index
  *     (DS_RE, rrd_create.c:310-326).
  */
class CreateFromSourceSpec extends SparkSuite {

  private val ST = 1300000000L
  private val Rras = Seq("RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:2",
    "RRA:MIN:0.5:5:2", "RRA:MAX:0.5:5:2", "RRA:LAST:0.5:5:2")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  test("chained prefill with DS reorder keeps data by name " +
      "(tests/create-with-source-1)") {
    val c = new Commands(spark)
    val Seq(a1, a2, a3, a4, a5, a6) =
      (1 to 6).map(i => tmp(s"cs1a$i"))
    c.create(a1, Seq("--start", s"${ST - 1}", "--step", "60",
      "DS:a:GAUGE:120:0:U") ++ Rras)
    val ts = (0 to 150).map(i => ST + 60L * i)
    c.update(a1, ts.indices.map(i => s"${ts(i)}:${10 + 20L * i}"))
    def from(dst: String, src: String, ds: Seq[String]): Unit =
      c.create(dst, Seq("--start", s"${ts.last}", "--step", "60",
        "--source", src) ++ ds ++ Rras)
    from(a2, a1, Seq("DS:a:GAUGE:120:0:U"))
    from(a3, a2, Seq("DS:a:GAUGE:120:0:U"))
    // new DS b (no history) AHEAD of a: prefill matches by name
    from(a4, a2, Seq("DS:b:GAUGE:120:0:U", "DS:a:GAUGE:120:0:U"))
    from(a5, a4, Seq("DS:a:GAUGE:120:0:U", "DS:b:GAUGE:120:0:U"))
    from(a6, a5, Seq("DS:b:GAUGE:120:0:U", "DS:a:GAUGE:120:0:U"))
    def fetchA(p: String): Seq[(Long, Option[Double])] =
      RrdStore.fetch(spark, p, Cf.Average, "a", Seq("k"), ST, ts.last,
        60L).orderBy("ts").collect().toSeq
        .map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val want = fetchA(a1)
    assert(want.exists(_._2.isDefined), "source store must carry data")
    // the reference compares these dumps through its float-normalizing
    // seddif filter (tests/functions:17-22) — the prefill coverage
    // merge is 1-ulp off the direct CDP on some slots, so compare with
    // the same tolerance in spirit
    def close(x: Seq[(Long, Option[Double])],
        y: Seq[(Long, Option[Double])]): Boolean =
      x.size == y.size && x.zip(y).forall {
        case ((t1, v1), (t2, v2)) => t1 == t2 && ((v1, v2) match {
          case (None, None) => true
          case (Some(a), Some(b)) =>
            math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a))
          case _ => false
        })
      }
    Seq(a2, a3, a4, a5, a6).foreach(p => assert(close(fetchA(p), want), p))
    // b stays all-unknown through the whole chain
    val fb = RrdStore.fetch(spark, a6, Cf.Average, "b", Seq("k"),
      ST, ts.last, 60L)
    assert(fb.where(col("b").isNotNull).count() == 0)
  }

  test("two single-DS sources rebuild the direct-ingest store " +
      "(tests/create-with-source-2)") {
    val c = new Commands(spark)
    val (a1, b1, ab1, ab2) = (tmp("cs2a"), tmp("cs2b"), tmp("cs2ab"),
      tmp("cs2ab2"))
    def create(path: String, ds: Seq[String]): Unit =
      c.create(path, Seq("--start", s"${ST - 1}", "--step", "60") ++
        ds ++ Rras)
    create(a1, Seq("DS:a:GAUGE:120:0:U"))
    create(b1, Seq("DS:b:GAUGE:120:0:U"))
    create(ab1, Seq("DS:a:GAUGE:120:0:U", "DS:b:GAUGE:120:0:U"))
    // V starts at 10 and climbs by 20 per sample, every 60 s
    val ts = (0 to 150).map(i => ST + 60L * i)
    val vs = ts.indices.map(i => 10 + 20L * i)
    c.update(a1, ts.indices.map(i => s"${ts(i)}:${vs(i)}"))
    c.update(b1, ts.indices.map(i => s"${ts(i)}:${2 * vs(i)}"))
    c.update(ab1, ts.indices.map(i => s"${ts(i)}:${vs(i)}:${2 * vs(i)}"))

    // unmapped DSes find their namesakes across the source list
    c.create(ab2, Seq("--start", s"${ts.last}", "--step", "60",
      "--source", a1, "--source", b1,
      "DS:a:GAUGE:120:0:U", "DS:b:GAUGE:120:0:U") ++ Rras)

    Rras.indices.foreach { i =>
      val got = spark.read.parquet(s"$ab2/rra$i")
      val want = spark.read.parquet(s"$ab1/rra$i")
      // retention: 100 one-step rows / 2 five-step rows, like the
      // reference's fixed row_cnt circular buffers
      assert(got.count() == (if (i == 0) 100 else 2), s"rra$i rows")
      val joined = got.alias("g").join(want.alias("w"), Seq("k", "ts"))
        .select(
          max(abs(col("g.a") - col("w.a"))).as("da"),
          max(abs(col("g.b") - col("w.b"))).as("db"),
          count(lit(1)).as("n"))
        .first()
      assert(joined.getLong(2) == (if (i == 0) 100 else 2),
        s"rra$i join rows")
      assert(joined.getDouble(0) < 1e-9 && joined.getDouble(1) < 1e-9,
        s"rra$i values diverge: $joined")
    }
  }

  test("incommensurate steps 67s/73s prefill a 71s target " +
      "(tests/create-with-source-4)") {
    val c = new Commands(spark)
    val (a1, b1, ab2) = (tmp("cs4a"), tmp("cs4b"), tmp("cs4ab2"))
    val (stepA, stepB, stepAB) = (67L, 73L, 71L)
    def rras(step: Long) = Seq(
      s"RRA:AVERAGE:0.5:1:${7100 / step}", "RRA:AVERAGE:0.5:5:2",
      "RRA:MIN:0.5:5:2", "RRA:MAX:0.5:5:2", "RRA:LAST:0.5:5:2")
    c.create(a1, Seq("--start", s"${ST - 1}", "--step", s"$stepA",
      "DS:a:GAUGE:142:0:U") ++ rras(stepA))
    c.create(b1, Seq("--start", s"${ST - 1}", "--step", s"$stepB",
      "DS:b:GAUGE:142:0:U") ++ rras(stepB))
    val ts = (0 to 120).map(i => ST + stepAB * i)
    val vs = ts.indices.map(i => 10 + 20L * i)
    c.update(a1, ts.indices.map(i => s"${ts(i)}:${vs(i)}"))
    c.update(b1, ts.indices.map(i => s"${ts(i)}:${2 * vs(i)}"))

    c.create(ab2, Seq("--start", s"${ts.last}", "--step", s"$stepAB",
      "--source", a1, "--source", b1,
      "DS:a:GAUGE:142:0:U", "DS:b:GAUGE:142:0:U",
      "RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:2", "RRA:MIN:0.5:5:2",
      "RRA:MAX:0.5:5:2", "RRA:LAST:0.5:5:2"))

    // the reference's own acceptance: over the last hour the per-slot
    // ratio b/2/a has mean ≈ 1 (±1e-3) and stddev below 1/500
    val (end, start) = (ts.last, ts.last - 3600)
    def f(ds: String) = RrdStore.fetch(spark, ab2, Cf.Average, ds,
      Seq("k"), start, end, stepAB)
    val ratio = f("a").join(f("b"), Seq("k", "ts"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .select((col("b") / 2.0 / col("a")).as("c"))
    val r = ratio.agg(avg("c"), stddev_pop("c"), count(lit(1))).first()
    assert(r.getLong(2) >= 40, s"too few resolved slots: ${r.getLong(2)}")
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-3,
      s"mean ratio ${r.getDouble(0)}")
    assert(r.getDouble(1) < 0.002, s"stddev ${r.getDouble(1)}")
  }

  test("four sources covering disjoint time ranges merge, the gap " +
      "stays unknown (tests/create-with-source-3)") {
    val c = new Commands(spark)
    val (ax, bx, ay, by, ab1, ab2) = (tmp("cs3ax"), tmp("cs3bx"),
      tmp("cs3ay"), tmp("cs3by"), tmp("cs3ab1"), tmp("cs3ab2"))
    val rras = Seq("RRA:AVERAGE:0.5:1:400", "RRA:AVERAGE:0.5:5:8",
      "RRA:MIN:0.5:5:8", "RRA:MAX:0.5:5:8", "RRA:LAST:0.5:5:8")
    def create(path: String, ds: Seq[String]): Unit =
      c.create(path, Seq("--start", s"${ST - 1}", "--step", "60") ++
        ds.map(d => s"DS:$d:GAUGE:120:0:U") ++ rras)
    Seq(ax -> "a", bx -> "b", ay -> "a", by -> "b")
      .foreach { case (p, d) => create(p, Seq(d)) }
    create(ab1, Seq("a", "b"))
    // range X, a 1200 s heartbeat-breaking gap, then range Y
    val tsX = (0 to 50).map(i => ST + 60L * i)
    val tsY = (0 to 50).map(i => tsX.last + 1200 + 60L * i)
    def vsOf(ts: Seq[Long], v0: Long, dv: Long) =
      ts.indices.map(i => v0 + dv * i)
    val (vX, vY) = (vsOf(tsX, 10, 20), vsOf(tsY, 40, 50))
    c.update(ax, tsX.indices.map(i => s"${tsX(i)}:${vX(i)}"))
    c.update(bx, tsX.indices.map(i => s"${tsX(i)}:${2 * vX(i)}"))
    c.update(ay, tsY.indices.map(i => s"${tsY(i)}:${vY(i)}"))
    c.update(by, tsY.indices.map(i => s"${tsY(i)}:${2 * vY(i)}"))
    c.update(ab1, tsX.indices.map(i => s"${tsX(i)}:${vX(i)}:${2 * vX(i)}")
      ++ tsY.indices.map(i => s"${tsY(i)}:${vY(i)}:${2 * vY(i)}"))

    c.create(ab2, Seq("--start", s"${tsY.last}", "--step", "60",
      "--source", ax, "--source", bx, "--source", ay, "--source", by,
      "DS:a:GAUGE:120:0:U", "DS:b:GAUGE:120:0:U") ++ rras)

    rras.indices.foreach { i =>
      val got = spark.read.parquet(s"$ab2/rra$i")
      val want = spark.read.parquet(s"$ab1/rra$i")
      // same known slots, same values, on every common row
      val bad = got.alias("g").join(want.alias("w"), Seq("k", "ts"))
        .where(
          (col("g.a").isNull =!= col("w.a").isNull) ||
          (col("g.b").isNull =!= col("w.b").isNull) ||
          abs(col("g.a") - col("w.a")) > 1e-9 ||
          abs(col("g.b") - col("w.b")) > 1e-9)
      assert(bad.count() == 0, s"rra$i diverges")
      // within the target's retention window the prefilled store knows
      // exactly the slots the direct-ingest store knows
      val bin = if (i == 0) 60L else 300L
      val rows = if (i == 0) 400L else 8L
      val lastTb = Math.floorDiv(tsY.last, bin) * bin
      // ...excluding the x→gap boundary, exactly like the reference's
      // data_filter_by_time $ST_X $ST_X+1200 (tests/create-with-source-3:
      // the source's final partial PDP lives only in its pdp_prep
      // scratch, which prefill does not transplant, so the slot right
      // after the last x sample resolves only in the direct store)
      def knownIn(df: org.apache.spark.sql.DataFrame) =
        df.where(col("ts") > lastTb - rows * bin && col("ts") <= lastTb &&
          !(col("ts") >= tsX.last && col("ts") <= tsX.last + 1200) &&
          col("a").isNotNull).count()
      assert(knownIn(got) == knownIn(want), s"rra$i known-slot sets differ")
    }
    // the one-step RRA spans both ranges: x and y data survive, the
    // heartbeat-breaking 1200 s between them stays unknown
    val g0 = spark.read.parquet(s"$ab2/rra0")
    def known(lo: Long, hi: Long) = g0.where(col("ts") > lo &&
      col("ts") <= hi && col("a").isNotNull).count()
    assert(known(ST, tsX.last) > 0, "x-range empty")
    assert(known(tsY.head, tsY.last) > 0, "y-range empty")
    assert(known(tsX.last + 60, tsY.head - 60) == 0, "gap not unknown")
  }

  test("10s-sampled linear slopes land inside the sample-and-hold " +
      "error band, singly and resampled (tests/create-with-source-5)") {
    val c = new Commands(spark)
    val (a1, b1, ab1, ab2) = (tmp("cs5a"), tmp("cs5b"), tmp("cs5ab"),
      tmp("cs5ab2"))
    // deliberately NOT minute-aligned (tests/create-with-source-5:36)
    val startT = 1300000005L
    val (stepA, stepB, stepAB) = (67L, 73L, 71L)
    val (slopeA, slopeB) = (6000L, -12000L) // per minute
    val tstep = 10L                         // sampling finer than any step
    def rras(step: Long): Seq[String] =
      Seq("AVERAGE", "MIN", "MAX", "LAST")
        .map(cf => s"RRA:$cf:0.5:1:${7100 / step}") ++
      Seq("AVERAGE", "MIN", "MAX", "LAST").map(cf => s"RRA:$cf:0.5:5:2")
    c.create(a1, Seq("--start", s"${startT - 1}", "--step", s"$stepA",
      "DS:a:GAUGE:142:U:U") ++ rras(stepA))
    c.create(b1, Seq("--start", s"${startT - 1}", "--step", s"$stepB",
      "DS:b:GAUGE:142:U:U") ++ rras(stepB))
    c.create(ab1, Seq("--start", s"${startT - 1}", "--step", s"$stepAB",
      "DS:a:GAUGE:142:U:U", "DS:b:GAUGE:142:U:U") ++ rras(stepAB))
    val ts = (0 to (stepAB * 120 / tstep).toInt)
      .map(i => startT + tstep * i)
    val va = ts.indices.map(i => slopeA / 60 * tstep * i)
    val vb = ts.indices.map(i => slopeB / 60 * tstep * i)
    c.update(a1, ts.indices.map(i => s"${ts(i)}:${va(i)}"))
    c.update(b1, ts.indices.map(i => s"${ts(i)}:${vb(i)}"))
    c.update(ab1, ts.indices.map(i => s"${ts(i)}:${va(i)}:${vb(i)}"))
    val end = ts.last

    // the reference's error probe: t = midpoint of the true line over
    // the slot (vl at slot start, vu at slot end), c = sampled - true;
    // mean(c) printed via the full DEF/CDEF(TIME,POP)/VDEF/PRINT path
    def meanErr(path: String, ds: String, step: Long,
        slope: Long): Double = {
      val g = c.graphv(Seq("--end", s"$end", "--start", "end-1h",
        s"DEF:x=$path:$ds:AVERAGE",
        s"CDEF:vl=x,POP,TIME,$startT,-,$step,-,$slope,60,/,*",
        s"CDEF:vu=x,POP,TIME,$startT,-,$slope,60,/,*",
        "CDEF:t=vu,vl,+,2,/",
        "CDEF:c=x,t,-",
        "VDEF:s=c,STDEV", "VDEF:cavg=c,AVERAGE",
        "PRINT:s:%lg", "PRINT:cavg:%lg"))
      g.prints(1).toDouble
    }
    // acceptance exactly as the reference computes it
    // (tests/create-with-source-5:188-200): |1 - got/expected| below
    // the band, expected = Tsample/2 * slope / 6.00
    def accept(got: Double, slope: Long, band: Double, tag: String): Unit = {
      val expected = tstep / 2.0 * slope / 6.00
      assert(math.abs(1.0 - got / expected) < band,
        s"$tag mean error $got vs band around $expected")
    }
    accept(meanErr(a1, "a", stepA, slopeA), slopeA, 1.0, "a1")
    accept(meanErr(b1, "b", stepB, slopeB), slopeB, 1.0, "b1")
    accept(meanErr(ab1, "a", stepAB, slopeA), slopeA, 1.0, "ab1:a")
    accept(meanErr(ab1, "b", stepAB, slopeB), slopeB, 1.0, "ab1:b")

    // two differently-stepped sources resampled into a 71 s target:
    // same probe, the reference's wider 4x band
    c.create(ab2, Seq("--start", s"$end", "--step", s"$stepAB",
      "--source", a1, "--source", b1,
      "DS:a:GAUGE:142:U:U", "DS:b:GAUGE:142:U:U") ++ rras(stepAB))
    accept(meanErr(ab2, "a", stepAB, slopeA), slopeA, 4.0, "ab2:a")
    accept(meanErr(ab2, "b", stepAB, slopeB), slopeB, 4.0, "ab2:b")
  }

  test("DS:x=a[idx] maps across sources by 1-based index " +
      "(tests/create-with-source-and-mapping-1 grammar)") {
    val c = new Commands(spark)
    val (a1, b1, m2) = (tmp("csma"), tmp("csmb"), tmp("csmm"))
    def create(path: String, ds: String): Unit =
      c.create(path, Seq("--start", s"${ST - 1}", "--step", "60",
        s"DS:$ds:GAUGE:120:0:U", "RRA:AVERAGE:0.5:1:100"))
    create(a1, "a")
    create(b1, "b")
    val ts = (0 to 30).map(i => ST + 60L * i)
    c.update(a1, ts.indices.map(i => s"${ts(i)}:${10 + i}"))
    c.update(b1, ts.indices.map(i => s"${ts(i)}:${900 + i}"))

    // x draws from source #1's DS a; y names DS b but pins source #1,
    // which has no b — it must stay unknown rather than find b1's
    c.create(m2, Seq("--start", s"${ts.last}", "--step", "60",
      "--source", a1, "--source", b1,
      "DS:x=a[1]:GAUGE:120:0:U", "DS:y=b[1]:GAUGE:120:0:U",
      "DS:z=b:GAUGE:120:0:U", "RRA:AVERAGE:0.5:1:100"))
    val got = spark.read.parquet(s"$m2/rra0")
    assert(got.where(col("x").isNotNull).count() >= 29)
    assert(got.where(col("y").isNotNull).count() == 0)
    assert(got.where(col("z").isNotNull).count() >= 29)
    // x carries a's values, z carries b's
    val chk = got.alias("g")
      .join(spark.read.parquet(s"$a1/rra0").alias("sa"), Seq("k", "ts"))
      .join(spark.read.parquet(s"$b1/rra0").alias("sb"), Seq("k", "ts"))
      .agg(max(abs(col("g.x") - col("sa.a"))),
        max(abs(col("g.z") - col("sb.b")))).first()
    assert(chk.getDouble(0) < 1e-9 && chk.getDouble(1) < 1e-9)
  }
}
