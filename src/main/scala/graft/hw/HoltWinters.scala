package graft.hw

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Holt-Winters aberrant-behavior family (SURVEY.md §2.6):
  * HWPREDICT/MHWPREDICT, SEASONAL, DEVSEASONAL, DEVPREDICT, FAILURES —
  * the exact per-step recurrences of
  * /root/reference/src/rrd_hw_update.c:38-475 and rrd_hw_math.c:21-143,
  * in the standard contingent-RRA layout created by
  * rrd_create.c:1168-1245 (HWPREDICT, then SEASONAL, DEVSEASONAL,
  * DEVPREDICT, FAILURES — the update order of update_aberrant_cdps,
  * rrd_update.c:2276-2329).
  *
  * Execution model: the recurrence is inherently sequential per series
  * (single-writer, state carried between steps), so each series runs as
  * one tight loop inside `flatMapGroups`; parallelism = series
  * cardinality, exactly like the reference's one-file-one-writer model.
  * At 100 TB this is one shuffle on the series key followed by
  * embarrassingly parallel per-series scans — the only correct
  * distribution for this operator (SURVEY §2.6 "never try to parallelize
  * within a series").
  *
  * NaN discipline: inputs/outputs use SQL NULL for unknown; inside the
  * loop the reference's DNAN arithmetic runs on Double.NaN verbatim.
  *
  * Deviations from the reference, both documented:
  *   - bulk updates (elapsed_pdp_st > 2) skip SEASONAL/DEVSEASONAL
  *     updates in the reference (rrd_update.c:1876-1889); this operator
  *     consumes a grid-aligned PDP frame, so every step is elapsed = 1
  *     and the skip path cannot occur.
  *   - seasonal smoothing *timing* in the reference depends on
  *     rrd_random() (initial row, rrd_open.c:1200-1206) and a filename
  *     hash (smooth idx, rrd_create.c:1201); here the schedule is
  *     deterministic: once per cycle during the 3 burn-in cycles
  *     (BURNIN_CYCLES, rrd_hw.h:47), then whenever
  *     `step % period == smoothIdx`. The smoother itself
  *     (rrd_hw.c:128-330) is exact: centered cyclic moving average of
  *     width 2·floor(window/2·period)+1, SEASONAL arrays re-centered by
  *     the baseline mean which is added to the HWPREDICT intercept.
  */
object HoltWinters extends Serializable {

  /** Parameters of one HW family (rra_def par words,
    * /root/reference/src/rrd_format.h:223-259). `gammaSeasonal` and
    * `gammaDev` default to alpha in the reference's contingent creation
    * (rrd_create.c:1203,1219).
    */
  final case class HwSpec(
      alpha: Double,
      beta: Double,
      period: Int,
      gammaSeasonal: Double,
      gammaDev: Double,
      multiplicative: Boolean = false,
      deltaPos: Double = 2.0,
      deltaNeg: Double = 2.0,
      failThreshold: Int = 7,
      windowLen: Int = 9,
      smoothingWindow: Double = 0.05,
      smoothIdx: Int = 0) {
    require(period >= 1 && windowLen >= 1 && windowLen <= 28)
  }
  object HwSpec {
    def apply(alpha: Double, beta: Double, period: Int): HwSpec =
      HwSpec(alpha, beta, period, alpha, alpha)
  }

  /** Per-step outputs, parallel arrays (NaN = unknown). */
  final case class HwResult(
      hwpredict: Array[Double], seasonal: Array[Double],
      devseasonal: Array[Double], devpredict: Array[Double],
      failures: Array[Double], violation: Array[Int])

  /** The complete recurrence state between steps — the reference's
    * `cdp_prep` scratch plus the circular SEASONAL/DEVSEASONAL arrays
    * and the FAILURES violation window, with the global step counter
    * `t` that drives array indexing and the smoothing schedule. A batch
    * resumed from the state of the previous batch produces bit-identical
    * output to one uninterrupted run (StreamingEndToEndSpec). */
  final case class HwState(
      intercept: Double, lastIntercept: Double,
      slope: Double, lastSlope: Double,
      nullCount: Long, lastNullCount: Long,
      shSeasonal: Double, shLastSeasonal: Double,
      sdev: Double, lastSdev: Double,
      sArr: Seq[Double], dArr: Seq[Double], viol: Seq[Int],
      burnin: Long, t: Long)

  def initState(spec: HwSpec): HwState = HwState(
    Double.NaN, Double.NaN, Double.NaN, Double.NaN, 1L, 1L,
    Double.NaN, Double.NaN, Double.NaN, Double.NaN,
    Seq.fill(spec.period)(Double.NaN), Seq.fill(spec.period)(Double.NaN),
    Seq.fill(spec.windowLen)(0), 1L, 0L)

  /** Run the recurrence over one series' grid-aligned PDPs (NaN =
    * unknown). Pure function — the unit-testable core. */
  def run(pdp: Array[Double], spec: HwSpec): HwResult =
    runFrom(pdp, spec, initState(spec))._1

  /** [[run]] resumable from (and returning) explicit state — the
    * streaming micro-batch form. */
  def runFrom(pdp: Array[Double], spec: HwSpec,
      st0: HwState): (HwResult, HwState) = {
    import spec._
    val n = pdp.length
    val out = HwResult(new Array(n), new Array(n), new Array(n),
      new Array(n), new Array(n), new Array(n))

    // hw_functions_t (rrd_hw.c:421-451)
    def predict(ic: Double, sl: Double, nc: Long, sc: Double): Double =
      if (multiplicative) (ic + sl * nc) * sc else ic + sl * nc + sc
    def interceptF(x: Double, sc: Double, ic: Double, sl: Double,
        nc: Long): Double =
      if (multiplicative) {
        if (sc <= 0) Double.NaN
        else alpha * (x / sc) + (1 - alpha) * (ic + sl * nc)
      } else alpha * (x - sc) + (1 - alpha) * (ic + sl * nc)
    def seasonalityF(x: Double, ic: Double, sOld: Double): Double =
      if (multiplicative) {
        if (ic <= 0) Double.NaN
        else gammaSeasonal * (x / ic) + (1 - gammaSeasonal) * sOld
      } else gammaSeasonal * (x - ic) + (1 - gammaSeasonal) * sOld
    def initSeasonality(coef: Double, ic: Double): Double =
      if (multiplicative) { if (ic <= 0) Double.NaN else coef / ic }
      else coef - ic

    // cdp_prep scratch (init_hwpredict_cdp / init_seasonal_cdp,
    // rrd_hw.c:402-419) + the circular arrays (all-DNAN at create,
    // rrd_create.c:1392) — resumed from st0 for micro-batches
    var intercept = st0.intercept; var lastIntercept = st0.lastIntercept
    var slope = st0.slope; var lastSlope = st0.lastSlope
    var nullCount = st0.nullCount; var lastNullCount = st0.lastNullCount
    var shSeasonal = st0.shSeasonal; var shLastSeasonal = st0.shLastSeasonal
    var sdev = st0.sdev; var lastSdev = st0.lastSdev
    val sArr = st0.sArr.toArray
    val dArr = st0.dArr.toArray
    val viol = st0.viol.toArray
    var burnin = st0.burnin // CDP_init_seasonal
    require(sArr.length == period && dArr.length == period &&
      viol.length == windowLen, "state does not match spec")

    val smoothOffset = math.floor(smoothingWindow / 2 * period).toLong
    var i0 = 0
    while (i0 < n) {
      val t = (st0.t + i0).toInt
      val x = pdp(i0)
      // do_schedule_smooth (rrd_update.c:1878-1907): decided before the
      // step's writes, applied after them (deterministic variant).
      val doSmooth =
        if (burnin > 3) t % period == smoothIdx
        else if (t > 0 && t % period == 0) { burnin += 1; true }
        else false

      // lookup_seasonal at offset elapsed+1 = the array slot one full
      // cycle back (rrd_hw.c:25-41, rrd_update.c:2297-2304)
      val sLookup = sArr((t + 1) % period)
      val dLookup = dArr((t + 1) % period)

      // ---- HWPREDICT / MHWPREDICT (update_hwpredict, rrd_hw_update.c:38-117)
      lastIntercept = intercept; lastSlope = slope
      lastNullCount = nullCount
      val seasonalCoef = shSeasonal
      var prediction = Double.NaN
      if (intercept.isNaN || slope.isNaN || seasonalCoef.isNaN) {
        if (intercept.isNaN && !x.isNaN) { // bootstrap (init_slope_intercept)
          intercept = x; lastIntercept = x
          slope = 0.0; lastSlope = 0.0
          nullCount = 1; lastNullCount = 1
        }
      } else {
        prediction = predict(intercept, slope, nullCount, seasonalCoef)
        if (x.isNaN) nullCount += 1
        else {
          val newIntercept =
            interceptF(x, seasonalCoef, intercept, slope, nullCount)
          // hw_calculate_slope reads the just-updated intercept
          slope = beta * (newIntercept - lastIntercept) + (1 - beta) * slope
          intercept = newIntercept
          nullCount = 1
        }
      }
      out.hwpredict(i0) = prediction

      // ---- SEASONAL (update_seasonal, rrd_hw_update.c:119-231;
      // standard layout: HWPREDICT already updated this step)
      val seasonalOld = shSeasonal
      shLastSeasonal = seasonalOld
      shSeasonal = sLookup
      val sNew =
        if (x.isNaN) seasonalOld
        else if (lastIntercept.isNaN || lastSlope.isNaN) Double.NaN
        else if (seasonalOld.isNaN) initSeasonality(x, lastIntercept)
        else seasonalityF(x, intercept, seasonalOld)
      out.seasonal(i0) = sNew
      sArr(t % period) = sNew

      // ---- DEVSEASONAL (update_devseasonal, rrd_hw_update.c:262-368)
      lastSdev = sdev
      sdev = dLookup
      val scD = shLastSeasonal
      val predD = predict(lastIntercept, lastSlope, lastNullCount, scD)
      val dNew =
        if (lastIntercept.isNaN || lastSlope.isNaN || scD.isNaN) Double.NaN
        else if (x.isNaN) lastSdev
        else if (lastSdev.isNaN) math.abs(predD - x)
        else gammaDev * math.abs(predD - x) + (1 - gammaDev) * lastSdev
      out.devseasonal(i0) = dNew
      dArr(t % period) = dNew

      // ---- DEVPREDICT (update_devpredict, rrd_hw_update.c:232-261)
      out.devpredict(i0) = lastSdev

      // ---- FAILURES (update_failures, rrd_hw_update.c:369-475)
      val deviation = lastSdev
      val violation =
        if (deviation.isNaN) 0
        else if (x.isNaN) 1 // DNAN observations count as violations
        else if (x > predD + deltaPos * deviation ||
          x < predD - deltaNeg * deviation) 1
        else 0
      var cnt = violation
      var i = windowLen - 1
      while (i >= 1) { viol(i) = viol(i - 1); cnt += viol(i); i -= 1 }
      viol(0) = violation
      out.failures(i0) = if (cnt >= failThreshold) 1.0 else 0.0
      out.violation(i0) = violation

      if (doSmooth && smoothOffset > 0) {
        val baseline = smooth(sArr, smoothOffset.toInt)
        if (!baseline.isNaN) { // CF_SEASONAL re-centering
          var j = 0
          while (j < period) {
            sArr(j) = initSeasonality(sArr(j), baseline); j += 1
          }
          intercept += baseline
        }
        smooth(dArr, smoothOffset.toInt)
      }
      i0 += 1
    }
    (out, HwState(intercept, lastIntercept, slope, lastSlope,
      nullCount, lastNullCount, shSeasonal, shLastSeasonal, sdev, lastSdev,
      sArr.toSeq, dArr.toSeq, viol.toSeq, burnin, st0.t + n))
  }

  /** apply_smoother (rrd_hw.c:128-330): centered cyclic moving average
    * of width 2·offset+1, in place. No-op (returns NaN) if the array has
    * any NaN. Returns the baseline (mean of the smoothed array) for the
    * caller's SEASONAL re-centering. */
  def smooth(arr: Array[Double], offset: Int): Double = {
    val n = arr.length
    if (arr.exists(_.isNaN)) return Double.NaN
    val src = arr.clone()
    var baseline = 0.0
    var k = 0
    while (k < n) {
      var s = 0.0
      var j = -offset
      while (j <= offset) {
        s += src(java.lang.Math.floorMod(k + j, n)); j += 1
      }
      arr(k) = s / (2 * offset + 1)
      baseline += arr(k)
      k += 1
    }
    baseline / n
  }

  /** State sidecar columns appended after the series key columns. */
  val StateFields: Seq[(String, DataType)] = Seq(
    "last_ts" -> LongType,
    "intercept" -> DoubleType, "last_intercept" -> DoubleType,
    "slope" -> DoubleType, "last_slope" -> DoubleType,
    "null_count" -> LongType, "last_null_count" -> LongType,
    "sh_seasonal" -> DoubleType, "sh_last_seasonal" -> DoubleType,
    "sdev" -> DoubleType, "last_sdev" -> DoubleType,
    "sarr" -> ArrayType(DoubleType), "darr" -> ArrayType(DoubleType),
    "viol" -> ArrayType(IntegerType),
    "burnin" -> LongType, "t" -> LongType)

  def stateSchema(seriesFields: Seq[StructField]): StructType =
    StructType(seriesFields ++
      StateFields.map { case (n, t) => StructField(n, t, nullable = false) })

  private def rowToState(r: Row, off: Int): (Long, HwState) =
    (r.getLong(off), HwState(
      r.getDouble(off + 1), r.getDouble(off + 2),
      r.getDouble(off + 3), r.getDouble(off + 4),
      r.getLong(off + 5), r.getLong(off + 6),
      r.getDouble(off + 7), r.getDouble(off + 8),
      r.getDouble(off + 9), r.getDouble(off + 10),
      r.getSeq[Double](off + 11), r.getSeq[Double](off + 12),
      r.getSeq[Int](off + 13), r.getLong(off + 14), r.getLong(off + 15)))

  private def stateToSeq(lastTs: Long, st: HwState): Seq[Any] = Seq(
    lastTs, st.intercept, st.lastIntercept, st.slope, st.lastSlope,
    st.nullCount, st.lastNullCount, st.shSeasonal, st.shLastSeasonal,
    st.sdev, st.lastSdev, st.sArr, st.dArr, st.viol, st.burnin, st.t)

  /** Resumable micro-batch form: run the recurrence over a grid-aligned
    * PDP frame CONTINUING from per-series `prior` states, returning
    * (new family rows, updated states). Rows at or before a series'
    * `last_ts` are skipped (already materialized by earlier batches —
    * makes replays idempotent); a series absent from the batch keeps its
    * prior state. Slots must be contiguous at `stepSec` past `last_ts`.
    * One shuffle on the series key per pass; the recurrence itself is
    * the same [[runFrom]] loop batch ingest and full [[apply]] share,
    * so streamed output is bit-identical to a one-shot run. */
  def applyResumable(df: DataFrame, series: Seq[String], ts: String,
      value: String, spec: HwSpec, prior: DataFrame,
      stepSec: Long): (DataFrame, DataFrame) = {
    val inSchema = df.schema
    val tsIdx = inSchema.fieldIndex(ts)
    val vIdx = inSchema.fieldIndex(value)
    val sIdx = series.map(inSchema.fieldIndex)
    val stSchema = stateSchema(series.map(inSchema(_)))
    require(prior.schema.length == stSchema.length,
      s"prior state schema mismatch: ${prior.schema} vs $stSchema")
    val outSchema = StructType(
      series.map(inSchema(_)) :+
        StructField(ts, LongType, nullable = false) :+
        StructField(value, DoubleType) :+
        StructField("hwpredict", DoubleType) :+
        StructField("seasonal", DoubleType) :+
        StructField("devseasonal", DoubleType) :+
        StructField("devpredict", DoubleType) :+
        StructField("failures", DoubleType) :+
        StructField("violation", IntegerType, nullable = false))

    def keyOf(idx: Seq[Int])(r: Row): String =
      idx.map { i =>
        val s = String.valueOf(r.get(i)); s"${s.length}:$s"
      }.mkString
    def grouped(d: DataFrame, idx: Seq[Int]) =
      d.groupByKey(keyOf(idx))(Encoders.STRING)

    // the replay shared by both passes: (kept slots, result, final state)
    def replay(rows: Iterator[Row], states: Iterator[Row]):
        (Array[Row], HwResult, Long, HwState) = {
      val (lastTs0, st0) = states.nextOption()
        .map(rowToState(_, series.length))
        .getOrElse((Long.MinValue, initState(spec)))
      val sorted = rows.toArray.filter(_.getLong(tsIdx) > lastTs0)
        .sortBy(_.getLong(tsIdx))
      sorted.indices.drop(1).foreach { i =>
        require(sorted(i).getLong(tsIdx) - sorted(i - 1).getLong(tsIdx)
          == stepSec, "HW input slots must be contiguous")
      }
      if (sorted.nonEmpty && lastTs0 != Long.MinValue)
        require(sorted.head.getLong(tsIdx) == lastTs0 + stepSec,
          s"HW batch starts at ${sorted.head.getLong(tsIdx)}, " +
            s"state ends at $lastTs0")
      val pdp = sorted.map(r =>
        if (r.isNullAt(vIdx)) Double.NaN else r.getDouble(vIdx))
      val (res, st1) = runFrom(pdp, spec, st0)
      val lastTs1 = if (sorted.isEmpty) lastTs0
        else sorted.last.getLong(tsIdx)
      (sorted, res, lastTs1, st1)
    }

    val rows = grouped(df, sIdx).cogroup(grouped(prior, series.indices)) {
      (_: String, rs: Iterator[Row], ss: Iterator[Row]) =>
        val buffered = rs.toArray
        if (buffered.isEmpty) Iterator.empty
        else {
          val (sorted, res, _, _) = replay(buffered.iterator, ss)
          def v(a: Array[Double], i: Int): Any =
            if (a(i).isNaN) null else java.lang.Double.valueOf(a(i))
          val pdp = sorted.map(r =>
            if (r.isNullAt(vIdx)) Double.NaN else r.getDouble(vIdx))
          sorted.indices.iterator.map { i =>
            Row.fromSeq(sIdx.map(sorted(i).get) ++
              Seq(sorted(i).getLong(tsIdx), v(pdp, i),
                v(res.hwpredict, i), v(res.seasonal, i),
                v(res.devseasonal, i), v(res.devpredict, i),
                v(res.failures, i), res.violation(i)))
          }
        }
    }(Encoders.row(outSchema)).toDF(outSchema.fieldNames.toIndexedSeq: _*)

    val states = grouped(df, sIdx).cogroup(grouped(prior, series.indices)) {
      (_: String, rs: Iterator[Row], ss: Iterator[Row]) =>
        val buffered = rs.toArray
        val stored = ss.toArray
        if (buffered.isEmpty) stored.iterator // untouched series persist
        else {
          val (sorted, _, lastTs1, st1) = replay(buffered.iterator,
            stored.iterator)
          val keyVals =
            if (sorted.nonEmpty) sIdx.map(sorted.head.get)
            else series.indices.map(stored.head.get)
          Iterator.single(Row.fromSeq(keyVals ++ stateToSeq(lastTs1, st1)))
        }
    }(Encoders.row(stSchema)).toDF(stSchema.fieldNames.toIndexedSeq: _*)

    (rows, states)
  }

  /** DataFrame form: append the five family columns (+ `violation`) to a
    * grid-aligned PDP frame with series key columns, slot column `ts`
    * (epoch sec, one row per step) and `value` (null = unknown).
    */
  def apply(df: DataFrame, series: Seq[String], ts: String, value: String,
      spec: HwSpec): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      series.map(inSchema(_)) :+
        StructField(ts, LongType, nullable = false) :+
        StructField(value, DoubleType) :+
        StructField("hwpredict", DoubleType) :+
        StructField("seasonal", DoubleType) :+
        StructField("devseasonal", DoubleType) :+
        StructField("devpredict", DoubleType) :+
        StructField("failures", DoubleType) :+
        StructField("violation", IntegerType, nullable = false))
    val tsIdx = inSchema.fieldIndex(ts)
    val vIdx = inSchema.fieldIndex(value)
    val sIdx = series.map(inSchema.fieldIndex)

    df.groupByKey { (r: Row) =>
        sIdx.map { i =>
          val s = String.valueOf(r.get(i)); s"${s.length}:$s"
        }.mkString
      }(Encoders.STRING)
      .flatMapGroups { (_: String, rows: Iterator[Row]) =>
        val sorted = rows.toArray.sortBy(_.getLong(tsIdx))
        val pdp = sorted.map(r =>
          if (r.isNullAt(vIdx)) Double.NaN else r.getDouble(vIdx))
        val res = run(pdp, spec)
        def v(a: Array[Double], i: Int): Any =
          if (a(i).isNaN) null else java.lang.Double.valueOf(a(i))
        sorted.indices.iterator.map { i =>
          val keyVals = sIdx.map(sorted(i).get)
          Row.fromSeq(keyVals ++ Seq(sorted(i).getLong(tsIdx), v(pdp, i),
            v(res.hwpredict, i), v(res.seasonal, i), v(res.devseasonal, i),
            v(res.devpredict, i), v(res.failures, i), res.violation(i)))
        }
      }(Encoders.row(outSchema))
      .toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
