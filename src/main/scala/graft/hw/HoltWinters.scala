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
object HoltWinters {

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

  /** Run the recurrence over one series' grid-aligned PDPs (NaN =
    * unknown). Pure function — the unit-testable core. */
  def run(pdp: Array[Double], spec: HwSpec): HwResult = {
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
    // rrd_create.c:1392)
    var intercept, lastIntercept, slope, lastSlope = Double.NaN
    var nullCount, lastNullCount = 1L
    var shSeasonal, shLastSeasonal = Double.NaN
    var sdev, lastSdev = Double.NaN
    val sArr = Array.fill(period)(Double.NaN)
    val dArr = Array.fill(period)(Double.NaN)
    val viol = new Array[Int](windowLen)
    var burnin = 1L // CDP_init_seasonal

    val smoothOffset = math.floor(smoothingWindow / 2 * period).toLong
    var t = 0
    while (t < n) {
      val x = pdp(t)
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
      out.hwpredict(t) = prediction

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
      out.seasonal(t) = sNew
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
      out.devseasonal(t) = dNew
      dArr(t % period) = dNew

      // ---- DEVPREDICT (update_devpredict, rrd_hw_update.c:232-261)
      out.devpredict(t) = lastSdev

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
      out.failures(t) = if (cnt >= failThreshold) 1.0 else 0.0
      out.violation(t) = violation

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
      t += 1
    }
    out
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
