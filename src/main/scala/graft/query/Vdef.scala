package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** VDEF aggregates: series → scalar (+timestamp) (SURVEY.md §2.5;
  * /root/reference/src/rrd_graph.c:5863-6119). All twelve ops.
  *
  * Input convention: a grid-aligned series frame — one row per slot,
  * end-labeled `ts` (epoch sec), nullable `v`. `steps` = total slot count
  * (nulls included), matching the reference's `(end-start)/step`.
  *
  * Determinism: sums route through DECIMAL(28,10) (exact for ≤2-decimal
  * inputs, and x·v / v² products of such inputs), so every scalar is a
  * fixed IEEE formula over exact sums — bit-reproducible across engines.
  * One shuffle per series; everything is partial-aggregated map-side.
  */
object Vdef {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast("double")

  /** AVERAGE / TOTAL / STDEV(population) / LSLSLOPE / LSLINT / LSLCORREL
    * as aggregate expressions (use inside a groupBy(series).agg(...)).
    * The timestamp-carrying ops (MAXIMUM/MINIMUM/FIRST/LAST) need a
    * window pass — see SparkEntry q06.
    */
  def average(v: Column): Column = dsum(v) / count(v)
  def total(v: Column, stepSec: Long): Column = dsum(v) * stepSec
  /** Population stddev via exact moments (ref does a two-pass Σ(x-avg)²;
    * same value, deterministic formula — rrd_graph.c:5987-5997). */
  def stdev(v: Column): Column = {
    val c = count(v).cast("double")
    val m1 = dsum(v) / c
    when(count(v) === 0, lit(null))
      .otherwise(sqrt(dsum(v * v) / c - m1 * m1))
  }

  /** Least-squares family over (slot index, value), NaN rows skipped but
    * keeping their x (rrd_graph.c:6065-6115). `x` must be the 0-based
    * slot index column. */
  def lslExprs(x: Column, v: Column): Map[String, Column] = {
    val known = v.isNotNull
    val cnt = count(v).cast("double")
    val sx = sum(when(known, x)).cast("double")
    val sxx = sum(when(known, x * x)).cast("double")
    val sy = dsum(v)
    val syy = dsum(v * v)
    val sxy = dsum(when(known, x.cast("double") * v))
    val slope = (sx * sy - cnt * sxy) / (sx * sx - cnt * sxx)
    val intercept = (sy - slope * sx) / cnt
    val correl = (sxy - (sx * sy) / cnt) /
      sqrt((sxx - (sx * sx) / cnt) * (syy - (sy * sy) / cnt))
    Map("lslslope" -> slope, "lslint" -> intercept, "lslcorrel" -> correl)
  }

  /** Buffer of the exact-percentile aggregate: total slots seen (nulls
    * included) + the known values in a PRIMITIVE growable array (first
    * `n` slots of `arr` are live; doubling growth). Known values
    * dominate the footprint at 8 bytes each — a boxed Vector[Double]
    * would cost ~4-10× that and make the maxSlots bound toothless —
    * and [[PercentAggregator]] enforces `total <= maxSlots`, so memory
    * is STRUCTURALLY bounded by the fetch window: a keyed 100 TB plan
    * cannot silently collect a corpus-sized group (the prior
    * `collect_list` form bounded memory only by the caller's contract).
    */
  final case class PctBuf(total: Long, n: Int, arr: Array[Double])

  /** Exact RRD percentile as a bounded typed aggregate (SURVEY §4 item
    * 3). `popIncludesUnknown = true` is PERCENT — unknown slots are in
    * the population and sort below every known value, so a rank that
    * falls inside the unknown prefix yields unknown; `false` is
    * PERCENTNAN (known-only population). Selection is the reference's
    * 0-based `round(p·(n-1)/100)` into the sorted series
    * (rrd_graph.c:5882-5939); known values sort by
    * `java.lang.Double.compare` (NaN greatest) exactly like the
    * previous `array_sort` form, so results are bit-identical
    * (spec-pinned). Partial aggregation works map-side; the buffer
    * rides the shuffle as (long, double[]).
    */
  final class PercentAggregator(p: Double, popIncludesUnknown: Boolean,
      maxSlots: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Double, PctBuf, java.lang.Double] {
    require(maxSlots > 0, s"maxSlots must be positive (got $maxSlots)")
    private def grown(arr: Array[Double], need: Int): Array[Double] =
      if (need <= arr.length) arr
      else java.util.Arrays.copyOf(arr,
        math.max(need, math.max(8, arr.length * 2)))
    def zero: PctBuf = PctBuf(0L, 0, Array.emptyDoubleArray)
    def reduce(b: PctBuf, in: java.lang.Double): PctBuf = {
      require(b.total < maxSlots,
        s"PERCENT window exceeded maxSlots=$maxSlots slots — this " +
          "aggregate is for fetch-window frames, not corpus groups")
      if (in == null) PctBuf(b.total + 1, b.n, b.arr)
      else {
        val a = grown(b.arr, b.n + 1)
        a(b.n) = in.doubleValue
        PctBuf(b.total + 1, b.n + 1, a)
      }
    }
    def merge(a: PctBuf, b: PctBuf): PctBuf = {
      require(a.total + b.total <= maxSlots,
        s"PERCENT window exceeded maxSlots=$maxSlots slots")
      val m = grown(a.arr, a.n + b.n)
      System.arraycopy(b.arr, 0, m, a.n, b.n)
      PctBuf(a.total + b.total, a.n + b.n, m)
    }
    def finish(b: PctBuf): java.lang.Double = {
      val arr = java.util.Arrays.copyOf(b.arr, b.n)
      java.util.Arrays.sort(arr) // Double.compare order, like array_sort
      if (popIncludesUnknown) {
        val field = math.round(p * (b.total - 1) / 100.0)
        val nulls = b.total - arr.length
        if (field < nulls) null else arr((field - nulls).toInt)
      } else {
        if (arr.isEmpty) null
        else arr(math.round(p * (arr.length - 1) / 100.0).toInt)
      }
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[PctBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[java.lang.Double] =
      org.apache.spark.sql.Encoders.DOUBLE
  }

  /** Largest window the percentile aggregates accept: a year of 1-second
    * slots (≈254 MB of primitive doubles per group at the limit — the
    * loud ceiling, not a working size). Fetch frames are orders of
    * magnitude smaller; tighten per call for adversarial inputs. */
  val MaxPercentSlots: Int = 366 * 24 * 3600

  /** PERCENT (unknowns in population, sorting lowest) and PERCENTNAN
    * (known-only): 0-based index round(p·(n-1)/100) into the sorted
    * series (rrd_graph.c:5882-5939), as aggregate Columns for
    * `groupBy(...).agg(...)`. Memory per group is bounded by `maxSlots`
    * (loud failure beyond it), not by group cardinality. */
  def percent(v: Column, p: Double,
      maxSlots: Int = MaxPercentSlots): Column =
    udaf(new PercentAggregator(p, popIncludesUnknown = true, maxSlots),
      org.apache.spark.sql.Encoders.DOUBLE)(v)
  def percentNan(v: Column, p: Double,
      maxSlots: Int = MaxPercentSlots): Column =
    udaf(new PercentAggregator(p, popIncludesUnknown = false, maxSlots),
      org.apache.spark.sql.Encoders.DOUBLE)(v)
}
