package graft.streaming

import graft.ingest.Consolidate
import graft.model.Cf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming CDP consolidation: the PDP→CDP step
  * (SURVEY.md §2.2, /root/reference/src/rrd_update.c:2006-2141) as an
  * event-time windowed aggregation with a watermark.
  *
  * The reference closes a CDP exactly when a sample crosses the step
  * boundary; in Spark terms that is append-mode emission when the
  * watermark passes the window end. `latenessSec` plays the heartbeat's
  * role on the consolidation axis: samples arriving later than the
  * watermark are dropped, never re-opening a closed CDP (the reference
  * cannot re-open one either — its CDP scratch area has already rolled
  * over, rrd_update.c:1049-1060).
  *
  * Scale shape: identical to the batch consolidator — partial
  * (map-side) aggregation per micro-batch, one shuffle keyed on
  * (series, window), state-store rows per OPEN window only (closed
  * windows are evicted at watermark), so state scales with
  * series-cardinality × lateness/cdpStep, not with event volume.
  *
  * Semantics parity with [[Consolidate.cdp]] (spec-pinned): buckets are
  * END-labeled and end-inclusive — the reference's `(ts-1) div step + 1`
  * convention — while Spark windows are [start, end), so event time is
  * shifted by 1 µs before windowing; the CF aggregates and the strict
  * xff rule (`unknown > pdp_cnt·xff` → unknown CDP) are the exact
  * column expressions of the batch operator.
  */
object StreamingConsolidate {

  /** Windowed CDP over a streaming frame of end-labeled PDPs.
    *
    * @param samples streaming frame; `tsUsCol` epoch-µs PDP end label,
    *   `valueCol` nullable PDP value (null = unknown PDP)
    * @param latenessSec how far out-of-order event time may arrive
    *   before a sample is dropped (watermark delay)
    * @return streaming frame of series + `cdp_ts` (end-labeled epoch
    *   sec) + `cdp` (null = unknown by xff) + `known_cnt`, append-mode
    *   emitted once the watermark passes each window
    */
  def cdpStream(samples: DataFrame, series: Seq[String], tsUsCol: String,
      valueCol: String, stepSec: Long, pdpCnt: Long, cf: Cf, xff: Double,
      latenessSec: Long): DataFrame = {
    val cdpStep = stepSec * pdpCnt
    // (start, end]-aligned: a PDP labeled exactly at a boundary belongs
    // to the bucket ENDING there, so shift 1 µs before the [start, end)
    // window; the label column is derived from the window end.
    // Domain: positive timestamps only, like the reference ("illegal
    // attempt to update using time 0" — update times must advance past
    // a positive last_up). Batch cdp's end-label expression and the
    // shifted window disagree below epoch 0 (div truncates toward zero),
    // so nonpositive labels are dropped here rather than emitted with
    // either convention.
    val evt = samples
      .where(col(tsUsCol) > 0)
      .withColumn("__evt", timestamp_micros(col(tsUsCol) - 1))
      .withWatermark("__evt", s"$latenessSec seconds")
    evt
      .groupBy(series.map(col) :+
        window(col("__evt"), s"$cdpStep seconds").as("__w"): _*)
      .agg(
        Consolidate.cfAgg(cf, col(valueCol), col(tsUsCol)).as("cf_val"),
        count(col(valueCol)).as("known_cnt"))
      .select(series.map(col) :+
        expr("unix_micros(__w.end) div 1000000").as("cdp_ts") :+
        when(lit(pdpCnt) - col("known_cnt") > lit(xff * pdpCnt), lit(null))
          .otherwise(col("cf_val")).as("cdp") :+
        col("known_cnt"): _*)
  }

  /** Execute [[cdpStream]] as a REAL micro-batch streaming query —
    * file source → stateful windowed aggregation → parquet sink — and
    * return the emitted CDP rows as a batch frame.
    *
    * This is the production shape end-to-end: the input lands as
    * parquet files in a monitored directory, Structured Streaming
    * ingests them as micro-batches, windows close when the watermark
    * passes their end, and closed CDPs append to a parquet sink (never
    * the driver — no memory sink, no collect; state and output both
    * scale with open windows × series, not event volume).
    *
    * Watermark mechanics force the batch cadence: the watermark used by
    * micro-batch N is computed from data seen through batch N−1, so
    * after the input batch the `advance` frame (a sentinel past every
    * real window, e.g. series=-1 far in the future) is appended TWICE —
    * once to raise the watermark, once more to run the batch that
    * evicts/emits the now-closed windows. The sentinel's own window
    * never closes, so it is absent from the output (callers typically
    * still filter it defensively).
    *
    * @param input  batch frame of end-labeled PDPs: exactly
    *   `series + tsUsCol + valueCol` columns
    * @param advance single-row sentinel frame, same schema, event time
    *   beyond `max(input ts) + latenessSec + cdpStep`
    * @return batch frame over the sink's parquet output: series +
    *   `cdp_ts` + `cdp` + `known_cnt` (unordered — caller sorts)
    */
  def cdpStreamFileRun(spark: SparkSession, input: DataFrame,
      advance: DataFrame, series: Seq[String], tsUsCol: String,
      valueCol: String, stepSec: Long, pdpCnt: Long, cf: Cf, xff: Double,
      latenessSec: Long): DataFrame =
    cdpStreamFileRunWithState(spark, input, advance, series, tsUsCol,
      valueCol, stepSec, pdpCnt, cf, xff, latenessSec)._1

  /** [[cdpStreamFileRun]] plus the run's state-store footprint (the
    * ScaleBench path — state growth IS the scale question here). */
  def cdpStreamFileRunWithState(spark: SparkSession, input: DataFrame,
      advance: DataFrame, series: Seq[String], tsUsCol: String,
      valueCol: String, stepSec: Long, pdpCnt: Long, cf: Cf, xff: Double,
      latenessSec: Long): (DataFrame, Option[StreamRun.StateMetrics]) = {
    val cols = series.map(col) :+ col(tsUsCol) :+ col(valueCol)
    // the sentinel appends TWICE: batch 2 raises the watermark, batch 3
    // evicts + emits the windows that watermark closed
    StreamRun.run(spark, input.select(cols: _*),
      src => cdpStream(src, series, tsUsCol, valueCol, stepSec, pdpCnt,
        cf, xff, latenessSec),
      Seq(advance.select(cols: _*), advance.select(cols: _*)))
  }

  /** [[cdpStreamFileRunWithState]] under `Trigger.AvailableNow` — the
    * scheduled-drain shape: input AND sentinel land before the query
    * starts, one data batch ingests everything, the no-data batch the
    * trigger still runs lets the advanced watermark evict/emit, and the
    * query terminates on its own. Output is spec-pinned identical to
    * the per-append cadence; the wall-clock delta between the two forms
    * is pure trigger/commit machinery (SCALE.md, q72_available_now). */
  def cdpStreamAvailableNowRunWithState(spark: SparkSession,
      input: DataFrame, advance: DataFrame, series: Seq[String],
      tsUsCol: String, valueCol: String, stepSec: Long, pdpCnt: Long,
      cf: Cf, xff: Double, latenessSec: Long)
      : (DataFrame, Option[StreamRun.StateMetrics]) = {
    val cols = series.map(col) :+ col(tsUsCol) :+ col(valueCol)
    StreamRun.runAvailableNow(spark, input.select(cols: _*),
      src => cdpStream(src, series, tsUsCol, valueCol, stepSec, pdpCnt,
        cf, xff, latenessSec),
      Seq(advance.select(cols: _*)))
  }
}
