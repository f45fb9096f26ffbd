package graft.streaming

import graft.ingest.Consolidate
import graft.model.Cf
import org.apache.spark.sql.DataFrame
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
}
