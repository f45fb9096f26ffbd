package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming exact deduplication — exactly-once ingest over an
  * at-least-once source. A redelivering source (Kafka with producer
  * retries, a flaky file mover, rrdcached clients resending after a
  * timeout — the reference's daemon journal replays whole batches on
  * crash recovery, /root/reference/src/rrd_daemon.c:304-329) hands the
  * pipeline the same rows more than once; the streaming dedup keeps the
  * FIRST arrival of each key and drops every redelivery, so everything
  * downstream (rates, consolidation, training-data curation) sees each
  * record exactly once.
  *
  * Spark-first shape: this is the BUILT-IN stateful
  * `Dataset.dropDuplicates(keys)` streaming operator — no custom state
  * code — which keeps one state-store row per distinct key, shuffled on
  * the key. State therefore grows ∝ distinct keys ingested (unbounded
  * by design here: an ingest-id dedup must remember every id it ever
  * accepted; a deployment bounding redelivery lag would use
  * `dropDuplicatesWithinWatermark` to evict keys older than the
  * watermark). ScaleBench measures exactly that growth via
  * [[StreamRun.StateMetrics]].
  */
object StreamingDedup {

  /** Run the built-in streaming dedup as a REAL micro-batch query:
    * `input` lands as batch 1 (first delivery), `redelivered` as batch
    * 2 (the at-least-once replay — any subset of batch 1, possibly with
    * genuinely new rows mixed in). Returns the exactly-once stream as a
    * batch frame plus the run's state footprint (rows == distinct keys
    * seen).
    */
  def dedupFileRun(spark: SparkSession, input: DataFrame,
      redelivered: DataFrame, keys: Seq[String])
      : (DataFrame, Option[StreamRun.StateMetrics]) =
    StreamRun.run(spark, input, src => src.dropDuplicates(keys),
      Seq(redelivered))

  /** The BOUNDED-state variant: `dropDuplicatesWithinWatermark` over an
    * event-time column — state for a key is evicted once the watermark
    * passes its event time + `delay`, so state holds only keys within
    * the redelivery lag instead of every key ever ingested. The trade
    * is explicit and spec-pinned: a redelivery arriving AFTER its key's
    * state evicted is re-admitted as a duplicate. This is the shape a
    * deployment with a bounded at-least-once window runs; [[dedupFileRun]]
    * is the exact form when redelivery lag is unbounded.
    */
  def dedupWithinWatermarkFileRun(spark: SparkSession, input: DataFrame,
      redelivered: DataFrame, keys: Seq[String], eventTime: String,
      delay: String): (DataFrame, Option[StreamRun.StateMetrics]) =
    StreamRun.run(spark, input,
      src => src.withWatermark(eventTime, delay)
        .dropDuplicatesWithinWatermark(keys),
      Seq(redelivered))
}
