package graft.streaming

import graft.ingest.UpdateParser
import graft.store.RrdStore
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming front end of the ingest path (SURVEY.md §2.2,
  * §3.1): the reference's strictly-ordered single-writer update gate —
  * `t <= last_up` is REJECTED, not buffered
  * (/root/reference/src/rrd_update.c:1416-1423; in Spark terms watermark
  * = last_up with allowedLateness = 0).
  *
  * `flatMapGroupsWithState` keeps one tiny state record per series (the
  * reference's `live_head.last_up`), so the operator scales with series
  * cardinality, not event volume: one shuffle on the series key per
  * micro-batch, state store lookups are O(1) per series. Accepted rows
  * stream onward to the batch pipeline (Rates → Normalize → Consolidate
  * → RrdStore append); rejected rows are dropped exactly like the
  * reference's "illegal attempt to update using time X when last update
  * time is Y" error path.
  *
  * [[runUpdates]] is the end-to-end wiring: protocol lines → parse →
  * gate → per-micro-batch [[RrdStore.appendBatch]]. rrdcached's
  * write-behind journal becomes the streaming checkpoint; its flush
  * cadence becomes the trigger interval. At cluster scale the same
  * query runs against a Kafka-like source instead of files/sockets —
  * nothing below the `lines` dataset changes.
  */
object StreamingIngest {

  /** Write-side counters for the daemon's STATS surface
    * (doc/rrdcached.pod:652-672; counters rrd_daemon.c:304-305).
    * `foreachBatch` runs on the driver, so plain atomics suffice. */
  final class IngestStats {
    val updatesWritten = new java.util.concurrent.atomic.AtomicLong
    val dataSetsWritten = new java.util.concurrent.atomic.AtomicLong
    val journalRotate = new java.util.concurrent.atomic.AtomicLong
  }

  /** One incoming sample; `series` is the file identity. */
  final case class Sample(series: String, tsUs: Long, value: Double)

  /** One parsed UPDATE row: all DS readings of one file at one instant
    * (`Double.NaN` = unknown — encoders for `Seq[Option[Double]]` are
    * clumsy; the batch sink converts NaN back to null). */
  final case class WideSample(series: String, tsUs: Long,
      values: Seq[Double])

  /** Per-series ingest state: the last accepted timestamp. */
  final case class LastUp(tsUs: Long)

  /** The monotonicity gate, generic over the row type. Within a
    * micro-batch, rows are processed in timestamp order (the reference
    * processes update args in command order; a batch with internal
    * disorder keeps the earliest-first subsequence, matching a client
    * that sends sorted updates).
    */
  def gate[T](ds: Dataset[T], maxInstances: Int = 1 << 22)(
      key: T => String, ts: T => Long)(
      implicit enc: Encoder[T]): Dataset[T] = {
    require(maxInstances >= 1, s"maxInstances=$maxInstances must be >= 1")
    implicit val stateEnc: Encoder[LastUp] = Encoders.product[LastUp]
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[T], state: GroupState[LastUp]) =>
          var last = state.getOption.map(_.tsUs).getOrElse(Long.MinValue)
          // timestamp-order semantics force the group to buffer before
          // any verdict, so the buffer carries the StreamingCdcDedup
          // loud ceiling: one series receiving a whole huge micro-batch
          // fails with a diagnosis instead of OOMing an executor
          val buf = new scala.collection.mutable.ArrayBuffer[T]
          while (rows.hasNext) {
            buf += rows.next()
            require(buf.length <= maxInstances,
              s"streaming monotonic gate exceeded maxInstances=" +
                s"$maxInstances buffered rows for series '$k' in one " +
                "micro-batch — cap the arriving batch or shrink the " +
                "trigger interval")
          }
          val accepted = buf.sortBy(ts).filter { s =>
            val ok = ts(s) > last
            if (ok) last = ts(s)
            ok
          }
          if (accepted.nonEmpty) state.update(LastUp(last))
          accepted.iterator
      }
  }

  def monotonicGate(ds: Dataset[Sample]): Dataset[Sample] = {
    implicit val enc: Encoder[Sample] = Encoders.product[Sample]
    gate(ds)(_.series, _.tsUs)
  }

  /** One gated row for [[gateFileRun]]: series key, event time, a
    * deterministic tiebreak id, and the sampled value. */
  final case class GateRow(k: String, tsUs: Long, eventId: Long,
      value: Double)

  /** Execute [[gate]] as a REAL micro-batch streaming query — file
    * source → `flatMapGroupsWithState` monotonic gate → parquet sink —
    * and return the ACCEPTED rows as a batch frame (q72's
    * `cdpStreamFileRun` pattern; same production shape, nothing
    * touches the driver).
    *
    * `input` lands as micro-batch 1; `late` as micro-batch 2 — by then
    * every series' state holds its batch-1 `last_up`, so a late row is
    * accepted only if its event time still advances past it (the
    * reference's "illegal attempt to update using time X when last
    * update time is Y", rrd_update.c:1416-1423). Columns: exactly
    * [[GateRow]]'s.
    */
  def gateFileRun(spark: SparkSession, input: Dataset[GateRow],
      late: Dataset[GateRow]): Dataset[GateRow] =
    gateFileRunWithState(spark, input, late)._1

  /** [[gateFileRun]] plus the run's state-store footprint (the
    * ScaleBench path: per-series `last_up` state should grow ∝ series). */
  def gateFileRunWithState(spark: SparkSession, input: Dataset[GateRow],
      late: Dataset[GateRow])
      : (Dataset[GateRow], Option[StreamRun.StateMetrics]) = {
    implicit val enc: Encoder[GateRow] = Encoders.product[GateRow]
    // batch 1 seeds per-series last_up state; the late batch then faces
    // it (the shared scaffolding owns dirs/cadence/cleanup)
    val (out, st) = StreamRun.run(spark, input.toDF(),
      src => gate(src.as[GateRow])(_.k, _.tsUs).toDF(),
      Seq(late.toDF()))
    (out.as[GateRow], st)
  }

  /** Wire a stream of rrdcached protocol lines into a store: UPDATE
    * lines parse against the store's schema, pass the per-file
    * monotonic gate, and each micro-batch merges into the RRA tables
    * via [[RrdStore.appendBatch]]. Malformed lines and non-UPDATE
    * verbs are dropped (the daemon's error reply has no stream
    * backchannel); the per-series key is the store path, exactly the
    * reference's per-file `last_up` gate.
    *
    * One query serves one store (the schema binds at start, like the
    * daemon's per-file tree node); `pathFilter` selects this store's
    * lines when the stream multiplexes several.
    */
  def runUpdates(spark: SparkSession, lines: Dataset[String],
      storePath: String, checkpoint: String,
      pathFilter: Option[String] = None,
      nowSec: Long = 0L,
      stats: Option[IngestStats] = None): StreamingQuery = {
    val schema = RrdStore.readSchema(storePath)
    val dsNames = schema.ds.map(_.name)
    implicit val wsEnc: Encoder[WideSample] = Encoders.product[WideSample]
    val samples = lines.flatMap { line =>
      scala.util.Try {
        val cmd = LineProtocol.parse(line)
        if (cmd.verb == "UPDATE" && pathFilter.forall(_ == cmd.path))
          cmd.args.map { arg =>
            val u = UpdateParser.parse(arg, schema, nowSec = nowSec)
            WideSample(cmd.path, u.tsUs,
              dsNames.map(d => u.values(d).getOrElse(Double.NaN)))
          }
        else Seq.empty[WideSample]
      }.getOrElse(Seq.empty[WideSample])
    }
    gate(samples)(_.series, _.tsUs)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[WideSample], _: Long) =>
        val n = batch.count()
        if (n > 0) {
          val wide = dsNames.zipWithIndex.foldLeft(
            batch.toDF("k", "ts_us", "__vs")) { case (df, (ds, i)) =>
            df.withColumn(ds,
              when(isnan(element_at(col("__vs"), i + 1)), lit(null))
                .otherwise(element_at(col("__vs"), i + 1)))
          }.drop("__vs")
          RrdStore.appendBatch(spark, storePath, wide, Seq("k"),
            "ts_us", "ts_us", dsNames.map(d => d -> d).toMap)
          stats.foreach { s =>
            s.updatesWritten.addAndGet(n)
            s.dataSetsWritten.addAndGet(n * dsNames.length)
            // each committed micro-batch supersedes its journal slice —
            // the checkpoint analog of rrdcached's journal rotation
            s.journalRotate.incrementAndGet()
          }
        }
      }
      .start()
  }
}
