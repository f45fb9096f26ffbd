package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  */
object StreamingIngest {

  /** One incoming sample; `series` is the file identity. */
  final case class Sample(series: String, tsUs: Long, value: Double)

  /** Per-series ingest state: the last accepted timestamp. */
  final case class LastUp(tsUs: Long)

  /** The monotonicity gate. Within a micro-batch, samples are processed
    * in timestamp order (the reference processes update args in command
    * order; a batch with internal disorder keeps the earliest-first
    * subsequence, matching a client that sends sorted updates).
    */
  def monotonicGate(ds: Dataset[Sample]): Dataset[Sample] = {
    implicit val sampleEnc = Encoders.product[Sample]
    implicit val stateEnc = Encoders.product[LastUp]
    ds.groupByKey(_.series)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Sample], state: GroupState[LastUp]) =>
          var last = state.getOption.map(_.tsUs).getOrElse(Long.MinValue)
          val accepted = rows.toSeq.sortBy(_.tsUs).filter { s =>
            val ok = s.tsUs > last
            if (ok) last = s.tsUs
            ok
          }
          if (accepted.nonEmpty) state.update(LastUp(last))
          accepted.iterator
      }
  }
}
