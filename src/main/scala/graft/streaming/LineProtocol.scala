package graft.streaming

import graft.ingest.UpdateParser
import graft.model.RrdSchema

/** The rrdcached wire commands that carry data (SURVEY.md §2.1 item 5;
  * /root/reference/src/rrd_daemon.c:2968-3141 command table): `UPDATE
  * <path> <time:v1:v2…>…` (and the `BATCH`/`.` framing) feed ingestion;
  * the read commands (FETCH/INFO/FIRST/LAST/…) map onto the query
  * surface (RrdStore.fetch / Dump.info / …) and carry no data.
  *
  * In the Spark engine the daemon's socket loop is a Structured
  * Streaming source (socket/Kafka); this parser turns its UPDATE lines
  * into [[StreamingIngest.Sample]] rows ahead of the monotonic gate —
  * the write-behind/journal role of rrdcached is played by streaming
  * checkpoints (SURVEY §4).
  */
object LineProtocol {

  final case class Command(verb: String, path: String, args: Seq[String])

  def parse(line: String): Command = {
    val parts = line.trim.split("\\s+").toIndexedSeq
    require(parts.nonEmpty && parts.head.nonEmpty, "empty command")
    val verb = parts.head.toUpperCase
    verb match {
      case "UPDATE" | "FETCH" | "FETCHBIN" | "CREATE" | "TUNE" | "INFO" |
          "FIRST" | "LAST" | "FLUSH" | "PENDING" | "FORGET" |
          "SUSPEND" | "RESUME" | "WROTE" | "DUMP" =>
        require(parts.length >= 2, s"$verb needs a path")
        Command(verb, parts(1), parts.drop(2))
      case "LIST" => // path optional: LIST [RECURSIVE] [/subdir]
        Command(verb, parts.lift(1).getOrElse("/"), parts.drop(2))
      case "BATCH" | "." | "QUIT" | "STATS" | "HELP" | "QUEUE" |
          "SUSPENDALL" | "RESUMEALL" | "FLUSHALL" | "PING" =>
        Command(verb, "", parts.tail)
      case other => throw new IllegalArgumentException(
        s"unknown command '$other'")
    }
  }

  /** Expand an UPDATE command into ingest samples: one per DS reading
    * with a non-unknown value, series key = store path + DS name. */
  def updateSamples(cmd: Command, schema: RrdSchema,
      nowSec: Long = 0L): Seq[StreamingIngest.Sample] = {
    require(cmd.verb == "UPDATE", s"not an UPDATE: ${cmd.verb}")
    cmd.args.flatMap { arg =>
      val u = UpdateParser.parse(arg, schema, nowSec = nowSec)
      u.values.toSeq.collect { case (ds, Some(v)) =>
        StreamingIngest.Sample(s"${cmd.path}:$ds", u.tsUs, v)
      }
    }
  }
}
