package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Client side of the rrdcached line protocol (the reference's
  * rrd_client.c, /root/reference/src/rrd_client.c:760-900 request/
  * response loop): connect, send one command line, read the `N <text>`
  * status line and its N payload lines. This is what a reference user's
  * `rrdtool update --daemon <addr> …` speaks; [[Daemon]] is the server.
  *
  * The connection is persistent (the daemon serves many commands per
  * socket); `close()` ends it. Not thread-safe — one client per thread,
  * like the reference's per-connection state.
  */
final class DaemonClient(host: String, port: Int) extends AutoCloseable {

  final case class Reply(status: Int, text: String, payload: Seq[String]) {
    def isError: Boolean = status < 0
  }

  private val sock = new Socket(host, port)
  private val out = new PrintWriter(sock.getOutputStream, true)
  private val in = new BufferedReader(
    new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))

  /** Send one protocol line, read the full reply. */
  def command(line: String): Reply = {
    out.println(line)
    val status = in.readLine()
    if (status == null)
      throw new java.io.IOException("daemon closed the connection")
    val (n, text) = status.indexOf(' ') match {
      case -1 => (status.toInt, "")
      case i => (status.take(i).toInt, status.drop(i + 1))
    }
    Reply(n, text, if (n > 0) (0 until n).map(_ => in.readLine()) else Nil)
  }

  /** BATCH framing: many commands, one error summary
    * (doc/rrdcached.pod "BATCH"). Returns the error lines
    * (`<index> <message>`), empty = all accepted. */
  def batch(lines: Seq[String]): Seq[String] = {
    val go = command("BATCH")
    require(go.status == 0, s"BATCH refused: ${go.text}")
    lines.foreach(out.println)
    command(".").payload
  }

  def update(path: String, samples: Seq[String],
      skipPast: Boolean = false): Reply = {
    // --skip-past-updates travels as a leading option token — a graft
    // protocol extension (the reference CLI silently DROPS the flag on
    // the daemon path, rrd_update.c:745-769; forwarding it keeps remote
    // semantics identical to local `-s`)
    val opt = if (skipPast) Seq("--skip-past-updates") else Nil
    command((s"UPDATE $path" +: (opt ++ samples)).mkString(" "))
  }

  def fetch(path: String, cf: String, start: Long, end: Long,
      ds: Seq[String] = Nil): Reply =
    command((s"FETCH $path $cf $start $end" +: ds).mkString(" "))

  def info(path: String): Reply = command(s"INFO $path")
  def last(path: String): Reply = command(s"LAST $path")
  def first(path: String, rra: Int = 0): Reply =
    command(s"FIRST $path $rra")
  def flush(path: String): Reply = command(s"FLUSH $path")
  def stats(): Map[String, Long] =
    command("STATS").payload.flatMap { l =>
      l.split(": ", 2) match {
        case Array(k, v) => Some(k -> v.toLong)
        case _ => None
      }
    }.toMap

  override def close(): Unit = {
    try out.println("QUIT") finally sock.close()
  }
}
