package graft.streaming

import java.io.PrintWriter
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
  import DaemonClient.{Reply, BinReply}


  private val sock = new Socket(host, port)
  private val out = new PrintWriter(sock.getOutputStream, true)
  // raw byte stream with a manual line reader: FETCHBIN interleaves
  // binary payloads with text lines, and a Reader's charset decoder
  // would corrupt (and read ahead past) the raw bytes
  private val in = new java.io.BufferedInputStream(sock.getInputStream)

  private def readLine(): String = {
    val bos = new java.io.ByteArrayOutputStream()
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') { bos.write(b); b = in.read() }
    val s = new String(bos.toByteArray, StandardCharsets.UTF_8)
    if (s.endsWith("\r")) s.dropRight(1) else s
  }

  private def readFully(n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new java.io.IOException("EOF inside binary payload")
      off += r
    }
    a
  }

  /** Send one protocol line, read the full reply. */
  def command(line: String): Reply = {
    out.println(line)
    val status = readLine()
    if (status == null)
      throw new java.io.IOException("daemon closed the connection")
    val (n, text) = status.indexOf(' ') match {
      case -1 => (status.toInt, "")
      case i => (status.take(i).toInt, status.drop(i + 1))
    }
    Reply(n, text, if (n > 0) (0 until n).map(_ => readLine()) else Nil)
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

  private val BinHeaderRe =
    """DSName-(.+): BinaryData (\d+) (\d+) (\w+)""".r

  /** FETCHBIN (rrd_client.c rrdc_fetch's binary branch): text header
    * key/values, then per-DS raw doubles read straight off the socket
    * in the advertised endianness. */
  def fetchBin(path: String, cf: String, start: Long, end: Long,
      ds: Seq[String] = Nil): BinReply = {
    out.println((s"FETCHBIN $path $cf $start $end" +: ds).mkString(" "))
    val status = readLine()
    if (status == null)
      throw new java.io.IOException("daemon closed the connection")
    val (n, text) = status.indexOf(' ') match {
      case -1 => (status.toInt, "")
      case i => (status.take(i).toInt, status.drop(i + 1))
    }
    if (n < 0) {
      // error replies are plain text; payload lines (if any) were
      // already consumed by the negative count convention (none follow)
      return BinReply(n, text, Map.empty, Nil)
    }
    val hdr = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val series = Seq.newBuilder[(String, Array[Double])]
    (0 until n).foreach { _ =>
      readLine() match {
        case BinHeaderRe(name, rec, rsize, endian) =>
          val records = rec.toInt
          val bytes = readFully(records * rsize.toInt)
          readLine() // the blob's trailing newline
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (endian == "LITTLE") java.nio.ByteOrder.LITTLE_ENDIAN
            else java.nio.ByteOrder.BIG_ENDIAN)
          series += name -> Array.fill(records)(bb.getDouble)
        case l =>
          l.split(": ", 2) match {
            case Array(k, v) => hdr += k -> v
            case _ => ()
          }
      }
    }
    BinReply(n, text, hdr.toMap, series.result())
  }

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

object DaemonClient {
  final case class Reply(status: Int, text: String, payload: Seq[String]) {
    def isError: Boolean = status < 0
  }

  final case class BinReply(status: Int, text: String,
      header: Map[String, String], series: Seq[(String, Array[Double])]) {
    def isError: Boolean = status < 0
  }
}
