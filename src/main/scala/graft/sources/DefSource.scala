package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEF data-source dispatch (SURVEY.md §2.1 items 3-4;
  * /root/reference/src/rrd_fetch.c:310-318): beside plain stores, a DEF
  * path can name an SQL database (`sql//…`, rrd_fetch_libdbi.c; grammar
  * doc/rrdgraph_libdbi.pod:7) or a user callback (`cb//…`,
  * rrd_fetch_cb.c).
  *
  *   sql//<driver>/<opt>=<val>/...//<table>/<tscol>/<valcol>[/<where>...]
  *   cb//<registered-name>
  *
  * The sql// form maps onto `spark.read.jdbc` — driver options become
  * JDBC url/properties, where-clauses push down as filters (Catalyst
  * forwards them to the database); the result is normalized to the
  * (ts_sec, value) series shape every DEF consumes. The cb// form is a
  * registry of SparkSession => DataFrame producers — the Spark-native
  * equivalent of the C callback pointer.
  */
object DefSource {

  final case class SqlSpec(driver: String, options: Map[String, String],
      table: String, tsCol: String, valueCol: String, wheres: Seq[String]) {
    /** host/dbname/port options become the JDBC url; the rest (username,
      * password, …) pass through as connection properties. Embedded
      * drivers (libdbi's sqlite3 shape — dbname is a path, no host)
      * build `jdbc:<driver>:<dbname>` instead of the network form. */
    def jdbcUrl: String = {
      val db = options.getOrElse("dbname", "")
      if (Embedded(driver)) s"jdbc:$driver:$db"
      else {
        val host = options.getOrElse("host", "localhost")
        val port = options.get("port").map(":" + _).getOrElse("")
        s"jdbc:$driver://$host$port/$db"
      }
    }
    def properties: java.util.Properties = {
      val p = new java.util.Properties()
      options.filterNot(kv => Set("host", "port", "dbname")(kv._1))
        .foreach { case (k, v) => p.setProperty(k, v) }
      p
    }
  }

  /** Drivers whose JDBC url is `jdbc:<driver>:<db>` (file/in-process
    * databases, like libdbi's sqlite3). */
  private val Embedded = Set("derby", "sqlite", "h2", "hsqldb")

  /** Parse the sql// path grammar (doc/rrdgraph_libdbi.pod:7). */
  def parseSql(path: String): SqlSpec = {
    require(path.startsWith("sql//"), s"not an sql// path: $path")
    val Array(conn, data) = path.drop(5).split("//", 2)
    val connParts = conn.split("/").toIndexedSeq
    val driver = connParts.head
    val options = connParts.tail.filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> v
    }.toMap
    val dataParts = data.split("/").toIndexedSeq
    require(dataParts.length >= 3, s"sql// needs table/tscol/valcol: $path")
    SqlSpec(driver, options, dataParts(0), dataParts(1), dataParts(2),
      dataParts.drop(3).filter(_ != "derive"))
  }

  /** Resolve an sql// DEF to the (ts_sec, value) series frame. */
  def sql(spark: SparkSession, path: String): DataFrame = {
    val spec = parseSql(path)
    val base = spark.read.jdbc(spec.jdbcUrl, spec.table, spec.properties)
    val filtered = spec.wheres.foldLeft(base)((d, w) => d.where(w))
    filtered.select(col(spec.tsCol).cast("long").as("ts_sec"),
      col(spec.valueCol).cast("double").as("value"))
  }

  // ---- cb// callback registry (rrd_fetch_cb.c's function pointer)
  private val callbacks = TrieMap.empty[String, SparkSession => DataFrame]

  def registerCallback(name: String,
      fn: SparkSession => DataFrame): Unit = callbacks.put(name, fn)

  def callback(spark: SparkSession, path: String): DataFrame = {
    require(path.startsWith("cb//"), s"not a cb// path: $path")
    val name = path.drop(4)
    callbacks.getOrElse(name,
      throw new NoSuchElementException(s"no callback registered as '$name'"))
      .apply(spark)
  }

  /** The rrd_fetch_fn dispatch (rrd_fetch.c:310-318). */
  def resolve(spark: SparkSession, path: String): DataFrame =
    if (path.startsWith("sql//") || path.startsWith("sql||"))
      sql(spark, path.replace("sql||", "sql//"))
    else if (path.startsWith("cb//")) callback(spark, path)
    else throw new IllegalArgumentException(
      s"plain store paths go through store.RrdStore.fetch: $path")
}
