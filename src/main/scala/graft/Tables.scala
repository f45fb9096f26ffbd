package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Time axis convention: `events.parquet` stores `ts` as parquet INT64
  * TIMESTAMP(NANOS), which Spark 4 refuses to read natively
  * (PARQUET_TYPE_ILLEGAL). We read it as raw nanoseconds via
  * `spark.sql.legacy.parquet.nanosAsLong` and derive integer-exact epoch
  * columns:
  *
  *   - `ts_us`  epoch microseconds (bigint) — the canonical axis. DuckDB
  *              (the correctness oracle) truncates the same parquet column
  *              to microsecond precision on read, so `ts_us` is exactly
  *              `epoch_us(ts)` there.
  *   - `ts_sec` epoch seconds (bigint), `ts_us div 1_000_000`.
  *
  * Epoch integers must never round-trip through DoubleType: epoch-nanos
  * (~1.7e18) exceed 2^53. All bucketing / interval arithmetic is integer
  * (`div`), with only final small deltas cast to double.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with integer-exact `ts_us` / `ts_sec` epoch columns. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_sec", expr("ts div 1000000000"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")

  /** documents/embeddings feed per-row compute-heavy operators (hashing,
    * shingling, dot products). The testdata files are single-split small
    * parquet, which would serialize that compute on one core — round-robin
    * repartition to the cluster's parallelism. At real scale the scan has
    * many splits already and this is a bounded reshuffle ahead of a
    * compute-bound stage.
    */
  private def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(table(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(table(spark, dir, "embeddings"))
}
