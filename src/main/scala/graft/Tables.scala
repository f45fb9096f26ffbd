package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Time axis convention: `events.parquet` stores `ts` in one of two
  * physical parquet encodings depending on which writer produced the
  * lake — a 100 TB lake has mixed writers, so the loader branches on the
  * schema rather than assuming one:
  *
  *   - INT64 TIMESTAMP(NANOS): Spark 4 refuses to read it natively
  *     (PARQUET_TYPE_ILLEGAL); we read raw nanoseconds via
  *     `spark.sql.legacy.parquet.nanosAsLong` (→ LongType) and derive
  *     `ts_us = ts div 1000`.
  *   - TIMESTAMP(MICROS) (`timestamp[us]`, with or without UTC
  *     adjustment → TimestampType / TimestampNTZType): `ts_us =
  *     unix_micros(cast(ts as timestamp))`. The session TZ is pinned
  *     UTC here so the NTZ wall-clock→instant cast is the identity on
  *     the stored microsecond value.
  *
  * Either way the derived columns are identical:
  *
  *   - `ts_us`  epoch microseconds (bigint) — the canonical axis. DuckDB
  *              (the correctness oracle) truncates the same parquet column
  *              to microsecond precision on read, so `ts_us` is exactly
  *              `epoch_us(ts)` there for both encodings.
  *   - `ts_sec` epoch seconds (bigint), `ts_us div 1_000_000`.
  *
  * Epoch integers must never round-trip through DoubleType: epoch-nanos
  * (~1.7e18) exceed 2^53. All bucketing / interval arithmetic is integer
  * (`div`), with only final small deltas cast to double.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Shared warehouse for the bucketed demo tables (q101 family),
    * keyed by user so concurrent users on a shared host never collide
    * on one world-writable /tmp path (cross-JVM writes within one user
    * are serialized by ensureBucketed's file lock). The path under a
    * shared tmp root is predictable, so it is created owner-only (700)
    * and OWNERSHIP-VERIFIED: a directory (or lock file) pre-planted by
    * another user fails loudly here instead of feeding attacker-
    * controlled bytes into the bucketed tables or wedging the lock
    * path (round-12 hardening). */
  def warehouseDir: String = {
    val user = System.getProperty("user.name", "nouser")
      .replaceAll("[^A-Za-z0-9]", "_")
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), s"graft_warehouse_$user")
    try {
      try
        java.nio.file.Files.createDirectory(p,
          java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
            java.nio.file.attribute.PosixFilePermissions
              .fromString("rwx------")))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      val owner = java.nio.file.Files.getOwner(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS).getName
      val me = System.getProperty("user.name", "nouser")
      require(owner == me,
        s"warehouse dir $p is owned by '$owner', not '$me' — refusing " +
          "a pre-planted directory on the shared tmp root")
      require(java.nio.file.Files.isDirectory(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS),
        s"warehouse path $p is not a plain directory (symlink planted?)")
    } catch {
      case _: UnsupportedOperationException => () // non-POSIX fs: best effort
    }
    p.toString
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with integer-exact `ts_us` / `ts_sec` epoch columns,
    * tolerant of both physical `ts` encodings (see header).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // a read-path format flag (Spark 4 refuses TIMESTAMP(NANOS) parquet
    // without it); it does not change the semantics of any expression
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000") // INT64 nanos read as raw long
      case TimestampType => // instant-typed: unix_micros is TZ-independent
        expr("unix_micros(ts)")
      case TimestampNTZType =>
        // the NTZ wall-clock→instant cast reads the SESSION time zone;
        // this loader must not silently mutate session state (a hidden
        // conf.set here would flip the semantics of unrelated timestamp
        // expressions), so a non-UTC session fails loudly instead
        val tz = spark.conf.get("spark.sql.session.timeZone")
        val rules = java.time.ZoneId.of(tz).getRules
        require(rules.isFixedOffset &&
          rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
          s"events.ts is TIMESTAMP_NTZ: epoch derivation requires " +
            s"spark.sql.session.timeZone=UTC (session has '$tz')")
        expr("unix_micros(cast(ts as timestamp))")
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other " +
          "(expected INT64 nanos-as-long or timestamp[us])")
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts_sec", expr("ts_us div 1000000"))
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
    spread(table(spark, dir, "documents")
      .withColumn("doc_id", col("doc_id").cast("long"))
      .withColumn("n_chars", col("n_chars").cast("long")))

  /** embeddings with the vector canonicalized to `array<double>` — the
    * same mixed-writer-lake rule as [[events]]: a writer may emit
    * float32 (the current testdata) or float64 vectors, and every
    * downstream kernel is typed over `Array[Double]`. The float→double
    * widening is exact per element, and the DuckDB oracle performs the
    * identical widening when its `list_reduce` arithmetic touches a
    * float32 list, so results are bit-identical for both encodings.
    * Any other element type (a writer bug) fails loudly at load, not
    * as an encoder error deep inside an ANN kernel.
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case other => throw new IllegalArgumentException(
        s"embeddings.embedding: unsupported element type $other " +
          "(expected array<float> or array<double>)")
    }
    spread(raw
      .withColumn("vec_id", col("vec_id").cast("long"))
      .withColumn("embedding", col("embedding").cast("array<double>")))
  }
}
