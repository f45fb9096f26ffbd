package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Regression gate for the round-5 incident: the driver regenerated
  * events.parquet with `ts: timestamp[us]` while the loader hard-coded
  * the INT64 TIMESTAMP(NANOS) physical type, erroring 38/61 oracle
  * queries. `Tables.events` must accept every physical `ts` encoding a
  * mixed-writer lake can contain and produce identical integer epoch
  * axes for all of them (reference semantics anchor: epoch axis per
  * live_head_t, /root/reference/src/rrd_format.h:289-293).
  *
  * Encodings exercised:
  *   - raw INT64 nanoseconds (what TIMESTAMP(NANOS) + nanosAsLong reads
  *     as — Spark cannot WRITE nanos parquet, but the read path is
  *     LongType either way, which is what the loader branches on)
  *   - TIMESTAMP_NTZ micros (timestamp[us], isAdjustedToUTC=false — the
  *     regenerated-testdata encoding)
  *   - TIMESTAMP micros (instant-adjusted)
  */
class TablesEncodingSpec extends SparkSuite {

  // Second-aligned + sub-second instants, pre/post-epoch-ish spread.
  private val instantsUs: Seq[Long] = Seq(
    0L, 1L, 999999L, 1000000L, 1700000000000000L, 1700000000123456L,
    4102444800000000L)

  private def writeFixtures(): (String, String, String) = {
    val base = Files.createTempDirectory("graft-enc").toString
    import spark.implicits._
    val us = instantsUs.zipWithIndex
      .toDF("us", "event_id")

    val nanosDir = s"$base/nanos"
    us.select((col("us") * 1000L).as("ts"), col("event_id"))
      .write.parquet(s"$nanosDir/events.parquet")

    val ntzDir = s"$base/ntz"
    us.select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("event_id"))
      .write.parquet(s"$ntzDir/events.parquet")

    val tzDir = s"$base/tz"
    us.select(timestamp_micros(col("us")).as("ts"), col("event_id"))
      .write.parquet(s"$tzDir/events.parquet")

    (nanosDir, ntzDir, tzDir)
  }

  test("events() yields identical ts_us/ts_sec for all ts encodings") {
    val (nanosDir, ntzDir, tzDir) = writeFixtures()
    def axis(dir: String): Seq[(Int, Long, Long)] =
      Tables.events(spark, dir)
        .select(col("event_id"), col("ts_us"), col("ts_sec"))
        .orderBy("event_id")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

    val expected = instantsUs.zipWithIndex.map { case (us, i) =>
      (i, us, us / 1000000L)
    }
    assert(axis(nanosDir) === expected)
    assert(axis(ntzDir) === expected)
    assert(axis(tzDir) === expected)
  }

  test("events() refuses an unreadable ts type loudly") {
    val base = Files.createTempDirectory("graft-enc-bad").toString
    import spark.implicits._
    Seq(("not-a-time", 1)).toDF("ts", "event_id")
      .write.parquet(s"$base/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, base))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  // ---- embeddings: the same mixed-writer rule for the vector column ----

  private def embRows: Seq[(Long, Seq[Float], Int)] = {
    val rnd = new scala.util.Random(7)
    (0L until 12L).map(i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat), (i % 3).toInt))
  }

  test("embeddings() canonicalizes float32 and float64 vectors identically") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-emb").toString
    val f32 = s"$base/f32"; val f64 = s"$base/f64"
    val df = embRows.toDF("vec_id", "embedding", "label")
    df.write.parquet(s"$f32/embeddings.parquet")
    // a float64 writer with int32 ids — each float widens exactly, so
    // the canonical frame must be bit-identical
    df.select(col("vec_id").cast("int").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label"))
      .write.parquet(s"$f64/embeddings.parquet")

    def canon(dir: String) = {
      val e = Tables.embeddings(spark, dir)
      assert(e.schema("vec_id").dataType.typeName === "long")
      assert(e.schema("embedding").dataType.simpleString === "array<double>")
      e
    }
    def ann(dir: String): Seq[(Long, Long, Double)] = {
      val e = canon(dir)
      ext.Similarity.bruteForceTopK(
          e.where(col("vec_id") < 3), e, "vec_id", "embedding", 8, 3)
        .select("query_id", "neighbor_id", "cosine")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    }
    assert(ann(f32) === ann(f64))
  }

  test("embeddings() refuses a non-numeric vector type loudly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-emb-bad").toString
    Seq((1L, Seq("a", "b"), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$base/embeddings.parquet")
    val e = intercept[IllegalArgumentException](Tables.embeddings(spark, base))
    assert(e.getMessage.contains("unsupported element type"))
  }

  // ---- documents: integral ids from any integer-width writer ----

  test("documents() canonicalizes int32 and int64 ids identically") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-doc").toString
    val rows = (0 until 8).map(i =>
      (i.toLong, s"some text $i words", "en", "src0", (10 + i).toLong))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.parquet(s"$base/i64/documents.parquet")
    df.select(col("doc_id").cast("int").as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("int").as("n_chars"))
      .write.parquet(s"$base/i32/documents.parquet")
    def canon(dir: String): Seq[(Long, String, Long)] = {
      val d = Tables.documents(spark, dir)
      assert(d.schema("doc_id").dataType.typeName === "long")
      assert(d.schema("n_chars").dataType.typeName === "long")
      d.select("doc_id", "text", "n_chars").as[(Long, String, Long)]
        .collect().sortBy(_._1).toSeq
    }
    assert(canon(s"$base/i64") === canon(s"$base/i32"))
  }

  test("current driver testdata loads through the micros branch") {
    val df = Tables.events(spark, sf)
    val row = df.select(min("ts_us"), max("ts_us"),
      sum(expr("cast(ts_sec != ts_us div 1000000 as int)"))).first()
    assert(row.getLong(0) > 0L)
    assert(row.getLong(1) < 4102444800000000L) // < year 2100: sane axis
    // the driver data carries SUB-SECOND instants (live_head_t keeps
    // microseconds, rrd_format.h:289-293) — ts_sec must be the exact
    // integer truncation of the preserved µs axis, never a rounding
    assert(row.getLong(2) == 0L, "ts_sec must truncate ts_us exactly")
    assert(df.select("ts_sec").schema.head.dataType.typeName === "long")
  }
}
