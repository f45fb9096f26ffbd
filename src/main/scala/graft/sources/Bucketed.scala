package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse tables — the shuffle-elimination lever the
  * DataFrame API only exposes through the table catalog: a frame
  * written with `bucketBy(n, key).sortBy(key)` records its hash
  * partitioning AND within-bucket order in the catalog, so a join (or
  * aggregation) of two tables bucketed the same way on the join key
  * plans a SortMergeJoin with NO Exchange and NO Sort on either side —
  * the bytes never move again. At 100 TB this is the difference
  * between re-shuffling the corpus on every enrichment join and paying
  * the layout cost ONCE at ingest: every downstream per-document join
  * (quality scores ⋈ token counts ⋈ dedup verdicts ⋈ …) co-locates by
  * construction. (PlanAuditSpec pins the exchange-free join plan.)
  *
  * The warehouse root is a session conf (`spark.sql.warehouse.dir`,
  * pointed at /tmp by this project's mains); the catalog is the
  * session-local in-memory one, so tables re-register per session
  * while their files persist.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted managed table (replacing
    * any prior version). `buckets` should divide the target cluster's
    * parallelism at scale; both sides of a co-located join must use
    * the SAME count and key. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets=$buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Re-register an existing bucketed table's FILES with a fresh
    * session's catalog (the in-memory catalog forgets tables across
    * JVMs while the parquet + bucket-id filenames persist): an
    * external CREATE TABLE carrying the same bucket spec, so the next
    * session pays a DDL statement instead of rewriting the layout.
    * `schemaDdl` is the column list (`doc_id BIGINT, lang STRING`). */
  def register(spark: SparkSession, table: String, schemaDdl: String,
      key: String, buckets: Int, location: String): Unit =
    spark.sql(s"CREATE TABLE $table ($schemaDdl) USING parquet " +
      s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
      s"LOCATION '$location'")
}
