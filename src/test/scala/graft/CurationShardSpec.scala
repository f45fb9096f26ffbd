package graft

import org.apache.spark.sql.functions._

/** Parity pins for the round-10 sharded two-level prefix sums: the
  * sharded forms must be BIT-IDENTICAL to their single-window
  * references on every group — including a heavily skewed one (one
  * group holding ~60% of all rows, the "English is half the corpus"
  * case the sharding exists for) — because the DuckDB oracle replays
  * the single-window form.
  */
class CurationShardSpec extends SparkSuite {

  import spark.implicits._

  /** 4000 docs over a skewed language mix: 'en' ~60%, a long tail for
    * the rest; token counts 0-40 (zeros exercise the pack_id clamp and
    * the cumsum tie edges), ids deliberately sparse (×37) so id-block
    * sharding sees uneven blocks. */
  private lazy val docs = {
    val rows = (0 until 4000).map { i =>
      val lang =
        if (i % 5 < 3) "en"
        else if (i % 5 == 3) s"l${i % 7}"
        else s"l${i % 11}"
      (i.toLong * 37L, lang, (i * 2654435761L % 41).toLong)
    }
    rows.toDF("doc_id", "lang", "n_tokens")
  }

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("tokenBudgetCap: sharded == unsharded on a skewed corpus (all groups)") {
    val un = ext.Curation.tokenBudgetCap(docs, "doc_id", "lang",
      col("n_tokens"), budget = 500L, shards = 1)
    for (s <- Seq(2, 7, 32)) {
      val sh = ext.Curation.tokenBudgetCap(docs, "doc_id", "lang",
        col("n_tokens"), budget = 500L, shards = s)
      assert(sh.columns.toSeq == un.columns.toSeq)
      assert(collectSet(sh) == collectSet(un), s"shards=$s diverges")
    }
  }

  test("tokenBudgetCap: kept set is exactly a per-group prefix of the priority order") {
    val kept = ext.Curation.tokenBudgetCap(docs, "doc_id", "lang",
      col("n_tokens"), budget = 500L, shards = 7)
      .withColumn("__u", ext.Curation.hashUniform(col("doc_id")))
    // every kept row's cum equals the sum of kept-or-earlier tokens:
    // no row with smaller (u, id) in the same lang is missing
    val all = docs.withColumn("__u", ext.Curation.hashUniform(col("doc_id")))
      .collect().map(r => (r.getString(1), r.getDouble(3), r.getLong(0),
        r.getLong(2)))
    val keptSet = kept.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    all.groupBy(_._1).foreach { case (lang, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, id, t) =>
        cum += t
        assert(keptSet.contains((lang, id)) == (cum <= 500L),
          s"$lang/$id: prefix law broken at cum=$cum")
      }
    }
  }

  test("sharded forms keep NULL-group rows exactly like the window forms") {
    // windows/groupBy treat a NULL group as its own partition; the
    // round-10 review found the offsets equi-join silently dropping
    // unlabeled rows — pinned here with a quarter-null corpus
    val withNulls = docs.withColumn("lang",
      when(col("doc_id") % 4 === 0, lit(null: String)).otherwise(col("lang")))
    val un = ext.Curation.tokenBudgetCap(withNulls, "doc_id", "lang",
      col("n_tokens"), budget = 500L, shards = 1)
    val sh = ext.Curation.tokenBudgetCap(withNulls, "doc_id", "lang",
      col("n_tokens"), budget = 500L, shards = 8)
    assert(collectSet(sh) == collectSet(un))
    assert(un.where(col("lang").isNull).count() > 0, "no null rows kept?")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refPack = withNulls
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr("greatest(__cum - 1, 0L) div 700"))
      .select("doc_id", "lang", "n_tokens", "pack_id")
    val shPack = ext.Curation.packSequences(withNulls, "doc_id", "lang",
      col("n_tokens"), budget = 700L, idsPerShard = 5000L)
    assert(collectSet(shPack) == collectSet(refPack))
  }

  test("tokenBudgetCap: sharded path refuses non-integral token counts loudly") {
    val e = intercept[IllegalArgumentException] {
      ext.Curation.tokenBudgetCap(docs, "doc_id", "lang",
        col("n_tokens").cast("double"), budget = 500L, shards = 8)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("packSequences: sharded == single-window pack ids on a skewed corpus") {
    import org.apache.spark.sql.expressions.Window
    // single-window reference (the pre-round-10 q78 form)
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr("greatest(__cum - 1, 0L) div 700"))
      .select("doc_id", "lang", "n_tokens", "pack_id")
    // idsPerShard small enough that the 4000-doc frame really shards
    // (ids span 0..147963 → ~30 blocks at 5000 ids/block)
    val sh = ext.Curation.packSequences(docs, "doc_id", "lang",
      col("n_tokens"), budget = 700L, idsPerShard = 5000L)
    assert(sh.columns.toSeq == ref.columns.toSeq)
    assert(collectSet(sh) == collectSet(ref))
    // and the degenerate one-shard split equals it too
    val one = ext.Curation.packSequences(docs, "doc_id", "lang",
      col("n_tokens"), budget = 700L, idsPerShard = Long.MaxValue)
    assert(collectSet(one) == collectSet(ref))
  }

  test("concatBlockManifest: spans == driver single-order replay; " +
      "coverage and block-fullness laws; shard-count invariance") {
    def md5u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16).toDouble /
        (1L << 60).toDouble
    }
    val in = docs.where(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"))
      .as[(Long, Long)].collect()
    val b = 128L
    // driver replay: global (u, id) order, exclusive prefix sum, spans
    var off = 0L
    val want = in.sortBy { case (id, _) => (md5u(id), id) }.flatMap {
      case (id, n) =>
        val rows = (off / b to (off + n - 1) / b).map { blk =>
          (blk, id, math.max(blk * b - off, 0L) + 1L,
            math.min(n, (blk + 1) * b - off))
        }
        off += n
        rows
    }.sortBy(r => (r._1, r._2)).toSeq
    for (s <- Seq(1, 16, 256)) {
      val got = ext.Curation.concatBlockManifest(docs, "doc_id",
          col("n_tokens"), blockSize = b, shards = s)
        .as[(Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got == want, s"shards=$s diverges from the replay")
    }
    // laws: every doc's spans tile [1..n] contiguously; every block
    // except the last is exactly full
    val spans = want.groupBy(_._2)
    val nOf = in.toMap
    spans.foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._1)
      assert(sorted.head._3 == 1L && sorted.last._4 == nOf(id), s"doc $id")
      sorted.sliding(2).foreach {
        case Seq(a, c) => assert(c._3 == a._4 + 1, s"doc $id gap")
        case _ =>
      }
    }
    val blockMass = want.groupBy(_._1).view
      .mapValues(_.map(r => r._4 - r._3 + 1).sum)
    val lastBlock = blockMass.keys.max
    blockMass.foreach { case (blk, m) =>
      if (blk != lastBlock) assert(m == b, s"block $blk mass $m")
      else assert(m >= 1 && m <= b)
    }
  }

  test("sharded plans: per-group windows are partitioned by (group, shard)") {
    val sh = ext.Curation.tokenBudgetCap(docs, "doc_id", "lang",
      col("n_tokens"), budget = 500L, shards = 32)
    val p = sh.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the big window must carry the shard key next to the group key —
    // a [group]-only window partition is the single-reducer funnel
    val winLines = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(winLines.nonEmpty, p.take(1500))
    // every window touching the group key must carry the shard key too
    // (a lang-only window partition is the single-reducer funnel; the
    // tiny offsets window orders BY the shard key, so it qualifies)
    assert(winLines.filter(_.contains("lang")).forall(_.contains("__shard")),
      winLines.mkString("\n"))
  }
}
