package graft

import org.apache.spark.sql.functions._

/** Round-10 extension operators: streaming sessionization (q95),
  * fixed-size stratified sampling (q96), odds-form BM25 (q97),
  * contamination attribution (q98), SemDeDup semantic near-dup pairs
  * (q99), and seasonal-profile anomalies (q100) — each pinned against
  * an independent closed form.
  */
class SessionizeSpec extends SparkSuite {

  import spark.implicits._

  test("sessionize: gap semantics incl. the exact-gap boundary, out-of-order input") {
    // user 1: an exact-gap event (100s+gap — touching windows MERGE,
    // the boundary this test pins) then a >gap jump that breaks.
    // user 2: single event. Input arrives out of order in the batch.
    val gapUs = 600L * 1000000L
    val rows = Seq(
      (1L, 100L * 1000000L), (1L, 0L), // epoch-0 event counts (review pin)
      (1L, 100L * 1000000L + gapUs), // exact gap -> SAME session
      (1L, 100L * 1000000L + 2 * gapUs + 1L), // gap+1us -> new session
      (2L, 42L * 1000000L))
    val input = rows.toDF("user_id", "ts_us")
    val sentinel = Seq((-1L, 4102444800000000L)).toDF("user_id", "ts_us")
    val (out, st) = streaming.StreamingSessionize.sessionFileRunWithState(
      spark, input, sentinel, Seq("user_id"), "ts_us",
      gapSec = 600L, latenessSec = 0L)
    val got = out.where(col("user_id") >= 0)
      .orderBy("user_id", "first_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 100000000L + gapUs),
      (1L, 1L, 100000000L + 2 * gapUs + 1L, 100000000L + 2 * gapUs + 1L),
      (2L, 1L, 42000000L, 42000000L)), got.toString)
    // state metrics came back from the run (the ScaleBench channel)
    assert(st.nonEmpty)
  }

  test("sessionize equals the batch islands form on the events slice") {
    val (out, _) = SparkEntry.streamingSessionizeQueryWithState(
      spark, sf, col("user_id") < 10)
    val e = Tables.events(spark, sf).where(col("user_id") < 10)
      .select(col("user_id"), col("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val isl = e.withColumn("brk",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) >
          21600L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("first_us"),
        max(col("ts_us")).as("last_us"))
      .select("user_id", "n_events", "first_us", "last_us")
    assert(out.collect().map(_.toSeq).toSet ==
      isl.collect().map(_.toSeq).toSet)
  }

  test("fixedSizeSample: smaller budgets are strict prefixes, counts exact") {
    val d = Tables.documents(spark, sf)
    val s30 = ext.Curation.fixedSizeSample(d, "doc_id", "lang", 30)
    val s10 = ext.Curation.fixedSizeSample(d, "doc_id", "lang", 10)
    val by30 = s30.as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val by10 = s10.as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val sizes = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    by30.foreach { case (lang, rows) =>
      assert(rows.length == math.min(30L, sizes(lang)), lang)
      // rank is 1..n and u is nondecreasing in rank
      assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq)
      assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
      // the 10-sample is exactly the first 10 of the 30-sample
      assert(by10(lang).toSeq == rows.take(10).toSeq)
    }
  }

  test("bm25OddsScores: closed form on a planted corpus") {
    val df = Seq(
      (1L, "data data model"), // tf(data)=2, len 3
      (2L, "model plain text here"), // tf=0 -> no score row
      (3L, "data only")).toDF("doc_id", "text")
    val got = ext.TextAnalysis.bm25OddsScores(df, "doc_id", "text",
        Seq("data")).as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // N=3, df=2, idf=(3-2+0.5)/(2+0.5)=0.6; avglen=(3+4+2)/3=3.0
    val idf = (3 - 2 + 0.5) / (2 + 0.5)
    def s(tf: Double, len: Double) =
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / 3.0))
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((s(2, 3), 3L)))
    assert(got(3L) == ((s(1, 2), 2L)))
  }

  test("semanticNearDupPairs: within-cell complete, cosine-exact, mega-cells capped") {
    val e = Tables.embeddings(spark, sf)
    val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
      64, c = 8, iters = 1, sampleRate = 0.5)
    val got = ext.Similarity.semanticNearDupPairs(e, cent, "vec_id",
        "embedding", 64, tau = 0.30, maxCell = 10000)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // independent reference: driver-side assignment + within-cell pairs
    val cents = cent.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }; s
    }
    val vs = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Double])].collect()
      .filter { case (_, v) => v != null && v.length >= 64 && dot(v, v) > 0 }
      .map { case (i, v) =>
        val n = math.sqrt(dot(v, v))
        val cell = cents.map { case (cid, cv) =>
          (cid, dot(v, cv) / (n * math.sqrt(dot(cv, cv)))) }
          .maxBy { case (cid, c) => (c, -cid) }._1
        (i, v, n, cell)
      }
    val expect = (for {
      (i1, v1, n1, c1) <- vs
      (i2, v2, n2, c2) <- vs
      if i1 < i2 && c1 == c2
      c = dot(v1, v2) / (n1 * n2)
      if c >= 0.30
    } yield (i1, i2) -> c).toMap
    assert(got == expect, s"${got.size} vs ${expect.size}")
    // maxCell: with a cap below every cell's size, nothing survives
    assert(ext.Similarity.semanticNearDupPairs(e, cent, "vec_id",
      "embedding", 64, tau = -1.0, maxCell = 1).count() == 0L)
  }

  test("incremental semantic dedup == full mine restricted to " +
      "batch-touching pairs (the q46 law), incl. the persisted index") {
    val e = Tables.embeddings(spark, sf)
    val thr = e.count() * 4 / 5
    val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
      64, c = 8, iters = 1, sampleRate = 0.5)
    val index = ext.Similarity.ivfIndex(e.where($"vec_id" < thr), cent,
      "vec_id", "embedding", 64).where($"norm" > 0)
    val batch = e.where($"vec_id" >= thr)
    val incr = ext.Similarity.incrementalSemanticNearDupPairs(batch,
        index, cent, "vec_id", "embedding", 64, tau = 0.30,
        maxCell = 10000)
      .as[(Long, Long, Double)].collect().toSet
    val full = ext.Similarity.semanticNearDupPairs(e, cent, "vec_id",
        "embedding", 64, tau = 0.30, maxCell = 10000)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr == full.filter(p => p._1 >= thr || p._2 >= thr))
    assert(incr.nonEmpty, "degenerate fixture: no batch-touching pairs")
    assert(incr != full, "fixture must also have corpus-only pairs")
    // the on-disk index round-trip (cell comes back integer-typed from
    // partition-directory inference) yields the identical pair set
    val path = "/tmp/graft_test_incr_ivf"
    ext.Similarity.writeIvfIndex(index, path)
    try {
      val viaDisk = ext.Similarity.incrementalSemanticNearDupPairs(batch,
          ext.Similarity.readIvfIndex(spark, path), cent, "vec_id",
          "embedding", 64, tau = 0.30, maxCell = 10000)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaDisk == incr)
    } finally graft.store.RrdStore.deleteTree(path)
    // combined-population cap: below every cell's (batch+index) size,
    // nothing survives — the full-re-mine drop rule
    assert(ext.Similarity.incrementalSemanticNearDupPairs(batch, index,
      cent, "vec_id", "embedding", 64, tau = -1.0, maxCell = 1)
      .count() == 0L)
  }

  test("ivfIndexProbed: probing every coarse bucket IS the exact " +
      "assignment; partial probing stays structurally valid") {
    val e = Tables.embeddings(spark, sf)
    val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
      64, c = 25, iters = 1, sampleRate = 0.5)
    def asg(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select($"vec_id".cast("long"), $"cell")
        .as[(Long, Long)].collect().toMap
    val exact = asg(ext.Similarity.ivfIndex(e, cent, "vec_id",
      "embedding", 64))
    // c=25 -> g=5 coarse buckets: probes >= 5 scans every centroid and
    // the explicit (cosine, cid) tie rule makes scan order irrelevant
    val full = asg(ext.Similarity.ivfIndexProbed(e, cent, "vec_id",
      "embedding", 64, probes = 5))
    assert(full == exact)
    // partial probing: same row universe, every cell a real centroid
    val cids = cent.select($"vec_id".cast("long")).as[Long].collect().toSet
    val part = asg(ext.Similarity.ivfIndexProbed(e, cent, "vec_id",
      "embedding", 64, probes = 1))
    assert(part.keySet == exact.keySet)
    assert(part.values.forall(c => cids(c) || c == -1L))
    // and the probed PAIR operator at full probes equals the exact one
    val pExact = ext.Similarity.semanticNearDupPairs(e, cent, "vec_id",
        "embedding", 64, tau = 0.30, maxCell = 10000)
      .as[(Long, Long, Double)].collect().toSet
    val pFull = ext.Similarity.semanticNearDupPairsProbed(e, cent,
        "vec_id", "embedding", 64, tau = 0.30, probes = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pFull == pExact)
  }

  test("ivfIndexProbed with duplicate centroids: every norm>0 vector " +
      "lands in a real cell (the coarse seeds always compete)") {
    def vec(xs: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(64)(0.0); xs.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    // c=5 -> g=3 coarse seeds with cids 0,1,2; cid 1 duplicates cid 0's
    // direction, so bucket 1 is EMPTY (its only candidate member, cid 1
    // itself, ties to the earlier twin's bucket 0)
    val cent = Seq(
      (0L, vec(0 -> 1.0)), (1L, vec(0 -> 2.0)), (2L, vec(1 -> 1.0)),
      (3L, vec(2 -> 1.0)), (4L, vec(3 -> 1.0)))
      .toDF("vec_id", "embedding")
    val corpus = (
      (10L until 40L).map(i =>
        (i, vec((i % 4).toInt -> 1.0, ((i + 1) % 4).toInt -> 0.3))) :+
        (99L, Seq.fill(64)(0.0))) // zero-norm: the declared -1 sink
      .toDF("vec_id", "embedding")
    for (p <- 1 to 3) {
      val asg = ext.Similarity.ivfIndexProbed(corpus, cent, "vec_id",
          "embedding", 64, probes = p)
        .select($"vec_id".cast("long"), $"cell", $"norm")
        .as[(Long, Long, Double)].collect()
      asg.foreach { case (id, cell, norm) =>
        if (norm > 0) assert(cell >= 0L && cell <= 4L, s"p=$p id=$id")
        else assert(cell == -1L && id == 99L)
      }
    }
    // and at probes >= g the duplicate-centroid frame still satisfies
    // the ≡-exact law
    val exact = ext.Similarity.ivfIndex(corpus, cent, "vec_id",
        "embedding", 64)
      .select($"vec_id".cast("long"), $"cell")
      .as[(Long, Long)].collect().toMap
    val full = ext.Similarity.ivfIndexProbed(corpus, cent, "vec_id",
        "embedding", 64, probes = 3)
      .select($"vec_id".cast("long"), $"cell")
      .as[(Long, Long)].collect().toMap
    assert(full == exact)
  }

  test("ivfIndexDistributed ≡ ivfIndexProbed at every probe count on " +
      "the same centroid frame (and ≡ exact at probes >= g)") {
    val e = Tables.embeddings(spark, sf)
    val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
      64, c = 25, iters = 1, sampleRate = 0.5)
    def asg(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select($"vec_id".cast("long"), $"cell")
        .as[(Long, Long)].collect().toMap
    // same coarse seeds, same bucketing, same probe selection, same
    // argmax tie rules — the distributed cogroup path must reproduce
    // the broadcast path BIT-IDENTICALLY at every probe count
    for (p <- Seq(1, 2, 5)) {
      val dist = asg(ext.Similarity.ivfIndexDistributed(e, cent,
        "vec_id", "embedding", 64, probes = p))
      val prob = asg(ext.Similarity.ivfIndexProbed(e, cent,
        "vec_id", "embedding", 64, probes = p))
      assert(dist == prob, s"probes=$p")
    }
    // c=25 -> g=5: probing every bucket IS the exact assignment
    val exact = asg(ext.Similarity.ivfIndex(e, cent, "vec_id",
      "embedding", 64))
    assert(asg(ext.Similarity.ivfIndexDistributed(e, cent, "vec_id",
      "embedding", 64, probes = 5)) == exact)
    // and the pair operator composes: distributed assignment feeds the
    // same within-cell stage, so at full probes the oracle-gated q99
    // pair set reproduces exactly
    val pd = ext.Similarity.semanticNearDupPairsDistributed(e, "vec_id",
        "embedding", 64, tau = 0.30, targetOccupancy = 64, probes = 1000)
      .as[(Long, Long, Double)].collect().toSet
    val centHash = ext.Similarity.seededCentroids(e, "vec_id",
      "embedding", 64, 1.0 / 64)
    val pe = ext.Similarity.semanticNearDupPairs(e, centHash, "vec_id",
        "embedding", 64, tau = 0.30, maxCell = 10000)
      .as[(Long, Long, Double)].collect().toSet
    assert(pd == pe)
  }

  test("ivfIndex routes past broadcastCellLimit through the " +
      "distributed path bit-identically (cells AND norms)") {
    val e = Tables.embeddings(spark, sf)
    val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
      64, c = 25, iters = 1, sampleRate = 0.5)
    def asg(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      df.select($"vec_id".cast("long"), $"cell", $"norm")
        .as[(Long, Long, Double)].collect()
        .map { case (id, c, n) => id -> (c, n) }.toMap
    // limit = 4 < c = 25 forces the routed path; the default limit
    // keeps the broadcast path — outputs must be indistinguishable
    // (probes = every coarse bucket ⇒ the spec-pinned ≡-exact law)
    val routed = asg(ext.Similarity.ivfIndex(e, cent, "vec_id",
      "embedding", 64, broadcastCellLimit = 4))
    val bcast = asg(ext.Similarity.ivfIndex(e, cent, "vec_id",
      "embedding", 64))
    assert(routed == bcast)
  }

  test("semanticNearDupPairs auto overload at EXACTLY the broadcast " +
      "cell limit vs one past it: quantizer-invariant pairs identical") {
    // 16 orthogonal prototypes x 16 exact copies = 256 vectors whose
    // TRUE pair set is quantizer-invariant: identical vectors always
    // share a cell (assignment is a pure function of the vector), and
    // cross-prototype cosine = 0 < tau can never pair whatever the
    // cells. targetOccupancy = 4 auto-sizes c = 256/4 = 64, so
    // limit = 64 runs the broadcast path (c > limit is false:
    // sample-seeded kmeansCentroids) and limit = 63 routes the
    // distributed family (hash-threshold seededCentroids, two-level
    // assignment) — the two seeding paths the boundary switches
    // between must both emit exactly the planted pairs.
    val dim = 16
    val vecs = (0 until 256).map { i =>
      val a = Array.fill(dim)(0.0); a(i / 16) = 1.0
      (i.toLong, a.toSeq)
    }.toDF("vec_id", "embedding")
    val want = (0 until 16).flatMap { p =>
      val ids = (p * 16) until (p * 16 + 16)
      for (a <- ids; b <- ids if a < b) yield (a.toLong, b.toLong)
    }.toSet
    def pairs(limit: Int): Set[(Long, Long)] =
      ext.Similarity.semanticNearDupPairs(vecs, "vec_id", "embedding",
          dim, tau = 0.5, maxCell = 10000, c = 0, targetOccupancy = 4,
          sampleRate = 0.5, broadcastCellLimit = limit)
        .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val atLimit = pairs(64)
    val pastLimit = pairs(63)
    assert(atLimit == want, "broadcast path at c == limit")
    assert(pastLimit == want, "distributed path one past the limit")
  }

  test("ensureScaledEmbeddings: the typed-kernel replica builder emits " +
      "the identical table to ensureScaled's union form") {
    val outA = java.nio.file.Files
      .createTempDirectory("graft_embk").toString
    val outB = java.nio.file.Files
      .createTempDirectory("graft_embu").toString
    try {
      ScaleBench.ensureScaledEmbeddings(spark, sf, outA, 3)
      ScaleBench.ensureScaled(spark, sf, outB, 3)
      def read(dir: String): Map[Long, (Seq[Float], Option[Int])] =
        spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").cast("long"), col("embedding"),
            col("label").cast("int"))
          .as[(Long, Seq[Float], Option[Int])].collect()
          .map { case (id, e, l) => id -> ((e, l)) }.toMap
      val a = read(outA)
      val b = read(outB)
      assert(a.size == b.size && a.size > 0)
      assert(a == b, "replica content must be bit-identical either way")
    } finally {
      graft.store.RrdStore.deleteTree(outA)
      graft.store.RrdStore.deleteTree(outB)
    }
  }

  test("ensureScaledDocuments: the typed-kernel replica builder emits " +
      "the identical table to ensureScaled's union form") {
    val outA = java.nio.file.Files
      .createTempDirectory("graft_dock").toString
    val outB = java.nio.file.Files
      .createTempDirectory("graft_docu").toString
    try {
      ScaleBench.ensureScaledDocuments(spark, sf, outA, 3)
      ScaleBench.ensureScaled(spark, sf, outB, 3)
      def read(dir: String): Map[Long, (String, String, String, Long)] =
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id").cast("long"), col("text"), col("lang"),
            col("source"), col("n_chars").cast("long"))
          .as[(Long, String, String, String, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val a = read(outA)
      val b = read(outB)
      assert(a.size == b.size && a.size > 0)
      assert(a == b, "replica content must be identical either way")
    } finally {
      graft.store.RrdStore.deleteTree(outA)
      graft.store.RrdStore.deleteTree(outB)
    }
  }

  test("incrementalSemanticNearDupPairs: a re-ingested id is superseded " +
      "by its batch row and counts ONCE toward the combined cap") {
    def vec(xs: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(64)(0.0); xs.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    val cent = Seq((0L, vec(0 -> 1.0))).toDF("vec_id", "embedding")
    // fresh id-1 is close to id-3; the STALE index copy of id 1 is
    // orthogonal to everything, so any pair scored off it would vanish
    val batch = Seq(
      (1L, vec(0 -> 1.0, 1 -> 0.1)),
      (2L, vec(0 -> 1.0, 2 -> 0.9))).toDF("vec_id", "embedding")
    val index = ext.Similarity.ivfIndex(Seq(
        (1L, vec(5 -> 1.0)), // stale copy of id 1
        (3L, vec(0 -> 1.0, 1 -> 0.12))).toDF("vec_id", "embedding"),
      cent, "vec_id", "embedding", 64)
    def mine(maxCell: Int): Set[(Long, Long)] =
      ext.Similarity.incrementalSemanticNearDupPairs(batch, index, cent,
          "vec_id", "embedding", 64, tau = 0.60, maxCell = maxCell)
        .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    // id-keyed union population is {1, 2, 3} = 3 ids: the cell survives
    // maxCell = 3 (raw side-row count of 4 would have dropped it), and
    // pair (1,3) scores off the FRESH vector (stale copy would miss tau)
    val got = mine(3)
    assert(got.contains((1L, 3L)), got.toString)
    assert(!got.contains((1L, 1L)))
    // the full re-mine of the id-keyed union restricted to
    // batch-touching pairs — the q46 identity law with overlap
    val union = batch.unionByName(
      Seq((3L, vec(0 -> 1.0, 1 -> 0.12))).toDF("vec_id", "embedding"))
    val full = ext.Similarity.semanticNearDupPairs(union, cent, "vec_id",
        "embedding", 64, tau = 0.60, maxCell = 3)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
      .filter(p => p._1 <= 2L || p._2 <= 2L)
    assert(got == full, s"got=$got full=$full")
    // below the deduped population the cell still drops
    assert(mine(2).isEmpty)
  }

  test("incremental distributed semdedup == full distributed re-mine " +
      "restricted to batch-touching pairs, at partial AND full probes") {
    val e = Tables.embeddings(spark, sf)
    val thr = e.count() * 4 / 5
    val corpus = e.where($"vec_id" < thr)
    val batch = e.where($"vec_id" >= thr)
    // production seeding: the quantizer exists before the batch does
    val cent = ext.Similarity.seededCentroids(corpus, "vec_id",
      "embedding", 64, rate = 1.0 / 16)
    val g = math.ceil(math.sqrt(cent.count().toDouble)).toInt
    val tau = 0.30
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      (0 until 64).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    for (p <- Seq(1, g + 1)) {
      val index = ext.Similarity.ivfIndexDistributed(corpus, cent,
        "vec_id", "embedding", 64, probes = p).where($"norm" > 0)
      val got = ext.Similarity.incrementalSemanticNearDupPairsDistributed(
          batch, index, cent, "vec_id", "embedding", 64, tau = tau,
          maxCell = 10000, probes = p)
        .select($"id1", $"id2", $"cosine")
        .as[(Long, Long, Double)].collect().toSet
      // reference: assign the UNION with the same frame + probes, mine
      // every within-cell pair locally, keep batch-touching ones
      val asg = ext.Similarity.ivfIndexDistributed(e, cent, "vec_id",
          "embedding", 64, probes = p)
        .where($"norm" > 0)
        .select($"cell", $"vec_id".cast("long"), $"embedding")
        .as[(Long, Long, Seq[Double])].collect()
      val want = asg.groupBy(_._1).values.flatMap { cell =>
        val m = cell.sortBy(_._2)
        for {
          i <- m.indices; j <- (i + 1) until m.length
          c = dot(m(i)._3, m(j)._3) /
            (math.sqrt(dot(m(i)._3, m(i)._3)) *
              math.sqrt(dot(m(j)._3, m(j)._3)))
          if c >= tau && (m(i)._2 >= thr || m(j)._2 >= thr)
        } yield (m(i)._2, m(j)._2, c)
      }.toSet
      assert(got == want, s"probes=$p")
      if (p > g) assert(got.nonEmpty, "degenerate fixture at full probes")
    }
    // at probes >= g both assignment paths are exact, so the
    // distributed incremental must coincide with the broadcast one
    val indexExact = ext.Similarity.ivfIndex(corpus, cent, "vec_id",
      "embedding", 64).where($"norm" > 0)
    val broadcastForm = ext.Similarity.incrementalSemanticNearDupPairs(
        batch, indexExact, cent, "vec_id", "embedding", 64, tau = tau,
        maxCell = 10000)
      .as[(Long, Long, Double)].collect().toSet
    val distForm = ext.Similarity.incrementalSemanticNearDupPairsDistributed(
        batch,
        ext.Similarity.ivfIndexDistributed(corpus, cent, "vec_id",
          "embedding", 64, probes = g).where($"norm" > 0),
        cent, "vec_id", "embedding", 64, tau = tau, maxCell = 10000,
        probes = g)
      .as[(Long, Long, Double)].collect().toSet
    assert(distForm == broadcastForm)
  }

  test("lloydRefineDistributed at probes >= g == exact local Lloyd " +
      "(argmax assignment + two-level ordered mean), iters=0 identity") {
    val e = Tables.embeddings(spark, sf)
    val seed = ext.Similarity.seededCentroids(e, "vec_id", "embedding",
      64, rate = 1.0 / 16)
    val g = math.ceil(math.sqrt(seed.count().toDouble)).toInt
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      (0 until 64).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val vs = e.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Seq[Double])].collect()
      .filter(t => t._2 != null && t._2.length >= 64 && dot(t._2, t._2) > 0)
    // local reference: exact argmax (cos DESC, cid ASC via ascending
    // scan with strict >), per-cell two-level fold mean (id-block
    // shards of 4096, shard order), empty/zero-norm keep previous
    var ref = seed.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(ref.length >= 2, "fixture must seed at least 2 centroids")
    for (_ <- 1 to 2) {
      val asg = vs.map { case (vid, v) =>
        val nv = math.sqrt(dot(v, v))
        val best = ref.map { case (cid, cv) =>
          (cid, dot(v, cv) / (nv * math.sqrt(dot(cv, cv))))
        }.reduceLeft((a, b) => if (b._2 > a._2) b else a)
        (best._1, vid, v)
      }
      ref = ref.map { case (cid, cv) =>
        val mem = asg.filter(_._1 == cid)
        if (mem.isEmpty) (cid, cv)
        else {
          val s = new Array[Double](64)
          mem.groupBy(t => java.lang.Math.floorDiv(t._2, 4096L))
            .toSeq.sortBy(_._1)
            .foreach { case (_, rows) =>
              val p = new Array[Double](64)
              rows.sortBy(_._2).foreach { r =>
                var j = 0
                while (j < 64) { p(j) += r._3(j); j += 1 }
              }
              var j = 0
              while (j < 64) { s(j) += p(j); j += 1 }
            }
          var j = 0
          while (j < 64) { s(j) /= mem.length.toDouble; j += 1 }
          if (dot(s.toSeq, s.toSeq) > 0) (cid, s.toSeq) else (cid, cv)
        }
      }
    }
    val got = ext.Similarity.lloydRefineDistributed(e, seed, "vec_id",
        "embedding", 64, iters = 2, probes = g)
      .as[(Long, Seq[Double])].collect().toMap
    assert(got == ref.toMap) // exact double equality, both iterations
    // iters=0 is the identity on the seed frame
    val id0 = ext.Similarity.lloydRefineDistributed(e, seed, "vec_id",
        "embedding", 64, iters = 0)
      .as[(Long, Seq[Double])].collect().toMap
    assert(id0 == seed.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Seq[Double])].collect().toMap)
  }

  test("lloydRefineDistributed: empty cell and exact-cancellation mean " +
      "keep the previous centroid") {
    def unit(i: Int, s: Double): Seq[Double] =
      Seq.tabulate(64)(j => if (j == i) s else 0.0)
    // centroid 2 (-e1) is nobody's argmax -> empty, must survive as-is
    val corpus = Seq((10L, unit(0, 1.0)), (11L, unit(0, 2.0)),
      (12L, unit(0, 4.0))).toDF("vec_id", "embedding")
    val cents = Seq((1L, unit(0, 1.0)), (2L, unit(0, -1.0)))
      .toDF("vec_id", "embedding")
    val out = ext.Similarity.lloydRefineDistributed(corpus, cents,
        "vec_id", "embedding", 64, iters = 1, probes = 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == unit(0, (1.0 + 2.0 + 4.0) / 3.0))
    assert(out(2L) == unit(0, -1.0))
    // one centroid, two vectors cancelling exactly: zero-norm mean is
    // not a usable centroid (cosine undefined) -> keep previous
    val corpus2 = Seq((10L, unit(3, 1.0)), (11L, unit(3, -1.0)))
      .toDF("vec_id", "embedding")
    val cents2 = Seq((1L, unit(3, 1.0))).toDF("vec_id", "embedding")
    val out2 = ext.Similarity.lloydRefineDistributed(corpus2, cents2,
        "vec_id", "embedding", 64, iters = 1, probes = 1)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out2(1L) == unit(3, 1.0))
  }

  test("semanticNearDupPairs default == explicit seeded chain at the " +
      "derived cell count") {
    val e = Tables.embeddings(spark, sf)
    val auto = ext.Similarity.semanticNearDupPairs(e, "vec_id",
        "embedding", 64, tau = 0.30)
      .as[(Long, Long, Double)].collect().toSet
    // replay the auto sizing by hand: c = max(16, n/64), seeded
    // centroids (iters = 0), same sample rate
    val c = math.max(16L, e.count() / 64L).toInt
    val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
      64, c = c, iters = 0, sampleRate = 0.2)
    val manual = ext.Similarity.semanticNearDupPairs(e, cent, "vec_id",
        "embedding", 64, tau = 0.30, maxCell = 10000)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == manual)
  }

  test("prototypeScores: closed-form centroids, exclusions, and the " +
      "two-level fold contract on real embeddings") {
    // label 10: vectors (1,0,..), (0,1,..) -> centroid (.5,.5,0..):
    // both members score cos = .5/(1*sqrt(.5)) = sqrt(.5).
    // label 20: a single vector scores exactly 1.0.
    // excluded: null label, zero-norm vector, short vector.
    def v(xs: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(64)(0.0); xs.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    val rows = Seq(
      (1L, Some(10), v(0 -> 1.0)), (2L, Some(10), v(1 -> 1.0)),
      (3L, Some(20), v(2 -> 3.0)),
      (4L, None, v(0 -> 1.0)),          // null label
      (5L, Some(30), v()),              // zero norm
      (6L, Some(30), Seq(1.0, 2.0)))    // short vector
      .toDF("vec_id", "label", "embedding")
    val got = ext.Similarity.prototypeScores(rows, "vec_id", "embedding",
        64, "label")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 10L), (2L, 10L),
      (3L, 20L)))
    // replicate the operator's exact arithmetic (d/(sqrt·sqrt)), not
    // the algebraic sqrt(0.5) — 0.5/fl(sqrt(0.5)) can differ by 1 ulp
    val want = 0.5 / (math.sqrt(1.0) * math.sqrt(0.5))
    assert(got(0)._3 == want && got(1)._3 == want)
    assert(got(2)._3 == 1.0)
    // real embeddings: the operator equals a driver-side replay of the
    // SAME two-level fold (id-block shards then shard order), bit for
    // bit — the declared contract, not an incidental order
    val e = Tables.embeddings(spark, sf)
    val ops = ext.Similarity.prototypeScores(e, "vec_id", "embedding",
        64, "label")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> java.lang.Double.doubleToLongBits(t._3))
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }; s
    }
    val vs = e.select(col("vec_id").cast("long"),
        col("label").cast("long"), col("embedding"))
      .as[(Long, Option[Long], Array[Double])].collect()
      .collect { case (i, Some(g), x)
        if x != null && x.length >= 64 && dot(x, x) > 0 => (g, i, x) }
    val expect = vs.groupBy(_._1).toSeq.flatMap { case (g, members) =>
      val cent = new Array[Double](64)
      var n = 0L
      members.groupBy(m => java.lang.Math.floorDiv(m._2, 4096L)).toSeq
        .sortBy(_._1).foreach { case (_, shardRows) =>
          val s = new Array[Double](64)
          shardRows.sortBy(_._2).foreach { case (_, _, x) =>
            var j = 0; while (j < 64) { s(j) += x(j); j += 1 }
          }
          var j = 0; while (j < 64) { cent(j) += s(j); j += 1 }
          n += shardRows.length
        }
      var j = 0; while (j < 64) { cent(j) /= n.toDouble; j += 1 }
      if (dot(cent, cent) <= 0) Seq.empty[((Long, Long), Long)]
      else members.toSeq.map { case (_, i, x) =>
        (i, g) -> java.lang.Double.doubleToLongBits(
          dot(x, cent) / (math.sqrt(dot(x, x)) * math.sqrt(dot(cent, cent))))
      }
    }.toMap
    assert(ops.nonEmpty && ops == expect)
  }

  test("seasonal profile: closed-form anomaly, zero-variance position flags nothing") {
    // series 1, period 3, bucket 60 s: position 0 sees counts (2,2,2,8)
    // — mean 3.5, var (4+4+4+64)/4 - 12.25 = 6.75 — so 8 deviates 4.5 >
    // 1.5*sqrt(6.75)≈3.897 (anomaly at k=1.5) while 2 deviates 1.5 (not);
    // position 1 sees a CONSTANT count 5 (std 0): never anomalous.
    def burst(bucket: Long, n: Int): Seq[(Long, Long)] =
      (0 until n).map(i => (1L, bucket * 60L + i))
    val ev = (burst(0, 2) ++ burst(3, 2) ++ burst(6, 2) ++ burst(9, 8) ++
      burst(1, 5) ++ burst(4, 5) ++ burst(7, 5) ++ burst(10, 5))
      .toDF("user_id", "ts_sec")
    val got = hw.SeasonalProfile.anomalies(ev, Seq("user_id"), "ts_sec",
        bucketSec = 60L, period = 3, k = 1.5)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)]
      .collect().toSeq
    val pos0 = got.filter(_._3 == 0L)
    assert(pos0.map(_._5).distinct == Seq(3.5))
    assert(pos0.map(r => (r._2, r._7)) ==
      Seq((0L, false), (3L, false), (6L, false), (9L, true)))
    val pos1 = got.filter(_._3 == 1L)
    assert(pos1.map(_._6).distinct == Seq(0.0), "constant position std")
    assert(pos1.forall(!_._7), "zero-variance position must not flag")
  }

  test("streaming seasonal anomalies == the batch q100 operator, " +
      "bit for bit, with real micro-batch state") {
    import org.apache.spark.sql.functions.{col, lit}
    val pred = col("user_id") < 10
    val (streamed, st) = SparkEntry
      .streamingSeasonalQueryWithState(spark, sf, pred)
    val batch = hw.SeasonalProfile.anomalies(
        Tables.events(spark, sf).where(pred),
        Seq("user_id"), "ts_sec", bucketSec = 3600L, period = 24,
        k = 2.0)
      .orderBy("user_id", "bucket")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Double, Double, Boolean)]
        .collect().toSeq
        .map(r => (r._1, r._2, r._3, r._4,
          java.lang.Double.doubleToLongBits(r._5),
          java.lang.Double.doubleToLongBits(r._6), r._7))
    val sRows = rows(streamed)
    assert(sRows.nonEmpty && sRows == rows(batch))
    // the run is a REAL stateful micro-batch query: open tumbling
    // windows are state rows — at least one per observed (series,
    // hour) bucket while the watermark sits before them
    val m = st.getOrElse(fail("no state metrics from the streaming run"))
    assert(m.maxRows >= sRows.map(r => (r._1, r._2)).distinct.size)
  }

  test("robust median/MAD anomalies: flags the spike the mean/std " +
      "profile masks; exact integer medians") {
    def burst(bucket: Long, n: Int): Seq[(Long, Long)] =
      (0 until n).map(i => (1L, bucket * 60L + i))
    // pos 0 counts (5,5,5,50): median 5, MAD 0 -> the 50 flags (the
    // zero-MAD sharp edge: a strict-majority-constant position flags
    // ANY deviation). pos 1 constant (2,2,2,2): nothing. pos 2
    // (1,2,3,10): median 2, MAD 1, threshold 3*1.4826 = 4.4478 -> only
    // the 10 (adev 8) flags.
    val ev = (Seq(0L -> 5, 3L -> 5, 6L -> 5, 9L -> 50) ++
      Seq(1L -> 2, 4L -> 2, 7L -> 2, 10L -> 2) ++
      Seq(2L -> 1, 5L -> 2, 8L -> 3, 11L -> 10))
      .flatMap { case (b, n) => burst(b, n) }.toDF("user_id", "ts_sec")
    val got = hw.SeasonalProfile.robustAnomalies(ev, Seq("user_id"),
        "ts_sec", bucketSec = 60L, period = 3, k = 3.0)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got.map(_._2) == (0L to 11L))
    assert(got.filter(_._7).map(_._2) == Seq(9L, 11L))
    val byPos = got.groupBy(_._3)
    assert(byPos(0L).map(r => (r._5, r._6)).distinct == Seq((5L, 0L)))
    assert(byPos(1L).map(r => (r._5, r._6)).distinct == Seq((2L, 0L)))
    assert(byPos(2L).map(r => (r._5, r._6)).distinct == Seq((2L, 1L)))
    // the mean/std profile at k=2 MISSES the pos-0 spike — the 50
    // inflates its own position's std (16.25 ± 2·19.49 covers it).
    // This masking is exactly why the robust variant exists.
    val meanStd = hw.SeasonalProfile.anomalies(ev, Seq("user_id"),
      "ts_sec", bucketSec = 60L, period = 3, k = 2.0)
    assert(meanStd.where($"bucket" === 9L && $"is_anomaly").count() == 0L)
  }

  test("gap-filled seasonal profile: a planted silent hour flags; the " +
      "observed-only variant cannot see it") {
    // series 1, period 3, bucket 60 s, span buckets 0..11.
    // position 0 = buckets {0,3,6,9}: 5 events each EXCEPT bucket 9 —
    // the planted outage (zero events). Dense counts (5,5,5,0):
    // mean 3.75, var (75 - 56.25)/4 = 4.6875, std ≈ 2.165 — the zero
    // deviates 3.75 > 1.5*2.165 ≈ 3.248 (flags at k=1.5) while the 5s
    // deviate 1.25 (don't). positions 1/2 are constant (std 0).
    def burst(bucket: Long, n: Int): Seq[(Long, Long)] =
      (0 until n).map(i => (1L, bucket * 60L + i))
    val ev = (Seq(0L, 3L, 6L).flatMap(burst(_, 5)) ++
      Seq(1L, 4L, 7L, 10L).flatMap(burst(_, 2)) ++
      Seq(2L, 5L, 8L, 11L).flatMap(burst(_, 7)))
      .toDF("user_id", "ts_sec")
    val got = hw.SeasonalProfile.anomaliesGapFilled(ev, Seq("user_id"),
        "ts_sec", bucketSec = 60L, period = 3, k = 1.5)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)]
      .collect().toSeq
    assert(got.map(_._2) == (0L to 11L), "dense: every bucket present")
    assert(got.find(_._2 == 9L).get._4 == 0L, "outage bucket count 0")
    assert(got.filter(_._7).map(_._2) == Seq(9L),
      "exactly the silent hour flags")
    // the observed-only variant never emits bucket 9 — the documented
    // blind spot this variant exists to close
    val observed = hw.SeasonalProfile.anomalies(ev, Seq("user_id"),
      "ts_sec", bucketSec = 60L, period = 3, k = 1.5)
    assert(observed.where($"bucket" === 9L).count() == 0L)
    assert(observed.where($"is_anomaly").count() == 0L)
  }

  test("gap-filled == observed-only on dense data; profile join " +
      "falls back to a shuffle join bit-identically past the threshold") {
    // every (series, bucket) of the span occupied -> the grid adds
    // nothing and the two variants must agree row-for-row (bit compare)
    val ev = (for {
      u <- Seq(0L, 1L); b <- 0L until 12L
      i <- 0 until (1 + ((b + u) % 4)).toInt
    } yield (u, b * 60L + i)).toDF("user_id", "ts_sec")
    def bits(rows: Seq[(Long, Long, Long, Long, Double, Double, Boolean)]) =
      rows.map(r => (r._1, r._2, r._3, r._4,
        java.lang.Double.doubleToLongBits(r._5),
        java.lang.Double.doubleToLongBits(r._6), r._7))
    def run() = Seq(
      hw.SeasonalProfile.anomalies(ev, Seq("user_id"), "ts_sec",
        60L, 3, 1.0),
      hw.SeasonalProfile.anomaliesGapFilled(ev, Seq("user_id"), "ts_sec",
        60L, 3, 1.0)).map(_.orderBy("user_id", "bucket")
        .as[(Long, Long, Long, Long, Double, Double, Boolean)]
        .collect().toSeq)
    val rs = run(); val obs = rs(0); val dense = rs(1)
    assert(bits(obs) == bits(dense))
    // size gate: the profile join carries no broadcast hint — AQE
    // picks broadcast from the measured size; with the threshold off
    // (the unbounded-#series stand-in) it stays a shuffle join and the
    // values are bit-identical
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = hw.SeasonalProfile.anomaliesGapFilled(ev, Seq("user_id"),
        "ts_sec", 60L, 3, 1.0)
      val rows = df.orderBy("user_id", "bucket")
        .as[(Long, Long, Long, Long, Double, Double, Boolean)]
        .collect().toSeq
      assert(bits(rows) == bits(dense))
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "threshold off must force the shuffle-join fallback")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("gap-filled seasonal profile: loud grid cap, empty input") {
    val ev = Seq((1L, 0L), (1L, 7200L)).toDF("user_id", "ts_sec")
    val e = intercept[IllegalArgumentException] {
      hw.SeasonalProfile.anomaliesGapFilled(ev, Seq("user_id"), "ts_sec",
        bucketSec = 1L, period = 24, k = 2.0, maxGridBuckets = 100L)
    }
    assert(e.getMessage.contains("maxGridBuckets"))
    assert(hw.SeasonalProfile.anomaliesGapFilled(
      ev.where($"user_id" === 99L), Seq("user_id"), "ts_sec",
      60L, 24, 2.0).count() == 0L)
  }

  test("decontaminateAttribution: planted leak attributes to the right eval doc") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains eval 100's text
      (2L, "totally unrelated words with nothing shared here")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "beta gamma delta epsilon"), // 2 shingles, both inside doc 1
      (200L, "nothing shared anywhere")).toDF("doc_id", "text")
    val got = ext.Curation.decontaminateAttribution(corpus, eval,
        "doc_id", "text", k = 3, minHits = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 100L, 2L, 2L, 1.0)), got.toString)
  }
}
