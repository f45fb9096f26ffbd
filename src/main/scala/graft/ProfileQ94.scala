package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoders, Row}

/** Stage profile for the q94 candidate-verify chain at a given dir:
  * times mining, materialization, the semi-joined shingle pass, and the
  * final joins separately (the q16 stage-table idiom). Diagnostic only.
  */
object ProfileQ94 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables.documents(spark, dir)
    println(s"[prof] docs = ${t("docs.count")(d.count())}")
    val cand = t("mine+materialize cand") {
      ext.Dedup.materialize(
        ext.Dedup.lshCandidates(d, "doc_id", "text", 3, 16, 4)
          .select("id1", "id2"))
    }
    println(s"[prof] cand pairs = ${t("cand.count")(cand.count())}")
    val ids = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    println(s"[prof] distinct ids = ${t("ids.count")(ids.count())}")
    val sh = t("shingle pass+materialize") {
      ext.Dedup.materialize(ext.Dedup.shingleArrays(
        d.join(broadcast(ids), Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3))
    }
    println(s"[prof] sh rows = ${t("sh.count")(sh.count())}")
    val joined = cand
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
    val inter = size(array_intersect(col("sh1"), col("sh2")))
    val mn = least(size(col("sh1")), size(col("sh2")))
    val out = joined.select(col("id1"), col("id2"),
        (inter.cast("double") / mn.cast("double")).as("containment"))
      .where(col("containment") >= 0.6)
    println(s"[prof] out rows = ${t("verify joins+filter")(out.count())}")
    spark.stop()
  }
}

/** q94 at REALISTIC duplicate density: the standard scale replicas are
  * duplicate-saturated by construction (90% of docs candidate-touching
  * at every K — SCALE.md), so their q94 wall band measures a verify
  * payload that IS ~the corpus. Production corpora are the opposite:
  * a few percent of docs carry the near-dup mass. This builder plants
  * exactly that shape — 98% of docs salted per-doc-unique (zero
  * cross-doc shingle sharing), 2% drawn from shared templates in
  * clone-groups of 4 — and times the full q94 operator body at 1× and
  * K×, reporting candidate fraction alongside wall so the
  * candidates-fraction → wall model is a measured number. The
  * semi-join's payoff claim (assembly ∝ candidates when candidates ≪
  * corpus, `ext/Dedup.scala` candidateShingleJoin) is exactly what
  * this measures. Diagnostic only; the q94 oracle is untouched. */
object ProfileQ94Sparse {
  private def ensureSparse(spark: org.apache.spark.sql.SparkSession,
      base: String, out: String, k: Int): Unit = {
    val marker = java.nio.file.Paths.get(out, "_built")
    val stamp = s"$base x$k sparse-v1"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        "UTF-8") == stamp) return
    store.RrdStore.deleteTree(out)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val docs = Tables.table(spark, base, "documents")
    val reps = (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val salted = regexp_replace(col("text"), lit("(\\S+)"),
      concat(lit("u"), col("doc_id").cast("string"), lit("x$1")))
    // ids ≡ 0 (mod 50) within one 200-id block → 4 clones per group
    val planted = expr("array_join(transform(sequence(1, 40), " +
      "j -> concat('g', CAST(doc_id div 200 AS STRING), 'w', " +
      "CAST(j AS STRING))), ' ')")
    reps.withColumn("text",
        when(col("doc_id") % 50 === 0, planted).otherwise(salted))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    java.nio.file.Files.write(marker, stamp.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def q94(dir: String) = {
      val joined = ext.Dedup.candidateShingleJoin(
        Tables.documents(spark, dir), "doc_id", "text", 3, 16, 4)
      val inter = size(array_intersect(col("sh1"), col("sh2")))
      val mn = least(size(col("sh1")), size(col("sh2")))
      joined.select(col("id1"), col("id2"),
          (inter.cast("double") / mn.cast("double")).as("containment"))
        .where(col("containment") >= 0.6)
    }
    val d1 = s"/tmp/graft_scale/sparse_x1"
    val dk = s"/tmp/graft_scale/sparse_x$k"
    ensureSparse(spark, base, d1, 1)
    ensureSparse(spark, base, dk, k)
    // session warm-up (the ScaleBench idiom)
    spark.range(1000).groupBy((col("id") % 4).as("g"))
      .agg(expr("bit_xor(xxhash64(id))")).collect()
    def stats(dir: String): Unit = {
      val d = Tables.documents(spark, dir)
      val cand = ext.Dedup.lshCandidates(d, "doc_id", "text", 3, 16, 4)
        .select("id1", "id2")
      val ids = cand.select(col("id1").as("i"))
        .union(cand.select(col("id2").as("i"))).distinct().count()
      println(s"[sparse] $dir docs=${d.count()} candPairs=${cand.count()} " +
        s"candDocs=$ids")
    }
    stats(d1); stats(dk)
    def run(dir: String, tag: String): Double = {
      val t0 = System.nanoTime()
      val n = q94(dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[sparse] $tag wall=$s%.2f s outPairs=$n")
      s
    }
    val a1 = run(d1, s"x1 sample1"); val b1 = run(d1, "x1 sample2")
    val ak = run(dk, s"x$k sample1"); val bk = run(dk, s"x$k sample2")
    println(f"[sparse] ratios: cold ${ak / a1}%.2f warm ${bk / b1}%.2f " +
      f"warmK/coldBase ${bk / a1}%.2f")
    // q107 (duplicate-span removal) on the same realistic-density
    // corpora: hit mass ∝ the planted 2% dup fraction, not the corpus
    def run107(dir: String, tag: String): Double = {
      val t0 = System.nanoTime()
      val kept = ext.Dedup.removeDuplicateSpans(
          Tables.documents(spark, dir), "doc_id", "text", 8)
        .agg(sum(col("n_tok") - col("kept_tokens"))).head.getLong(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[sparse] q107 $tag wall=$s%.2f s removedTokens=$kept")
      s
    }
    val r1a = run107(d1, "x1 sample1"); val r1b = run107(d1, "x1 sample2")
    val rka = run107(dk, s"x$k sample1")
    val rkb = run107(dk, s"x$k sample2")
    println(f"[sparse] q107 ratios: cold ${rka / r1a}%.2f " +
      f"warm ${rkb / r1b}%.2f")
    // the rewrite FLOOR: tokenizing + re-joining every document with
    // no dedup at all — the irreducible corpus-byte re-materialization
    // any text-rewrite operator pays
    def floor(dir: String, tag: String): Double = {
      val t0 = System.nanoTime()
      val n = Tables.documents(spark, dir)
        .select(xxhash64(array_join(
          ext.TextAnalysis.words(col("text")), " ")).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[sparse] rewrite-floor $tag wall=$s%.2f s (h=$n)")
      s
    }
    val f1 = math.min(floor(d1, "x1"), floor(d1, "x1b"))
    val fk = math.min(floor(dk, s"x$k"), floor(dk, s"x${k}b"))
    println(f"[sparse] rewrite-floor ratio ${fk / f1}%.2f")
    // isolate the shared dupGramHits cost: the q82 coverage REPORT on
    // the same corpora pays the same gram kernel + exchange + dup join
    // but none of the rebuild
    def run82(dir: String, tag: String): Double = {
      val t0 = System.nanoTime()
      val n = ext.Dedup.ngramDupCoverage(
        Tables.documents(spark, dir), "doc_id", "text", 8).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[sparse] q82 $tag wall=$s%.2f s rows=$n")
      s
    }
    val g1 = math.min(run82(d1, "x1"), run82(d1, "x1b"))
    val gk = math.min(run82(dk, s"x$k"), run82(dk, s"x${k}b"))
    println(f"[sparse] q82 ratio ${gk / g1}%.2f")
    spark.stop()
  }
}

/** Stage profile for the auto-cells SemDeDup shape (q99_auto_cells):
  * separates centroid seeding (sample collect), the n·c assignment
  * scan, and the within-cell pair mining, at a given dir — the
  * auto-sized quantizer makes pair work linear (Σ|cell|² ≈ n·occ) but
  * assignment is n·c cosines with c ∝ n, the declared index-build
  * cost. Diagnostic only. */
object ProfileQ99 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val nProbes = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof99] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.documents(spark, dir).sparkSession // warm nothing
    val emb = Tables.embeddings(spark, dir)
    val n = t("corpus count")(emb.count())
    val c = math.max(16L, n / 64L).toInt
    println(s"[prof99] n=$n c=$c")
    val cent = t("seed centroids (collect)") {
      val df = ext.Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        64, c = c, iters = 0, sampleRate = 0.2)
      df.count(); df
    }
    val assigned = t("assignment scan + materialize") {
      ext.Dedup.materialize(
        ext.Similarity.ivfIndex(emb, cent, "vec_id", "embedding", 64)
          .where(org.apache.spark.sql.functions.col("norm") > 0))
    }
    val cells = assigned.groupBy("cell")
      .agg(count(lit(1)).as("m"))
    val occ = cells.agg(sum(col("m")).as("n"),
      sum(col("m") * col("m")).as("s2")).head
    println(s"[prof99] cells: sum=${occ.getLong(0)} sumSq=${occ.getLong(1)}")
    val pairs = t("within-cell pair mining") {
      // the q99 kernel over the PRE-ASSIGNED frame: isolates pair work
      import spark.implicits._
      assigned.select(col("cell"), col("vec_id").cast("long"),
          col("embedding"), col("norm"))
        .as[(Long, Long, Array[Double], Double)]
        .groupByKey(_._1)
        .flatMapGroups { (_, it) =>
          val buf = it.toArray
          if (buf.length > 10000) Iterator.empty
          else {
            var s = 0L
            for (i <- buf.indices.iterator; j <- (i + 1) until buf.length) {
              val a = buf(i); val b = buf(j)
              var d = 0.0; var k = 0
              while (k < 64) { d += a._3(k) * b._3(k); k += 1 }
              if (d / (a._4 * b._4) >= 0.40) s += 1
            }
            Iterator.single(s)
          }
        }.reduce(_ + _)
    }
    println(s"[prof99] pairs >= tau: $pairs")
    // probed two-level assignment: wall + agreement with the exact
    // argmax + pair recall (the boundary-loss number)
    val probedAsg = t(s"probed assignment ($nProbes) + mat") {
      ext.Dedup.materialize(
        ext.Similarity.ivfIndexProbed(emb, cent, "vec_id", "embedding",
            64, probes = nProbes)
          .where(org.apache.spark.sql.functions.col("norm") > 0))
    }
    val agree = probedAsg.select(col("vec_id"), col("cell").as("pc"))
      .join(assigned.select(col("vec_id"), col("cell").as("ec")), "vec_id")
      .select(sum(when(col("pc") === col("ec"), 1L).otherwise(0L)),
        count(lit(1))).head
    println(s"[prof99] probed agreement: ${agree.getLong(0)}/" +
      s"${agree.getLong(1)}")
    import spark.implicits._
    val exactPairs = t("exact pairs") {
      ext.Similarity.semanticNearDupPairs(emb, cent, "vec_id",
          "embedding", 64, tau = 0.40, maxCell = 10000)
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    }
    val probedPairs = t("probed pairs") {
      ext.Similarity.semanticNearDupPairsProbed(emb, cent, "vec_id",
          "embedding", 64, tau = 0.40, probes = nProbes)
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    }
    val hit = (exactPairs & probedPairs).size
    println(s"[prof99] pair recall: $hit/${exactPairs.size} " +
      f"(${if (exactPairs.isEmpty) 1.0 else hit.toDouble / exactPairs.size}%.4f)")
    spark.stop()
  }
}

/** Stage profile for q79 (perceptual image near-dup pairs): separates
  * the corpus-linear PNG encode→decode→aHash pass from the banded
  * Hamming join + kernel verify, and counts the candidate volume the
  * join feeds the verify. Diagnostic only. */
object ProfileQ79 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
    val grid = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cells = grid * grid
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // same planted corpus as q79 (SparkEntry)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"),
        conv(substring(md5(expr("doc_id div 12").cast("string")), 1, 15),
          16, 10).cast("long").as("seed"))
    val paySchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val pngs = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val seed = r.getLong(1)
        val variant = id % 12 >= 10
        val c = (id % cells).toInt
        val px = Array.tabulate(cells) { k =>
          val base = ((seed / (1L << (8 * (k % 7)))) % 256 + 23L * k) % 256
          (if (variant && k == c) (base + 128) % 256 else base).toByte
        }
        Row(id, ext.Multimodal.ImageCodec.encodeGrayPng(grid, grid, px))
      }
    }(Encoders.row(paySchema))
    val media = ext.Multimodal.asMedia(pngs, "doc_id", "payload", "image/png")
    val hashes0 = ext.Multimodal.imageAHash(media, "doc_id", grid)
    val hashes = t("png encode+decode+aHash")(hashes0.localCheckpoint(true))
    println(s"[prof] hashes = ${hashes.count()}")
    // candidate volume the band join emits (pre-verify)
    val bl = cells / 4
    val banded = hashes.select(col("doc_id"), col("ahash"),
        explode(array((0 until 4).map(b => struct(lit(b).as("bi"),
          substring(col("ahash"), b * bl + 1, bl).as("bv"))): _*)).as("b"))
      .select(col("doc_id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = banded.select(col("bi"), col("bv"), col("doc_id").as("id1"))
    val bb = banded.select(col("bi"), col("bv"), col("doc_id").as("id2"))
    val nCand = t("band join candidate count") {
      a.join(bb, Seq("bi", "bv")).where(col("id1") < col("id2")).count()
    }
    println(s"[prof] candidates (with band dups) = $nCand")
    val pairs = ext.Multimodal.aHashNearDupPairs(hashes, "doc_id", "ahash",
      bands = 4, maxHamming = 3, hashBits = cells)
    println(s"[prof] pairs = ${t("band join + verify + distinct")(pairs.count())}")
    spark.stop()
  }
}
