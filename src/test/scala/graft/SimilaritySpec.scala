package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Embedding near-dup coverage over constructed clusters (the testdata
  * embeddings have no pairs above cosine ~0.5, so the operator is
  * exercised on vectors with known near-duplicates). */
class SimilaritySpec extends SparkSuite {

  test("cosineNearDupPairs finds perturbed duplicates, not cross-cluster pairs") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    // 10 cluster centers; each contributes an original + a 1%-perturbed
    // copy (near-dup) — plus lone noise vectors
    val rows = (0 until 10).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val near = base.map(x => x * (1 + 0.01 * rnd.nextDouble()))
      Seq((c.toLong * 2, base.map(_.toFloat).toSeq),
        (c.toLong * 2 + 1, near.map(_.toFloat).toSeq))
    } ++ (100 until 110).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)
        .map(_.toFloat).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        dim, tau = 0.999, planes = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // every constructed near-dup pair is found
    val expected = (0 until 10).map(c => (c.toLong * 2, c.toLong * 2 + 1)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected -- pairs}")
    // and nothing across clusters sneaks past tau
    assert(pairs.forall { case (a, b) => b == a + 1 && a % 2 == 0 })
  }

  test("ivfTopK: probing every cell reproduces brute force exactly") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(11)
    val rows = (0L until 60L).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
    val q = corpus.where(col("vec_id") < 5)
    val cent = corpus.where(col("vec_id") < 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    val bf = key(Similarity.bruteForceTopK(q, corpus, "vec_id",
      "embedding", dim, 3))
    // nprobe = C degenerates to exhaustive search: candidates = corpus
    val all = key(Similarity.ivfTopK(q, corpus, cent, "vec_id",
      "embedding", dim, 3, nprobe = 4))
    assert(all == bf)
    // nprobe < C returns at most k candidates per query, all from the
    // probed cells — a subset check against brute-force scores
    val few = Similarity.ivfTopK(q, corpus, cent, "vec_id",
      "embedding", dim, 3, nprobe = 2)
    assert(few.groupBy("query_id").count()
      .as[(Long, Long)].collect().forall(_._2 <= 3))
  }

  test("ivfTopKIndexed over a materialized index == the fused ivfTopK") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(23)
    val rows = (0L until 80L).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
    val q = corpus.where(col("vec_id") < 6)
    val cent = corpus.where(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
    val fused = key(Similarity.ivfTopK(q, corpus, cent, "vec_id",
      "embedding", dim, 3, nprobe = 2))
    // the index round-trips through parquet partitioned by cell, the
    // production layout — a probe reads only its cells' partitions
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf")
      .toString + "/idx"
    Similarity.ivfIndex(corpus, cent, "vec_id", "embedding", dim)
      .write.partitionBy("cell").parquet(dir)
    val indexed = key(Similarity.ivfTopKIndexed(q,
      spark.read.parquet(dir), cent, "vec_id", "embedding", dim, 3,
      nprobe = 2))
    assert(indexed == fused)
  }

  test("connectedComponents: min-label groups over pair chains") {
    import spark.implicits._
    // two chains (1-2-3, via separate pairs) and an island (8-9); 5 is
    // only reachable through 3 -> same component as 1
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 5L), (8L, 9L))
      .toDF("id1", "id2")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      8L -> 8L, 9L -> 8L)
    // both branches must agree: driver union-find (small graphs) and
    // the distributed pointer-jumping loop (forced via the threshold)
    val viaDriver = ext.Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    val viaLoop = ext.Dedup.connectedComponents(pairs, "id1", "id2",
        maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == want)
    assert(viaLoop == want)
  }

  test("connectedComponents frees every intermediate checkpoint") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    // force the distributed loop — this spec is about ITS checkpoints
    val cc = ext.Dedup.connectedComponents(pairs, "id1", "id2",
      maxDriverEdges = 0L)
    assert(cc.as[(Long, Long)].collect().forall(_._2 == 1L))
    // a 40-node chain runs several pointer-jump rounds; only the FINAL
    // round's checkpoint may remain materialized (it backs the result)
    val added = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(added.size <= 1, s"lingering intermediate checkpoints: $added")
  }

  test("incremental LSH == full mine restricted to pairs touching the batch") {
    import spark.implicits._
    def doc(i: Long) =
      (i, s"the quick brown fox ${i % 9} jumps over the lazy dog ${i % 4}")
    val corpus = (0L until 60L).map(doc).toDF("doc_id", "text")
    val batch = (60L until 80L).map(doc).toDF("doc_id", "text")
    val full = ext.Dedup.lshCandidates(
        corpus.unionByName(batch), "doc_id", "text")
      .where(col("id1") >= 60 || col("id2") >= 60)
      .as[(Long, Long, Double)].collect().toSet
    val index = ext.Dedup.lshIndex(corpus, "doc_id", "text")
    val inc = ext.Dedup.incrementalLshCandidates(batch, index,
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(full.nonEmpty, "constructed corpus must produce candidates")
    assert(inc == full)
    // and no corpus-internal pair sneaks in
    assert(inc.forall { case (i1, i2, _) => i1 >= 60 || i2 >= 60 })
  }

  test("incremental SimHash == full mine restricted to batch pairs") {
    import spark.implicits._
    def doc(i: Long) =
      (i, s"the quick brown fox ${i % 9} jumps over the lazy dog ${i % 4}")
    val all = (0L until 80L).map(doc).toDF("doc_id", "text")
    val sigs = ext.Dedup.simhashSignatures(all, "doc_id", "text", 16)
    val full = ext.Dedup.simhashCandidates(sigs, "doc_id", "sig", 16, 4)
      .where(col("id1") >= 60 || col("id2") >= 60)
      .select("id1", "id2", "sig1", "sig2", "hamming")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    val idx = ext.Dedup.simhashIndex(
      sigs.where(col("doc_id") < 60), "doc_id", "sig", 16, 4)
    val inc = ext.Dedup.incrementalSimhashCandidates(
        sigs.where(col("doc_id") >= 60), idx, "doc_id", "sig", 16, 4)
      .select("id1", "id2", "sig1", "sig2", "hamming")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(full.nonEmpty, "constructed corpus must produce candidates")
    assert(inc == full)
    assert(inc.forall { case (i1, i2, _, _, _) => i1 >= 60 || i2 >= 60 })
  }

  test("simhashSignatures kernel is bit-identical to the column form") {
    import spark.implicits._
    val docs = (0 until 80).map(i =>
      (i.toLong, s"The Quick  brown fox ${i % 7} jumps over the lazy dog " +
        s"${i % 3} and token$i")).toDF("doc_id", "text")
    val colForm = docs
      .select(col("doc_id"), ext.Dedup.simhash(col("text"), 16).as("sig"))
      .as[(Long, Long)].collect().toMap
    val kernel = ext.Dedup.simhashSignatures(docs, "doc_id", "text", 16)
      .as[(Long, Long)].collect().toMap
    assert(kernel == colForm)
    // signatures are non-degenerate on this corpus
    assert(kernel.values.toSet.size > 1)
  }

  test("minhashSignatures kernel is bit-identical to the column form") {
    import spark.implicits._
    val docs = (0 until 80).map(i =>
      (i.toLong, s"The Quick  brown fox ${i % 7} jumps over the lazy dog " +
        s"${i % 3} and token$i")).toDF("doc_id", "text")
    val colForm = docs.select(col("doc_id"), ext.Dedup.minhashSignature(
        ext.Dedup.shingles(col("text"), 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val kernel = ext.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(kernel == colForm) // 60/56-bit integer arithmetic: exact
    assert(kernel.values.flatten.toSet.size > 16)
  }

  test("keyedNormed kernel is bit-identical to the column forms") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 16
    val vecs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val colForm = vecs.select(col("vec_id"),
        ext.Similarity.norm(col("embedding"), dim).as("norm"),
        ext.Similarity.hyperplaneKey(col("embedding"), dim, 6).as("bucket"))
      .as[(Long, Double, Long)].collect()
      .map { case (i, n, b) => (i, (n, b)) }.toMap
    val kernel = ext.Similarity.keyedNormed(vecs, "vec_id", "embedding",
        dim, 6)
      .select(col("vec_id"), col("norm"), col("bucket"))
      .as[(Long, Double, Long)].collect()
      .map { case (i, n, b) => (i, (n, b)) }.toMap
    assert(kernel == colForm) // doubles compared exactly: same fold order
    assert(kernel.values.map(_._2).toSet.size > 1)
  }

  test("null-text docs never become LSH candidates in either family") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, null), (4L, null))
      .toDF("doc_id", "text")
    // minhash: a null signature must not band — concat_ws would give
    // every null-sig doc IDENTICAL keys and pair 3-4 spuriously
    val cand = ext.Dedup.lshCandidates(docs, "doc_id", "text")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L)), cand.toString)
    // simhash kernel: null text → null signature (the column form's
    // null propagation), whose band keys null out and never join
    val sigs = ext.Dedup.simhashSignatures(docs, "doc_id", "text", 16)
    assert(sigs.where(col("doc_id") >= 3)
      .where(col("sig").isNotNull).count() == 0)
    val sc = ext.Dedup.simhashCandidates(sigs, "doc_id", "sig", 16, 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(sc == Set((1L, 2L)), sc.toString)
  }

  test("null and short corpus vectors are dropped, not fatal") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(5)
    val good = (0L until 20L).map(i =>
      (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val dirty = good.toDF("vec_id", "embedding")
      .unionByName(Seq((98L, Seq(0.5, 0.5)), (99L, null))
        .toDF("vec_id", "embedding"))
    // the column forms null-propagated such rows out of every result;
    // the typed kernels must drop them the same way instead of NPEing
    val bf = Similarity.bruteForceTopK(dirty.where(col("vec_id") < 3),
      dirty, "vec_id", "embedding", dim, 3)
    assert(!bf.select("neighbor_id").as[Long].collect().exists(_ >= 98))
    val nd = Similarity.cosineNearDupPairs(dirty, "vec_id", "embedding",
      dim, tau = 0.0, planes = 3)
    assert(!nd.select("id1", "id2").as[(Long, Long)].collect()
      .exists { case (a, b) => a >= 98 || b >= 98 })
    val cent = dirty.where(col("vec_id") < 4)
    val ivf = Similarity.ivfTopK(dirty.where(col("vec_id") < 3), dirty,
      cent, "vec_id", "embedding", dim, 3, nprobe = 4)
    assert(!ivf.select("neighbor_id").as[Long].collect().exists(_ >= 98))
    // contract-small frames (queries/centroids) fail LOUDLY instead —
    // on the collected paths AND on lshTopK's distributed query side
    val e = intercept[Exception](Similarity.bruteForceTopK(
      dirty.where(col("vec_id") >= 98), dirty, "vec_id", "embedding",
      dim, 3))
    assert(e.getMessage.contains("null or shorter"), e.getMessage)
    val e2 = intercept[Exception](Similarity.lshTopK(
      dirty.where(col("vec_id") >= 98), dirty, "vec_id", "embedding",
      dim, 3).count())
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e2).exists(c => Option(c.getMessage)
      .exists(_.contains("null or shorter"))), e2.toString)
  }

  test("candidate operators leave no lingering cached RDDs") {
    import spark.implicits._
    // Round-2 defect: operator-internal persist() accreted cached blocks
    // per call. The candidate operators are now single-pass (exchange
    // reuse), so they must add zero persistent RDDs. Compared as a diff:
    // an earlier connectedComponents result frame may legitimately hold
    // its final checkpoint until GC.
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val docs = (0 until 50).map(i =>
      (i.toLong, s"the quick brown fox ${i % 7} jumps over dog $i")).toDF("doc_id", "text")
    ext.Dedup.lshCandidates(docs, "doc_id", "text").count()
    val sigs = docs.select(col("doc_id"), ext.Dedup.simhash(col("text"), 16).as("sig"))
    ext.Dedup.simhashCandidates(sigs, "doc_id", "sig", 16, 4).count()
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq.fill(8)((i % 5).toFloat + 0.1f))).toDF("vec_id", "embedding")
    Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 8, 0.99, planes = 4).count()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
  }

  // LAST in the suite: setCheckpointDir is session-global and has no
  // unset — every later connectedComponents call in this session would
  // take the reliable path
  test("connectedComponents under a checkpoint dir: reliable rounds, " +
      "same groups, no cached RDDs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id1", "id2")
    // force the distributed loop throughout — this spec is about the
    // reliable-checkpoint ROUNDS, which the driver path has none of
    val local = ext.Dedup.connectedComponents(pairs, "id1", "id2",
        maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val rel = ext.Dedup.connectedComponents(pairs, "id1", "id2",
        maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(rel == local)
    assert(rel == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // reliable rounds write checkpoint files instead of caching blocks
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    def walk(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { s =>
        s.iterator().asScala.toSeq
      }
    }
    assert(walk(java.nio.file.Paths.get(dir))
      .exists(java.nio.file.Files.isRegularFile(_)), "no checkpoint files")
    // per-round cleanup must actually delete superseded checkpoints:
    // only the FINAL labels checkpoint may survive (edges and every
    // intermediate round are freed as soon as the next materializes)
    val rddDirs = walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-"))
    assert(rddDirs.size == 1,
      s"leaked per-round checkpoints: ${rddDirs.map(_.getFileName)}")
  }

  test("ImageCodec: gray PNG round-trips pixel-exactly; RGB converts") {
    import spark.implicits._
    val px = Array.tabulate(6 * 4)(k => ((k * 37 + 11) % 256).toByte)
    val bytes = ext.Multimodal.ImageCodec.encodeGrayPng(6, 4, px)
    // a real PNG container: magic bytes + decodes back bit-exactly
    assert((bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N' &&
      (bytes(3) & 0xff) == 'G')
    val (w, h, back) = ext.Multimodal.ImageCodec.decodeGray(bytes)
    assert(w == 6 && h == 4)
    assert(back.toSeq == px.map(_ & 0xff).toSeq)
    // non-gray input goes through the luminance conversion, same dims
    val rgb = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xff0000); rgb.setRGB(2, 1, 0x00ff00)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    val (w2, h2, px2) = ext.Multimodal.ImageCodec.decodeGray(bos.toByteArray)
    assert(w2 == 3 && h2 == 2 && px2.length == 6)
    assert(px2.forall(v => v >= 0 && v <= 255))
    // decodeImageFeatures end-to-end over a tiny media frame
    val df = Seq((1L, bytes)).toDF("id", "payload")
    val media = ext.Multimodal.asMedia(df, "id", "payload", "image/png")
    val feats = ext.Multimodal.decodeImageFeatures(media, "id").collect()
    assert(feats.length == 1)
    val r = feats.head
    assert(r.getInt(1) == 6 && r.getInt(2) == 4)
    val exp = px.map(_ & 0xff)
    assert(r.getDouble(3) == exp.map(_.toLong).sum.toDouble / 24)
    assert(r.getLong(4) ==
      exp.zipWithIndex.map { case (v, k) => v.toLong * (k + 1) }.sum
        % 1000000007L)
  }

  test("nearest-neighbor resize: exact floor mapping, identity at 1:1") {
    import spark.implicits._
    // 4x2 source, distinct values: downscale to 2x1 picks (0,0) and (2,0)
    val px = Array(10, 20, 30, 40, 50, 60, 70, 80)
    assert(ext.Multimodal.resizeGrayNearest(4, 2, px, 2, 1).toSeq ==
      Seq(10, 30))
    // upscale 2x1 -> 4x2 replicates each source pixel 2x2
    assert(ext.Multimodal.resizeGrayNearest(2, 1, Array(1, 2), 4, 2).toSeq ==
      Seq(1, 1, 2, 2, 1, 1, 2, 2))
    // identity resize is the identity
    assert(ext.Multimodal.resizeGrayNearest(4, 2, px, 4, 2).toSeq == px.toSeq)
    // end-to-end through the REAL codec: encode -> resize op -> decode
    val df = Seq((1L, ext.Multimodal.ImageCodec
      .encodeGrayPng(4, 2, px.map(_.toByte)))).toDF("id", "payload")
    val media = ext.Multimodal.asMedia(df, "id", "payload", "image/png")
    val out = ext.Multimodal.resizeImages(media, "id", 2, 1).collect().head
    val (w2, h2, px2) = ext.Multimodal.ImageCodec.decodeGray(
      out.getAs[Array[Byte]](1))
    assert(w2 == 2 && h2 == 1 && px2.toSeq == Seq(10, 30))
  }

  test("imageAHash: known bit pattern, scale invariance through the codec") {
    import spark.implicits._
    // 8x8: top half 10, bottom half 200 -> mean 105 -> bits 0^32 1^32
    val small = Array.tabulate(64)(k => (if (k < 32) 10 else 200).toByte)
    // same image upscaled 2x: nearest-resize back to 8x8 is the identity
    // on the block structure, so the perceptual hash must not change
    val big = Array.tabulate(16 * 16)(k =>
      (if (k / 16 < 8) 10 else 200).toByte)
    val df = Seq(
      (1L, ext.Multimodal.ImageCodec.encodeGrayPng(8, 8, small)),
      (2L, ext.Multimodal.ImageCodec.encodeGrayPng(16, 16, big))
    ).toDF("id", "payload")
    val media = ext.Multimodal.asMedia(df, "id", "payload", "image/png")
    val got = ext.Multimodal.imageAHash(media, "id")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "0" * 32 + "1" * 32)
    assert(got(2L) == got(1L), "aHash must be scale-invariant here")
  }

  test("aHashNearDupPairs: banding finds hamming<=3, verify gates the rest") {
    import spark.implicits._
    val base = "0" * 64
    def flip(s: String, is: Int*): String = {
      val a = s.toCharArray
      is.foreach(i => a(i) = if (a(i) == '0') '1' else '0')
      new String(a)
    }
    val hashes = Seq(
      1L -> base,
      2L -> flip(base, 0, 20, 40),          // 3 bits, 3 bands -> pair
      3L -> flip(base, 5),                  // 1 bit -> pair with 1 (and 2: 4 bits but bands 1..3 of doc 3 match base... doc2 vs doc3 share band 3)
      4L -> flip(base, 1, 17, 33, 49)       // 1 bit per band: candidate of nobody except via... shares NO band with base
    ).toDF("doc_id", "ahash")
    val got = ext.Multimodal.aHashNearDupPairs(hashes, "doc_id", "ahash")
      .as[(Long, Long, Long)].collect().toSet
    // (1,2): hamming 3, bands 4 untouched for band 3 -> found
    assert(got.contains((1L, 2L, 3L)))
    // (1,3): hamming 1 -> found
    assert(got.contains((1L, 3L, 1L)))
    // (1,4): hamming 4 with every band touched -> no shared band, and
    // over maxHamming anyway -> absent
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L))
    // (2,3): hamming 4 -> candidates share untouched band 4 but the
    // exact verify rejects them
    assert(!got.exists(p => p._1 == 2L && p._2 == 3L))
  }

  test("WAV codec: PCM16 round trip, chunk walking, feature math") {
    import spark.implicits._
    val samples = Array[Short](0, 100, -200, 300, -32768, 32767, -1, 0)
    val wav = ext.Multimodal.WavCodec.encodePcm16(16000, samples)
    val (rate, back) = ext.Multimodal.WavCodec.decodePcm16(wav)
    assert(rate == 16000 && back.toSeq == samples.toSeq)
    // a real-world container with a LIST chunk between fmt and data
    // (odd-sized, exercising RIFF padding) must decode identically
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // pad to even
    val spliced = wav.slice(0, 36) ++ listChunk ++ wav.slice(36, wav.length)
    // fix the RIFF size field for the inserted bytes
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + listChunk.length)
    val (rate2, back2) = ext.Multimodal.WavCodec.decodePcm16(spliced)
    assert(rate2 == 16000 && back2.toSeq == samples.toSeq)
    // features end-to-end: mean/rms/zc/checksum over a known signal
    val df = Seq((7L, wav)).toDF("id", "payload")
    val media = ext.Multimodal.asMedia(df, "id", "payload", "audio/wav")
    val r = ext.Multimodal.decodeAudioFeatures(media, "id").collect().head
    assert(r.getInt(1) == 16000 && r.getLong(2) == 8L)
    assert(r.getDouble(3) == samples.map(_.toLong).sum.toDouble / 8)
    assert(r.getDouble(4) ==
      math.sqrt(samples.map(v => v.toDouble * v).sum / 8))
    // sign flips over >= 0: 100->-200, -200->300, 300->-32768,
    // -32768->32767, 32767->-1, -1->0
    assert(r.getLong(5) == 6L)
    val chk = samples.zipWithIndex.map { case (v, k) =>
      v.toLong * (k + 1) }.sum
    assert(r.getLong(6) == ((chk % 1000000007L) + 1000000007L) % 1000000007L)
  }

  test("WAV codec: odd-sized data chunk BEFORE fmt keeps the walk aligned") {
    // RIFF allows any chunk order; an odd-sized data chunk must leave
    // the cursor at the padded end or fmt parsing misaligns by 1-2 bytes
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0) // size fixed below
      .put("WAVE".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(7) // 3 samples + stray byte
      .putShort(10).putShort(-20).putShort(30).put(9.toByte)
      .put(0.toByte)                              // RIFF odd-size pad
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16)
    val arr = java.util.Arrays.copyOf(bb.array(), bb.position())
    java.nio.ByteBuffer.wrap(arr)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, arr.length - 8)
    val (rate, back) = ext.Multimodal.WavCodec.decodePcm16(arr)
    assert(rate == 16000 && back.toSeq == Seq[Short](10, -20, 30))
  }

  test("MJPEG AVI: DC-only frames round-trip bit-exactly; lossy otherwise") {
    // block-solid 16x16 frames: the q73 exactness contract — at
    // quality 1.0 the quant tables are all-ones, so frames whose 8x8
    // blocks are each solid (AC coefficients exactly zero) decode back
    // to the planted pixels
    val (w, h) = (16, 16)
    val mk = (seed: Int) => Array.tabulate(w * h) { k =>
      val b = (k / 128) * 2 + (k % 16) / 8
      ((seed + 53 * b) % 256).toByte
    }
    val frames = Seq(mk(7), mk(131), mk(250))
    val avi = ext.Multimodal.AviCodec.encodeGrayMjpegAvi(w, h, 10, frames)
    // structural validity a conforming consumer needs: the frame chunks
    // must sit inside a 'LIST'+size+'movi' chunk, not at RIFF top level
    val s = new String(avi, "ISO-8859-1")
    val movi = s.indexOf("movi")
    assert(movi >= 8 && s.substring(movi - 8, movi - 4) == "LIST",
      "frames must live inside a LIST movi chunk")
    val (w2, h2, got) = ext.Multimodal.AviCodec.decodeGrayFrames(avi)
    assert(w2 == w && h2 == h && got.length == 3)
    frames.zip(got).foreach { case (want, px) =>
      assert(px.toSeq == want.map(_ & 0xff).toSeq,
        "DC-only MJPEG frame must decode exactly")
    }
    // sanity that this is a REAL lossy codec, not a disguised bitmap:
    // a non-block-constant frame generally does NOT round-trip
    val noisy = Array.tabulate(w * h)(k => (k * 37 % 256).toByte)
    val avi2 = ext.Multimodal.AviCodec.encodeGrayMjpegAvi(w, h, 10, Seq(noisy))
    val (_, _, got2) = ext.Multimodal.AviCodec.decodeGrayFrames(avi2)
    assert(got2.head.toSeq != noisy.map(_ & 0xff).toSeq,
      "expected JPEG loss on a high-frequency frame")
    // odd-sized JPEG chunks must keep the walk aligned (RIFF padding):
    // decodeGrayFrames found all 3 frames above regardless of parity
  }

  test("AVI codec: DIB round trip with bottom-up rows and padding") {
    import spark.implicits._
    // w=5 forces 3 bytes of row padding; distinct values per pixel
    val (w, h) = (5, 3)
    val f0 = Array.tabulate(w * h)(k => (k + 1).toByte)
    val f1 = Array.tabulate(w * h)(k => (100 + k).toByte)
    val avi = ext.Multimodal.AviCodec.encodeGrayAvi(w, h, 10, Seq(f0, f1))
    val (w2, h2, frames) = ext.Multimodal.AviCodec.decodeGrayFrames(avi)
    assert(w2 == w && h2 == h && frames.length == 2)
    assert(frames(0).toSeq == f0.map(_ & 0xff).toSeq,
      "bottom-up un-flip or padding strip is wrong")
    assert(frames(1).toSeq == f1.map(_ & 0xff).toSeq)
    // frame sampling end-to-end: stride 2 keeps frames 0 and 2 of 3
    val avi3 = ext.Multimodal.AviCodec.encodeGrayAvi(w, h, 10,
      Seq(f0, f1, f0))
    val df = Seq((9L, avi3)).toDF("id", "payload")
    val media = ext.Multimodal.asMedia(df, "id", "payload", "video/avi")
    val out = ext.Multimodal.videoFrameFeatures(media, "id", 2)
      .orderBy("frame_no").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2))
    val mean0 = f0.map(_ & 0xff).map(_.toLong).sum.toDouble / (w * h)
    assert(out.head.getDouble(4) == mean0)
    assert(out.head.getLong(5) == f0.map(_ & 0xff).zipWithIndex
      .map { case (v, k) => v.toLong * (k + 1) }.sum % 1000000007L)
  }

  test("persisted IVF index: probes prune to the probed cells' partitions") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(23)
    val rows = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextDouble() * 2 - 1).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
    val cent = corpus.where($"vec_id" < 8)
    val q = corpus.where($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    try {
      Similarity.writeIvfIndex(
        Similarity.ivfIndex(corpus, cent, "vec_id", "embedding", dim), dir)
      val stored = Similarity.readIvfIndex(spark, dir)
      val viaStore = Similarity.ivfTopKIndexed(q, stored, cent,
        "vec_id", "embedding", dim, k = 3, nprobe = 2)
      val fused = Similarity.ivfTopK(q, corpus, cent,
        "vec_id", "embedding", dim, k = 3, nprobe = 2)
      // identical rows through the disk round trip
      assert(viaStore.orderBy("query_id", "rank").collect().toSeq ==
        fused.orderBy("query_id", "rank").collect().toSeq)
      // and the probe is a PARTITION filter: the scan lists only the
      // probed cells' directories, never the whole index
      val scan = viaStore.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") &&
        scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("cell"),
        s"probe filter did not reach the partition level:\n$scan")
    } finally store.RrdStore.deleteTree(dir)
  }

  test("kmeansCentroids: shape, determinism, and Lloyd improvement") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    def train(iters: Int) = Similarity.kmeansCentroids(
      e, "vec_id", "embedding", 64, c = 16, iters = iters,
      sampleRate = 0.2)
    val c2 = train(2).as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(c2.map(_._1).toSeq == (1L to 16L) &&
      c2.forall(_._2.length == 64))
    // deterministic: a second training run is bit-identical
    val again = train(2).as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(c2.toSeq == again.toSeq)
    // Lloyd improvement: mean best-cosine of the corpus to its centroid
    // must not decrease vs the un-iterated init (k-means monotonicity,
    // here measured through the cosine assignment the IVF path uses)
    val c0 = train(0).as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(c0.toSeq != c2.toSeq, "iterations must move the centroids")
    val corpus = e.select($"vec_id", $"embedding")
      .as[(Long, Seq[Double])].collect()
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def meanBest(cents: Array[(Long, Seq[Double])]) = corpus.map {
      case (_, v) =>
        val n = math.sqrt(dot(v, v))
        cents.map { case (_, cv) =>
          dot(v, cv) / (n * math.sqrt(dot(cv, cv))) }.max
    }.sum / corpus.length
    assert(meanBest(c2) >= meanBest(c0),
      s"training worsened the quantizer: ${meanBest(c2)} < ${meanBest(c0)}")
  }

  test("kmeansCentroids refuses a sample smaller than c") {
    import spark.implicits._
    val tiny = (0L until 10L)
      .map(i => (i, Seq.fill(64)(1.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(tiny, "vec_id", "embedding", 64,
        c = 16, iters = 1, sampleRate = 1.0)
    }
  }

  test("knnGraphDistributed: per-cell brute-force parity (ranks, ids, " +
      "bit-exact cosines), degree bounds, mega-cell cap drains") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, sf)
    val k = 3
    val got = Similarity.knnGraphDistributed(e, "vec_id", "embedding",
        64, k = k, targetOccupancy = 16, probes = 2)
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty)
    // replay: the SAME deterministic assignment, then driver-side
    // per-cell kNN with the kernel's exact fold/divide order
    val cent = Similarity.seededCentroids(e, "vec_id", "embedding", 64,
      1.0 / 16)
    val asg = Similarity.ivfIndexDistributed(e, cent, "vec_id",
        "embedding", 64, probes = 2)
      .where(col("norm") > 0)
      .select("cell", "vec_id", "embedding")
      .as[(Long, Long, Seq[Double])].collect()
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }
      s
    }
    val want = asg.groupBy(_._1).values.flatMap { mem =>
      if (mem.length < 2) Nil
      else mem.flatMap { case (_, id, v) =>
        val n = math.sqrt(dot(v, v))
        mem.iterator.filter(_._2 != id).map { case (_, nid, w) =>
          (dot(v, w) / (n * math.sqrt(dot(w, w))), nid)
        }.toSeq.sortBy { case (c, nid) => (-c, nid) }.take(k)
          .zipWithIndex.map { case ((c, nid), r) =>
            (id, (r + 1).toLong, nid, c)
          }
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(got.length == want.length,
      s"edge count ${got.length} != replay ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"edge mismatch: $g vs $w")
    }
    // degree bound + rank density per node
    got.groupBy(_._1).foreach { case (id, edges) =>
      assert(edges.length <= k, s"node $id degree ${edges.length}")
      assert(edges.map(_._2).sorted.toSeq == (1L to edges.length).toSeq)
    }
    // maxCell = 1: every >=2-member cell drains, singletons emit
    // nothing -> empty graph
    val drained = Similarity.knnGraphDistributed(e, "vec_id",
      "embedding", 64, k = k, targetOccupancy = 16, probes = 2,
      maxCell = 1)
    assert(drained.count() == 0L)
  }

  test("mutualKnnEdges: exactly the bidirectional pairs of a planted " +
      "edge frame, id1 < id2, forward cosine") {
    import spark.implicits._
    // 1->2 and 2->1 (mutual); 1->3 only (not); 4->5 and 5->4 (mutual)
    val edges = Seq(
      (1L, 1L, 2L, 0.9), (2L, 1L, 1L, 0.9), (1L, 2L, 3L, 0.8),
      (3L, 1L, 5L, 0.7), (4L, 1L, 5L, 0.6), (5L, 1L, 4L, 0.6))
      .toDF("vec_id", "rank", "neighbor_id", "cosine")
    val got = Similarity.mutualKnnEdges(edges, "vec_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 0.9), (4L, 5L, 0.6)))
  }

  test("knnLabelAudit + knnDensityScores: driver replay over the " +
      "operator's own kNN edges (votes, majority ties, ordered fold)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val knn = Similarity.knnGraphDistributed(e, "vec_id", "embedding",
        64, k = 5, targetOccupancy = 16, probes = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(knn.nonEmpty)
    val labels = e.select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    // label audit replay: per node, count neighbor labels, majority by
    // (votes DESC, label ASC), agree vs own label
    val wantAudit = knn.groupBy(_._1).map { case (id, edges) =>
      val votes = edges.map(ed => labels(ed._3))
        .groupBy(identity).map { case (l, xs) => (l, xs.length.toLong) }
      val (ml, mv) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      (id, labels(id), ml, mv, labels(id) == ml)
    }.toSeq.sortBy(_._1)
    val gotAudit = Similarity.knnLabelAudit(e, "vec_id", "embedding",
        "label", 64, k = 5, targetOccupancy = 16, probes = 2)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(gotAudit.toSeq == wantAudit)
    assert(gotAudit.exists(!_._5) || gotAudit.forall(_._5)) // sanity
    // density replay: rank-ordered fold from 0.0, one divide
    val wantDens = knn.groupBy(_._1).map { case (id, edges) =>
      val cs = edges.sortBy(_._2).map(_._4)
      (id, cs.length.toLong, cs.foldLeft(0.0)(_ + _) / cs.length)
    }.toSeq.sortBy(_._1)
    val gotDens = Similarity.knnDensityScores(e, "vec_id", "embedding",
        64, k = 5, targetOccupancy = 16, probes = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(gotDens.toSeq == wantDens)
    gotDens.foreach { case (id, deg, mc) =>
      assert(deg >= 1 && deg <= 5 && mc <= 1.0000000001, s"node $id")
    }
  }

  test("randomProjection: driver replay of the md5 sign matrix and " +
      "fold orders; L2 law; JL sanity on real vectors") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val dimIn = 64; val dimOut = 16
    val got = Similarity.randomProjection(e, "vec_id", "embedding",
        dimIn, dimOut)
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.nonEmpty)
    // independent sign derivation + the exact fold orders
    def sign(j: Int, d: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"rp:$j:$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
    val src = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect()
    src.foreach { case (id, v) =>
      if (v != null && v.length >= dimIn) {
        val p = (1 to dimOut).map { j =>
          var acc = 0.0
          (1 to dimIn).foreach(d => acc += v(d - 1) * sign(j, d))
          acc
        }
        var n2 = 0.0
        p.foreach(x => n2 += x * x)
        val n = math.sqrt(n2)
        val want = if (n > 0) p.map(_ / n) else p
        assert(got(id) == want, s"vec $id")
      }
    }
    // JL sanity: the projection preserves relative cosine structure —
    // the most-similar pair among the first vectors stays high
    val ids = src.take(20).map(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val srcMap = src.toMap
    val pairs = for { i <- ids; j <- ids if i < j } yield (i, j)
    val bestIn = pairs.maxBy { case (i, j) => cos(srcMap(i), srcMap(j)) }
    val rankOut = pairs.sortBy { case (i, j) => -cos(got(i), got(j)) }
      .indexOf(bestIn)
    assert(rankOut < pairs.length / 4,
      s"most-similar input pair fell to projected rank $rankOut " +
        s"of ${pairs.length} — projection destroyed angle structure")
  }

  test("label-consuming operators reject non-integral label columns " +
      "loudly (a lossy cast would silently NULL the votes)") {
    import spark.implicits._
    val bad = Seq((1L, Seq.fill(64)(1.0), "cat"),
        (2L, Seq.fill(64)(0.5), "dog"))
      .toDF("vec_id", "embedding", "label")
    val eA = intercept[IllegalArgumentException] {
      Similarity.knnLabelAudit(bad, "vec_id", "embedding", "label",
        64, k = 2)
    }
    assert(eA.getMessage.contains("integral"))
    val eB = intercept[IllegalArgumentException] {
      Similarity.clusterPurity(bad, "vec_id", "embedding", "label", 64)
    }
    assert(eB.getMessage.contains("integral"))
  }
}
