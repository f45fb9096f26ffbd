package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (BASELINE.json north-star): brute-force
  * cosine top-k as the exactness baseline, LSH-bucketed variant as the
  * scale path.
  *
  * Determinism: dot products are sequential left-folds over the vector
  * positions (`aggregate` from 0.0) — the same op order DuckDB's
  * `list_reduce` uses, so the oracle matches bit-for-bit. Floats are
  * cast to double per element (exact) before any arithmetic.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a strict left fold (order-deterministic; matches
    * DuckDB's `list_reduce` bit-for-bit). The `aggregate` HOF beats a
    * 64-term unrolled Add chain here — the chain bloats the generated
    * method past JIT-friendly size (measured 10.3s vs 7.7s on q29). */
  def dot(a: Column, b: Column, dim: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(dim)), i =>
        element_at(a, i).cast("double") * element_at(b, i).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column, dim: Int): Column = sqrt(dot(a, a, dim))

  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))

  /** SQ8 scalar quantization of an embedding corpus: per-dimension
    * corpus min/max → each coordinate maps to a byte code
    * `floor((x-mn)·255/(mx-mn) + 0.5)` clamped to [0,255] — the
    * standard 4× storage/IO reduction of a 100 TB embedding lake
    * (float32 → uint8; ANN probes then run on codes and only the
    * final re-rank touches full vectors). A constant dimension
    * (mx = mn) codes to 0.
    *
    * Scale shape: pass 1 is ONE partial-aggregated reduction (2·dim
    * aggregate expressions; the shuffle carries a single row), pass 2
    * a shuffle-free map with the per-dim bounds as broadcast literals.
    * Determinism: min/max never sum, `floor(+0.5)` avoids engine
    * rounding-mode differences, and every arithmetic step is the same
    * double expression tree the SQL oracle replays — codes and the
    * reconstruction error are bit-identical cross-engine.
    *
    * Output: (id, codes array<int>, max_abs_err double) where
    * max_abs_err is the largest per-coordinate |dequantized − x| —
    * bounded by range/510 per dimension (Sq8QuantizeSpec pins the
    * bound, idempotence, and closed-form cases).
    */
  def sq8Quantize(df: DataFrame, id: String, vec: String,
      dim: Int): DataFrame = {
    val (mn, rg) = sq8Bounds(df, vec, dim)
    val mnA = array(mn.toIndexedSeq.map(lit): _*)
    val rgA = array(rg.toIndexedSeq.map(lit): _*)
    sq8Codes(df, id, vec, mn, rg)
      .select(col(id), col("__codes").as("codes"),
        array_max(zip_with(col("__v"),
          transform(col("__codes"), (c, i) =>
            element_at(mnA, i + 1) +
              c.cast("double") * element_at(rgA, i + 1) / lit(255.0)),
          (x, d) => abs(d - x))).as("max_abs_err"))
  }

  /** Corpus-side vector contract, applied at every scan/encode path:
    * rows whose vector is null or shorter than `dim` are excluded from
    * the index — matching the [[pqCodebooks]] sample filter and the
    * [[collectNormed]] query-side require — instead of failing mid-job
    * deep in an executor kernel with an opaque NPE/bounds trace. A
    * production indexer drops (and counts) malformed rows; a single bad
    * row must not kill a 100 TB scan. */
  private def vecOk(vec: String, dim: Int): Column =
    col(vec).isNotNull && size(col(vec)) >= dim

  /** Largest centroid set the broadcast assignment paths will collect:
    * past this, [[ivfIndex]] routes through [[ivfIndexDistributed]]
    * (≡ exact at probes ≥ ⌈√c⌉, spec-pinned) and the auto-sized
    * [[semanticNearDupPairs]] routes through the distributed family —
    * the round-12 no-driver-growth chain becomes the DEFAULT instead
    * of an opt-in. 2¹⁶ cells × 64 dims ≈ 32 MB broadcast, comfortably
    * inside an executor; a corpus-proportional quantizer blows past it
    * immediately. */
  val IvfBroadcastCellLimit: Int = 1 << 16

  /** Loud analysis-time guard for label-consuming operators (the
    * ticketed samplers' isIntegral discipline): label columns are
    * CAST to long for the vote/majority arithmetic, and a non-numeric
    * string label would become NULL after the cast — silently shifting
    * votes and majority groups instead of failing. */
  private def requireIntegralLabel(op: String, df: DataFrame,
      label: String): Unit = {
    val t = df.schema(label).dataType
    require(Curation.isIntegral(t),
      s"$op: label column '$label' must be an integral type (got " +
        s"${t.simpleString}) — a lossy cast would silently turn " +
        "non-numeric labels into NULL votes")
  }

  /** Per-dimension (min, max−min) of the corpus — ONE partial-aggregated
    * reduction whose shuffle carries a single row. Shared by
    * [[sq8Quantize]] and [[sq8TopK]] so quantizer and reader can never
    * disagree on the grid. */
  private def sq8Bounds(df: DataFrame, vec: String,
      dim: Int): (Array[Double], Array[Double]) = {
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col(vec), i + 1)).as(s"__mn$i"),
      max(element_at(col(vec), i + 1)).as(s"__mx$i")))
    val row = df.where(vecOk(vec, dim)).agg(aggs.head, aggs.tail: _*).head()
    val mn = Array.tabulate(dim)(i => row.getDouble(2 * i))
    val rg = Array.tabulate(dim)(i => row.getDouble(2 * i + 1) - mn(i))
    (mn, rg)
  }

  /** (id, __v, __codes): the SQ8 code map as a shuffle-free projection
    * with the bounds inlined as literals. */
  private def sq8Codes(df: DataFrame, id: String, vec: String,
      mn: Array[Double], rg: Array[Double]): DataFrame = {
    val mnA = array(mn.toIndexedSeq.map(lit): _*)
    val rgA = array(rg.toIndexedSeq.map(lit): _*)
    // slice to exactly dim: an over-length vector's tail would index
    // past the bounds arrays (ANSI element_at error) and has no grid
    df.where(vecOk(vec, mn.length))
      .select(col(id), slice(col(vec), 1, mn.length).as("__v"))
      .withColumn("__codes", transform(col("__v"), (x, i) => {
        val m = element_at(mnA, i + 1)
        val r = element_at(rgA, i + 1)
        when(r === 0d, lit(0)).otherwise(
          least(greatest(
            floor((x - m) * lit(255.0) / r + lit(0.5)), lit(0L)), lit(255L))
            .cast("int"))
      }))
  }

  /** Two-stage ANN over SQ8 codes — the read path [[sq8Quantize]]'s 4×
    * cut exists for: the corpus-wide scan scores BYTE CODES with an
    * asymmetric approximate dot,
    *   approx(q, c) = Σ_i q_i·(mn_i + c_i·rg_i/255)
    *               = (Σ_i q_i·mn_i) + Σ_i (q_i·rg_i/255)·c_i,
    * where Σ q_i·mn_i and the per-dim factors f_i = (q_i·rg_i)/255 are
    * precomputed per query on the driver — per corpus row the kernel
    * runs one primitive fold over code ints, no float vector. The
    * approximate top-`rerank` candidates per query (ties to the lower
    * neighbor id) then join back to the float corpus — |Q|·rerank rows,
    * broadcast — for EXACT cosine re-ranking through the same [[dotK]]
    * fold as [[bruteForceTopK]].
    *
    * Determinism: f_i and the fold order are the exact expression tree
    * the SQL oracle replays (left fold from 0.0, one final qDotMn add),
    * so the candidate set, not just the re-ranked output, is
    * bit-identical cross-engine.
    *
    * Output: (query_id, rank, neighbor_id, cosine) as [[bruteForceTopK]]
    * — cosine exact over the candidate set.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, dim: Int, k: Int, rerank: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (mn, rg) = sq8Bounds(corpus, vec, dim)
    val qrows = collectNormed(queries, id, vec, dim).map {
      case (qid, qv, qn) =>
        val f = Array.tabulate(dim)(i => (qv(i) * rg(i)) / 255.0)
        var s = 0.0
        var i = 0
        while (i < dim) { s += qv(i) * mn(i); i += 1 }
        (qid, qv, qn, f, s)
    }
    val bc = spark.sparkContext.broadcast(qrows)
    val approx = sq8Codes(corpus, id, vec, mn, rg)
      .select(col(id).cast("long"), col("__codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (nid, cs) =>
          qs.iterator.collect { case (qid, _, _, f, qdm) if qid != nid =>
            var s = 0.0
            var i = 0
            // bound by f.length (= dim): vecOk guarantees cs.length >=
            // dim, and an over-length vector's tail has no factor
            while (i < f.length) { s += f(i) * cs(i); i += 1 }
            (qid, nid, qdm + s)
          }
        }
      }.toDF("query_id", "neighbor_id", "approx")
    rerankExact(approx,
      corpus, id, vec, dim,
      qrows.map(q => (q._1, (q._2, q._3))).toMap, rerank, k)
  }

  /** Shared tail of the two-stage ANN paths ([[sq8TopK]], [[pqTopK]]):
    * take each query's top-`rerank` candidates by approximate score
    * (ties to the lower neighbor id), join them back to the float
    * corpus (|Q|·rerank rows — broadcast side), and re-rank with the
    * EXACT [[dotK]] cosine. The wide data only ever carries
    * (query, neighbor, approx) triples; vectors rejoin only for the
    * bounded candidate set. */
  private def rerankExact(approx: DataFrame, corpus: DataFrame,
      id: String, vec: String, dim: Int,
      queries: Map[Long, (Array[Double], Double)], rerank: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val bcQ = spark.sparkContext.broadcast(queries)
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val cand = approx.withColumn("__arank", row_number().over(wA))
      .where(col("__arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val scored = corpus
      .where(vecOk(vec, dim))
      .select(col(id).cast("long").as("neighbor_id"), col(vec).as("__cv"))
      .join(broadcast(cand), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("__cv"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.map { case (qid, nid, cv) =>
          val (qv, qn) = qs(qid)
          val cn = math.sqrt(d(cv, cv))
          (qid, nid, d(qv, cv) / (qn * cn))
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    topK(scored, k)
  }

  /** Product-quantization codebooks (Jégou et al. 2011): the vector
    * splits into `m` contiguous subspaces of `dim / m` dims; each
    * subspace gets `kCent` centroids from its own driver-local Lloyd
    * run over ONE shared md5-uniform sample (the [[kmeansCentroids]]
    * shape — distributed sample, driver iterations, zero per-iteration
    * cluster jobs). Subspace k-means is L2 (argmin squared distance,
    * ties to the lowest centroid id; cosine is meaningless on a slice),
    * init is the `kCent` sample rows with the smallest (u, id), and an
    * emptied cell keeps its previous centroid — every choice
    * deterministic so the SQL oracle can replay training exactly.
    *
    * Storage story: `m` code bytes replace `dim` floats — m=8 over
    * 64-dim float32 is a 32× cut (vs SQ8's 4×), the difference between
    * an index that fits in memory and one that doesn't at 100 TB.
    *
    * Returns books(s)(c) = centroid c of subspace s (c in 0 until
    * kCent, slice width dim/m).
    */
  def pqCodebooks(corpus: DataFrame, id: String, vec: String, dim: Int,
      m: Int, kCent: Int, iters: Int,
      sampleRate: Double): Array[Array[Array[Double]]] = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m")
    require(kCent > 0 && iters >= 0)
    val w = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val samp: Array[(Long, Array[Double], Double)] = corpus
      .select(col(id).cast("long").as("vid"), col(vec).as("v"),
        Curation.hashUniform(col(id)).as("u"))
      .where(col("u") < sampleRate && col("v").isNotNull &&
        size(col("v")) >= dim)
      .as[(Long, Array[Double], Double)]
      .collect()
    require(samp.length >= kCent,
      s"sample of ${samp.length} vectors < kCent=$kCent " +
        s"(raise sampleRate=$sampleRate)")
    val init = samp.sortBy { case (vid, _, u) => (u, vid) }.take(kCent)
    // ascending id: the mean fold order (members never change)
    val members = samp.sortBy(_._1).map(_._2)
    Array.tabulate(m) { s =>
      def slice(v: Array[Double]): Array[Double] =
        java.util.Arrays.copyOfRange(v, s * w, (s + 1) * w)
      var cents: Array[Array[Double]] = init.map(t => slice(t._2))
      val mem = members.map(slice)
      for (_ <- 1 to iters) {
        val sums = Array.fill(kCent)(new Array[Double](w))
        val cnts = new Array[Long](kCent)
        mem.foreach { v =>
          val best = nearestSub(v, 0, cents, w)
          cnts(best) += 1
          var j = 0
          while (j < w) { sums(best)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(kCent)(ci =>
          if (cnts(ci) == 0) cents(ci)
          else {
            val mv = new Array[Double](w)
            var j = 0
            while (j < w) { mv(j) = sums(ci)(j) / cnts(ci); j += 1 }
            mv
          })
      }
      cents
    }
  }

  /** argmin-L2 cell for one subspace slice, read in place at `off` —
    * strictly-less keeps the lowest centroid id on ties (the oracle's
    * ORDER BY l2, cid). Offset-based so the encode scan allocates no
    * per-(row, subspace) slice copies. */
  private def nearestSub(v: Array[Double], off: Int,
      cents: Array[Array[Double]], w: Int): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      var dd = 0.0
      var j = 0
      while (j < w) {
        val df = v(off + j) - cents(c)(j)
        dd += df * df
        j += 1
      }
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  /** Two-stage ANN over PQ codes — [[sq8TopK]]'s shape at 32×
    * compression: the corpus scan ENCODES each vector (m argmin-L2
    * cells against broadcast codebooks) and scores it by asymmetric
    * distance computation against the RECONSTRUCTION x̂ — per query a
    * precomputed m×kCent table tab(s)(c) = dot(q_slice_s, book_s(c)),
    * so dot(q, x̂) is `m` table lookups + adds per (query, row);
    * ranking is the approximate COSINE dot(q, x̂)/‖x̂‖, where
    * ‖x̂‖² = Σ_s ‖book_s(code_s)‖² EXACTLY (subspaces concatenate), a
    * second m-lookup sum against precomputed per-centroid norms.
    * Ranking by raw dot would conflate similarity with corpus vector
    * norm and collapse recall. Approximate top-`rerank` candidates
    * re-rank with exact cosine through [[rerankExact]].
    *
    * Training, encoding, the ADC sum orders, and both tie-breaks are
    * deterministic, so the SQL oracle replays the full chain —
    * codebooks, codes, candidates, and the exact re-rank.
    *
    * Output: (query_id, rank, neighbor_id, cosine) as
    * [[bruteForceTopK]].
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, dim: Int, m: Int, kCent: Int, iters: Int,
      sampleRate: Double, k: Int, rerank: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val w = dim / m
    val books = pqCodebooks(corpus, id, vec, dim, m, kCent, iters,
      sampleRate)
    // ‖centroid‖² per (subspace, cid) — the same fold order as the
    // oracle's dotW(cv, cv)
    val n2 = books.map(_.map { cv =>
      var acc = 0.0
      var j = 0
      while (j < w) { acc += cv(j) * cv(j); j += 1 }
      acc
    })
    val qrows = collectNormed(queries, id, vec, dim).map {
      case (qid, qv, qn) =>
        val tab = Array.tabulate(m) { s =>
          Array.tabulate(books(s).length) { c =>
            var acc = 0.0
            var j = 0
            while (j < w) { acc += qv(s * w + j) * books(s)(c)(j); j += 1 }
            acc
          }
        }
        (qid, qv, qn, tab)
    }
    val bcQ = spark.sparkContext.broadcast(qrows)
    val bcB = spark.sparkContext.broadcast(books)
    val bcN = spark.sparkContext.broadcast(n2)
    val approx = corpus
      .where(vecOk(vec, dim))
      .select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bcB.value
        val nn = bcN.value
        val qs = bcQ.value
        it.flatMap { case (nid, v) =>
          val code = new Array[Int](m)
          var s = 0
          while (s < m) {
            code(s) = nearestSub(v, s * w, bks(s), w)
            s += 1
          }
          var n2s = 0.0
          var t0 = 0
          while (t0 < m) { n2s += nn(t0)(code(t0)); t0 += 1 }
          val cn = math.sqrt(n2s)
          qs.iterator.collect { case (qid, _, _, tab) if qid != nid =>
            var a = 0.0
            var t = 0
            while (t < m) { a += tab(t)(code(t)); t += 1 }
            // a zero-norm reconstruction ranks last, deterministically
            (qid, nid,
              if (n2s == 0.0) Double.NegativeInfinity else a / cn)
          }
        }
      }.toDF("query_id", "neighbor_id", "approx")
    rerankExact(approx, corpus, id, vec, dim,
      qrows.map(q => (q._1, (q._2, q._3))).toMap, rerank, k)
  }

  /** The primitive form of [[dot]]: same strict left fold compiled to a
    * JVM loop. Every ANN kernel uses THIS one definition — the
    * fused/indexed IVF paths are spec-asserted identical, and a single
    * shared fold is what keeps that (and the SQL oracles) from drifting. */
  private def dotK(dim: Int)(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < dim) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Collected (id, vec, norm) rows, sorted by id — the broadcastable
    * form of a by-contract-small frame (queries, centroids). */
  private def collectNormed(df: DataFrame, id: String, vec: String,
      dim: Int): Array[(Long, Array[Double], Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    df.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])].collect()
      .map { case (i, v) =>
        require(v != null && v.length >= dim,
          s"vector $i is null or shorter than dim=$dim")
        (i, v, math.sqrt(d(v, v)))
      }
      .sortBy(_._1)
  }

  /** cell → the queries probing it: each query's `nprobe` max-cosine
    * centroids, ties to the lower centroid id. */
  private def probeMap(queries: DataFrame,
      cent: Array[(Long, Array[Double], Double)], id: String, vec: String,
      dim: Int, nprobe: Int): Map[Long, Array[(Long, Array[Double], Double)]] = {
    val d = dotK(dim) _
    collectNormed(queries, id, vec, dim)
      .flatMap { case (qid, qv, qn) =>
        cent.map { case (cid, cv, cn) => (cid, d(qv, cv) / (qn * cn)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(nprobe)
          .map { case (cid, _) => (cid, (qid, qv, qn)) }
      }
      .groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2)) }
  }

  /** Per-query top-k over scored (query_id, neighbor_id, cosine) rows —
    * the one wide exchange every ANN path ends in. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Brute-force cosine top-k: every query row against every corpus row.
    * At scale: the (small, by contract) query side is collected and
    * broadcast as primitive arrays; the corpus streams through ONE typed
    * `mapPartitions` whose dot kernel is a tight primitive-double loop —
    * the same left-fold order as [[dot]]'s `aggregate` HOF (so the SQL
    * oracle still matches bit-for-bit) but compiled JVM arithmetic
    * instead of per-element Catalyst interpretation (round-2 verdict
    * measured the HOF ~40× slower than the equivalent native fold). The
    * only shuffle is the final per-query top-k.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, dim: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val bc = spark.sparkContext.broadcast(
      collectNormed(queries, id, vec, dim))
    val scored = corpus.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (nid, cv) =>
          if (cv == null || cv.length < dim) Iterator.empty else {
          val cn = math.sqrt(d(cv, cv))
          qs.iterator.collect { case (qid, qv, qn) if qid != nid =>
            (qid, nid, d(qv, cv) / (qn * cn))
          } }
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    topK(scored, k)
  }

  /** Hard-negative mining — the contrastive-training companion of
    * [[bruteForceTopK]]: for each labeled query vector, the k corpus
    * vectors MOST similar to it among those carrying a DIFFERENT
    * label (the "hard negatives" a contrastive or reranker trainer
    * pairs with each anchor; same-label rows are positives and are
    * excluded BEFORE ranking — top-k among negatives, not a filtered
    * top-k). Null-label and zero-norm rows are excluded on both sides
    * (a zero vector has no cosine; NaN would rank FIRST under Spark's
    * NaN-greatest ordering — the silent-poison case this filter
    * closes).
    *
    * Scale shape is [[bruteForceTopK]]'s: the query side is small by
    * contract (an anchor batch) and broadcasts as primitive arrays;
    * the corpus streams through ONE typed mapPartitions with a
    * label-inequality guard inside the tight kernel; the only shuffle
    * is the final per-query top-k.
    *
    * Output: (query_id, query_label, rank, neighbor_id,
    * neighbor_label, cosine), rank 1..k by (cosine DESC, neighbor_id).
    */
  def hardNegativesTopK(queries: DataFrame, corpus: DataFrame,
      id: String, vec: String, label: String, dim: Int,
      k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0 (got $k)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val qrows = queries.where(col(label).isNotNull)
      .select(col(id).cast("long"), col(vec), col(label).cast("long"))
      .as[(Long, Array[Double], Long)].collect()
      .map { case (i, v, l) =>
        require(v != null && v.length >= dim,
          s"query vector $i is null or shorter than dim=$dim")
        val n = math.sqrt(d(v, v))
        require(n > 0, s"query vector $i has zero norm — no cosine")
        (i, v, n, l)
      }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qrows)
    val scored = corpus.where(col(label).isNotNull)
      .select(col(id).cast("long"), col(vec), col(label).cast("long"))
      .as[(Long, Array[Double], Long)]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (nid, cv, nl) =>
          if (cv == null || cv.length < dim) Iterator.empty
          else {
            val cn = math.sqrt(d(cv, cv))
            if (cn == 0) Iterator.empty
            else qs.iterator.collect {
              case (qid, qv, qn, ql) if ql != nl =>
                (qid, ql, nid, nl, d(qv, cv) / (qn * cn))
            }
          }
        }
      }
      .toDF("query_id", "query_label", "neighbor_id", "neighbor_label",
        "cosine")
    topK(scored, k)
      .select(col("query_id"), col("query_label"), col("rank"),
        col("neighbor_id"), col("neighbor_label"), col("cosine"))
  }

  /** Triplet mining — the (anchor, positive, negative) table a
    * metric-learning / contrastive trainer consumes, built on the
    * [[hardNegativesTopK]] kernel: for each labeled anchor, the
    * HARDEST positive (same label, LOWEST cosine — the pair the loss
    * must pull together) and the HARDEST negative (different label,
    * HIGHEST cosine — the pair it must push apart), with
    * margin = pos_cos − neg_cos (negative margin = the triplet is
    * currently violated, exactly what semi-hard mining selects on).
    * Ties break to the lower candidate id; the anchor never pairs
    * with itself; anchors whose label has no second member emit
    * nothing (no positive exists — inner-join semantics, documented).
    * Zero-norm / null-label rows are excluded on both sides (the
    * [[hardNegativesTopK]] NaN rationale).
    *
    * Scale shape: the anchor batch broadcasts; ONE corpus scan scores
    * both sides in the same typed kernel; two per-anchor extremes via
    * windows over the high-cardinality anchor key.
    *
    * Output: (anchor_id, label, pos_id, pos_cos, neg_id, neg_cos,
    * margin). */
  def tripletMine(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, label: String, dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val qrows = queries.where(col(label).isNotNull)
      .select(col(id).cast("long"), col(vec), col(label).cast("long"))
      .as[(Long, Array[Double], Long)].collect()
      .map { case (i, v, l) =>
        require(v != null && v.length >= dim,
          s"anchor vector $i is null or shorter than dim=$dim")
        val n = math.sqrt(d(v, v))
        require(n > 0, s"anchor vector $i has zero norm — no cosine")
        (i, v, n, l)
      }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qrows)
    val scored = corpus.where(col(label).isNotNull)
      .select(col(id).cast("long"), col(vec), col(label).cast("long"))
      .as[(Long, Array[Double], Long)]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (nid, cv, nl) =>
          if (cv == null || cv.length < dim) Iterator.empty
          else {
            val cn = math.sqrt(d(cv, cv))
            if (cn == 0) Iterator.empty
            else qs.iterator.collect {
              case (qid, qv, qn, ql) if qid != nid =>
                (qid, ql, nid, ql == nl, d(qv, cv) / (qn * cn))
            }
          }
        }
      }
      .toDF("anchor_id", "label", "cand_id", "same", "cosine")
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("cosine").asc, col("cand_id"))
    val wNeg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    val pos = scored.where(col("same"))
      .withColumn("__r", row_number().over(wPos)).where(col("__r") === 1)
      .select(col("anchor_id"), col("label"),
        col("cand_id").as("pos_id"), col("cosine").as("pos_cos"))
    val neg = scored.where(!col("same"))
      .withColumn("__r", row_number().over(wNeg)).where(col("__r") === 1)
      .select(col("anchor_id"), col("cand_id").as("neg_id"),
        col("cosine").as("neg_cos"))
    pos.join(neg, "anchor_id")
      .select(col("anchor_id"), col("label"), col("pos_id"),
        col("pos_cos"), col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
  }

  /** Embedding-cosine near-duplicate pairs (the dedup-by-embedding leg
    * of the north-star): hyperplane buckets propose candidates — the
    * left side probes its bucket plus every single-bit flip, so pairs
    * split by one plane are still found — exact cosine >= tau verifies.
    * Same candidates-only shape as the text LSH dedups: the join keys
    * are buckets, never all pairs; oversized buckets are capped.
    * (The testdata embeddings top out near cosine 0.5, so this operator
    * is spec-covered on constructed near-dups rather than oracle-backed.)
    */
  def cosineNearDupPairs(df: DataFrame, id: String, vec: String, dim: Int,
      tau: Double, planes: Int = 0, maxBucket: Int = 10000,
      targetOccupancy: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // planes <= 0 → size the hyperplane count to the corpus so expected
    // bucket occupancy stays near targetOccupancy: bucket count grows
    // WITH the corpus and within-bucket pair mining stays O(n·occ),
    // linear. A FIXED plane count is the classic LSH scale failure —
    // pairs grow n²/2^planes (measured: 17.6× wall at 10× corpus with
    // planes=4; SCALE.md). The sizing pass is one count() — at real
    // scale pass a known corpus size via `planes` explicitly, or accept
    // the extra scan. hyperplaneSign is seeded per (plane, dim), so a
    // larger plane count extends, never reshuffles, the existing planes.
    val nPlanes = if (planes > 0) planes else
      math.min(20, math.max(4, math.ceil(math.log(
        math.max(df.count(), 1L).toDouble / targetOccupancy) /
        math.log(2)).toInt))
    // Cap check: per-bucket counts aggregate map-side to ~n/occupancy
    // tiny rows and broadcast back — the corpus itself is never
    // sort-shuffled for the cap (the previous window-count form paid a
    // full hash exchange + sort of every (vector, norm) row; measured
    // 6.3×→4.4× at the 100× replica, SCALE.md). No operator-internal
    // persist (round-2 leak). Keys and norms come from the one-pass
    // typed kernel (same folds as the column forms, compiled).
    val keyed = keyedNormed(df, id, vec, dim, nPlanes)
      .select(col(id).as("doc_id"), col(vec).as("v"),
        col("norm").as("n"), col("bucket"))
    val oversized = keyed.groupBy("bucket")
      .agg(count(lit(1)).as("__bn")).where(col("__bn") > maxBucket)
      .select(col("bucket"))
    val capped = keyed.join(broadcast(oversized), Seq("bucket"),
      "left_anti")
    // Zero-bit probing: a pair whose buckets differ in exactly bit p has
    // ONE member with bit p clear — only that member probes the flip, so
    // the pair still meets exactly once while the exploded a-side
    // carries ~(1 + planes/2) rows per doc instead of (1 + planes). The
    // covered pair set is IDENTICAL to all-flips probing (hamming <= 1),
    // so the oracle needs no change; orientation is normalized with
    // least/greatest before the final distinct (same-bucket pairs meet
    // in both orders; the dot product and n1·n2 are symmetric, so both
    // orders produce the bit-identical cosine and dedup exactly).
    val probes = array(col("bucket") +: (0 until nPlanes).map(p =>
      when(col("bucket").bitwiseAND(lit(1L << p)) === 0,
        col("bucket").bitwiseXOR(lit(1L << p)))): _*)
    val a = capped.select(explode(probes).as("bucket"),
      col("doc_id").as("id1"), col("v").as("v1"), col("n").as("n1"))
      .where(col("bucket").isNotNull) // suppressed (set-bit) probes
      .as[(Long, Long, Array[Double], Double)]
    val b = capped.select(col("bucket"), col("doc_id").as("id2"),
      col("v").as("v2"), col("n").as("n2"))
      .as[(Long, Long, Array[Double], Double)]
    // Verify via COGROUP per bucket, not a row-producing join: an SMJ
    // would materialize BOTH 512-byte vectors into every candidate row
    // (≈occupancy² rows per bucket — measured as the dominant 100× cost,
    // SCALE.md), where the cogroup deserializes each vector once per
    // bucket and runs the occupancy² dot products over in-memory
    // primitive arrays. Memory per task ∝ maxBucket (only the exact
    // side materializes; the probe side streams). The dot is the same
    // strict left-fold as before, so DuckDB's list_reduce oracle stays
    // bit-exact; the q29 lesson still applies (typed loop, not the
    // interpreted `aggregate` HOF).
    a.groupByKey(_._1).cogroup(b.groupByKey(_._1)) { (_, as, bs) =>
      val hits = bs.toArray // bounded by maxBucket
      if (hits.isEmpty) Iterator.empty
      else as.flatMap { case (_, id1, v1, n1) =>
        hits.iterator.flatMap { case (_, id2, v2, n2) =>
          if (id1 == id2) None
          else {
            var s = 0.0; var i = 0
            while (i < dim) { s += v1(i) * v2(i); i += 1 }
            val c = s / (n1 * n2)
            if (c >= tau)
              Some((math.min(id1, id2), math.max(id1, id2), c))
            else None
          }
        }
      }
    }.toDF("id1", "id2", "cosine")
      .distinct()
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of C centroids
    * partitions the corpus into cells; each query probes only its
    * `nprobe` max-cosine cells and re-ranks exactly inside them —
    * search cost O(n·nprobe/C) per query vs the brute-force O(n).
    *
    * The quantizer is caller-provided (`centroids`): index training is
    * an offline concern in every IVF system; sampling corpus vectors
    * (e.g. the C lowest ids) is the standard k-means seeding without
    * the iterations, and keeps the quantizer reproducible in SQL for
    * the cross-engine oracle.
    *
    * Scale shape: centroids and the probed query side are collected
    * and broadcast (both small by contract — C in the thousands, a
    * query batch); the corpus streams through ONE typed
    * `mapPartitions` that fuses cell assignment (argmax cosine over
    * the C centroids, ties to the lowest centroid id) with candidate
    * scoring against the queries probing that cell. No corpus shuffle,
    * no join — the only shuffle is the final per-query top-k. At
    * 100 TB the assignment half would be materialized once as a
    * cell-partitioned index and reused across query batches; fusing
    * build+probe is the right shape for ad-hoc batches.
    *
    * Determinism: every dot product is the same strict left fold as
    * [[dot]], so cells, probes, and ranks replay bit-identically in
    * the DuckDB oracle. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      id: String, vec: String, dim: Int, k: Int,
      nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val cent = collectNormed(centroids, id, vec, dim)
    val bcC = spark.sparkContext.broadcast(cent)
    val bcQ = spark.sparkContext.broadcast(
      probeMap(queries, cent, id, vec, dim, nprobe))
    val scored = corpus.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bcC.value
        val qs = bcQ.value
        it.flatMap { case (nid, v) =>
          if (v == null || v.length < dim) Iterator.empty else {
          val n = math.sqrt(d(v, v))
          var best = -1L; var bestC = Double.NegativeInfinity
          cs.foreach { case (cid, cv, cn) =>
            val c = d(v, cv) / (n * cn)
            if (c > bestC) { bestC = c; best = cid }
          }
          qs.getOrElse(best, Array.empty[(Long, Array[Double], Double)])
            .iterator.collect { case (qid, qv, qn) if qid != nid =>
              (qid, nid, d(qv, v) / (qn * n))
            } }
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    topK(scored, k)
  }

  /** Materialized IVF index: one corpus pass assigns every vector to
    * its max-cosine cell (ties to the lowest centroid id) and carries
    * the precomputed norm — the expensive half of [[ivfTopK]], done
    * ONCE. At scale this frame is written partitioned by `cell`
    * (`df.write.partitionBy("cell")`), so a probe reads only its cells'
    * files; each arriving query batch then costs O(n·nprobe/C) scoring
    * with no re-assignment. Output: (cell, id, vec, norm).
    *
    * Quantizers past `broadcastCellLimit` cells route through
    * [[ivfIndexDistributed]] with EVERY coarse bucket probed — the
    * spec-pinned ≡-exact configuration (probes ≥ ⌈√c⌉), bit-identical
    * output — so no caller of the broadcast semantic-dedup family
    * silently inherits a driver materialization that grows with the
    * corpus (auto-sized quantizers set c ∝ n; at 10⁹ docs the centroid
    * set alone is ~8 GB). The size probe is a LIMIT-pushed count of at
    * most limit+1 rows, never a full centroid materialization. */
  def ivfIndex(corpus: DataFrame, centroids: DataFrame, id: String,
      vec: String, dim: Int,
      broadcastCellLimit: Int = IvfBroadcastCellLimit): DataFrame = {
    require(broadcastCellLimit > 0,
      s"broadcastCellLimit=$broadcastCellLimit")
    if (centroids.limit(broadcastCellLimit + 1).count() >
        broadcastCellLimit)
      return ivfIndexDistributed(corpus, centroids, id, vec, dim,
        probes = Int.MaxValue)
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val bcC = spark.sparkContext.broadcast(
      collectNormed(centroids, id, vec, dim))
    corpus.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bcC.value
        it.flatMap { case (nid, v) =>
          if (v == null || v.length < dim) None else Some {
          val n = math.sqrt(d(v, v))
          var best = -1L; var bestC = Double.NegativeInfinity
          cs.foreach { case (cid, cv, cn) =>
            val c = d(v, cv) / (n * cn)
            if (c > bestC) { bestC = c; best = cid }
          }
          (best, nid, v, n)
        } }
      }.toDF("cell", id, vec, "norm")
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): k-means cells prune the pair space — vectors are
    * assigned to their max-cosine centroid (the [[ivfIndex]] pass) and
    * only WITHIN-cell pairs are cosine-scored, so pair work is
    * Θ(Σ|cell|²) ≈ n·(n/C) instead of n², with C grown ∝ corpus to
    * hold expected occupancy flat (the q45 auto-planes law, but with
    * DATA-ADAPTIVE cells: trained centroids put the pair budget where
    * the density is, where random hyperplanes split it blindly).
    *
    * Scale shape: centroids broadcast; one corpus pass assigns cells
    * (typed kernel); then ONE shuffle of the index on the cell key
    * into a grouped kernel that generates + cosine-scores the
    * within-cell pairs over in-memory primitive arrays — each vector
    * crosses the wire and deserializes ONCE per cell, where a cell
    * self-join would materialize both 512-byte vectors into every one
    * of the ~occupancy² candidate rows (the cosineNearDupPairs cogroup
    * lesson, measured as the dominant 100× cost there). `maxCell`
    * drops degenerate mega-cells INSIDE the kernel with bounded
    * buffering (≤ maxCell rows retained; past it the group streams to
    * nothing) before any quadratic work — a cell of m vectors costs m²
    * pairs, and exact-duplicate mass belongs to [[Dedup.exactGroups]]
    * anyway — the [[Dedup]] band-cap discipline, replayed by the
    * oracle's QUALIFY count. Zero-norm vectors are excluded up front
    * (cosine undefined; and NaN compares differ cross-engine).
    *
    * Output: (id1 < id2, cosine ≥ tau) — candidate semantic duplicates;
    * feeding them to [[Dedup.connectedComponents]] + canonical
    * selection completes the SemDeDup keep-one-per-group pipeline.
    */
  def semanticNearDupPairs(corpus: DataFrame, centroids: DataFrame,
      id: String, vec: String, dim: Int, tau: Double,
      maxCell: Int): DataFrame =
    withinCellPairs(ivfIndex(corpus, centroids, id, vec, dim),
      id, vec, dim, tau, maxCell)

  /** The shared q99 pair stage: ONE shuffle of an assigned frame on
    * its cell key into the grouped pair kernel (bounded mega-cell
    * buffering, strict-fold cosine). */
  private def withinCellPairs(assigned: DataFrame, id: String,
      vec: String, dim: Int, tau: Double, maxCell: Int): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    assigned
      .where(col("norm") > 0)
      .select(col("cell"), col(id).cast("long"), col(vec), col("norm"))
      .as[(Long, Long, Array[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        // bounded buffering: keep at most maxCell members; a group that
        // exceeds the cap drains to nothing (memory ∝ maxCell, never
        // group size)
        val buf = new scala.collection.mutable.ArrayBuffer[
          (Long, Array[Double], Double)](16)
        var over = false
        while (it.hasNext) {
          val (_, vid, v, n) = it.next()
          if (!over) {
            buf += ((vid, v, n))
            if (buf.length > maxCell) { over = true; buf.clear() }
          }
        }
        if (over) Iterator.empty
        else (for {
          i <- buf.indices.iterator
          j <- (i + 1) until buf.length
        } yield {
          val (idA, vA, nA) = buf(i)
          val (idB, vB, nB) = buf(j)
          (math.min(idA, idB), math.max(idA, idB),
            d(vA, vB) / (nA * nB))
        }).filter(_._3 >= tau)
      }
      .toDF("id1", "id2", "cosine")
  }

  /** Probed (two-level) cell assignment — the SUBQUADRATIC companion
    * of [[ivfIndex]] for quantizers whose cell count grows with the
    * corpus: the auto-cells default sets c ∝ n, which makes exact
    * assignment Θ(n·c) = Θ(n²/occupancy) cosines — ProfileQ99 measured
    * it as the dominant q99_auto_cells slope (4.2× of the 100× wall
    * while pair mining stayed exactly linear). Here the centroids
    * themselves group on the driver into ⌈√c⌉ coarse buckets (each
    * centroid assigned to its max-cosine coarse seed, ties to the
    * lower id — IVF-of-IVF, the faiss two-level trick), and a vector
    * scans the √c coarse seeds plus only the member centroids of its
    * `probes` best buckets: O(√c·(1+probes)) cosines per vector.
    *
    * `probes` ≥ #coarse degenerates to EXACT [[ivfIndex]] assignment
    * (spec-pinned law — the explicit (cosine, cid) tie rule makes scan
    * order irrelevant); smaller probes trade a measured boundary
    * recall loss — the same loss class cell quantization itself has —
    * for the subquadratic index build. Deterministic throughout: fixed
    * seeds (the g lowest-cid centroids of an already hash-random
    * seeding), fixed tie rules, no RNG. */
  def ivfIndexProbed(corpus: DataFrame, centroids: DataFrame, id: String,
      vec: String, dim: Int, probes: Int = 4): DataFrame = {
    require(probes >= 1, s"probes=$probes must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val cs = collectNormed(centroids, id, vec, dim)
    require(cs.nonEmpty, "empty centroid frame")
    val g = math.ceil(math.sqrt(cs.length.toDouble)).toInt
    val coarse = cs.take(g)
    val members: Array[Array[Int]] = {
      val bs = Array.fill(g)(new scala.collection.mutable.ArrayBuffer[Int])
      cs.indices.foreach { ci =>
        val (_, cv, cn) = cs(ci)
        var best = 0
        var bestC = Double.NegativeInfinity
        var j = 0
        while (j < g) {
          val c = d(cv, coarse(j)._2) / (cn * coarse(j)._3)
          if (c > bestC) { bestC = c; best = j }
          j += 1
        }
        bs(best) += ci
      }
      bs.map(_.toArray)
    }
    val bc = spark.sparkContext.broadcast((cs, coarse, members))
    corpus.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (csv, co, mem) = bc.value
        val p = math.min(probes, co.length)
        it.flatMap { case (nid, v) =>
          if (v == null || v.length < dim) None else Some {
            val n = math.sqrt(d(v, v))
            if (n == 0) (-1L, nid, v, 0.0) // the exact path's NaN sink
            else {
              val gcos = Array.tabulate(co.length)(j =>
                d(v, co(j)._2) / (n * co(j)._3))
              val used = new Array[Boolean](co.length)
              var best = -1L
              var bestC = Double.NegativeInfinity
              // fold the coarse seeds in as assignment candidates first:
              // they ARE centroids (cs.take(g)), so `best` is a real cid
              // by LOCAL construction — no global argument needed that
              // the first probed bucket is nonempty (duplicate centroids
              // leave the later twin's bucket empty; previously only a
              // probe-order invariant kept such vectors out of the
              // zero-norm -1 sink). Also a free recall floor: the g
              // coarse seeds always compete even when unprobed. With
              // probes >= #coarse the fold is a subset of the member
              // scan, so the ≡-exact law is untouched.
              var cj = 0
              while (cj < co.length) {
                val ccid = co(cj)._1
                val cc = gcos(cj)
                if (cc > bestC || (cc == bestC && ccid < best)) {
                  bestC = cc; best = ccid
                }
                cj += 1
              }
              var t = 0
              while (t < p) {
                var bj = -1
                var bcos = Double.NegativeInfinity
                var j = 0
                while (j < co.length) {
                  if (!used(j) && gcos(j) > bcos) { bcos = gcos(j); bj = j }
                  j += 1
                }
                used(bj) = true
                val ms = mem(bj)
                var q = 0
                while (q < ms.length) {
                  val (cid, cv, cn) = csv(ms(q))
                  val c = d(v, cv) / (n * cn)
                  if (c > bestC || (c == bestC && cid < best)) {
                    bestC = c; best = cid
                  }
                  q += 1
                }
                t += 1
              }
              (best, nid, v, n)
            }
          }
        }
      }.toDF("cell", id, vec, "norm")
  }

  /** [[semanticNearDupPairs]] over the PROBED assignment — the
    * corpus-scale index-build shape (assignment O(n·√c) instead of the
    * exact path's O(n·c); same linear pair stage). Not oracle-gated:
    * probing trades boundary recall, measured in SCALE.md. */
  def semanticNearDupPairsProbed(corpus: DataFrame, centroids: DataFrame,
      id: String, vec: String, dim: Int, tau: Double,
      maxCell: Int = 10000, probes: Int = 4): DataFrame =
    withinCellPairs(ivfIndexProbed(corpus, centroids, id, vec, dim,
      probes), id, vec, dim, tau, maxCell)

  /** The DEFAULT [[semanticNearDupPairs]] entry point: the quantizer is
    * auto-sized to the corpus (the [[cosineNearDupPairs]] auto-planes
    * law). Cells `c ≈ n / targetOccupancy` hold expected occupancy flat,
    * so within-cell pair work Σ|cell|² ≈ n·occupancy stays LINEAR in the
    * corpus — a fixed c is the classic quantizer scale failure (at 100×
    * every n/c-member cell crosses `maxCell` and the run measures
    * cap-discard, not dedup: the q28-16-bit-band lesson, measured in
    * SCALE.md). Centroids are hash-sample seeded, `iters = 0` — the
    * standard IVF coarse-quantizer shape at index-build scale, where
    * driver-side Lloyd over c ∝ n samples would itself be the
    * bottleneck. The sizing pass costs one `count()`; pass `c`
    * explicitly when the corpus size is known (or use the
    * centroid-taking overload for trained cells at a pinned c — the
    * q99 oracle form, whose unrolled SQL replay needs fixed c/iters).
    *
    * Boundary behavior at `broadcastCellLimit`: AT the limit
    * (c == limit) the broadcast path runs — sample-seeded
    * [[kmeansCentroids]] collected to the driver; ONE cell past it
    * the distributed family runs — hash-threshold [[seededCentroids]]
    * + two-level bucket-cogroup assignment. These are DIFFERENT
    * quantizers, so the cell partition (and with it boundary recall
    * against `tau`) can shift across the limit. What is invariant —
    * spec-pinned in SessionizeSpec with a prototype-duplicate corpus —
    * is the contract both sides obey: assignment is a pure function
    * of the vector (identical vectors always share a cell, so exact
    * duplicates are never lost to the switch), and every emitted pair
    * passes the exact cosine-τ filter. Callers needing bit-stable
    * candidate sets across corpus growth through the limit should pin
    * the quantizer: pass explicit `c` or pre-trained centroids. */
  def semanticNearDupPairs(corpus: DataFrame, id: String, vec: String,
      dim: Int, tau: Double, maxCell: Int = 10000, c: Int = 0,
      targetOccupancy: Int = 64, sampleRate: Double = 0.2,
      broadcastCellLimit: Int = IvfBroadcastCellLimit): DataFrame = {
    require(targetOccupancy > 0, s"targetOccupancy=$targetOccupancy")
    val nC =
      if (c > 0) c
      else math.max(16L, corpus.count() / targetOccupancy)
        .min(Int.MaxValue.toLong).toInt
    // auto-sized quantizers set c ∝ n: past the broadcast contract the
    // DEFAULT is the distributed family (hash-threshold seeding at the
    // same expected occupancy + two-level bucket-cogroup assignment —
    // the oracle-gated q114 chain), so no caller silently inherits the
    // driver-side sample collect + centroid broadcast this overload
    // pays at small c. Explicit-c callers past the limit keep their
    // trained seeding; [[ivfIndex]]'s own routing still bounds the
    // assignment's driver state at ⌈√c⌉ coarse seeds.
    if (c == 0 && nC > broadcastCellLimit)
      return semanticNearDupPairsDistributed(corpus, id, vec, dim, tau,
        maxCell, targetOccupancy, probes = 2)
    val cent = kmeansCentroids(corpus, id, vec, dim, nC, iters = 0,
      sampleRate)
    semanticNearDupPairs(corpus, cent, id, vec, dim, tau, maxCell)
  }

  /** Deterministic hash-threshold quantizer seeding — the DISTRIBUTED
    * counterpart of [[kmeansCentroids]]`(iters = 0)` for corpora whose
    * cell count c ∝ n outgrows any driver materialization: a row is a
    * centroid iff its md5-uniform falls below `rate`, so the centroid
    * SET is a pure function of the corpus (partitioning-independent,
    * engine-replayable — the q63/q106 sampling discipline) and the
    * expected cell count is n·rate with no `count()` sizing pass and
    * no collect anywhere. Null/short/zero-norm vectors are excluded
    * (the [[vecOk]] + cosine-defined contract). Output: (id, vec) —
    * a FRAME, consumed distributedly by [[ivfIndexDistributed]]. */
  def seededCentroids(corpus: DataFrame, id: String, vec: String,
      dim: Int, rate: Double): DataFrame = {
    require(rate > 0 && rate <= 1, s"rate=$rate must be in (0, 1]")
    corpus.where(vecOk(vec, dim))
      .where(Curation.hashUniform(col(id)) < rate)
      .where(dot(col(vec), col(vec), dim) > 0)
      .select(col(id), col(vec))
  }

  /** [[ivfIndex]] against a DISTRIBUTED centroid frame — the 100 TB
    * assignment shape for quantizers sized c ∝ n, where collecting and
    * broadcasting all c centroids (the [[ivfIndex]]/[[ivfIndexProbed]]
    * driver step) cannot exist: at 10⁹ docs and the auto-occupancy
    * default, the centroid set alone is ~8 GB and still growing with
    * the corpus. Here the ONLY driver materialization is the
    * g = ⌈√c⌉ lowest-id COARSE seeds (the [[ivfIndexProbed]] two-level
    * structure made hierarchical end-to-end — √c-bounded by
    * construction, ~4 000 rows at c = 16M):
    *
    *   1. the centroid FRAME maps to (bucket, cid, cv, cn) against the
    *      broadcast coarse seeds (ties to the lowest bucket index — the
    *      probed path's rule) — distributed, never collected;
    *   2. each corpus vector scans the g coarse seeds, keeps the
    *      best coarse CANDIDATE (seeds are centroids, so assignment is
    *      total by local construction) and explodes to its `probes`
    *      best buckets — the p× corpus exchange that buys the
    *      no-c-broadcast property;
    *   3. ONE cogroup per bucket buffers that bucket's ~√c member
    *      centroids (loudly capped by `maxBucket`) and streams the
    *      probing vectors through an in-memory argmax kernel;
    *   4. a map-side-combined reduceGroups picks each vector's best
    *      (cosine DESC, cid ASC) across its probed buckets.
    *
    * Assignment semantics are EXACTLY [[ivfIndexProbed]]'s (same probe
    * selection, same tie rules, same coarse-candidate floor, same
    * zero-norm -1 sink), so `probes ≥ g` ≡ exact [[ivfIndex]] holds
    * here too (spec-pinned), and every cosine is the same strict fold
    * — the whole path replays in the SQL oracle. */
  def ivfIndexDistributed(corpus: DataFrame, centroids: DataFrame,
      id: String, vec: String, dim: Int, probes: Int = 4,
      maxBucket: Int = 1 << 20): DataFrame = {
    require(probes >= 1, s"probes=$probes must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    // The centroid frame is consumed THREE times (count, coarse-seed
    // collect, bucketing) and is typically a filter over the corpus
    // ([[seededCentroids]]) — unmaterialized, each consumer re-runs
    // the full corpus scan (guide §1.2/§2.4: passes, not configs).
    // One localCheckpoint (corpus/occupancy-sized blocks, never the
    // driver) turns those into block reads; values are unchanged.
    val cent = Dedup.materialize(
      centroids.select(col(id).cast("long").as(id), col(vec)))
    val c = cent.count()
    require(c > 0, "empty centroid frame")
    val g = math.ceil(math.sqrt(c.toDouble)).toInt
    // the ONLY driver materialization: ⌈√c⌉ lowest-id coarse seeds
    val coarse = collectNormed(
      cent.orderBy(col(id)).limit(g), id, vec, dim)
    val bcCo = spark.sparkContext.broadcast(coarse)
    // centroid frame → (bucket, cid, cv, cn); stays distributed
    val bucketed = cent
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val co = bcCo.value
        it.map { case (cid, cv) =>
          val cn = math.sqrt(d(cv, cv))
          var best = 0
          var bestC = Double.NegativeInfinity
          var j = 0
          while (j < co.length) {
            val cc = d(cv, co(j)._2) / (cn * co(j)._3)
            if (cc > bestC) { bestC = cc; best = j }
            j += 1
          }
          (best, cid, cv, cn)
        }
      }
    // corpus → `probes` (bucket, vid, v, n, seedCid, seedCos) rows
    val probedV = corpus.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val co = bcCo.value
        val p = math.min(probes, co.length)
        it.flatMap { case (vid, v) =>
          if (v == null || v.length < dim) Iterator.empty
          else {
            val n = math.sqrt(d(v, v))
            if (n == 0) // the exact path's zero-norm -1 sink
              Iterator.single((-1, vid, v, 0.0, -1L,
                Double.NegativeInfinity))
            else {
              val gcos = Array.tabulate(co.length)(j =>
                d(v, co(j)._2) / (n * co(j)._3))
              // coarse seeds as candidates (the probed-path floor)
              var sc = -1L
              var scC = Double.NegativeInfinity
              var j = 0
              while (j < co.length) {
                val cid = co(j)._1
                val cc = gcos(j)
                if (cc > scC || (cc == scC && cid < sc)) {
                  scC = cc; sc = cid
                }
                j += 1
              }
              val used = new Array[Boolean](co.length)
              val out = new Array[(Int, Long, Array[Double], Double,
                Long, Double)](p)
              var t = 0
              while (t < p) {
                var bj = -1
                var bcos = Double.NegativeInfinity
                var k = 0
                while (k < co.length) {
                  if (!used(k) && gcos(k) > bcos) { bcos = gcos(k); bj = k }
                  k += 1
                }
                used(bj) = true
                out(t) = (bj, vid, v, n, sc, scC)
                t += 1
              }
              out.iterator
            }
          }
        }
      }
    // one bucket cogroup: buffer the ~√c member centroids, stream the
    // vectors; then a map-side-combined per-vector argmax reduce
    val localBest = bucketed.groupByKey(_._1)
      .cogroup(probedV.groupByKey(_._1)) { (bkt, cIt, vIt) =>
        val mem = cIt.toArray
        require(mem.length <= maxBucket,
          s"coarse bucket $bkt holds ${mem.length} centroids > " +
            s"maxBucket=$maxBucket — skewed coarse seeding; raise " +
            "maxBucket or re-seed")
        vIt.map { case (_, vid, v, n, sc, scC) =>
          if (n == 0) (vid, v, 0.0, -1L, Double.NegativeInfinity)
          else {
            var best = sc
            var bestC = scC
            var q = 0
            while (q < mem.length) {
              val (_, cid, cv, cn) = mem(q)
              val cc = d(v, cv) / (n * cn)
              if (cc > bestC || (cc == bestC && cid < best)) {
                bestC = cc; best = cid
              }
              q += 1
            }
            (vid, v, n, best, bestC)
          }
        }
      }
    localBest.groupByKey(_._1)
      .reduceGroups { (a, b) =>
        if (a._5 > b._5 || (a._5 == b._5 && a._4 < b._4)) a else b
      }
      .map { case (_, (vid, v, n, cell, _)) => (cell, vid, v, n) }
      .toDF("cell", id, vec, "norm")
  }

  /** The corpus-scale [[semanticNearDupPairs]]: hash-threshold seeding
    * ([[seededCentroids]] at rate 1/targetOccupancy — expected cell
    * occupancy flat, pair work linear, the auto-cells law) and
    * [[ivfIndexDistributed]] assignment, so NOTHING driver-side grows
    * with the corpus — the ⌈√c⌉ coarse-seed collect is the only
    * materialization. Fully deterministic (hash seeding, pinned tie
    * rules, strict folds): oracle-gated end to end, unlike the probed
    * variant whose caller supplies a trained quantizer. */
  def semanticNearDupPairsDistributed(corpus: DataFrame, id: String,
      vec: String, dim: Int, tau: Double, maxCell: Int = 10000,
      targetOccupancy: Int = 64, probes: Int = 4): DataFrame = {
    require(targetOccupancy > 0, s"targetOccupancy=$targetOccupancy")
    val cent = seededCentroids(corpus, id, vec, dim,
      1.0 / targetOccupancy)
    withinCellPairs(
      ivfIndexDistributed(corpus, cent, id, vec, dim, probes),
      id, vec, dim, tau, maxCell)
  }

  /** Cluster-balanced diversity sampling — the DataComp/SSL-curation
    * selection step the SemDeDup family pairs with: instead of keeping
    * a uniform fraction of the corpus (which reproduces its redundancy
    * — dense regions stay dense), keep at most `perCell` vectors from
    * EVERY quantizer cell, so coverage of the embedding space is flat
    * by construction. Selection within a cell is the md5-uniform
    * ascending (ties to the lower id) — deterministic, replayable, and
    * independent of partitioning, the same argument as every sampling
    * operator here.
    *
    * Scale shape: the quantizer is the no-driver-growth distributed
    * family ([[seededCentroids]] at rate 1/targetOccupancy +
    * [[ivfIndexDistributed]] — c ∝ n, only the ⌈√c⌉ coarse seeds ever
    * materialize), and the per-cell keep is the bounded
    * [[Curation.topKPerGroup]] aggregate — at most `perCell` rows per
    * (cell, map task) cross the wire, never a window sort over cell
    * partitions. Expected cell occupancy is `targetOccupancy`, so the
    * kept fraction self-tunes to ≈ perCell/targetOccupancy of the
    * corpus while flattening density. Zero-norm vectors (cell −1, no
    * cosine geometry) are excluded.
    *
    * Output: (cell, rank, id, u) — rank 1..perCell by (u ASC, id ASC)
    * within each cell. */
  def clusterBalancedSample(corpus: DataFrame, id: String, vec: String,
      dim: Int, perCell: Int, targetOccupancy: Int = 64,
      probes: Int = 4): DataFrame = {
    require(perCell > 0, s"perCell=$perCell must be >= 1")
    require(targetOccupancy > 0, s"targetOccupancy=$targetOccupancy")
    val cent = seededCentroids(corpus, id, vec, dim,
      1.0 / targetOccupancy)
    val asg = ivfIndexDistributed(corpus, cent, id, vec, dim, probes)
      .where(col("norm") > 0)
    // lowest-u-first via the bounded top-k aggregate: score = −u keeps
    // the k largest (−u DESC = u ASC, ties id ASC — the oracle's
    // row_number order). u > 0 almost surely, but −0.0 → 0.0 on the
    // way back keeps a u=0 collision inside the hash contract.
    Curation.topKPerGroup(asg, "cell", id,
        -Curation.hashUniform(col(id)), perCell)
      .select(col("cell").cast("long").as("cell"), col("rank"), col(id),
        when(col("score") === 0.0, lit(0.0)).otherwise(-col("score"))
          .as("u"))
  }

  /** Approximate kNN GRAPH over the corpus — every vector's k nearest
    * neighbors restricted to its quantizer cell (the adjacency the
    * SemDeDup/SSL-curation literature clusters, scores density, and
    * propagates labels over; [[semanticNearDupPairs]] is its
    * τ-thresholded edge set, this is the fixed-degree form): the
    * no-driver-growth distributed quantizer ([[seededCentroids]] +
    * [[ivfIndexDistributed]]) assigns, then ONE cell-key shuffle into
    * the [[withinCellPairs]]-style grouped kernel, which computes each
    * unordered pair's strict-fold cosine ONCE and feeds both endpoints'
    * bounded k-selections — per-cell cost m²/2 cosines + m·k selection
    * state, never a corpus-wide candidate join. Mega-cells past
    * `maxCell` drain to nothing before quadratic work (the q99 cap
    * discipline, replayed by the oracle's QUALIFY); their mass is
    * [[graft.ext.Dedup.exactGroups]] territory. Neighbor order is
    * (cosine DESC, neighbor id ASC) — deterministic, and the cosine is
    * symmetric bit-for-bit (commutative IEEE multiply), so the graph
    * needs no direction canonicalization.
    *
    * Output: (id, rank 1..k, neighbor id, cosine); vectors alone in
    * their cell emit no rows (degree 0), zero-norm vectors are
    * excluded (no cosine geometry). */
  def knnGraphDistributed(corpus: DataFrame, id: String, vec: String,
      dim: Int, k: Int, targetOccupancy: Int = 64, probes: Int = 4,
      maxCell: Int = 10000): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(targetOccupancy > 0, s"targetOccupancy=$targetOccupancy")
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val cent = seededCentroids(corpus, id, vec, dim,
      1.0 / targetOccupancy)
    ivfIndexDistributed(corpus, cent, id, vec, dim, probes)
      .where(col("norm") > 0)
      .select(col("cell"), col(id).cast("long"), col(vec), col("norm"))
      .as[(Long, Long, Array[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val buf = new scala.collection.mutable.ArrayBuffer[
          (Long, Array[Double], Double)](16)
        var over = false
        while (it.hasNext) {
          val (_, vid, v, n) = it.next()
          if (!over) {
            buf += ((vid, v, n))
            if (buf.length > maxCell) { over = true; buf.clear() }
          }
        }
        if (over || buf.length < 2) Iterator.empty
        else {
          val m = buf.length
          val kk = math.min(k, m - 1)
          // per-node bounded selection: parallel (cosine, id) arrays,
          // insertion by (cos DESC, id ASC), fixed k slots
          val topC = Array.fill(m, kk)(Double.NegativeInfinity)
          val topI = Array.fill(m, kk)(Long.MaxValue)
          val size = new Array[Int](m)
          def offer(i: Int, nid: Long, c: Double): Unit = {
            val tc = topC(i); val ti = topI(i)
            var s = size(i)
            if (s == kk && (c < tc(s - 1) ||
              (c == tc(s - 1) && nid > ti(s - 1)))) return
            var p = if (s < kk) s else kk - 1
            while (p > 0 && (c > tc(p - 1) ||
                (c == tc(p - 1) && nid < ti(p - 1)))) {
              tc(p) = tc(p - 1); ti(p) = ti(p - 1); p -= 1
            }
            tc(p) = c; ti(p) = nid
            if (s < kk) size(i) = s + 1
          }
          var i = 0
          while (i < m) {
            var j = i + 1
            while (j < m) {
              val c = d(buf(i)._2, buf(j)._2) / (buf(i)._3 * buf(j)._3)
              offer(i, buf(j)._1, c)
              offer(j, buf(i)._1, c)
              j += 1
            }
            i += 1
          }
          buf.indices.iterator.flatMap { q =>
            (0 until size(q)).iterator.map { r =>
              (buf(q)._1, (r + 1).toLong, topI(q)(r), topC(q)(r))
            }
          }
        }
      }
      .toDF(id, "rank", "neighbor_id", "cosine")
  }

  /** Mutual-kNN edge set over a [[knnGraphDistributed]] edge frame:
    * the undirected pairs (u < v) where u lists v AND v lists u — the
    * symmetrized graph density-based clustering and robust dedup
    * verification want (a directed kNN edge into a hub says little; a
    * MUTUAL edge is the strong-tie signal). A production pipeline
    * passes its PERSISTED kNN edges; composing inline re-pays the
    * mine, the q112-inline note.
    *
    * Scale shape: the edge frame is ≤ n·k rows of 3 scalars by
    * construction — the self-join on the (src, dst) pair key is two
    * bounded exchanges of that small frame, never the corpus. The
    * cosine is symmetric bit-for-bit (see [[knnGraphDistributed]]),
    * so either direction's value serves. Output: (id1 < id2, cosine). */
  def mutualKnnEdges(knn: DataFrame, id: String): DataFrame = {
    val fwd = knn.where(col(id) < col("neighbor_id"))
      .select(col(id).as("id1"), col("neighbor_id").as("id2"),
        col("cosine"))
    val rev = knn.where(col(id) > col("neighbor_id"))
      .select(col("neighbor_id").as("id1"), col(id).as("id2"))
    fwd.join(rev, Seq("id1", "id2"))
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** kNN label-consistency audit — the mislabel/contamination detector
    * (confident-learning-lite: a vector whose neighborhood votes for a
    * DIFFERENT label is a labeling suspect, and the agreement rate is
    * the standard embedding-quality probe): each labeled vector's
    * k nearest within-cell neighbors ([[knnGraphDistributed]]) vote
    * with their labels; majority by (votes DESC, label ASC).
    *
    * Scale shape: the kNN mine (measured family) + TWO equi-joins of
    * the ≤ n·k edge frame to the (id, label) projection — label
    * payloads are scalars, never vectors — then a per-node vote
    * aggregate and an argmax window on the NODE key (≤ #labels rows
    * per node after the vote agg; partition size bounded by k).
    *
    * Output: (id, label, majority_label, votes, agree); vectors with
    * no within-cell neighbor are absent (no evidence either way —
    * inner-join semantics, like degree-0 nodes in the graph). */
  def knnLabelAudit(corpus: DataFrame, id: String, vec: String,
      label: String, dim: Int, k: Int, targetOccupancy: Int = 64,
      probes: Int = 4, maxCell: Int = 10000): DataFrame = {
    requireIntegralLabel("knnLabelAudit", corpus, label)
    val labeled = corpus.where(col(label).isNotNull)
    val knn = knnGraphDistributed(labeled, id, vec, dim, k,
      targetOccupancy, probes, maxCell)
    val lbl = labeled.select(col(id).cast("long").as("__lid"),
      col(label).cast("long").as("__lbl"))
    val votes = knn
      .join(lbl, knn("neighbor_id") === col("__lid"))
      .groupBy(col(id), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id))
      .orderBy(col("votes").desc, col("__lbl"))
    votes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .join(lbl.select(col("__lid").as(id), col("__lbl").as(label)),
        id)
      .select(col(id), col(label),
        col("__lbl").as("majority_label"), col("votes"),
        (col(label) === col("__lbl")).as("agree"))
  }

  /** Cluster-purity report — the quantizer-quality check a labeled
    * corpus gives for free (and the SSL-curation probe for whether
    * cells track semantics): per cell, its size, majority label
    * (ties to the lower label), majority count, and purity =
    * majority/size. Near-1 purity everywhere says the cell geometry
    * respects the labels; low-purity cells are where semantic dedup
    * and diversity sampling blur class boundaries.
    *
    * Scale shape: the distributed assignment (no driver growth), one
    * partial-agg'd (cell, label) count exchange, an argmax window
    * whose partitions hold ≤ #labels rows, and a cell-sized totals
    * join. Output: (cell, n_vecs, majority_label, majority_n,
    * purity); zero-norm vectors excluded. */
  def clusterPurity(corpus: DataFrame, id: String, vec: String,
      label: String, dim: Int, targetOccupancy: Int = 64,
      probes: Int = 4): DataFrame = {
    require(targetOccupancy > 0, s"targetOccupancy=$targetOccupancy")
    requireIntegralLabel("clusterPurity", corpus, label)
    val labeled = corpus.where(col(label).isNotNull)
    val cent = seededCentroids(labeled, id, vec, dim,
      1.0 / targetOccupancy)
    val asg = ivfIndexDistributed(labeled, cent, id, vec, dim, probes)
      .where(col("norm") > 0)
      .select(col("cell"), col(id))
    val lbl = labeled.select(col(id).cast("long").as("__lid"),
      col(label).cast("long").as("__lbl"))
    val counts = asg.join(lbl, asg(id) === col("__lid"))
      .groupBy(col("cell"), col("__lbl"))
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"))
      .orderBy(col("__n").desc, col("__lbl"))
    val tot = counts.groupBy(col("cell"))
      .agg(sum(col("__n")).as("n_vecs"))
    counts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .join(tot, "cell")
      .select(col("cell"), col("n_vecs"),
        col("__lbl").as("majority_label"), col("__n").as("majority_n"),
        (col("__n").cast("double") / col("n_vecs").cast("double"))
          .as("purity"))
  }

  /** kNN density scores — embedding-space outlier detection (DataComp/
    * SSL-curation: a vector whose neighborhood is FAR — low mean
    * cosine to its k nearest — is isolated noise; a near-1 mean sits
    * in a dense clone cluster): per node, its degree and the mean
    * cosine over its [[knnGraphDistributed]] neighbor list, folded in
    * RANK order (sort_array over the collected (rank, cosine) structs
    * — deterministic sum order, the sqlDot discipline; degree ≤ k
    * bounds the per-node state).
    *
    * Output: (id, degree, mean_cos); degree-0 nodes are absent. */
  def knnDensityScores(corpus: DataFrame, id: String, vec: String,
      dim: Int, k: Int, targetOccupancy: Int = 64, probes: Int = 4,
      maxCell: Int = 10000): DataFrame = {
    val knn = knnGraphDistributed(corpus, id, vec, dim, k,
      targetOccupancy, probes, maxCell)
    knn.groupBy(col(id))
      .agg(count(lit(1)).as("degree"),
        aggregate(
          transform(sort_array(collect_list(
            struct(col("rank"), col("cosine")))),
            s => s.getField("cosine")),
          lit(0.0), (acc, x) => acc + x).as("__s"))
      .select(col(id), col("degree"),
        (col("__s") / col("degree").cast("double")).as("mean_cos"))
  }

  /** Incremental SemDeDup — the batch-vs-index axis the LSH (q46) and
    * SimHash (q56) dedup families already have, for the k-means cell
    * family: an arriving batch assigns against the PERSISTED quantizer
    * (the same `centroids` the corpus `index` was built with —
    * [[ivfIndex]] live or [[writeIvfIndex]]/[[readIvfIndex]] on disk),
    * and only new×corpus and new×new pairs mine, within cells. The
    * corpus×corpus pairs were mined when the index was built and are
    * never re-paid — the whole point of the incremental axis.
    *
    * Scale shape: centroids broadcast into the batch assignment (one
    * batch pass, typed kernel); then ONE cell-key cogroup of the
    * assigned batch with the index — each vector crosses the wire
    * once and the index side never re-mines against itself. The
    * `maxCell` cap applies to the COMBINED cell population
    * (batch + index, bounded buffering — memory ∝ maxCell), so the
    * output is IDENTICAL to a full [[semanticNearDupPairs]] re-mine of
    * the union restricted to batch-touching pairs (the q46 identity
    * law, spec-pinned). A re-ingested id (same id on both sides) is
    * SUPERSEDED by its batch row: the index copy neither pairs nor
    * counts toward the cap — exactly the population a full re-mine of
    * the id-keyed union would see (round-12; previously the stale copy
    * double-counted toward `maxCell` and could drop a cell the law
    * keeps).
    *
    * Output: (id1 < id2, cosine ≥ tau) — each pair exactly once (both
    * members assign to one functional cell). */
  def incrementalSemanticNearDupPairs(batch: DataFrame, index: DataFrame,
      centroids: DataFrame, id: String, vec: String, dim: Int,
      tau: Double, maxCell: Int = 10000): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val b = ivfIndex(batch, centroids, id, vec, dim)
      .where(col("norm") > 0)
      .select(col("cell"), col(id).cast("long"), col(vec), col("norm"))
      .as[(Long, Long, Array[Double], Double)]
    incrementalCellMine(b, index, id, vec, dim, tau, maxCell)
  }

  /** [[incrementalSemanticNearDupPairs]] with the batch assigned by
    * [[ivfIndexDistributed]] — the incremental axis of the
    * distributed-quantizer family (q114): the persisted centroid FRAME
    * (c ∝ n, never collected) serves both the original index build and
    * every arriving batch, so NOTHING driver-side grows with the
    * corpus on the whole incremental path either. Mining semantics are
    * shared code with the broadcast form (same combined-population
    * cap, same re-ingested-id supersede rule), so the q46-law identity
    * — output ≡ a full re-mine of the union restricted to
    * batch-touching pairs, for the same centroid set — holds verbatim
    * and the whole chain replays in the SQL oracle. */
  def incrementalSemanticNearDupPairsDistributed(batch: DataFrame,
      index: DataFrame, centroids: DataFrame, id: String, vec: String,
      dim: Int, tau: Double, maxCell: Int = 10000,
      probes: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val b = ivfIndexDistributed(batch, centroids, id, vec, dim, probes)
      .where(col("norm") > 0)
      .select(col("cell"), col(id).cast("long"), col(vec), col("norm"))
      .as[(Long, Long, Array[Double], Double)]
    incrementalCellMine(b, index, id, vec, dim, tau, maxCell)
  }

  /** The shared incremental mine: ONE cell-key cogroup of an assigned
    * batch with the persisted index — new×corpus and new×new pairs
    * only, combined-population `maxCell` cap, re-ingested ids
    * superseded by their batch row (see
    * [[incrementalSemanticNearDupPairs]] for the full contract). */
  private def incrementalCellMine(
      b: org.apache.spark.sql.Dataset[(Long, Long, Array[Double], Double)],
      index: DataFrame, id: String, vec: String, dim: Int,
      tau: Double, maxCell: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    // cell comes back integer-typed from a partitioned on-disk index
    // (directory inference) — upcast; zero-norm rows were excluded at
    // index build but the filter is idempotent insurance
    val ix = index
      .where(col("norm") > 0)
      .select(col("cell").cast("long"), col(id).cast("long"), col(vec),
        col("norm"))
      .as[(Long, Long, Array[Double], Double)]
    b.groupByKey(_._1).cogroup(ix.groupByKey(_._1)) { (_, bs, is) =>
      // bounded buffering with the cap on the COMBINED population —
      // the exact drop rule a full re-mine of the id-keyed union
      // applies: a re-ingested id's index copy is superseded (skipped
      // entirely), so it neither pairs nor counts toward the cap. The
      // id set costs memory ∝ the retained population (≤ maxCell + 1).
      val bbuf = new scala.collection.mutable.ArrayBuffer[
        (Long, Array[Double], Double)](16)
      val ibuf = new scala.collection.mutable.ArrayBuffer[
        (Long, Array[Double], Double)](16)
      val batchIds = new scala.collection.mutable.HashSet[Long]
      var total = 0
      var over = false
      def drain(it: Iterator[(Long, Long, Array[Double], Double)],
          buf: scala.collection.mutable.ArrayBuffer[
            (Long, Array[Double], Double)],
          skip: Long => Boolean): Unit =
        while (it.hasNext) {
          val (_, vid, v, n) = it.next()
          if (!skip(vid)) {
            total += 1
            if (!over) {
              buf += ((vid, v, n))
              if (total > maxCell) {
                over = true; bbuf.clear(); ibuf.clear(); batchIds.clear()
              }
            }
          }
        }
      drain(bs, bbuf, _ => false)
      if (!over) bbuf.foreach(batchIds += _._1)
      drain(is, ibuf, vid => !over && batchIds.contains(vid))
      if (over || bbuf.isEmpty) Iterator.empty
      else {
        def score(a: (Long, Array[Double], Double),
            b2: (Long, Array[Double], Double)): Option[(Long, Long, Double)] = {
          val (idA, vA, nA) = a
          val (idB, vB, nB) = b2
          if (idA == idB) None
          else {
            val c = d(vA, vB) / (nA * nB)
            if (c >= tau)
              Some((math.min(idA, idB), math.max(idA, idB), c))
            else None
          }
        }
        val newNew = for {
          i <- bbuf.indices.iterator
          j <- ((i + 1) until bbuf.length).iterator
          p <- score(bbuf(i), bbuf(j)).iterator
        } yield p
        val newOld = for {
          i <- bbuf.indices.iterator
          j <- ibuf.indices.iterator
          p <- score(bbuf(i), ibuf(j)).iterator
        } yield p
        newNew ++ newOld
      }
    }.toDF("id1", "id2", "cosine")
  }

  /** The DETERMINISTIC DISTRIBUTED MEAN as a contract — the
    * order-pinned two-level fold shared by [[prototypeScores]] (whose
    * doc states the law) and [[lloydRefineDistributed]]'s update step:
    * level 1 folds members ascending-id within monotone id-block
    * shards (`id div idsPerShard` — at most idsPerShard rows per
    * (group, shard) task, never a group-sized funnel, folded from 0.0
    * == the oracle's first-element list_reduce for IEEE addition);
    * level 2 folds the shard partials in shard order (loudly capped by
    * `maxShardsPerGroup`); one final divide per dimension. Input:
    * (group, id, vector); output: (__g, __cent). */
  private def groupMeans(
      v: org.apache.spark.sql.Dataset[(Long, Long, Array[Double])],
      dim: Int, idsPerShard: Long, maxShardsPerGroup: Int,
      what: String): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val partials = v
      .groupByKey(t => (t._1, java.lang.Math.floorDiv(t._2, idsPerShard)))
      .mapGroups { (key: (Long, Long), it) =>
        val (g, shard) = key
        val rows = it.toArray.sortBy(_._2)
        val s = new Array[Double](dim)
        var r = 0
        while (r < rows.length) {
          val x = rows(r)._3
          var j = 0
          while (j < dim) { s(j) += x(j); j += 1 }
          r += 1
        }
        (g, shard, rows.length.toLong, s.toSeq)
      }
    partials.groupByKey(_._1)
      .mapGroups { (g, it) =>
        val ps = it.toArray.sortBy(_._2)
        require(ps.length <= maxShardsPerGroup,
          s"$what mean for group $g spans ${ps.length} id-block " +
            s"shards > maxShardsPerGroup=$maxShardsPerGroup — raise " +
            "idsPerShard to match the id range")
        val n = ps.iterator.map(_._3).sum
        val s = new Array[Double](dim)
        var r = 0
        while (r < ps.length) {
          val x = ps(r)._4
          var j = 0
          while (j < dim) { s(j) += x(j); j += 1 }
          r += 1
        }
        var j = 0
        while (j < dim) { s(j) /= n.toDouble; j += 1 }
        (g, s.toSeq)
      }.toDF("__g", "__cent")
  }

  /** Per-dimension corpus moments of an embedding column — the
    * preprocessing statistics every standardization/whitening step
    * needs (and the q105 deterministic-distributed-double-sum contract
    * applied to the GLOBAL group): Σx and Σx² per dimension via the
    * same order-pinned two-level fold (ascending-id within ≤idsPerShard
    * id-block shards, shard partials in shard order, loud
    * maxShards ceiling — size idsPerShard ∝ the id range, the q78
    * block-shard law), then mean = Σx/n and
    * std = sqrt(Σx²/n − mean²) as a FIXED IEEE op chain (one divide,
    * one multiply, one subtract, one sqrt — replayed identically by
    * the SQL oracle; negative cancellation residue clamps to 0 the
    * same way in both engines). The textbook two-pass formula would
    * need a second corpus scan; the one-pass ss/n − mean² form is the
    * documented trade (cancellation-prone for tiny true variance, but
    * exact-identical cross-engine — determinism is the contract here,
    * same as every fold in this family).
    *
    * Null/short vectors are excluded; zero-norm vectors participate
    * (moments need no cosine geometry). Output: (dim, n, mean, std),
    * dim 1-based. */
  def embeddingDimStats(df: DataFrame, id: String, vec: String,
      dim: Int, idsPerShard: Long = 4096L,
      maxShards: Int = 1 << 20): DataFrame = {
    require(idsPerShard >= 1, s"idsPerShard=$idsPerShard must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(id).cast("long").as("__i"), col(vec).as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) >= dim)
      .as[(Long, Array[Double])]
    val partials = v
      .groupByKey(t => java.lang.Math.floorDiv(t._1, idsPerShard))
      .mapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(_._1)
        val s = new Array[Double](dim)
        val ss = new Array[Double](dim)
        var r = 0
        while (r < rows.length) {
          val x = rows(r)._2
          var j = 0
          while (j < dim) {
            s(j) += x(j)
            ss(j) += x(j) * x(j)
            j += 1
          }
          r += 1
        }
        (shard, rows.length.toLong, s.toSeq, ss.toSeq)
      }
    partials.groupByKey(_ => 0L)
      .flatMapGroups { (_, it) =>
        val ps = it.toArray.sortBy(_._1)
        require(ps.length <= maxShards,
          s"dim stats span ${ps.length} id-block shards > " +
            s"maxShards=$maxShards — raise idsPerShard to match the " +
            "id range")
        val n = ps.iterator.map(_._2).sum
        val s = new Array[Double](dim)
        val ss = new Array[Double](dim)
        var r = 0
        while (r < ps.length) {
          var j = 0
          while (j < dim) {
            s(j) += ps(r)._3(j)
            ss(j) += ps(r)._4(j)
            j += 1
          }
          r += 1
        }
        (0 until dim).iterator.map { j =>
          val mean = s(j) / n.toDouble
          val v2 = ss(j) / n.toDouble - mean * mean
          val std = if (v2 <= 0) 0.0 else math.sqrt(v2)
          ((j + 1).toLong, n, mean, std)
        }
      }
      .toDF("dim", "n", "mean", "std")
  }

  /** Standardized (z-scored) embeddings — the whitening-diagonal
    * preprocessing step quantizer/ANN pipelines run before training
    * (per-dimension zero mean, unit variance): every coordinate maps
    * to (x − mean_d)/std_d against the [[embeddingDimStats]] corpus
    * moments. A constant dimension (std = 0) maps to 0.0 — the rule
    * both engines replay identically, where the naive divide would
    * poison the vector with NaN/Inf.
    *
    * Scale shape: the stats frame is `dim` rows — bounded by the
    * embedding WIDTH, not the corpus — so it collects and broadcasts
    * by construction (unlike the centroid frames, which grow with the
    * corpus and must stay distributed); the transform is then ONE
    * shuffle-free typed map over the corpus.
    *
    * Output: (id, vec_std: array<double>). */
  def standardizeEmbeddings(df: DataFrame, id: String, vec: String,
      dim: Int, idsPerShard: Long = 4096L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val st = embeddingDimStats(df, id, vec, dim, idsPerShard)
      .select(col("dim"), col("mean"), col("std"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    require(st.length == dim, s"expected $dim stat rows, got ${st.length}")
    val means = st.map(_._2)
    val stds = st.map(_._3)
    val bc = spark.sparkContext.broadcast((means, stds))
    df.select(col(id).cast("long").as("__i"), col(vec).as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) >= dim)
      .as[(Long, Array[Double])]
      .map { case (i, x) =>
        val (m, sd) = bc.value
        val z = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          z(j) = if (sd(j) == 0) 0.0 else (x(j) - m(j)) / sd(j)
          j += 1
        }
        (i, z.toSeq)
      }
      .toDF(id, "vec_std")
  }

  /** Per-class prototype scores — the SSL-Prototypes / DataComp-style
    * curation filter that SemDeDup pipelines pair with dedup: each
    * class's (label's) embedding CENTROID is its prototype, and every
    * member scores by cosine to it. Low scorers are outliers/noise;
    * near-1 scorers are redundant prototypical mass — both ends are
    * what curation trims.
    *
    * Determinism at scale (the hard part — distributed double sums
    * reassociate): the centroid mean is an ORDER-PINNED TWO-LEVEL fold,
    * and that two-level shape IS the operator's contract, replayed
    * exactly by the SQL oracle. Level 1 folds members in ascending id
    * order within monotone id-block shards (`id div idsPerShard` — at
    * most idsPerShard rows per (label, shard) task, never a
    * class-sized funnel); level 2 folds the shard partials in shard
    * order (≤ idRange/idsPerShard partial rows per label, loudly
    * capped by `maxShardsPerGroup` — size idsPerShard to the id range,
    * the q78 block-shard law). One final divide per dimension. The
    * oracle replays both levels as nested id-/shard-ordered
    * `list_reduce` folds (the kmeans-chain idiom), so mean, cosine,
    * and every score sit inside the cross-engine hash gate.
    *
    * Contracts, loud: integral group keys (the output group column is
    * LongType); null labels, null/short vectors, and zero-norm vectors
    * are excluded (cosine undefined; NaN orders differently across
    * engines); a zero-norm CENTROID (exact cancellation) drops its
    * class the same way in both engines.
    *
    * Output: (id, group, proto_cos). */
  def prototypeScores(df: DataFrame, id: String, vec: String, dim: Int,
      group: String, idsPerShard: Long = 4096L,
      maxShardsPerGroup: Int = 1 << 20): DataFrame = {
    require(idsPerShard >= 1, s"idsPerShard=$idsPerShard must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val v = df.select(col(group).cast("long").as("__g"),
        col(id).cast("long").as("__i"), col(vec).as("__v"))
      .where(col("__g").isNotNull && col("__v").isNotNull &&
        size(col("__v")) >= dim)
      .as[(Long, Long, Array[Double])]
      .filter(t => d(t._3, t._3) > 0)
    val cents = groupMeans(v, dim, idsPerShard, maxShardsPerGroup,
      "prototype")
    // #labels centroid rows: AQE broadcasts the join side from its
    // measured size (the q100/q102 gate — no unconditional hint)
    v.toDF("__g", "__i", "__v").join(cents, "__g")
      .as[(Long, Long, Array[Double], Array[Double])]
      .flatMap { case (g, i, x, c) =>
        val nc = d(c, c)
        if (nc <= 0) None
        else Some((i, g, d(x, c) / (math.sqrt(d(x, x)) * math.sqrt(nc))))
      }
      .toDF(id, group, "proto_cos")
  }

  /** Distributed Lloyd refinement — quantizer TRAINING for the c ∝ n
    * regime, completing the [[seededCentroids]]/[[ivfIndexDistributed]]
    * family: [[kmeansCentroids]] (the q66/q88 replay discipline) runs
    * Lloyd driver-local over a collected sample, which cannot exist
    * when the centroid set itself grows with the corpus; here BOTH
    * halves of every iteration are distributed and nothing driver-side
    * ever exceeds the ⌈√c⌉ coarse seeds:
    *
    *   - ASSIGN: [[ivfIndexDistributed]] against the current centroid
    *     FRAME (probed two-level semantics, deterministic tie rules;
    *     `probes` ≥ ⌈√c⌉ degenerates to exact 1-NN — the spec-pinned
    *     law). Zero-norm corpus vectors sit out (cosine undefined).
    *   - UPDATE: each cell's new centroid is the order-pinned two-level
    *     [[groupMeans]] fold of its members (the q105 deterministic-
    *     mean contract — id-block shards ≤ `idsPerShard`, shard
    *     partials in shard order, one divide per dim), so the refined
    *     vectors are bit-identical across partitionings and engines.
    *   - An EMPTY cell (nothing assigned) and a ZERO-NORM mean (exact
    *     cancellation) both KEEP the previous centroid — the
    *     [[kmeansCentroids]] empty-cell rule, extended to the one mean
    *     cosine can't consume; centroid ids persist across iterations,
    *     so cells are stable handles for incremental consumers.
    *
    * Each iteration costs one probed assignment (O(n·√c + n·probes·√c)
    * work through `probes`+1 corpus-sized exchanges) plus two
    * partial-agg'd mean shuffles and an AQE-gated centroid join —
    * per-iteration cluster jobs are the price of never materializing
    * the c ∝ n centroid set (the faiss driver-Lloyd trade reversed,
    * deliberately). Every level goes through
    * [[graft.ext.Dedup.materialize]] (eager checkpoint — the plan
    * would otherwise reference the whole growing iteration chain, the
    * trap [[graft.ext.Dedup.connectedComponents]] documents), and a
    * level's local-checkpoint blocks are freed as soon as the next
    * level materializes (tracked RDD ids, the CC discipline; reliable
    * checkpoint-dir files follow the `cleanCheckpoints` note there).
    *
    * Fully deterministic end to end, so the SQL oracle replays
    * TRAINING with unrolled per-iteration CTEs: the q114 assignment
    * chain + the q105 nested list_reduce mean + the keep-previous
    * coalesce (q117).
    *
    * Output: (`id`, `vec`) centroid frame, same ids as the input
    * centroids, directly usable by every IVF-family operator. */
  def lloydRefineDistributed(corpus: DataFrame, centroids: DataFrame,
      id: String, vec: String, dim: Int, iters: Int, probes: Int = 4,
      idsPerShard: Long = 4096L,
      maxShardsPerGroup: Int = 1 << 20): DataFrame = {
    require(iters >= 0, s"iters=$iters must be >= 0")
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val sc = spark.sparkContext
    var cent = centroids.select(col(id).cast("long").as(id), col(vec))
    var freePrev: () => Unit = () => ()
    var i = 0
    while (i < iters) {
      val members = ivfIndexDistributed(corpus, cent, id, vec, dim,
          probes)
        .where(col("norm") > 0)
        .select(col("cell").as("__g"), col(id).cast("long").as("__i"),
          col(vec).as("__v"))
        .as[(Long, Long, Array[Double])]
      val means = groupMeans(members, dim, idsPerShard,
          maxShardsPerGroup, "lloyd cell")
        .as[(Long, Seq[Double])]
        .filter(t => d(t._2.toArray, t._2.toArray) > 0)
        .toDF("__g", "__cv")
      val before = sc.getPersistentRDDs.keySet.toSet
      val next = Dedup.materialize(
        cent.join(means, cent(id) === means("__g"), "left")
          .select(cent(id), coalesce(col("__cv"), cent(vec)).as(vec)))
      val mine = sc.getPersistentRDDs.keySet.toSet -- before
      freePrev() // the previous level's blocks are dead now
      freePrev = () => sc.getPersistentRDDs.collect {
        case (rid, rdd) if mine(rid) => rdd.unpersist(blocking = false)
      }: Unit
      cent = next
      i += 1
    }
    cent
  }

  /** Persist an [[ivfIndex]] partitioned by `cell` — the on-disk form a
    * production deployment reuses across query batches. Each cell is
    * its own partition directory, so [[ivfTopKIndexed]]'s
    * `cell IN (probed…)` filter becomes a PARTITION filter on read:
    * only the probed cells' files are listed and scanned, never the
    * full index (spec-asserted against the physical plan). */
  def writeIvfIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Read back a [[writeIvfIndex]] store. The partition column comes
    * back integer-typed from directory inference; downstream encoders
    * upcast it, so the frame drops into [[ivfTopKIndexed]] unchanged. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)

  /** ANN over a materialized [[ivfIndex]]: each query probes its
    * `nprobe` max-cosine cells, the index is FILTERED to the union of
    * probed cells (partition pruning when stored partitioned by cell),
    * and candidates re-rank exactly. Scoring is the same strict fold as
    * [[ivfTopK]], so for identical centroids the two paths return
    * identical rows (spec-asserted). */
  def ivfTopKIndexed(queries: DataFrame, index: DataFrame,
      centroids: DataFrame, id: String, vec: String, dim: Int, k: Int,
      nprobe: Int = 4): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val cent = collectNormed(centroids, id, vec, dim)
    val probed = probeMap(queries, cent, id, vec, dim, nprobe)
    val bcQ = spark.sparkContext.broadcast(probed)
    val scored = index
      .where(col("cell").isin(probed.keys.toSeq: _*))
      .select(col("cell"), col(id).cast("long"), col(vec), col("norm"))
      .as[(Long, Long, Array[Double], Double)]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (cell, nid, v, n) =>
          if (v == null || v.length < dim) Iterator.empty else
          qs.getOrElse(cell, Array.empty[(Long, Array[Double], Double)])
            .iterator.collect { case (qid, qv, qn) if qid != nid =>
              (qid, nid, d(qv, v) / (qn * n))
            }
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    topK(scored, k)
  }

  /** Deterministic k-means training for the IVF coarse quantizer — the
    * offline half [[ivfTopK]] leaves to the caller, as a first-class
    * operator.
    *
    * Shape at scale (the faiss design): ONE distributed pass
    * hash-samples the corpus (`sampleRate` is the caller's contract
    * that the sample fits one node, exactly like a broadcast side —
    * size it as C·occupancy, not as a corpus fraction, when the corpus
    * is 100 TB), the sample is collected, Lloyd iterations run
    * driver-local (zero per-iteration cluster jobs, no cached
    * intermediate frames), and the resulting centroid frame broadcasts
    * into [[ivfTopK]]/[[ivfIndex]].
    *
    * Every step is engine-portable, so a SQL oracle replays TRAINING
    * bit-exactly with unrolled per-iteration CTEs:
    *   - sampling: the md5-top-60-bit uniform ([[Curation.hashUniform]])
    *     < `sampleRate`, plus null/short/zero-norm vector drops;
    *   - init: the `c` sample vectors with the smallest (u, id), cid =
    *     1..c in that order;
    *   - assignment: argmax cosine over the centroids via the shared
    *     strict fold, ties to the LOWEST cid (strict > over ascending
    *     cid — the same rule as every IVF path here);
    *   - update: per-dimension mean folding members in ascending id
    *     order (plain double, fixed order — the [[dot]] determinism
    *     pattern); an empty cell keeps its previous centroid.
    *
    * Output: (`id`, `vec`) centroid frame, cid 1..c, directly usable as
    * the `centroids` argument of the IVF operators. */
  def kmeansCentroids(corpus: DataFrame, id: String, vec: String,
      dim: Int, c: Int, iters: Int, sampleRate: Double): DataFrame = {
    require(c > 0 && iters >= 0, s"need c > 0, iters >= 0 (got $c, $iters)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val samp: Array[(Long, Array[Double], Double)] = corpus
      .select(col(id).cast("long").as("vid"), col(vec).as("v"),
        Curation.hashUniform(col(id)).as("u"))
      .where(col("u") < sampleRate && col("v").isNotNull &&
        size(col("v")) >= dim)
      .as[(Long, Array[Double], Double)]
      .collect()
      .filter { case (_, v, _) => d(v, v) > 0 } // zero-norm: cosine undefined
    require(samp.length >= c,
      s"sample of ${samp.length} vectors < c=$c centroids " +
        s"(raise sampleRate=$sampleRate)")
    var cents: Array[Array[Double]] =
      samp.sortBy { case (vid, _, u) => (u, vid) }.take(c).map(_._2)
    // ascending id: the mean fold order; norms hoisted — members never
    // change across iterations. Lazy: the seeded-only path (iters = 0,
    // the auto-sized-cells scale shape) never pays this sample-sized
    // sort + norm pass.
    lazy val members = samp.sortBy(_._1)
      .map { case (_, v, _) => (v, math.sqrt(d(v, v))) }
    for (_ <- 1 to iters) {
      val cn = cents.map(cv => math.sqrt(d(cv, cv)))
      val sums = Array.fill(c)(new Array[Double](dim))
      val cnts = new Array[Long](c)
      members.foreach { case (v, n) =>
        var best = 0
        var bestC = Double.NegativeInfinity
        var ci = 0
        while (ci < c) {
          val cos = d(v, cents(ci)) / (n * cn(ci))
          if (cos > bestC) { bestC = cos; best = ci }
          ci += 1
        }
        cnts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(c)(ci =>
        if (cnts(ci) == 0) cents(ci)
        else {
          val m = new Array[Double](dim)
          var j = 0
          while (j < dim) { m(j) = sums(ci)(j) / cnts(ci); j += 1 }
          m
        })
    }
    cents.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v.toSeq) }.toSeq
      .toDF(id, vec)
  }

  /** Random-hyperplane LSH bucket key: `planes` sign bits, plane p's
    * component d = ±1 from md5(p:d) (deterministic, no RNG state).
    * Vectors sharing a bucket are near in angle with high probability;
    * search cost drops from O(n) to O(n / 2^planes) per query.
    *
    * The ±1 matrix is data-independent, so it is computed ONCE on the
    * driver (same md5 derivation — oracles replaying md5(p:d) signs in
    * SQL still match) and emitted as literal sign arrays; the round-2
    * version evaluated planes×dim md5 calls per ROW for a constant. */
  def hyperplaneKey(v: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val signs: Array[Double] = Array.tabulate(dim) { d =>
        if (hyperplaneSign(p, d + 1)) 1.0 else -1.0
      }
      val proj = aggregate(
        zip_with(v, lit(signs), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Sign of hyperplane p's component d (1-based), from the first hex
    * digit of md5("p:d") — the exact derivation the SQL oracles replay. */
  private def hyperplaneSign(p: Int, d: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
    ((hex(0) >> 4) & 0xf) >= 8
  }

  /** Deterministic ±1 random projection (Achlioptas 2003's database-
    * friendly JL transform, sign-only variant): out_j = Σ_d v_d·s_jd
    * with s_jd = ±1 from the first hex digit of md5("rp:j:d") — the
    * [[hyperplaneKey]] derivation under its own namespace, so the SQL
    * oracle replays every sign and every coordinate. The
    * Johnson–Lindenstrauss guarantee makes this THE cheap pre-step for
    * the whole ANN/quantizer family at 100 TB: projecting 64→16 dims
    * keeps pairwise angles within the JL distortion while quartering
    * every downstream cosine, exchange byte count, and cell-kernel
    * buffer — and unlike a trained PCA, the matrix is a pure function
    * of (j, d), shippable to any executor without a fit pass.
    *
    * Determinism: the sign matrix is data-independent (computed once,
    * closure-shipped); projections fold d ascending, the optional L2
    * norm folds j ascending then one sqrt + one divide per coordinate
    * (zero vectors stay zero) — every double replays bit-for-bit in
    * the oracle's list_reduce. Null/short vectors are dropped (the
    * [[vecOk]] contract). Shuffle-free: one typed per-row kernel.
    *
    * Output: (id, vec: array<double> of dimOut). */
  def randomProjection(df: DataFrame, id: String, vec: String,
      dimIn: Int, dimOut: Int, l2Normalize: Boolean = true): DataFrame = {
    require(dimIn > 0, s"dimIn=$dimIn must be >= 1")
    require(dimOut > 0, s"dimOut=$dimOut must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val signs: Array[Array[Double]] = Array.tabulate(dimOut, dimIn) {
      (j, d) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"rp:${j + 1}:${d + 1}".getBytes("UTF-8"))
        if (((hex(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
    df.where(vecOk(vec, dimIn))
      .select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .map { case (vid, v) =>
        val out = new Array[Double](dimOut)
        var j = 0
        while (j < dimOut) {
          val s = signs(j)
          var acc = 0.0
          var d = 0
          while (d < dimIn) { acc += v(d) * s(d); d += 1 }
          out(j) = acc
          j += 1
        }
        if (l2Normalize) {
          var n2 = 0.0
          var i = 0
          while (i < dimOut) { n2 += out(i) * out(i); i += 1 }
          val n = math.sqrt(n2)
          if (n > 0) {
            i = 0
            while (i < dimOut) { out(i) /= n; i += 1 }
          }
        }
        (vid, out.toSeq)
      }
      .toDF(id, "vec")
  }

  /** (id, vec, norm, bucket) in ONE typed pass. Per-row plane
    * projections and the norm are the same strict left folds as the
    * column forms ([[dot]], [[hyperplaneKey]]) — identical doubles,
    * identical bucket bits — but compiled JVM loops instead of
    * interpreted HOF expressions; the corpus-sized HOF evaluation was
    * the expensive half of every LSH path (the q29 lesson, measured
    * ~40× on the dot fold). */
  private[graft] def keyedNormed(df: DataFrame, id: String, vec: String,
      dim: Int, planes: Int, strict: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val signs: Array[Array[Double]] = Array.tabulate(planes, dim)((p, d) =>
      if (hyperplaneSign(p, d + 1)) 1.0 else -1.0)
    df.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        // a null or short vector null-propagated through the column
        // forms (null bucket never equi-joins, null cosine never ranks)
        // — the kernel drops such corpus rows outright, same visible
        // behavior; strict mode (contract-small frames: the query side)
        // fails loudly instead, matching collectNormed
        it.flatMap { case (i, v) =>
          if (v == null || v.length < dim) {
            if (strict) throw new IllegalArgumentException(
              s"vector $i is null or shorter than dim=$dim")
            None
          } else Some {
          var bucket = 0L
          var p = 0
          while (p < planes) {
            val s = signs(p)
            var proj = 0.0
            var j = 0
            while (j < dim) { proj += v(j) * s(j); j += 1 }
            if (proj > 0) bucket |= 1L << p
            p += 1
          }
          var n = 0.0
          var j = 0
          while (j < dim) { n += v(j) * v(j); j += 1 }
          (i, v, math.sqrt(n), bucket)
        } }
      }.toDF(id, vec, "norm", "bucket")
  }

  /** LSH-bucketed ANN: candidates share a hyperplane bucket; exact
    * cosine re-ranking inside the probed buckets. `multiProbe = true`
    * additionally probes every single-bit flip of the query's key —
    * planes+1 buckets ≈ (planes+1)/2^planes of the corpus instead of
    * 1/2^planes, the standard recall/cost dial.
    *
    * Scale shape: the corpus is bucketed once (a column expression, no
    * shuffle); the probed query side is broadcast; the only shuffle is
    * the per-query top-k. Search cost O(n·probes/2^planes) per query.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, dim: Int, k: Int, planes: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = dotK(dim) _
    val keyed = keyedNormed(corpus, id, vec, dim, planes)
      .select(col(id).as("neighbor_id"), col(vec).as("cv"),
        col("norm").as("cn"), col("bucket"))
    val probes =
      if (!multiProbe) array(col("bucket"))
      else array(col("bucket") +: (0 until planes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val q = keyedNormed(queries, id, vec, dim, planes, strict = true)
      .select(col(id).as("query_id"), col(vec).as("qv"),
        col("norm").as("qn"), explode(probes).as("bucket"))
    val scored = keyed.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"),
        col("qn"), col("cn"))
      .as[(Long, Long, Array[Double], Array[Double], Double, Double)]
      .mapPartitions { it =>
        it.map { case (qid, nid, qv, cv, qn, cn) =>
          (qid, nid, d(qv, cv) / (qn * cn))
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    topK(scored, k)
  }
}
