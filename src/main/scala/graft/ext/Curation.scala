package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines, beyond the
  * dedup/similarity families: benchmark decontamination, deterministic
  * stratified sampling, and bounded group-wise top-k selection.
  *
  * Scale design:
  *   - decontamination: the benchmark/eval set is tiny relative to the
  *     corpus (an eval suite vs a 100 TB lake), so its distinct shingle
  *     set broadcasts; the corpus side is ONE scan + an exploded
  *     broadcast-hash probe + a partial-aggregated groupBy on doc_id.
  *     No shuffle ever carries corpus shingles.
  *   - sampling: a pure per-row filter on an md5-derived uniform — no
  *     shuffle, no RNG state, reproducible across engines, retries, and
  *     partitionings (Spark's `sample()` is seed+partition dependent and
  *     cannot be replayed by an oracle).
  *   - top-k per group: a typed [[Aggregator]] holding at most k rows
  *     per group per map task, so the shuffle carries k·groups rows
  *     instead of the whole corpus. A window `row_number` over a
  *     low-cardinality partition key would funnel the full corpus
  *     through #groups reducers — the classic skew trap at scale.
  */
object Curation {

  // ------------------------------------------------------- decontamination

  /** Shingle-overlap decontamination report: for every corpus document
    * sharing at least `minHits` distinct k-shingles with any benchmark
    * document, the absolute and relative overlap.
    *
    * Output: (id, n_sh, hits, overlap) where `n_sh` is the doc's
    * distinct-shingle count, `hits` how many of those appear anywhere in
    * the benchmark set, `overlap` = hits / n_sh. Clean documents do not
    * appear (the report is the contaminated set, not a corpus-sized
    * left join).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      id: String, text: String, k: Int = 3, minHits: Int = 2): DataFrame = {
    // both sides shingle through the typed kernel (the column-form
    // explode pays interpreted HOFs per shingle on the corpus scan —
    // the hot path at scale); strings are kernel≡column spec-pinned
    val bsh = Dedup.shingleRows(benchmark, id, text, k)
      .select(col("s")).distinct()
    val csh = Dedup.shingleRows(corpus, id, text, k)
    csh.join(broadcast(bsh), "s")
      .groupBy(col(id), col("n_sh"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
      .select(col(id), col("n_sh"), col("hits"),
        (col("hits").cast("double") / col("n_sh").cast("double")).as("overlap"))
  }

  /** [[decontaminate]] at the scale where the EVAL SET itself is big:
    * the exact form broadcasts every benchmark shingle STRING (an eval
    * suite of millions of documents broadcasts gigabytes); this form
    * broadcasts an `mBits`-bit Bloom filter instead — 128 KB at the
    * default 2^20 bits — and probes it per corpus shingle, shuffle-free
    * until the per-doc aggregation. Standard Bloom semantics: flagged
    * docs are a SUPERSET of the exact report (false positives at the
    * configured occupancy, never false negatives — the right direction
    * for contamination review queues; BloomDecontaminateSpec pins the
    * superset property against [[decontaminate]]).
    *
    * Deterministic and cross-engine replayable, unlike library Bloom
    * filters whose hash functions an external oracle cannot reproduce:
    * position j of shingle s = (h0 + j·h1) mod mBits with h0/h1 the
    * md5-hex nibble ranges 1..15 / 17..30 — the exact Kirsch–
    * Mitzenmacher arithmetic [[Dedup.minhashSignatures]] already pins
    * kernel≡column≡SQL. `hashes` ≤ 16 keeps h0 + j·h1 overflow-free.
    *
    * Output: (id, n_sh, hits, overlap) exactly as [[decontaminate]],
    * with `hits` counting distinct shingles whose every Bloom bit is
    * set. The eval side collects DISTINCT bit positions (bounded by
    * mBits, not by eval size) to build the mask.
    */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      id: String, text: String, k: Int = 3, mBits: Int = 1 << 20,
      hashes: Int = 4, minHits: Int = 2): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits=$mBits not a word multiple")
    require(hashes >= 1 && hashes <= 16, s"hashes=$hashes outside [1,16]")
    val spark = corpus.sparkSession
    import spark.implicits._
    val evalPos = Dedup.shingleRows(benchmark, id, text, k)
      .select(col("s")).distinct()
      .as[String]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap(s => bloomPositions(md, s, hashes, mBits))
      }.distinct().collect()
    val words = new Array[Long](mBits / 64)
    evalPos.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    val bc = spark.sparkContext.broadcast(words)
    Dedup.shingleRows(corpus, id, text, k)
      .select(col(id), col("n_sh"), col("s"))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val w = bc.value
        it.filter { case (_, _, s) =>
          bloomPositions(md, s, hashes, mBits).forall(p =>
            (w(p >>> 6) & (1L << (p & 63))) != 0L)
        }
      }
      .toDF(id, "n_sh", "s")
      .groupBy(col(id), col("n_sh"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
      .select(col(id), col("n_sh"), col("hits"),
        (col("hits").cast("double") / col("n_sh").cast("double"))
          .as("overlap"))
  }

  /** Bloom bit positions of one shingle: h0/h1 are md5-hex nibbles
    * 1..15 / 17..30 read exactly as the SQL `conv(substr(md5, ...))`
    * replay does; position j = (h0 + j·h1) mod mBits. */
  private[graft] def bloomPositions(md: java.security.MessageDigest,
      s: String, hashes: Int, mBits: Int): Array[Int] = {
    md.reset()
    val b = md.digest(s.getBytes("UTF-8"))
    var u0 = 0L
    var i = 0
    while (i < 8) { u0 = (u0 << 8) | (b(i) & 0xffL); i += 1 }
    var u1 = 0L
    i = 8
    while (i < 16) { u1 = (u1 << 8) | (b(i) & 0xffL); i += 1 }
    val h0 = u0 >>> 4 // nibbles 1..15: 60 bits
    val h1 = u1 >>> 8 // nibbles 17..30: 56 bits
    Array.tabulate(hashes)(j => ((h0 + j * h1) % mBits).toInt)
  }

  // ------------------------------------------------------- sampling

  /** Deterministic uniform in [0,1) from an id column: the top 60 bits
    * of md5(id) over 2^60. Engine-portable (the DuckDB oracle replays
    * the same digest arithmetic — exact integer, one exact fp divide)
    * and partitioning-independent, unlike `DataFrame.sample`. */
  def hashUniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")
      .cast("double") / lit((1L << 60).toDouble)

  /** Stratified sample: keep a row iff its hash-uniform falls below its
    * stratum's rate. `rates` maps stratum value → rate; strata absent
    * from the map use `defaultRate`. Pure per-row filter — shuffle-free
    * at any scale. Returns the input schema unchanged (the uniform is
    * internal — callers wanting it re-derive via [[hashUniform]]). */
  def stratifiedSample(df: DataFrame, id: String, stratum: String,
      rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratum) === s, lit(r)).otherwise(acc)
    }
    // reserved name so an input column `u` can't be shadowed/collided
    df.withColumn("__u", hashUniform(col(id)))
      .where(col("__u") < rate)
      .drop("__u")
  }

  /** Epoch-aware data-mixing manifest — the MATERIALIZED repeat plan
    * (DoReMi/Pile-style source weighting on the upsampling axis, where
    * [[stratifiedSample]]/[[temperatureMix]] cover the subsampling
    * one): each source carries a repeat factor w ≥ 0, a document
    * appears ⌊w⌋ times plus one more iff its md5-uniform falls below
    * frac(w) — so a source's expected multiplicity is exactly w with
    * NO RNG state (idempotent across retries, partitionings, engines:
    * the q63/q106 sampling discipline). Every emitted copy carries
    * u = hash-uniform("id:copy"), the shuffle key a downstream shard
    * manifest orders by so repeats of one document scatter across
    * training shards instead of clumping into one.
    *
    * Scale shape: one per-row weight lookup in a CONSTANT-FOLDED map
    * literal + one bounded explode of ≤ ⌈w⌉ copies — shuffle-free at
    * any corpus size. The lookup is `element_at` against one foldable
    * `map()` expression, not a per-source CASE chain: a manifest with
    * thousands of sources would grow a CASE tree linearly and trip
    * codegen limits (the round-13 form's documented ceiling), while
    * the map literal folds to a single constant whatever the source
    * count. A source missing from `weights` (or a NULL source) still
    * raises loudly per row — a silent default would skew the mix (the
    * guardedWeight discipline); `maxRepeat` bounds the fan-out at
    * build time (weights are a driver-side constant, so the guard
    * costs nothing per row).
    *
    * Output: (id, source, copy 1..copies, u). */
  def mixingManifest(df: DataFrame, id: String, source: String,
      weights: Seq[(String, Double)], maxRepeat: Int = 16): DataFrame = {
    require(weights.nonEmpty, "mixingManifest needs at least one weight")
    require(weights.map(_._1).distinct.length == weights.length,
      "mixingManifest: duplicate source in weights")
    weights.foreach { case (s, w) =>
      require(w >= 0 && math.ceil(w) <= maxRepeat,
        s"mixingManifest: weight $w for source '$s' outside " +
          s"[0, maxRepeat=$maxRepeat]")
    }
    val wmap = map(weights.flatMap { case (s, w) =>
      Seq(lit(s), lit(w)) }: _*)
    // try_element_at: null (not an ANSI MAP_KEY error) for a missing
    // key in ANY session config, so the guard below owns the failure
    // message everywhere
    val looked = try_element_at(wmap, col(source))
    val wcol = when(looked.isNotNull, looked)
      .otherwise(raise_error(concat(lit("mixingManifest: source '"),
        col(source), lit("' has no declared weight"))).cast("double"))
    val copies = (floor(wcol) +
      when(hashUniform(col(id)) < wcol - floor(wcol), 1L)
        .otherwise(0L)).cast("long")
    df.select(col(id), col(source), copies.as("__c"))
      .where(col("__c") >= 1) // sequence(1, 0) would count DOWN
      .select(col(id), col(source),
        explode(sequence(lit(1L), col("__c"))).as("copy"))
      .withColumn("u", hashUniform(
        concat(col(id).cast("string"), lit(":"),
          col("copy").cast("string"))))
  }

  /** Temperature-scaled domain mixing — the multilingual/multi-source
    * sampler LLM corpora are mixed with: domain d (lang, source, …)
    * with `n_d` docs gets mixture weight `w_d = n_d^α / Σ_e n_e^α`
    * (α < 1 upweights tail domains; α = 1 is natural frequency), and a
    * target epoch of `targetFraction · N` docs gives the keep rate
    * `r_d = min(1, target · w_d / n_d)`, applied through the
    * deterministic [[hashUniform]] — a pure per-row filter, no shuffle,
    * no RNG state, identical across retries/partitionings/engines.
    *
    * The per-domain counts collect to the driver (bounded by #domains —
    * the q76 contract; at 100 TB this is thousands of rows, not corpus
    * rows) and come back as a literal when-chain, so the corpus pass is
    * a single codegen'd filter.
    *
    * Cross-engine exactness: the weight normalizer Σ n_e^α is a DOUBLE
    * left fold over domains SORTED BY NAME — order-pinned so the oracle
    * replays the identical IEEE sum — and α = 0.5 routes through
    * `sqrt` (correctly rounded per IEEE 754, identical in every libm),
    * the oracle-pinned temperature. Other α use `math.pow`, which can
    * drift a last ulp vs another engine's libm — harmless for sampling,
    * outside the hash-oracle contract.
    *
    * Output: kept rows as (id, domain, u, rate), `u` the row's uniform
    * and `rate` its domain's keep rate (head-room for weighting by
    * 1/rate downstream). Domains where `r_d` clamps at 1 keep every
    * row — the epoch lands under target rather than oversampling heads.
    */
  def temperatureResample(df: DataFrame, id: String, domain: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    val pow: Double => Double =
      if (alpha == 0.5) math.sqrt else math.pow(_, alpha)
    // non-null domain contract, enforced loudly: a null domain would
    // otherwise NPE in getString/sortBy (or silently drop via a NaN
    // rate) — the mixture recipe has no rate for an unlabeled doc
    val counts = df.groupBy(col(domain)).count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"temperatureResample: null $domain — every row needs a " +
            "domain label (filter or backfill nulls upstream)")
        (r.getString(0), r.getLong(1))
      }
      .sortBy(_._1).toIndexedSeq
    val total = counts.iterator.map(_._2).sum
    val norm = counts.foldLeft(0.0) { case (a, (_, n)) => a + pow(n.toDouble) }
    val target = total.toDouble * targetFraction
    val rate = counts.foldLeft(lit(Double.NaN)) { case (acc, (d, n)) =>
      val r = math.min(1.0, (target * (pow(n.toDouble) / norm)) / n.toDouble)
      when(col(domain) === d, lit(r)).otherwise(acc)
    }
    df.select(col(id), col(domain), hashUniform(col(id)).as("u"),
        rate.as("rate"))
      .where(col("u") < col("rate"))
  }

  /** Per-group token-budget cap — the "at most B tokens of domain d per
    * epoch" knob of a data-mixture recipe (complementing
    * [[temperatureResample]]'s rate form with an exact token quota):
    * docs take a deterministic unbiased priority order within their
    * group (the [[hashUniform]] of their id — partitioning/retry
    * independent, no RNG), and the group keeps its prefix while the
    * running token total stays ≤ `budget`.
    *
    * Scale shape (round-10, the sharded form the round-9 doc promised):
    * a `Window.partitionBy(group)` cumsum funnels every group through
    * ONE reducer — a skewed group (English ≈ half a real corpus) makes
    * that a single-task critical path. With `shards` > 1 the cumsum is
    * a two-level prefix sum instead:
    *   1. shard s = floor(u·S): uniform RANGES of the priority order,
    *      so the global (u, id) order is shard 0's rows, then shard
    *      1's, … — per-(group, shard) prefix sums + the shard's offset
    *      (total tokens of earlier shards) reassemble the exact global
    *      cumsum (integer addition — bit-identical to the unsharded
    *      form, spec-pinned);
    *   2. shard totals come from one map-side partial agg pass
    *      (#groups × #shards rows), offsets from a window over that
    *      tiny frame, broadcast back;
    *   3. EARLY EXIT: a shard whose offset already exceeds the budget
    *      can keep nothing (token counts are non-negative lengths), so
    *      its rows are pruned BEFORE the per-shard sort — at corpus
    *      scale, with budget ≪ corpus tokens, nearly every row skips
    *      the window entirely.
    * Cost: two scans of `df` (totals + windows) instead of one; the
    * largest group's critical path shrinks by S. Exactness requires
    * integral token counts (double cumsums don't reassociate) —
    * enforced loudly.
    *
    * Output: kept rows as (id, group, n_tokens, cum_tokens); the cumsum
    * is monotone so the kept set is exactly a per-group prefix.
    */
  private[ext] def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  /** Loud per-row non-negativity guard for the sharded prefix sums:
    * the shard-offset early-exit prune (`__off <= budget`) is only
    * equivalent to the single-window form when counts never decrease a
    * cumulative sum, so a negative count must fail the declared
    * loud-contract way instead of silently diverging from the oracle.
    * A `raise_error` branch is codegen'd and costs one comparison per
    * row — no driver-side pre-scan of the corpus. */
  private def nonNegGuard(op: String, id: String): Column =
    when(col("n_tokens") < 0, raise_error(concat(
      lit(s"$op: negative token count (sharded prefix sums require " +
        s"non-negative counts) at $id="), col(id).cast("string"))))
      .otherwise(col("n_tokens"))

  def tokenBudgetCap(df: DataFrame, id: String, group: String,
      tokens: Column, budget: Long, shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards >= 1, s"shards=$shards must be >= 1")
    val base = df.select(col(id), col(group), tokens.as("n_tokens"))
      .withColumn("__u", hashUniform(col(id)))
    if (shards == 1) {
      val w = Window.partitionBy(col(group)).orderBy(col("__u"), col(id))
        .rowsBetween(Long.MinValue, 0)
      base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= budget)
        .drop("__u")
    } else {
      require(isIntegral(base.schema("n_tokens").dataType),
        "sharded cumsum needs integral token counts (exact " +
          s"reassociation); got ${base.schema("n_tokens").dataType} — " +
          "pass shards = 1 for a single-reducer double cumsum")
      val guarded = base.withColumn("n_tokens",
        nonNegGuard("tokenBudgetCap", id))
      // u < 1 by construction (top 60 md5 bits / 2^60) and u·S < S in
      // double arithmetic for S ≪ 2^53; least() is cheap insurance
      val sh = guarded.withColumn("__shard",
        least(floor(col("__u") * shards), lit(shards - 1)).cast("int"))
      val wOff = Window.partitionBy(col(group)).orderBy(col("__shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = sh.groupBy(col(group), col("__shard"))
        .agg(sum(col("n_tokens")).as("__t"))
        .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
        .select(col(group), col("__shard"), col("__off"))
      val wS = Window.partitionBy(col(group), col("__shard"))
        .orderBy(col("__u"), col(id))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // null-SAFE group equality: windows/groupBy treat a NULL group as
      // its own partition, so the offsets join must too — a plain
      // equi-join would silently drop every unlabeled row and break the
      // bit-parity contract with the shards=1 window form (spec-pinned)
      val off = offsets.withColumnRenamed(group, "__g")
        .withColumnRenamed("__shard", "__s")
      sh.join(broadcast(off),
          col(group) <=> col("__g") && col("__shard") === col("__s"))
        .where(col("__off") <= budget)
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wS) + col("__off"))
        .where(col("cum_tokens") <= budget)
        .select(col(id), col(group), col("n_tokens"), col("cum_tokens"))
    }
  }

  /** Greedy token-budget sequence packing (the q78 shape as a reusable
    * operator): docs pack in deterministic `id` order per group into
    * fixed `budget`-token bins; a doc whose cumulative sum crosses a
    * boundary opens the next pack. Same two-level prefix sum as
    * [[tokenBudgetCap]], with one difference: the output is
    * corpus-sized (every row gets a pack id, no budget prune), and the
    * shard key must be order-MONOTONE in `id` rather than uniform —
    * `id div idsPerShard` blocks, so #shards grows with the id range
    * (≈1 per 10⁶ ids by default: one shard at test SFs, one per
    * replica at the 100× replica, thousands at corpus scale). Any
    * monotone split is exact; balance tracks id density per block.
    * Integral token counts enforced as in [[tokenBudgetCap]].
    *
    * Output: (id, group, n_tokens, pack_id) — pack_id =
    * (cum − 1) div budget clamped at 0 (the zero-token-first-doc edge:
    * DuckDB floors −1/B to −1 while Spark's `div` truncates to 0).
    */
  def packSequences(df: DataFrame, id: String, group: String,
      tokens: Column, budget: Long,
      idsPerShard: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(idsPerShard >= 1, s"idsPerShard=$idsPerShard must be >= 1")
    val raw = df.select(col(id), col(group), tokens.as("n_tokens"))
    require(isIntegral(raw.schema("n_tokens").dataType),
      "sharded cumsum needs integral token counts (exact " +
        s"reassociation); got ${raw.schema("n_tokens").dataType}")
    val base = raw
      .withColumn("n_tokens", nonNegGuard("packSequences", id))
      .withColumn("__shard", expr(s"`$id` div ${idsPerShard}L"))
    val wOff = Window.partitionBy(col(group)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(group), col("__shard"))
      .agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col(group), col("__shard"), col("__off"))
    val wS = Window.partitionBy(col(group), col("__shard"))
      .orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe group equality — see tokenBudgetCap's offsets join
    val off = offsets.withColumnRenamed(group, "__g")
      .withColumnRenamed("__shard", "__s")
    base.join(broadcast(off),
        col(group) <=> col("__g") && col("__shard") === col("__s"))
      .withColumn("__cum", sum(col("n_tokens")).over(wS) + col("__off"))
      .withColumn("pack_id", expr(s"greatest(__cum - 1, 0L) div ${budget}L"))
      .select(col(id), col(group), col("n_tokens"), col("pack_id"))
  }

  /** Concat-and-chunk block manifest — the OTHER canonical pretraining
    * batch former ([[packSequences]] bins whole docs and pads; GPT-style
    * pipelines instead CONCATENATE the shuffled corpus into one token
    * stream and cut fixed `blockSize` windows, docs spanning block
    * boundaries): every document gets a deterministic global offset in
    * the md5-shuffled token stream (order = (u, id) — replayable,
    * partitioning-independent), and each (block, doc) overlap is
    * emitted with the doc-local token span it contributes.
    *
    * Scale shape: the global prefix sum is two-level like
    * [[tokenBudgetCap]] — per-shard sums (one partial-agg'd exchange to
    * `shards` rows, windowed over the bounded shard list) + a
    * within-shard cumulative window whose shard key floor(u·S) is
    * order-monotone in u, so (shard, u, id) IS the global order; S
    * scales with the corpus (the q106 S ∝ corpus note) to bound the
    * per-shard window partition. The span explode adds one row per
    * boundary crossing — Σ spans ≤ docs + total_tokens/blockSize.
    * All integer; counts guarded non-negative the loud way.
    *
    * Output: (block_id, id, tok_start, tok_end) — 1-based doc-local
    * span [tok_start, tok_end] that block takes from that doc; docs
    * with zero tokens emit nothing. */
  def concatBlockManifest(df: DataFrame, id: String, tokens: Column,
      blockSize: Long, shards: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockSize >= 1, s"blockSize=$blockSize must be >= 1")
    require(shards >= 1, s"shards=$shards must be >= 1")
    val raw = df.select(col(id), tokens.as("n_tokens"))
    require(isIntegral(raw.schema("n_tokens").dataType),
      "sharded cumsum needs integral token counts (exact " +
        s"reassociation); got ${raw.schema("n_tokens").dataType}")
    val base = raw
      .withColumn("n_tokens", nonNegGuard("concatBlockManifest", id))
      .where(col("n_tokens") > 0)
      .withColumn("__u", hashUniform(col(id)))
      .withColumn("__shard",
        least(floor(col("__u") * shards), lit(shards - 1)).cast("int"))
    val wOff = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__shard"))
      .agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__soff", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__shard").as("__s"), col("__soff"))
    val wS = Window.partitionBy(col("__shard"))
      .orderBy(col("__u"), col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), col("__shard") === col("__s"))
      .withColumn("__off",
        coalesce(sum(col("n_tokens")).over(wS), lit(0L)) + col("__soff"))
      .withColumn("block_id", explode(sequence(
        expr(s"__off div ${blockSize}L"),
        expr(s"(__off + n_tokens - 1) div ${blockSize}L"))))
      .select(col("block_id"), col(id),
        (greatest(col("block_id") * blockSize - col("__off"), lit(0L))
          + 1L).as("tok_start"),
        least(col("n_tokens"),
          (col("block_id") + 1L) * blockSize - col("__off"))
          .as("tok_end"))
  }

  // ------------------------------------------------------- PII scrubbing

  /** Conservative PII patterns chosen to parse AND match identically in
    * Java regex (Spark's codegen'd regexp functions) and RE2 (the
    * DuckDB oracle): character classes, bounded quantifiers, and ASCII
    * `\b` only — no backrefs or lookaround (which RE2 lacks). */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection counts per row — group 0 extraction (the patterns
    * deliberately have no capture groups), pure column expressions. */
  def piiCounts(text: Column): Map[String, Column] = Map(
    "n_emails" ->
      size(regexp_extract_all(text, lit(emailPattern), lit(0))).cast("long"),
    "n_ips" ->
      size(regexp_extract_all(text, lit(ipv4Pattern), lit(0))).cast("long"))

  /** PII redaction: every email → `<EMAIL>`, then every IPv4 → `<IP>`
    * (fixed order; both engines replace ALL occurrences). Shuffle-free
    * per-row rewrite — the scrubbing pass of a training-data pipeline. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      ipv4Pattern, "<IP>")

  /** [[piiCounts]] + [[piiRedact]] fused into one typed kernel — the
    * corpus-scan hot path (the q75 idiom). The column form runs FOUR
    * regex passes per row (two `regexp_extract_all` counts + two
    * `regexp_replace` rewrites); here the email pass counts and
    * rewrites in a single matcher walk, so each row costs three scans,
    * with both patterns compiled once per partition. Semantics are
    * replicated exactly (parity-spec-pinned): emails are counted and
    * replaced on the input text, IPs are COUNTED on the input text but
    * REPLACED on the email-redacted text (an IP inside an email's local
    * part counts but never survives redaction), and Java's
    * `Matcher.appendReplacement` is the same engine and replacement
    * path Spark's codegen'd `regexp_replace` uses — the literal
    * replacements carry no `$`/`\` so the escape handling never
    * diverges. A null text yields null counts and a null redaction,
    * like the column form under `sizeOfNull=null` semantics.
    *
    * Output: `id`, n_emails, n_ips, redacted (the md5 fingerprint the
    * callers want stays a codegen'd column over this frame).
    *
    * `id` must be a NON-NULL integral column: the kernel's tuple
    * encoder is primitive-`Long`-backed, so a null id NPEs at runtime
    * and narrower integral ids come back widened to `LongType`. Callers
    * with string/nullable ids should scrub a projection keyed by a
    * synthetic `monotonically_increasing_id` and join back.
    */
  def piiScrubFrame(df: org.apache.spark.sql.DataFrame, id: String,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), text.cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val email = java.util.regex.Pattern.compile(emailPattern)
        val ip = java.util.regex.Pattern.compile(ipv4Pattern)
        it.map { case (docId, t) =>
          if (t == null)
            (docId, None: Option[Long], None: Option[Long],
              None: Option[String])
          else {
            // email pass: count + rewrite in one walk
            val em = email.matcher(t)
            val sb = new java.lang.StringBuilder(t.length)
            var nEmails = 0L
            while (em.find()) { nEmails += 1; em.appendReplacement(sb, "<EMAIL>") }
            em.appendTail(sb)
            val s1 = sb.toString
            // IP count on the ORIGINAL text (column form counts there)
            val ic = ip.matcher(t)
            var nIps = 0L
            while (ic.find()) nIps += 1
            // IP rewrite on the email-redacted text (column form nests)
            val ir = ip.matcher(s1)
            val sb2 = new java.lang.StringBuilder(s1.length)
            while (ir.find()) ir.appendReplacement(sb2, "<IP>")
            ir.appendTail(sb2)
            (docId, Some(nEmails), Some(nIps), Some(sb2.toString))
          }
        }
      }
      .toDF(id, "n_emails", "n_ips", "redacted")
  }

  // ------------------------------------------------------- URL filtering

  /** Host of the FIRST http(s) URL in the text (empty string when none)
    * — the key of domain-level corpus filtering (blocklists, per-domain
    * caps, the C4/RefinedWeb curation step). Same Java-regex/RE2
    * compatibility constraints as the PII patterns. */
  val urlHostPattern: String = "https?://([A-Za-z0-9.-]+)"
  def urlDomain(text: Column): Column =
    regexp_extract(text, urlHostPattern, 1)

  // ------------------------------------------------------- top-k per group

  /** One scored row inside the top-k buffer. */
  final case class Scored(score: Double, id: Long)

  /** Bounded top-k aggregator: keeps the k largest by (score desc, id
    * asc on ties — fully deterministic). The buffer never exceeds k
    * entries, so map-side partial aggregation bounds both memory and
    * shuffle volume at k rows per group per task.
    *
    * Score ordering is SQL's: comparisons go through
    * `java.lang.Double.compare` (NaN greatest, NaN equal to itself) and
    * -0.0 normalizes to 0.0 on entry, so the result is identical to a
    * `row_number() OVER (ORDER BY score DESC, id)` window for every
    * representable score (spec-asserted including NaN/±0 collisions). */
  final class TopKAggregator(k: Int)
      extends Aggregator[(String, Long, Double), Seq[Scored], Seq[Scored]] {
    require(k > 0, s"top-k needs k > 0 (got $k)")
    private def better(a: Scored, b: Scored): Boolean = {
      val c = java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }
    private def trim(s: Seq[Scored]): Seq[Scored] = s.sortWith(better).take(k)
    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], in: (String, Long, Double)): Seq[Scored] = {
      // -0.0 -> 0.0: SQL ordering treats them equal; Double.compare not
      val cand = Scored(if (in._3 == 0.0) 0.0 else in._3, in._2)
      // common case: buffer full and the candidate loses to its floor
      if (buf.length >= k && better(buf.last, cand)) buf
      else trim(buf :+ cand)
    }
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b)
    def finish(buf: Seq[Scored]): Seq[Scored] = buf
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Contamination ATTRIBUTION — not just "this doc is contaminated"
    * but WHICH eval item leaked into it: for every (corpus doc, eval
    * doc) pair sharing at least `minHits` distinct k-shingles, the
    * shared count and the fraction of the EVAL doc covered
    * (hits / eval doc's shingle count — the leak-severity axis a
    * benchmark steward triages by: 0.9 means the eval item is
    * essentially inside the training doc).
    *
    * Scale shape: the eval side broadcasts (shingle → eval_id,
    * eval_n_sh) — eval suites are tiny next to the corpus by the same
    * contract as [[decontaminate]] — and the corpus side is one scan +
    * broadcast probe + a partial-aggregated groupBy on (doc, eval)
    * pairs, whose cardinality is bounded by real contamination mass,
    * never corpus × eval.
    *
    * Output: (id, eval_id, eval_n_sh, hits, eval_overlap); clean pairs
    * do not appear. */
  def decontaminateAttribution(corpus: DataFrame, benchmark: DataFrame,
      id: String, text: String, k: Int = 3, minHits: Int = 2): DataFrame = {
    val bsh = Dedup.shingleRows(benchmark, id, text, k)
      .select(col(id).as("eval_id"), col("n_sh").as("eval_n_sh"), col("s"))
    val csh = Dedup.shingleRows(corpus, id, text, k)
      .select(col(id), col("s"))
    csh.join(broadcast(bsh), "s")
      .groupBy(col(id), col("eval_id"), col("eval_n_sh"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
      .select(col(id), col("eval_id"), col("eval_n_sh"), col("hits"),
        (col("hits").cast("double") / col("eval_n_sh").cast("double"))
          .as("eval_overlap"))
  }

  /** Deterministic EXACT-size stratified sample: the `n` rows of each
    * stratum with the smallest hash-uniform priority (ties to the
    * smaller id) — the fixed-budget complement of [[stratifiedSample]]'s
    * rate form ("exactly 10 000 docs per language", where the rate form
    * only hits a target in expectation). Same md5 uniform, so the
    * sample is partitioning/retry independent and each stratum's sample
    * is a strict prefix of any larger-n sample (monotone budgets).
    *
    * Scale shape: rides [[topKPerGroup]]'s bounded-heap aggregator —
    * at most n rows per stratum per map task cross the shuffle, never
    * the corpus, and no per-stratum single-reducer sort.
    *
    * Output: (stratum, rank, id, u), rank 1..n by (u, id). */
  def fixedSizeSample(df: DataFrame, id: String, stratum: String,
      n: Int): DataFrame =
    topKPerGroup(
        df.withColumn("__u", hashUniform(col(id))),
        stratum, id, -col("__u"), n)
      // recompute u positively (the heap's score is its negation, and
      // -(-0.0) would emit the 0.0-vs--0.0 bit difference cross-engine)
      .select(col(stratum), col("rank"), col(id),
        hashUniform(col(id)).as("u"))

  /** Growable primitive buffer for [[CeilQuantilesAggregator]]: `n`
    * live slots of `arr` (doubling growth) — 8 bytes per value, so the
    * `maxSlots` bound is a real memory ceiling (the VDEF
    * PctBuf discipline: a boxed Vector would make it toothless). */
  final case class QBuf(n: Int, arr: Array[Long])

  /** Exact discrete quantiles of an integral column as a BOUNDED typed
    * aggregate: rank CEIL(q·n), 1-based, over the ascending-sorted
    * values — the `row_number = CEIL(q*n)` window form computed with
    * map-side partial buffers instead of sorting every group through
    * one reducer. `maxSlots` is a loud structural ceiling per group
    * (the VDEF PERCENT contract): a corpus-sized group fails with a
    * message pointing at percentile_approx rather than OOMing an
    * executor. Values-only state — at 8 B/value the default ceiling is
    * ~128 MB per group, a declared limit, not a working size; the
    * documented 100 TB path for bigger groups is percentile_approx
    * (approximate by design, outside the exact cross-engine contract).
    */
  final class CeilQuantilesAggregator(qs: Array[Double], maxSlots: Int)
      extends Aggregator[Long, QBuf, Array[Long]] {
    require(maxSlots > 0, s"maxSlots must be positive (got $maxSlots)")
    private def grown(arr: Array[Long], need: Int): Array[Long] =
      if (need <= arr.length) arr
      else java.util.Arrays.copyOf(arr,
        math.max(need, math.max(8, arr.length * 2)))
    def zero: QBuf = QBuf(0, Array.emptyLongArray)
    def reduce(b: QBuf, in: Long): QBuf = {
      require(b.n < maxSlots,
        s"exact quantiles exceeded maxSlots=$maxSlots values in one " +
          "group — use percentile_approx for corpus-sized groups")
      val a = grown(b.arr, b.n + 1)
      a(b.n) = in
      QBuf(b.n + 1, a)
    }
    def merge(a: QBuf, b: QBuf): QBuf = {
      require(a.n.toLong + b.n <= maxSlots,
        s"exact quantiles exceeded maxSlots=$maxSlots values in one " +
          "group — use percentile_approx for corpus-sized groups")
      val m = grown(a.arr, a.n + b.n)
      System.arraycopy(b.arr, 0, m, a.n, b.n)
      QBuf(a.n + b.n, m)
    }
    def finish(b: QBuf): Array[Long] = {
      val arr = java.util.Arrays.copyOf(b.arr, b.n)
      java.util.Arrays.sort(arr)
      // CEIL(q·n) with the same IEEE double product both engines
      // compute, 1-based rank into the ascending order
      qs.map(q => arr((math.ceil(q * b.n) - 1).toInt max 0))
    }
    def bufferEncoder: Encoder[QBuf] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Per-group exact discrete quantiles (rank CEIL(q·n) of the sorted
    * values): (group, <one column per named quantile>). Equals the
    * `row_number() = CEIL(q*n)` window-rank form bit-for-bit on
    * integral values (spec-pinned) while aggregating map-side — the
    * shuffle carries one bounded buffer per (group, map task), and no
    * group ever funnels its full row set through a single sort task.
    * Memory per group is bounded by `maxSlots`, loudly. */
  def exactQuantilesPerGroup(df: DataFrame, group: String, value: Column,
      qs: Seq[(String, Double)],
      maxSlots: Int = 1 << 24): DataFrame =
    exactQuantilesPerGroups(df, Seq(group), value, qs, maxSlots)

  /** [[exactQuantilesPerGroup]] over a COMPOSITE key — the untyped
    * udaf binding makes this free (every group column keeps its
    * original type; the r11 review rework's payoff). */
  def exactQuantilesPerGroups(df: DataFrame, groups: Seq[String],
      value: Column, qs: Seq[(String, Double)],
      maxSlots: Int = 1 << 24): DataFrame = {
    require(groups.nonEmpty, "need at least one group column")
    require(qs.nonEmpty, "need at least one quantile")
    // q = 0 would index rank 0 (the window form yields null there) and
    // q > 1 would index past the group — both are caller errors, failed
    // loudly pre-flight rather than as an executor AIOOBE
    qs.foreach { case (nme, q) =>
      require(q > 0.0 && q <= 1.0, s"quantile $nme=$q outside (0, 1]")
    }
    // integral values only (the same loud contract as the sharded
    // cumsums): a silent cast("long") on doubles would truncate every
    // value and return wrong quantiles without an error.
    val vt = df.select(value.as("__v")).schema("__v").dataType
    require(isIntegral(vt),
      s"exact quantiles need an integral value column (got $vt) — " +
        "for doubles use percentile_approx (approximate by design)")
    // the aggregator has no null slot (the window-rank reference counts
    // nulls into n), and a null reaching the Long input encoder would
    // NPE opaquely deep in an executor — fail the loud-contract way
    // instead, per row, without a driver-side pre-scan
    val checked = when(value.isNull, raise_error(lit(
      "exact quantiles: null value (the window-rank reference counts " +
        "nulls into n; this aggregate has no null slot — filter or " +
        "coalesce first)"))).otherwise(value).cast("long")
    // the same typed Aggregator bound untyped via functions.udaf (NOT a
    // scalar udf — map-side partial buffers intact), so the group
    // column keeps its original type through a plain groupBy instead of
    // being flattened to string by a typed-key encoder
    val agg = new CeilQuantilesAggregator(qs.map(_._2).toArray, maxSlots)
    val qagg = udaf(agg, org.apache.spark.sql.Encoders.scalaLong)
    df.groupBy(groups.map(col): _*)
      .agg(qagg(checked).as("__qv"))
      .select(groups.map(col) ++ qs.zipWithIndex.map { case ((nme, _), i) =>
        element_at(col("__qv"), i + 1).as(nme)
      }: _*)
  }

  /** Growable primitive double buffer for
    * [[CeilQuantilesAggregatorD]] — the [[QBuf]] discipline at 8 B per
    * value (a boxed buffer would make the `maxSlots` ceiling
    * toothless). */
  final case class DQBuf(n: Int, arr: Array[Double])

  /** The [[CeilQuantilesAggregator]] contract on DOUBLE values: rank
    * CEIL(q·n), 1-based, over the ascending IEEE order (what both
    * engines' `ORDER BY` produces for non-NaN doubles). The integral
    * aggregate refuses doubles because a silent `cast("long")` would
    * truncate; this variant sorts the doubles themselves —
    * `java.util.Arrays.sort(double[])` IS ascending IEEE order once
    * NaN is excluded (refused loudly on entry: SQL sorts NaN last in
    * DuckDB but greatest-and-equal-to-itself in Spark — the one value
    * the two engines order differently) and −0.0 normalizes to 0.0
    * (SQL ordering treats them equal; the TopKAggregator rule). The
    * selected quantile is a VALUE of the input multiset — exact, never
    * interpolated — so downstream comparisons against it stay inside
    * the cross-engine hash contract. */
  final class CeilQuantilesAggregatorD(qs: Array[Double], maxSlots: Int)
      extends Aggregator[Double, DQBuf, Array[Double]] {
    require(maxSlots > 0, s"maxSlots must be positive (got $maxSlots)")
    private def grown(arr: Array[Double], need: Int): Array[Double] =
      if (need <= arr.length) arr
      else java.util.Arrays.copyOf(arr,
        math.max(need, math.max(8, arr.length * 2)))
    def zero: DQBuf = DQBuf(0, Array.emptyDoubleArray)
    def reduce(b: DQBuf, in: Double): DQBuf = {
      require(!in.isNaN,
        "exact quantiles: NaN value — Spark and DuckDB order NaN " +
          "differently (greatest vs last-with-nulls); filter NaNs first")
      require(b.n < maxSlots,
        s"exact quantiles exceeded maxSlots=$maxSlots values in one " +
          "group — use percentile_approx for corpus-sized groups")
      val a = grown(b.arr, b.n + 1)
      a(b.n) = if (in == 0.0) 0.0 else in // −0.0 → 0.0
      DQBuf(b.n + 1, a)
    }
    def merge(a: DQBuf, b: DQBuf): DQBuf = {
      require(a.n.toLong + b.n <= maxSlots,
        s"exact quantiles exceeded maxSlots=$maxSlots values in one " +
          "group — use percentile_approx for corpus-sized groups")
      val m = grown(a.arr, a.n + b.n)
      System.arraycopy(b.arr, 0, m, a.n, b.n)
      DQBuf(a.n + b.n, m)
    }
    def finish(b: DQBuf): Array[Double] = {
      val arr = java.util.Arrays.copyOf(b.arr, b.n)
      java.util.Arrays.sort(arr)
      qs.map(q => arr((math.ceil(q * b.n) - 1).toInt max 0))
    }
    def bufferEncoder: Encoder[DQBuf] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** [[exactQuantilesPerGroups]] for DOUBLE value columns (exact
    * discrete quantiles — the value at rank CEIL(q·n) of the ascending
    * IEEE order). Same bounded map-side shape, same loud `maxSlots`
    * ceiling; nulls and NaNs are refused loudly (see
    * [[CeilQuantilesAggregatorD]] for the NaN cross-engine rationale).
    */
  def exactQuantilesPerGroupsDouble(df: DataFrame, groups: Seq[String],
      value: Column, qs: Seq[(String, Double)],
      maxSlots: Int = 1 << 24): DataFrame = {
    require(groups.nonEmpty, "need at least one group column")
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (nme, q) =>
      require(q > 0.0 && q <= 1.0, s"quantile $nme=$q outside (0, 1]")
    }
    val checked = when(value.isNull, raise_error(lit(
      "exact quantiles: null value (the window-rank reference counts " +
        "nulls into n; this aggregate has no null slot — filter or " +
        "coalesce first)"))).otherwise(value).cast("double")
    val agg = new CeilQuantilesAggregatorD(qs.map(_._2).toArray, maxSlots)
    val qagg = udaf(agg, org.apache.spark.sql.Encoders.scalaDouble)
    df.groupBy(groups.map(col): _*)
      .agg(qagg(checked).as("__qv"))
      .select(groups.map(col) ++ qs.zipWithIndex.map { case ((nme, _), i) =>
        element_at(col("__qv"), i + 1).as(nme)
      }: _*)
  }

  /** Leakage-free train/validation split — the manifest step a dedup
    * pipeline must end with: if two near-duplicate documents land on
    * opposite sides of a train/val split, the validation half leaks
    * into training (the held-out loss is measured on memorized text).
    * The fix is to split by near-dup COMPONENT, atomically: every doc
    * joins its component from the dedup family's connected components
    * (`components(node, component)` — the q43 output), docs in no
    * component are their own singleton (component = own id), and the
    * side is decided by the md5-uniform of the COMPONENT key — so all
    * members of a component move together by construction, and the
    * assignment is engine-/partitioning-/retry-independent (the same
    * replayable-uniform argument as the sampling operators; a
    * `randomSplit` here would be neither replayable nor
    * component-atomic).
    *
    * Scale shape: the components frame is the (already audited) q43
    * output — corpus-keyed, so the join is ONE doc_id equi-join (or
    * exchange-free on the bucketed layout); the split itself is a
    * per-row md5 + compare, shuffle-free. Expected train mass ≈
    * `trainFrac` of components (not of docs — a giant dup cluster
    * moves as one unit; that asymmetry is the point).
    *
    * Contract: `components` carries AT MOST ONE row per node (the
    * connectedComponents shape) — a node listed twice would duplicate
    * its document through the join, so duplicates fail loudly here
    * rather than silently double-counting the manifest.
    *
    * Output: (id, component, u, split) with split ∈ {train, val}. */
  def leakageFreeSplit(df: DataFrame, id: String,
      components: DataFrame, node: String, component: String,
      trainFrac: Double): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1,
      s"trainFrac=$trainFrac must be in (0, 1)")
    val comp = components.select(col(node).cast("long").as("__node"),
        col(component).cast("long").as("__comp"))
      // loud one-row-per-node guard: window count beats a separate
      // corpus-pass assertion; raise_error fires only on the dup row
      .withColumn("__k", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__node")))
      .select(col("__node"),
        when(col("__k") > 1, raise_error(lit(
          "leakageFreeSplit: components frame has more than one row " +
            "for a node — dedup it to the connectedComponents shape " +
            "first"))).otherwise(col("__comp")).as("__comp"))
    df.select(col(id))
      .join(comp, col(id) === col("__node"), "left")
      .select(col(id),
        coalesce(col("__comp"), col(id).cast("long")).as("component"))
      .withColumn("u", hashUniform(col("component")))
      .withColumn("split",
        when(col("u") < trainFrac, lit("train")).otherwise(lit("val")))
  }

  /** Deterministic training-shard manifest — the write-the-training-set
    * step of a data pipeline: every row gets a shard
    * (`floor(u · S)` over the md5 uniform, clamped to S−1) and a dense
    * 1-based position within its shard by (u, id). Because u is the
    * same partitioning-/retry-/engine-independent uniform as the
    * sampling operators, the assignment is fully replayable by an
    * oracle and stable across reruns — where `randomSplit`/`sample`
    * are seed+partition dependent and cannot be. Reading shards in
    * position order IS a deterministic global shuffle of the corpus
    * (the "shuffle before training" step), and a shard is a strict
    * subset of the same rows at any S that divides consistently.
    *
    * Scale shape: one exchange on `shard`; the per-shard sequencing
    * window is bounded because S is sized ∝ corpus (rows/shard ≈
    * n/S — the caller's shard-size contract, the same law as every
    * sharded operator here; 100k-row shards at any corpus size).
    *
    * Output: (id, u, shard, pos). */
  def shardManifest(df: DataFrame, id: String, numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards >= 1, s"numShards=$numShards must be >= 1")
    // u < 1 by construction, so u·S < S and the least() is insurance
    // (the tokenBudgetCap shard-key note)
    val w = Window.partitionBy(col("shard")).orderBy(col("u"), col(id))
    df.select(col(id), hashUniform(col(id)).as("u"))
      .withColumn("shard",
        least(floor(col("u") * numShards), lit(numShards - 1L))
          .cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Padding-efficiency report — the batch-geometry check before
    * committing an inference/training batching scheme: every document
    * lands in the SMALLEST length bucket ≥ its token count (documents
    * past the largest bucket truncate to it), and each bucket reports
    * how much of its padded volume is real tokens,
    * efficiency = Σ min(n_tokens, bucket) / (n_docs · bucket).
    * Low efficiency = the bucket grid wastes compute on pad tokens;
    * comparing grids is how the bucket boundaries get chosen. All
    * integers + one IEEE divide per bucket row (hash-exact).
    *
    * Scale shape: a per-row bucket classification (codegen'd CASE —
    * no shuffle) + one #buckets-row aggregation.
    *
    * Output: (bucket, n_docs, real_tokens, padded_tokens, efficiency),
    * ordered by bucket. */
  def paddingEfficiency(df: DataFrame, id: String, nTokens: Column,
      buckets: Seq[Int]): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted &&
      buckets.distinct == buckets && buckets.head > 0,
      s"buckets must be positive, ascending, distinct (got $buckets)")
    val top = buckets.last
    val bucket = buckets.init.reverse.foldLeft(
      lit(top.toLong): Column) { (acc, b) =>
      when(nTokens <= b, lit(b.toLong)).otherwise(acc)
    }
    val real = least(nTokens.cast("long"), lit(top.toLong))
    df.select(col(id), bucket.as("bucket"), real.as("__real"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__real")).as("real_tokens"))
      .select(col("bucket"), col("n_docs"), col("real_tokens"),
        (col("n_docs") * col("bucket")).as("padded_tokens"),
        (col("real_tokens").cast("double") /
          (col("n_docs") * col("bucket")).cast("double"))
          .as("efficiency"))
  }

  /** Group-wise top-k rows: for each value of `group`, the k rows with
    * the largest `score` (ties to the smaller `id`), ranked 1..k.
    * Output: (group, rank, id, score) — the exploded, ranked form a
    * window `row_number() <= k` query would produce, computed with
    * bounded state instead of a full-corpus sort per group.
    *
    * Null scores are dropped (a row with no score is never "top" — and
    * under `row_number ... ORDER BY score DESC` both engines sort nulls
    * last, where k < group size never reaches them). `id` must be
    * integral: the Long encoder upcasts integral ids and refuses
    * non-numeric ones loudly at analysis time (same contract as the
    * dedup kernels).
    */
  def topKPerGroup(df: DataFrame, group: String, id: String,
      score: Column, k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0 (got $k)")
    val spark = df.sparkSession
    import spark.implicits._
    df.where(score.isNotNull)
      .select(col(group).cast("string"), col(id).cast("long"),
        score.cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(k).toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.zipWithIndex.map { case (r, i) => (g, (i + 1).toLong, r.id, r.score) }
      }
      .toDF(group, "rank", id, "score")
  }

  /** Deterministic weighted sampling WITHOUT replacement by integer
    * tickets: row i with weight w_i holds tickets t = 1..w_i, each
    * ticket draws the uniform md5(id ":" t), the row's key is its
    * MINIMUM ticket digest, and the k smallest keys corpus-wide win —
    * so a row's chance of holding the next global minimum is
    * proportional to its ticket count, giving weight-proportional
    * inclusion exactly the way priority/bottom-k weighted sampling
    * (Efraimidis–Spirakis A-Res) does, but with NO transcendental in
    * the key: `u^(1/w)` keys need ln/exp, whose last-ulp differences
    * across libms break cross-engine bit-exactness at selection
    * boundaries, while a lexicographic min over lowercase-hex digests
    * replays identically anywhere ([[hashUniform]]'s portability
    * discipline, applied to sampling DESIGN rather than just the
    * uniform).
    *
    * Scale shape: the per-row key is an `array_min` over a
    * `transform(sequence(1, w))` — per-row column work, O(w) digests,
    * NO explode and no shuffle; the global top-k compiles to
    * TakeOrderedAndProject (per-partition heaps). `maxWeight` bounds
    * the per-row work loudly: a row whose weight exceeds it (or is
    * < 1, which would make `sequence` count DOWN) fails the declared
    * way via a codegen'd `raise_error` branch, not a silent skew.
    *
    * Output: the k winners as (id, weight, ticket), `ticket` the
    * winning digest (ordering/audit handle), ties broken by id. */
  def weightedSample(df: DataFrame, id: String, weight: Column, k: Int,
      maxWeight: Int = 64): DataFrame = {
    require(k > 0, s"k=$k must be >= 1")
    require(maxWeight >= 1, s"maxWeight=$maxWeight must be >= 1")
    val w = guardedWeight(df, "weightedSample", id, weight, maxWeight)
    df.select(col(id), w.as("weight"))
      .withColumn("ticket", array_min(transform(
        sequence(lit(1), col("weight")),
        ticketDigest(col(id)))))
      .orderBy(col("ticket"), col(id))
      .limit(k)
  }

  /** Shared by both ticketed samplers: the per-ticket digest
    * md5("id:t") (lambda over the ticket index). */
  private def ticketDigest(id: Column): Column => Column =
    t => md5(concat(id.cast("string"), lit(":"), t.cast("string")))

  /** Shared loud weight guard for the ticketed samplers: the weight
    * must be INTEGRAL at analysis time (a fractional weight would
    * truncate in Spark's int cast but round in a CAST-replaying
    * oracle — silent cross-engine skew), and NULL / out-of-range
    * values fail per row via a codegen'd `raise_error` — a NULL
    * weight would yield a NULL ticket, which Spark's ascending sort
    * puts FIRST (a guaranteed seat) while the oracle's NULLS-LAST
    * default never selects: the one ordering the engines disagree
    * on. */
  private def guardedWeight(df: DataFrame, op: String, id: String,
      weight: Column, maxWeight: Int): Column = {
    val wt = df.select(weight.as("__w")).schema.head.dataType
    require(isIntegral(wt),
      s"$op needs an integral weight column (got $wt — a fractional " +
        "weight truncates in Spark but rounds in a CAST-replaying " +
        "oracle)")
    when(weight.isNull || weight < 1 || weight > maxWeight,
      raise_error(concat(
        lit(s"$op: weight outside [1, $maxWeight] at $id="),
        col(id).cast("string"))))
      .otherwise(weight).cast("int")
  }

  /** Per-group [[weightedSample]] — fixed-size weighted sampling
    * without replacement WITHIN each stratum (the per-language /
    * per-source epoch builder: [[fixedSizeSample]]'s uniform seats,
    * weighted): same integer-ticket min-digest key, but truncated to
    * the digest's first 13 hex nibbles = 52 bits so it rides the
    * bounded [[topKPerGroup]] aggregate EXACTLY through its double
    * score (52 bits < the 53-bit mantissa — no rounding, so the
    * (key ASC, id ASC) selection order survives the double round-trip
    * bit-for-bit and the oracle replays it on integers).
    *
    * Scale shape: per-row O(w) digests (no explode), then at most `k`
    * rows per (group, map task) cross the wire — never a per-group
    * window sort. Output: (group, rank 1..k, id, tkey). */
  def weightedSamplePerGroup(df: DataFrame, id: String, group: String,
      weight: Column, k: Int, maxWeight: Int = 64): DataFrame = {
    require(k > 0, s"k=$k must be >= 1")
    require(maxWeight >= 1, s"maxWeight=$maxWeight must be >= 1")
    val w = guardedWeight(df, "weightedSamplePerGroup", id, weight,
      maxWeight)
    val dig = ticketDigest(col(id))
    val key = array_min(transform(sequence(lit(1), w),
      t => conv(substring(dig(t), 1, 13), 16, 10).cast("long")))
    // smallest key wins = largest −key; −0.0 → 0.0 on the way back
    // (the clusterBalancedSample u=0 rule)
    topKPerGroup(df.withColumn("__tk", key), group, id,
        -col("__tk").cast("double"), k)
      .select(col(group), col("rank"), col(id),
        when(col("score") === 0.0, lit(0L))
          .otherwise(-col("score")).cast("long").as("tkey"))
  }

  /** Curation funnel report — the pipeline-observability table every
    * data run is reviewed with: how many documents (and tokens)
    * survive each successive curation stage. Stage predicates are
    * CUMULATIVE conjunctions in the given order (a doc counts at stage
    * i iff it passes stages 1..i); an implicit stage 0 ("raw") counts
    * everything. Predicates are plain Columns over the input frame —
    * stages that need non-per-row evidence (dedup keeper flags,
    * contamination hits) join their flag columns onto the frame FIRST
    * and the funnel stays one scan.
    *
    * Scale shape: ONE pass over the corpus into a single 1-row
    * aggregate (2·(stages+1) partial-agg'd sums — map-side combined,
    * no keyed exchange at all), exploded to stage rows driver-cheap;
    * the removed-docs lag windows over the ≤ stages+1 rows (bounded
    * single partition). Counts/sums integer-exact — enforced loudly:
    * the token column must be integral at analysis time (double sums
    * don't reassociate) and a NULL count raises (Spark's sum() would
    * silently SKIP the row where the oracle's SUM sees NULL — the
    * guardedWeight/nonNegGuard discipline, not a silent cross-engine
    * token skew).
    *
    * Output: (stage_idx, stage, n_docs, n_tokens, removed_docs). */
  def filterFunnel(df: DataFrame, tokens: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "filterFunnel needs at least one stage")
    val tt = df.select(tokens.as("__t")).schema("__t").dataType
    require(isIntegral(tt),
      s"filterFunnel: token column must be integral (got " +
        s"${tt.simpleString}) — double cumulative sums don't " +
        "reassociate across engines")
    val toks = when(tokens.isNull, raise_error(lit(
      "filterFunnel: NULL token count (sum() would silently skip the " +
        "row and diverge from the oracle) — coalesce or filter first")))
      .otherwise(tokens)
    val cum = stages.scanLeft(lit(true): Column) {
      case (acc, (_, p)) => acc && p
    }
    // coalesce: over an EMPTY frame sum() is NULL, but the contract
    // (and the COUNT(*)-based oracle) promises integer zeros
    val aggs = cum.zipWithIndex.flatMap { case (c, i) =>
      Seq(coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
          .as(s"__n$i"),
        coalesce(sum(when(c, toks).otherwise(0L)), lit(0L))
          .as(s"__t$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val names = "raw" +: stages.map(_._1)
    val stageStructs = names.zipWithIndex.map { case (nm, i) =>
      struct(lit(i.toLong).as("stage_idx"), lit(nm).as("stage"),
        col(s"__n$i").as("n_docs"), col(s"__t$i").as("n_tokens"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("stage_idx"))
    row.select(explode(array(stageStructs: _*)).as("__s"))
      .select(col("__s.*"))
      .withColumn("removed_docs",
        coalesce(lag(col("n_docs"), 1).over(w) - col("n_docs"),
          lit(0L)))
  }
}
