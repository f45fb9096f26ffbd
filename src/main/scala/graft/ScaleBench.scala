package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale validation: replicate the sf0.1 tables K× with
  * DISJOINT key ranges, then time a representative query subset at 1×
  * and K× in the same JVM and report the wall-time ratios.
  *
  * The replicas are shaped like a real scale-up, not a naive copy:
  *
  *   - `events`: user_id ranges shift per replica — K× more SERIES at
  *     the same per-series density (the 100 TB shape: more keys, not
  *     denser keys). Window/agg partition counts grow K×.
  *   - `documents`: doc_id shifts AND every word gains a per-replica
  *     prefix, so within-replica shingle/Jaccard structure is preserved
  *     exactly while cross-replica shingle overlap is zero. A naive K×
  *     copy would put K exact copies of every doc in the same LSH
  *     bucket and measure an O(K²) candidate artifact instead of the
  *     engine.
  *   - `embeddings`: vec_id shifts and each replica's vectors pass
  *     through a fixed per-replica sign flip of dimensions — an
  *     ORTHOGONAL transform, so all intra-replica angles (and thus the
  *     top-k structure the ANN operators chase) are untouched while
  *     replicas do not collapse onto the same LSH/IVF cells. Replica 0
  *     is the identity.
  *   - `lineitem`: l_orderkey shifts; the q01 scan/agg grows K×.
  *
  * A ratio near K is linear scaling (scan/agg/window operators); the
  * candidates-only dedup/ANN operators should stay well UNDER K² —
  * their candidate sets grow with real duplicate mass, not corpus².
  * Output: one JSON line, consumed into SCALE.md.
  */
object ScaleBench {

  /** One query per scaling-relevant family (store-building queries are
    * excluded: their /tmp marker caches are keyed by directory and
    * would measure a one-time build, not the operator). */
  val Selected: Seq[String] = Seq(
    "q01_tpch_q1",         // columnar scan + hash agg
    "q02_cf_consolidate",  // window functions per series
    "q16_pdp_normalize",   // rate chain + bounded explode + hash agg
    "q53_update_parse",    // distributed update-string parse
    "q21_text_quality",    // pure column expressions
    "q25_dedup_exact",     // hash groupBy dedup
    "q27_minhash_lsh",     // signature + band join
    "q28_simhash",         // mapPartitions kernel + band join
    "q43_neardup_groups",  // iterative connected components
    "q46_incremental_lsh", // batch-vs-index join
    "q29_ann_bruteforce",  // broadcast queries + top-k
    "q81_sq8_quantize",    // 1-row reduction + shuffle-free code map
    "q85_ann_sq8",         // byte-code corpus scan + exact re-rank
    "q88_ann_pq",          // PQ encode+ADC scan + exact re-rank
    "q44_ann_ivf",         // centroid probe + cell join
    "q45_embed_neardup",   // bucket + bit-flip probe pairs, FIXED planes
    "q62_decontaminate",   // broadcast eval-shingle probe + bounded agg
    "q80_bloom_decontaminate", // 128 KB bloom bitmask probe, same scan
    "q64_topk_quality",    // bounded-heap top-k: shuffle stays k·groups
    "q86_temperature_mix", // tiny count agg + codegen'd uniform filter
    "q89_token_budget",    // sharded two-level cumsum + early-exit prune
    "q90_trigram_lm",      // (lang,trigram) exchange + capped bcast model
    "q91_length_quantiles", // bounded typed quantile aggregate
    "q92_keyword_search",  // per-row filter + TakeOrderedAndProject
    "q93_token_chunks",    // map-side window explode, no shuffle
    "q94_shingle_containment", // q26-shaped candidate verify
    "q96_fixed_sample",    // bounded-heap exact-n per stratum
    "q99_semantic_dedup",  // k-means cells + within-cell pair verify
    "q103_incr_semdedup",  // batch-vs-index cell cogroup (q46 axis)
    "q105_prototype_scores", // two-level order-pinned mean + cos scan
    "q106_shard_manifest", // md5 shard assign + in-shard positions
    "q107_dup_span_removal", // gram hits + hit-mass explode + HOF rebuild
    "q108_bpe_pairs",      // corpus→vocab agg, pair mining on vocab only
    "q115_bpe_merges",     // 3 chained merges, each iteration vocab-sized
    "q109_robust_anomaly", // bounded median/MAD aggregates + AQE joins
    "q100_seasonal_anomaly", // integer-exact profile + broadcast join
    "q97_bm25",            // 1-row reduction + scoring projection + top-k
    "q98_decontaminate_attrib", // broadcast probe + (doc,eval) agg
    "q66_ann_ivf_trained", // k-means sample collect + broadcast centroids
    "q111_crosslingual_dups", // q99 mine + two dimension joins (fixed c)
    "q112_dedup_savings",  // inline LSH+CC mine + integer report aggs
    "q113_training_manifest", // quality gate → sharded budget → packing
    "q114_semdedup_distributed", // distributed quantizer: no c-collect
    // (q116's oracle-form query runs as the Extra row q116_oracle_form:
    // its `vec_id < thr` slice pins the whole index to replica 0 at K×,
    // so the honest slope row is q116_incr_scale — the rename keeps a
    // reader from mistaking the degenerate row for the operator.)
    "q117_kmeans_distributed", // distributed Lloyd: frame-only training
    "q118_quality_buckets", // LM chain + bounded double-quantile thresholds
    "q122_embed_standardize", // two-level moment folds + broadcast stats map
    "q123_oov_rate",       // one word-count exchange + broadcast-set probe
    "q124_tfidf_terms",    // distinct-pair DF agg + vocab join + doc window
    "q125_exact_ledger",   // digest-index probe + batch min (q46 exact axis)
    "q126_hashing_vectorize", // one shuffle-free typed map, per-row assembly
    "q127_hashed_semantic_dedup", // text→features→q114 chain composition
    "q128_corpus_health",  // q118 buckets + token rollup (integer report)
    "q129_triplet_mine",   // one broadcast scan scores both triplet sides
    "q130_padding_efficiency", // codegen'd CASE + #buckets-row agg
    "q131_boilerplate_chunks", // chunk-hash DF agg + keyed join + doc rebuild
    "q132_weighted_sample", // per-row min-ticket digest + TakeOrdered heap
    "q133_selfdedup_chunks", // per-row linear hash-set kernel, no shuffle
    "q134_knn_graph",      // q114 assignment + per-cell pair kernel, k-heaps
    "q135_cluster_terms",  // vectorize+assign + (cell, term) agg + cell window
    "q136_weighted_stratified", // per-row O(w) digests + bounded top-k agg
    "q137_vocab_spectrum", // one word-count exchange + 100-row head window
    "q138_mutual_knn",     // q134 mine + bounded edge-frame self-join
    "q139_label_audit",    // q134 mine + scalar label joins + vote argmax
    "q140_density_outliers", // q134 mine + per-node rank-ordered fold
    "q141_incr_boilerplate", // batch chunk exchange + index equi-join
    "q142_filter_funnel",  // flag joins + ONE scan into a 1-row agg
    "q143_decontaminate_spans", // gram kernel both sides + bench probe join
    "q144_source_overlap", // distinct (chunk, source) + bounded self-join
    "q145_concat_blocks",  // two-level GLOBAL prefix sum + span explode
    "q146_idf_vectors",    // one df exchange + bounded vocab + typed map
    "q147_idf_semantic_dedup", // weighted text→features→q114 composition
    "q148_cluster_purity", // assignment + (cell,label) agg + tiny argmax
    "q149_boilerplate_by_source", // q131 relation + source rollup
    "q150_density_by_label", // q134 mine + label join + decimal rollup
    "q157_mixing_manifest", // per-row CASE + bounded explode, no shuffle
    "q155_winnow_fingerprints", // per-row gram/window HOFs + one explode
    "q156_winnow_pairs",   // fp exchange + df-capped self-join
    "q151_random_projection", // shuffle-free typed JL kernel
    "q152_collocations",   // two vocab exchanges + bounded top-k head
    "q158_skipgram_pmi",   // window-bounded pair explode + q152 shape
    "q153_canonical_quality", // digest exchange + bounded k=1 aggregate
    "q154_novelty_score",  // chunk-hash countDistinct + same-key join
    "q159_vocab_growth",   // word min-doc exchange + bounded k-explode
    "q160_cdc_dedup",      // CDC kernel + chunk-hash DF agg + join back
    // (q161's oracle form splits at an ABSOLUTE doc_id threshold —
    // degenerate on K× replicas like q46/q116's oracle forms; the
    // honest slope row is the Extra q161_incr_scale below)
    "q119_diverse_sample", // distributed-quantizer cells + bounded top-k
    "q120_hard_negatives", // fixed anchor batch (replica 0) vs K× corpus
    "q121_leakage_split",  // q43 components + component-keyed md5 split
    "q69_video_frames",    // per-row container decode, no shuffle
    "q70_canonical_select", // CC + quality argmax window per component
    "q71_pii_scrub",       // per-row regex detect/redact, no shuffle
    "q75_repetition",      // typed repetition kernel, no shuffle
    "q77_image_neardup",   // decode + aHash kernel + hash groupBy
    "q78_token_packing",   // per-lang window cumsum packing
    "q79_image_neardup_pairs") // banded Hamming join + kernel verify

  /** Variants that exist only for the scale comparison (not oracle
    * queries): q45 with corpus-sized hyperplane count — the fix for the
    * superlinear within-bucket pair growth the fixed-planes form shows
    * at 10× (17.6× wall; see SCALE.md). */
  val Extra: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q45_auto_planes" -> ((s: SparkSession, dir: String) =>
      ext.Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", 64, tau = 0.40)),
    // The quantizer-law row behind the q114 decade claims: cells from
    // the SAME hash seeding + probed assignment as q114, reduced to
    // (n, cells, Σ|cell|²) — the within-cell pair work. The c ∝ n
    // linearity story holds iff Σ|cell|²/n (pairs_per_vec) stays flat
    // as the corpus decades: a super-linear drift here would mean the
    // mine's cell cogroup is quietly quadratic even if one wall-clock
    // row looks fine.
    // q161 with the split WITHIN each replica (doc_ids shift by
    // 1e8/replica — the oracle's absolute threshold would put most of
    // replica 0 alone in the index at K×, the q46/q116 degeneracy):
    // index and batch scale together, the shape a production CDC
    // ingest gate grows on.
    "q161_incr_scale" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val rep = col("doc_id") % 100000000L
      val thr = docs.where(col("doc_id") < 100000000L).count() * 4 / 5
      val idx = ext.Dedup.cdcChunkIndex(docs.where(rep < thr),
        "doc_id", "text", window = 4, divisor = 16)
      ext.Dedup.incrementalCdcDedup(docs.where(rep >= thr), idx,
        "doc_id", "text", window = 4, divisor = 16)
    }),
    "q114_occupancy_law" -> ((s: SparkSession, dir: String) => {
      val e = Tables.embeddings(s, dir)
      val cent = ext.Similarity.seededCentroids(e, "vec_id",
        "embedding", 64, rate = 1.0 / 64)
      ext.Similarity.ivfIndexDistributed(e, cent, "vec_id",
          "embedding", 64, probes = 2)
        .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
        .agg(sum(col("sz")).as("n"), count(lit(1)).as("cells"),
          sum(col("sz") * col("sz")).as("sum_sq"))
        .select(col("n"), col("cells"), col("sum_sq"),
          (col("sum_sq").cast("double") / col("n").cast("double"))
            .as("pairs_per_vec"))
    }),
    // q28's 16-bit signature has only 2^4 keys per band: past ~100 k
    // docs every band bucket exceeds the cap and is DISCARDED — the
    // timing then measures cap-discard, not mining (and recall
    // collapses). 64-bit signatures (16-bit bands) are the documented
    // corpus-scale shape: 65 536 keys per band keeps occupancy low.
    "q28_simhash64" -> ((s: SparkSession, dir: String) => {
      val d = ext.Dedup.simhashSignatures(
        Tables.documents(s, dir), "doc_id", "text", 64)
      ext.Dedup.simhashCandidates(d, "doc_id", "sig", bits = 64, bands = 4)
        .where(col("hamming") <= 3)
    }),
    // q46's oracle form splits index/batch at `doc_id < count*4/5` —
    // correct on any single-SF dir (ids are dense from 0), DEGENERATE on
    // K× replicas (ids shift by 1e8 per replica, so the value threshold
    // puts replica 0 alone in the index and 99% of the corpus in the
    // "batch": the measurement collapses to a near-full new×new mine —
    // the round-5/6 superlinear-looking q46 rows). This variant splits
    // 80/20 WITHIN each replica (the q72_stream_scale idiom), so K×
    // scales index and batch together — the axis an incremental
    // pipeline actually grows on.
    // q79's 64-bit aHash gives banded joins only 16-bit band keys —
    // past ~10^5 images the buckets saturate and candidate volume goes
    // superlinear (×562 candidates for ×100 corpus, profiled round 10;
    // the q28-simhash16 failure class). The corpus-scale shape is a
    // 256-bit hash (16×16 grid → 64-bit bands); this variant plants
    // 16×16 images so the wider grid carries real signal and measures
    // the operator at the key width a 100 TB image lake needs.
    "q79_ahash256" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.{Encoders, Row}
      val docs = Tables.documents(s, dir)
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
          val c = (id % 256).toInt
          val px = Array.tabulate(256) { k =>
            val base = ((seed / (1L << (8 * (k % 7)))) % 256 + 23L * k) % 256
            (if (variant && k == c) (base + 128) % 256 else base).toByte
          }
          Row(id, ext.Multimodal.ImageCodec.encodeGrayPng(16, 16, px))
        }
      }(Encoders.row(paySchema))
      val media = ext.Multimodal.asMedia(pngs, "doc_id", "payload",
        "image/png")
      val hashes = ext.Multimodal.imageAHash(media, "doc_id", grid = 16)
      ext.Multimodal.aHashNearDupPairs(hashes, "doc_id", "ahash",
        bands = 4, maxHamming = 3, hashBits = 256)
    }),
    // q100 with the replica-aware series slice (the q72 lesson: the
    // oracle's `user_id < 40` pins to replica 0; the modulo slice
    // carries 40 series PER replica, so the profile grows ×K)
    "q100_scale" -> ((s: SparkSession, dir: String) =>
      graft.hw.SeasonalProfile.anomalies(
        Tables.events(s, dir).where(col("user_id") % 1000000L < 40),
        Seq("user_id"), "ts_sec", bucketSec = 3600L, period = 24,
        k = 2.0)),
    // q109 on the replica-aware slice (40 series per replica): the
    // bounded quantile state is span/period values per (series, pos)
    // — constant per group while groups scale ×K
    "q109_robust_scale" -> ((s: SparkSession, dir: String) =>
      graft.hw.SeasonalProfile.robustAnomalies(
        Tables.events(s, dir).where(col("user_id") % 1000000L < 40),
        Seq("user_id"), "ts_sec", bucketSec = 3600L, period = 24,
        k = 3.0)),
    // gap-filled q102 on the same replica-aware slice: the dense
    // output is #series × span-buckets BY DESIGN, so K× series means
    // K× grid rows over the replica-constant time window — the axis a
    // growing fleet actually scales on
    "q102_gapfill_scale" -> ((s: SparkSession, dir: String) =>
      graft.hw.SeasonalProfile.anomaliesGapFilled(
        Tables.events(s, dir).where(col("user_id") % 1000000L < 40),
        Seq("user_id"), "ts_sec", bucketSec = 3600L, period = 24,
        k = 2.0)),
    // q99 with cell count grown ∝ corpus (the q45 auto-planes law):
    // the oracle's fixed c=16 keeps per-cell occupancy flat only at one
    // SF — at 100× every 12.5k-member cell exceeds the 10k mega-cell
    // cap and the measurement would time cap-discard, not dedup. Here
    // c ≈ n/64 (seeded centroids, iters=0 — the standard IVF quantizer
    // at index-build scale; driver Lloyd over c ∝ n samples would be
    // the bottleneck) so Σ|cell|² stays ≈ n·64 — linear pair work.
    "q99_auto_cells" -> ((s: SparkSession, dir: String) =>
      // the operator's DEFAULT auto-sized-quantizer entry point
      ext.Similarity.semanticNearDupPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", 64, tau = 0.40)),
    // auto cells with the PROBED two-level assignment (O(n·√c) cosines
    // vs the exact path's O(n·c) — ProfileQ99 measured assignment as
    // the dominant auto-cells slope); boundary recall vs the exact
    // assignment is ProfileQ99's printed number
    "q99_probed_cells" -> ((s: SparkSession, dir: String) => {
      val e = Tables.embeddings(s, dir)
      val c = math.max(16L, e.count() / 64L).toInt
      val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
        64, c = c, iters = 0, sampleRate = 0.2)
      ext.Similarity.semanticNearDupPairsProbed(e, cent, "vec_id",
        "embedding", 64, tau = 0.40)
    }),
    // The round-13 SWAPPED DEFAULT: the auto-cells overload past its
    // broadcast limit routes through the distributed family (hash
    // seeding + bucket-cogroup assignment, the q114 chain) — here the
    // limit is forced low so the row measures the routed path at the
    // standard occupancy; it should sit in the q114 band, not the
    // q99_auto_cells (driver-sample) one.
    "q99_routed_default" -> ((s: SparkSession, dir: String) =>
      ext.Similarity.semanticNearDupPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", 64, tau = 0.40, maxCell = 10000,
        targetOccupancy = 64, broadcastCellLimit = 1)),
    // q103 with (a) the split WITHIN each replica (embeddings vec_ids
    // shift by 1e7/replica, so the oracle's value threshold would put
    // replica 0 alone in the index — the q46_incr_scale degeneracy)
    // and (b) auto-sized cells (the fixed-c cap-discard trap): K×
    // scales index and batch together, the incremental axis a
    // production pipeline grows on.
    "q103_incr_scale" -> ((s: SparkSession, dir: String) => {
      val e = Tables.embeddings(s, dir)
      val rep = col("vec_id") % 10000000L
      val thr = e.where(col("vec_id") < 10000000L).count() * 4 / 5
      val c = math.max(16L, e.count() / 64L).toInt
      val cent = ext.Similarity.kmeansCentroids(e, "vec_id", "embedding",
        64, c = c, iters = 0, sampleRate = 0.2)
      val index = ext.Similarity.ivfIndex(e.where(rep < thr), cent,
        "vec_id", "embedding", 64).where(col("norm") > 0)
      ext.Similarity.incrementalSemanticNearDupPairs(e.where(rep >= thr),
        index, cent, "vec_id", "embedding", 64, tau = 0.40)
    }),
    // q116 with the split WITHIN each replica (the q103_incr_scale /
    // q46_incr_scale degeneracy fix: the oracle's value threshold puts
    // replica 0 alone in the index at K×) — the distributed-quantizer
    // incremental axis at the shape a production pipeline grows on:
    // index and batch scale together, centroids stay a frame, c ∝ n by
    // seeding construction, nothing driver-side grows.
    "q116_incr_scale" -> ((s: SparkSession, dir: String) => {
      val e = Tables.embeddings(s, dir)
      val rep = col("vec_id") % 10000000L
      val thr = e.where(col("vec_id") < 10000000L).count() * 4 / 5
      val corpus = e.where(rep < thr)
      val cent = ext.Similarity.seededCentroids(corpus, "vec_id",
        "embedding", 64, rate = 1.0 / 64)
      val index = ext.Similarity.ivfIndexDistributed(corpus, cent,
          "vec_id", "embedding", 64, probes = 2)
        .where(col("norm") > 0)
      ext.Similarity.incrementalSemanticNearDupPairsDistributed(
        e.where(rep >= thr), index, cent, "vec_id", "embedding", 64,
        tau = 0.40, maxCell = 10000, probes = 2)
    }),
    // q98 with the eval set PINNED to replica 0: the oracle form scales
    // the eval slice with the corpus (x100 eval docs -> x100 broadcast
    // shingles), but a production benchmark suite is fixed-size — this
    // variant scales only the corpus axis, the one a 100 TB run grows.
    "q98_fixed_eval" -> ((s: SparkSession, dir: String) => {
      val d = Tables.documents(s, dir)
      ext.Curation.decontaminateAttribution(
        d.where(col("doc_id") % 20 =!= 0),
        d.where(col("doc_id") < 100000000L && col("doc_id") % 20 === 0),
        "doc_id", "text", k = 3, minHits = 2)
    }),
    // round-10 sharding references: the SAME computations as
    // q89/q78/q91 but through the per-group single-reducer forms they
    // replaced — the pair of rows quantifies what two-level prefix
    // sums / the bounded aggregate buy at the 100× replica.
    "q89_unsharded" -> ((s: SparkSession, dir: String) => {
      val tokens = ext.TextAnalysis.tokenExprs(col("text"))("ws_tokens")
      ext.Curation.tokenBudgetCap(Tables.documents(s, dir), "doc_id",
        "lang", tokens, budget = 4000L, shards = 1)
    }),
    "q78_unsharded" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val tokens = ext.TextAnalysis.tokenExprs(col("text"))("ws_tokens")
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), tokens.as("n_tokens"))
        .withColumn("__cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id", expr("greatest(__cum - 1, 0L) div 2000"))
        .drop("__cum")
    }),
    "q91_window_rank" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      val ranked = d.select(col("lang"), col("n_chars"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("lang"))))
      val qs = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
      val aggs = qs.map { case (nme, q) =>
        max(when(col("rn") === ceil(lit(q) * col("n")), col("n_chars")))
          .as(nme)
      }
      ranked.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
    }),
    // The layout lever, measured: the SAME aggregation+join body over
    // the SAME parquet bytes, once through the bucket-spec'd catalog
    // tables (zero exchanges — the q104 plan pin) and once through a
    // plain parquet read of the identical files (bucket metadata
    // dropped → both the agg and the join shuffle). The pair's wall
    // delta is what bucketBy buys at each replica size. Build cost is
    // excluded from both rows (ensureBucketed is fingerprint-cached;
    // the bucketed row warms it first).
    "q104_bucketed_scale" -> ((s: SparkSession, dir: String) =>
      SparkEntry.queries("q104_bucketed_agg")(s, dir)),
    "q104_unbucketed" -> ((s: SparkSession, dir: String) => {
      val (qual, _, chks) = SparkEntry.ensureBucketed(s, dir)
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def plain(t: String) = s.read.parquet(s"$wh/${t.toLowerCase}")
      plain(chks).groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("chunk_tokens"))
        .join(plain(qual), "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chunks"),
          col("chunk_tokens"))
        .orderBy("doc_id")
    }),
    // q106 with the shard count grown ∝ corpus (the oracle's fixed
    // S=16 funnels n/16 rows per sequencing reducer — fine for 16
    // output files, wrong as the corpus-scale shape; production sizes
    // S for ~fixed shard files, keeping the per-shard window bounded)
    "q106_shard_scale" -> ((s: SparkSession, dir: String) => {
      val d = Tables.documents(s, dir)
      val shards = math.max(16L, d.count() / 5000L).toInt
      ext.Curation.shardManifest(d, "doc_id", shards)
    }),
    "q46_incr_scale" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val rep = col("doc_id") % 100000000L
      // per-replica ids are dense from 0, so replica-0's count is every
      // replica's count (and on an unscaled dir this IS the q46 split)
      val thr = docs.where(col("doc_id") < 100000000L).count() * 4 / 5
      val index = ext.Dedup.lshIndex(
        docs.where(rep < thr), "doc_id", "text")
      ext.Dedup.incrementalLshCandidates(
          docs.where(rep >= thr), index, "doc_id", "text")
        .where(col("sig_agreement") >= 0.25)
    }),
    // q111 with the auto-sized quantizer (the q99_auto_cells law): the
    // oracle form pins c=16 for the SQL replay, which past ~100k docs
    // measures mega-cell cap-discard, not multilingual dedup; here
    // c ≈ n/64 keeps within-cell pair work linear so the composition's
    // scale story matches the q99 family's.
    "q111_auto_cells" -> ((s: SparkSession, dir: String) =>
      SparkEntry.crossLingualFrom(s, dir,
        ext.Similarity.semanticNearDupPairs(Tables.embeddings(s, dir),
          "vec_id", "embedding", 64, tau = 0.40))),
    // q112 the way production runs it: the report consumes PERSISTED
    // q43 components (built once per scale dir on the cold pass —
    // fingerprint-markered like ensureScaled; the reported warm pass
    // times the report alone). The pair with the oracle q112 row
    // separates report cost (∝ components) from mine cost (∝ corpus).
    "q112_persisted" -> ((s: SparkSession, dir: String) => {
      val out = java.nio.file.Paths.get("/tmp/graft_scale",
        s"q112_comp_${new java.io.File(dir).getName}")
      val marker = out.resolve("_built")
      val stamp = sourceFingerprint(dir)
      val fresh = java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker),
          "UTF-8") == stamp
      if (!fresh) {
        store.RrdStore.deleteTree(out.toString)
        java.nio.file.Files.createDirectories(out)
        val cand = ext.Dedup.lshCandidates(Tables.documents(s, dir),
            "doc_id", "text", 3, 16, 4)
          .where(col("sig_agreement") >= 0.25)
        ext.Dedup.connectedComponents(cand, "id1", "id2")
          .select(col("node").as("doc_id"), col("component"))
          .write.mode("overwrite").parquet(s"$out/comp.parquet")
        java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
      }
      SparkEntry.dedupSavingsFrom(s, dir,
        s.read.parquet(s"$out/comp.parquet"))
    }),
    // q121 over PERSISTED components (the q112_persisted idiom, same
    // cached component store): the production split is a report over
    // the dedup run's output, not an inline re-mine — the warm pass
    // times the doc_id join + per-row md5/compare alone.
    "q121_persisted" -> ((s: SparkSession, dir: String) => {
      val out = java.nio.file.Paths.get("/tmp/graft_scale",
        s"q112_comp_${new java.io.File(dir).getName}")
      val marker = out.resolve("_built")
      val stamp = sourceFingerprint(dir)
      val fresh = java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker),
          "UTF-8") == stamp
      if (!fresh) {
        store.RrdStore.deleteTree(out.toString)
        java.nio.file.Files.createDirectories(out)
        val cand = ext.Dedup.lshCandidates(Tables.documents(s, dir),
            "doc_id", "text", 3, 16, 4)
          .where(col("sig_agreement") >= 0.25)
        ext.Dedup.connectedComponents(cand, "id1", "id2")
          .select(col("node").as("doc_id"), col("component"))
          .write.mode("overwrite").parquet(s"$out/comp.parquet")
        java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
      }
      ext.Curation.leakageFreeSplit(Tables.documents(s, dir), "doc_id",
        s.read.parquet(s"$out/comp.parquet"), "doc_id", "component",
        trainFrac = 0.8)
    }),
    // q141 over a PERSISTED chunk-df index, BUCKETED on the probe key
    // (round 13 — the r12 audit's one scale finding): the production
    // ingest gate reads the bucket-sorted index table, so the probe
    // join plans with ZERO exchange on the corpus-sized index side
    // (plan-pinned in ExactLedgerSpec) and only the batch shuffles —
    // the unmanaged-frame form broadcast while small and re-shuffled
    // the whole index per batch past the threshold. The oracle-form
    // row rebuilds the corpus index in-query by design.
    // The split is WITHIN each replica (doc_ids shift 1e8/replica —
    // the q116_incr_scale degeneracy fix; an absolute id threshold
    // would put 80% of replica 0 alone in the index and mine 99% of
    // the corpus as "batch", i.e. measure a full re-mine): index and
    // batch scale together, the shape a production pipeline grows on.
    "q141_persisted" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val rep = col("doc_id") % 100000000L
      val thr = docs.where(col("doc_id") < 100000000L).count() * 4 / 5
      val tbl = ensureIndexTable(s, dir, "q141idx", "__h",
        "__h BIGINT, df BIGINT")(
        ext.Dedup.boilerplateChunkIndex(
          docs.where(rep < thr), "doc_id", "text", 4))
      ext.Dedup.incrementalBoilerplateRemoval(
        docs.where(rep >= thr), s.table(tbl), "doc_id",
        "text", size = 4, minDocs = 2)
    }),
    // q116's oracle form under its honest name: the `vec_id < thr`
    // index slice degenerates to replica 0 at K× (documented since
    // r12) — q116_incr_scale is the operator's real slope row.
    "q116_oracle_form" -> ((s: SparkSession, dir: String) =>
      SparkEntry.queries("q116_incr_semdedup_distributed")(s, dir)),
    // q128 the way production runs it: the LM scores/buckets are
    // PERSISTED per-doc columns (scored once at ingest — the
    // q112_persisted split); the timed work is the join + the
    // (lang, bucket)-sized rollup alone, not the two scoring passes
    // the oracle form re-pays so DuckDB can replay the chain.
    "q128_persisted" -> ((s: SparkSession, dir: String) => {
      val out = java.nio.file.Paths.get("/tmp/graft_scale",
        s"q128_buckets_${new java.io.File(dir).getName}")
      val marker = out.resolve("_built")
      val stamp = sourceFingerprint(dir)
      val fresh = java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker),
          "UTF-8") == stamp
      if (!fresh) {
        store.RrdStore.deleteTree(out.toString)
        java.nio.file.Files.createDirectories(out)
        ext.TextAnalysis.lmQualityBuckets(Tables.documents(s, dir),
            "doc_id", "lang", "text")
          .write.mode("overwrite").parquet(s"$out/buckets.parquet")
        java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
      }
      val buckets = s.read.parquet(s"$out/buckets.parquet")
      val toks = Tables.documents(s, dir).select(col("doc_id"),
        ext.TextAnalysis.tokenExprs(col("text"))("ws_tokens")
          .as("n_tokens"))
      buckets.join(toks, "doc_id")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
    }),
    // q125 over a PERSISTED digest index, same bucketed discipline:
    // the exact-dedup ingest gate the ledger exists for — warm passes
    // time the batch probe alone against the bucket-sorted index.
    // Within-replica split (see q141_persisted) and the PRODUCTION
    // digest — the full md5, one index row per distinct text, so the
    // index genuinely scales with the corpus (the oracle form's 2-hex
    // prefix exists only to exercise all three verdicts on tiny data
    // and would pin the index at 256 rows forever).
    "q125_persisted" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val rep = col("doc_id") % 100000000L
      val thr = docs.where(col("doc_id") < 100000000L).count() * 4 / 5
      val dg = ext.TextAnalysis.fingerprint(col("text"))
      val tbl = ensureIndexTable(s, dir, "q125idx", "digest",
        "digest STRING, canonical BIGINT")(
        ext.Dedup.digestIndex(docs.where(rep < thr), "doc_id", dg))
      ext.Dedup.exactDedupLedger(docs.where(rep >= thr),
        s.table(tbl), "doc_id", dg)
    }),
    )

  /** Bucketed persisted-index table for the incremental gates
    * (q125/q141 persisted rows): built ONCE per (dir, source
    * fingerprint) as a bucket-sorted table on the PROBE key — the
    * q101/q104 layout idiom — and re-registered from its files by a
    * fresh JVM (the ensureBucketed discipline, without the multi-table
    * lock dance: ScaleBench is single-JVM per invocation). */
  private def ensureIndexTable(s: SparkSession, dir: String,
      kind: String, key: String, schemaDdl: String)
      (build: => DataFrame): String = {
    val name = new java.io.File(dir).getName
      .replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val fp = java.util.UUID.nameUUIDFromBytes(
        sourceFingerprint(dir).getBytes("UTF-8"))
      .toString.replaceAll("-", "").take(8)
    val tbl = s"graft_${kind}_${name}_$fp"
    if (s.catalog.tableExists(tbl)) return tbl
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wh))
    // drop stale prior-fingerprint builds of THIS dir's table (exact
    // pattern — never a name prefix)
    val stalePat = s"graft_${kind}_${name}_[0-9a-f]{8}"
    Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches(stalePat) && f.getName != tbl)
      .foreach(f => store.RrdStore.deleteTree(f.getPath))
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(wh, tbl, "_SUCCESS")))
      sources.Bucketed.register(s, tbl, schemaDdl, key, 16, s"$wh/$tbl")
    else {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      store.RrdStore.deleteTree(s"$wh/$tbl")
      sources.Bucketed.writeBucketed(build, tbl, key, 16)
    }
    tbl
  }

  /** Streaming pair at scale: replica user ids shift by 1e6, so the
    * modulo slice carries 30 series PER REPLICA (K× keys through the
    * state store) where the oracle's `user_id < 30` would pin the
    * workload to replica 0. These return the run's state rows/bytes
    * alongside the frame — the number a 100 TB stateful job lives or
    * dies on. */
  val Streaming: Seq[(String, (SparkSession, String) =>
      (DataFrame, Option[graft.streaming.StreamRun.StateMetrics]))] = Seq(
    "q72_stream_scale" -> ((s: SparkSession, dir: String) =>
      SparkEntry.streamingCdpQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)),
    "q74_stream_scale" -> ((s: SparkSession, dir: String) =>
      SparkEntry.streamingGateQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)),
    // exactly-once dedup: state holds one row per distinct EVENT (not
    // per series) — the fastest-growing state family; rows ∝ events
    // ingested is the law to confirm
    "q87_stream_scale" -> ((s: SparkSession, dir: String) =>
      SparkEntry.streamingDedupQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)),
    // sessionization: state rows = OPEN sessions — with the whole
    // input in batch 1 that is every session of every sliced series
    // until the sentinel closes them, so the law to confirm is rows ∝
    // sessions (∝ series at fixed per-series density)
    "q95_stream_scale" -> ((s: SparkSession, dir: String) =>
      SparkEntry.streamingSessionizeQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)),
    // streaming seasonal counts: state rows = OPEN tumbling windows ×
    // series (with the whole input in batch 1, every occupied
    // (series, hour) window stays open until the sentinel) — the law
    // to confirm is rows ∝ observed buckets
    "q110_stream_scale" -> ((s: SparkSession, dir: String) =>
      SparkEntry.streamingSeasonalQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)),
    // Same q72 body under the RocksDB state store — the provider a
    // 100 TB deployment runs once state exceeds executor heap (the
    // HDFSBacked map holds ~500 MB at the 100× replica). Same output;
    // memoryUsedBytes here reports RocksDB's tracked usage, so the
    // bytes column is provider-relative, not comparable across
    // providers row-to-row.
    // streaming CDC duplicate gate: state rows = distinct chunk hashes
    // seen (the ingest-time form of the persisted cdcChunkIndex) — the
    // law to confirm is rows ∝ corpus chunks. Documents table, NOT
    // events: excluded from the events-only replica subset below.
    "q162_stream_scale" -> ((s: SparkSession, dir: String) => {
      val docs = Tables.documents(s, dir)
      val rep = col("doc_id") % 100000000L
      val thr = docs.where(col("doc_id") < 100000000L).count() * 4 / 5
      graft.streaming.StreamingCdcDedup.cdcBatchStats(s,
        docs.where(rep < thr), docs.where(rep >= thr),
        "doc_id", "text", window = 4, divisor = 16)
    }),
    "q72_stream_rocksdb" -> ((s: SparkSession, dir: String) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try SparkEntry.streamingCdpQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),
    // Sessionization under RocksDB — the same one-conf-line escape
    // hatch for the session_window state family, so the 100 TB state
    // story is uniform across all four streaming executions (state
    // rows must match the in-heap q95 row exactly; bytes are
    // provider-relative).
    "q95_stream_rocksdb" -> ((s: SparkSession, dir: String) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try SparkEntry.streamingSessionizeQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),
    // Streaming seasonal counts under RocksDB — completes the uniform
    // one-conf-line state-store story across all FIVE streaming
    // executions (state rows must match the in-heap q110 row exactly;
    // bytes are provider-relative).
    // Same q72 body under Trigger.AvailableNow with input AND sentinel
    // preloaded: one data batch + the trigger's no-data flush batch
    // instead of three per-append processAllAvailable cycles. Output is
    // spec-pinned identical; the wall delta vs q72_stream_scale at the
    // same factor is pure micro-batch trigger/commit machinery — the
    // number that says whether q72's standing ~6-8 s bench wall is
    // cadence overhead or state I/O.
    "q72_available_now" -> ((s: SparkSession, dir: String) =>
      SparkEntry.streamingCdpQueryAvailableNow(s, dir,
        col("user_id") % 1000000L < 30)),
    "q110_stream_rocksdb" -> ((s: SparkSession, dir: String) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try SparkEntry.streamingSeasonalQueryWithState(s, dir,
        col("user_id") % 1000000L < 30)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }))

  /** Content identity of the source tables a scaled replica derives
    * from: sorted (relpath, size, mtime) over every data file. The
    * driver regenerates testdata in place between rounds; a stamp
    * keyed by directory name alone would silently serve replicas of
    * the previous round's data (round-5 lesson, same failure class as
    * the store markers in SparkEntry). */
  private def sourceFingerprint(base: String): String = {
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    Tables.names.foreach { t =>
      val root = java.nio.file.Paths.get(base, s"$t.parquet")
      if (java.nio.file.Files.exists(root))
        scala.util.Using.resource(java.nio.file.Files.walk(root)) { s =>
          s.forEach { p =>
            if (java.nio.file.Files.isRegularFile(p))
              files += s"$t/${root.relativize(p)}:" +
                s"${java.nio.file.Files.size(p)}:" +
                s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
          }
        }
    }
    java.util.UUID.nameUUIDFromBytes(
      files.sorted.mkString("\n").getBytes("UTF-8")).toString
  }

  /** Events-only replica for streaming-only invocations (the 1000×
    * state-store point): same per-replica user_id/event_id shifts as
    * [[ensureScaled]], but built with ONE explode over the replica
    * index instead of a K-way unionByName (a 1000-branch union plan is
    * quadratic in the analyzer and K scans of the source; content is
    * identical up to row order, which parquet does not contract). A
    * fresh FULL build of the same source satisfies the request; an
    * events-only build never satisfies a later full request (separate
    * marker). */
  def ensureScaledEvents(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    val fullMarker = java.nio.file.Paths.get(out, "_built")
    val fullStamp = s"$base x$k v3 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(fullMarker) &&
      new String(java.nio.file.Files.readAllBytes(fullMarker),
        "UTF-8") == fullStamp)
      return
    val marker = java.nio.file.Paths.get(out, "_built_events")
    val stamp = s"$base x$k events-v1 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        "UTF-8") == stamp)
      return
    store.RrdStore.deleteTree(out)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.table(spark, base, "events")
      .withColumn("__r", explode(sequence(lit(0L), lit(k - 1L))))
      .select(
        (col("event_id") + col("__r") * 10000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("__r") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(math.max(32, 32 * k / 100))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
  }

  /** Embeddings-only replica for batch-dedup/ANN-only invocations (the
    * 1000× batch decade, the counterpart of [[ensureScaledEvents]]):
    * same per-replica vec_id shift and orthogonal sign flip as
    * [[ensureScaled]], but built with ONE typed flatMap over the
    * replica index instead of a K-way unionByName — at K = 1000 the
    * union plan is quadratic in the analyzer, and the sign pattern
    * depends on (replica, dim) so a column-side `zip_with` would need
    * a K×64 literal array; the kernel computes the identical splitmix64
    * mix per emitted row. A fresh FULL build of the same source
    * satisfies the request; an embeddings-only build never satisfies a
    * later full one (separate marker). */
  def ensureScaledEmbeddings(spark: SparkSession, base: String,
      out: String, k: Int): Unit = {
    val fullMarker = java.nio.file.Paths.get(out, "_built")
    val fullStamp = s"$base x$k v3 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(fullMarker) &&
      new String(java.nio.file.Files.readAllBytes(fullMarker),
        "UTF-8") == fullStamp)
      return
    val marker = java.nio.file.Paths.get(out, "_built_embeddings")
    val stamp = s"$base x$k embeddings-v1 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        "UTF-8") == stamp)
      return
    // surgical: only this table and this marker — an events-only
    // replica cached in the same x$k directory stays valid
    java.nio.file.Files.deleteIfExists(marker): Unit
    store.RrdStore.deleteTree(s"$out/embeddings.parquet")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    import spark.implicits._
    val kk = k
    Tables.table(spark, base, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"),
        col("label").cast("int"))
      .as[(Long, Array[Float], Option[Int])]
      .flatMap { case (vid, emb, label) =>
        // the ensureScaled splitmix64 finalizer, verbatim: replicas
        // built either way are bit-identical
        def mix(z0: Long): Long = {
          var z = z0 + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        (0 until kk).iterator.map { i =>
          val v =
            if (i == 0 || emb == null) emb
            else {
              val o = new Array[Float](emb.length)
              var j = 0
              while (j < emb.length) {
                o(j) = if ((mix(i.toLong * 64 + j) & 1) == 0) emb(j)
                  else -emb(j)
                j += 1
              }
              o
            }
          (vid + i.toLong * 10000000L, v, label)
        }
      }
      .toDF("vec_id", "embedding", "label")
      .repartition(math.max(32, 32 * k / 100))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
  }

  /** Rows that read ONLY the embeddings table — an ONLY list inside
    * this set needs just the embeddings replica (the 1000× batch-dedup
    * decade: documents/lineitem parquet at k = 1000 is minutes of
    * build these rows never read). */
  val EmbeddingsOnly: Set[String] = Set(
    "q114_semdedup_distributed", "q116_incr_scale",
    "q117_kmeans_distributed", "q99_routed_default",
    "q114_occupancy_law")

  /** Documents-only replica — the text-dedup counterpart of
    * [[ensureScaledEmbeddings]] for the 1000× decade on the chunk/LSH
    * families: same per-replica doc_id shift and per-replica word
    * prefix as [[ensureScaled]] (within-replica shingle structure
    * preserved exactly, cross-replica overlap zero), one typed flatMap
    * instead of a K-way union. The prefix is the identical Java-regex
    * replaceAll the column form compiles to, so content is
    * bit-identical either way (spec-pinned). */
  def ensureScaledDocuments(spark: SparkSession, base: String,
      out: String, k: Int): Unit = {
    val fullMarker = java.nio.file.Paths.get(out, "_built")
    val fullStamp = s"$base x$k v3 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(fullMarker) &&
      new String(java.nio.file.Files.readAllBytes(fullMarker),
        "UTF-8") == fullStamp)
      return
    val marker = java.nio.file.Paths.get(out, "_built_documents")
    val stamp = s"$base x$k documents-v1 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        "UTF-8") == stamp)
      return
    java.nio.file.Files.deleteIfExists(marker): Unit
    store.RrdStore.deleteTree(s"$out/documents.parquet")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    import spark.implicits._
    val kk = k
    Tables.table(spark, base, "documents")
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("long"))
      .as[(Long, String, String, String, Long)]
      .flatMap { case (did, text, lang, source, nChars) =>
        (0 until kk).iterator.map { i =>
          val t =
            if (i == 0 || text == null) text
            else text.replaceAll("(\\S+)", s"r${i}x$$1")
          (did + i.toLong * 100000000L, t, lang, source, nChars)
        }
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(math.max(32, 32 * k / 100))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
  }

  /** Rows that read ONLY the documents table (the 1000× text-dedup
    * decade). */
  val DocumentsOnly: Set[String] = Set(
    "q25_dedup_exact", "q131_boilerplate_chunks", "q154_novelty_score",
    "q160_cdc_dedup", "q133_selfdedup_chunks", "q161_incr_scale",
    "q162_stream_scale", "q155_winnow_fingerprints", "q156_winnow_pairs",
    "q152_collocations", "q158_skipgram_pmi", "q94_shingle_containment",
    "q27_minhash_lsh", "q43_neardup_groups")

  def ensureScaled(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    val marker = java.nio.file.Paths.get(out, "_built")
    // v3: splitmix64-mixed embedding signs
    val stamp = s"$base x$k v3 fp=${sourceFingerprint(base)}"
    if (java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == stamp)
      return
    store.RrdStore.deleteTree(out)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // `ts` passes through verbatim, so the scaled copy keeps the source's
    // physical encoding (timestamp[us] or nanos-as-long INT64) and
    // Tables.events branches on whichever it finds. nanosAsLong only
    // affects the legacy TIMESTAMP(NANOS) encoding; harmless otherwise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def reps(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => f(df, i)).reduce(_ unionByName _)

    val ev = Tables.table(spark, base, "events")
    reps(ev) { (d, i) =>
      d.select(
        (col("event_id") + lit(i.toLong * 10000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = Tables.table(spark, base, "documents")
    reps(docs) { (d, i) =>
      d.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"r${i}x$$1")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.table(spark, base, "embeddings")
    reps(emb) { (d, i) =>
      // full dependence on (i, j): a linear form like (i*37 + j*11) & 2
      // only sees i mod 4, so replicas {1,5,9} would share one sign
      // pattern and collapse onto the same LSH/IVF cells, inflating
      // candidate counts with cosine-1.0 cross-replica pairs. splitmix64
      // finalizer, not a library hash: the dataset must be reproducible
      // across Scala versions (MurmurHash3.productHash is deprecated
      // with changed-semantics successors).
      def mix(z0: Long): Long = {
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val signs = (0 until 64).map { j =>
        if (i == 0 || (mix(i.toLong * 64 + j) & 1) == 0) 1.0f else -1.0f
      }
      d.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        zip_with(col("embedding"), array(signs.map(lit): _*),
          (x, s) => x * s).as("embedding"),
        col("label"))
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val li = Tables.table(spark, base, "lineitem")
    reps(li) { (d, i) =>
      d.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 10000000000L))
    }.repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach { t =>
        Tables.table(spark, base, t)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    java.nio.file.Files.write(marker, stamp.getBytes("UTF-8")): Unit
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = s"/tmp/graft_scale/x$k"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed-table demo tables (q101 family) land under a
      // user-keyed tmp dir, never the repo's CWD-relative default
      .config("spark.sql.warehouse.dir", Tables.warehouseDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // an ONLY list of purely streaming rows needs just the events
    // replica — at K in the thousands the full table build is minutes
    // of parquet the batch rows never read
    val onlyPeek = args.lift(2).map(_.split(",").filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // q162 streams DOCUMENTS — it must not ride the events-only build
    if (onlyPeek.exists(o => o.nonEmpty &&
        o.subsetOf(Streaming.map(_._1).toSet - "q162_stream_scale")))
      ensureScaledEvents(spark, base, out, k)
    else if (onlyPeek.exists(o => o.nonEmpty && o.subsetOf(EmbeddingsOnly)))
      ensureScaledEmbeddings(spark, base, out, k)
    else if (onlyPeek.exists(o => o.nonEmpty && o.subsetOf(DocumentsOnly)))
      ensureScaledDocuments(spark, base, out, k)
    else
      ensureScaled(spark, base, out, k)

    // absorb one-time session costs before the clock starts
    spark.range(1000).groupBy((col("id") % 4).as("g"))
      .agg(expr("bit_xor(xxhash64(id))")).collect()
    Tables.table(spark, base, "region").collect()

    type St = Option[graft.streaming.StreamRun.StateMetrics]
    def time(fn: (SparkSession, String) => (DataFrame, St),
        dir: String): (Double, St, DataFrame) = {
      // run twice, report the warm pass: the cold pass pays plan-shape
      // JIT/codegen that would otherwise bias whichever dir runs first.
      // The warm pass's frame rides along for SPARK_GRAFT_SHOW — for
      // streaming rows it reads the already-written sink, so showing
      // rows never launches a third micro-batch run
      def once(): (Double, St, DataFrame) = {
        val t0 = System.nanoTime()
        val (df, st) = fn(spark, dir)
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        ((System.nanoTime() - t0) / 1e9, st, df)
      }
      once(); once()
    }

    // args(1): comma-separated skip list (e.g. the known-quadratic
    // fixed-planes q45 at factors where it would run for an hour);
    // args(2): comma-separated ONLY list — run just these rows (for
    // re-measuring a new operator without paying the full sweep)
    val skip = args.lift(1).map(_.split(",").filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val only = args.lift(2).map(_.split(",").filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val batch = (Selected.map(n => n -> SparkEntry.queries(n)) ++ Extra)
      .map { case (n, fn) =>
        n -> ((s: SparkSession, d: String) => (fn(s, d), None: St))
      }
    val results = (batch ++ Streaming)
      .filterNot { case (name, _) => skip(name) }
      .filter { case (name, _) => only.forall(_(name)) }
      .map { case (name, fn) =>
        val (b, stB, dfB) = time(fn, base)
        val (s, stS, dfS) = time(fn, out)
        // SPARK_GRAFT_SHOW: dump each row's head to stderr — for
        // law rows (e.g. q114_occupancy_law) whose VALUES, not just
        // walls, go into SCALE.md; reuses the timed runs' frames
        if (sys.env.contains("SPARK_GRAFT_SHOW"))
          for ((dir, d) <- Seq(base -> dfB, out -> dfS);
              r <- d.limit(20).collect())
            System.err.println(s"[scale][show] $name $dir $r")
        val stateNote = (stB, stS) match {
          case (Some(mb), Some(ms)) =>
            f"  state rows ${mb.maxRows}%d -> ${ms.maxRows}%d" +
              f"  bytes ${mb.maxBytes}%d -> ${ms.maxBytes}%d"
          case _ => ""
        }
        System.err.println(f"[scale] $name%s base $b%.2f s  x$k $s%.2f s  " +
          f"ratio ${s / b}%.2f$stateNote")
        (name, b, s, stB, stS)
      }
    val qs = results.map { case (n, b, s, stB, stS) =>
      val st = (stB, stS) match {
        case (Some(mb), Some(ms)) =>
          s""","state_rows_base":${mb.maxRows}""" +
            s""","state_rows_scaled":${ms.maxRows}""" +
            s""","state_bytes_base":${mb.maxBytes}""" +
            s""","state_bytes_scaled":${ms.maxBytes}"""
        case _ => ""
      }
      f""""$n":{"base_s":$b%.3f,"scaled_s":$s%.3f,"ratio":${s / b}%.2f$st}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale","factor":$k,"cpus":$cpus,""" +
      s""""queries":$qs,"base":"$base","scaled":"$out"}""")
    spark.stop()
  }
}
