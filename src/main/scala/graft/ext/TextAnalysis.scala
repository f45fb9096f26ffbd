package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north-star: language-ID, quality scoring, token
  * counting, fingerprinting). All pure column expressions —
  * whole-stage-codegen'd, no UDFs, shuffle-free (per-row), and
  * replicable in the DuckDB oracle.
  */
object TextAnalysis {

  /** Canonical normalization shared by every text operator. */
  def normalize(text: Column): Column = lower(trim(text))

  /** Whitespace tokens of the normalized text. */
  def words(text: Column): Column = split(normalize(text), " ")

  /** Count of tokens equal to `w` (list-filter based: exact even for
    * adjacent repeats, unlike replace-counting). */
  def wordCount(ws: Column, w: String): Column =
    size(filter(ws, x => x === lit(w)))

  /** Quality metrics: char/word counts, average word length, stopword
    * ratio, distinct-token ratio (repetition detector). */
  def qualityExprs(text: Column): Map[String, Column] = {
    val ws = words(text)
    val n = size(ws).cast("double")
    val stop = Seq("the", "a", "of", "to", "and", "is", "in")
    Map(
      "n_chars_m" -> length(normalize(text)).cast("long"),
      "n_words" -> size(ws).cast("long"),
      "avg_word_len" ->
        (length(normalize(text)) - (size(ws) - 1)).cast("double") / n,
      "stopword_ratio" ->
        size(filter(ws, x => x.isin(stop.map(lit): _*))).cast("double") / n,
      "distinct_ratio" -> size(array_distinct(ws)).cast("double") / n)
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1's
    * duplicate-n-gram family, on the whitespace tokens of
    * [[normalize]]): the fraction of tokens taken by the single most
    * frequent word, the fraction of bigram instances taken by the most
    * frequent bigram, and the fraction of bigram instances whose bigram
    * occurs more than once. Repetitious machine-generated text scores
    * high; the `pass` thresholds are the caller's policy.
    *
    * Per-row column expressions, shuffle-free. Cost is O(distinct·n)
    * interpreted-HOF work per DOCUMENT (bounded by doc length, not
    * corpus size) — at 100 TB this is a per-row map over the scan like
    * the other text metrics. Single-word docs have no bigrams: the
    * bigram fractions are null there (never a 0/0).
    */
  def repetitionExprs(text: Column): Map[String, Column] = {
    val ws = words(text)
    val n = size(ws)
    val wCounts = transform(array_distinct(ws),
      w => size(filter(ws, x => x === w)))
    // sequence(1, 0) would COUNT DOWN in Spark — guard the 1-word case
    val bg = when(n >= 2, transform(sequence(lit(1), n - 1), i =>
      concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val nbg = size(bg)
    val bgCounts = transform(array_distinct(bg),
      b => size(filter(bg, x => x === b)))
    val topWord = array_max(wCounts).cast("double") / n.cast("double")
    val topBigram = when(nbg === 0, lit(null)).otherwise(
      array_max(bgCounts).cast("double") / nbg.cast("double"))
    val dupBigram = when(nbg === 0, lit(null)).otherwise(
      aggregate(filter(bgCounts, c => c >= 2), lit(0), (acc, c) => acc + c)
        .cast("double") / nbg.cast("double"))
    Map(
      "top_word_frac" -> topWord,
      "top_bigram_frac" -> topBigram,
      "dup_bigram_frac" -> dupBigram)
  }

  /** [[repetitionExprs]] as a typed primitive kernel — the corpus-scan
    * hot path (the q26 lesson yet again: the column form's
    * O(distinct·n) per-doc work runs through interpreted lambda HOFs,
    * measured 24 s for the sf0.1 sweep vs ~1 s here). Tokenization
    * stays in Catalyst ([[words]] — identical to the SQL oracle);
    * everything downstream (count maps, max, dup mass, the final one
    * IEEE divide each) is plain integer arithmetic, so the doubles are
    * bit-identical to the column form (parity-spec-pinned, which keeps
    * the column form as the documented oracle anchor).
    *
    * Output: `id`, top_word_frac, top_bigram_frac, dup_bigram_frac
    * (nulls for a null text; bigram fractions null for 1-word docs,
    * exactly like the column form).
    */
  def repetitionFrame(df: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), words(col(text)))
      .as[(Long, Seq[String])]
      .map { case (docId, ws) =>
        if (ws == null) (docId, None: Option[Double], None: Option[Double],
          None: Option[Double])
        else {
          val n = ws.length
          val wc = new java.util.HashMap[String, Int]()
          ws.foreach(w => wc.merge(w, 1, _ + _))
          var topW = 0
          wc.values.forEach(c => if (c > topW) topW = c)
          val topWord = Some(topW.toDouble / n)
          if (n < 2) (docId, topWord, None, None)
          else {
            val nbg = n - 1
            val bc = new java.util.HashMap[String, Int]()
            var i = 0
            while (i < nbg) {
              bc.merge(ws(i) + " " + ws(i + 1), 1, _ + _); i += 1
            }
            var topB = 0
            var dup = 0
            bc.values.forEach { c =>
              if (c > topB) topB = c
              if (c >= 2) dup += c
            }
            (docId, topWord, Some(topB.toDouble / nbg),
              Some(dup.toDouble / nbg))
          }
        }
      }
      .toDF(id, "top_word_frac", "top_bigram_frac", "dup_bigram_frac")
  }

  /** Per-language marker vocabularies for the n-gram/stopword language
    * heuristic. Deterministic scoring: hits per marker list; argmax with
    * fixed tie order (en, fr, es, de, zh). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "is", "of"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "que", "en"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  /** Score for one language = total marker-token hits. */
  def langScore(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, x => x.isin(markers.map(lit): _*))).cast("long")

  /** Predicted language: argmax score, first-listed wins ties. */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scored = langMarkers.map { case (l, ms) => (l, langScore(ws, ms)) }
    // fold right so earlier languages win ties via strict >
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestL, bestS), (l, s)) =>
        (when(s > bestS, lit(l)).otherwise(bestL),
          when(s > bestS, s).otherwise(bestS))
    }._1
  }

  /** Token counts: whitespace tokens and BPE-ish alnum/punct tokens
    * (explicit char classes — identical across regex dialects). */
  def tokenExprs(text: Column): Map[String, Column] = {
    val ws = words(text)
    Map(
      "ws_tokens" -> size(ws).cast("long"),
      "alnum_tokens" ->
        size(filter(split(normalize(text), "[^a-z0-9]+"),
          x => length(x) > 0)).cast("long"),
      "uniq_tokens" -> size(array_distinct(ws)).cast("long"))
  }

  /** Document fingerprint: md5 of the normalized text (exact-dup key)
    * plus a short prefix form for bucketing. */
  def fingerprint(text: Column): Column = md5(normalize(text))
  def fingerprintPrefix(text: Column, n: Int): Column =
    substring(fingerprint(text), 1, n)

  /** Sliding-window token chunking — the doc-splitting step between
    * curation and pretraining: each document's whitespace tokens cut
    * into windows of `size` tokens starting every `stride` tokens
    * (stride < size gives the standard overlap so no boundary context
    * is lost; the trailing window is shorter). Pure column work —
    * `sequence` for the start grid, `slice`/`array_join` per window —
    * so the explode is map-side with no shuffle at any corpus size,
    * and all arithmetic is integer/string (cross-engine hash-exact).
    *
    * Output: (id, chunk_id, n_tokens, chunk_text), chunk_id dense from
    * 0 in token order; token-less docs emit nothing.
    */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size (got size=$size, stride=$stride)")
    val ws = words(col(text))
    df.select(col(id), ws.as("__ws"))
      .where(org.apache.spark.sql.functions.size(col("__ws")) > 0)
      .select(col(id), col("__ws"),
        explode(sequence(lit(1),
          org.apache.spark.sql.functions.size(col("__ws")),
          lit(stride))).as("__start"))
      .select(col(id),
        // integer div (Column./ on ints is DOUBLE division)
        expr(s"CAST((__start - 1) div $stride AS BIGINT)").as("chunk_id"),
        org.apache.spark.sql.functions
          .size(slice(col("__ws"), col("__start"), lit(size)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__ws"), col("__start"), lit(size)), " ")
          .as("chunk_text"))
  }

  /** Tokenizer-coverage (OOV-rate) report — the vocabulary-fit check a
    * pipeline runs before committing to a tokenizer budget: the
    * corpus's top-`vocabSize` words by frequency (count DESC, word ASC
    * — the engine-independent tiebreak, so the selected SET is
    * identical in the oracle) form the vocabulary, and every document
    * reports how many of its tokens fall outside it. High OOV = the
    * vocabulary under-covers that document's domain/language.
    *
    * Scale shape: the vocabulary comes from ONE partial-aggregated
    * word count (the only corpus-sized exchange) + a bounded
    * TakeOrdered (never a full sort); it is `vocabSize` rows by
    * construction, so it collects into a broadcast hash set and the
    * scoring pass is a shuffle-free typed map with an O(1) probe per
    * token — the `size(filter(array_contains))` column form would be
    * O(len·V) per document and collapse at a real 100k-word
    * vocabulary. Counts are integers; the rate is one IEEE divide.
    *
    * Output: (id, lang, n_tokens, oov_tokens, oov_frac). */
  def oovRateReport(df: org.apache.spark.sql.DataFrame, id: String,
      lang: String, text: String,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, s"vocabSize=$vocabSize must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(words(col(text))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select("w").as[String].collect().toSet
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(col(id).cast("long"), col(lang), normalize(col(text)))
      .as[(Long, String, String)]
      .map { case (docId, lg, norm) =>
        val v = bc.value
        val ws = norm.split(" ", -1)
        var oov = 0
        var i = 0
        while (i < ws.length) {
          if (!v.contains(ws(i))) oov += 1
          i += 1
        }
        (docId, lg, ws.length.toLong, oov.toLong,
          oov.toDouble / ws.length.toDouble)
      }
      .toDF(id, lang, "n_tokens", "oov_tokens", "oov_frac")
  }

  /** TF-IDF top-k keyword extraction per document — the per-doc
    * keyword/topic tagging step of a curation pipeline (domain
    * routing, index cards, dedup explanations). IDF uses the q97
    * odds form, idf(t) = (N − df_t + 0.5)/(df_t + 0.5), which is
    * order-equivalent to log-IDF per term but log-free, so every
    * score is integer counts + one divide + one multiply — inside the
    * cross-engine hash gate (`ln` differs across libms, the q90/q97
    * discipline). score(d, t) = tf_{d,t} · idf(t); ranking breaks
    * ties (score DESC, term ASC).
    *
    * Scale shape: document frequencies come from one distinct-pair
    * aggregation (the corpus-positions exchange); the DF frame is
    * vocabulary-sized and joins the per-doc term counts on the term
    * key (AQE picks broadcast under threshold, plain equi-join past
    * it); the final per-doc top-k is a window over doc_id — a
    * HIGH-cardinality partition key whose groups are bounded by
    * document length, the non-skewed window case.
    *
    * Output: (id, rank, term, tf, score). */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"top-k needs k > 0 (got $k)")
    val n = df.count()
    val tk = df.select(col(id), explode(words(col(text))).as("term"))
    val tf = tk.groupBy(col(id), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // document frequency FROM the tf frame: tf's rows ARE the distinct
    // (doc, term) pairs, so df needs no second corpus-positions
    // explode+distinct — one vocab-sized aggregation over tf instead
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val idf = (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val scored = tf.join(dfreq, "term")
      .select(col(id), col("term"), col("tf"),
        (col("tf").cast("double") * idf).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(id), col("rank"), col("term"), col("tf"), col("score"))
  }

  /** Hashing-trick text vectorizer — the text→feature bridge into the
    * embedding families (the classic hashing vectorizer / feature
    * hashing): every token maps to bucket = md5-top-60-bits mod `dim`
    * with a ±1 sign from md5 hex digit 16 (the q39 projection idiom —
    * signs make collisions cancel in expectation instead of
    * accumulating), buckets accumulate token multiplicity, and the
    * vector optionally L2-normalizes (Σv² is an exact small-integer
    * sum in double; norm = one sqrt; one divide per coordinate; a
    * zero vector stays zero). Everything is engine-portable md5
    * arithmetic + fixed IEEE ops, so the full vector — and anything
    * computed FROM it downstream (cosines, cells) — sits inside the
    * cross-engine hash gate.
    *
    * Scale shape: ONE shuffle-free typed map — each document's vector
    * assembles in-row (no explode, no (doc, bucket) exchange, no
    * pivot); a per-partition token→(bucket, sign) memo skips repeat
    * md5s (corpora repeat tokens heavily). Output vectors feed the
    * ANN/quantizer family directly: hashed bag-of-words near-dup via
    * the distributed-quantizer mine is the q127 composition.
    *
    * Output: (id, vec: array<double>). */
  def hashingVectorize(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, dim: Int,
      l2Normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim=$dim must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long"), normalize(col(text)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // memo is CAPPED: a partition's distinct-token set grows with
        // the data it scans (unbounded at 100 TB partition sizes), so
        // past 2^20 entries new tokens hash uncached instead of
        // growing the map — a cache, never a memory liability
        val memoCap = 1 << 20
        val memo = new java.util.HashMap[String, (Int, Int)]()
        it.map { case (docId, norm) =>
          val v = new Array[Double](dim)
          // NULL text → the zero vector (the oracle CTE's row for the
          // same doc), not an NPE
          val ws = if (norm == null) Array.empty[String]
            else norm.split(" ", -1)
          var i = 0
          while (i < ws.length) {
            var bs = memo.get(ws(i))
            if (bs == null) {
              md.reset()
              val b = md.digest(ws(i).getBytes("UTF-8"))
              // hex chars 1..15 = nibbles 0..14 (md5 top 60 bits)
              var u = 0L
              var q = 0
              while (q < 15) {
                val by = b(q / 2) & 0xff
                u = u * 16 + (if (q % 2 == 0) by >>> 4 else by & 0xf)
                q += 1
              }
              // hex char 16 = low nibble of byte 7; '8'..'f' → +1
              val s = if ((b(7) & 0xf) >= 8) 1 else -1
              bs = ((u % dim).toInt, s)
              if (memo.size < memoCap) memo.put(ws(i), bs)
            }
            v(bs._1) += bs._2
            i += 1
          }
          if (l2Normalize) {
            var n2 = 0.0
            var j = 0
            while (j < dim) { n2 += v(j) * v(j); j += 1 }
            val n = math.sqrt(n2)
            if (n > 0) {
              j = 0
              while (j < dim) { v(j) /= n; j += 1 }
            }
          }
          (docId, v.toSeq)
        }
      }
      .toDF(id, "vec")
  }

  /** IDF-weighted [[hashingVectorize]] — the weighting the
    * bag-of-words literature actually retrieves with: a token's
    * contribution scales by its rarity, so "the"-like mass stops
    * dominating the hashed cosine geometry and the q114/q127 dedup
    * chain keys on CONTENT words. The weight is the q97 odds-IDF
    * rational form ((N − df + 0.5)/(df + 0.5) — every op a single IEEE
    * instruction, NO ln(), so the whole vector replays bit-for-bit in
    * the oracle); df comes from a `vocabSize`-bounded head of the
    * corpus document frequencies (count DESC, word ASC — the q123
    * vocabulary discipline) and out-of-vocabulary tokens take df = 0,
    * the maximal rarity boost.
    *
    * Determinism: weighted contributions are DOUBLES, so accumulation
    * order matters (unlike the integer parent). The kernel folds each
    * document's DISTINCT tokens in UTF-8 byte order — the exact order
    * DuckDB's `list(v ORDER BY w)` uses — with contribution
    * (sign·count)·weight (integer product first, ONE fp multiply), so
    * every bucket's fold replays exactly.
    *
    * Scale shape: document frequencies are ONE partial-agg'd
    * distinct-(doc, word) exchange + a bounded TakeOrdered
    * (vocabSize rows collect and broadcast — the q123 contract); the
    * scoring pass is a shuffle-free typed map, O(len·log len) per doc
    * for the sorted distinct-count map, O(1) weight probes.
    *
    * Output: (id, vec) — `dim`-wide doubles, L2-normalized unless
    * disabled (zero vectors stay zero). */
  def idfHashingVectorize(df: org.apache.spark.sql.DataFrame,
      id: String, text: String, dim: Int, vocabSize: Int,
      l2Normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim=$dim must be >= 1")
    require(vocabSize > 0, s"vocabSize=$vocabSize must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val nDocs = df.count()
    val dfs = df.select(col(id),
        explode(array_distinct(words(col(text)))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__df"))
      .orderBy(col("__df").desc, col("__w")).limit(vocabSize)
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(dfs)
    df.select(col(id).cast("long"), normalize(col(text)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val dfm = bc.value
        // the parent's capped per-partition token→(bucket, sign) memo:
        // (bucket, sign) depends on the token alone (the IDF weight is
        // applied outside), so repeat tokens across documents skip the
        // md5 instead of re-digesting per distinct token per document
        val memoCap = 1 << 20
        val memo = new java.util.HashMap[String, (Int, Int)]()
        // UTF-8 byte order — DuckDB's varchar ORDER BY (java's
        // String.compareTo is UTF-16 code-unit order, which differs on
        // supplementary characters)
        val utf8 = new java.util.Comparator[String] {
          def compare(a: String, b: String): Int = {
            val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
            var i = 0
            val n = math.min(x.length, y.length)
            while (i < n) {
              val dd = (x(i) & 0xff) - (y(i) & 0xff)
              if (dd != 0) return dd
              i += 1
            }
            x.length - y.length
          }
        }
        it.map { case (docId, norm) =>
          val counts = new java.util.TreeMap[String, Int](utf8)
          // NULL text → the zero vector (the oracle CTE's row for the
          // same doc), not an NPE
          val ws = if (norm == null) Array.empty[String]
            else norm.split(" ", -1)
          var i = 0
          while (i < ws.length) {
            val c = counts.get(ws(i))
            counts.put(ws(i), if (c == null) 1 else c + 1)
            i += 1
          }
          val v = new Array[Double](dim)
          val ent = counts.entrySet().iterator()
          while (ent.hasNext) {
            val e = ent.next()
            var bs = memo.get(e.getKey)
            if (bs == null) {
              md.reset()
              val b = md.digest(e.getKey.getBytes("UTF-8"))
              var u = 0L
              var q = 0
              while (q < 15) {
                val by = b(q / 2) & 0xff
                u = u * 16 + (if (q % 2 == 0) by >>> 4 else by & 0xf)
                q += 1
              }
              val s = if ((b(7) & 0xf) >= 8) 1 else -1
              bs = ((u % dim).toInt, s)
              if (memo.size < memoCap) memo.put(e.getKey, bs)
            }
            val dfw = dfm.getOrElse(e.getKey, 0L)
            val wt = ((nDocs - dfw) + 0.5) / (dfw + 0.5)
            v(bs._1) += (bs._2 * e.getValue).toDouble * wt
          }
          if (l2Normalize) {
            var n2 = 0.0
            var j = 0
            while (j < dim) { n2 += v(j) * v(j); j += 1 }
            val n = math.sqrt(n2)
            if (n > 0) {
              j = 0
              while (j < dim) { v(j) /= n; j += 1 }
            }
          }
          (docId, v.toSeq)
        }
      }
      .toDF(id, "vec")
  }

  /** Char-trigram CODE-POINT triples of a normalized string, in
    * position order — code points, not UTF-16 chars, so the extraction
    * agrees with DuckDB's character-based `substr` on any BMP or
    * supplementary text. */
  private def triGrams(norm: String): Array[String] = {
    if (norm == null) return Array.empty
    val cps = norm.codePoints().toArray
    if (cps.length < 3) return Array.empty
    Array.tabulate(cps.length - 2)(i => new String(cps, i, 3))
  }

  /** First-iteration BPE pair statistics — the tokenizer-TRAINING step
    * of a data pipeline (the merge-candidate table a BPE trainer ranks
    * and merges): adjacent code-point pair frequencies over the
    * corpus, weighted by word frequency. The corpus is touched ONCE
    * (word explode + count — one exchange carrying (word, count));
    * pair generation then runs over the DISTINCT VOCABULARY — the
    * standard BPE-trainer trick, so the inner work is
    * Θ(vocabulary × word length), independent of corpus row count.
    * All counts are integers (hash-exact); the top-k ranking breaks
    * ties (count DESC, pair ASC) so the selected SET is
    * engine-independent; pair strings are CODE-POINT windows, matching
    * DuckDB's character substr (the q90 contract).
    *
    * Output: (pair, pair_count) — the k most frequent merge
    * candidates. */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame, text: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = df.select(explode(words(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
    vocab.flatMap { case (w, wc) =>
        val cps = w.codePoints().toArray
        if (cps.length < 2) Iterator.empty
        else (0 until cps.length - 1).iterator
          .map(i => (new String(cps, i, 2), wc))
      }
      .toDF("pair", "wc")
      .groupBy("pair").agg(sum(col("wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(k)
  }

  /** Chained BPE merge TRAINING — the tokenizer-trainer loop
    * [[bpePairCounts]] is one iteration of: each round ranks adjacent
    * symbol pairs over the DISTINCT vocabulary (weighted by word
    * count), applies the single top merge (count DESC, then left ASC,
    * right ASC — binary UTF-8 order, identical in both engines)
    * GREEDILY LEFT-TO-RIGHT inside every vocab word, and re-mines.
    * Greedy semantics pinned: scanning i ascending, a match at i
    * consumes positions i and i+1, so within a run of consecutive
    * match positions (only possible when left = right) the merges land
    * at even offsets — the rule the SQL oracle replays with a
    * run-grouping window. Symbols start as CODE POINTS (supplementary-
    * safe, the q90/q108 contract).
    *
    * Scale shape: the corpus is touched ONCE (the word-count
    * aggregate); each iteration is one vocab-sized exchange (adjacent
    * pairs → partial-agg'd counts) plus a ONE-ROW TakeOrdered to the
    * driver — corpus-independent, the standard BPE-trainer property.
    * The evolving vocab is cached level-to-level (level m-1 unpersists
    * once level m is materialized — the connectedComponents iteration
    * discipline). A corpus with fewer distinct merges than requested
    * fails loudly rather than silently truncating the merge table.
    *
    * Output: (rank, left_sym, right_sym, pair_count) — one row per
    * merge, pair_count measured at selection time. */
  def bpeMerges(df: org.apache.spark.sql.DataFrame, text: String,
      merges: Int): org.apache.spark.sql.DataFrame = {
    require(merges >= 1, s"merges=$merges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = df.select(explode(words(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
      .map { case (w, wc) =>
        val cps = if (w == null) Array.empty[Int] else w.codePoints().toArray
        (Array.tabulate(cps.length)(i =>
          new String(cps, i, 1)).toSeq, wc)
      }
      .persist()
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var cur = vocab
    var prev: org.apache.spark.sql.Dataset[(Seq[String], Long)] = null
    try {
      var m = 1
      while (m <= merges) {
        val top = cur.flatMap { case (sy, wc) =>
            if (sy.length < 2) Iterator.empty
            else (0 until sy.length - 1).iterator
              .map(i => (sy(i), sy(i + 1), wc))
          }
          .toDF("l", "r", "wc")
          .groupBy("l", "r").agg(sum(col("wc")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        require(top.nonEmpty,
          s"vocabulary exhausted after ${m - 1} merges < requested $merges")
        // the action above materialized cur's cache; the previous level
        // is now safe to drop
        if (prev != null) { prev.unpersist(); prev = null }
        val (l, r, cnt) = top(0)
        out += ((m.toLong, l, r, cnt))
        val merged = l + r
        val next = cur.map { case (sy, wc) =>
          if (sy.length < 2) (sy, wc)
          else {
            val nb = new scala.collection.mutable.ArrayBuffer[String](
              sy.length)
            var i = 0
            while (i < sy.length) {
              if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
                nb += merged; i += 2
              } else { nb += sy(i); i += 1 }
            }
            (nb.toSeq, wc)
          }
        }.persist()
        prev = cur
        cur = next
        m += 1
      }
    } finally {
      if (prev != null && (prev ne vocab)) prev.unpersist()
      if (cur ne vocab) cur.unpersist()
      vocab.unpersist()
    }
    out.result().toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Character-trigram language-model quality score — the
    * "does this look like language X" filter of a curation pipeline
    * (fastText-style LM filtering), in EXACT RATIONAL form so the
    * cross-engine hash gate applies: per language the corpus trains
    * conditional trigram probabilities p(c|ab) = n3(abc) / n2(ab·)
    * from integer counts, and a doc's score is the POSITION-ORDERED
    * mean of its trigram probabilities. No logarithm anywhere — `log`
    * is libm-dependent across engines, while integer counts, one IEEE
    * divide per distinct trigram, an order-pinned sum, and one final
    * divide are bit-reproducible (the q63/q86 discipline). Low score =
    * character sequences rare for the doc's language → gibberish,
    * wrong-language, or boilerplate-heavy text.
    *
    * Scale shape: trigram counting is ONE exchange on (lang, trigram)
    * with map-side partial aggregation (counts, not positions, cross
    * the wire). The model is then BOUNDED before it ever reaches the
    * driver (round-10; the unbounded collect was safe only for small
    * alphabets — 5 000 common hanzi admit ~1.2e11 possible trigrams,
    * and the 100× replica measured distinct trigrams growing ∝K):
    *   - `minCount` drops singleton-tail trigrams on top of the same
    *     aggregate (no extra pass) — the standard LM pruning knob;
    *   - `maxTrigramsPerLang` keeps the top-M trigrams per language by
    *     (count DESC, trigram ASC — both engines' binary UTF-8 order),
    *     via a row_number window over the AGGREGATED count frame
    *     (model-sized, never corpus-sized).
    * The collected model is therefore ≤ #langs × M rows by contract
    * (≤ #langs × 1.6 MB at the 65 536 default — a declared broadcast
    * budget independent of alphabet). Prefix totals n2(ab·) are
    * computed from the KEPT counts, so the conditional probabilities
    * renormalize within the capped model — deterministically, and the
    * SQL oracle replays the identical filter + renormalization.
    * Scoring is a per-row kernel over the broadcast map, shuffle-free;
    * out-of-model trigrams are skipped: a doc's score is the
    * position-ordered mean over its MODELED trigram occurrences and
    * `n_trigrams` counts exactly those (a doc with none scores null).
    *
    * Output: (id, lang, n_trigrams, score); docs shorter than 3 code
    * points score null with n_trigrams 0.
    */
  def trigramLmScore(df: org.apache.spark.sql.DataFrame, id: String,
      lang: String, text: String, minCount: Long = 2L,
      maxTrigramsPerLang: Int = 65536): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val normed = df.select(col(id), col(lang).as("__lang"),
      normalize(col(text)).as("__norm"))
    // model: integer trigram counts per (lang, tri) — one corpus
    // exchange, then the distributed cap, then the (bounded) collect
    val n3 = trigramModel(normed.select(col("__lang").as("lang"),
        col("__norm").as("norm")), minCount, maxTrigramsPerLang)
      .as[(String, String, Long)]
      .collect()
    // prefix totals and conditional probabilities, driver-side exact
    // over the capped model (the oracle renormalizes identically)
    val n2 = new java.util.HashMap[(String, String), Long]()
    n3.foreach { case (lg, tri, n) =>
      val cps = tri.codePoints().toArray
      n2.merge((lg, new String(cps, 0, 2)), n, _ + _)
    }
    val p = n3.map { case (lg, tri, n) =>
      val cps = tri.codePoints().toArray
      ((lg, tri), n.toDouble / n2.get((lg, new String(cps, 0, 2))).toDouble)
    }.toMap
    val bc = spark.sparkContext.broadcast(p)
    normed.as[(Long, String, String)]
      .map { case (docId, lg, norm) =>
        val pm = bc.value
        val ts = triGrams(norm)
        var s = 0.0
        var m = 0L
        var i = 0
        while (i < ts.length) {
          pm.get((lg, ts(i))) match {
            case Some(pv) => s += pv; m += 1
            case None =>
          }
          i += 1
        }
        if (m == 0L) (docId, lg, 0L, None: Option[Double])
        else (docId, lg, m, Some(s / m))
      }
      .toDF(id, lang, "n_trigrams", "score")
  }

  /** CCNet-style quality buckets: every document lands in the
    * head / middle / tail third of its LANGUAGE's [[trigramLmScore]]
    * distribution (CCNet buckets by LM perplexity terciles; this score
    * is a mean probability, so HIGH = head). The bucketing is by
    * per-language threshold VALUES — the exact score at rank CEIL(n/3)
    * and CEIL(2n/3) of the ascending order ([[Curation.exactQuantilesPerGroupsDouble]]) —
    * not by per-document rank, which is the scale-correct shape: the
    * thresholds come from one bounded map-side aggregate (#langs × 2
    * doubles), and bucket assignment is a per-row compare against a
    * broadcast-eligible #langs-row frame — no corpus-wide window, no
    * per-language sort (a `ntile` over `PARTITION BY lang` funnels
    * each language through one reducer; English IS the corpus at
    * 100 TB). Under ties the buckets are value-pure (equal scores land
    * in the same bucket) rather than exactly equal-sized — the
    * documented production trade.
    *
    * Scoreless documents (no modeled trigram — [[trigramLmScore]]
    * yields null) bucket as 'unscored' and never enter the thresholds.
    * A NULL `lang` is out of contract: its scored docs would find no
    * threshold row (null joins nothing in either engine) and the
    * compare chain would fall through to 'head' — identically on both
    * sides, so the hash gate still holds, but filter null langs first
    * if the label is meaningful.
    *
    * Output: (id, lang, n_trigrams, score, bucket),
    * bucket ∈ {head, middle, tail, unscored}:
    * score ≤ t(1/3) → tail, ≤ t(2/3) → middle, else head. */
  def lmQualityBuckets(df: org.apache.spark.sql.DataFrame, id: String,
      lang: String, text: String, minCount: Long = 2L,
      maxTrigramsPerLang: Int = 65536): org.apache.spark.sql.DataFrame = {
    // The scored frame feeds TWO consumers — the threshold aggregate
    // and the bucket join below — and exchange reuse does not span
    // join trees, so unmaterialized it re-ran the text scan + the
    // per-doc trigram scoring kernel once per consumer (2x the scoring
    // cost at 100 TB; r15 verdict item 2). Checkpoint the SCORED frame,
    // not the corpus: 4 scalar columns per document (~40 B/doc,
    // ~1/250 of corpus bytes) — inside the materialize helper's
    // bytes-bounded contract, unlike the corpus-positions frames the
    // q156 OOM banned.
    val lm = Dedup.materialize(trigramLmScore(df, id, lang, text,
      minCount, maxTrigramsPerLang))
    val th = Curation.exactQuantilesPerGroupsDouble(
      lm.where(col("score").isNotNull), Seq(lang), col("score"),
      Seq(("__t1", 1.0 / 3), ("__t2", 2.0 / 3)))
    lm.join(broadcast(th), Seq(lang), "left")
      .select(col(id), col(lang), col("n_trigrams"), col("score"),
        when(col("score").isNull, lit("unscored"))
          .when(col("score") <= col("__t1"), lit("tail"))
          .when(col("score") <= col("__t2"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  /** BM25 relevance scoring with ODDS-form IDF — the ranking leg of a
    * corpus search/selection pipeline (keyword-targeted training-data
    * selection, eval-set retrieval), kept log-free so the scores
    * themselves sit inside the cross-engine hash contract: classic BM25
    * takes idf = ln(odds); this operator scores with the odds directly,
    *   idf'(t) = (N − df_t + 0.5) / (df_t + 0.5)
    *   score(d) = Σ_t idf'(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
    * — per-term ranking is order-equivalent (ln is monotone); the sum
    * weighs rare terms more steeply than log-BM25, documented as the
    * exact-rational variant (`ln`/`log` differ across engine libms —
    * the q90 discipline). Every number is an integer count, one IEEE
    * divide, or a fixed-order double chain both engines replay
    * bit-identically (avglen = exact integer Σlen / N).
    *
    * Scale shape: N, df_t, and Σlen come from ONE partial-aggregated
    * reduction over the corpus (a single row crosses the wire); scoring
    * is then a shuffle-free per-row projection with the constants
    * inlined as literals. Global top-k compiles to
    * TakeOrderedAndProject.
    *
    * Output: (id, score, n_tokens) for docs matching ≥1 term. */
  def bm25OddsScores(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val ws = words(col(text))
    val len = size(ws).cast("long")
    val tfs = terms.map(t => wordCount(ws, t).cast("long"))
    val statAggs = Seq(count(lit(1)).as("n"), sum(col("__len")).as("sl")) ++
      tfs.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).as(s"df$i"))
    val base = df.select(Seq(col(id), len.as("__len")) ++
      tfs.zipWithIndex.map { case (tf, i) => tf.as(s"__tf$i") }: _*)
    val stats = base.agg(statAggs.head, statAggs.tail: _*).head()
    val n = stats.getLong(0)
    val sumLen = stats.getLong(1)
    require(n > 0, "empty corpus")
    val avglen = sumLen.toDouble / n.toDouble
    val score = terms.indices.map { i =>
      val dfT = stats.getLong(2 + i)
      val idf = (n - dfT + 0.5) / (dfT + 0.5)
      val tf = col(s"__tf$i").cast("double")
      lit(idf) * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("__len").cast("double") / lit(avglen)))
    }.reduce(_ + _)
    base.select(col(id), score.as("score"), col("__len").as("n_tokens"))
      .where(col("score") > 0)
  }

  /** The capped (lang, tri, n3) trigram-count model behind
    * [[trigramLmScore]], as a frame (exposed so specs can assert the
    * bound and scale runs can measure the cap pass): map-side partial
    * counts → min-count filter on the same aggregate → top-M per lang
    * by (n3 DESC, tri ASC). Input: (lang, norm) — already-normalized
    * text.
    *
    * The top-M itself is a TWO-LEVEL selection so the cap's own
    * motivating case (CJK: distinct trigrams ∝ corpus) never funnels a
    * language's whole distinct-trigram set through one sort task:
    * first top-M per (lang, murmur3(tri) mod S) — each shard sorts
    * 1/S of the language — then the exact top-M over the ≤ S·M
    * survivors. The pre-prune is lossless: any row in the global top-M
    * has < M global predecessors in the (n3 DESC, tri ASC) order, so
    * < M predecessors within its own shard, so it survives the shard
    * round (wide-alphabet spec pins two-level == single-window). */
  def trigramModel(normed: org.apache.spark.sql.DataFrame,
      minCount: Long, maxTrigramsPerLang: Int):
      org.apache.spark.sql.DataFrame = {
    require(minCount >= 1 && maxTrigramsPerLang >= 1,
      s"minCount=$minCount, maxTrigramsPerLang=$maxTrigramsPerLang")
    val spark = normed.sparkSession
    import spark.implicits._
    val shards = 32
    val counts = normed.as[(String, String)]
      .flatMap { case (lg, norm) => triGrams(norm).map(t => (lg, t)) }
      .toDF("lang", "tri")
      .groupBy("lang", "tri").count()
      .where(col("count") >= minCount)
    val wShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), pmod(hash(col("tri")), lit(shards)))
      .orderBy(col("count").desc, col("tri"))
    val pruned = counts.withColumn("__rs", row_number().over(wShard))
      .where(col("__rs") <= maxTrigramsPerLang).drop("__rs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("count").desc, col("tri"))
    pruned.withColumn("__r", row_number().over(w))
      .where(col("__r") <= maxTrigramsPerLang)
      .select(col("lang"), col("tri"), col("count").as("n3"))
  }

  /** Cluster labeling — the "what is in my clusters" report a corpus
    * map needs after any cell-quantized family (SemDeDup cells, the
    * q119 diversity sampler, the q134 kNN graph): documents vectorize
    * through the [[hashingVectorize]] bridge, assign to cells through
    * the no-driver-growth distributed quantizer
    * ([[graft.ext.Similarity.seededCentroids]] +
    * [[graft.ext.Similarity.ivfIndexDistributed]]), and each cell
    * reports its size and its top-`k` terms by raw frequency
    * (count DESC, term ASC — the engine-independent tiebreak).
    *
    * Scale shape: assignment is the measured q114/q127 chain; the
    * assignment joins to the documents at DOC level (doc-sized rows)
    * and tokens explode AFTER the join, map-side, directly into the
    * partial-agg'd (cell, term) aggregate — so corpus POSITIONS cross
    * the wire exactly once (the q124 cost family; exploding before
    * the join would pay the positions exchange twice, measured 3× the
    * wall at 100×). The top-k window partitions on the CELL key: cells
    * are occupancy-bounded by seeding design (E[occupancy] =
    * targetOccupancy), so no partition outgrows ~occupancy · doclen
    * distinct terms — this is the one window in the family whose
    * partition count GROWS with the corpus while partition SIZE stays
    * flat, the shape a window wants.
    *
    * Output: (cell, n_docs, rank 1..k, term, term_count); zero-vector
    * docs (no cosine geometry, unassignable) are excluded. */
  def clusterTopTerms(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, dim: Int, k: Int, targetOccupancy: Int = 64,
      probes: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val vec = hashingVectorize(df, id, text, dim)
    val cent = Similarity.seededCentroids(vec, id, "vec", dim,
      1.0 / targetOccupancy)
    val asg = Similarity.ivfIndexDistributed(vec, cent, id, "vec", dim,
        probes)
      .where(col("norm") > 0)
      .select(col("cell"), col(id))
    val sz = asg.groupBy(col("cell")).agg(count(lit(1)).as("n_docs"))
    val wc = df.select(col(id), col(text))
      .join(asg, id)
      .select(col("cell"), explode(words(col(text))).as("term"))
      .groupBy(col("cell"), col("term"))
      .agg(count(lit(1)).as("term_count"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"))
      .orderBy(col("term_count").desc, col("term"))
    wc.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .join(sz, "cell")
      .select(col("cell"), col("n_docs"), col("rank"), col("term"),
        col("term_count"))
  }

  /** Vocabulary spectrum — the rank-frequency head a tokenizer/vocab
    * budget is planned against (the Zipf table, reported as exact
    * integers rather than a log-log fit whose ln() would break
    * cross-engine bit-exactness): the corpus's top-`topN` words with
    * rank, count, and cumulative token-mass fraction.
    *
    * Scale shape: ONE partial-agg'd word-count exchange (the q123
    * vocabulary pass) + a bounded TakeOrdered for the head + a 1-row
    * total; the cumulative sum windows over the `topN` selected rows
    * only (a driver-bounded single partition of ≤ topN rows — NOT a
    * corpus sort). Counts integer-exact; the fraction is one IEEE
    * divide per row.
    *
    * Output: (rank 1..topN, term, n, cum_frac), rank by
    * (n DESC, term ASC). */
  def vocabSpectrum(df: org.apache.spark.sql.DataFrame, text: String,
      topN: Int): org.apache.spark.sql.DataFrame = {
    require(topN >= 1, s"topN=$topN must be >= 1")
    val wc = df.select(explode(words(col(text))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = wc.agg(sum(col("n")).as("__total"))
    val top = wc.orderBy(col("n").desc, col("term")).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("term"))).cast("long"))
      .withColumn("cum_frac",
        sum(col("n")).over(w).cast("double") /
          col("__total").cast("double"))
      .select(col("rank"), col("term"), col("n"), col("cum_frac"))
  }

  /** Shared co-occurrence mine behind [[collocations]] (window = 1)
    * and [[skipgramPmi]] (window = w): ONE tokenization pass through a
    * typed per-partition combining kernel that counts unigram
    * instances (w, null) and ordered within-window pairs (w, w') in
    * the same local hash map — the manual map-side combine, so the
    * exchange input is partition-vocabulary-sized, never
    * token-instance-sized, and the encoder boundary carries counts
    * instead of instances. The map flushes at `FlushCap` entries (a
    * pathological partition streams partial counts instead of growing
    * the heap; the final groupBy re-sums), and the merged count frame
    * is [[graft.ext.Dedup.materialize]]d AFTER the minCount floor
    * (unigram rows all kept) so the unigram legs, the pair leg, and
    * the N = Σc reduction all read vocab-sized blocks — the corpus is
    * touched exactly once, and N never costs an eager third scan
    * (the q155/q156 playbook; the round-13 column-HOF form
    * re-tokenized the corpus three times through interpreted nested
    * `transform`/`flatten` explodes — 49.66 s at the 100× replica for
    * q158 vs the q131 corpus-positions band this shape sits in).
    *
    * Scoring is the PINNED division chain (c12/c1)·(N/c2) — two IEEE
    * divides and one multiply on exact integer counts, NO ln()
    * (pointwise mutual information is the log of this score; the log
    * is monotone, so ranking by lift IS ranking by PMI while staying
    * inside the cross-engine hash gate — the q97 odds-IDF
    * discipline). `minCount` floors c12 (rare-pair lift explodes into
    * noise — the standard PMI failure mode). N rides a broadcast
    * 1-row cross join, so the whole operator stays lazy like every
    * other entry point.
    *
    * Output: (rank, w1, w2, c12, c1, c2, lift), top `k` by
    * (lift DESC, w1, w2). */
  private[graft] def cooccurrenceLift(df: org.apache.spark.sql.DataFrame,
      text: String, window: Int, minCount: Int, k: Int,
      flushCap: Int = CooccurFlushCap): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    require(k >= 1, s"k=$k must be >= 1")
    require(flushCap >= 1, s"flushCap=$flushCap must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val local = df.where(col(text).isNotNull)
      .select(words(col(text)).as("__ws"))
      .as[Seq[String]]
      .mapPartitions { rows =>
        val cap = flushCap
        val m = new java.util.HashMap[(String, String), Long](1 << 12)
        def bump(key: (String, String)): Unit = {
          val prev = m.get(key) // missing key: null unboxes to 0L
          m.put(key, prev + 1L): Unit
        }
        def consume(ws: Seq[String]): Unit = {
          val n = if (ws == null) 0 else ws.length
          var i = 0
          while (i < n) {
            bump((ws(i), null)) // one unigram instance
            val jMax = math.min(i + window, n - 1)
            var j = i + 1
            while (j <= jMax) { bump((ws(i), ws(j))); j += 1 }
            i += 1
          }
        }
        new Iterator[(String, String, Long)] {
          private var cur: java.util.Iterator[
            java.util.Map.Entry[(String, String), Long]] = null
          private def advance(): Unit = {
            while (cur == null || !cur.hasNext) {
              if (cur != null) { m.clear(); cur = null }
              if (!rows.hasNext && m.isEmpty) return
              while (rows.hasNext && m.size < cap) consume(rows.next())
              cur = m.entrySet().iterator()
            }
          }
          def hasNext: Boolean = { advance(); cur != null && cur.hasNext }
          def next(): (String, String, Long) = {
            val e = cur.next()
            (e.getKey._1, e.getKey._2, e.getValue)
          }
        }
      }
      .toDF("w1", "w2", "cnt")
    val counts = Dedup.materialize(
      local.groupBy(col("w1"), col("w2"))
        .agg(sum(col("cnt")).as("cnt"))
        .where(col("w2").isNull || col("cnt") >= minCount))
    val uni = counts.where(col("w2").isNull)
      .select(col("w1").as("w"), col("cnt").as("c"))
    val tot = uni.agg(coalesce(sum(col("c")), lit(0L)).as("__n"))
    counts.where(col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("cnt").as("c12"))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        (col("c12").cast("double") / col("c1").cast("double")) *
          (col("__n").cast("double") / col("c2").cast("double")))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("lift").desc, col("w1"), col("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("c12"), col("c1"),
        col("c2"), col("lift"))
  }

  /** Per-partition hash-map flush cap for [[cooccurrenceLift]]'s
    * combining kernel: bounds kernel heap at ~a few hundred MB of
    * entries regardless of partition pathology (the flushed partial
    * counts re-sum in the global aggregate). */
  private val CooccurFlushCap: Int = 1 << 22

  /** PMI-style collocation mining — the multiword-expression detector
    * a tokenizer/vocab pipeline is tuned with (which adjacent pairs
    * behave as one unit: "new york", "machine learning"): every
    * adjacent token bigram scores lift = P(w1 w2) / (P(w1)·P(w2)).
    * Semantics, scoring chain, and scale shape in
    * [[cooccurrenceLift]] (this is the window = 1 instance).
    *
    * Output: (rank, w1, w2, c12, c1, c2, lift). */
  def collocations(df: org.apache.spark.sql.DataFrame, text: String,
      minCount: Int, k: Int): org.apache.spark.sql.DataFrame =
    cooccurrenceLift(df, text, window = 1, minCount, k)

  /** Windowed skip-gram co-occurrence mining — [[collocations]]
    * generalized from adjacency to the word2vec/GloVe context window:
    * every ORDERED token pair (w at i, w' at j) with 0 < j − i ≤
    * `window` counts as one co-occurrence instance, and pairs rank by
    * the same ln-free lift chain (c12/c1)·(N/c2) on exact integer
    * counts (N = token instances, the [[collocations]] convention, so
    * the two operators' scores are directly comparable). The
    * embedding-training prep step: these counts ARE the co-occurrence
    * matrix entries a GloVe fit consumes. Semantics, scoring chain,
    * and scale shape in [[cooccurrenceLift]] (the kernel emits
    * ≤ window·n pair instances per doc, combined locally before the
    * one exchange).
    *
    * Output: (rank, w1, w2, c12, c1, c2, lift). */
  def skipgramPmi(df: org.apache.spark.sql.DataFrame, text: String,
      window: Int, minCount: Int, k: Int): org.apache.spark.sql.DataFrame =
    cooccurrenceLift(df, text, window, minCount, k)

  /** Heaps-law vocabulary growth curve — the tokenizer/vocab-sizing
    * tool (how fast does the vocabulary grow as the corpus grows?
    * the curve a BPE vocab budget or a hash-vectorizer width is read
    * off): at each of `k` evenly spaced doc_id thresholds, the number
    * of documents ingested so far, the cumulative token instances,
    * and the DISTINCT vocabulary seen so far. Emitting the raw curve
    * (exact integers), not a fitted Heaps exponent — the fit needs
    * logs (outside the cross-engine hash gate) and is a driver-side
    * afterthought on k points.
    *
    * "So far" is doc_id order — the deterministic ingest order every
    * incremental operator in this repo uses. Thresholds are value
    * thresholds over [min_id, max_id] (t_j = min + ⌊j·(max−min)/k⌋),
    * NOT rank quantiles: a global doc-rank ntile would be a
    * single-partition window sort at corpus scale, while value
    * thresholds cost one 1-row min/max aggregate.
    *
    * Scale shape: one word exchange to (word, first_doc = min doc_id)
    * — vocab-sized output; one doc-level aggregate to (doc_id count,
    * token sum) per threshold via a bounded k-way explode (each row
    * joins the thresholds ≥ its doc_id: a ≤ k-fan-out map-side
    * explode, k ~ tens); the vocab frame pays the same bounded
    * explode. No window, no driver state beyond the 1-row min/max.
    *
    * Output: (checkpoint 1..k, max_doc_id, docs_cum, tokens_cum,
    * vocab_cum), ordered by checkpoint. */
  def vocabGrowth(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val ws = words(col(text))
    val base = df.where(col(text).isNotNull)
      .select(col(id).cast("long").as("__id"), size(ws).as("__n"),
        ws.as("__ws"))
    // thresholds t_1..t_k as a broadcast 1-row frame carrying the
    // array; the k-th threshold is exactly max_id so the last
    // checkpoint covers the whole corpus. MATERIALIZED: three
    // consumers reference it (both cumulatives + the checkpoint
    // spine), and an unmaterialized 1-row aggregate re-scans the
    // corpus per reference (the q156 lesson at 1-row scale).
    val bounds = base.agg(min(col("__id")).as("__lo"),
      max(col("__id")).as("__hi"))
    val thr = Dedup.materialize(
      bounds.select(transform(sequence(lit(1), lit(k)), j =>
        when(j === k, col("__hi")).otherwise(
          col("__lo") + floor((col("__hi") - col("__lo"))
            .cast("double") * j.cast("double") / lit(k.toDouble))
            .cast("long"))).as("__ts")))
    // per-checkpoint doc/token cumulatives: each doc explodes onto
    // the checkpoints whose threshold >= its id (<= k copies)
    // array_distinct: colliding thresholds (id range < k) must count
    // each doc once per distinct VALUE — the checkpoint join below
    // fans the per-value row back out to every checkpoint sharing it
    val docsCum = base.select(col("__id"), col("__n"))
      .crossJoin(broadcast(thr))
      .select(col("__id"), col("__n"),
        explode(array_distinct(
          filter(col("__ts"), t => t >= col("__id")))).as("__t"))
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("docs_cum"),
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("tokens_cum"))
    // vocabulary first-sightings: vocab-sized, same bounded explode
    val firstDoc = base
      .select(col("__id"), explode(col("__ws")).as("__w"))
      .groupBy(col("__w")).agg(min(col("__id")).as("__fd"))
    val vocabCum = firstDoc.crossJoin(broadcast(thr))
      .select(explode(array_distinct(
        filter(col("__ts"), t => t >= col("__fd")))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("vocab_cum"))
    thr.select(posexplode(col("__ts")))
      .select((col("pos") + 1).cast("long").as("checkpoint"),
        col("col").as("max_doc_id"))
      .join(docsCum, col("max_doc_id") === docsCum("__t"), "left")
      .drop("__t")
      .join(vocabCum, col("max_doc_id") === vocabCum("__t"), "left")
      .drop("__t")
      .select(col("checkpoint"), col("max_doc_id"),
        coalesce(col("docs_cum"), lit(0L)).as("docs_cum"),
        coalesce(col("tokens_cum"), lit(0L)).as("tokens_cum"),
        coalesce(col("vocab_cum"), lit(0L)).as("vocab_cum"))
      .orderBy(col("checkpoint"))
  }

  /** Within-document chunk self-dedup — the intra-doc counterpart of
    * [[graft.ext.Dedup.boilerplateChunkRemoval]] (scraped pages repeat
    * their own nav blocks / list items; machine-generated text loops):
    * the document is segmented into non-overlapping `size`-token
    * chunks, every repeat of an earlier chunk IN THE SAME DOCUMENT is
    * dropped (first occurrence wins — order-deterministic, no
    * tie-break), and the survivors rejoin in order.
    *
    * Scale shape: per-row work, shuffle-free at any corpus size —
    * tokenization stays in Catalyst ([[words]], identical to the SQL
    * oracle), and chunk assembly + the first-occurrence filter run in
    * ONE typed kernel over a hash set: O(c) per document (c = chunk
    * count). The round-12 `array_position`-HOF form was O(c²); the
    * round-13 kernel kept chunk ASSEMBLY in an interpreted
    * `sequence`/`slice`/`array_join` HOF, which the 1000× decade
    * exposed as the dominant cost (72.9 s over 5 M docs) — moving
    * assembly into the kernel raced 72.9 → 5.9 s at 1000× and
    * 5.18 → 0.92 s at 100×, same session (1× stays at the
    * sub-second floor: no small-scale regression).
    * Hash-gate outputs unchanged; parity-pinned against a driver
    * replay of the keep-first rule. All arithmetic integer/string:
    * cross-engine hash-exact.
    *
    * Output: (id, n_chunks, kept_chunks, clean_text); null-text and
    * token-less docs emit nothing (the [[chunkTokens]] contract). */
  def selfDedupChunks(df: org.apache.spark.sql.DataFrame, id: String,
      text: String, size: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0, s"size=$size must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val ws = words(col(text))
    val sz = org.apache.spark.sql.functions.size _
    df.where(col(text).isNotNull)
      .select(col(id).cast("long"), ws.as("__ws"))
      .where(sz(col("__ws")) > 0)
      .as[(Long, Seq[String])]
      .map { case (docId, wsArr) =>
        val n = wsArr.length
        val seen = new java.util.HashSet[String]()
        val kept = new java.lang.StringBuilder()
        var nChunks = 0L
        var keptN = 0L
        var s = 0
        while (s < n) {
          val e = math.min(s + size, n)
          val sb = new java.lang.StringBuilder()
          var q = s
          while (q < e) {
            if (q > s) sb.append(' ')
            sb.append(wsArr(q))
            q += 1
          }
          val chunk = sb.toString
          nChunks += 1
          if (seen.add(chunk)) {
            keptN += 1
            if (kept.length > 0) kept.append(' ')
            kept.append(chunk): Unit
          }
          s += size
        }
        (docId, nChunks, keptN, kept.toString)
      }
      .toDF(id, "n_chunks", "kept_chunks", "clean_text")
  }
}
