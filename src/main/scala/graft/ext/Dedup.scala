package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard (BASELINE.json north-star).
  *
  * Scale design:
  *   - exact dedup: one hash-groupBy on a 32-char key — minimal shuffle.
  *   - MinHash: signatures are per-row column expressions (no shuffle);
  *     LSH banding turns the quadratic near-dup search into an
  *     equi-join on band keys — candidates only, never all pairs.
  *   - all hashing is md5-based and engine-portable (lowercase hex), so
  *     the DuckDB oracle reproduces signatures bit-for-bit.
  */
object Dedup {

  /** Exact duplicate groups: canonical (min) id + member count per
    * normalized-text hash. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(text)).as("fp"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Distinct k-word shingles of the normalized text; documents shorter
    * than k words contribute their whole text as one shingle. */
  def shingles(text: Column, k: Int): Column = {
    val ws = TextAnalysis.words(text)
    val n = size(ws)
    array_distinct(
      when(n < k, array(concat_ws(" ", ws)))
        .otherwise(transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(ws, i + 1, lit(k))))))
  }

  /** MinHash signature: `h` independent permutations simulated by
    * seeded md5; signature j = min over shingles of
    * substr(md5(j || ':' || shingle), 1, 16) (lexicographic on hex —
    * portable across engines). */
  def minhashSignature(sh: Column, h: Int): Column =
    transform(sequence(lit(0), lit(h - 1)),
      j => array_min(transform(sh,
        s => substring(md5(concat(j.cast("string"), lit(":"), s)), 1, 16))))

  /** LSH band keys: split the signature into bands of `r` rows; band key
    * = md5 of the joined band slice. A shared band key ⇒ candidate pair. */
  def bandKeys(sig: Column, h: Int, r: Int): Column =
    transform(sequence(lit(0), lit(h / r - 1)),
      b => md5(concat(b.cast("string"), lit("|"),
        concat_ws(",", slice(sig, b * r + 1, lit(r))))))

  /** Candidate near-dup pairs via LSH: docs sharing ≥1 band key.
    * Output: (id1, id2, sig_agreement) with id1 < id2, distinct pairs.
    * The join shuffles on the band key — candidate-sized, not n². */
  def lshCandidates(df: DataFrame, id: String, text: String,
      k: Int = 3, h: Int = 16, r: Int = 4): DataFrame = {
    val base = df.select(col(id).as("doc_id"),
        minhashSignature(shingles(col(text), k), h).as("sig"))
    val banded = base.select(col("doc_id"), col("sig"),
        explode(bandKeys(col("sig"), h, r)).as("band"))
      .select(col("doc_id"), col("sig"), col("band"))
    val a = banded.select(col("band"), col("doc_id").as("id1"),
      col("sig").as("sig1"))
    val b = banded.select(col("band"), col("doc_id").as("id2"),
      col("sig").as("sig2"))
    a.join(b, Seq("band")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(null))), _.isNotNull))
          .cast("double") / h).as("sig_agreement"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** SimHash signature over distinct tokens, `bits` ≤ 32: bit i set iff
    * Σ_tokens (md5-hex digit i ≥ '8' ? +1 : -1) > 0. md5-derived and
    * engine-portable; hamming distance on the resulting int detects
    * near-dups. */
  def simhash(text: Column, bits: Int): Column = {
    val wd = array_distinct(TextAnalysis.words(text))
    val terms = (1 to bits).map { i =>
      val vote = aggregate(
        transform(wd, w =>
          when(substring(md5(w), i, 1) >= "8", lit(1)).otherwise(lit(-1))),
        lit(0), (acc, x) => acc + x)
      when(vote > 0, lit(1L << (i - 1))).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
