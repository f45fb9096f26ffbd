package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

/** OOV-rate report and TF-IDF keyword extraction: closed-form cases,
  * the vocabulary tiebreak at the size boundary, kernel-vs-column
  * parity, and the distinct-doc DF contract.
  */
class KeywordOovSpec extends SparkSuite {
  import spark.implicits._

  test("oov rate: closed-form with a known vocabulary") {
    val docs = Seq(
      (1L, "en", "a a b c"), // a,b in vocab2 -> oov = 1 (c)
      (2L, "en", "a b"), // all in vocab -> 0
      (3L, "fr", "x y z")) // none -> 3
      .toDF("doc_id", "lang", "text")
    // counts: a=3, b=2, c=1, x=1, y=1, z=1 -> top-2 = {a, b}
    val got = TextAnalysis.oovRateReport(docs, "doc_id", "lang",
        "text", vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "en", 4L, 1L, 0.25),
      (2L, "en", 2L, 0L, 0.0),
      (3L, "fr", 3L, 3L, 1.0)))
  }

  test("oov vocabulary boundary breaks ties by word ascending") {
    // b and c tie at count 1; vocabSize 2 with a(2) -> {a, b} not {a, c}
    val docs = Seq((1L, "en", "a a b c")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.oovRateReport(docs, "doc_id", "lang",
        "text", vocabSize = 2)
      .as[(Long, String, Long, Long, Double)].head()
    assert(got == ((1L, "en", 4L, 1L, 0.25))) // only c is OOV
  }

  test("oov kernel equals the column form on the corpus") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.oovRateReport(docs, "doc_id", "lang",
        "text", vocabSize = 16)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    // column-form reference with the same deterministic vocabulary
    val vocab = docs
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(16)
      .select("w").as[String].collect().toSeq
    val ws = TextAnalysis.words(col("text"))
    val ref = docs.select(col("doc_id"), col("lang"),
        size(ws).cast("long").as("n"),
        size(filter(ws, w => !w.isin(vocab: _*))).cast("long").as("oov"))
      .select(col("doc_id"), col("lang"), col("n"), col("oov"),
        (col("oov").cast("double") / col("n").cast("double")).as("f"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got == ref)
  }

  test("tf-idf: closed-form scores, distinct-doc df, tie by term") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "c c d")).toDF("doc_id", "text")
    // N=3; df: a=2, b=1, c=2, d=1
    // idf(a) = (3-2+0.5)/(2+0.5) = 1.5/2.5 = 0.6 ; idf(b) = 2.5/1.5
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    val idfA = (3.0 - 2.0 + 0.5) / (2.0 + 0.5)
    val idfB = (3.0 - 1.0 + 0.5) / (1.0 + 0.5)
    // doc 1: b -> 1*idfB ≈ 1.667 beats a -> 2*idfA = 1.2
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)) ==
      Seq((1L, "b", 1L), (2L, "a", 2L)))
    assert(got.find(r => r._1 == 1L && r._3 == "a").get._5 == 2.0 * idfA)
    assert(got.find(r => r._1 == 1L && r._3 == "b").get._5 == 1.0 * idfB)
    // doc 2: a and c both tf=1, df=2 -> equal scores; tie breaks to "a"
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._3)) ==
      Seq((1L, "a"), (2L, "c")))
    // doc 3: d (rare) outranks c despite tf 1 vs 2
    assert(got.filter(_._1 == 3L).head._3 == "d")
  }

  test("hashing vectorizer kernel equals the column-form md5 rules") {
    val docs = Tables.documents(spark, sf)
    val dim = 16
    val got = TextAnalysis.hashingVectorize(docs, "doc_id", "text",
        dim, l2Normalize = false)
      .select(col("doc_id"), posexplode(col("vec")))
      .select(col("doc_id"), col("pos"), col("col"))
      .where(col("col") =!= 0.0)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Double)].collect().toSeq
    // independent column-form reference: Spark SQL md5/conv expressions
    val w = col("w")
    val ref = docs
      .select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .select(col("doc_id"),
        (conv(substring(md5(w), 1, 15), 16, 10).cast("long") % dim)
          .cast("int").as("pos"),
        when(substring(md5(w), 16, 1) >= "8", 1.0).otherwise(-1.0)
          .as("s"))
      .groupBy("doc_id", "pos").agg(sum("s").as("v"))
      .where(col("v") =!= 0.0)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got == ref)
  }

  test("collocations: closed-form lifts, the pinned division chain, " +
      "minCount floor, (lift DESC, w1, w2) head") {
    // tokens: "a b" ×3 (c12=3), "a c" ×3, plus "b a" once and a
    // 1-token doc (no bigrams). N = 15 token instances.
    val docs = Seq(
      (1L, "a b a c"),   // bigrams: ab, ba, ac
      (2L, "a b a c"),
      (3L, "a b a c"),
      (4L, "x"),         // 1 token: no bigrams, counts toward N
      (5L, "q q"))       // qq below minCount=3
      .toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 3,
        k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    // counts: a=6, b=3, c=3, x=1, q=2 -> N=15
    // ab: c12=3 c1=6 c2=3 lift=(3/6)*(15/3)=2.5
    // ac: c12=3 c1=6 c2=3 lift=2.5
    // ba: c12=3 c1=3 c2=6 lift=(3/3)*(15/6)=2.5
    // three-way lift tie -> (w1, w2) ascending breaks it
    assert(got == Seq(
      (1L, "a", "b", 3L, 6L, 3L, 2.5),
      (2L, "a", "c", 3L, 6L, 3L, 2.5),
      (3L, "b", "a", 3L, 3L, 6L, 2.5)))
  }

  test("skipgramPmi: window membership closed-form — adjacency at " +
      "window=1 equals collocations; distance <= window pairs only") {
    // "a b c d": window=2 ordered pairs = ab ac bc bd cd
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.skipgramPmi(docs, "text", window = 2,
        minCount = 3, k = 100)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._2, r._3) -> r._4).toMap
    assert(got2.keySet == Set(("a", "b"), ("a", "c"), ("b", "c"),
      ("b", "d"), ("c", "d")), "window=2 pair set")
    assert(got2.values.forall(_ == 3L))
    // window=1 degenerates to the collocations pair set exactly
    val sk1 = TextAnalysis.skipgramPmi(docs, "text", window = 1,
        minCount = 3, k = 100)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    val coll = TextAnalysis.collocations(docs, "text", minCount = 3,
        k = 100)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    assert(sk1 == coll)
  }

  test("cooccurrence kernel equals the column-HOF form on the corpus " +
      "(window=1 and window=3), including lift doubles bit-exact") {
    val docs = Tables.documents(spark, sf)
    // round-13 column form: nested transform pair explode + unigram
    // explode + eager N — kept here as the independent reference
    def columnForm(window: Int, minCount: Int, k: Int) = {
      val ws = TextAnalysis.words(col("text"))
      val n = size(ws)
      val pairs = flatten(transform(sequence(lit(1), n - 1), i =>
        transform(sequence(i + 1, least(i + window, n)), j =>
          struct(element_at(ws, i).as("w1"),
            element_at(ws, j).as("w2")))))
      val bg = docs
        .select(explode(when(n >= 2, pairs)
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
      val pairC = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
        .where(col("c12") >= minCount)
      val uni = docs.select(explode(ws).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val nTok = docs.agg(coalesce(sum(size(ws)), lit(0L)).as("n"))
        .first().getLong(0)
      pairC
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
        .withColumn("lift",
          (col("c12").cast("double") / col("c1").cast("double")) *
            (lit(nTok).cast("double") / col("c2").cast("double")))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(k)
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          col("c2"), col("lift"))
        .as[(String, String, Long, Long, Long, Double)]
        .collect().toSeq
    }
    def kernelForm(df: org.apache.spark.sql.DataFrame, window: Int,
        minCount: Int, k: Int) =
      (if (window == 1)
        TextAnalysis.collocations(df, "text", minCount, k)
      else TextAnalysis.skipgramPmi(df, "text", window, minCount, k))
        .select("w1", "w2", "c12", "c1", "c2", "lift")
        .as[(String, String, Long, Long, Long, Double)]
        .collect().toSeq
    assert(kernelForm(docs, 1, 3, 40) == columnForm(1, 3, 40),
      "window=1 (collocations)")
    assert(kernelForm(docs, 3, 5, 40) == columnForm(3, 5, 40),
      "window=3 (skipgramPmi)")
    // a flush cap small enough to force mid-partition drains re-sums
    // to the identical frame (the partial-count merge contract)
    val flushed = TextAnalysis.cooccurrenceLift(docs, "text",
        window = 3, minCount = 5, k = 40, flushCap = 7)
      .select("w1", "w2", "c12", "c1", "c2", "lift")
      .as[(String, String, Long, Long, Long, Double)]
      .collect().toSeq
    assert(flushed == columnForm(3, 5, 40), "flushCap=7 drain path")
  }

  test("vocabGrowth: closed-form curve at value thresholds; colliding " +
      "thresholds count once per value; null text excluded") {
    // ids 0..4, vocab arrives as: d0 {a,b}, d1 {a}, d2 {c}, d3 {},
    // d4(null) excluded, d5 {a,d}
    val docs = Seq(
      (0L, "a b"), (1L, "a"), (2L, "c"), (3L, "b b"),
      (4L, null.asInstanceOf[String]), (5L, "a d"))
      .toDF("doc_id", "text")
    // lo=0, hi=5, k=5: t_j = floor(5j/5) = 1,2,3,4,5
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 3L, 2L),   // d0,d1: 3 tokens, vocab {a,b}
      (2L, 2L, 3L, 4L, 3L),   // +d2: {a,b,c}
      (3L, 3L, 4L, 6L, 3L),   // +d3 (b b): vocab unchanged
      (4L, 4L, 4L, 6L, 3L),   // d4 null: nothing arrives
      (5L, 5L, 5L, 8L, 4L)))  // +d5: {a,b,c,d}
    // id range smaller than k: thresholds collide; every checkpoint
    // still reports the exact per-VALUE cumulative (the
    // array_distinct pin — a naive explode would double-count)
    val tiny = Seq((0L, "x"), (1L, "y"), (2L, "x z"))
      .toDF("doc_id", "text")
    val got10 = TextAnalysis.vocabGrowth(tiny, "doc_id", "text", k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // t_j = floor(2j/10) = 0,0,0,1,1,1,1,1,1 then hi=2
    val byT = Map(0L -> ((1L, 1L, 1L)), 1L -> ((2L, 2L, 2L)),
      2L -> ((3L, 4L, 3L)))
    assert(got10 == (1 to 10).map { j =>
      val t = if (j == 10) 2L else (2L * j / 10)
      val (d, tok, v) = byT(t)
      (j.toLong, t, d, tok, v)
    })
  }

  test("vocabGrowth: an all-null corpus degenerates to k zero-count " +
      "checkpoints (null thresholds), never an error") {
    val docs = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", k = 3)
      .as[(Long, Option[Long], Long, Long, Long)].collect().toSeq
    assert(got == (1 to 3).map(j => (j.toLong, None, 0L, 0L, 0L)))
  }

  test("vectorizers: NULL text yields the zero vector (the oracle's " +
      "row), never an NPE") {
    val docs = Seq((1L, "a b"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val h = TextAnalysis.hashingVectorize(docs, "doc_id", "text", 8)
      .as[(Long, Seq[Double])].collect().toMap
    assert(h(2L).forall(_ == 0.0) && h(2L).length == 8)
    assert(h(1L).exists(_ != 0.0))
    val w = TextAnalysis.idfHashingVectorize(docs, "doc_id", "text", 8,
        vocabSize = 4)
      .as[(Long, Seq[Double])].collect().toMap
    assert(w(2L).forall(_ == 0.0) && w(2L).length == 8)
    assert(w(1L).exists(_ != 0.0))
  }

  test("hashing vectorizer: multiplicity, L2 law, zero-vector rule") {
    val docs = Seq((1L, "x x x"), (2L, "y")).toDF("doc_id", "text")
    val raw = TextAnalysis.hashingVectorize(docs, "doc_id", "text", 8,
        l2Normalize = false)
      .as[(Long, Seq[Double])].collect().toMap
    // one token thrice -> a single bucket at ±3
    assert(raw(1L).map(math.abs).sum == 3.0)
    assert(raw(1L).count(_ != 0.0) == 1)
    val nrm = TextAnalysis.hashingVectorize(docs, "doc_id", "text", 8)
      .as[(Long, Seq[Double])].collect().toMap
    // normalized = raw / ||raw||, coordinate by coordinate
    raw.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.zip(nrm(id)).foreach { case (r, z) =>
        assert(java.lang.Double.compare(z,
          if (n == 0) r else r / n) == 0)
      }
    }
  }
}
