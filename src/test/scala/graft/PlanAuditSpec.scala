package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression gates for the scale-critical queries: these
  * assert the plan SHAPE (pushdown, pruning, exchange reuse, partitioned
  * windows, kernel placement), not timings — the properties that decide
  * whether a query survives a 100× scale-up. Each one was verified by
  * hand with `.explain("formatted")` first; the spec pins it against
  * regressions.
  */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Exchange partitioning lines of a FORMATTED plan (the operator tree
    * prints bare "(n) Exchange"; the partitioning lives on the details
    * section's Arguments line — a regex over "Exchange hashpartitioning"
    * matches NOTHING in this mode, a round-10 vacuous-assert lesson). */
  private def hashExchanges(p: String): Seq[String] =
    p.linesIterator.filter(_.contains("hashpartitioning")).toSeq

  test("q01: column pruning reaches the lineitem scan") {
    val p = plan("q01_tpch_q1")
    // the scan reads only the 6 referenced columns of lineitem's 16
    val readSchema = p.linesIterator
      .find(_.trim.startsWith("ReadSchema:")).get
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_comment"), readSchema)
    assert(readSchema.contains("l_returnflag") &&
      readSchema.contains("l_quantity"), readSchema)
  }

  test("q27: banded self-join reuses one exchange, no operator cache") {
    // both sides of the band equi-join are the identical subplan; the
    // shuffle materializes once (round-2 persist() leak replaced by
    // exchange reuse). AQE resolves reuse at runtime, and tiny inputs
    // would take the broadcast path (where reuse is moot), so execute
    // with broadcast off and audit the final adaptive plan.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q27_minhash_lsh")(spark, dir)
      // collect() (not count(), which plans a different query) so THIS
      // frame's adaptive plan finalizes and the reuse is visible
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("ReusedExchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("q26/q94: shingle assembly materializes once — final plan reads only checkpoint blocks") {
    // Round-9 watch item: the corpus-linear shingle kernel fed BOTH
    // verify-join legs un-materialized, so the assembly ran twice
    // (7-8x at the 100x replica). candidateShingleJoin now checkpoints
    // the candidate set and the (semi-joined, candidate-sized) shingle
    // frame; the query's own plan must therefore contain NO parquet
    // scan and NO MapPartitions kernel — all corpus work already ran,
    // exactly once, behind the two checkpoints.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      for (q <- Seq("q26_shingle_jaccard", "q94_shingle_containment")) {
        val p = plan(q)
        assert(!p.contains("Scan parquet"), s"$q re-scans the corpus:\n" +
          p.linesIterator.filter(_.contains("Scan")).mkString("\n"))
        // operator node only — the checkpoint scan's RDD label is a
        // "MapPartitionsRDD[n] at localCheckpoint", which is the
        // materialized artifact, not a live kernel
        assert("""\(\d+\) MapPartitions[^R]""".r.findFirstIn(p).isEmpty,
          s"$q re-runs the shingle kernel per leg")
        assert(p.contains("ExistingRDD"), s"$q: no checkpoint scan found")
      }
    } finally {
      // the materialized blocks live as long as the frames; this test
      // drops them — free the blocks so the suite's cache stays empty
      spark.sparkContext.getPersistentRDDs.collect {
        case (id, rdd) if !before(id) => rdd.unpersist(blocking = false)
      }
    }
  }

  test("q99: one cell shuffle into the grouped pair kernel — no join, no second assignment pass") {
    // each vector crosses the wire once: the plan is assignment kernel
    // → ONE hash exchange on the cell key → grouped pair/cosine kernel
    // (plus the final orderBy's range partition). Any join node (or a
    // second hash exchange) means the self-join shape — which
    // materializes both vectors into every candidate row — crept back.
    val p = plan("q99_semantic_dedup")
    val parts = p.linesIterator
      .filter(_.contains("partitioning")).toSeq
    assert(parts.count(_.contains("hashpartitioning")) == 1,
      parts.mkString("\n"))
    assert(!p.contains("Join"), "q99 pair stage regressed to a join")
    assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
      p.take(1500))
  }

  test("q101: bucketed co-located join plans no shuffle exchange") {
    // both tables were written bucketBy(16, doc_id): the per-document
    // join must consume the bucketing (SortMergeJoin, zero
    // hash-partitioning exchanges anywhere below the final orderBy's
    // range partition). Broadcast off so the bucket path is what runs.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q101_bucketed_join")
      assert(p.contains("SortMergeJoin"), p.take(1500))
      val hashEx = hashExchanges(p)
      assert(hashEx.isEmpty,
        s"bucketed join re-shuffled:\n${hashEx.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q104: bucketed aggregation + join plan no shuffle exchange") {
    // the chunk fact table is bucketed on doc_id: its groupBy(doc_id)
    // consumes the scan's hash-clustered bucketing (no exchange, no
    // partial/final agg split needed for correctness of THIS assert),
    // and the per-doc result SortMergeJoins the bucketed quality table
    // without re-shuffling either side.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q104_bucketed_agg")
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(p.contains("HashAggregate"), p.take(1500))
      val hashEx = hashExchanges(p)
      assert(hashEx.isEmpty,
        s"bucketed aggregation re-shuffled:\n${hashEx.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Distinct hash-partitioning exchanges of an EXECUTED adaptive plan:
    * plan_id-deduped so a ReusedExchange (which prints the original's
    * plan_id) never double-counts. */
  /** FINAL adaptive plan text only: executedPlan.toString appends the
    * pre-AQE shape under "== Initial Plan ==", which would double
    * every operator count. */
  private def finalPlanText(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  private def executedHashExchanges(planText: String): Set[String] =
    """Exchange hashpartitioning[^\[]*\[plan_id=(\d+)\]""".r
      .findAllMatchIn(planText).map(_.group(1)).toSet

  test("q105: two fold-level exchanges, corpus scored through a broadcast join") {
    val df = SparkEntry.queries("q105_prototype_scores")(spark, dir)
    val p = finalPlanText(df)
    val ex = executedHashExchanges(p)
    // exactly the two groupByKey levels (id-block partials, per-label
    // fold); the #labels centroid side broadcasts, so the corpus is
    // NEVER hash-exchanged for scoring
    assert(ex.size == 2, s"expected 2 fold exchanges, got $ex")
    assert(p.contains("BroadcastHashJoin"), "centroid join must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus re-shuffled for scoring")
  }

  test("q103: one cogroup on the cell key, no join operators") {
    val df = SparkEntry.queries("q103_incr_semdedup")(spark, dir)
    val p = finalPlanText(df)
    val ex = executedHashExchanges(p)
    // each side of the batch-vs-index mine crosses the wire once, into
    // the pair kernel — never through a row-multiplying join
    assert(p.contains("CoGroup"), "pair kernel missing")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "cell mine must not plan a join")
    assert(ex.size == 2, s"expected 2 cell exchanges, got $ex")
  }

  test("q102: the dense grid generates once and never shuffles") {
    val df = SparkEntry.queries("q102_seasonal_gapfill")(spark, dir)
    val p = finalPlanText(df)
    val ex = executedHashExchanges(p)
    // grid = two-level chunked explode (2 Generate nodes) + the
    // period-position explode (1): if the profile ever reads the dense
    // frame again (the first-cut 6x shape) the grid Generates double
    val gens = p.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(gens.size == 3,
      s"expected 3 Generate nodes, got ${gens.size}:\n${gens.mkString("\n")}")
    // observed-side aggregates only: series distinct (reused), the
    // bucket-count agg once per branch (the profile branch's scan
    // carries an extra pushed isnotnull(pmod(...)) filter from the
    // inner pos-join, so the two count exchanges don't canonicalize
    // equal), and the per-position sums — all OBSERVED-sized; the
    // grid-sized frame reaches no exchange (both its joins broadcast)
    assert(ex.size <= 4, s"expected <=4 hash exchanges, got $ex:\n" +
      p.linesIterator.filter(_.contains("hashpartitioning"))
        .mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), "grid joins must broadcast " +
      "at test scale (AQE measured size)")
  }

  test("q16: normalization aggregates map-side before the shuffle") {
    val p = plan("q16_pdp_normalize")
    // bounded explode fan-out, then partial_sum under the exchange and
    // the final agg above it — one shuffle for the whole rollup
    assert(p.contains("partial_sum"), p.take(2000))
    assert(hashExchanges(p).size <= 2, hashExchanges(p).mkString("\n"))
  }

  test("store build caches nothing grid-sized and releases its cache") {
    import graft.model._
    import org.apache.spark.sql.functions.col
    // Round-3 regression: update() persisted the PDP frame — grid-sized
    // (samples × gap/step), ~5 GB at sf0.1 — which overflowed the block
    // store and evicted every other cached block in the session. The
    // build may only cache the SAMPLE-sized rated frame, and must
    // release it before returning.
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val path = java.nio.file.Files.createTempDirectory("graft_audit").toString
    store.RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100L),
        RraDef(Cf.Max, 0.5, 6L, 50L))))
    val samples = (1 to 40).map(i => ("s1", i * 10000000L, i.toLong, 2.5))
      .toDF("k", "ts_us", "id", "v")
    store.RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    store.RrdStore.appendBatch(spark, path,
      samples.withColumn("ts_us", col("ts_us") + 400000000L),
      Seq("k"), "ts_us", "ts_us", Map("v" -> "v"), rateScale = Some(2))
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "store build left cached RDDs behind")
  }

  test("q29/q44: ANN corpus pass is a typed kernel, top-k is the only wide exchange") {
    for (q <- Seq("q29_ann_bruteforce", "q44_ann_ivf")) {
      val p = plan(q)
      // the dot-product work sits in a DeserializeToObject/MapPartitions
      // island (compiled JVM loop), not interpreted HOF expressions
      assert(p.contains("MapPartitions"), s"$q: ${p.take(1500)}")
      assert(!p.contains("aggregate(sequence"), s"$q leaks the HOF fold")
    }
  }

  test("q28: pair dedup rides the join — no aggregate over candidates") {
    // the round-3 plan ended in distinct() — a full shuffle of the
    // candidate pair set, the widest data in the query at scale. The
    // first-surviving-shared-band filter replaced it: after the band
    // join there must be NO aggregate/exchange at all.
    val df = SparkEntry.queries("q28_simhash")(spark, dir)
    val p = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    val joinAt = p.indexOf("SortMergeJoin")
    val hashJoinAt = p.indexOf("ShuffledHashJoin")
    val bcastAt = p.indexOf("BroadcastHashJoin")
    val at = Seq(joinAt, hashJoinAt, bcastAt).filter(_ >= 0)
    assert(at.nonEmpty, p.take(1500))
    // in `formatted` mode operators print leaves-first, so everything
    // BEFORE the join line in the operator tree section is downstream
    // of nothing — instead assert globally: exactly zero HashAggregates
    // whose keys are the pair ids
    assert(!p.contains("Keys: [id1"), "pair-level aggregate is back:\n" +
      p.linesIterator.filter(_.contains("Keys")).mkString("\n"))
  }

  test("q53: distributed update parsing is shuffle-free") {
    val p = plan("q53_update_parse")
    // pure split/cast projections over the scan; the only exchange
    // allowed is the final output ordering's range partition
    assert(hashExchanges(p).isEmpty, hashExchanges(p).mkString("\n"))
  }

  test("no query plans a CartesianProduct") {
    // The one join shape that cannot survive scale: both sides
    // non-broadcast, no key — cost |L|·|R|. Scalar cross joins (VDEF
    // constants, range rows) legitimately appear as
    // BroadcastNestedLoopJoin with a 1-row broadcast side, which this
    // deliberately does NOT flag. Swept over every registered query's
    // RETURNED plan — queries that materialize internally (q43's
    // checkpointed CC rounds, the store builders) expose only their
    // final scan here; their internal join shapes are pinned by the
    // operator specs instead (SimilaritySpec, StoreStreamingSpec).
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val p = fn(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }

  test("q92: global top-20 is TakeOrderedAndProject, not a full sort") {
    val p = plan("q92_keyword_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    // no sort-shuffle: the only acceptable exchange under the take is
    // the single-partition gather TakeOrderedAndProject itself performs
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q151/q155: the typed per-row kernels plan NO hash exchange " +
      "(shuffle-free until the final orderBy)") {
    // randomProjection and winnowFingerprints are per-row maps by
    // construction: any hashpartitioning below the output orderBy
    // means a shuffle crept into a scan-bound operator
    for (q <- Seq("q151_random_projection", "q155_winnow_fingerprints")) {
      val p = plan(q)
      val hashEx = hashExchanges(p)
      assert(hashEx.isEmpty, s"$q shuffled:\n${hashEx.mkString("\n")}")
    }
  }

  test("q153: quality-canonical dedup is bounded aggregates on one " +
      "digest key — no window sort over dup groups") {
    val p = plan("q153_canonical_quality")
    // the argmax must be the TopK typed aggregate (partial-agg'd, at
    // most 1 row per (digest, map task)), never a row_number window
    // funneling dup groups through sorted partitions
    assert(!p.toLowerCase.contains("windowspecdefinition"),
      "q153 regressed to a window argmax")
    assert(p.contains("Aggregate"), p.take(1200))
    // every exchange keys on the digest — either the named `fp` column
    // (count/join side) or the groupByKey extractor's `value` (the
    // typed aggregate's key IS the fp string); nothing corpus-keyed
    val hashEx = hashExchanges(p)
    assert(hashEx.nonEmpty &&
      hashEx.forall(l => l.contains("fp") || l.contains("value#")),
      hashEx.mkString("\n"))
  }

  test("q07: planner CDEF windows are partitioned by the series key") {
    val p = plan("q07_cdef_rpn")
    // round-2 flag: Window.orderBy without partitionBy serializes the
    // frame through one task; the planner now threads series keys
    val windows = p.linesIterator.filter(_.contains("Window"))
      .mkString("\n")
    assert(!p.contains("WindowGroupLimit: No Partition"), windows)
    val unpartitioned =
      "windowspecdefinition\\(ts".r.findAllIn(p.toLowerCase).toSeq
    assert(unpartitioned.isEmpty,
      s"unpartitioned window spec in q07:\n$windows")
  }
}
