package graft

import graft.model._
import graft.store.RrdStore
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Write-side coverage: schema sidecar round-trip, materialize + fetch +
  * retention + compact, and the Structured Streaming monotonic gate. */
class StoreStreamingSpec extends SparkSuite {

  test("schema sidecar round-trips through create/readSchema") {
    val path = java.nio.file.Files.createTempDirectory("graft_store").toString
    val schema = RrdSchema(300L, 1000L,
      Seq(DsDef("a", Dst.Gauge, 600L, Some(0.0), Some(100.0)),
        DsDef("c", Dst.Compute, rpn = Some("a,2,*"))),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100L),
        RraDef(Cf.Max, 0.25, 12L, 50L)))
    RrdStore.create(path, schema)
    val back = RrdStore.readSchema(path)
    assert(back.stepSec == 300L && back.startSec == 1000L)
    assert(back.ds.map(_.name) == Seq("a", "c"))
    assert(back.ds(1).rpn.contains("a,2,*"))
    assert(back.rras == schema.rras)
  }

  test("update materializes RRAs; fetch answers from the right one") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_store").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 3600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 1000L),
        RraDef(Cf.Average, 0.5, 6L, 1000L))))
    // samples every 10s for 600s: GAUGE rate = value
    val samples = (0 to 60).map(i => ("s1", i * 10000000L, i.toLong, 5.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    // step-10 fetch: the 10s RRA covers fully and matches exactly
    val f1 = RrdStore.fetch(spark, path, Cf.Average, "v", Seq("k"),
      0L, 600L, 10L).orderBy("ts")
    val v1 = f1.select("v").as[Option[Double]].collect()
    assert(v1.length == 60)
    assert(v1.tail.forall(_.contains(5.0))) // first slot lost to rate lag
    // step-60 fetch: picks the 6-PDP RRA
    val f2 = RrdStore.fetch(spark, path, Cf.Average, "v", Seq("k"),
      0L, 600L, 60L).orderBy("ts")
    assert(f2.count() == 10)
    assert(f2.select("v").as[Option[Double]].collect().last.contains(5.0))
  }

  test("compact physically drops out-of-retention rows") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_store").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 3600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 10L)))) // retention = 100s
    val samples = (0 to 60).map(i => ("s1", i * 10000000L, i.toLong, 1.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    assert(spark.read.parquet(s"$path/rra0").count() == 60)
    RrdStore.compact(spark, path, Seq("k"))
    assert(spark.read.parquet(s"$path/rra0").count() == 10)
  }

  test("dump -> restore -> dump is a fixpoint; info and list surfaces") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_roots").toString
    val path = s"$root/store_a"
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 3600L, Some(0.0), None)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 1000L),
        RraDef(Cf.Max, 0.25, 6L, 100L))))
    val samples = (0 to 30).map(i => ("s1", i * 10000000L, i.toLong, 2.5))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    // a freshly added DS has all-unknown history — the exact case JSON
    // field-omission used to drop from the dump (round-2 ADVICE #2)
    graft.store.Modify.addDs(spark, path, DsDef("n", Dst.Gauge, 600L))

    val dumps = java.nio.file.Files.createTempDirectory("graft_dumps").toString
    val d1 = s"$dumps/dump1"
    val restored = s"$root/store_b"
    val d2 = s"$dumps/dump2"
    graft.store.Dump.dump(spark, path, d1)
    graft.store.Dump.restore(spark, d1, restored)
    graft.store.Dump.dump(spark, restored, d2)
    // fixpoint: same schema, same rows per RRA
    assert(RrdStore.readSchema(path) == RrdStore.readSchema(restored))
    Seq(0, 1).foreach { i =>
      val a = spark.read.json(s"$d1/rra$i").orderBy("ts").collect().toSeq
      val b = spark.read.json(s"$d2/rra$i").orderBy("ts").collect().toSeq
      assert(a == b, s"rra$i dump mismatch")
    }
    // fetch from the restored store answers identically
    val fa = RrdStore.fetch(spark, path, Cf.Average, "v", Seq("k"),
      0L, 300L, 10L).orderBy("ts").collect().toSeq
    val fb = RrdStore.fetch(spark, restored, Cf.Average, "v", Seq("k"),
      0L, 300L, 10L).orderBy("ts").collect().toSeq
    assert(fa == fb)
    // the all-null DS survives the round trip as nulls (data-level)
    val fn = RrdStore.fetch(spark, restored, Cf.Average, "n", Seq("k"),
      0L, 300L, 10L)
    assert(fn.count() == 30 &&
      fn.where(org.apache.spark.sql.functions.col("n").isNotNull).count() == 0)
    // info keys
    val inf = graft.store.Dump.info(spark, path).toMap
    assert(inf("step") == "10" && inf("ds[v].type") == "GAUGE")
    assert(inf("rra[1].cf") == "MAX" && inf("rra[1].pdp_per_row") == "6")
    assert(inf("ds[v].min") == "0.0000000000e+00")
    // list sees both stores, not the dumps
    assert(graft.store.Dump.list(root) == Seq("store_a", "store_b"))
  }

  test("HW family RRAs materialize from one recurrence pass") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_hw").toString
    val hw = HwParams(alpha = 0.1, beta = 0.035, gamma = 0.1, period = 4L)
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 3600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 1000L),
        RraDef(Cf.HwPredict, rowCnt = 100L, hw = Some(hw)),
        RraDef(Cf.Seasonal, rowCnt = 4L, hw = Some(hw)),
        RraDef(Cf.DevSeasonal, rowCnt = 4L, hw = Some(hw)),
        RraDef(Cf.DevPredict, rowCnt = 100L),
        RraDef(Cf.Failures, rowCnt = 100L, hw = Some(hw)))))
    val samples = (0 to 20).map(i => ("s1", i * 10000000L, i.toLong, 10.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    // the materialized HWPREDICT table equals a direct recurrence run
    val stored = RrdStore.fetch(spark, path, Cf.HwPredict, "v", Seq("k"),
        0L, 200L, 10L).orderBy("ts")
      .select("v").as[Option[Double]].collect()
    val direct = graft.hw.HoltWinters.run(
      Array.fill(20)(10.0), // pdp slots 10..200 of a constant gauge
      graft.hw.HoltWinters.HwSpec(0.1, 0.035, 4, 0.1, 0.1))
    stored.zip(direct.hwpredict).foreach { case (s, d) =>
      assert(s == (if (d.isNaN) None else Some(d)), s"$s vs $d")
    }
    // FAILURES table exists and is all zeros for a constant series
    val fails = RrdStore.fetch(spark, path, Cf.Failures, "v", Seq("k"),
      0L, 200L, 10L)
    assert(fails.where(
      org.apache.spark.sql.functions.col("v") =!= 0.0).count() == 0)
  }

  test("appendBatch rewrites only the partitions the batch touches") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ab").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 3600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100000L))))
    // bucket span = step 10s * pdpCnt 1 * 512 slots = 5120 s; 1200
    // samples at 10 s cover ts 10..12000 -> partitions __tb=0,1,2
    val b1 = (0 to 1200).map(i => ("s1", i * 10000000L, i.toLong, 5.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.appendBatch(spark, path, b1, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    val rraDir = java.nio.file.Paths.get(s"$path/rra0")
    def files(tb: Long): Map[String, Long] = {
      val d = rraDir.resolve(s"__tb=$tb")
      assert(java.nio.file.Files.isDirectory(d), s"missing __tb=$tb")
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.list(d).forEach(p => out +=
        p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
      out.toMap
    }
    val old0 = files(0); val old1 = files(1)
    // one new sample in the newest bucket (ts 12010 -> __tb=2)
    val b2 = Seq(("s1", 12010000000L, 9999L, 7.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.appendBatch(spark, path, b2, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    // buckets 0 and 1: same files, byte-for-byte untouched
    assert(files(0) == old0, "partition __tb=0 was rewritten")
    assert(files(1) == old1, "partition __tb=1 was rewritten")
    // the merged table still answers a full-range fetch
    val f = RrdStore.fetch(spark, path, Cf.Average, "v", Seq("k"),
      0L, 12020L, 10L)
    assert(f.count() == 1202)
    val atNew = f.where(org.apache.spark.sql.functions.col("ts") === 12010L)
      .select("v").as[Option[Double]].collect()
    assert(atNew.toSeq == Seq(Some(7.0)))
  }

  test("crash-leftover .old bucket is restored before reads and merges") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_cr").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 3600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100000L))))
    val b1 = (0 to 1200).map(i => ("s1", i * 10000000L, i.toLong, 5.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.appendBatch(spark, path, b1, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    // count DATA rows, not fetch's gap-filled grid (grid size is fixed
    // by the window, so it cannot witness a lost bucket)
    def dataRows(): Long = RrdStore.fetch(spark, path, Cf.Average, "v",
        Seq("k"), 0L, 12020L, 10L)
      .where(org.apache.spark.sql.functions.col("v").isNotNull).count()
    val full = dataRows()
    // simulate a crash between move(dst, old) and move(src, dst): the
    // bucket's ONLY copy sits in the .old holding dir
    val rraDir = java.nio.file.Paths.get(s"$path/rra0")
    val dst = rraDir.resolve("__tb=1")
    val old = java.nio.file.Paths.get(s"$path/rra0.old__tb=1")
    java.nio.file.Files.move(dst, old)
    // a plain read recovers the leftover instead of losing the bucket
    assert(dataRows() == full)
    assert(java.nio.file.Files.isDirectory(dst) &&
      !java.nio.file.Files.exists(old), "leftover not restored")
    // same crash again, then a MERGE into another bucket: recovery must
    // run before the merge reads the table, so nothing is discarded
    java.nio.file.Files.move(dst, old)
    val b2 = Seq(("s1", 12010000000L, 9999L, 7.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.appendBatch(spark, path, b2, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    assert(dataRows() == full + 1)
    // a STALE leftover (dst present) is deleted, not restored over it
    val dst0 = rraDir.resolve("__tb=0")
    val old0 = java.nio.file.Paths.get(s"$path/rra0.old__tb=0")
    java.nio.file.Files.createDirectories(old0)
    java.nio.file.Files.write(old0.resolve("junk"), "x".getBytes)
    RrdStore.recoverLeftovers(s"$path/rra0")
    assert(java.nio.file.Files.isDirectory(dst0) &&
      !java.nio.file.Files.exists(old0), "stale leftover not dropped")
  }

  test("streaming monotonic gate rejects t <= last_up across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = StreamingIngest.monotonicGate(input.toDS())
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      input.addData(Sample("a", 100, 1.0), Sample("a", 200, 2.0),
        Sample("b", 100, 9.0))
      q.processAllAvailable()
      // batch 2: a@150 and b@100 are late/non-advancing -> rejected
      input.addData(Sample("a", 150, 3.0), Sample("a", 250, 4.0),
        Sample("b", 100, 8.0))
      q.processAllAvailable()
      val out = spark.table("gate_out").as[Sample].collect().toSet
      assert(out == Set(Sample("a", 100, 1.0), Sample("a", 200, 2.0),
        Sample("b", 100, 9.0), Sample("a", 250, 4.0)))
    } finally q.stop()
  }

  test("gateFileRun: file-source micro-batches, partial late acceptance") {
    import spark.implicits._
    import StreamingIngest.GateRow
    def streamRoots(): Set[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      scala.util.Using.resource(java.nio.file.Files.list(tmp)) { s =>
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("graft-stream-")).toSet
      }
    }
    val rootsBefore = streamRoots()
    val input = Seq(GateRow("a", 100, 1, 1.0), GateRow("a", 200, 2, 2.0),
      GateRow("b", 100, 3, 9.0)).toDS()
    // late batch: a@150 stale (rejected), a@250 advances (accepted),
    // b@100 ties last_up (rejected — strictly greater required)
    val late = Seq(GateRow("a", 150, 4, 3.0), GateRow("a", 250, 5, 4.0),
      GateRow("b", 100, 6, 8.0)).toDS()
    val got = StreamingIngest.gateFileRun(spark, input, late)
      .collect().toSet
    assert(got == Set(GateRow("a", 100, 1, 1.0), GateRow("a", 200, 2, 2.0),
      GateRow("b", 100, 3, 9.0), GateRow("a", 250, 5, 4.0)))
    // eager cleanup: the run's temp root keeps ONLY the sink dir — the
    // input and checkpoint trees are deleted the moment the query stops
    val added = streamRoots() -- rootsBefore
    assert(added.size == 1, s"expected one new stream root, got $added")
    import scala.jdk.CollectionConverters._
    val children = scala.util.Using.resource(
      java.nio.file.Files.list(added.head)) { s =>
      s.iterator().asScala.map(_.getFileName.toString).toSet
    }
    assert(children == Set("out"),
      s"input/checkpoint must be deleted eagerly, found $children")
  }
}
