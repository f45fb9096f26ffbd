package graft

import graft.model._
import graft.store.{Dump, Modify, RrdStore}
import graft.streaming.LineProtocol
import org.apache.spark.sql.functions._

/** Schema evolution (tune/resize/modify — the surface of the
  * reference's tests/modify1..5 and tune1/2, compared via the info/dump
  * views like those tests do) and the rrdcached line protocol. */
class ModifySpec extends SparkSuite {

  private def freshStore(): String = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_mod").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("u", Dst.Gauge, 600L), DsDef("w", Dst.Gauge, 600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100L),
        RraDef(Cf.Max, 0.5, 6L, 50L))))
    val samples = (0 to 30).map(i =>
      ("s1", i * 10000000L, i.toLong, 1.0, 2.0))
      .toDF("k", "ts_us", "id", "u", "w")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("u" -> "u", "w" -> "w"), rateScale = Some(2))
    path
  }

  test("tune: heartbeat/min/max/dst/rename reflected in info (tune1/2 shape)") {
    val path = freshStore()
    Modify.tuneHeartbeat(path, "u", 1200L)
    Modify.tuneMin(path, "u", Some(0.5))
    Modify.tuneMax(path, "u", None)
    Modify.tuneDst(path, "w", Dst.Derive)
    val inf = Dump.info(spark, path).toMap
    assert(inf("ds[u].minimal_heartbeat") == "1200")
    assert(inf("ds[u].min") == "5.0000000000e-01")
    assert(inf("ds[u].max") == "NaN")
    assert(inf("ds[w].type") == "DERIVE")
    // rename rewrites the sidecar AND the rollup columns
    Modify.renameDs(spark, path, "u", "u2")
    assert(RrdStore.readSchema(path).ds.map(_.name) == Seq("u2", "w"))
    assert(spark.read.parquet(s"$path/rra0").columns.contains("u2"))
    val f = RrdStore.fetch(spark, path, Cf.Average, "u2", Seq("k"),
      0L, 300L, 10L)
    assert(f.where(col("u2").isNotNull).count() > 0)
  }

  test("resize: GROW is a sidecar change, SHRINK compacts physically") {
    val path = freshStore()
    Modify.resize(spark, path, 0, +100L, Seq("k"))
    assert(RrdStore.readSchema(path).rras(0).rowCnt == 200L)
    val before = spark.read.parquet(s"$path/rra0").count()
    Modify.resize(spark, path, 0, -190L, Seq("k")) // down to 10 rows
    assert(RrdStore.readSchema(path).rras(0).rowCnt == 10L)
    assert(spark.read.parquet(s"$path/rra0").count() == 10L)
    assert(before > 10L)
  }

  test("modify: DEL/add DS and add RRA (modify1..5 shape)") {
    val path = freshStore()
    Modify.addDs(spark, path, DsDef("x", Dst.Gauge, 600L))
    assert(RrdStore.readSchema(path).ds.map(_.name) == Seq("u", "w", "x"))
    val r0 = spark.read.parquet(s"$path/rra0")
    assert(r0.columns.contains("x"))
    assert(r0.where(col("x").isNotNull).count() == 0) // unknown history
    Modify.delDs(spark, path, "w")
    assert(RrdStore.readSchema(path).ds.map(_.name) == Seq("u", "x"))
    assert(!spark.read.parquet(s"$path/rra0").columns.contains("w"))
    Modify.addRra(spark, path, RraDef(Cf.Min, 0.5, 12L, 25L), Seq("k"))
    val s = RrdStore.readSchema(path)
    assert(s.rras.size == 3 && s.rras(2).cf == Cf.Min)
    // dump -> restore survives the evolved schema
    val d = java.nio.file.Files.createTempDirectory("graft_mod_dump").toString
    val restored = java.nio.file.Files
      .createTempDirectory("graft_mod_rest").toString
    Dump.dump(spark, path, s"$d/out")
    Dump.restore(spark, s"$d/out", restored)
    assert(RrdStore.readSchema(restored) == s)
  }

  test("tune HW params + aberrant-reset drop and rebuild the model") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_hwt").toString
    val hw = HwParams(alpha = 0.1, beta = 0.035, gamma = 0.1, period = 4L)
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100L),
        RraDef(Cf.HwPredict, rowCnt = 50L, hw = Some(hw)),
        RraDef(Cf.Seasonal, rowCnt = 4L, hw = Some(hw)))))
    val samples = (0 to 12).map(i => ("s1", i * 10000000L, i.toLong, 5.0))
      .toDF("k", "ts_us", "id", "v")
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/rra1")))
    Modify.tuneHw(path, 1)(_.copy(alpha = 0.25))
    assert(RrdStore.readSchema(path).rras(1).hw.get.alpha == 0.25)
    Modify.aberrantReset(spark, path)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/rra1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/rra0")))
    // next update rematerializes the model with the tuned alpha
    RrdStore.update(spark, path, samples, Seq("k"), "ts_us", "id",
      Map("v" -> "v"), rateScale = Some(2))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/rra1")))
  }

  test("updatev returns the written rollup rows per RRA") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_uv").toString
    RrdStore.create(path, RrdSchema(10L, 0L,
      Seq(DsDef("v", Dst.Gauge, 600L)),
      Seq(RraDef(Cf.Average, 0.5, 1L, 100L),
        RraDef(Cf.Max, 0.5, 6L, 50L))))
    val samples = (0 to 12).map(i => ("s1", i * 10000000L, i.toLong, 3.0))
      .toDF("k", "ts_us", "id", "v")
    val tree = RrdStore.updatev(spark, path, samples, Seq("k"), "ts_us",
      "id", Map("v" -> "v"), rateScale = Some(2))
    assert(tree.columns.toSeq == Seq("rra", "k", "ts", "v"))
    assert(tree.where(col("rra") === 0).count() == 12)
    assert(tree.where(col("rra") === 1).count() == 2) // 6-step buckets
  }

  test("create --source prefill with DS mapping (create-with-source shape)") {
    import spark.implicits._
    val srcPath = freshStore() // DS u,w at step 10, AVG 1-step + MAX 6-step
    val dst = java.nio.file.Files.createTempDirectory("graft_cs").toString
    // like the reference tests, create at the source's last update time —
    // prefill only fills rows ending at or before the new file's last_up
    RrdStore.createFrom(spark, dst, RrdSchema(10L, 300L,
        Seq(DsDef("a", Dst.Gauge, 600L)),
        Seq(RraDef(Cf.Average, 0.5, 1L, 100L),  // same step: copy
          RraDef(Cf.Average, 0.5, 3L, 50L))),   // coarser: re-consolidate
      srcPath, Seq("k"), Map("a" -> "u"))
    // 1-step RRA copied from the source's 1-step AVERAGE
    val r0 = RrdStore.fetch(spark, dst, Cf.Average, "a", Seq("k"),
        0L, 300L, 10L).where(col("a").isNotNull)
    assert(r0.count() > 0)
    assert(r0.select("a").distinct().as[Double].collect().toSeq == Seq(1.0))
    // 3-step RRA re-consolidated from finer source data
    val r1 = spark.read.parquet(s"$dst/rra1")
    assert(r1.where(col("a").isNotNull).count() > 0)
    assert(r1.select("ts").as[Long].collect().forall(_ % 30 == 0))
  }

  test("rrdcached line protocol: UPDATE expands to gated samples") {
    val schema = RrdSchema(300L, 0L,
      Seq(DsDef("a", Dst.Gauge, 600L), DsDef("b", Dst.Gauge, 600L)), Nil)
    val cmd = LineProtocol.parse("UPDATE /x/y.rrd 100:1:2 200:U:4")
    assert(cmd.verb == "UPDATE" && cmd.path == "/x/y.rrd")
    val samples = LineProtocol.updateSamples(cmd, schema)
    assert(samples.toSet == Set(
      graft.streaming.StreamingIngest.Sample("/x/y.rrd:a", 100000000L, 1.0),
      graft.streaming.StreamingIngest.Sample("/x/y.rrd:b", 100000000L, 2.0),
      graft.streaming.StreamingIngest.Sample("/x/y.rrd:b", 200000000L, 4.0)))
    assert(LineProtocol.parse("FLUSH /x/y.rrd").verb == "FLUSH")
    intercept[IllegalArgumentException] {
      LineProtocol.parse("NONSENSE /x")
    }
  }
}
