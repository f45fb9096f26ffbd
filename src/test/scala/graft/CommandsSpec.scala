package graft

import graft.cli.Commands
import org.apache.spark.sql.functions._

/** The rrd_tool.c command dispatch driven exactly as a reference user
  * would: create → update → fetch → tune → graphv → dump/list. */
class CommandsSpec extends SparkSuite {

  test("create/update/fetch/first/last/lastupdate round trip") {
    val c = new Commands(spark, nowSec = 1000L)
    val path = java.nio.file.Files.createTempDirectory("graft_cmd").toString
    c.create(path, Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100", "RRA:MAX:0.5:6:50"))
    c.update(path, (1 to 20).map(i => s"${i * 10}:7.5"))
    val f = c.fetch(path, "AVERAGE",
      Seq("--start", "0", "--end", "200", "--resolution", "10"))
    import spark.implicits._
    val vs = f.orderBy("ts").select("v").as[Option[Double]].collect()
    // create seeds last_up = --start (rrd_create.c), so the FIRST
    // update's GAUGE slot is already known — all 20 slots resolve
    assert(vs.count(_.contains(7.5)) == 20)
    // rrd_first is RRA geometry, not data: floor(200/10)*10 - 99*10
    assert(c.first(path) == -790L)
    assert(c.last(path) == 200L)
    assert(c.lastupdate(path).select("ts").as[Long].head() == 200L)

    c.tune(path, Seq("--heartbeat", "v:1200",
      "--data-source-rename", "v:speed"))
    assert(c.info(path).toMap.apply("ds[speed].minimal_heartbeat") == "1200")

    // a bare negative integer is now-relative (rrd_parsetime's
    // `--start -86400` idiom): now=1000, so -900 opens the window at 100
    val rel = c.fetch(path, "AVERAGE",
      Seq("--start", "-900", "--end", "200", "--resolution", "10"))
    assert(rel.orderBy("ts").select("ts").as[Long].collect().head == 110L)

    val g = c.graphv(Seq("--start", "0", "--end", "200",
      s"DEF:a=$path:speed:AVERAGE",
      "CDEF:b=a,10,*",
      "VDEF:m=b,MAXIMUM",
      "PRINT:m:%lf",
      "PRINT:m:%Y-%m-%d %H:%M:%S:strftime",   // MAXIMUM's timestamp
      "PRINT:m:%S seconds:valstrfduration"))  // value 75 as milliseconds
    assert(g.prints == Seq("75.000000",
      "1970-01-01 00:00:10", // first slot where b hits its max (the
      // create-seeded first update already resolves slot 10)
      "0 seconds"))

    // rrd_proc_start_end cross-anchoring (rrd_fetch.c:154): either end
    // of the window may reference the other — "end-100s" against a
    // fixed end, and "start+100s" against a fixed start, both resolve
    // to the same (100, 200] window as the explicit pair above
    val viaEnd = c.fetch(path, "AVERAGE",
      Seq("--start", "end-100s", "--end", "200", "--resolution", "10"))
    assert(viaEnd.orderBy("ts").select("ts").as[Long].collect().head == 110L)
    val viaStart = c.fetch(path, "AVERAGE",
      Seq("--start", "100", "--end", "start+100s", "--resolution", "10"))
    assert(viaStart.orderBy("ts").select("ts").as[Long].collect().last == 200L)

    // mutual anchoring has no fixpoint — the reference errors, so do we
    intercept[IllegalArgumentException](c.fetch(path, "AVERAGE",
      Seq("--end", "start+100s", "--resolution", "10")))
    intercept[IllegalArgumentException](c.fetch(path, "AVERAGE",
      Seq("--start", "end-1h", "--end", "start+100s")))
    // a malformed spec surfaces its OWN parse error, never a
    // misattributed cross-anchoring fallback
    val bad = intercept[IllegalArgumentException](c.fetch(path, "AVERAGE",
      Seq("--end", "garbag%e", "--start", "end-1h")))
    assert(!bad.getMessage.contains("start undefined"), bad.getMessage)
    // inverted windows fail fast (rrd_fetch_fn's start < end check)
    intercept[IllegalArgumentException](c.fetch(path, "AVERAGE",
      Seq("--start", "200", "--end", "100")))

    // --align-start (rrd_fetch.c:169-173): both ends shift down by
    // start % resolution, so the window KEEPS its length instead of
    // widening — start 105/end 185 at res 60 becomes (60, 140]
    val al = c.fetch(path, "AVERAGE", Seq("--start", "105", "--end", "185",
      "--resolution", "60", "--align-start"))
    val alTs = al.orderBy("ts").select("ts").as[Long].collect()
    assert(alTs.head == 70L && alTs.last == 140L)

    val out = java.nio.file.Files.createTempDirectory("graft_cmdd").toString
    c.dump(path, s"$out/d")
    assert(c.list(out) == Seq("d")) // a dump is itself restorable
    c.restore(s"$out/d", s"$out/restored")
    assert(c.list(out) == Seq("d", "restored"))

    // xport narrows graphv to the tabular frame
    val xf = c.xport(Seq("--start", "0", "--end", "100",
      s"DEF:a=$path:speed:AVERAGE", "XPORT:a:speed"))
    assert(xf.orderBy("ts").select("ts").as[Long].collect().nonEmpty)

    c.flushcached(Seq(path)) // parity no-op
  }

  test("resize verb: argv form, GROW/SHRINK, reference diagnostics") {
    val c = new Commands(spark, nowSec = 1000L)
    val path = java.nio.file.Files.createTempDirectory("graft_rsz").toString
    c.create(path, Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100", "RRA:MAX:0.5:6:50"))
    c.update(path, (1 to 20).map(i => s"${i * 10}:7.5"))
    // the reference CLI argv shape: resize <file> <rra#> GROW <rows>
    c.resize(path, Seq("0", "GROW", "40"))
    assert(graft.store.RrdStore.readSchema(path).rras(0).rowCnt == 140L)
    c.resize(path, Seq("0", "SHRINK", "100"))
    assert(graft.store.RrdStore.readSchema(path).rras(0).rowCnt == 40L)
    // diagnostics, verbatim from rrd_resize.c:33-81
    def msg(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(c.resize(path, Seq("0", "GROW"))) ==
      "wrong number of parameters")
    assert(msg(c.resize(path, Seq("0", "WIDEN", "5"))) ==
      "I can only GROW or SHRINK")
    assert(msg(c.resize(path, Seq("0", "GROW", "0"))) ==
      "Please grow or shrink with at least 1 row")
    assert(msg(c.resize(path, Seq("7", "GROW", "5"))) ==
      "no such RRA in this RRD")
    assert(msg(c.resize(path, Seq("0", "SHRINK", "40"))) ==
      "This RRA is not that big")
  }

  test("first on a data-less store is the reference's geometric value") {
    // create-from-template-1: create --start 1299999999 --step 60
    // RRA:AVERAGE:0.5:1:100 -> `rrdtool first` == 1299994020 (#1140)
    val c = new Commands(spark, nowSec = 1300000000L)
    val path = java.nio.file.Files.createTempDirectory("graft_first").toString
    c.create(path, Seq("--start", "1299999999", "--step", "60",
      "DS:a:GAUGE:120:0:U", "DS:b:COUNTER:120:0:U",
      "RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:2"))
    assert(c.first(path) == 1299994020L)
    assert(c.last(path) == 1299999999L)
  }

  test("updatev returns only the rollup rows written by this call") {
    import spark.implicits._
    val c = new Commands(spark, nowSec = 1000L)
    val path = java.nio.file.Files.createTempDirectory("graft_updv").toString
    c.create(path, Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100", "RRA:MAX:0.5:2:50"))
    val first = c.updatev(path, (1 to 8).map(i => s"${i * 10}:5.0"))
    // lcm(1,2)*10 = 20s horizon: newest sample 80 -> horizon 80, all
    // slots (re)written by the first call are returned
    assert(first.select("rra").distinct().as[Int].collect().toSet
      == Set(0, 1))
    // materialize before the second call swaps the RRA files out from
    // under this lazy frame
    val firstMax = first.select(max("ts")).as[Long].head()
    val firstCount = first.count()
    val second = c.updatev(path, Seq("90:5.0", "100:5.0"))
    val secondTs = second.select("ts").as[Long].collect()
    // the second call reports only slots past the first call's horizon
    assert(secondTs.nonEmpty && secondTs.forall(_ > firstMax - 20),
      s"stale rows in updatev return: ${secondTs.sorted.toSeq}")
    assert(secondTs.length < firstCount)
  }

  test("update rejects past samples; --skip-past-updates ingests the " +
      "in-order remainder (rrd_update.c:675-789)") {
    import spark.implicits._
    val c = new Commands(spark, nowSec = 1000L)
    val path = java.nio.file.Files.createTempDirectory("graft_skip").toString
    c.create(path, Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"))
    c.update(path, Seq("10:1.0", "20:2.0"))
    // default: a non-advancing sample is an error, like the reference's
    // "illegal attempt to update using time ... when last update time is"
    val e = intercept[IllegalArgumentException] {
      c.update(path, Seq("15:9.0", "30:3.0"))
    }
    assert(e.getMessage.contains("illegal attempt"))
    // with the flag: the stale sample skips silently, 30 and 40 land
    c.update(path, Seq("--skip-past-updates", "15:9.0", "30:3.0", "40:4.0"))
    val f = c.fetch(path, "AVERAGE",
      Seq("--start", "0", "--end", "40", "--resolution", "10"))
    val vs = f.orderBy("ts").select("v").as[Option[Double]].collect()
    assert(vs.toSeq == Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)))
    // the gate is µs-strict (rrd_update.c checks last_up_usec too):
    // 40.5 advances past 40; a later 40.2 is stale even though both
    // truncate to second 40
    c.update(path, Seq("40.5:5.0"))
    val e2 = intercept[IllegalArgumentException] {
      c.update(path, Seq("40.2:6.0"))
    }
    assert(e2.getMessage.contains("illegal attempt"))
    // reference semantics on a partially valid batch: the in-order
    // PREFIX commits before the error surfaces
    val e3 = intercept[IllegalArgumentException] {
      c.update(path, Seq("50:7.0", "41:9.9"))
    }
    assert(e3.getMessage.contains("illegal attempt"))
    // slot (40,50] = 0.5s of rate 5 (the 40.5 sample) + 9.5s of rate 7
    val f2 = c.fetch(path, "AVERAGE",
      Seq("--start", "40", "--end", "50", "--resolution", "10"))
    val got = f2.orderBy("ts").select("v").as[Option[Double]].collect()
    assert(got.length == 1 && got.head.exists(v => math.abs(v - 6.9) < 1e-9))
  }

  test("create --no-overwrite refuses an existing store " +
      "(tests/create-no-overwrite)") {
    val c = new Commands(spark, nowSec = 1000L)
    val path = java.nio.file.Files.createTempDirectory("graft_no").toString
    val spec = Seq("--start", "0", "--step", "10",
      "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100")
    c.create(path, spec)
    // the flag is valueless: it must not swallow the following DS spec
    intercept[IllegalStateException] {
      c.create(path, "--no-overwrite" +: spec)
    }
    c.create(path, spec) // plain create still overwrites
  }

  test("list walks stores and directories (tests/list1)") {
    import java.nio.file.{Files, Paths}
    val c = new Commands(spark, nowSec = 1300000000L)
    val root = Files.createTempDirectory("graft_list1").toString
    val dir = s"$root/list_dir"
    Files.createDirectories(Paths.get(dir))
    // empty directory returns nothing
    assert(c.list(dir) == Seq.empty)
    // a store path lists itself (list of a single .rrd)
    val store = s"$root/first"
    c.create(store, Seq("--start", "1300000000", "--step", "60",
      "DS:dv:DDERIVE:300:U:U", "DS:wh:DCOUNTER:300:0:U",
      "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:10:144"))
    assert(c.list(store) == Seq("first"))
    // directory with several stores
    def copy(from: String, to: String): Unit =
      Files.walk(Paths.get(from)).forEach { p =>
        val t = Paths.get(to).resolve(Paths.get(from).relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      }
    copy(store, s"$dir/first"); copy(store, s"$dir/second")
    copy(store, s"$dir/third")
    assert(c.list(dir) == Seq("first", "second", "third"))
    // non-store files are not listed
    Files.write(Paths.get(s"$dir/not_an_rrd"), Array[Byte](1))
    assert(c.list(dir).size == 3)
    // plain directories ARE listed (navigable), non-recursively
    Files.createDirectories(Paths.get(s"$dir/new_dir"))
    assert(c.list(dir).size == 4)
    // recursive lists only stores, as root-relative paths
    Files.createDirectories(Paths.get(s"$dir/new_dir2"))
    copy(store, s"$dir/new_dir2/fourth")
    copy(store, s"$dir/new_dir2/fifth")
    assert(c.list(dir, recursive = true) == Seq("first",
      "new_dir2/fifth", "new_dir2/fourth", "second", "third"))
    // wildcards glob basenames (rrd_list.c:170-205): any match type,
    // '*' does not cross '/', recursive+glob and '..' are refused
    assert(c.list(s"$dir/s*") == Seq("second"))
    assert(c.list(s"$dir/*ir*") ==
      Seq("first", "new_dir", "new_dir2", "third"))
    assert(c.list(s"$dir/*/f*") == Seq("fifth", "fourth"))
    assert(c.list(s"$dir/nomatch*") == Seq.empty)
    intercept[IllegalArgumentException](c.list(s"$dir/s*", recursive = true))
    intercept[IllegalArgumentException](c.list(s"$dir/../x"))
  }
}
