package graft

import java.nio.file.Files

import graft.cli.Commands
import graft.model.Cf
import graft.store.RrdStore

/** Ports of /root/reference/tests/tune1 and tests/tune2, driven through
  * the Commands facade against the reference's own checked-in dump
  * fixtures (restored via RrdXml — true format interop, not a re-typed
  * expectation):
  *
  *  - tune1: a store built from scratch (create + --template updates)
  *    must hold the SAME retained rows as `tune1-testorg.dump`; the two
  *    tune invocations must land on `tune1-testa-mod1/2.dump`'s schema.
  *  - tune2: a lone HWPREDICT RRA implicitly creates the contingent
  *    aberrant family (create_hw_contingent_rras,
  *    rrd_create.c:1168-1249) matching `tune2-testorg.dump`'s five-RRA
  *    layout; an out-of-range --beta fails WITHOUT touching the store;
  *    --beta 0.4 lands on `tune2-testa-mod1.dump`.
  */
class TuneGoldenSpec extends SparkSuite {

  private def fetchRows(path: String, ds: String, start: Long, end: Long,
      step: Long): Seq[(Long, Option[Double])] = {
    import spark.implicits._
    RrdStore.fetch(spark, path, Cf.Average, ds, Seq("k"), start, end, step)
      .orderBy("ts").select("ts", ds)
      .as[(Long, Option[Double])].collect().toSeq
  }

  test("tests/tune1: scratch-built store == reference org dump; tune ops == mod dumps") {
    val c = new Commands(spark, nowSec = 1300003020L)
    val root = Files.createTempDirectory("graft_tune1").toString

    // create + "--template a" updates: 51 samples 60 s apart, 10,20,…,510
    val org = s"$root/org"
    c.create(org, Seq("--start", "1300000000", "--step", "60",
      "DS:a:GAUGE:120:0:U", "DS:b:COUNTER:120:0:U",
      "RRA:AVERAGE:0.5:1:10", "RRA:AVERAGE:0.5:5:10"))
    c.update(org,
      (0 until 51).map(i => s"${1300000020L + 60L * i}:${10 * (i + 1)}"),
      template = Some(Seq("a")))

    val ref = s"$root/ref"
    c.restoreXml("/root/reference/tests/tune1-testorg.dump", ref)
    assert(c.last(org) == 1300003020L && c.last(ref) == 1300003020L)

    // every retained row of both RRAs matches the reference's dump:
    // 60 s RRA rows 1300002480..1300003020, 300 s rows 1300000200..2900
    for ((start, end, step) <- Seq((1300002420L, 1300003020L, 60L),
        (1299999900L, 1300002900L, 300L)); ds <- Seq("a", "b")) {
      val got = fetchRows(org, ds, start, end, step)
      val exp = fetchRows(ref, ds, start, end, step)
      assert(got == exp, s"$ds at step $step diverges from the fixture")
    }
    // pin literal golden numbers (tune1-testorg.dump database rows)
    assert(fetchRows(org, "a", 1300002420L, 1300003020L, 60L).head ==
      ((1300002480L, Some(420.0))))
    assert(fetchRows(org, "a", 1299999900L, 1300002900L, 300L).last ==
      ((1300002900L, Some(470.0))))
    assert(fetchRows(org, "b", 1300002420L, 1300003020L, 60L)
      .forall(_._2.isEmpty)) // b never updated -> NaN column

    // mod1: tune twice (minimum U then -100) — tune1-testa-mod1.dump
    val a1 = s"$root/a1"
    c.restoreXml("/root/reference/tests/tune1-testorg.dump", a1)
    c.tune(a1, Seq("--heartbeat", "a:90", "--minimum", "b:U"))
    c.tune(a1, Seq("--heartbeat", "a:90", "--minimum", "b:-100"))
    val m1 = c.info(a1).toMap
    assert(m1("ds[a].minimal_heartbeat") == "90")
    assert(m1("ds[b].minimal_heartbeat") == "120")
    assert(m1("ds[b].min") == "-1.0000000000e+02")

    // mod2: DST retype + rename — tune1-testa-mod2.dump
    val a2 = s"$root/a2"
    c.restoreXml("/root/reference/tests/tune1-testorg.dump", a2)
    c.tune(a2, Seq("--data-source-type", "a:COUNTER",
      "--data-source-rename", "b:c"))
    val m2 = c.info(a2).toMap
    assert(m2("ds[a].type") == "COUNTER")
    assert(m2("ds[c].type") == "COUNTER")
    assert(!m2.keys.exists(_.startsWith("ds[b]")))
  }

  test("tests/modify1: tune RRA#0:+10 grows the RRA (fixture compare)") {
    val c = new Commands(spark, nowSec = 1300003020L)
    val root = Files.createTempDirectory("graft_mod1").toString
    val b = s"$root/b"
    c.restoreXml("/root/reference/tests/modify-test1.create.dump", b)
    c.tune(b, Seq("RRA#0:+10"))
    val want = s"$root/want"
    c.restoreXml("/root/reference/tests/modify-test1.mod1.dump", want)
    assert(RrdStore.readSchema(b).rras(0).rowCnt == 20L)
    // the grown window matches the mod fixture: 20 rows, the freshly
    // exposed older half unknown (GROW adds NaN history)
    val got = fetchRows(b, "a", 1300003020L - 20 * 60, 1300003020L, 60L)
    val exp = fetchRows(want, "a", 1300003020L - 20 * 60, 1300003020L, 60L)
    assert(got == exp)
    assert(got.size == 20 && got.last._2.contains(510.0))
  }

  test("tests/modify3: tune DEL:a RRA#0:+10 on a 3-DS store (fixture compare)") {
    val c = new Commands(spark, nowSec = 1300003020L)
    val root = Files.createTempDirectory("graft_mod3").toString
    val b = s"$root/b"
    c.restoreXml("/root/reference/tests/modify-test3.create.dump", b)
    c.tune(b, Seq("DEL:a", "RRA#0:+10"))
    val want = s"$root/want"
    c.restoreXml("/root/reference/tests/modify-test3.mod1.dump", want)
    val (sb, sw) = (RrdStore.readSchema(b), RrdStore.readSchema(want))
    assert(sb.ds.map(_.name) == sw.ds.map(_.name)) // a gone, b/c remain
    assert(sb.rras.map(_.rowCnt) == sw.rras.map(_.rowCnt))
    for (ds <- sb.ds.map(_.name)) {
      val got = fetchRows(b, ds, 1300003020L - 20 * 60, 1300003020L, 60L)
      val exp = fetchRows(want, ds, 1300003020L - 20 * 60, 1300003020L, 60L)
      assert(got == exp, s"$ds diverges from the mod1 fixture")
    }
  }

  test("tests/tune2: implicit HW family; out-of-range beta rejected atomically") {
    val c = new Commands(spark, nowSec = 1300000000L)
    val root = Files.createTempDirectory("graft_tune2").toString
    val org = s"$root/org"
    c.create(org, Seq("--start", "1300000000", "--step", "60",
      "DS:a:GAUGE:120:0:U", "DS:b:COUNTER:120:0:U",
      "RRA:HWPREDICT:288:0.9:0.8:144"))

    // tune2-testorg.dump: HWPREDICT + implicit SEASONAL/DEVSEASONAL/
    // DEVPREDICT/FAILURES, gamma inherits alpha, FAILURES defaults
    val s0 = RrdStore.readSchema(org)
    assert(s0.rras.map(_.cf) == Seq(Cf.HwPredict, Cf.Seasonal,
      Cf.DevSeasonal, Cf.DevPredict, Cf.Failures))
    assert(s0.rras.map(_.rowCnt) == Seq(288L, 144L, 144L, 288L, 144L))
    val hw = s0.rras.head.hw.get
    assert(hw.alpha == 0.9 && hw.beta == 0.8 && hw.period == 144L)
    assert(s0.rras(1).hw.get.gamma == 0.9) // gamma = alpha
    assert(s0.rras(2).hw.get.gamma == 0.9)
    val fl = s0.rras(4).hw.get
    assert(fl.deltaPos == 2.0 && fl.deltaNeg == 2.0 &&
      fl.failThreshold == 7 && fl.windowLen == 9)

    // out-of-range beta: must throw and leave the store untouched
    intercept[IllegalArgumentException] {
      c.tune(org, Seq("--beta", "1.4"))
    }
    assert(RrdStore.readSchema(org) == s0)

    // --beta 0.4 lands on tune2-testa-mod1.dump's hw_beta
    c.tune(org, Seq("--beta", "0.4"))
    assert(RrdStore.readSchema(org).rras.head.hw.get.beta == 0.4)
    // the rest of the schema is untouched
    assert(RrdStore.readSchema(org).rras.tail == s0.rras.tail)
  }
}
