package graft

import java.nio.file.{Files, Path, Paths}

import graft.cli.Commands
import graft.store.RrdStore
import org.apache.spark.sql.functions._

/** Ports of /root/reference/tests/modify2, modify4 and modify5 —
  * RRA-set evolution under data, verified against the reference's own
  * checked-in dump fixtures (restored via RrdXml — true format
  * interop) and by the dump-equality invariant the scripts assert:
  *
  *  - modify2: growing four aggregate RRAs simultaneously backfills
  *    each from the 1-pdp AVERAGE ring (MIN/MAX/LAST targets steal
  *    from AVERAGE candidates — select_for_modify,
  *    rrd_modify.c:80-85); adding an RRA with an intermediate
  *    pdp_cnt (2) populates by averaging pairs of 1-pdp rows.
  *  - modify4: `DELRRA:5` on a six-RRA store must equal the five-RRA
  *    store that never carried it, and adding `RRA:AVERAGE:0.5:4:10`
  *    to the five-RRA store must equal the six-RRA original — the
  *    populated rows reproduce what real consolidation would have
  *    written.
  *  - modify5: the same DELRRA/add-RRA invariant keeps holding while
  *    both stores continue ingesting unaligned updates.
  */
class ModifyGoldenSpec extends SparkSuite {

  /** The RRA's reference-visible content: its retention-window grid
    * (rowCnt end-labeled slots up to floor(last_up/step)·step), NaN
    * and absent rows normalized to None. */
  private def rraRows(c: Commands, path: String,
      idx: Int): Seq[(Long, Seq[Option[Double]])] = {
    val schema = RrdStore.readSchema(path)
    val r = schema.rras(idx)
    val step = schema.stepSec * r.pdpCnt
    val lastRow = math.floorDiv(c.last(path), step) * step
    val lo = lastRow - r.rowCnt * step
    val dsCols = schema.ds.map(_.name)
    val grid = (1 to r.rowCnt.toInt).map(i => lo + i * step)
    val p = s"$path/rra$idx"
    if (!Files.exists(Paths.get(p)))
      return grid.map(t => t -> dsCols.map(_ => Option.empty[Double]))
    val byTs = spark.read.parquet(p)
      .where(col("ts") > lo && col("ts") <= lastRow)
      .select(col("ts") +: dsCols.map(col): _*)
      .collect()
      .map(row => row.getLong(0) -> dsCols.indices.map { i =>
        if (row.isNullAt(i + 1) || row.getDouble(i + 1).isNaN) None
        else Some(row.getDouble(i + 1))
      }.toSeq).toMap
    grid.map(t => t -> byTs.getOrElse(t, dsCols.map(_ => None)))
  }

  /** Dump-equality: same RRA layout, same retained rows (values to
    * 1e-9 relative — populate folds in a different order than
    * incremental consolidation). */
  private def assertStoreEquals(c: Commands, got: String, want: String,
      tag: String): Unit = {
    val (sg, sw) = (RrdStore.readSchema(got), RrdStore.readSchema(want))
    assert(sg.ds.map(_.name) == sw.ds.map(_.name), s"$tag: DS sets")
    assert(sg.rras.map(r => (r.cf, r.pdpCnt, r.rowCnt)) ==
      sw.rras.map(r => (r.cf, r.pdpCnt, r.rowCnt)), s"$tag: RRA layout")
    sg.rras.indices.foreach { i =>
      val (g, w) = (rraRows(c, got, i), rraRows(c, want, i))
      assert(g.map(_._1) == w.map(_._1), s"$tag rra$i: slot grids differ")
      g.zip(w).foreach { case ((t, gs), (_, ws)) =>
        gs.zip(ws).foreach {
          case (None, None) => ()
          case (Some(a), Some(b)) => assert(
            math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
            s"$tag rra$i@$t: $a vs $b")
          case (a, b) => fail(s"$tag rra$i@$t: $a vs $b")
        }
      }
    }
  }

  private def copyStore(from: String, to: String): Unit = {
    val (src, dst) = (Paths.get(from), Paths.get(to))
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  /** The five-RRA store of modify2/4/5 plus updates; `offset` is the
    * update-time offset from the minute boundary (modify2 updates on
    * it, modify4/5 at :50), `extraRra` appends modify4/5's sixth RRA. */
  private def buildStore(c: Commands, path: String, times: Seq[Long],
      extraRra: Seq[String] = Nil): Unit = {
    c.create(path, Seq("--start", "1300000000", "--step", "60",
      "DS:a:GAUGE:120:0:U",
      "RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:2", "RRA:MIN:0.5:5:2",
      "RRA:MAX:0.5:5:2", "RRA:LAST:0.5:5:2") ++ extraRra)
    c.update(path, times.zipWithIndex.map { case (t, i) =>
      s"$t:${10 * (i + 1)}" }, template = Some(Seq("a")))
  }

  test("tests/modify2: simultaneous RRA grows + added intermediate-pdp RRA vs fixtures") {
    val c = new Commands(spark, nowSec = 1300003020L)
    val root = Files.createTempDirectory("graft_mod2").toString
    val org = s"$root/a"
    buildStore(c, org, (0 until 51).map(1300000020L + 60L * _))
    val refA = s"$root/refA"
    c.restoreXml("/root/reference/tests/modify2-testa-create.dump", refA)
    assertStoreEquals(c, org, refA, "testa")

    // testb: grow all four aggregate RRAs at once; the grown rows
    // backfill from the 1-pdp AVERAGE (fixture: MIN slot 1300000200 is
    // 20 — the ring's first PDP is NaN, so the fold sees 20,30,40)
    val b = s"$root/b"; copyStore(org, b)
    c.tune(b, Seq("RRA#1:+10", "RRA#2:+10", "RRA#3:+10", "RRA#4:+10"))
    val refB = s"$root/refB"
    c.restoreXml("/root/reference/tests/modify2-testb-mod1.dump", refB)
    assertStoreEquals(c, b, refB, "testb")

    // testc: added 2-pdp AVERAGE populates by averaging 1-pdp pairs
    // (fixture: newest slot 1300002960 = (490+500)/2)
    val cc = s"$root/c"; copyStore(org, cc)
    c.tune(cc, Seq("RRA:AVERAGE:0.5:2:10"))
    val refC = s"$root/refC"
    c.restoreXml("/root/reference/tests/modify2-testc-mod1.dump", refC)
    assertStoreEquals(c, cc, refC, "testc")
  }

  test("tests/modify4: DELRRA/add-RRA dump-equality vs fixtures") {
    val c = new Commands(spark, nowSec = 1300002990L)
    val root = Files.createTempDirectory("graft_mod4").toString
    val times = (0 until 50).map(1300000050L + 60L * _)
    val a1 = s"$root/a1"
    buildStore(c, a1, times)
    val a2 = s"$root/a2"
    buildStore(c, a2, times, extraRra = Seq("RRA:AVERAGE:0.5:4:10"))
    val refA1 = s"$root/refA1"
    c.restoreXml("/root/reference/tests/modify4-testa1-create.dump", refA1)
    assertStoreEquals(c, a1, refA1, "a1")
    val refA2 = s"$root/refA2"
    c.restoreXml("/root/reference/tests/modify4-testa2-create.dump", refA2)
    assertStoreEquals(c, a2, refA2, "a2")

    // remove the sixth RRA from a2 -> must equal a1
    val b2 = s"$root/b2"; copyStore(a2, b2)
    c.tune(b2, Seq("DELRRA:5"))
    assertStoreEquals(c, b2, refA1, "b2=del")

    // add the sixth RRA to a1 -> must equal a2 (populate reproduces
    // what real consolidation wrote)
    val b1 = s"$root/b1"; copyStore(a1, b1)
    c.tune(b1, Seq("RRA:AVERAGE:0.5:4:10"))
    assertStoreEquals(c, b1, refA2, "b1=add")
  }

  test("tests/modify5: the invariant holds across continued unaligned ingest") {
    val c = new Commands(spark, nowSec = 1300002990L)
    val root = Files.createTempDirectory("graft_mod5").toString
    val times = (0 until 50).map(1300000050L + 60L * _)
    val a1 = s"$root/a1"
    buildStore(c, a1, times)
    val a2 = s"$root/a2"
    buildStore(c, a2, times, extraRra = Seq("RRA:AVERAGE:0.5:4:10"))

    // the script's 15 follow-on updates (drifting off the minute grid);
    // applied in incremental groups, the invariant checked after each
    val groups = Seq(
      Seq("1300003010:200"),
      Seq("1300003070:102", "1300003130:777", "1300003190:645",
        "1300003250:122", "1300003310:981", "1300003323:223",
        "1300003381:721"),
      Seq("1300003445:821", "1300003500:221", "1300003562:231",
        "1300003637:542", "1300003699:734", "1300003769:9231",
        "1300003823:17"))
    groups.foreach { g =>
      c.update(a1, g, template = Some(Seq("a")))
      c.update(a2, g, template = Some(Seq("a")))
      val iter = Files.createTempDirectory("graft_mod5_it").toString
      val b2 = s"$iter/b2"; copyStore(a2, b2)
      c.tune(b2, Seq("DELRRA:5"))
      assertStoreEquals(c, b2, a1, s"del@${g.last}")
      val b1 = s"$iter/b1"; copyStore(a1, b1)
      c.tune(b1, Seq("RRA:AVERAGE:0.5:4:10"))
      assertStoreEquals(c, b1, a2, s"add@${g.last}")
    }
  }
}
