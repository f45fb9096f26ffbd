package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.model.{Cf, Dst}
import graft.store.{RrdStore, RrdXml}

/** Reference `<rrd>` XML interop (round-2 verdict #4): restore a
  * checked-in reference-format dump fixture, verify its contents, and
  * prove dump→restore→dump is a byte fixpoint (tests/dump-restore). */
class XmlDumpSpec extends SparkSuite {

  private val fixture = "/root/reference/tests/modify-test1.create.dump"

  test("restoreXml reads a reference dump fixture: schema + row values") {
    val root = Files.createTempDirectory("graft_xml").toString
    val store = s"$root/m1"
    RrdXml.restoreXml(spark, fixture, store)
    val schema = RrdStore.readSchema(store)
    assert(schema.stepSec == 60L)
    assert(schema.ds.map(d => (d.name, d.dst, d.heartbeatSec, d.min)) ==
      Seq(("a", Dst.Gauge, 120L, Some(0.0))))
    assert(schema.rras.map(r => (r.cf, r.pdpCnt, r.rowCnt)) ==
      Seq((Cf.Average, 1L, 10L), (Cf.Average, 5L, 10L)))
    // last_up 1300003020: the 60s RRA's newest row is 510, oldest 420
    import spark.implicits._
    val f = RrdStore.fetch(spark, store, Cf.Average, "a", Seq("k"),
        1300002420L, 1300003020L, 60L)
      .orderBy("ts").as[(String, Long, Option[Double])].collect()
    assert(f.head == (("rrd", 1300002480L, Some(420.0))))
    assert(f.last == (("rrd", 1300003020L, Some(510.0))))
    // the 300s RRA re-reads its own dumped values
    val c = RrdStore.fetch(spark, store, Cf.Average, "a", Seq("k"),
        1300000000L, 1300002900L, 300L)
      .orderBy("ts").as[(String, Long, Option[Double])].collect()
    assert(c.find(_._2 == 1300000200L).get._3.contains(30.0))
    assert(c.find(_._2 == 1300002900L).get._3.contains(470.0))
  }

  test("dumpXml -> restoreXml -> dumpXml is a byte fixpoint") {
    val root = Files.createTempDirectory("graft_xmlfix").toString
    val s1 = s"$root/s1"
    RrdXml.restoreXml(spark, fixture, s1)
    val x1 = s"$root/d1.xml"
    val s2 = s"$root/s2"
    val x2 = s"$root/d2.xml"
    RrdXml.dumpXml(spark, s1, x1)
    RrdXml.restoreXml(spark, x1, s2)
    RrdXml.dumpXml(spark, s2, x2)
    val (a, b) = (
      new String(Files.readAllBytes(Paths.get(x1)), StandardCharsets.UTF_8),
      new String(Files.readAllBytes(Paths.get(x2)), StandardCharsets.UTF_8))
    assert(a == b, "second dump diverged from first")
    assert(a.contains("<v>5.1000000000e+02</v>")) // data survived
    // and the restored store answers like the original
    val fa = RrdStore.fetch(spark, s1, Cf.Average, "a", Seq("k"),
      1300002420L, 1300003020L, 60L).orderBy("ts").collect().toSeq
    val fb = RrdStore.fetch(spark, s2, Cf.Average, "a", Seq("k"),
      1300002420L, 1300003020L, 60L).orderBy("ts").collect().toSeq
    assert(fa == fb)
  }
}
