package graft

import graft.cli.Commands
import graft.model.Cf
import graft.store.RrdStore

/** Pins the fetch shape on a created-but-never-updated store (round-16
  * advisor note on the round-15 `lastPerSeries` rework):
  *
  *   - keyless fetch (series = Nil, the reference's one-file-one-series
  *     shape) returns the FULL aligned grid with every DS null — the
  *     reference's fetch on a fresh file yields all-unknown rows
  *     (rrd_fetch.c fills `(end-start)/step` rows of DNAN regardless of
  *     written data). The pre-r15 window path returned 0 rows here; the
  *     aggregate path's global-agg row is the reference-correct shape.
  *   - keyed fetch (series = Seq("k")) returns 0 rows: there are no
  *     series keys to enumerate a grid for (a keyed store is the
  *     multi-file extension; no file ⇒ no rows).
  */
class FetchEmptyStoreSpec extends SparkSuite {

  private val ST = 1300000000L

  test("never-updated store: keyless fetch = full all-null grid, " +
      "keyed fetch = no rows") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_emptyfetch").toString
    new Commands(spark).create(path, Seq("--start", s"${ST - 1}",
      "--step", "60", "DS:v:GAUGE:120:0:U", "RRA:AVERAGE:0.5:1:100"))
    // step-aligned window (ST itself is not a multiple of 60; an
    // unaligned window widens by alignment, which is not under test)
    val s0 = ST - java.lang.Math.floorMod(ST, 60L)
    val e0 = s0 + 600L

    val keyless = RrdStore.fetch(spark, path, Cf.Average, "v",
      Seq.empty, s0, e0, 60L)
    val rows = keyless.orderBy("ts").collect().toSeq
    assert(rows.size == 10, s"expected (end-start)/step rows, got $rows")
    assert(rows.map(_.getLong(0)) == (1 to 10).map(s0 + 60L * _))
    assert(rows.forall(_.isNullAt(1)), "every slot must be unknown")

    val keyed = RrdStore.fetch(spark, path, Cf.Average, "v",
      Seq("k"), s0, e0, 60L)
    assert(keyed.count() == 0L)
  }
}
