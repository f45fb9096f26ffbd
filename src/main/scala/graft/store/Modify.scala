package graft.store

import graft.model.{Cf, DsDef, Dst, RraDef, RrdSchema}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Schema evolution: tune / resize / modify (SURVEY.md §1.3;
  * /root/reference/src/rrd_tune.c:79-360, rrd_resize.c:40-45,
  * rrd_modify.c:328,1171,1311-1382 — the surface the reference's
  * tests/modify1..5 and tune1/2 exercise via dump comparison).
  *
  * Under append storage, tune and resize are pure sidecar rewrites
  * (heartbeat/min/max/DST feed the NEXT update's rate conversion;
  * row_cnt is the read-time retention horizon — [[RrdStore.compact]]
  * makes a SHRINK physical). Column add/drop/rename rewrite the rollup
  * tables once, distributed.
  */
object Modify {

  private def rewriteSchema(path: String)(f: RrdSchema => RrdSchema): Unit =
    RrdStore.create(path, f(RrdStore.readSchema(path)))

  private def mapDs(path: String, name: String)(f: DsDef => DsDef): Unit =
    rewriteSchema(path)(s => s.copy(ds = s.ds.map(d =>
      if (d.name == name) f(d) else d)))

  // ---- tune (rrd_tune.c): per-DS knobs -------------------------------

  def tuneHeartbeat(path: String, ds: String, heartbeatSec: Long): Unit =
    mapDs(path, ds)(_.copy(heartbeatSec = heartbeatSec))

  def tuneMin(path: String, ds: String, min: Option[Double]): Unit =
    mapDs(path, ds)(_.copy(min = min))

  def tuneMax(path: String, ds: String, max: Option[Double]): Unit =
    mapDs(path, ds)(_.copy(max = max))

  def tuneDst(path: String, ds: String, dst: Dst): Unit = {
    require(dst != Dst.Compute, "tune cannot convert to COMPUTE")
    mapDs(path, ds)(_.copy(dst = dst, rpn = None))
  }

  /** --data-source-rename: sidecar + one distributed rewrite per RRA. */
  def renameDs(spark: SparkSession, path: String, from: String,
      to: String): Unit = {
    val schema = RrdStore.readSchema(path)
    require(schema.ds.exists(_.name == from), s"no DS '$from'")
    require(!schema.ds.exists(_.name == to), s"DS '$to' already exists")
    mapDs(path, from)(_.copy(name = to))
    schema.rras.indices.foreach { i =>
      val p = s"$path/rra$i"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        rewrite(spark, p)(_.withColumnRenamed(from, to))
    }
  }

  /** tune --alpha/--beta/--gamma/--deltapos/--deltaneg/
    * --failure-threshold/--window-length (rrd_tune.c:344-360): adjust a
    * Holt-Winters RRA's parameters in place. */
  def tuneHw(path: String, rraIdx: Int)(
      f: graft.model.HwParams => graft.model.HwParams): Unit =
    rewriteSchema(path) { s =>
      val r = s.rras(rraIdx)
      require(r.hw.isDefined, s"RRA $rraIdx carries no HW parameters")
      s.copy(rras = s.rras.updated(rraIdx, r.copy(hw = r.hw.map(f))))
    }

  /** tune --aberrant-reset <ds> (rrd_tune.c:100-118, rrd_hw.c:331-401):
    * erase the model state — under append storage the HW family tables
    * are dropped and rematerialize from scratch on the next update. */
  def aberrantReset(spark: SparkSession, path: String): Unit = {
    val schema = RrdStore.readSchema(path)
    val hwCfs: Set[Cf] = Set(Cf.HwPredict, Cf.MhwPredict, Cf.Seasonal,
      Cf.DevSeasonal, Cf.DevPredict, Cf.Failures)
    schema.rras.zipWithIndex.foreach { case (r, i) =>
      if (hwCfs(r.cf))
        deleteRecursively(java.nio.file.Paths.get(s"$path/rra$i"))
    }
  }

  // ---- resize (rrd_resize.c): GROW | SHRINK one RRA ------------------

  def resize(spark: SparkSession, path: String, rraIdx: Int, deltaRows: Long,
      series: Seq[String]): Unit = {
    rewriteSchema(path) { s =>
      val r = s.rras(rraIdx)
      val n = r.rowCnt + deltaRows
      require(n >= 1, s"resize would leave $n rows")
      s.copy(rras = s.rras.updated(rraIdx, r.copy(rowCnt = n)))
    }
    // SHRINK becomes physical immediately, like the reference's rewrite
    if (deltaRows < 0) RrdStore.compact(spark, path, series)
    // GROW backfills the newly exposed history from sibling RRAs
    if (deltaRows > 0) backfillGrown(spark, path, rraIdx, deltaRows, series)
  }

  /** rrd_modify's row stealing (find_candidate_rras + populate,
    * rrd_modify.c:50-150,391-440): rows a GROW exposes are populated
    * from other RRAs — candidates are same-CF or AVERAGE RRAs, tried
    * finest-step first (more rows breaking ties), each coarse value
    * repeated across the finer slots it covers (tests/modify1's mod1
    * fixture shows the 300 s AVERAGEs laddered into the grown 60 s
    * rows). Slots no candidate covers stay unknown. */
  private def backfillGrown(spark: SparkSession, path: String, rraIdx: Int,
      deltaRows: Long, series: Seq[String]): Unit = {
    val schema = RrdStore.readSchema(path) // rowCnt already grown
    val r = schema.rras(rraIdx)
    val step = schema.stepSec * r.pdpCnt
    val target = s"$path/rra$rraIdx"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(target))) return
    val cur = spark.read.parquet(target)
    val lastRow = cur.agg(max("ts")).first()
    if (lastRow.isNullAt(0)) return
    val last = lastRow.getLong(0)
    val lo = last - r.rowCnt * step          // exclusive
    val hi = last - (r.rowCnt - deltaRows) * step // inclusive
    val candidates = schema.rras.zipWithIndex
      .filter { case (o, i) => i != rraIdx &&
        (o.cf == r.cf || o.cf == Cf.Average) &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/rra$i")) }
      .sortBy { case (o, _) => (o.pdpCnt, -o.rowCnt) }
    if (candidates.isEmpty) return
    val keys = cur.select(series.map(col): _*).distinct()
    val dsCols = schema.ds.map(_.name).filter(cur.columns.contains)
    // start all-unknown; each candidate (finest first) fills what is
    // still null via the end-labeled ceil mapping onto its grid
    var frame = graft.query.Fetch.grid(spark, lo, hi, step).crossJoin(keys)
      .select(series.map(col) :+ col("ts") :++
        dsCols.map(d => lit(null).cast("double").as(d)): _*)
    candidates.foreach { case (o, i) =>
      val oStep = schema.stepSec * o.pdpCnt
      val src = spark.read.parquet(s"$path/rra$i")
        .select(series.map(col) :+ col("ts").as("__src") :++
          dsCols.map(d => col(d).as(s"__c_$d")): _*)
      frame = frame
        .withColumn("__src", (expr(s"(ts - 1) div $oStep") + 1) * oStep)
        .join(src, series :+ "__src", "left")
        .select(series.map(col) :+ col("ts") :++
          dsCols.map(d => coalesce(col(d), col(s"__c_$d")).as(d)): _*)
    }
    val filled = frame
      .where(dsCols.map(col(_).isNotNull).reduce(_ || _))
      // never duplicate a slot the table already holds
      .join(cur.select((series :+ "ts").map(col): _*),
        series :+ "ts", "left_anti")
    RrdStore.writeSwap(filled.unionByName(cur.select(
      (series.map(col) :+ col("ts")) :++ dsCols.map(col): _*)), target)
  }

  // ---- modify (rrd_modify.c): DS/RRA add & drop ----------------------

  /** DEL:<ds> (rrd_modify.c:1311): drop the column everywhere. */
  def delDs(spark: SparkSession, path: String, ds: String): Unit = {
    val schema = RrdStore.readSchema(path)
    require(schema.ds.exists(_.name == ds), s"no DS '$ds'")
    require(schema.ds.size > 1, "an RRD needs at least one DS")
    rewriteSchema(path)(s => s.copy(ds = s.ds.filterNot(_.name == ds)))
    schema.rras.indices.foreach { i =>
      val p = s"$path/rra$i"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        rewrite(spark, p)(_.drop(ds))
    }
  }

  /** DS:<spec> (rrd_modify.c:328): new column, unknown history. */
  def addDs(spark: SparkSession, path: String, spec: DsDef): Unit = {
    val schema = RrdStore.readSchema(path)
    require(!schema.ds.exists(_.name == spec.name),
      s"DS '${spec.name}' already exists")
    rewriteSchema(path)(s => s.copy(ds = s.ds :+ spec))
    schema.rras.indices.foreach { i =>
      val p = s"$path/rra$i"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        rewrite(spark, p)(_.withColumn(spec.name,
          lit(null).cast("double")))
    }
  }

  /** RRA:<spec> (rrd_modify.c:1345): new rollup, starts empty and fills
    * from subsequent updates (the reference backfills only in
    * create --source prefill). */
  def addRra(path: String, rra: RraDef): Unit =
    rewriteSchema(path)(s => s.copy(rras = s.rras :+ rra))

  /** RRA#<n>:[+-]<rows> (rrd_modify.c:1382). */
  def resizeRra(spark: SparkSession, path: String, rraIdx: Int,
      deltaRows: Long, series: Seq[String]): Unit =
    resize(spark, path, rraIdx, deltaRows, series)

  private def rewrite(spark: SparkSession, p: String)(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit =
    // single write + atomic directory swap (the round-2 version wrote the
    // data twice and could crash between overwrites with no full copy)
    RrdStore.writeSwap(f(spark.read.parquet(p)), p)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).forEach(deleteRecursively(_))
    java.nio.file.Files.deleteIfExists(p)
  }
}
