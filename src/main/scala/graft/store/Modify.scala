package graft.store

import graft.model.{Cf, DsDef, Dst, RraDef, RrdSchema}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** rrd_modify's row stealing (find_candidate_rras + populate_row,
    * rrd_modify.c:61-90,407-560): target slots are filled from sibling
    * RRAs — candidates are same-CF or AVERAGE RRAs, tried finest-step
    * first (more rows breaking ties). A candidate row ending at `e`
    * with timeslot `C` overlaps the end-labeled target row `T` with
    * timeslot `S` iff `e−C < T < e+S` (both grids align to the base
    * step); the reference folds the overlapping non-NaN candidate rows
    * with the target CF — AVERAGE weights every candidate row by its
    * FULL timeslot (populate_row's `tmp + v*cand_timeslot`, so it
    * reduces to a plain mean), LAST keeps the newest — and the first
    * candidate yielding a value for a DS wins. A coarse candidate thus
    * repeats across the finer slots it covers (tests/modify1's mod1
    * fixture: 300 s AVERAGEs laddered into grown 60 s rows) while a
    * fine candidate aggregates into a coarser slot (tests/modify2's
    * added 2-pdp RRA averages pairs of 1-pdp rows). Only
    * AVERAGE/MIN/MAX/LAST targets populate (populate_row's CF gate);
    * slots no candidate covers stay unknown. Returns the grid frame
    * over (loTs, hiTs], or None if the CF is unsupported / no
    * candidate RRA has a table. */
  private def populate(spark: SparkSession, path: String, rraIdx: Int,
      loTs: Long, hiTs: Long, series: Seq[String]): Option[
      org.apache.spark.sql.DataFrame] = {
    val schema = RrdStore.readSchema(path)
    val r = schema.rras(rraIdx)
    val supported: Set[Cf] = Set(Cf.Average, Cf.Min, Cf.Max, Cf.Last)
    if (!supported(r.cf) || hiTs <= loTs) return None
    val step = schema.stepSec * r.pdpCnt
    val candidates = schema.rras.zipWithIndex
      .filter { case (o, i) => i != rraIdx &&
        (o.cf == r.cf || o.cf == Cf.Average) &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/rra$i")) }
      .sortBy { case (o, _) => (o.pdpCnt, -o.rowCnt) }
    if (candidates.isEmpty) return None
    val dsCols = schema.ds.map(_.name)
    def cfAgg(d: String): Column = (r.cf match {
      case Cf.Average => avg(col(d))
      case Cf.Min => min(col(d))
      case Cf.Max => max(col(d))
      case _ => max_by(col(d), when(col(d).isNotNull, col("ts")))
    }).as(s"__c_$d")
    val keys = candidates.map { case (_, i) =>
      RrdStore.readRra(spark, s"$path/rra$i").select(series.map(col): _*) }
      .reduce(_.unionByName(_)).distinct()
    var frame = graft.query.Fetch.grid(spark, loTs, hiTs, step)
      .crossJoin(keys)
      .select(series.map(col) :+ col("ts") :++
        dsCols.map(d => lit(null).cast("double").as(d)): _*)
    candidates.foreach { case (o, i) =>
      val c = schema.stepSec * o.pdpCnt
      // clip to the candidate's ring reach: rowCnt rows back from its
      // newest slot — the reference can only read what the ring holds,
      // while append storage may retain more
      val w = Window.partitionBy(series.map(col): _*)
      val src = RrdStore.readRra(spark, s"$path/rra$i")
        .withColumn("__last", max(col("ts")).over(w))
        .where(col("ts") > col("__last") - lit(o.rowCnt * c))
      val contrib = src
        .withColumn("__t", explode(sequence(
          (expr(s"(ts - $c) div $step") + 1) * step,
          expr(s"(ts + ${step - 1}) div $step") * step,
          lit(step))))
        .where(col("__t") > loTs && col("__t") <= hiTs)
        .groupBy((series.map(col) :+ col("__t")): _*)
        .agg(cfAgg(dsCols.head), dsCols.tail.map(cfAgg): _*)
        .withColumnRenamed("__t", "ts")
      frame = frame.join(contrib, series :+ "ts", "left")
        .select(series.map(col) :+ col("ts") :++
          dsCols.map(d => coalesce(col(d), col(s"__c_$d")).as(d)): _*)
    }
    Some(frame)
  }

  /** Rows a GROW exposes populate from sibling RRAs over the newly
    * reachable window (rrd_modify.c:639-640 calling populate_row for
    * the added rows). */
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
    populate(spark, path, rraIdx, lo, hi, series).foreach { frame =>
      val dsCols = schema.ds.map(_.name).filter(cur.columns.contains)
      val filled = frame
        .select(series.map(col) :+ col("ts") :++ dsCols.map(col): _*)
        .where(dsCols.map(col(_).isNotNull).reduce(_ || _))
        // never duplicate a slot the table already holds
        .join(cur.select((series :+ "ts").map(col): _*),
          series :+ "ts", "left_anti")
      RrdStore.writeSwap(filled.unionByName(cur.select(
        (series.map(col) :+ col("ts")) :++ dsCols.map(col): _*)), target)
    }
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

  /** RRA:<spec> (rrd_modify.c:1283-1345): new rollup, immediately
    * populated from sibling RRAs (populate_row via add_rras) — the
    * dump-equality invariant of tests/modify4/5: adding
    * `RRA:AVERAGE:0.5:4:10` to a store must reproduce the rows a store
    * that carried the RRA from creation would hold. The newest row ends
    * at the last completed CDP boundary (floor(last_up / rraStep)). */
  def addRra(spark: SparkSession, path: String, rra: RraDef,
      series: Seq[String]): Unit = {
    rewriteSchema(path)(s => s.copy(rras = s.rras :+ rra))
    val schema = RrdStore.readSchema(path)
    val idx = schema.rras.size - 1
    val step = schema.stepSec * rra.pdpCnt
    val hi = math.floorDiv(
      RrdStore.lastUpdateSec(spark, path), step) * step
    populate(spark, path, idx, hi - rra.rowCnt * step, hi, series)
      .foreach { frame =>
        val dsCols = schema.ds.map(_.name)
        val filled = frame
          .where(dsCols.map(col(_).isNotNull).reduce(_ || _))
        if (!filled.isEmpty)
          RrdStore.writeSwap(filled, s"$path/rra$idx")
      }
  }

  /** DELRRA:<n> (rrd_modify.c:980-1070, the inverse of add_rras): drop
    * rollup n; later RRAs shift down one index — tests/modify4's
    * invariant is that DELRRA:5 on a six-RRA store dump-equals the
    * five-RRA store that never had it. */
  def delRra(path: String, rraIdx: Int): Unit = {
    val schema = RrdStore.readSchema(path)
    require(rraIdx >= 0 && rraIdx < schema.rras.size, s"no RRA #$rraIdx")
    require(schema.rras.size > 1, "an RRD needs at least one RRA")
    rewriteSchema(path)(s => s.copy(rras = s.rras.patch(rraIdx, Nil, 1)))
    def shift(prefix: String): Unit = {
      deleteRecursively(java.nio.file.Paths.get(s"$path/$prefix$rraIdx"))
      (rraIdx + 1 until schema.rras.size).foreach { i =>
        val from = java.nio.file.Paths.get(s"$path/$prefix$i")
        if (java.nio.file.Files.exists(from))
          java.nio.file.Files.move(from,
            java.nio.file.Paths.get(s"$path/$prefix${i - 1}"))
      }
    }
    shift("rra")
    shift("hwstate/rra")
  }

  /** RRA#<n>:[+-]<rows> (rrd_modify.c:1382). */
  def resizeRra(spark: SparkSession, path: String, rraIdx: Int,
      deltaRows: Long, series: Seq[String]): Unit =
    resize(spark, path, rraIdx, deltaRows, series)

  private def rewrite(spark: SparkSession, p: String)(
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit =
    // single write + atomic directory swap (the round-2 version wrote the
    // data twice and could crash between overwrites with no full copy);
    // readRra strips the appendBatch partition column, so a modify
    // degrades the layout to flat and the next merge re-partitions
    RrdStore.writeSwap(f(RrdStore.readRra(spark, p)), p)

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    RrdStore.deleteRecursively(p)
}
