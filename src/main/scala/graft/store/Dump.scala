package graft.store

import java.nio.file.{Files, Paths}

import graft.model.{Cf, Dst, RrdSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dump / restore / info / list — the introspection and portability
  * surface (SURVEY.md §2.1 items 6-7, 10 and §2.3 item 34;
  * /root/reference/src/rrd_dump.c:106-433, rrd_restore.c,
  * rrd_info.c:143-330, rrd_list.c:146).
  *
  * The reference dumps one circular file to one XML document. Here a
  * store's portable form is a directory of JSON-lines row dumps (one per
  * RRA, schema in the header line) — `df.write.json`, so a 100 TB store
  * dumps and restores as distributed jobs, not a driver-side document.
  */
object Dump {

  /** Dump: schema sidecar + every RRA rollup as JSON lines. */
  def dump(spark: SparkSession, storePath: String, outPath: String): Unit = {
    val schema = RrdStore.readSchema(storePath)
    Files.createDirectories(Paths.get(outPath))
    Files.copy(Paths.get(storePath, "schema.rrd"),
      Paths.get(outPath, "schema.rrd"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    def copyTable(rel: String): Unit = {
      val p = Paths.get(storePath, rel)
      if (Files.exists(p)) {
        // readRra strips the physical partition column: a dump carries
        // the logical schema only (restore re-derives layout on merge)
        val df = RrdStore.readRra(spark, p.toString)
        df.write.mode("overwrite").json(s"$outPath/$rel")
        // JSON omits null fields and an empty RRA has no rows to infer
        // from — record the exact table schema so restore never guesses
        // (an all-unknown DS column must survive the round trip as null,
        // like the reference's NaN <row> values, rrd_dump.c:404-433)
        Files.write(Paths.get(outPath, s"$rel.schema".replace('/', '_')),
          df.schema.toDDL.getBytes("UTF-8"))
      }
    }
    schema.rras.indices.foreach { i =>
      copyTable(s"rra$i")
      // ingest scratch rides along: without the HW state a restored
      // store would silently restart its model on the next appendBatch,
      // and without the raw-sample tail it would lose rate-lag/bucket
      // continuity (both are the reference's pdp_prep/cdp_prep as data)
      schema.ds.foreach(d => copyTable(s"hwstate/rra$i/${d.name}"))
    }
    copyTable("tail")
  }

  /** Restore: rebuild a store directory from a dump. */
  def restore(spark: SparkSession, dumpPath: String,
      storePath: String): Unit = {
    val schema = readDumpSchema(dumpPath)
    RrdStore.create(storePath, schema)
    def readTable(rel: String): Unit = {
      val p = Paths.get(dumpPath, rel)
      if (Files.exists(p)) {
        val ddl = Paths.get(dumpPath, s"$rel.schema".replace('/', '_'))
        val reader =
          if (Files.exists(ddl)) spark.read.schema(
            org.apache.spark.sql.types.StructType.fromDDL(
              new String(Files.readAllBytes(ddl), "UTF-8")))
          else spark.read // pre-schema dumps: inference (best effort)
        reader.json(p.toString)
          .write.mode("overwrite").parquet(s"$storePath/$rel")
      }
    }
    schema.rras.indices.foreach { i =>
      readTable(s"rra$i")
      schema.ds.foreach(d => readTable(s"hwstate/rra$i/${d.name}"))
    }
    readTable("tail")
  }

  private def readDumpSchema(path: String): RrdSchema = {
    val lines = new String(
      Files.readAllBytes(Paths.get(path, "schema.rrd")), "UTF-8")
      .linesIterator.toSeq
    val Array(step, start) = lines.head.split(" ")
    RrdSchema.parse(step.toLong, start.toLong, lines.tail)
  }

  private def e10(v: Double): String =
    "%.10e".formatLocal(java.util.Locale.ROOT, v)

  /** info: the key/value tree of rrd_info (rrd_info.c:143-330), reduced
    * to the keys that exist under append storage (no header_size /
    * cur_row — the circular cursor has no equivalent; `last_update` is
    * the newest slot of the finest RRA rather than the raw sample time,
    * which the store does not persist).
    */
  def info(spark: SparkSession, storePath: String): Seq[(String, String)] = {
    val schema = RrdStore.readSchema(storePath)
    val finest = schema.rras.indices.minBy(i => schema.rras(i).pdpCnt)
    val lastUp = RrdStore.readRra(spark, s"$storePath/rra$finest")
      .agg(max("ts")).first().getLong(0)
    Seq("step" -> schema.stepSec.toString,
      "last_update" -> lastUp.toString) ++
      schema.ds.flatMap { d =>
        val n = d.name
        Seq(s"ds[$n].type" -> d.dst.name) ++
          (d.dst match {
            case Dst.Compute => Seq(s"ds[$n].cdef" -> d.rpn.get)
            case _ => Seq(
              s"ds[$n].minimal_heartbeat" -> d.heartbeatSec.toString,
              s"ds[$n].min" -> d.min.map(e10).getOrElse("NaN"),
              s"ds[$n].max" -> d.max.map(e10).getOrElse("NaN"))
          })
      } ++
      schema.rras.zipWithIndex.flatMap { case (r, i) =>
        Seq(s"rra[$i].cf" -> r.cf.name,
          s"rra[$i].rows" -> r.rowCnt.toString,
          s"rra[$i].pdp_per_row" -> r.pdpCnt.toString) ++
          (r.cf match {
            case Cf.Average | Cf.Min | Cf.Max | Cf.Last =>
              Seq(s"rra[$i].xff" -> e10(r.xff))
            case _ => r.hw.toSeq.flatMap(h =>
              Seq(s"rra[$i].alpha" -> e10(h.alpha),
                s"rra[$i].beta" -> e10(h.beta)))
          })
      }
  }

  /** list: enumerate stores (directories carrying a schema sidecar)
    * under a root, sorted — rrd_list.c:146's directory walk, with
    * tests/list1's full surface: a store path lists itself; a plain
    * directory listing shows stores AND navigable subdirectories
    * ("only lists RRDs and directories"); `recursive` walks the tree
    * returning store paths only, relative to the root ("recursive
    * list only lists rrd files"). */
  def list(root: String, recursive: Boolean = false): Seq[String] = {
    // rrd_list_r's guards (rrd_list.c:163-200): no climbing out of the
    // tree; wildcards glob one listing and never combine with recursive
    require(!root.contains(".."), s"list: '..' forbidden in '$root'")
    if (root.exists(c => c == '*' || c == '?')) {
      require(!recursive, "list: recursive list with wildcards forbidden")
      return globList(root)
    }
    val r = Paths.get(root)
    def isStore(p: java.nio.file.Path): Boolean =
      Files.exists(p.resolve("schema.rrd"))
    if (!Files.isDirectory(r)) Seq.empty
    else if (isStore(r)) Seq(r.getFileName.toString)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (recursive) {
        scala.util.Using.resource(Files.walk(r)) { s =>
          s.forEach { p =>
            if (Files.isDirectory(p) && isStore(p))
              out += r.relativize(p).toString
          }
        }
      } else {
        scala.util.Using.resource(Files.list(r)) { s =>
          s.forEach { p =>
            if (Files.isDirectory(p)) out += p.getFileName.toString
          }
        }
      }
      out.sorted.toSeq
    }
  }

  /** Wildcard form of [[list]] (rrd_list.c:170-205's glob() branch):
    * every match's basename, sorted; `*`/`?` do not cross `/`, like
    * glob(3). */
  private def globList(pattern: String): Seq[String] = {
    val p = Paths.get(pattern).toAbsolutePath
    val segs = (0 until p.getNameCount).map(p.getName(_).toString)
    val wild = segs.indexWhere(_.exists(c => c == '*' || c == '?'))
    val base = segs.take(wild).foldLeft(p.getRoot)(_.resolve(_))
    if (!Files.isDirectory(base)) return Seq.empty
    val matcher = base.getFileSystem.getPathMatcher("glob:" + p)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val s = Files.walk(base, segs.length - wild)
    try s.forEach { q =>
      if (matcher.matches(q)) out += q.getFileName.toString
    } finally s.close()
    out.sorted.toSeq
  }
}
