package graft

import org.apache.spark.sql.functions._

/** The reliable-checkpoint branch of connectedComponents (used when the
  * context has a checkpoint dir — the 100 TB mode, where executor loss
  * must not lose round state) was code-reviewed but only the
  * localCheckpoint branch ran in CI. This spec runs the operator in
  * reliable mode end-to-end and pins BOTH properties: the labels are
  * correct, and per-round checkpoint dirs are deleted as soon as the
  * next round materializes — only the live result's final round may
  * remain on disk (Spark's own cleaner would otherwise leave one dead
  * frame copy per round until driver GC).
  */
class DedupCheckpointSpec extends SparkSuite {
  import spark.implicits._

  private def rddDirs(root: String): Seq[String] = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(q => q.getFileName != null &&
          q.getFileName.toString.startsWith("rdd-"))
        .map(_.toString).toSeq
    }
  }

  test("reliable-checkpoint CC: correct labels, no per-round dir leak") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    sc.setCheckpointDir(dir)
    try {
      assert(sc.getCheckpointDir.isDefined, "reliable mode not armed")
      // two chain components: pointer jumping needs several rounds on a
      // 64-node path (diameter 63), so a leak would show many rdd-* dirs
      val chain1 = (0L until 63L).map(i => (i, i + 1))
      val chain2 = (100L until 110L).map(i => (i, i + 1))
      val pairs = (chain1 ++ chain2).toDF("id1", "id2")
      // maxDriverEdges = 0 forces the DISTRIBUTED branch — the one this
      // spec exists to exercise (the driver union-find path would
      // otherwise absorb a graph this small)
      val cc = ext.Dedup.connectedComponents(pairs, "id1", "id2",
        maxDriverEdges = 0L)
      val got = cc.as[(Long, Long)].collect().toMap
      assert(got.size == 64 + 11)
      assert((0L to 63L).forall(n => got(n) == 0L), s"chain1 labels: $got")
      assert((100L to 110L).forall(n => got(n) == 100L), s"chain2: $got")
      // every intermediate round's checkpoint must be gone; the final
      // round backs the returned frame and legitimately remains
      val remaining = rddDirs(dir)
      assert(remaining.size <= 1,
        s"per-round checkpoints leaked (${remaining.size}): $remaining")
    } finally {
      // shared session across suites: disarm reliable mode so the other
      // dedup specs keep exercising the localCheckpoint branch
      try sc.setCheckpointDir(null)
      catch { case _: Exception => () }
      assert(sc.getCheckpointDir.isEmpty, "checkpoint dir must be unset")
    }
  }
}
