package graft

import org.apache.spark.sql.functions._

/** Pins the size-adaptive connectedComponents branches against each
  * other: the driver-side open-addressed union-find (default path for
  * small integral-id graphs) must label every random graph exactly as
  * the distributed pointer-jumping loop (forced via maxDriverEdges = 0)
  * — and both must match a plain BFS oracle computed locally.
  */
class UnionFindSpec extends SparkSuite {

  /** Deterministic pseudo-random edge list: n nodes over a sparse id
    * space (collision-heavy small components plus long chains). */
  private def randomEdges(seed: Long, n: Int): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { // splitmix64
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val rand = (0 until n).map { _ =>
      val a = Math.floorMod(next(), 400L)
      val b = Math.floorMod(next(), 400L)
      (a, b)
    }.filter { case (a, b) => a != b }
    // plus one 120-node chain: diameter stress for the jumping loop
    val chain = (1000L until 1120L).map(i => (i, i + 1))
    rand ++ chain
  }

  private def bfsOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        // collect the whole component, then label it with its min id
        val seen = scala.collection.mutable.Set(start)
        val queue = scala.collection.mutable.Queue(start)
        while (queue.nonEmpty) {
          val x = queue.dequeue()
          adj(x).foreach(y => if (seen.add(y)) queue.enqueue(y))
        }
        val m = seen.min
        seen.foreach(x => label(x) = m)
      }
    }
    label.toMap
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver union-find == distributed loop == BFS oracle (random graphs)") {
    import spark.implicits._
    Seq(7L, 42L, 2026L).foreach { seed =>
      val edges = randomEdges(seed, 600)
      val pairs = edges.toDF("id1", "id2")
      val oracle = bfsOracle(edges)
      val driver = labelsOf(
        ext.Dedup.connectedComponents(pairs, "id1", "id2"))
      val loop = labelsOf(
        ext.Dedup.connectedComponents(pairs, "id1", "id2",
          maxDriverEdges = 0))
      assert(driver == oracle, s"driver branch diverged (seed $seed)")
      assert(loop == oracle, s"distributed loop diverged (seed $seed)")
    }
  }

  test("negative and extreme ids: MinValue routes to the loop, both agree") {
    import spark.implicits._
    // Long.MinValue aliases the driver table's empty sentinel, so the
    // driver branch must refuse it and the loop must still label it
    val edges = Seq(
      (Long.MinValue, -5L), (-5L, -2L), (3L, 9L), (9L, 11L),
      (Long.MaxValue, 3L))
    val pairs = edges.toDF("id1", "id2")
    val oracle = bfsOracle(edges)
    val both = Seq(
      ext.Dedup.connectedComponents(pairs, "id1", "id2"),
      ext.Dedup.connectedComponents(pairs, "id1", "id2",
        maxDriverEdges = 0))
    both.foreach(df => assert(labelsOf(df) == oracle))
    // and plain negatives WITHOUT MinValue take the driver branch fine
    val neg = Seq((-10L, -3L), (-3L, 4L), (100L, 200L))
    assert(labelsOf(ext.Dedup.connectedComponents(
      neg.toDF("id1", "id2"), "id1", "id2")) == bfsOracle(neg))
  }
}
