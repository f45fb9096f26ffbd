// Diagnostic: stage profile of the q112 chain (LSH mine → connected
// components → savings rollup) at a given dir — the q16 stage-table
// idiom. Run: sbt 'runMain graft.tools.ProfileQ112 [dir] [reps]'
package graft.tools

import org.apache.spark.sql.functions._

object ProfileQ112 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to reps).foreach { i =>
      System.err.println(s"[prof] === rep $i ===")
      val d = graft.Tables.documents(spark, dir)
      val sig = t("minhashSignatures consume") {
        val s = graft.ext.Dedup.minhashSignatures(d, "doc_id", "text")
        s.write.format("noop").mode("overwrite").save(); s
      }
      val cand = t("lshCandidates consume") {
        val c = graft.ext.Dedup
          .lshCandidates(d, "doc_id", "text", 3, 16, 4)
          .where(col("sig_agreement") >= 0.25)
        c.write.format("noop").mode("overwrite").save(); c
      }
      val comp = t("connectedComponents") {
        graft.ext.Dedup.connectedComponents(cand, "id1", "id2")
      }
      t("comp consume") {
        comp.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
