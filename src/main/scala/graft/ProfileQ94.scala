package graft

import org.apache.spark.sql.functions._

/** Stage profile for the q94 candidate-verify chain at a given dir:
  * times mining, materialization, the semi-joined shingle pass, and the
  * final joins separately (the q16 stage-table idiom). Diagnostic only.
  */
object ProfileQ94 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100")
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
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables.documents(spark, dir)
    println(s"[prof] docs = ${t("docs.count")(d.count())}")
    val cand = t("mine+materialize cand") {
      ext.Dedup.materialize(
        ext.Dedup.lshCandidates(d, "doc_id", "text", 3, 16, 4)
          .select("id1", "id2"))
    }
    println(s"[prof] cand pairs = ${t("cand.count")(cand.count())}")
    val ids = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    println(s"[prof] distinct ids = ${t("ids.count")(ids.count())}")
    val sh = t("shingle pass+materialize") {
      ext.Dedup.materialize(ext.Dedup.shingleArrays(
        d.join(broadcast(ids), Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3))
    }
    println(s"[prof] sh rows = ${t("sh.count")(sh.count())}")
    val joined = cand
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
    val inter = size(array_intersect(col("sh1"), col("sh2")))
    val mn = least(size(col("sh1")), size(col("sh2")))
    val out = joined.select(col("id1"), col("id2"),
        (inter.cast("double") / mn.cast("double")).as("containment"))
      .where(col("containment") >= 0.6)
    println(s"[prof] out rows = ${t("verify joins+filter")(out.count())}")
    spark.stop()
  }
}
