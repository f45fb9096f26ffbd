package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._

/** Pins the Bloom-filter decontamination operator:
  *   - position arithmetic matches an independent hex parse of the md5
  *     digest (the SQL oracle's conv(substr(md5,...)) reading);
  *   - on real documents the Bloom report is a SUPERSET of the exact
  *     broadcast-shingle report with identical rows wherever both
  *     appear (a Bloom hit count can only exceed the exact count);
  *   - a planted contaminated doc is flagged with full overlap.
  */
class BloomDecontaminateSpec extends SparkSuite {

  test("bloom positions match an independent digest computation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val md2 = java.security.MessageDigest.getInstance("MD5")
    Seq("alpha beta gamma", "x", "", "héllo wörld pé", "a b c d e")
      .foreach { s =>
        md2.reset()
        val hex = md2.digest(s.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val h0 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        val h1 = java.lang.Long.parseLong(hex.substring(16, 30), 16)
        val want = (0 until 4).map(j => ((h0 + j * h1) % 1048576).toInt)
        val got = Curation.bloomPositions(md, s, 4, 1 << 20).toSeq
        assert(got == want, s"positions diverge for '$s'")
      }
  }

  test("bloom report is a superset of the exact report on documents") {
    val d = Tables.documents(spark, sf)
    val corpus = d.where(col("doc_id") % 20 =!= 0)
    val eval = d.where(col("doc_id") % 20 === 0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val exact = toMap(Curation.decontaminate(
      corpus, eval, "doc_id", "text", k = 3, minHits = 2))
    val bloom = toMap(Curation.bloomDecontaminate(
      corpus, eval, "doc_id", "text", k = 3, minHits = 2))
    assert(exact.nonEmpty, "fixture produced no exact contamination")
    exact.foreach { case (id, (nSh, hits)) =>
      val (bn, bh) = bloom.getOrElse(id,
        fail(s"doc $id exact-flagged but missing from bloom report"))
      assert(bn == nSh, s"doc $id n_sh differs")
      assert(bh >= hits, s"doc $id bloom hits $bh < exact $hits")
    }
  }

  test("planted duplicate of an eval doc is flagged with full overlap") {
    import spark.implicits._
    val eval = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "completely unrelated words about something else entirely"))
      .toDF("doc_id", "text")
    val out = Curation.bloomDecontaminate(corpus, eval, "doc_id", "text",
      k = 3, minHits = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    assert(r.getLong(1) == r.getLong(2), "dup doc must hit every shingle")
    assert(r.getDouble(3) == 1.0)
  }
}
