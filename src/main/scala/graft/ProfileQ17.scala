package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ingest.{Rates, Normalize, Consolidate}
import graft.model.{Cf, Dst, DsDef}

/** Throwaway diagnostic for the q17 weak-perf flag: stage times at
  * sf0.1 (warm pairs, same JVM). Delete after the findings land. */
object ProfileQ17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def consume(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def timeWarm(name: String, mk: () => DataFrame): Unit = {
      consume(mk()); val a = consume(mk()); val b = consume(mk())
      System.err.println(f"[q17prof] $name%-34s ${math.min(a, b)}%7.2f s")
    }

    def rated = Rates.withRate(Tables.events(spark, dir), Seq("user_id"),
      "ts_us", "event_id", "value",
      DsDef("v", Dst.Gauge, heartbeatSec = 7200L))
    def pdp = Normalize.pdp(rated, Seq("user_id"), "ts_us",
      "rate", 300L, rateScale = Some(2))
    def cdp = Consolidate.cdp(pdp, Seq("user_id"), "pdp_ts", "pdp",
      300L, 12L, Cf.Average, 0.5, sumType = DecimalType(18, 10))

    timeWarm("pdp (no sort)", () => pdp)
    timeWarm("pdp count only", () => pdp.groupBy().count())
    timeWarm("cdp (no sort)", () => cdp)
    timeWarm("cdp + orderBy (q17)", () =>
      cdp.orderBy("user_id", "cdp_ts"))
    // how much of cdp is the decimal agg vs the pdp generation:
    timeWarm("cdp over CACHED pdp", () => {
      val p = pdp.cache()
      p.count(): Unit
      val out = Consolidate.cdp(p, Seq("user_id"), "pdp_ts", "pdp",
        300L, 12L, Cf.Average, 0.5, sumType = DecimalType(18, 10))
      out
    })
    spark.stop()
  }
}
