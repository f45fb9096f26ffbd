// Diagnostic: dump the plan fragments PlanAuditSpec pins (scan
// pruning, exchange reuse) for hand inspection when tuning a query.
// Run: sbt 'runMain graft.tools.PlanProbe'
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val q1 = graft.SparkEntry.queries("q01_tpch_q1")(spark, dir)
    val p1 = q1.queryExecution.explainString(ExplainMode.fromString("formatted"))
    println("=== q01 scan lines ===")
    p1.linesIterator.filter(l => l.contains("PushedFilters") ||
      l.contains("ReadSchema") || l.contains("Scan")).foreach(println)
    val q27 = graft.SparkEntry.queries("q27_minhash_lsh")(spark, dir)
    q27.collect()
    println("=== q27 executed plan reuse ===")
    val ex = q27.queryExecution.executedPlan.toString
    println("ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(ex).size)
    println("Reused in formatted: " + "ReusedExchange".r.findAllIn(
      q27.queryExecution.explainString(
        ExplainMode.fromString("formatted"))).size)
    spark.stop()
  }
}
