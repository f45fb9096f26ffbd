// Diagnostic: write `.explain("formatted")` for named queries to files
// (the optimization-round evidence trail: plans/rNN/<query>_before.txt
// and _after.txt). Run:
//   sbt 'runMain graft.tools.PlanDump <outDir> <suffix> [q26,q131,...]'
// e.g. runMain graft.tools.PlanDump plans/r15 before q26,q131
// Selectors match the Bench rule: exact name or qNN prefix up to "_".
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
    val suffix = args.lift(1).getOrElse("before")
    val only = args.lift(2).map(_.split(",").filter(_.nonEmpty).toSet)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Tables.warehouseDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def sel(s: String, name: String): Boolean =
      name == s || name.startsWith(s + "_")
    graft.SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(sel(_, name))) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
          System.err.println(s"[plandump] wrote $name ($suffix)")
        } catch {
          case t: Throwable =>
            System.err.println(s"[plandump] $name FAILED: $t")
        }
      }
    spark.stop()
  }
}
