package graft

import java.nio.file.{Files, Paths}

/** The correctness-artifact contract (round-5 lesson): a throwing query
  * must surface as an error ENTRY in the dump, never as a silent
  * absence, and a clean run must still write an empty `_errors.json`
  * so "file missing" is distinguishable from "no errors".
  */
class VerifySpec extends SparkSuite {

  test("a failing query lands in _errors.json, not a silent absence") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    // Nonexistent sfDir: the query throws at read time.
    val errs = Verify.run(spark, "/nonexistent/sfdir", out,
      only = Some(Set("q01_tpch_q1")))
    assert(errs.keySet == Set("q01_tpch_q1"), errs)
    val json = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(json.contains("\"q01_tpch_q1\""), json)
    assert(!Files.exists(Paths.get(s"$out/q01_tpch_q1")),
      "no parquet should exist for a failed query")
    // oracle_sql.json is still written — the driver can always see what
    // SHOULD have run
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json"))
      .contains("\"q01_tpch_q1\""))
  }

  test("a clean run writes results and an empty _errors.json") {
    val out = Files.createTempDirectory("graft-verify-ok").toString
    val errs = Verify.run(spark, sf, out, only = Some(Set("q01_tpch_q1")))
    assert(errs.isEmpty, errs)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) == "{}")
    assert(Files.exists(Paths.get(s"$out/q01_tpch_q1")))
    assert(spark.read.parquet(s"$out/q01_tpch_q1").count() > 0)
  }
}
