package graft

import graft.cli.Commands

/** Port of the reference's `tests/vformatter1` golden: PRINT value /
  * sampling-timestamp / value-timestamp / value-duration formatting
  * across the no-data, zero, and 3000 states of a LAST RRA
  * (TZ=UTC per the script). Expected strings are copied verbatim from
  * /root/reference/tests/vformatter1:29-58 (minus the `0x0` graph-size
  * line, which is rendering surface). */
class VformatterGoldenSpec extends SparkSuite {

  private def prints(c: Commands, path: String, fmt: String): String =
    c.graphv(Seq("--start", "1420070400", "--end", "1420071000",
      s"DEF:dv=$path:v:LAST", "VDEF:v=dv,LAST", fmt)).prints.head

  test("tests/vformatter1 PRINT goldens (no data / zero / 3000)") {
    val c = new Commands(spark, nowSec = 1420071000L)
    val path = java.nio.file.Files.createTempDirectory("graft_vfmt").toString
    c.create(path, Seq("--start", "1420070400", "--step", "60",
      "DS:v:GAUGE:60:U:U", "RRA:LAST:0:1:10"))

    // no data
    assert(prints(c, path, "PRINT:v:%0.1lf") == "nan")
    assert(prints(c, path, "PRINT:v:%F %T:strftime")
      == "---------- --:--:--")
    assert(prints(c, path, "PRINT:v:%F %T:valstrftime") == "nan")
    assert(prints(c, path, "PRINT:v::valstrfduration") == "nan")

    // one sample: 1420070460:0
    c.update(path, Seq("1420070460:0"), template = Some(Seq("v")))
    assert(prints(c, path, "PRINT:v:%0.1lf") == "0.0")
    assert(prints(c, path, "PRINT:v:%F %T:strftime")
      == "2015-01-01 00:01:00")
    assert(prints(c, path, "PRINT:v:%F %T:valstrftime")
      == "1970-01-01 00:00:00")
    assert(prints(c, path, "PRINT:v:%H_%02m_%02s_%03f:valstrfduration")
      == "0_00_00_000")

    // second sample: 1420070520:3000
    c.update(path, Seq("1420070520:3000"), template = Some(Seq("v")))
    assert(prints(c, path, "PRINT:v:%0.1lf") == "3000.0")
    assert(prints(c, path, "PRINT:v:%F %T:strftime")
      == "2015-01-01 00:02:00")
    assert(prints(c, path, "PRINT:v:%F %T:valstrftime")
      == "1970-01-01 00:50:00")
    assert(prints(c, path, "PRINT:v:%H_%02m_%02s_%03f:valstrfduration")
      == "0_00_03_000")
  }
}
