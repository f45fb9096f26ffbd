package graft

import graft.query.Cdef
import graft.rpn.{RToken, RpnCompiler, RpnInterpreter}
import org.apache.spark.sql.functions._

/** RPN semantics: interpreter unit checks against hand-computed reference
  * values, then compiler ↔ interpreter equivalence over a series with
  * unknowns (the compiler must reproduce the interpreter, which is the
  * faithful port of rrd_rpncalc.c).
  */
class RpnSpec extends SparkSuite {
  private val NaN = Double.NaN
  private val ts: Array[Long] = (1 to 8).map(i => 1704067200L + i * 300L).toArray
  private val a: Array[Double] =
    Array(1.0, NaN, 3.0, -4.0, 5.5, NaN, 120.0, 0.0)
  private val b: Array[Double] =
    Array(2.0, 2.0, NaN, 1.0, -2.5, NaN, 60.0, 7.0)

  private def run(e: String): Array[Double] =
    RpnInterpreter.eval(e, Map("a" -> a, "b" -> b), ts, 300L)

  private def isNaNEq(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || x == y

  test("tokenizer") {
    val t = RToken.tokenize("a,-1.5,PREV(b),MAX,IF")
    assert(t == Seq(RToken.Var("a"), RToken.Num(-1.5), RToken.PrevVar("b"),
      RToken.Fn("MAX"), RToken.Fn("IF")))
    assert(RToken.needsInterpreter(RToken.tokenize("PREV,1,+")))
    assert(!RToken.needsInterpreter(RToken.tokenize("PREV(a),1,+")))
  }

  test("NaN contamination and the NaN-tolerant variants") {
    assert(run("a,b,+")(1).isNaN)               // NaN + 2
    assert(run("a,b,ADDNAN")(1) == 2.0)         // NaN treated as 0
    assert(run("a,b,ADDNAN")(5).isNaN)          // both NaN
    assert(run("a,b,MIN")(2).isNaN)             // NaN wins
    assert(run("a,b,MINNAN")(2) == 3.0)         // NaN ignored
    assert(run("a,b,LT")(1).isNaN)              // comparison contaminated
    assert(run("a,b,LT")(0) == 1.0)
    assert(run("a,UN")(1) == 1.0 && run("a,UN")(0) == 0.0)
    assert(run("a,0,50,LIMIT")(6).isNaN)        // 120 outside [0,50]
    assert(run("a,0,50,LIMIT")(4) == 5.5)
  }

  test("IF treats unknown/zero as false; PREV is previous output") {
    val r = run("a,UN,b,a,IF") // unknown a → b
    assert(r(1) == 2.0 && r(0) == 1.0)
    val ff = run("a,UN,PREV,a,IF") // forward fill
    assert(ff.toSeq.zip(Seq(1.0, 1.0, 3.0, -4.0, 5.5, 5.5, 120.0, 0.0))
      .forall((isNaNEq _).tupled))
  }

  test("set ops: AVG/MEDIAN/STDEV/PERCENT/SORT NaN rules") {
    assert(run("a,b,2,AVG")(1) == 2.0)          // NaN skipped
    assert(run("a,b,2,AVG")(5).isNaN)
    assert(run("a,b,2,MEDIAN")(0) == 1.5)
    assert(run("a,b,2,SMAX")(2) == 3.0)
    assert(run("1,5,3,9,4,100,4,PERCENT").forall(_ == 9.0)) // max of 4
    val st = run("2,4,2,STDEV")
    assert(math.abs(st(0) - math.sqrt(2.0)) < 1e-15) // stdev({2,4}) n-1
  }

  test("TREND vs TRENDNAN") {
    val t = run("a,900,TREND")    // 3 slots, NaN propagates
    val tn = run("a,900,TRENDNAN")
    assert(t(0).isNaN && t(1).isNaN)            // not enough history
    assert(t(2).isNaN)                          // window has NaN
    assert(t(4) == (3.0 - 4.0 + 5.5) / 3)
    assert(tn(2) == 2.0)                        // (1+3)/2 skipping NaN
  }

  test("PREDICT seasonal mean (doc semantics)") {
    // series c: 1..8; shift 600s (2 slots), window 0 ⇒ value two slots back
    val c = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val r = RpnInterpreter.eval("600,1,0,c,PREDICT", Map("c" -> c), ts, 300L)
    // offsets must satisfy 0 <= off < idx (the reference's strict bound
    // excludes row 0 and the current row's own shift landing on it)
    assert(r(0).isNaN && r(1).isNaN && r(2).isNaN)
    assert(r(3) == 2.0 && r(7) == 6.0)
  }

  test("LTIME adds the local UTC offset (TZ=Europe/Zurich like the reference harness)") {
    import spark.implicits._
    // 2024-01-15 (CET, +1h) and 2024-07-15 (CEST, +2h)
    val winter = 1705312800L
    val summer = 1721023200L
    val tsArr = Array(winter, summer)
    val r = RpnInterpreter.eval("LTIME,TIME,-", Map.empty, tsArr, 300L,
      timeZone = "Europe/Zurich")
    assert(r(0) == 3600.0 && r(1) == 7200.0)
    // compiled path agrees
    val df = Seq(winter, summer).toDF("ts")
    val ctx = RpnCompiler.Ctx(Map.empty, org.apache.spark.sql.functions.col("ts"),
      300L, org.apache.spark.sql.expressions.Window.orderBy("ts"),
      timeZone = "Europe/Zurich")
    val out = df.withColumn("d", RpnCompiler.compile("LTIME,TIME,-", ctx))
      .orderBy("ts").select("d").as[Double].collect()
    assert(out.toSeq == Seq(3600.0, 7200.0))
  }

  test("compiler matches interpreter on the pointwise + windowed subset") {
    import spark.implicits._
    val rows = ts.indices.map(i => (ts(i),
      if (a(i).isNaN) null else java.lang.Double.valueOf(a(i)),
      if (b(i).isNaN) null else java.lang.Double.valueOf(b(i))))
    val df = rows.toDF("ts", "a", "b")
    val exprs = Seq(
      "a,b,+", "a,b,-", "a,b,*", "a,b,/", "a,b,%", "a,b,ADDNAN",
      "a,2,POW", "a,ABS,SQRT", "a,EXP,LOG", "a,SIN,COS", "a,ATAN",
      "a,b,ATAN2", "a,FLOOR", "a,CEIL", "a,ROUND", "a,DEG2RAD,RAD2DEG",
      "a,b,LT", "a,b,LE", "a,b,GT", "a,b,GE", "a,b,EQ", "a,b,NE",
      "a,UN", "a,ISINF", "INF,ISINF", "a,b,MIN", "a,b,MAX",
      "a,b,MINNAN", "a,b,MAXNAN", "a,0,50,LIMIT", "a,UN,b,a,IF",
      "a,b,EXC,POP", "a,DUP,+", "a,b,2,AVG", "a,b,2,SMIN", "a,b,2,SMAX",
      "a,b,2,MEDIAN", "a,b,2,STDEV", "a,b,50,2,PERCENT",
      "a,b,DEPTH,+,POP", "1,2,3,2,INDEX,+,+,+",
      "TIME,STEPWIDTH,+", "COUNT,a,ADDNAN", "PREV(a),a,ADDNAN",
      "NEWDAY,NEWMONTH,+", "a,900,TREND", "a,900,TRENDNAN",
      "UNKN,a,ADDNAN", "NEGINF,a,MAXNAN",
      // stack-manipulation + SORT push-back order (compiled SORT must
      // leave the largest on top exactly like the interpreter loop)
      "a,b,2,SORT,EXC,POP", "a,b,2,SORT,-", "a,b,2,REV,-",
      "a,b,2,COPY,+,+,+", "a,b,7,3,1,ROLL,-,+",
      "a,b,5,3,2,ROLL,-,-")
    val named = exprs.zipWithIndex
      .map { case (e, i) => (f"e$i%02d", e) }
    val out = Cdef.compiled(df, Nil, "ts", Seq("a", "b"),
        scala.collection.immutable.ListMap(named: _*), 300L)
      .orderBy("ts").collect()
    named.foreach { case (name, e) =>
      val want = RpnInterpreter.eval(e, Map("a" -> a, "b" -> b), ts, 300L)
      val got = out.map(r => r.getAs[Any](name) match {
        case null => Double.NaN
        case d: java.lang.Double => d.doubleValue
      })
      ts.indices.foreach { i =>
        assert(isNaNEq(got(i), want(i)),
          s"$name='$e' slot $i: compiled=${got(i)} interpreted=${want(i)}")
      }
    }
  }
}
