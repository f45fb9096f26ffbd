package graft.rpn

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RPN → Catalyst `Column` compiler (SURVEY.md §4 item 1).
  *
  * The stack exists only at compile time: each RPN op pops/pushes Scala
  * stack entries holding Column expressions, so stack-manipulation ops
  * (DUP/EXC/POP/DEPTH/COPY/INDEX/ROLL) cost nothing at runtime and the
  * whole expression compiles to one codegen-friendly projection.
  *
  * Unknown = SQL NULL (SURVEY.md §1.4). The reference's NaN-contamination
  * rules (/root/reference/src/rrd_rpncalc.c:860-977) map onto Spark's
  * null propagation; the deviations (ADDNAN, MINNAN/MAXNAN, IF, UN,
  * ISINF, LIMIT, NaN-first sorting) are spelled out per-op below.
  *
  * Not compilable: self-referential PREV and PREDICT* — use
  * [[RpnInterpreter]] (RToken.needsInterpreter decides).
  */
object RpnCompiler {

  /** Context binding vnames to columns plus the slot clock.
    *
    * @param series  vname → value column (aligned series)
    * @param tsSec   slot timestamp, epoch seconds (end-labeled)
    * @param stepSec slot width
    * @param window  per-series window ordered by slot time (no frame);
    *                used by TREND/COUNT/PREV(vname)
    * @param nowSec  pinned wall clock for NOW (determinism)
    * @param firstWeekday NEWWEEK boundary day, 0=Sunday (the reference
    *                asks the locale, /root/reference/src/rrd_rpncalc.c:548-596)
    * @param timeZone IANA zone for LTIME/NEW* local-time semantics (the
    *                reference uses the process TZ; its test harness pins
    *                Europe/Zurich, tests/functions:2)
    */
  final case class Ctx(
      series: Map[String, Column],
      tsSec: Column,
      stepSec: Long,
      window: WindowSpec,
      nowSec: Long = 0L,
      firstWeekday: Int = 0,
      timeZone: String = "UTC")

  private final case class SE(col: Column, const: Option[Double])
  private def se(c: Column): SE = SE(c, None)

  def compile(expr: String, ctx: Ctx): Column =
    compileTokens(RToken.tokenize(expr), ctx)

  def compileTokens(tokens: Seq[RToken], ctx: Ctx): Column = {
    var st = List.empty[SE] // head = top of stack

    def pop(): SE = st match {
      case h :: t => st = t; h
      case Nil => throw new IllegalArgumentException("RPN stack underflow")
    }
    def push(c: Column): Unit = st = se(c) :: st
    def popConst(what: String): Double = pop().const.getOrElse(
      throw new IllegalArgumentException(s"$what needs a literal count"))
    def popN(n: Int): Seq[Column] = // top-first
      (0 until n).map(_ => pop().col)
    def binop(f: (Column, Column) => Column): Unit = {
      val b = pop().col; val a = pop().col; push(f(a, b))
    }
    def unop(f: Column => Column): Unit = { val a = pop().col; push(f(a)) }
    /** cmp with the reference's contamination rule: either side unknown ⇒
      * unknown — Spark comparison null-propagation does exactly this. */
    def cmp(f: (Column, Column) => Column): Unit =
      binop((a, b) => f(a, b).cast("double"))
    /** NaN-first comparator for SORT/PERCENT
      * (/root/reference/src/rrd_rpncalc.c:524-546): unknown < -INF < x < INF. */
    def nanFirst(x: Column, y: Column): Column =
      when(x.isNull && y.isNull, 0)
        .when(x.isNull, -1).when(y.isNull, 1)
        .when(x < y, -1).when(x > y, 1).otherwise(0)
    /** Time-bucket boundary detection for NEWDAY/… (the slot is a "new X"
      * when the bucket of ts differs from the bucket of ts-step). The
      * reference evaluates these on the LOCAL clock (localtime_r,
      * rrd_rpncalc.c:713-744), so buckets run on the tz-shifted epoch. */
    def boundary(bucket: Column => Column): Unit = {
      def local(t: Column): Column =
        if (ctx.timeZone == "UTC") t
        else from_utc_timestamp(tsOf(t), ctx.timeZone).cast("long")
      val t = ctx.tsSec
      push((bucket(local(t)) =!= bucket(local(t - ctx.stepSec)))
        .cast("double"))
    }
    def tsOf(c: Column): Column = timestamp_seconds(c)

    tokens.foreach {
      case RToken.Num(v) => st = SE(lit(v), Some(v)) :: st
      case RToken.Var(name) => push(ctx.series.getOrElse(name,
        throw new IllegalArgumentException(s"unknown vname '$name'")))
      case RToken.PrevVar(name) => // PREV(vname): previous slot's value
        push(lag(ctx.series(name), 1).over(ctx.window))
      case RToken.Fn(op) => op match {
        // ---- pushes (rrd_rpncalc.c:647-744)
        case "UNKN" => push(lit(null).cast("double"))
        case "INF" => push(lit(Double.PositiveInfinity))
        case "NEGINF" => push(lit(Double.NegativeInfinity))
        case "NOW" => push(lit(ctx.nowSec.toDouble))
        case "TIME" => push(ctx.tsSec.cast("double"))
        case "LTIME" => // ts + utc-offset(tz, ts): rrd_rpncalc.c:709,1450-1478
          push(from_utc_timestamp(tsOf(ctx.tsSec), ctx.timeZone)
            .cast("long").cast("double"))
        case "STEPWIDTH" => push(lit(ctx.stepSec.toDouble))
        case "COUNT" => push(row_number().over(ctx.window).cast("double"))
        case "NEWDAY" => boundary(t => floor(t / 86400L))
        case "NEWWEEK" =>
          // epoch day 0 = Thursday(4); shift so weeks break on firstWeekday
          val shift = java.lang.Math.floorMod(4 - ctx.firstWeekday, 7)
          boundary(t => floor((floor(t / 86400L) + shift) / 7))
        case "NEWMONTH" => boundary(t => trunc(tsOf(t).cast("date"), "month"))
        case "NEWYEAR" => boundary(t => year(tsOf(t)))
        // ---- arithmetic (rrd_rpncalc.c:745-859)
        case "+" => binop(_ + _)
        case "-" => binop(_ - _)
        case "*" => binop(_ * _)
        case "/" => binop(_ / _)
        case "%" => binop(_ % _) // Spark Remainder == C fmod (dividend sign)
        case "ADDNAN" => binop((a, b) =>
          when(a.isNull, b).when(b.isNull, a).otherwise(a + b))
        case "POW" => binop(pow)
        case "SIN" => unop(sin); case "COS" => unop(cos)
        case "LOG" => unop(log) // natural log
        case "EXP" => unop(exp); case "SQRT" => unop(sqrt)
        case "ATAN" => unop(atan); case "ATAN2" => binop(atan2)
        // Spark floor/ceil return LONG; C keeps double (and ±Inf)
        case "FLOOR" => unop(c =>
          when(abs(c) === lit(Double.PositiveInfinity), c)
            .otherwise(floor(c).cast("double")))
        case "CEIL" => unop(c =>
          when(abs(c) === lit(Double.PositiveInfinity), c)
            .otherwise(ceil(c).cast("double")))
        case "ROUND" => unop(c => round(c, 0)) // HALF_UP == C round()
        case "ABS" => unop(abs)
        // exact reference constants, not radians()/degrees()
        // (rrd_rpncalc.c:803-810)
        case "DEG2RAD" => unop(_ * lit(0.0174532952))
        case "RAD2DEG" => unop(_ * lit(57.29577951))
        // ---- comparison / conditional (rrd_rpncalc.c:860-977)
        case "LT" => cmp(_ < _); case "LE" => cmp(_ <= _)
        case "GT" => cmp(_ > _); case "GE" => cmp(_ >= _)
        case "EQ" => cmp(_ === _); case "NE" => cmp(_ =!= _)
        case "UN" => unop(c => when(c.isNull, 1.0).otherwise(0.0))
        case "ISINF" => unop(c => // C isinf: NaN → 0
          when(c.isNull, 0.0).when(abs(c) === lit(Double.PositiveInfinity), 1.0)
            .otherwise(0.0))
        case "IF" => // (c,t,f): unknown/0 condition takes the else branch
          val f = pop().col; val t = pop().col; val c = pop().col
          push(when(c.isNull || c === 0.0, f).otherwise(t))
        case "MIN" => binop((a, b) => // unknown wins
          when(a.isNull || b.isNull, lit(null)).otherwise(least(a, b)))
        case "MAX" => binop((a, b) =>
          when(a.isNull || b.isNull, lit(null)).otherwise(greatest(a, b)))
        case "MINNAN" => binop(least(_, _)) // least/greatest skip nulls
        case "MAXNAN" => binop(greatest(_, _))
        case "LIMIT" => // (v,lo,hi): any unknown or outside ⇒ unknown
          val hi = pop().col; val lo = pop().col; val v = pop().col
          push(when(v.isNull || lo.isNull || hi.isNull, lit(null))
            .when(v < lo || v > hi, lit(null)).otherwise(v))
        // ---- stack manipulation: resolved at compile time
        case "DUP" => val a = pop(); st = a :: a :: st
        case "POP" => pop(); ()
        case "EXC" => val b = pop(); val a = pop(); st = a :: b :: st
        case "DEPTH" => push(lit(st.size.toDouble))
        case "COPY" =>
          val n = popConst("COPY").toInt
          st = st.take(n) ::: st
        case "INDEX" =>
          val n = popConst("INDEX").toInt
          st = st(n - 1) :: st
        case "ROLL" =>
          // doc semantics "rotate the top n by m", m > 0 toward the top
          // (rrdgraph_rpn.pod). The C loop (rrd_rpncalc.c:1364-1394)
          // memcpy's from the popped-argument slots and scrambles for
          // n >= 2 — we implement the documented rotation, matching
          // RpnInterpreter.
          val m = popConst("ROLL").toInt; val n = popConst("ROLL").toInt
          val (top, rest) = st.splitAt(n)
          val k = java.lang.Math.floorMod(m, n)
          val b = top.reverse // bottom-first
          st = (b.takeRight(k) ++ b.dropRight(k)).reverse ::: rest
        // ---- set ops over top-n values (runtime arrays, compile-time n)
        case "SORT" =>
          val n = popConst("SORT").toInt
          val sorted = array_sort(array(popN(n).reverse: _*), nanFirst)
          // push back so the largest ends on top (ascending in stack order)
          (1 to n).foreach(i => push(element_at(sorted, i)))
        case "REV" =>
          val n = popConst("REV").toInt
          st = st.take(n).reverse ::: st.drop(n)
        case "AVG" => // NaN-skipping mean (rrd_rpncalc.c:1204-1229)
          val n = popConst("AVG").toInt
          val xs = popN(n)
          val cnt = xs.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
          val total = xs.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
          push(when(cnt > 0, total / cnt).otherwise(lit(null)))
        case "SMIN" => val n = popConst("SMIN").toInt // NaN-skipping
          push(least(popN(n): _*))
        case "SMAX" => val n = popConst("SMAX").toInt
          push(greatest(popN(n): _*))
        case "MEDIAN" => // NaN-skipping midpoint (rrd_rpncalc.c:1234-1281)
          val n = popConst("MEDIAN").toInt
          val arr = array_sort(filter(array(popN(n): _*), _.isNotNull))
          val k = size(arr)
          val mid = ((k + 1) / 2).cast("int") // element_at needs int
          push(when(k === 0, lit(null))
            .when(k % 2 === 1, element_at(arr, mid))
            .otherwise((element_at(arr, (k / 2).cast("int")) +
              element_at(arr, (k / 2 + 1).cast("int"))) / 2))
        case "STDEV" => // sample stddev over non-NaN (rrd_rpncalc.c:1282-1306)
          val n = popConst("STDEV").toInt
          val xs = popN(n)
          val cnt = xs.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
            .cast("double")
          val s1 = xs.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
          val s2 = xs.map(c => coalesce(c * c, lit(0.0))).reduce(_ + _)
          push(when(cnt < 2, lit(null))
            .otherwise(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1))))
        case "PERCENT" => // NaN-first sort, 1-based round(p·n/100)
          val n = popConst("PERCENT").toInt
          val p = popConst("PERCENT")
          val arr = array_sort(array(popN(n).reverse: _*), nanFirst)
          val idx = math.round(p * n / 100.0).toInt
          push(element_at(arr, math.max(idx, 1)))
        // ---- windowed (rrd_rpncalc.c:1169-1203)
        case "TREND" | "TRENDNAN" =>
          val dur = popConst(op)
          val v = pop().col
          val rows = math.ceil(dur / ctx.stepSec.toDouble).toInt
          val w = ctx.window.rowsBetween(-(rows - 1), 0)
          val enough = row_number().over(ctx.window) >= rows
          // decimal-routed sum: order-independent, oracle-exact
          val s = sum(v.cast(DecimalType(28, 10))).over(w).cast("double")
          val known = count(v).over(w)
          val result =
            if (op == "TREND") // NaN propagates (ignorenan quirk)
              when(known < rows, lit(null)).otherwise(s / rows)
            else when(known === 0, lit(null)).otherwise(s / known)
          push(when(enough, result).otherwise(lit(null)))
        case other =>
          throw new IllegalArgumentException(
            s"op $other is interpreter-only (use RpnInterpreter)")
      }
    }
    require(st.nonEmpty, "empty RPN expression")
    st.head.col
  }
}
