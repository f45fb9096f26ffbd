package graft.rpn

import scala.collection.mutable.ArrayBuffer

/** Sequential RPN evaluator: a faithful re-expression of the reference
  * stack machine (/root/reference/src/rrd_rpncalc.c:613-1446) over
  * NaN-coded arrays. Used for the ops a single Column can't express —
  * self-referential PREV and the PREDICT family — and as the semantics
  * oracle in unit tests.
  *
  * Scale shape: runs per series inside `mapGroups` (each series is
  * sequential by construction, like the reference; parallelism comes from
  * the series dimension). Unknown = NaN here; the Spark boundary converts
  * null ↔ NaN.
  *
  * PREDICT* follows the documented stack layout
  * (/root/reference/doc/rrdgraph_rpn.pod): `s1,…,sn,n,window,x,PREDICT`
  * and `m,-n,window,x,PREDICT` (shifts k·m, k=0..n-1); values are
  * gathered at row offsets `ceil(shift/step)+j`, j=0..ceil(window/step),
  * restricted to offsets in [0, idx) with duplicates counted
  * (/root/reference/src/rrd_rpncalc.c:1085-1126).
  */
object RpnInterpreter {

  /** NaN-first ordering (/root/reference/src/rrd_rpncalc.c:524-546). */
  val nanFirst: Ordering[Double] = (x: Double, y: Double) =>
    if (x.isNaN && y.isNaN) 0
    else if (x.isNaN) -1
    else if (y.isNaN) 1
    else java.lang.Double.compare(x, y)

  /** Evaluate `expr` over aligned series (arrays of equal length, slot i
    * at time ts(i), end-labeled on the step grid). Returns the output.
    */
  def eval(expr: String, series: Map[String, Array[Double]],
      ts: Array[Long], stepSec: Long, nowSec: Long = 0L,
      firstWeekday: Int = 0, timeZone: String = "UTC"): Array[Double] = {
    val zone = java.time.ZoneId.of(timeZone)
    /** local clock = ts + utc offset (rrd_rpncalc.c:1450-1478). */
    def localOf(t: Long): Long =
      t + zone.getRules.getOffset(java.time.Instant.ofEpochSecond(t))
        .getTotalSeconds
    val tokens = RToken.tokenize(expr).toIndexedSeq
    val n = ts.length
    val out = Array.fill(n)(Double.NaN)
    val st = new ArrayBuffer[Double](16)

    def pop(): Double = st.remove(st.length - 1)
    def push(v: Double): Unit = st += v
    def binop(f: (Double, Double) => Double): Unit = {
      val b = pop(); val a = pop(); push(f(a, b))
    }
    def cmpOp(f: (Double, Double) => Boolean): Unit = binop((a, b) =>
      if (a.isNaN) a else if (b.isNaN) b else if (f(a, b)) 1.0 else 0.0)
    /** Pop an n-count then that many values (stack order preserved:
      * result(0) is the deepest). */
    def popValues(): Array[Double] = {
      val cn = pop().toInt
      val base = st.length - cn
      val xs = st.slice(base, st.length).toArray
      st.remove(base, cn)
      xs
    }
    def day(t: Long): Long = Math.floorDiv(t, 86400L)
    def monthOf(t: Long): Long = {
      val d = java.time.Instant.ofEpochSecond(t)
        .atZone(java.time.ZoneOffset.UTC)
      d.getYear * 12L + d.getMonthValue
    }
    /** vname bound `back` tokens before position `pi` (TREND/PREDICT
      * require a plain variable there, rrd_rpncalc.c:1174-1177). */
    def vnameAt(pi: Int, back: Int, op: String): String =
      tokens(pi - back) match {
        case RToken.Var(nm) => nm
        case _ => throw new IllegalArgumentException(
          s"$op requires a plain vname ${back} tokens before it")
      }

    var i = 0
    while (i < n) {
      st.clear()
      // NEW* run on the local clock (localtime_r, rrd_rpncalc.c:713-744)
      def newBucket(bucket: Long => Long): Double =
        if (bucket(localOf(ts(i))) != bucket(localOf(ts(i) - stepSec))) 1.0
        else 0.0

      var pi = 0
      while (pi < tokens.length) {
        tokens(pi) match {
          case RToken.Num(v) => push(v)
          case RToken.Var(name) => push(series(name)(i))
          case RToken.PrevVar(name) =>
            push(if (i == 0) Double.NaN else series(name)(i - 1))
          case RToken.Fn(op) => op match {
            case "UNKN" => push(Double.NaN)
            case "INF" => push(Double.PositiveInfinity)
            case "NEGINF" => push(Double.NegativeInfinity)
            case "NOW" => push(nowSec.toDouble)
            case "TIME" => push(ts(i).toDouble)
            case "LTIME" => push(localOf(ts(i)).toDouble)
            case "STEPWIDTH" => push(stepSec.toDouble)
            case "COUNT" => push((i + 1).toDouble)
            case "PREV" => push(if (i == 0) Double.NaN else out(i - 1))
            case "NEWDAY" => push(newBucket(day))
            case "NEWWEEK" =>
              val shift = Math.floorMod(4 - firstWeekday, 7)
              push(newBucket(t => Math.floorDiv(day(t) + shift, 7L)))
            case "NEWMONTH" => push(newBucket(monthOf))
            case "NEWYEAR" => push(newBucket(
              t => java.time.Instant.ofEpochSecond(t)
                .atZone(java.time.ZoneOffset.UTC).getYear.toLong))
            case "+" => binop(_ + _)
            case "-" => binop(_ - _)
            case "*" => binop(_ * _)
            case "/" => binop(_ / _)
            case "%" => binop(_ % _) // Scala % on Double == C fmod
            case "ADDNAN" => binop((a, b) =>
              if (a.isNaN) b else if (b.isNaN) a else a + b)
            case "POW" => binop(math.pow)
            case "SIN" => push(math.sin(pop()))
            case "COS" => push(math.cos(pop()))
            case "LOG" => push(math.log(pop()))
            case "EXP" => push(math.exp(pop()))
            case "SQRT" => push(math.sqrt(pop()))
            case "ATAN" => push(math.atan(pop()))
            case "ATAN2" => binop(math.atan2)
            case "FLOOR" => push(math.floor(pop()))
            case "CEIL" => push(math.ceil(pop()))
            case "ROUND" => // C round(): half away from zero, NaN/Inf pass
              val v = pop()
              push(if (v.isNaN || v.isInfinite) v
                else math.copySign(math.floor(math.abs(v) + 0.5), v))
            case "ABS" => push(math.abs(pop()))
            case "DEG2RAD" => push(0.0174532952 * pop())
            case "RAD2DEG" => push(57.29577951 * pop())
            case "LT" => cmpOp(_ < _)
            case "LE" => cmpOp(_ <= _)
            case "GT" => cmpOp(_ > _)
            case "GE" => cmpOp(_ >= _)
            case "EQ" => cmpOp(_ == _)
            case "NE" => cmpOp(_ != _)
            case "UN" => push(if (pop().isNaN) 1.0 else 0.0)
            case "ISINF" => push(if (pop().isInfinite) 1.0 else 0.0)
            case "IF" =>
              val f = pop(); val t = pop(); val c = pop()
              push(if (c.isNaN || c == 0.0) f else t)
            case "MIN" => binop((a, b) =>
              if (a.isNaN || b.isNaN) Double.NaN else math.min(a, b))
            case "MAX" => binop((a, b) =>
              if (a.isNaN || b.isNaN) Double.NaN else math.max(a, b))
            case "MINNAN" => binop((a, b) =>
              if (a.isNaN) b else if (b.isNaN) a else math.min(a, b))
            case "MAXNAN" => binop((a, b) =>
              if (a.isNaN) b else if (b.isNaN) a else math.max(a, b))
            case "LIMIT" =>
              val hi = pop(); val lo = pop(); val v = pop()
              push(if (v.isNaN || lo.isNaN || hi.isNaN) Double.NaN
                else if (v < lo || v > hi) Double.NaN else v)
            case "DUP" => push(st.last)
            case "POP" => pop(); ()
            case "EXC" => val b = pop(); val a = pop(); push(b); push(a)
            case "DEPTH" => push(st.length.toDouble)
            case "COPY" =>
              val cn = pop().toInt
              val base = st.length - cn
              (0 until cn).foreach(j => push(st(base + j)))
            case "INDEX" => val ix = pop().toInt; push(st(st.length - ix))
            case "ROLL" => // rotate top n by m (doc-level semantics)
              val m = pop().toInt; val cn = pop().toInt
              val base = st.length - cn
              val top = st.slice(base, st.length).toArray
              val k = Math.floorMod(m, cn)
              (0 until cn).foreach(j =>
                st(base + j) = top(Math.floorMod(j - k, cn)))
            case "SORT" =>
              val cn = pop().toInt
              val base = st.length - cn
              val xs = st.slice(base, st.length).toArray.sorted(nanFirst)
              (0 until cn).foreach(j => st(base + j) = xs(j))
            case "REV" =>
              val cn = pop().toInt
              val base = st.length - cn
              val xs = st.slice(base, st.length).reverse
              (0 until cn).foreach(j => st(base + j) = xs(j))
            case "AVG" =>
              val good = popValues().filterNot(_.isNaN)
              push(if (good.isEmpty) Double.NaN else good.sum / good.length)
            case "SMIN" =>
              val good = popValues().filterNot(_.isNaN)
              push(if (good.isEmpty) Double.NaN else good.min)
            case "SMAX" =>
              val good = popValues().filterNot(_.isNaN)
              push(if (good.isEmpty) Double.NaN else good.max)
            case "MEDIAN" =>
              val good = popValues().filterNot(_.isNaN).sorted
              push(if (good.isEmpty) Double.NaN
                else if (good.length % 2 == 1) good(good.length / 2)
                else 0.5 * (good(good.length / 2) + good(good.length / 2 - 1)))
            case "STDEV" => // Welford, n-1 (rrd_rpncalc.c:1282-1306)
              val good = popValues().filterNot(_.isNaN)
              if (good.length < 2) push(Double.NaN)
              else {
                var cnt = 0; var mean = 0.0; var m2 = 0.0
                good.foreach { x =>
                  cnt += 1; val d = x - mean; mean += d / cnt
                  m2 += d * (x - mean)
                }
                push(math.sqrt(m2 / (cnt - 1)))
              }
            case "PERCENT" => // NaN-first sort, 1-based round(p·n/100)
              val cn = pop().toInt; val p = pop()
              val base = st.length - cn
              val xs = st.slice(base, st.length).toArray.sorted(nanFirst)
              st.remove(base, cn)
              val idx = math.round(p * cn / 100.0).toInt
              push(xs(math.max(idx, 1) - 1))
            case "TREND" | "TRENDNAN" => // rrd_rpncalc.c:1169-1203
              val dur = pop(); pop() // current value of the vname: unused
              val data = series(vnameAt(pi, 2, op))
              val rows = math.ceil(dur / stepSec.toDouble).toInt
              if (i + 1 < rows) push(Double.NaN)
              else {
                var acc = 0.0; var cnt = 0; var j = i - rows + 1
                val propagateNan = op == "TREND"
                while (j <= i) {
                  val v = data(j)
                  if (propagateNan || !v.isNaN) { acc += v; cnt += 1 }
                  j += 1
                }
                push(if (cnt == 0) Double.NaN else acc / cnt)
              }
            case "PREDICT" | "PREDICTSIGMA" | "PREDICTPERC" =>
              predictOp(op, series(vnameAt(pi, 1, op)), st, i, stepSec)
            case other =>
              throw new IllegalArgumentException(s"unhandled op $other")
          }
        }
        pi += 1
      }
      out(i) = if (st.nonEmpty) st.last else Double.NaN
      i += 1
    }
    out
  }

  private def predictOp(op: String, data: Array[Double],
      st: ArrayBuffer[Double], idx: Int, stepSec: Long): Unit = {
    def pop(): Double = st.remove(st.length - 1)
    pop() // current value of x (pushed by the vname token), unused
    val pct = if (op == "PREDICTPERC") pop() / 100.0 else Double.NaN
    val windowSec = pop()
    val nShifts = pop().toInt
    val doShifts = math.abs(nShifts)
    val shiftVals: Seq[Double] =
      if (nShifts < 0) { val m = pop(); (0 until doShifts).map(_ * m) }
      else (0 until doShifts).map(_ => pop()).reverse
    val locstep = math.ceil(windowSec / stepSec.toDouble).toInt
    val collected = ArrayBuffer.empty[Double]
    shiftVals.foreach { sv =>
      val base = math.ceil(sv / stepSec.toDouble).toInt
      var j = 0
      while (j <= locstep) {
        val off = base + j
        if (off >= 0 && off < idx) {
          val v = data(idx - off)
          if (!v.isNaN) collected += v
        }
        j += 1
      }
    }
    val cnt = collected.length
    val res = op match {
      case "PREDICT" =>
        if (cnt > 0) collected.sum / cnt else Double.NaN
      case "PREDICTSIGMA" =>
        if (cnt > 1) {
          val s = collected.sum; val s2 = collected.map(x => x * x).sum
          val v = cnt * s2 - s * s
          if (v < 0) Double.NaN
          else math.sqrt(v / (cnt.toDouble * (cnt - 1.0)))
        } else Double.NaN
      case _ => // PREDICTPERC: interpolated, nearest-rank when pct < 0
        if (cnt > 0) {
          val xs = collected.toArray.sorted(nanFirst)
          val idxf = pct * (cnt - 1.0)
          if (pct < 0) xs(math.round(math.abs(idxf)).toInt)
          else {
            val i0 = math.floor(idxf).toInt
            val dx = idxf - i0
            if (dx == 0) xs(i0) else xs(i0) + (xs(i0 + 1) - xs(i0)) * dx
          }
        } else Double.NaN
    }
    st += res
  }
}
