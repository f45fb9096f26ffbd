package graft.rpn

/** RPN expression language of CDEF/COMPUTE (SURVEY.md §2.4; grammar
  * /root/reference/src/rrd_rpncalc.c:335-487, doc
  * /root/reference/doc/rrdgraph_rpn.pod). Comma-separated tokens; a token
  * is a number literal, an operator name, a variable name, or
  * `PREV(vname)`.
  */
sealed trait RToken
object RToken {
  final case class Num(v: Double) extends RToken
  final case class Var(name: String) extends RToken
  final case class PrevVar(name: String) extends RToken
  final case class Fn(op: String) extends RToken

  /** Operator vocabulary (enum rpn_op_en, /root/reference/src/rrd_rpncalc.h:9-28). */
  val ops: Set[String] = Set(
    "+", "-", "*", "/", "%", "ADDNAN", "POW",
    "SIN", "COS", "LOG", "EXP", "SQRT", "ATAN", "ATAN2",
    "FLOOR", "CEIL", "ROUND", "ABS", "DEG2RAD", "RAD2DEG",
    "LT", "LE", "GT", "GE", "EQ", "NE", "UN", "ISINF", "IF",
    "MIN", "MAX", "MINNAN", "MAXNAN", "LIMIT",
    "DUP", "EXC", "POP", "DEPTH", "COPY", "INDEX", "ROLL",
    "SORT", "REV", "AVG", "MEDIAN", "STDEV", "SMIN", "SMAX", "PERCENT",
    "TREND", "TRENDNAN", "PREDICT", "PREDICTSIGMA", "PREDICTPERC",
    "UNKN", "INF", "NEGINF", "NOW", "TIME", "LTIME", "STEPWIDTH",
    "COUNT", "PREV", "NEWDAY", "NEWWEEK", "NEWMONTH", "NEWYEAR")

  private val PrevRe = """PREV\(([A-Za-z0-9_.-]+)\)""".r

  def tokenize(expr: String): Seq[RToken] =
    expr.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty).map {
      case PrevRe(name) => PrevVar(name)
      case t if ops(t) => Fn(t)
      case t =>
        t.toDoubleOption match {
          case Some(d) => Num(d)
          case None if t.matches("[A-Za-z_][A-Za-z0-9_.-]*") => Var(t)
          case None => throw new IllegalArgumentException(s"bad RPN token '$t'")
        }
    }

  /** Ops that force the sequential interpreter: self-referential PREV and
    * the PREDICT family (their row-offset windows, duplicate counting and
    * strict `offset < output_idx` bound don't map to one Column). */
  def needsInterpreter(tokens: Seq[RToken]): Boolean = tokens.exists {
    case Fn("PREV") | Fn("PREDICT") | Fn("PREDICTSIGMA") |
        Fn("PREDICTPERC") => true
    case _ => false
  }
}
