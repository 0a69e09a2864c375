package graft.dq

/** DQDL-subset parser (SURVEY.md §2.11).
  *
  * Grammar (the subset exercised by the reference's shipped rulesets,
  * dq-rules/dq-SyntheticGeneralData-PolicyData.json, plus RowCount/IsUnique):
  *
  * {{{
  * expr     := term (('and'|'or') term)*
  * term     := '(' expr ')' | rule
  * rule     := 'ColumnValues' col valuePred
  *           | 'ColumnDataType' col '=' str
  *           | 'Completeness' col cmp number
  *           | 'ColumnExists' col
  *           | 'IsComplete' col
  *           | 'IsUnique' col
  *           | 'RowCount' cmp number
  *           | 'CustomSql' str (cmp number)?
  * valuePred:= 'matches' str | 'in' '[' str (',' str)* ']'
  *           | cmp (number|str) | 'between' number 'and' number
  * col      := quoted string; cmp := > >= < <= = !=
  * }}}
  *
  * Single- and double-quoted strings are both accepted (the reference converts
  * single→double before handing rules to Glue, dataquality_check.py:86-89 —
  * we accept both directly).
  */
object Dqdl {

  sealed trait Expr
  final case class Leaf(rule: Rule) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr

  sealed trait Rule { def describe: String }
  final case class ColumnValues(col: String, pred: ValuePred) extends Rule {
    def describe = s"ColumnValues $col $pred"
  }
  final case class ColumnDataType(col: String, typeName: String) extends Rule {
    def describe = s"ColumnDataType $col = $typeName"
  }
  final case class Completeness(col: String, op: String, threshold: Double) extends Rule {
    def describe = s"Completeness $col $op $threshold"
  }
  final case class ColumnExists(col: String) extends Rule { def describe = s"ColumnExists $col" }
  final case class IsComplete(col: String) extends Rule { def describe = s"IsComplete $col" }
  final case class IsUnique(col: String) extends Rule { def describe = s"IsUnique $col" }
  final case class RowCount(op: String, n: Double) extends Rule { def describe = s"RowCount $op $n" }
  /** Numeric-aggregate rules: Mean | Sum | StandardDeviation |
    * DistinctValuesCount | Uniqueness (distinct/total fraction). */
  final case class AggRule(agg: String, col: String, op: String, n: Double) extends Rule {
    def describe = s"$agg $col $op $n"
  }
  /** ColumnLength — string length bounds, row-level evaluable. */
  final case class ColumnLength(col: String, op: String, n: Double) extends Rule {
    def describe = s"ColumnLength $col $op $n"
  }
  final case class CustomSql(sql: String, cmp: Option[(String, Double)]) extends Rule {
    def describe = s"CustomSql ${cmp.fold("(row-level)")(c => s"${c._1} ${c._2}")}"
  }

  sealed trait ValuePred
  final case class Matches(regex: String) extends ValuePred
  final case class InList(values: Seq[String]) extends ValuePred
  final case class Cmp(op: String, value: Either[Double, String]) extends ValuePred
  final case class Between(lo: Double, hi: Double) extends ValuePred

  // ------------------------------------------------------------------ tokenizer

  private sealed trait Tok
  private case class Word(s: String) extends Tok   // bare identifier / keyword
  private case class Str(s: String) extends Tok    // quoted
  private case class Num(d: Double) extends Tok
  private case class Sym(s: String) extends Tok    // ( ) [ ] , > >= < <= = !=

  private def tokenize(input: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && input(i) != quote) {
          if (input(i) == '\\' && i + 1 < n && input(i + 1) == quote) { sb += quote; i += 2 }
          else { sb += input(i); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(s"unterminated string in rule: $input")
        i += 1
        toks += Str(sb.toString)
      }
      else if (c.isDigit || (c == '-' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (input(i).isDigit || input(i) == '.' || input(i) == 'e' ||
          input(i) == 'E' || input(i) == '-' || input(i) == '+')) i += 1
        toks += Num(input.substring(start, i).toDouble)
      }
      else if (c == '>' || c == '<' || c == '!') {
        if (i + 1 < n && input(i + 1) == '=') { toks += Sym(s"$c="); i += 2 }
        else { toks += Sym(c.toString); i += 1 }
      }
      else if ("()[],=".indexOf(c) >= 0) { toks += Sym(c.toString); i += 1 }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        toks += Word(input.substring(start, i))
      }
      else throw new IllegalArgumentException(s"unexpected char '$c' in rule: $input")
    }
    toks.toList
  }

  // --------------------------------------------------------------------- parser

  def parse(ruleText: String): Expr = {
    val (e, rest) = parseExpr(tokenize(ruleText))
    if (rest.nonEmpty) throw new IllegalArgumentException(
      s"trailing tokens $rest in rule: $ruleText")
    e
  }

  private def parseExpr(toks: List[Tok]): (Expr, List[Tok]) = {
    var (left, rest) = parseTerm(toks)
    var done = false
    while (!done) rest match {
      case Word(w) :: tail if w.equalsIgnoreCase("and") =>
        val (r, t2) = parseTerm(tail); left = And(left, r); rest = t2
      case Word(w) :: tail if w.equalsIgnoreCase("or") =>
        val (r, t2) = parseTerm(tail); left = Or(left, r); rest = t2
      case _ => done = true
    }
    (left, rest)
  }

  private def parseTerm(toks: List[Tok]): (Expr, List[Tok]) = toks match {
    case Sym("(") :: tail =>
      val (e, rest) = parseExpr(tail)
      rest match {
        case Sym(")") :: t2 => (e, t2)
        case _ => throw new IllegalArgumentException(s"expected ')' at $rest")
      }
    case _ =>
      val (r, rest) = parseRule(toks)
      (Leaf(r), rest)
  }

  private def cmpOps = Set(">", ">=", "<", "<=", "=", "!=")

  private def parseRule(toks: List[Tok]): (Rule, List[Tok]) = toks match {
    case Word("ColumnValues") :: Str(col) :: tail => parseValuePred(col, tail)
    case Word("ColumnDataType") :: Str(col) :: Sym("=") :: Str(t) :: rest =>
      (ColumnDataType(col, t.toUpperCase), rest)
    case Word("Completeness") :: Str(col) :: Sym(op) :: Num(d) :: rest if cmpOps(op) =>
      (Completeness(col, op, d), rest)
    case Word("ColumnExists") :: Str(col) :: rest => (ColumnExists(col), rest)
    case Word("IsComplete") :: Str(col) :: rest => (IsComplete(col), rest)
    case Word("IsUnique") :: Str(col) :: rest => (IsUnique(col), rest)
    case Word("RowCount") :: Sym(op) :: Num(d) :: rest if cmpOps(op) => (RowCount(op, d), rest)
    case Word(agg) :: Str(col) :: Sym(op) :: Num(d) :: rest
      if Set("Mean", "Sum", "StandardDeviation", "DistinctValuesCount", "Uniqueness")(agg) && cmpOps(op) =>
      (AggRule(agg, col, op, d), rest)
    case Word("ColumnLength") :: Str(col) :: Sym(op) :: Num(d) :: rest if cmpOps(op) =>
      (ColumnLength(col, op, d), rest)
    case Word("CustomSql") :: Str(sql) :: Sym(op) :: Num(d) :: rest if cmpOps(op) =>
      (CustomSql(sql, Some((op, d))), rest)
    case Word("CustomSql") :: Str(sql) :: rest => (CustomSql(sql, None), rest)
    case other => throw new IllegalArgumentException(s"cannot parse rule at: $other")
  }

  private def parseValuePred(col: String, toks: List[Tok]): (Rule, List[Tok]) = toks match {
    // predicate keywords are case-insensitive, like the and/or connectors
    case Word(w) :: Str(re) :: rest if w.equalsIgnoreCase("matches") =>
      (ColumnValues(col, Matches(re)), rest)
    case Word(w) :: Sym("[") :: tail if w.equalsIgnoreCase("in") =>
      val vals = scala.collection.mutable.ListBuffer.empty[String]
      var rest = tail
      var done = false
      while (!done) rest match {
        case Str(s) :: Sym(",") :: t2 => vals += s; rest = t2
        case Num(d) :: Sym(",") :: t2 => vals += fmtNum(d); rest = t2
        case Str(s) :: Sym("]") :: t2 => vals += s; rest = t2; done = true
        case Num(d) :: Sym("]") :: t2 => vals += fmtNum(d); rest = t2; done = true
        case other => throw new IllegalArgumentException(s"bad in-list at: $other")
      }
      (ColumnValues(col, InList(vals.toSeq)), rest)
    case Word(b) :: Num(lo) :: Word(a) :: Num(hi) :: rest
      if b.equalsIgnoreCase("between") && a.equalsIgnoreCase("and") =>
      (ColumnValues(col, Between(lo, hi)), rest)
    case Sym(op) :: Num(d) :: rest if cmpOps(op) => (ColumnValues(col, Cmp(op, Left(d))), rest)
    case Sym(op) :: Str(s) :: rest if cmpOps(op) => (ColumnValues(col, Cmp(op, Right(s))), rest)
    case other => throw new IllegalArgumentException(s"bad ColumnValues predicate at: $other")
  }

  private def fmtNum(d: Double): String =
    if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
}
