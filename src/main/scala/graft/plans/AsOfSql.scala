package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the custom AS-OF JOIN (round 16): the two extension
  * points the library did not yet exercise — `injectParser` +
  * `injectResolutionRule` — carry DuckDB-style syntax
  *
  * {{{ SELECT ... FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t }}}
  *
  * into the [[AsOfJoin]] operator. Split of responsibilities, because a
  * parser cannot know which side of `l.k = r.k` belongs to which child
  * before resolution: the PARSER ([[GraftSqlParser]]) rewrites the ASOF
  * keyword away, delegates the heavy lifting to Spark's own parser, and
  * wraps the resulting join as [[UnresolvedAsOfJoin]] carrying the raw
  * ON condition; the RESOLUTION RULE ([[ResolveAsOfJoin]]) waits until
  * the analyzer has resolved children and condition, then splits the
  * conjunction by reference side — equalities become the keys, the one
  * inequality becomes the time pair (`l.t >= r.t` backward,
  * `l.t <= r.t` forward, either operand order). */
case class UnresolvedAsOfJoin(
    condition: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  // never analyzable as-is: ResolveAsOfJoin must replace it
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

object ResolveAsOfJoin extends Rule[LogicalPlan] {
  // _LEGACY_ERROR_TEMP_0035 = "Operation not allowed: <message>" — the
  // class Spark's own AstBuilder.operationNotAllowed raises; a user's
  // malformed ASOF statement is a usage error, not an INTERNAL_ERROR
  // ("should be reported as a bug")
  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"ASOF LEFT JOIN: $msg"))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => other :: Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedAsOfJoin(cond, l, r)
        if u.childrenResolved && cond.resolved =>
      val leftSet = l.outputSet
      val rightSet = r.outputSet
      // orient (a, b) as (left-side, right-side); None if mixed/constant
      def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
        if (a.references.nonEmpty && a.references.subsetOf(leftSet) &&
            b.references.nonEmpty && b.references.subsetOf(rightSet)) Some((a, b))
        else if (b.references.nonEmpty && b.references.subsetOf(leftSet) &&
            a.references.nonEmpty && a.references.subsetOf(rightSet)) Some((b, a))
        else None
      var leftKeys = Vector.empty[Expression]
      var rightKeys = Vector.empty[Expression]
      // (leftTime, rightTime, forward)
      var time: Option[(Expression, Expression, Boolean)] = None
      conjuncts(cond).foreach {
        case EqualTo(a, b) => sides(a, b) match {
          case Some((lk, rk)) => leftKeys :+= lk; rightKeys :+= rk
          case None => fail(s"equality must pair one column per side: ${EqualTo(a, b).sql}")
        }
        case ge @ GreaterThanOrEqual(a, b) =>
          if (time.isDefined) fail("exactly one time inequality expected")
          time = sides(a, b) match {
            case Some((lt, rt)) if lt.semanticEquals(a) => Some((lt, rt, false)) // l.t >= r.t
            case Some((lt, rt)) => Some((lt, rt, true))                          // r.t >= l.t
            case None => fail(s"time inequality must pair one column per side: ${ge.sql}")
          }
        case le @ LessThanOrEqual(a, b) =>
          if (time.isDefined) fail("exactly one time inequality expected")
          time = sides(a, b) match {
            case Some((lt, rt)) if lt.semanticEquals(a) => Some((lt, rt, true))  // l.t <= r.t
            case Some((lt, rt)) => Some((lt, rt, false))                         // r.t <= l.t
            case None => fail(s"time inequality must pair one column per side: ${le.sql}")
          }
        case other => fail(s"unsupported ON conjunct: ${other.sql}")
      }
      if (leftKeys.isEmpty) fail("at least one key equality required")
      val (lt, rt, fwd) = time.getOrElse(fail("a time inequality (>= or <=) is required"))
      AsOfJoin(leftKeys, rightKeys, lt, rt, fwd, toleranceUs = None, l, r)
  }
}

/** Delegating parser that recognizes `ASOF LEFT JOIN` (exactly one per
  * statement; the inner `ASOF JOIN` flavor is rejected — the operator
  * is left-outer) and wraps the corresponding join for
  * [[ResolveAsOfJoin]]. Everything else — including the whole grammar
  * of the rewritten statement — is Spark's own parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val AsOfLeft = "(?i)\\bASOF\\s+LEFT\\s+(?:OUTER\\s+)?JOIN\\b".r
  // catch-all for every other ASOF ... JOIN spelling (bare, INNER,
  // RIGHT/FULL [OUTER], CROSS, SEMI, ANTI): each must be REJECTED, not
  // silently parsed as a table aliased `ASOF` plus an ordinary join.
  // The middle words are restricted to actual JOIN-TYPE keywords (ADVICE
  // r16): a `{0,2}` wildcard over arbitrary \w+ also matched legal SQL
  // whose last pre-JOIN identifier happened to be `asof` — e.g.
  // `SELECT x AS asof FROM t JOIN u` ("asof FROM t JOIN") — rejecting
  // ordinary statements session-wide. Only `l ASOF <jointype> JOIN`
  // shapes can alias-parse silently wrong, so only those are caught.
  private val AsOfAny =
    ("(?i)\\bASOF\\s+" +
      "(?:(?:INNER|LEFT|RIGHT|FULL|CROSS|SEMI|ANTI|OUTER|NATURAL)\\s+){0,2}" +
      "JOIN\\b").r

  /** The statement with string literals ('…', "…"), quoted identifiers
    * (backticks) and comments (line and block) blanked out, so keyword matching
    * can never see into them: a literal containing "ASOF LEFT JOIN" is
    * data, not syntax. Positions are preserved (content replaced by
    * spaces), so match offsets found on the mask splice into the
    * original text. `ASOF` as an UNQUOTED alias in join position remains
    * reserved — the same contract DuckDB's own ASOF keyword has; quote
    * it (`asof`) to use it as a name. */
  private def masked(sqlText: String): String = {
    val out = sqlText.toCharArray
    var i = 0
    while (i < out.length) {
      val c = out(i)
      if (c == '\'' || c == '"' || c == '`') {
        out(i) = ' '; i += 1
        while (i < out.length && out(i) != c) {
          // backslash escapes a following quote inside '…'/"…" — blank the
          // pair so \' never reads as the literal's end; backticks escape
          // by doubling only, which the close-then-reopen scan handles.
          // This holds under BOTH parser modes: Spark's lexer rule
          // ('\'' ( ~('\''|'\\') | ('\\' .) )* '\'') carries no
          // escapedStringLiterals predicate, so the TOKEN EXTENT always
          // consumes \' — the conf only controls whether the VALUE is
          // unescaped afterwards (verified against 4.1.2: legacy mode
          // yields don\'t, default yields don't, same literal end; the
          // AsOfSqlSpec legacy-mode test pins it)
          if (c != '`' && out(i) == '\\' && i + 1 < out.length) {
            out(i) = ' '; i += 1
          }
          out(i) = ' '; i += 1
        }
        if (i < out.length) { out(i) = ' '; i += 1 }
      } else if (c == '-' && i + 1 < out.length && out(i + 1) == '-') {
        while (i < out.length && out(i) != '\n') { out(i) = ' '; i += 1 }
      } else if (c == '/' && i + 1 < out.length && out(i + 1) == '*') {
        // bracketed comments NEST in Spark SQL (SPARK-28880): track depth
        // so the tail of "/* a /* b */ still comment */" stays masked
        var depth = 1
        out(i) = ' '; out(i + 1) = ' '; i += 2
        while (i < out.length && depth > 0) {
          if (out(i) == '/' && i + 1 < out.length && out(i + 1) == '*') {
            depth += 1; out(i) = ' '; out(i + 1) = ' '; i += 2
          } else if (out(i) == '*' && i + 1 < out.length && out(i + 1) == '/') {
            depth -= 1; out(i) = ' '; out(i + 1) = ' '; i += 2
          } else { out(i) = ' '; i += 1 }
        }
      } else i += 1
    }
    new String(out)
  }

  /** Replace the regions `re` matches ON THE MASK with `replacement`
    * in the ORIGINAL text (the mask is position-preserving). */
  private def replaceViaMask(sqlText: String, mask: String,
      re: scala.util.matching.Regex, replacement: String): String = {
    val sb = new java.lang.StringBuilder
    var last = 0
    re.findAllMatchIn(mask).foreach { m =>
      sb.append(sqlText, last, m.start).append(replacement)
      last = m.end
    }
    sb.append(sqlText, last, sqlText.length)
    sb.toString
  }

  private def parseError(msg: String): Nothing =
    throw new org.apache.spark.sql.catalyst.parser.ParseException(
      command = None,
      start = org.apache.spark.sql.catalyst.trees.Origin(),
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> msg))

  private def rewrite(sqlText: String, via: String => LogicalPlan): LogicalPlan = {
    val mask = masked(sqlText)
    // every ASOF...JOIN spelling that is not ASOF LEFT [OUTER] JOIN must
    // fail loudly: unmatched, Spark would parse `l ASOF` as a table alias
    // and plan an ordinary join over the range predicate — one row per
    // earlier right row, silently wrong
    val leftStarts = AsOfLeft.findAllMatchIn(mask).map(_.start).toSet
    AsOfAny.findAllMatchIn(mask).foreach { m =>
      if (!leftStarts.contains(m.start)) parseError(
        s"'${sqlText.substring(m.start, m.end)}': the ASOF operator is " +
          "left-outer; write ASOF LEFT JOIN (or ASOF LEFT OUTER JOIN)")
    }
    leftStarts.size match {
      case 0 => via(sqlText)
      case 1 =>
        val parsed = via(replaceViaMask(sqlText, mask, AsOfLeft, "LEFT JOIN"))
        // view definitions persist the statement's TEXT (the rewritten
        // string, since the delegate only ever sees that) and re-parse it
        // on every later read — where no ASOF rewrite happens and the
        // stored LEFT JOIN over the range predicate silently multiplies
        // rows. Refuse rather than persist a wrong definition.
        if (parsed.exists(_.nodeName.toLowerCase(java.util.Locale.ROOT)
            .contains("view"))) parseError(
          "ASOF LEFT JOIN cannot appear in a view definition: the catalog " +
            "stores the view's SQL text and later reads re-parse it " +
            "without this rewrite; materialize the as-of result instead")
        // collectWithSubqueries: an ASOF join written inside an
        // EXISTS/scalar subquery must be found there, not silently
        // attached to an outer LEFT JOIN
        val joins = parsed.collectWithSubqueries {
          case j: Join if j.joinType == LeftOuter => j
        }
        if (joins.size != 1) parseError(
          "an ASOF LEFT JOIN statement must contain no other LEFT JOIN " +
            s"(found ${joins.size} after rewrite)")
        val target = joins.head
        val cond = target.condition.getOrElse(
          parseError("ASOF LEFT JOIN requires an ON condition"))
        parsed.transformUpWithSubqueries {
          case j: Join if j eq target => UnresolvedAsOfJoin(cond, j.left, j.right)
        }
      case n => parseError(s"at most one ASOF LEFT JOIN per statement (found $n)")
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(sqlText, delegate.parsePlan)
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(sqlText, delegate.parseQuery)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
