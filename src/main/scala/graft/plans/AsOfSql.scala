package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Subtract}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, StructType}

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

/** Shared helpers of the two custom-join resolution rules. */
private[plans] object CustomJoinResolution {
  // _LEGACY_ERROR_TEMP_0035 = "Operation not allowed: <message>" — the
  // class Spark's own AstBuilder.operationNotAllowed raises; a user's
  // malformed statement is a usage error, not an INTERNAL_ERROR
  // ("should be reported as a bug")
  def fail(op: String, msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_0035",
      messageParameters = Map("message" -> s"$op: $msg"))

  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => other :: Nil
  }
}

object ResolveAsOfJoin extends Rule[LogicalPlan] {
  import CustomJoinResolution.conjuncts
  private def fail(msg: String): Nothing =
    CustomJoinResolution.fail("ASOF LEFT JOIN", msg)

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
      // TOLERANCE as a natural ON conjunct (round 17, VERDICT r16 #3):
      // `l.t - r.t <= N` (backward) / `r.t - l.t <= N` (forward) — a
      // cross-side difference bounded by a foldable integral literal maps
      // to the exec's toleranceUs instead of failing as a mixed conjunct.
      // (minuend, subtrahend, bound) — orientation validated once the
      // time direction is known.
      var tol: Option[(Expression, Expression, Long)] = None
      def litLong(e: Expression): Option[Long] =
        if (!e.foldable) None
        else e.eval() match {
          case i: java.lang.Integer => Some(i.longValue())
          case lo: java.lang.Long => Some(lo.longValue())
          case s: java.lang.Short => Some(s.longValue())
          case _ => None
        }
      // a <= bound with a = cross-side difference → tolerance conjunct
      def asTolerance(a: Expression, bound: Expression): Boolean = (a, litLong(bound)) match {
        case (Subtract(x, y, _), Some(us))
            if sides(x, y).isDefined || sides(y, x).isDefined =>
          if (tol.isDefined) fail("at most one tolerance bound")
          if (us < 0) fail("tolerance must be >= 0")
          tol = Some((x, y, us))
          true
        case _ => false
      }
      conjuncts(cond).foreach {
        case EqualTo(a, b) => sides(a, b) match {
          case Some((lk, rk)) => leftKeys :+= lk; rightKeys :+= rk
          case None => fail(s"equality must pair one column per side: ${EqualTo(a, b).sql}")
        }
        case ge @ GreaterThanOrEqual(a, b) =>
          if (asTolerance(b, a)) () // bound >= diff
          else {
            if (time.isDefined) fail("exactly one time inequality expected")
            time = sides(a, b) match {
              case Some((lt, rt)) if lt.semanticEquals(a) => Some((lt, rt, false)) // l.t >= r.t
              case Some((lt, rt)) => Some((lt, rt, true))                          // r.t >= l.t
              case None => fail(s"time inequality must pair one column per side: ${ge.sql}")
            }
          }
        case le @ LessThanOrEqual(a, b) =>
          if (asTolerance(a, b)) () // diff <= bound
          else {
            if (time.isDefined) fail("exactly one time inequality expected")
            time = sides(a, b) match {
              case Some((lt, rt)) if lt.semanticEquals(a) => Some((lt, rt, true))  // l.t <= r.t
              case Some((lt, rt)) => Some((lt, rt, false))                         // r.t <= l.t
              case None => fail(s"time inequality must pair one column per side: ${le.sql}")
            }
          }
        case other => fail(s"unsupported ON conjunct: ${other.sql}")
      }
      if (leftKeys.isEmpty) fail("at least one key equality required")
      val (lt, rt, fwd) = time.getOrElse(fail("a time inequality (>= or <=) is required"))
      val toleranceUs = tol.map { case (x, y, us) =>
        // the bounded difference must be oriented WITH the match
        // direction: backward bounds how stale the match may be
        // (l.t - r.t), forward how far ahead it may land (r.t - l.t)
        val oriented =
          if (fwd) x.semanticEquals(rt) && y.semanticEquals(lt)
          else x.semanticEquals(lt) && y.semanticEquals(rt)
        if (!oriented) fail("tolerance must bound " +
          (if (fwd) "<right time> - <left time>" else "<left time> - <right time>") +
          " over the same expressions as the time inequality")
        if (lt.dataType != LongType) fail(
          "tolerance needs bigint time columns (micros); cast first")
        us
      }
      AsOfJoin(leftKeys, rightKeys, lt, rt, fwd, toleranceUs, l, r)
  }
}

/** Placeholder the parser wraps a rewritten `INTERVAL JOIN` in — the
  * plane-sweep sibling of [[UnresolvedAsOfJoin]]; replaced by
  * [[ResolveIntervalJoin]] once children and condition resolve. INNER
  * semantics, so the output carries both sides' attrs unchanged. */
case class UnresolvedIntervalJoin(
    condition: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedIntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Splits an INTERVAL JOIN's ON condition into key equalities + the two
  * overlap bounds: `l.start <= r.end` and `r.start <= l.end` (either
  * operand order, >= or <=) — exactly the closed-interval overlap
  * predicate [[IntervalJoin]]'s DSL entry takes as (start, end) pairs. */
object ResolveIntervalJoin extends Rule[LogicalPlan] {
  import CustomJoinResolution.conjuncts
  private def fail(msg: String): Nothing =
    CustomJoinResolution.fail("INTERVAL JOIN", msg)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedIntervalJoin(cond, l, r)
        if u.childrenResolved && cond.resolved =>
      val leftSet = l.outputSet
      val rightSet = r.outputSet
      def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
        if (e.references.nonEmpty && e.references.subsetOf(leftSet)) Some(true)
        else if (e.references.nonEmpty && e.references.subsetOf(rightSet)) Some(false)
        else None
      var leftKeys = Vector.empty[Expression]
      var rightKeys = Vector.empty[Expression]
      var lower: Option[(Expression, Expression)] = None // (lStart, rEnd): lStart <= rEnd
      var upper: Option[(Expression, Expression)] = None // (lEnd, rStart): rStart <= lEnd
      // record `a <= b` by which side each expression lives on
      def lessEq(a: Expression, b: Expression, src: Expression): Unit =
        (sideOf(a), sideOf(b)) match {
          case (Some(true), Some(false)) => // left <= right: l.start <= r.end
            if (lower.isDefined) fail(s"duplicate l.start <= r.end bound: ${src.sql}")
            lower = Some((a, b))
          case (Some(false), Some(true)) => // right <= left: r.start <= l.end
            if (upper.isDefined) fail(s"duplicate r.start <= l.end bound: ${src.sql}")
            upper = Some((b, a))
          case _ => fail(s"overlap bound must pair one expression per side: ${src.sql}")
        }
      conjuncts(cond).foreach {
        case eq @ EqualTo(a, b) => (sideOf(a), sideOf(b)) match {
          case (Some(true), Some(false)) => leftKeys :+= a; rightKeys :+= b
          case (Some(false), Some(true)) => leftKeys :+= b; rightKeys :+= a
          case _ => fail(s"equality must pair one column per side: ${eq.sql}")
        }
        case le @ LessThanOrEqual(a, b) => lessEq(a, b, le)
        case ge @ GreaterThanOrEqual(a, b) => lessEq(b, a, ge)
        case other => fail(s"unsupported ON conjunct: ${other.sql}")
      }
      if (leftKeys.isEmpty) fail("at least one key equality required")
      val (ls, re) = lower.getOrElse(fail(
        "an overlap needs a <left start> <= <right end> bound"))
      val (le, rs) = upper.getOrElse(fail(
        "an overlap needs a <right start> <= <left end> bound"))
      IntervalJoin(leftKeys, rightKeys, ls, le, rs, re, l, r)
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
  // the plane-sweep operator's SQL spelling (round 17, VERDICT r16 #3):
  // `l INTERVAL JOIN r ON l.k = r.k AND <two overlap bounds>`. INNER
  // only — every `INTERVAL <jointype> JOIN` flavor is rejected. Like
  // ASOF, the unquoted word in join position is reserved by this
  // surface (an interval LITERAL — `INTERVAL 1 HOUR` — is never
  // followed directly by JOIN, so literals are unaffected; a table
  // alias named interval must be backtick-quoted).
  private val IvlJoin = "(?i)\\bINTERVAL\\s+JOIN\\b".r
  private val IvlAny =
    ("(?i)\\bINTERVAL\\s+" +
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

  /** Rewrite ONE custom-join keyword region to standard SQL, parse via
    * the delegate, and wrap the single resulting join of `joinType` as
    * the unresolved custom node. The shared machinery of the ASOF and
    * INTERVAL paths: the view refusal (a view stores the REWRITTEN text
    * and later reads re-parse it without this rewrite — the stored plain
    * join over the range predicate silently multiplies rows) and the
    * exactly-one-join discipline (collectWithSubqueries, so a custom
    * join inside an EXISTS/scalar subquery is found there, never
    * misattached to an outer join of the same type). */
  private def rewriteOne(sqlText: String, mask: String,
      via: String => LogicalPlan, op: String,
      re: scala.util.matching.Regex, replacement: String,
      joinType: org.apache.spark.sql.catalyst.plans.JoinType,
      wrap: (Expression, LogicalPlan, LogicalPlan) => LogicalPlan): LogicalPlan = {
    val parsed = via(replaceViaMask(sqlText, mask, re, replacement))
    if (parsed.exists(_.nodeName.toLowerCase(java.util.Locale.ROOT)
        .contains("view"))) parseError(
      s"$op cannot appear in a view definition: the catalog " +
        "stores the view's SQL text and later reads re-parse it " +
        "without this rewrite; materialize the result instead")
    val joins = parsed.collectWithSubqueries {
      case j: Join if j.joinType == joinType => j
    }
    if (joins.size != 1) parseError(
      s"an $op statement must contain no other ${joinType.sql} JOIN " +
        s"(found ${joins.size} after rewrite)")
    val target = joins.head
    val cond = target.condition.getOrElse(
      parseError(s"$op requires an ON condition"))
    parsed.transformUpWithSubqueries {
      case j: Join if j eq target => wrap(cond, j.left, j.right)
    }
  }

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
    // same discipline for INTERVAL ... JOIN: the operator is INNER-only
    val ivlStarts = IvlJoin.findAllMatchIn(mask).map(_.start).toSet
    IvlAny.findAllMatchIn(mask).foreach { m =>
      if (!ivlStarts.contains(m.start)) parseError(
        s"'${sqlText.substring(m.start, m.end)}': the INTERVAL operator " +
          "is inner; write INTERVAL JOIN")
    }
    (leftStarts.size, ivlStarts.size) match {
      case (0, 0) => via(sqlText)
      case (1, 0) =>
        rewriteOne(sqlText, mask, via, "ASOF LEFT JOIN",
          AsOfLeft, "LEFT JOIN", LeftOuter, UnresolvedAsOfJoin.apply)
      case (0, 1) =>
        rewriteOne(sqlText, mask, via, "INTERVAL JOIN",
          IvlJoin, "INNER JOIN", Inner, UnresolvedIntervalJoin.apply)
      case (a, i) => parseError("at most one custom join (ASOF LEFT JOIN " +
        s"or INTERVAL JOIN) per statement (found ${a + i})")
    }
  }

  // `OPTIMIZE <table>` / `VACUUM <table> [RETAIN n HOURS]` — the
  // whole-statement maintenance verbs (no valid Spark statement starts
  // with OPTIMIZE; Spark's own VACUUM lexes only for its delta-lake
  // reserved error, so claiming the prefixes is safe); matched on the
  // MASK so a leading comment can't hide them and a literal can't fake
  // them. Statement-only: parseQuery (subquery position) rejects both
  // via the delegate's normal error.
  private val OptimizeStmt = "(?i)^\\s*OPTIMIZE\\s".r
  private val VacuumStmt = "(?i)^\\s*VACUUM\\s".r
  private val RetainClause = "(?i)\\s+RETAIN\\s+(\\d+)\\s+HOURS\\s*$".r
  // DESCRIBE HISTORY is not valid delegate SQL (DESCRIBE expects TABLE/
  // QUERY/FUNCTION...), so claiming the two-word prefix is safe
  private val HistoryStmt = "(?i)^\\s*DESCRIBE\\s+HISTORY\\s".r

  /** Text after a maintenance verb with COMMENTS blanked (quote-aware —
    * a `--` inside a literal or backtick identifier is data): the mask
    * can't be used directly because it also blanks the backtick-quoted
    * identifiers the delegate must still parse. So comment regions are
    * identified as "raw differs from mask AND raw starts a comment
    * opener at an unmasked boundary" — equivalently, re-scan the raw
    * tail with the same lexer rules, blanking only comments. */
  private def stripComments(text: String): String = {
    val out = text.toCharArray
    var i = 0
    while (i < out.length) {
      val c = out(i)
      if (c == '\'' || c == '"' || c == '`') {
        i += 1
        while (i < out.length && out(i) != c) {
          if (c != '`' && out(i) == '\\' && i + 1 < out.length) i += 1
          i += 1
        }
        if (i < out.length) i += 1
      } else if (c == '-' && i + 1 < out.length && out(i + 1) == '-') {
        while (i < out.length && out(i) != '\n') { out(i) = ' '; i += 1 }
      } else if (c == '/' && i + 1 < out.length && out(i + 1) == '*') {
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

  /** The table-name tail of a maintenance statement: raw text after the
    * matched verb, comments blanked, trailing `;` and whitespace
    * stripped. Backtick quoting survives for the delegate to parse. */
  private def nameAfter(sqlText: String,
      m: scala.util.matching.Regex.Match): String = {
    val rest = stripComments(sqlText.substring(m.end))
      .trim.stripSuffix(";").trim
    if (rest.isEmpty) parseError("the maintenance verb requires a table name")
    rest
  }

  // `OPTIMIZE <t> ZORDER BY (c1, c2, ...)` — the multi-dimensional
  // clustering clause on the compaction verb (matched on the
  // comment-stripped tail, after the table name)
  private val ZorderClause =
    "(?i)\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\)\\s*$".r

  override def parsePlan(sqlText: String): LogicalPlan = {
    val mask = masked(sqlText)
    OptimizeStmt.findFirstMatchIn(mask) match {
      case Some(m) =>
        // the delegate parses the (possibly backtick-quoted) name, so
        // quoting rules stay exactly Spark's
        val tail = nameAfter(sqlText, m)
        ZorderClause.findFirstMatchIn(tail) match {
          case Some(z) =>
            val cols = z.group(1).split(',').map(_.trim).filter(_.nonEmpty)
              .toSeq.map { c =>
                delegate.parseMultipartIdentifier(c) match {
                  case Seq(one) => one
                  case parts => parseError(
                    s"ZORDER BY takes simple column names; got ${parts.mkString(".")}")
                }
              }
            if (cols.isEmpty) parseError("ZORDER BY requires at least one column")
            OptimizeGraftTable(
              delegate.parseMultipartIdentifier(tail.substring(0, z.start).trim),
              zorderBy = cols)
          case None =>
            OptimizeGraftTable(delegate.parseMultipartIdentifier(tail))
        }
      case None => HistoryStmt.findFirstMatchIn(mask) match {
        case Some(m) =>
          DescribeGraftHistory(
            delegate.parseMultipartIdentifier(nameAfter(sqlText, m)))
        case None => vacuumOrDelegate(sqlText, mask)
      }
    }
  }

  private def vacuumOrDelegate(sqlText: String, mask: String): LogicalPlan =
    VacuumStmt.findFirstMatchIn(mask) match {
      case Some(m) =>
        val rest = nameAfter(sqlText, m)
        RetainClause.findFirstMatchIn(rest) match {
          case Some(r) =>
            VacuumGraftTable(
              delegate.parseMultipartIdentifier(rest.substring(0, r.start)),
              Some(r.group(1).toLong))
          case None =>
            VacuumGraftTable(delegate.parseMultipartIdentifier(rest), None)
        }
      case None => rewrite(sqlText, delegate.parsePlan)
    }
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
