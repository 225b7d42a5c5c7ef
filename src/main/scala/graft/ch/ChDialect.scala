package graft.ch

import java.util.regex.{Matcher, Pattern}

import scala.collection.mutable
import scala.util.matching.Regex

/** ClickHouse/Grafana SQL front-end — the last SURVEY §7.3 gap, closed in
  * round 5: a user of the reference can paste a dashboard panel's `rawSql`
  * (etc/grafana-dashboard-trades.json) VERBATIM and run it on this engine.
  *
  * The translator rewrites exactly the dialect surface those 20 panels use
  * (each rule cites the panel that needs it); everything else is passed
  * through untouched so ANSI-compatible SQL is not perturbed. Every
  * rewrite after macro substitution is literal-aware: matches starting
  * inside single-quoted strings are never touched (macros DO substitute
  * inside strings — that is Grafana's own behavior).
  *
  *   1. Grafana template variables — `${interval}`/`$interval`,
  *      `$sec_code`, `$sec_code_etf`, `$__fromTime`, `$__toTime`
  *      (GD:113,643,3888) — substituted from a caller-supplied map,
  *      longest name first so `$sec_code_etf` is not clobbered by
  *      `$sec_code`.
  *   2. ClickHouse array literals in membership tests —
  *      `IN [..]` / `NOT IN [..]` (GD:113) → `IN (..)`.
  *   3. Double-quoted identifiers (ANSI / ClickHouse) → backticks, since
  *      Spark SQL reads `"x"` as a string literal. Applied outside
  *      single-quoted strings only; covers the panels' Cyrillic aliases
  *      (`"разница объемов"`, GD:113).
  *   4. Database qualifiers `default.` / `"default".` are dropped, and
  *      backticks around the known table names (the keys of the
  *      caller's schema map) are removed so they resolve against the
  *      harness's temp views (GD:113).
  *   5. `toStartOfInterval(t, INTERVAL n MINUTE)` (GD:113) →
  *      `to_start_of_interval(t, n*60)` — the engine's registered Catalyst
  *      epoch-floor function ([[graft.expr.GraftFunctions]]).
  *   6. `topK(k)(col)` (GD:374) → `graft_topk(col, k)` — the SpaceSaving
  *      aggregate ([[graft.expr.TopK]]). ClickHouse's combinator syntax
  *      (parameters in a separate arg list) becomes a plain 2-arg call.
  *   7. `timestamp_add(day, 1, t)` (GD:794) → `timestampadd(DAY, 1, t)`.
  *   8. Alias-in-WHERE (GD:113: `minute >= $__fromTime` where `minute` is
  *      a SELECT alias): ClickHouse resolves WHERE against SELECT aliases;
  *      Spark does not. Non-aggregate aliases are inlined into the WHERE
  *      clause of their own SELECT block (scope-aware, so an outer block
  *      never sees an inner block's aliases).
  *   9. Ambiguous bare columns under a join (GD:113: `board = 'TQBR'`
  *      where both joined tables have `board`): ClickHouse prefers the
  *      left table; Spark raises AMBIGUOUS_REFERENCE. Bare references to
  *      columns present in BOTH sides are qualified with the left table's
  *      name/alias, in every clause except FROM (the ON condition already
  *      qualifies).
  *
  * `==` equality and `if(c, a, b)` (GD:113) are already valid Spark SQL
  * and need no rule. Alias references in GROUP BY / HAVING / ORDER BY are
  * native Spark behavior (`spark.sql.groupByAliases`, resolution against
  * aggregate output) and are left alone.
  */
object ChDialect {

  /** Full pipeline: macro substitution, then the global token rewrites,
    * then the scope-aware alias/ambiguity rewrites.
    *
    * @param schemas column sets of the tables the query may reference,
    *                keyed by the post-rewrite table name — used for
    *                table-name unquoting (rule 4) and left-preference
    *                qualification (rule 9).
    */
  def translate(
      raw: String,
      params: Map[String, String],
      schemas: Map[String, Set[String]]): String = {
    var s = substituteMacros(raw, params)
    s = bracketListsToParens(s)
    s = doubleQuotesToBackticks(s)
    s = stripDbQualifiers(s, schemas.keySet)
    s = rewriteToStartOfInterval(s)
    s = rewriteTimestampAdd(s)
    s = rewriteTopK(s)
    rewriteBlock(s, schemas)
  }

  // ---- literal awareness ----------------------------------------------------

  /** True at positions inside single-quoted string literals (delimiters
    * included). Backtick identifiers are NOT masked — they are
    * identifiers, and the rewrite patterns guard them individually.
    */
  private def stringMask(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var inStr = false
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inStr) { in(i) = true; if (c == '\'') inStr = false }
      else if (c == '\'') { in(i) = true; inStr = true }
    }
    in
  }

  /** True at positions inside single-quoted strings OR backtick
    * identifiers — the mask for structural scans (paren counting), where
    * a paren inside EITHER kind of quoting must not count.
    */
  private def quotedMask(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var inStr = false; var inBt = false
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inStr) { in(i) = true; if (c == '\'') inStr = false }
      else if (inBt) { in(i) = true; if (c == '`') inBt = false }
      else if (c == '\'') { in(i) = true; inStr = true }
      else if (c == '`') { in(i) = true; inBt = true }
    }
    in
  }

  /** Regex replacement applied only to matches that START outside string
    * literals. The rewrite patterns cannot span OUT of a quote (their
    * quoted segments are self-contained alternatives), so checking the
    * start position is sufficient.
    */
  private def replaceOutsideLiterals(s: String, re: Regex)(repl: Regex.Match => String): String = {
    val mask = stringMask(s)
    val sb = new StringBuilder
    var last = 0
    for (m <- re.findAllMatchIn(s) if !mask(m.start)) {
      sb.append(s.substring(last, m.start)).append(repl(m))
      last = m.end
    }
    sb.append(s.substring(last)).toString
  }

  // ---- rule 1 -------------------------------------------------------------

  /** Macros substitute INSIDE string literals too (Grafana's own
    * behavior). The bare `$name` form requires an identifier boundary
    * after the name (round-5 advice) so a macro that is a strict prefix
    * of an unknown dashboard variable (`$interval` in `$intervalx`) can
    * never clobber it; longest-first ordering protects among the supplied
    * params themselves.
    */
  def substituteMacros(sql: String, params: Map[String, String]): String = {
    var out = sql
    for (n <- params.keys.toSeq.sortBy(-_.length)) {
      out = out.replace("${" + n + "}", params(n))
      out = ("\\$" + Pattern.quote(n) + "(?![\\w])").r
        .replaceAllIn(out, Matcher.quoteReplacement(params(n)))
    }
    out
  }

  // ---- rules 2-7 (global, scope-free) -------------------------------------

  // bracket-list content = quoted strings or non-bracket chars, so a ']'
  // INSIDE a quoted element never truncates the match
  private val InBrackets = """(?is)\b(in)\s*\[((?:'[^']*'|[^\[\]'])*)\]""".r

  def bracketListsToParens(sql: String): String =
    replaceOutsideLiterals(sql, InBrackets)(m => s"${m.group(1)} (${m.group(2)})")

  /** `"ident"` → `` `ident` `` outside single-quoted strings. */
  def doubleQuotesToBackticks(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var inStr = false
    for (c <- sql) c match {
      case '\'' => inStr = !inStr; sb.append(c)
      case '"' if !inStr => sb.append('`')
      case other => sb.append(other)
    }
    sb.toString
  }

  private val DefaultQualifier = """(?i)(?:`default`|(?<![\w`])default)\.""".r

  /** Drop `default.` database qualifiers and unquote the known table
    * names so they match the harness's temp views. Known names come from
    * the caller's schema map — nothing table-specific lives here.
    */
  def stripDbQualifiers(sql: String, tables: Set[String]): String = {
    val noDb = replaceOutsideLiterals(sql, DefaultQualifier)(_ => "")
    tables.foldLeft(noDb) { (s, t) =>
      replaceOutsideLiterals(s, s"`${Pattern.quote(t)}`".r)(_ => t)
    }
  }

  private val StartOfInterval = """(?is)toStartOfInterval\s*\(""".r
  private val IntervalMinute = """(?is)INTERVAL\s+(\d+)\s+MINUTE""".r

  /** The INTERVAL literal only occurs as toStartOfInterval's 2nd argument
    * in this dialect surface, so the two rewrites compose textually.
    */
  def rewriteToStartOfInterval(sql: String): String = {
    val seconds = replaceOutsideLiterals(sql, IntervalMinute)(m => (m.group(1).toInt * 60).toString)
    replaceOutsideLiterals(seconds, StartOfInterval)(_ => "to_start_of_interval(")
  }

  private val TimestampAdd = """(?is)\btimestamp_add\s*\(""".r

  def rewriteTimestampAdd(sql: String): String =
    replaceOutsideLiterals(sql, TimestampAdd)(_ => "timestampadd(")

  private val TopKCall = """(?is)\btopK\s*\(\s*(\d+)\s*\)\s*\(((?:'[^']*'|[^()'])*)\)""".r

  def rewriteTopK(sql: String): String =
    replaceOutsideLiterals(sql, TopKCall)(m => s"graft_topk(${m.group(2).trim}, ${m.group(1)})")

  // ---- rules 8-9 (scope-aware) --------------------------------------------

  /** True at positions outside single-quoted strings and backtick
    * identifiers AND at paren depth 0 of this block. The char-by-char scan
    * is the whole "parser" — the panels' SQL is regular enough that clause
    * keywords at depth 0 delimit blocks exactly.
    */
  private def topLevel(s: String): Array[Boolean] = {
    val vis = new Array[Boolean](s.length)
    var depth = 0; var inStr = false; var inBt = false
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; vis(i) = false }
      else if (inBt) { if (c == '`') inBt = false; vis(i) = false }
      else c match {
        case '\'' => inStr = true; vis(i) = false
        case '`' => inBt = true; vis(i) = false
        // '(' is visible at the depth where it OPENS, ')' where it CLOSES,
        // so a depth-0 "(SELECT ..." group is findable from depth 0
        case '(' => vis(i) = depth == 0; depth += 1
        case ')' => depth -= 1; vis(i) = depth == 0
        case _ => vis(i) = depth == 0
      }
    }
    vis
  }

  private val UnionAll = """(?is)\bUNION\s+ALL\b""".r
  private val Clause =
    """(?is)\b(SELECT|FROM|WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT)\b""".r
  private val AsAlias = """(?is)^(.*\S)\s+as\s+(`[^`]+`|\w+)\s*$""".r
  private val Aggregate = """(?is)\b(sum|count|avg|min|max|graft_topk)\s*\(""".r

  /** Words that can directly follow a table name in FROM without being
    * its alias — rejecting them makes the alias sniffing safe for every
    * join spelling (INNER/LEFT/ANY/GLOBAL/ASOF...).
    */
  private val NonAliasWords = Set(
    "join", "inner", "left", "right", "full", "cross", "outer", "semi",
    "anti", "any", "all", "asof", "global", "natural", "using", "on",
    "where", "group", "having", "order", "limit", "union")

  private def rewriteBlock(sql: String, schemas: Map[String, Set[String]]): String = {
    // top-level UNION ALL splits the block into independent scopes
    val vis0 = topLevel(sql)
    val unions = UnionAll.findAllMatchIn(sql).filter(m => vis0(m.start)).toSeq
    if (unions.nonEmpty) {
      val cuts = (-1 +: unions.flatMap(m => Seq(m.start, m.end - 1))) :+ sql.length
      return cuts.grouped(2).map { case Seq(a, b) => rewriteBlock(sql.substring(a + 1, b), schemas) }
        .mkString("\nUNION ALL\n")
    }

    // recurse into subqueries, then hide them behind placeholders so this
    // block's alias/ambiguity rewrites cannot leak into inner scopes
    val stash = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    val vis = topLevel(sql)
    val lit = quotedMask(sql) // parens inside '..' AND `..` must not count
    while (i < sql.length) {
      if (sql.charAt(i) == '(' && vis(i)) {
        var depth = 1; var j = i + 1
        while (depth > 0 && j < sql.length) {
          val c = sql.charAt(j)
          if (!lit(j)) { if (c == '(') depth += 1 else if (c == ')') depth -= 1 }
          j += 1
        }
        require(depth == 0, s"unbalanced parentheses in SQL: $sql")
        val inner = sql.substring(i + 1, j - 1)
        if (inner.trim.toLowerCase.startsWith("select")) {
          stash += s"(${rewriteBlock(inner, schemas)})"
          sb.append('\u0001').append(stash.length - 1).append('\u0001')
        } else sb.append(sql.substring(i, j))
        i = j
      } else { sb.append(sql.charAt(i)); i += 1 }
    }
    val flat = sb.toString

    // clause spans at depth 0
    val fvis = topLevel(flat)
    val marks = Clause.findAllMatchIn(flat).filter(m => fvis(m.start)).toSeq
    val spans: Seq[(String, String)] = marks.zipWithIndex.map { case (m, k) =>
      val end = if (k + 1 < marks.length) marks(k + 1).start else flat.length
      (m.group(1).toLowerCase.replaceAll("\\s+", " "), flat.substring(m.end, end))
    }
    def clause(kw: String): Option[String] = spans.collectFirst { case (k, b) if k == kw => b }

    // rule 8: inline this block's non-aggregate SELECT aliases into WHERE
    val aliases: Seq[(String, String)] = clause("select").toSeq.flatMap { sel =>
      splitTopLevel(sel, ',').flatMap {
        case AsAlias(expr, alias) if Aggregate.findFirstIn(expr).isEmpty =>
          Some(alias.stripPrefix("`").stripSuffix("`") -> expr.trim)
        case _ => None
      }
    }
    def inlineAliases(body: String): String =
      aliases.sortBy(-_._1.length).foldLeft(body) { case (b, (a, expr)) =>
        val re = s"(?i)(?<![\\w`.])${Pattern.quote(a)}(?![\\w`])|`${Pattern.quote(a)}`".r
        replaceOutsideLiterals(b, re)(_ => s"($expr)")
      }

    // rule 9: qualify bare columns that exist in BOTH joined tables.
    // Table presence = a word-boundary match OUTSIDE string literals
    // (round-5 advice: plain contains() saw a table name inside a FROM
    // string literal, or as a prefix of a longer identifier like
    // transaq_trades_v2, and mis-qualified bare columns).
    val from = clause("from").getOrElse("")
    val fromMask = stringMask(from)
    val tablesInFrom = schemas.keys.toSeq
      .flatMap { t =>
        val re = s"(?i)(?<![\\w`])${Pattern.quote(t)}(?![\\w`])".r
        re.findAllMatchIn(from).find(m => !fromMask(m.start)).map(m => (t, m.start))
      }
      .sortBy(_._2).map(_._1)
    val leftQual: Option[String] = tablesInFrom.headOption.map { t =>
      val m = s"""(?is)\\b${Pattern.quote(t)}\\s+(?:as\\s+)?(\\w+)""".r.findFirstMatchIn(from)
      m.map(_.group(1)).filterNot(a => NonAliasWords.contains(a.toLowerCase))
        .getOrElse(t)
    }
    val ambiguous: Set[String] =
      if (tablesInFrom.length >= 2 && """(?is)\bjoin\b""".r.findFirstIn(from).isDefined)
        tablesInFrom.map(schemas).reduce(_ intersect _)
      else Set.empty
    def qualify(body: String): String =
      ambiguous.foldLeft(body) { case (b, c) =>
        val re = s"(?i)(?<![\\w`.])${Pattern.quote(c)}(?![\\w`])".r
        replaceOutsideLiterals(b, re)(_ => s"${leftQual.get}.$c")
      }

    val rebuilt = new StringBuilder(flat.substring(0, marks.headOption.map(_.start).getOrElse(flat.length)))
    for (((kw, body), k) <- spans.zipWithIndex) {
      rebuilt.append(marks(k).group(1))
      val newBody = kw match {
        case "where" => qualify(inlineAliases(body))
        case "select" | "group by" | "having" | "order by" => qualify(body)
        case _ => body
      }
      rebuilt.append(newBody)
    }

    // restore subqueries
    """\x01(\d+)\x01""".r.replaceAllIn(rebuilt.toString,
      m => Matcher.quoteReplacement(stash(m.group(1).toInt)))
  }

  /** Split at top-level occurrences of `sep`. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val vis = topLevel(s)
    val out = mutable.ArrayBuffer[String]()
    var start = 0
    for (i <- s.indices) if (s.charAt(i) == sep && vis(i)) {
      out += s.substring(start, i); start = i + 1
    }
    out += s.substring(start)
    out.toSeq
  }
}
