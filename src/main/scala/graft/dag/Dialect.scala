package graft.dag

import scala.collection.mutable

/** BigQuery-dialect → Spark SQL translation for the reference's SQL
  * corpus (SURVEY §2.8 shim table; "hard part #2" in §7). Covers every
  * construct the 160-object corpus actually uses — the rule set was
  * derived empirically by sweeping all of data/sql through the Spark
  * analyzer (CorpusSweepSpec) and fixing each failure class:
  *
  *   - raw strings `r"…"`, array literals `[…]`, trailing commas
  *   - `x IN UNNEST(a)` → `array_contains(a, x)`
  *   - `EXISTS (SELECT * FROM UNNEST(a) AS x WHERE p)` → `exists(a, x -> p)`
  *   - `ARRAY(SELECT f FROM UNNEST(a) AS x)` → `transform(a, x -> f)`
  *   - `(SELECT COUNTIF(p) FROM UNNEST(a) AS x)` → `size(filter(a, x -> p))`
  *   - FROM/JOIN-position `UNNEST(a) AS x` → lateral `explode` subqueries
  *     (`LEFT JOIN UNNEST … ON c` keeps its ON; BigQuery's implicit
  *     comma/inner join becomes `CROSS JOIN LATERAL`)
  *   - `SELECT AS STRUCT a AS x, …` (no FROM) → `struct(a AS x, …)`
  *   - scalar renames: COUNTIF, SAFE_CAST, SAFE_DIVIDE, STARTS_WITH,
  *     JSON_VALUE[_ARRAY], NET.HOST, FARM_FINGERPRINT, ARRAY_LENGTH,
  *     PARSE_NUMERIC, CONTAINS_SUBSTR, DATETIME[_DIFF], PARSE_JSON,
  *     JSON_OBJECT, [SAFE.]PARSE_DATE (strftime→Spark format map),
  *     GENERATE_DATE_ARRAY, REGEXP_CONTAINS, TO_JSON_STRING
  *   - ARRAY_AGG [DISTINCT] [IGNORE NULLS] → collect_list / collect_set
  *   - DATE_ADD/DATE_SUB(d, INTERVAL n unit) → date_add/add_months forms
  *   - DATE_TRUNC arg order + BigQuery's Sunday-start WEEK
  *   - SPLIT literal-delimiter regex escaping, BigQuery type names,
  *     trailing QUALIFY
  *
  * Token/scanner-level by design: the corpus is templated SQL strings,
  * and these rewrites compose with JinjaLite rendering and ViewDag's
  * `ref()` resolution. All scanners are string-literal- and
  * comment-aware.
  */
object Dialect {

  def translate(sql: String): String = {
    var s = sql

    // MASK comments, then (post-raw-string pass) string literals, as
    // inert \uE000<n>\uE001 placeholders for the whole pipeline, and
    // restore them at the end. Every pass below — regex token renames
    // included — then provably cannot rewrite inside a literal or a
    // comment (DialectPropertySpec's fuzz caught `'AS INT64'` →
    // `'AS BIGINT'` DATA corruption and comment-context confusing the
    // array-literal prev-char heuristic before this existed). Passes
    // that must read a literal's CONTENT (strftime formats) unmask
    // their own argument via `um`.
    val saved = mutable.ArrayBuffer[String]()
    s = maskOpaque(s, saved, strings = false) // comments first …

    // r"…" raw strings → escaped '…' literals — BEFORE string masking,
    // so their content (regex metachars, parens, brackets) becomes an
    // ordinary literal the string mask then hides.
    s = rewriteRawStrings(s)
    s = maskOpaque(s, saved, strings = true) // … then all literals
    def um(t: String): String = unmask(t, saved)

    // […] array literals → array(…) (expression position only; `a[i]`
    // indexing and bracket text inside strings/comments untouched)
    s = rewriteArrayLiterals(s)

    // UNNEST-subquery idioms → higher-order functions (before the
    // generic FROM/JOIN UNNEST pass sees their inner FROM UNNEST)
    s = rewriteExistsUnnest(s)
    s = rewriteExistsImplicitUnnest(s)
    s = rewriteArraySelectUnnest(s)
    s = rewriteCountifUnnest(s)

    // x IN UNNEST(arr) / x NOT IN UNNEST(arr) → [NOT] array_contains —
    // scanner-based: the left side may be an identifier, a call, or a
    // string literal; the array expr may contain nested calls
    s = rewriteInUnnest(s)

    // remaining UNNEST in relation position → lateral explode; dotted
    // range-variable refs are then re-qualified against the lateral
    val unnestAliases = mutable.Set[String]()
    s = rewriteUnnestRelations(s, unnestAliases)

    // BigQuery's implicit UNNEST: `JOIN rel.array_col AS x` (no ON/
    // USING) and `FROM rel.array_col AS x` flatten a correlated array
    // path (real tables are always backtick-quoted by ref())
    s = rewriteImplicitUnnestJoins(s, unnestAliases)
    s = rewriteImplicitUnnestFrom(s)
    s = requalifyUnnestAliases(s)

    // (SELECT AS STRUCT e AS a, …) with no FROM → struct(e AS a, …)
    s = rewriteSelectAsStruct(s)

    // COUNTIF(p) → count_if(p)  (after the COUNTIF-over-UNNEST pass)
    s = s.replaceAll("(?i)\\bCOUNTIF\\s*\\(", "count_if(")

    // SAFE_CAST(x AS T) → try_cast(x AS T)
    s = s.replaceAll("(?i)\\bSAFE_CAST\\s*\\(", "try_cast(")

    // BigQuery type names in cast targets → Spark type names
    // (INT64/FLOAT64/NUMERIC/BIGNUMERIC/BYTES/BOOL are not Spark types;
    // NUMERIC is BigQuery's fixed DECIMAL(38,9))
    s = s.replaceAll("(?i)\\bAS\\s+INT64\\b", "AS BIGINT")
    s = s.replaceAll("(?i)\\bAS\\s+FLOAT64\\b", "AS DOUBLE")
    s = s.replaceAll("(?i)\\bAS\\s+NUMERIC\\b", "AS DECIMAL(38,9)")
    s = s.replaceAll("(?i)\\bAS\\s+BIGNUMERIC\\b", "AS DECIMAL(38,9)")
    s = s.replaceAll("(?i)\\bAS\\s+BYTES\\b", "AS BINARY")
    s = s.replaceAll("(?i)\\bAS\\s+BOOL\\b", "AS BOOLEAN")

    // SAFE_DIVIDE(a, b) → try_divide(a, b)
    s = s.replaceAll("(?i)\\bSAFE_DIVIDE\\s*\\(", "try_divide(")

    // STARTS_WITH(a, b) → startswith(a, b)
    s = s.replaceAll("(?i)\\bSTARTS_WITH\\s*\\(", "startswith(")

    // REGEXP_CONTAINS(x, re) → regexp_like(x, re)
    s = s.replaceAll("(?i)\\bREGEXP_CONTAINS\\s*\\(", "regexp_like(")

    // TO_JSON_STRING(x) → to_json(x)
    s = s.replaceAll("(?i)\\bTO_JSON_STRING\\s*\\(", "to_json(")

    // JSON_VALUE_ARRAY(j[, p]) → from_json over the (extracted) array text
    s = rewriteCall(s, "JSON_VALUE_ARRAY") { args =>
      if (args.length == 1) s"from_json(${args.head.trim}, 'array<string>')"
      else s"from_json(get_json_object(${args.map(_.trim).mkString(", ")}), 'array<string>')"
    }

    // JSON_VALUE(x[, p]) → get_json_object(x, p) (path defaults to '$')
    s = rewriteCall(s, "JSON_VALUE") { args =>
      if (args.length == 1) s"get_json_object(${args.head.trim}, '$$')"
      else s"get_json_object(${args.map(_.trim).mkString(", ")})"
    }

    // ARRAY_LAST(a) → try_element_at(a, -1)
    s = rewriteCall(s, "ARRAY_LAST") { args => s"try_element_at(${args.head}, -1)" }
    s = rewriteCall(s, "ARRAY_FIRST") { args => s"try_element_at(${args.head}, 1)" }

    // ARRAY_TO_STRING(a, sep[, null_text]) → array_join (same signature)
    s = s.replaceAll("(?i)\\bARRAY_TO_STRING\\s*\\(", "array_join(")

    // PARSE_JSON(x) → (x): the engine maps BigQuery's JSON type to
    // STRING (JSON columns are stored as strings and read with
    // get_json_object), so parsing is the identity
    s = rewriteCall(s, "PARSE_JSON") { args => s"(${args.head})" }

    // JSON_OBJECT('k', v, …) → to_json(named_struct('k', v, …))
    s = rewriteCall(s, "JSON_OBJECT") { args =>
      s"to_json(named_struct(${args.map(_.trim).mkString(", ")}))"
    }

    // NET.HOST(x) → parse_url with a defaulted scheme: BigQuery NET.HOST
    // is best-effort on scheme-less input while parse_url returns NULL —
    // emit the same form as BqShims.netHost so the two shim layers agree
    s = rewriteCall(s, "NET.HOST") { args =>
      val u = args.head.trim
      s"parse_url(CASE WHEN ($u) LIKE '%://%' THEN ($u) ELSE 'http://' || ($u) END, 'HOST')"
    }

    // FARM_FINGERPRINT(x) → xxhash64(x)
    s = s.replaceAll("(?i)\\bFARM_FINGERPRINT\\s*\\(", "xxhash64(")

    // ARRAY_LENGTH(x) → size(x)
    s = s.replaceAll("(?i)\\bARRAY_LENGTH\\s*\\(", "size(")

    // PARSE_NUMERIC(x) → try_cast(x AS DECIMAL(38,9))
    s = rewriteCall(s, "PARSE_NUMERIC") { args =>
      s"try_cast(${args.head} AS DECIMAL(38,9))"
    }

    // CONTAINS_SUBSTR(x, sub) — BigQuery is case-insensitive
    s = rewriteCall(s, "CONTAINS_SUBSTR") { args =>
      s"contains(lower(CAST(${args(0)} AS STRING)), lower(${args(1)}))"
    }

    // DATETIME_DIFF(a, b, unit) → timestampdiff(unit, b, a) (arg order!)
    s = rewriteCall(s, "DATETIME_DIFF") { args =>
      s"timestampdiff(${args(2).trim}, ${args(1)}, ${args(0)})"
    }
    s = rewriteCall(s, "TIMESTAMP_DIFF") { args =>
      s"timestampdiff(${args(2).trim}, ${args(1)}, ${args(0)})"
    }
    s = rewriteCall(s, "DATE_DIFF") { args =>
      s"datediff(${args(2).trim}, ${args(1)}, ${args(0)})"
    }

    // DATETIME(ts) → to_timestamp_ntz(ts) (BigQuery TIMESTAMP→DATETIME
    // conversion; DATETIME_DIFF is already gone so \b…DATETIME( is safe)
    s = s.replaceAll("(?i)\\bDATETIME\\s*\\(", "to_timestamp_ntz(")

    // [SAFE.]PARSE_DATE(fmt, x) → [try_]to_date(x, sparkFmt) — SAFE.
    // variant first, else the bare PARSE_DATE rule matches its tail
    s = rewriteCall(s, "SAFE.PARSE_DATE") { args =>
      s"try_to_date(${args(1)}, ${strftimeToSpark(um(args(0).trim))})"
    }
    s = rewriteCall(s, "PARSE_DATE") { args =>
      s"to_date(${args(1)}, ${strftimeToSpark(um(args(0).trim))})"
    }

    // ARRAY_AGG([DISTINCT] x [IGNORE NULLS]) → collect_set/collect_list
    // (both already skip NULLs, which is exactly BigQuery's IGNORE NULLS;
    // BigQuery errors on aggregated NULLs without it, so the mapping is
    // value-faithful). IGNORE NULLS is stripped only inside this call's
    // arg span — elsewhere (FIRST_VALUE/LAST_VALUE/LEAD/LAG) it is
    // meaning-bearing Spark syntax and must survive translation.
    s = rewriteCall(s, "ARRAY_AGG") { args =>
      val whole = args.mkString(",")
      val distinct = "(?is)^\\s*DISTINCT\\b".r.findFirstIn(whole).isDefined
      val body0 = if (distinct) whole.replaceFirst("(?is)^\\s*DISTINCT\\b", "") else whole
      val body = body0.replaceAll("(?i)\\s+IGNORE\\s+NULLS\\b", "")
      s"${if (distinct) "collect_set" else "collect_list"}($body)"
    }

    // DATE_ADD/DATE_SUB(d, INTERVAL n unit) → unit-specific Spark forms
    s = rewriteDateArith(s, "DATE_ADD", sign = 1)
    s = rewriteDateArith(s, "DATE_SUB", sign = -1)

    // GENERATE_DATE_ARRAY(a, b, INTERVAL n unit) → sequence(a, b, interval n unit)
    s = s.replaceAll("(?i)\\bGENERATE_DATE_ARRAY\\s*\\(", "sequence(")

    // DATE_TRUNC(d, WEEK(SUNDAY)) → date_sub(d, dayofweek(d) - 1)
    s = s.replaceAll("(?i)\\bDATE_TRUNC\\s*\\(\\s*([^,]+?)\\s*,\\s*WEEK\\s*\\(\\s*SUNDAY\\s*\\)\\s*\\)",
      "date_sub($1, dayofweek($1) - 1)")

    // DATE_TRUNC(d, WEEK) — bare WEEK is WEEK(SUNDAY) in BigQuery
    // (Sunday-start), while Spark's date_trunc('WEEK', d) is
    // Monday-start; use the same Sunday-start form as above.
    s = s.replaceAll("(?i)\\bDATE_TRUNC\\s*\\(\\s*([^,()]+(?:\\([^()]*\\))?[^,()]*)\\s*,\\s*WEEK\\s*\\)",
      "date_sub($1, dayofweek($1) - 1)")

    // DATE_TRUNC(d, unit) → CAST(date_trunc('unit', d) AS DATE)
    // (BigQuery arg order; BigQuery DATE_TRUNC takes/returns DATE while
    // Spark's date_trunc returns TIMESTAMP). WEEK is handled above —
    // keep it out of this list.
    s = s.replaceAll("(?i)\\bDATE_TRUNC\\s*\\(\\s*([^,()]+(?:\\([^()]*\\))?[^,()]*)\\s*,\\s*(MONTH|YEAR|DAY|QUARTER|HOUR|MINUTE|SECOND)\\s*\\)",
      "CAST(date_trunc('$2', $1) AS DATE)")

    // SPLIT(x, 'd') two-arg with string-literal delimiter: BigQuery
    // splits on the LITERAL delimiter; Spark's split treats it as a
    // regex — escape regex metacharacters (SPLIT(v, '.') would
    // otherwise return all-empty strings). Explicit limit -1 keeps
    // trailing empties, matching BigQuery.
    s = splitLiteralPattern.replaceAllIn(s, m => {
      val expr = m.group(1)
      // the delimiter arrives as a masked literal — unmask to read it
      // (either quote style; BigQuery allows both)
      val lit = um(m.group(2))
      val delim = regexEscapeForSqlLiteral(
        if (lit.length >= 2 && (lit.head == '\'' || lit.head == '"') &&
          lit.last == lit.head) lit.substring(1, lit.length - 1)
        else lit)
      java.util.regex.Matcher.quoteReplacement(s"split($expr, '$delim', -1)")
    })

    // SPLIT(x) single-arg → split(x, ',') (BigQuery defaults the
    // delimiter to comma; Spark requires it)
    s = s.replaceAll("(?i)\\bSPLIT\\s*\\(\\s*([^,()]+(?:\\([^()]*\\))?[^,()]*)\\s*\\)",
      "split($1, ',', -1)")

    // BigQuery tolerates a trailing comma before FROM; Spark doesn't
    s = s.replaceAll("(?i),((?:\\s|\\uE000\\d+\\uE001)*)FROM\\b", "$1FROM")

    // BigQuery GROUP BY binds SELECT aliases before base columns; Spark
    // resolves base columns first (and errors on ambiguity) — rewrite
    // alias references to ordinals, which both engines bind identically
    s = rewriteGroupByAliases(s)

    // trailing QUALIFY <pred> → wrap: SELECT * FROM (sel, pred AS __q) WHERE __q
    s = rewriteQualify(s)

    unmask(s, saved)
  }

  /** Placeholder delimiters for masked opaque regions. Kept as explicit
    * unicode escapes (NEVER raw private-use-area characters in source \u2014
    * they render invisible in editors/diffs and silently break on edit;
    * r13 advisor finding) and shared by every site that reads or writes
    * a mask: [[maskOpaque]], [[unmask]], and the literal walk-back in
    * the array-membership rewrite. */
  private final val MaskOpen = '\uE000'
  private final val MaskClose = '\uE001'

  /** Replace comments (and, when `strings`, string literals) with inert
    * `\uE000<n>\uE001` placeholders; contents land in `saved` for
    * [[unmask]]. Placeholder chars are control characters no SQL corpus
    * contains, contain no letters/digits/quotes/brackets, and therefore
    * cannot match any token pass or confuse any scanner. */
  private def maskOpaque(sql: String, saved: mutable.ArrayBuffer[String],
      strings: Boolean): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      val isStr = c == '"' || c == '\''
      val j = skipOpaque(sql, i)
      if (j > i && (strings || !isStr)) {
        out.append(MaskOpen).append(saved.length).append(MaskClose)
        saved += sql.substring(i, j)
        i = j
      } else if (j > i) { // string literal kept in the comment-only pass
        out.append(sql.substring(i, j)); i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def unmask(sql: String, saved: collection.Seq[String]): String = {
    val p = java.util.regex.Pattern.compile(s"$MaskOpen(\\d+)$MaskClose")
    val m = p.matcher(sql)
    val sb = new StringBuffer
    while (m.find()) m.appendReplacement(sb,
      java.util.regex.Matcher.quoteReplacement(saved(m.group(1).toInt)))
    m.appendTail(sb)
    sb.toString
  }

  // ---- scanner passes --------------------------------------------------

  /** `r"…"` / `r'…'` BigQuery raw strings → Spark single-quoted
    * literals: backslashes doubled (Spark's string parser halves them
    * back), quotes escaped. */
  private def rewriteRawStrings(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if ((c == 'r' || c == 'R') && i + 1 < sql.length &&
          (sql.charAt(i + 1) == '"' || sql.charAt(i + 1) == '\'') &&
          (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1)) && sql.charAt(i - 1) != '_')) {
        val q = sql.charAt(i + 1)
        val end = sql.indexOf(q, i + 2)
        require(end >= 0, s"Unterminated raw string at $i")
        val content = sql.substring(i + 2, end)
        val escaped = content.replace("\\", "\\\\").replace("'", "\\'")
        out ++= s"'$escaped'"
        i = end + 1
      } else if (c == '"' || c == '\'') {
        // ordinary string literal — copy verbatim
        val end = endOfString(sql, i)
        out ++= sql.substring(i, end)
        i = end
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Expression-position `[…]` → `array(…)`. A `[` whose previous
    * non-space char is an identifier char / `)` / `]` is indexing and is
    * left alone; bracket text inside strings and comments is untouched. */
  private def rewriteArrayLiterals(sql: String): String = {
    val out = new StringBuilder
    val converted = mutable.Stack[Boolean]()
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '"' || c == '\'') { val e = endOfString(sql, i); out ++= sql.substring(i, e); i = e }
      else if (sql.startsWith("--", i)) { val e = endOfLine(sql, i); out ++= sql.substring(i, e); i = e }
      else if (sql.startsWith("/*", i)) {
        val e = sql.indexOf("*/", i + 2) match { case -1 => sql.length; case x => x + 2 }
        out ++= sql.substring(i, e); i = e
      } else if (c == '[') {
        val prev = lastNonSpace(out)
        // `a[…]` / `f(x)[…]` is indexing — but a preceding KEYWORD
        // (THEN [1,2], IN […], …) still introduces a literal
        val isIndex = prev.exists(p => Character.isLetterOrDigit(p) || p == '_' || p == ')' || p == ']' || p == '`') &&
          !trailingWord(out).exists(w => literalIntroducers.contains(w.toUpperCase))
        if (isIndex) { out += '['; converted.push(false) }
        else { out ++= "array("; converted.push(true) }
        i += 1
      } else if (c == ']') {
        if (converted.nonEmpty && converted.pop()) out += ')' else out += ']'
        i += 1
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** `x [NOT] IN UNNEST(arr)` → `[NOT] array_contains(arr, x)`. The
    * operand is scanned backward from `IN`: a string literal, or an
    * identifier chain optionally ending in a call's arg list. */
  private def rewriteInUnnest(sql: String): String = {
    val pat = "(?is)\\b(NOT\\s+)?IN\\s+UNNEST\\s*\\(".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val negated = m.group(1) != null
        val argOpen = m.end - 1
        val argClose = matchParen(sql, argOpen)
        val arr = sql.substring(argOpen + 1, argClose)
        // scan backward from the match for the operand
        var e = m.start
        while (e > 0 && sql.charAt(e - 1).isWhitespace) e -= 1
        var b = e
        if (b > 0 && sql.charAt(b - 1) == MaskClose) {
          // masked string literal: walk back to its MaskOpen opener
          b -= 1
          while (b > 0 && sql.charAt(b - 1) != MaskOpen) b -= 1
          b -= 1
        } else if (b > 0 && (sql.charAt(b - 1) == '"' || sql.charAt(b - 1) == '\'')) {
          val q = sql.charAt(b - 1)
          b -= 2
          while (b > 0 && sql.charAt(b - 1) != q) b -= 1
          b -= 1
        } else {
          if (b > 0 && sql.charAt(b - 1) == ')') {
            // call form: back over the arg list, then the callee name
            var depth = 0
            b -= 1
            while (b >= 0 && { val c = sql.charAt(b); depth += (if (c == ')') 1 else if (c == '(') -1 else 0); depth != 0 }) b -= 1
          }
          while (b > 0 && { val c = sql.charAt(b - 1); c.isLetterOrDigit || c == '_' || c == '.' || c == '`' }) b -= 1
        }
        require(b < e, s"Cannot find IN UNNEST operand before: ${sql.substring(m.start).take(60)}")
        val operand = sql.substring(b, e)
        val repl = (if (negated) "NOT " else "") + s"array_contains($arr, $operand)"
        rewriteInUnnest(sql.substring(0, b) + repl + sql.substring(argClose + 1))
    }
  }

  /** `EXISTS (SELECT * FROM UNNEST(a) AS x WHERE p)` →
    * `exists(a, x -> p)` (BigQuery's array-membership idiom; the HOF
    * keeps it a scalar expression — no correlated subquery needed). */
  private def rewriteExistsUnnest(sql: String): String = {
    val pat = "(?is)\\bEXISTS\\s*\\(\\s*SELECT\\s+(?:\\*|1)\\s+FROM\\s+UNNEST\\s*\\(".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val outerOpen = sql.indexOf('(', m.start)
        val outerClose = matchParen(sql, outerOpen)
        val argOpen = m.end - 1
        val argClose = matchParen(sql, argOpen)
        val arr = sql.substring(argOpen + 1, argClose)
        val tail = sql.substring(argClose + 1, outerClose)
        val tm = "(?is)^\\s*(?:AS\\s+)?(\\w+)\\s+WHERE\\b".r.findFirstMatchIn(tail)
          .getOrElse(sys.error(s"Unsupported EXISTS-UNNEST shape: ${tail.take(80)}"))
        val x = tm.group(1)
        val pred = tail.substring(tm.end).trim
        val repl = s"exists($arr, $x -> $pred)"
        rewriteExistsUnnest(sql.substring(0, m.start) + repl + sql.substring(outerClose + 1))
    }
  }

  /** `EXISTS (SELECT 1 FROM rel.array_col AS x WHERE p)` —
    * BigQuery's IMPLICIT array unnest inside EXISTS — → the same
    * `exists(rel.array_col, x -> p')` HOF as [[rewriteExistsUnnest]],
    * with p's UNQUALIFIED identifiers prefixed `x.` (BigQuery resolves
    * them against the element struct; a Spark lambda resolves bare
    * names against the OUTER scope, so qualification is required).
    *
    * Without this the generic implicit-FROM pass leaves a CORRELATED
    * subquery (`FROM (SELECT inline(arr))`), which Spark decorrelates
    * into a domain join PER EXISTS — measured super-linear on the
    * corpus exec sweep (platform_priority_scores: 11 s at 128 fixture
    * rows, 680 s at 640; the HOF is one linear array scan per row).
    * Qualification is deliberately conservative: only predicates made
    * of bare identifiers, literals/mask tokens, comparison/boolean
    * operators, and IS [NOT] NULL are rewritten — a predicate that
    * references anything dotted (e.g. an outer column) or calls a
    * function falls through to the correlated-subquery path, which
    * stays CORRECT for every shape. */
  private def rewriteExistsImplicitUnnest(sql: String): String = {
    val pat = "(?is)\\bEXISTS\\s*\\(\\s*SELECT\\s+(?:\\*|1)\\s+FROM\\s+([A-Za-z_]\\w*(?:\\.\\w+)+)\\s+(?:AS\\s+)?(\\w+)\\s+WHERE\\b".r
    def qualify(pred: String, x: String): Option[String] = {
      // tokens a safe predicate may contain besides bare identifiers
      val keywords = Set("AND", "OR", "NOT", "IS", "NULL", "TRUE", "FALSE",
        "IN", "LIKE", "BETWEEN")
      val ident = "(?<![\\w.`])[A-Za-z_]\\w*".r
      // reject anything dotted, any call, any subquery — conservative
      if (pred.contains(".") || pred.contains("(")) return None
      val out = ident.replaceAllIn(pred, m => {
        val w = m.matched
        if (keywords.contains(w.toUpperCase) || w == x) w else s"$x.$w"
      })
      Some(out)
    }
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val outerOpen = sql.indexOf('(', m.start)
        val outerClose = matchParen(sql, outerOpen)
        val arr = m.group(1)
        val x = m.group(2)
        val pred = sql.substring(m.end, outerClose).trim
        qualify(pred, x) match {
          case Some(p) =>
            val repl = s"exists($arr, $x -> $p)"
            rewriteExistsImplicitUnnest(
              sql.substring(0, m.start) + repl + sql.substring(outerClose + 1))
          case None =>
            // leave for the correlated-subquery path; skip past this
            // EXISTS so recursion terminates
            sql.substring(0, outerClose) +
              rewriteExistsImplicitUnnest(sql.substring(outerClose))
        }
    }
  }

  /** `ARRAY(SELECT f FROM UNNEST(a) AS x)` → `transform(a, x -> f)`. */
  private def rewriteArraySelectUnnest(sql: String): String = {
    val pat = "(?is)\\bARRAY\\s*\\(\\s*SELECT\\b".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val outerOpen = sql.indexOf('(', m.start)
        val outerClose = matchParen(sql, outerOpen)
        val inner = sql.substring(outerOpen + 1, outerClose)
        val im = "(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+UNNEST\\s*\\(".r.findFirstMatchIn(inner)
          .getOrElse(sys.error(s"Unsupported ARRAY(SELECT…) shape: ${inner.take(80)}"))
        val f = im.group(1)
        val argOpen = im.end - 1
        val argClose = matchParen(inner, argOpen)
        val arr = inner.substring(argOpen + 1, argClose)
        val alias = "(?is)^\\s*(?:AS\\s+)?(\\w+)\\s*$".r.findFirstMatchIn(inner.substring(argClose + 1))
          .getOrElse(sys.error(s"Unsupported ARRAY(SELECT…) alias: ${inner.substring(argClose + 1).take(80)}"))
          .group(1)
        val repl = s"transform($arr, $alias -> $f)"
        rewriteArraySelectUnnest(sql.substring(0, m.start) + repl + sql.substring(outerClose + 1))
    }
  }

  /** `(SELECT COUNTIF(p) FROM UNNEST(a) AS x)` →
    * `size(filter(a, x -> p))`. */
  private def rewriteCountifUnnest(sql: String): String = {
    val pat = "(?is)\\(\\s*SELECT\\s+COUNTIF\\s*\\(".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val outerOpen = m.start
        val outerClose = matchParen(sql, outerOpen)
        val predOpen = m.end - 1
        val predClose = matchParen(sql, predOpen)
        val pred = sql.substring(predOpen + 1, predClose)
        val rest = sql.substring(predClose + 1, outerClose)
        val rm = "(?is)^\\s*FROM\\s+UNNEST\\s*\\(".r.findFirstMatchIn(rest)
          .getOrElse(return sql) // plain COUNTIF subquery over a table — leave it
        val argOpen = predClose + 1 + rm.end - 1
        val argClose = matchParen(sql, argOpen)
        val arr = sql.substring(argOpen + 1, argClose)
        val alias = "(?is)^\\s*(?:AS\\s+)?(\\w+)\\s*$".r
          .findFirstMatchIn(sql.substring(argClose + 1, outerClose))
          .getOrElse(sys.error("Unsupported COUNTIF-UNNEST alias")).group(1)
        val repl = s"size(filter($arr, $alias -> $pred))"
        rewriteCountifUnnest(sql.substring(0, outerOpen) + repl + sql.substring(outerClose + 1))
    }
  }

  /** FROM/JOIN-position `UNNEST(a) AS x` → lateral subqueries. When the
    * query references `x.field` anywhere, the element is a struct and
    * BigQuery's range variable doubles as a row — translated with
    * `inline` (struct fields become columns of relation `x`, so
    * `x.field` resolves and can't collide with a base column also named
    * `x`). Otherwise `explode` exposes the scalar element as column `x`.
    * LEFT JOIN keeps (or gains) its ON; BigQuery's implicit-true
    * inner/cross joins become CROSS JOIN LATERAL. */
  private def rewriteUnnestRelations(sql: String, aliases: mutable.Set[String]): String = {
    val pat = "(?is)\\b(LEFT\\s+(?:OUTER\\s+)?JOIN|CROSS\\s+JOIN|INNER\\s+JOIN|JOIN|FROM)\\s+UNNEST\\s*\\(".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val kw = m.group(1).toUpperCase.replaceAll("\\s+", " ")
        val argOpen = m.end - 1
        val argClose = matchParen(sql, argOpen)
        val arr = sql.substring(argOpen + 1, argClose)
        val tail = sql.substring(argClose + 1)
        val am = "(?is)^\\s*(?:AS\\s+)?(\\w+)".r.findFirstMatchIn(tail)
          .getOrElse(sys.error(s"UNNEST relation without alias: ${tail.take(80)}"))
        val alias = am.group(1)
        aliases += alias
        val afterAlias = tail.substring(am.end)
        val onM = "(?is)^\\s*ON\\b".r.findFirstMatchIn(afterAlias)
        val (repl, rest) = kw match {
          case "FROM" =>
            (s"FROM ${unnestDerivedTable(arr, alias)}", afterAlias)
          case k if k.startsWith("LEFT") && onM.isDefined =>
            // Push the ON predicate into a filter lambda over the array
            // (the element IS the lambda variable, so `alias.field` and
            // bare `alias` references in the predicate just work). An ON
            // that references the lateral's output column trips a Spark
            // analyzer bug when the query is later CTE-inlined under
            // PIVOT — ON true avoids it while keeping LEFT semantics.
            val predStart = onM.get.end
            val predEnd = joinPredEnd(afterAlias, predStart)
            val pred = afterAlias.substring(predStart, predEnd).trim
            (s"LEFT JOIN LATERAL (SELECT explode(filter($arr, $alias -> $pred)) AS $alias) AS __lat_$alias ON true\n",
              afterAlias.substring(predEnd))
          case k if k.startsWith("LEFT") =>
            (s"LEFT JOIN LATERAL ${unnestDerivedTable(arr, alias)} ON true", afterAlias)
          case _ =>
            (s"CROSS JOIN LATERAL ${unnestDerivedTable(arr, alias)}", afterAlias)
        }
        rewriteUnnestRelations(sql.substring(0, m.start) + repl + rest, aliases)
    }
  }

  /** End of a join's ON predicate starting at `from` (depth-0 scan):
    * the next join/clause keyword, `)`, or `,`. */
  private def joinPredEnd(s: String, from: Int): Int = {
    val enders = Seq("JOIN", "LEFT", "RIGHT", "INNER", "CROSS", "FULL", "LATERAL",
      "WHERE", "GROUP", "ORDER", "LIMIT", "UNION", "HAVING", "QUALIFY", "PIVOT", "WINDOW")
    var depth = 0
    var i = from
    val upper = s.toUpperCase
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') i = endOfString(s, i)
      else {
        if (c == '(') depth += 1
        else if (c == ')') { if (depth == 0) return i; depth -= 1 }
        else if (c == ',' && depth == 0) return i
        else if (depth == 0 && (i == 0 || !isWordChar(s.charAt(i - 1))) &&
          enders.exists(k => upper.startsWith(k, i) &&
            (i + k.length >= s.length || !isWordChar(s.charAt(i + k.length)))))
          return i
        i += 1
      }
    }
    s.length
  }

  /** Derived-table text for an UNNEST relation: the element becomes
    * column `alias` of relation `__lat_alias`. BigQuery lets the range
    * variable double as a struct row (`alias.field`); those dotted refs
    * are re-qualified to `__lat_alias.alias.field` by
    * [[requalifyUnnestAliases]] so they can't collide with a base
    * column that shares the alias's name. */
  private def unnestDerivedTable(arr: String, alias: String): String =
    s"(SELECT explode($arr) AS $alias) AS __lat_$alias"

  /** Re-qualify references to UNNEST range variables. BigQuery lets the
    * alias shadow a base column of the same name and double as both a
    * value (`x`, `x.x`) and a struct row (`x.field`); Spark would
    * report AMBIGUOUS_REFERENCE. For every generated `AS __lat_x`
    * marker, tokens `x` are rewritten to `__lat_x.x[...]` — but ONLY
    * inside the marker's innermost enclosing paren scope (an alias in
    * one CTE must not capture references in another), and never in
    * definition/relation positions (after AS/FROM/JOIN), call
    * positions (`x(`), already-qualified paths (`.x`), strings,
    * comments, or the generated derived tables themselves. */
  private def requalifyUnnestAliases(sql: String): String = {
    // marker alias -> scope spans (innermost enclosing parens)
    val markerPat = "\\bAS\\s+__lat_(\\w+)".r
    val scopes: Seq[(String, Int, Int)] = markerPat.findAllMatchIn(sql).map { m =>
      val (a, b) = enclosingParenSpan(sql, m.start)
      (m.group(1), a, b)
    }.toSeq
    if (scopes.isEmpty) return sql
    // generated derived blocks — excluded from rewriting
    val derivedBlocks: Seq[(Int, Int)] = {
      val p = "\\(SELECT explode\\(".r
      p.findAllMatchIn(sql).map(m => (m.start, matchParen(sql, m.start))).toSeq
    }
    def inDerived(i: Int) = derivedBlocks.exists { case (a, b) => i > a && i <= b }
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '"' || c == '\'') { val e = endOfString(sql, i); out ++= sql.substring(i, e); i = e }
      else if (sql.startsWith("--", i)) { val e = endOfLine(sql, i); out ++= sql.substring(i, e); i = e }
      else if (sql.startsWith("/*", i)) {
        val e = sql.indexOf("*/", i + 2) match { case -1 => sql.length; case x => x + 2 }
        out ++= sql.substring(i, e); i = e
      } else if (isWordChar(c)) {
        var j = i
        while (j < sql.length && isWordChar(sql.charAt(j))) j += 1
        val word = sql.substring(i, j)
        val inScope = scopes.exists { case (a, lo, hi) =>
          a.equalsIgnoreCase(word) && i >= lo && i <= hi
        }
        val prevIsDot = i > 0 && sql.charAt(i - 1) == '.'
        var k = j
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        val nextIsCall = k < sql.length && sql.charAt(k) == '('
        val nextIsDot = j < sql.length && sql.charAt(j) == '.'
        val prevWord = trailingWord(out).map(_.toUpperCase)
        val defPosition = prevWord.exists(Set("AS", "FROM", "JOIN", "LATERAL"))
        if (inScope && !prevIsDot && !nextIsCall && !defPosition && !inDerived(i) && !word.startsWith("__lat_")) {
          out ++= s"__lat_$word.$word"
          if (nextIsDot) {
            // `alias.alias` is BigQuery's table.column spelling of the
            // scalar element — fold it into the single column
            var e2 = j + 1
            while (e2 < sql.length && isWordChar(sql.charAt(e2))) e2 += 1
            val w2 = sql.substring(j + 1, e2)
            if (w2.equalsIgnoreCase(word) && !(e2 < sql.length && sql.charAt(e2) == '.')) j = e2
          }
        } else out ++= word
        i = j
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Innermost paren span strictly containing `pos` (string-aware);
    * the whole string when `pos` is at top level. */
  private def enclosingParenSpan(sql: String, pos: Int): (Int, Int) = {
    val stack = mutable.Stack[Int]()
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '"' || c == '\'') i = endOfString(sql, i)
      else {
        if (c == '(') stack.push(i)
        else if (c == ')') {
          if (stack.nonEmpty) {
            val open = stack.pop()
            if (open < pos && pos < i) return (open, i)
          }
        }
        i += 1
      }
    }
    (0, sql.length)
  }

  /** `[LEFT] JOIN rel.array_col AS x` (a dotted, unquoted path with no
    * ON/USING — refs to real tables are always backtick-quoted in the
    * corpus) → lateral explode of the correlated array. */
  private def rewriteImplicitUnnestJoins(sql: String, aliases: mutable.Set[String]): String = {
    val pat = "(?i)\\b(LEFT\\s+(?:OUTER\\s+)?JOIN|JOIN)\\s+([A-Za-z_]\\w*(?:\\.\\w+)+)\\s+AS\\s+(\\w+)".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val after = sql.substring(m.end)
        if ("(?is)^\\s*(ON|USING)\\b".r.findFirstMatchIn(after).isDefined) return sql
        val kw = m.group(1).toUpperCase
        aliases += m.group(3)
        val derived = unnestDerivedTable(m.group(2), m.group(3))
        val repl =
          if (kw.startsWith("LEFT")) s"LEFT JOIN LATERAL $derived ON true"
          else s"CROSS JOIN LATERAL $derived"
        rewriteImplicitUnnestJoins(sql.substring(0, m.start) + repl + after, aliases)
    }
  }

  /** `FROM rel.array_col AS x` — an unquoted dotted path as a base
    * relation is BigQuery's implicit UNNEST of an array of structs
    * (e.g. `EXISTS (SELECT 1 FROM features.webcompat_bugs AS b WHERE
    * priority = …)`). `inline` exposes the struct fields as columns of
    * relation `x`, so BigQuery's unqualified field references resolve. */
  private def rewriteImplicitUnnestFrom(sql: String): String = {
    val pat = "(?i)\\bFROM\\s+([A-Za-z_]\\w*(?:\\.\\w+)+)\\s+(?:AS\\s+)?(\\w+)".r
    val keywords = Set("WHERE", "GROUP", "ORDER", "ON", "JOIN", "LEFT", "CROSS",
      "INNER", "UNION", "LIMIT", "HAVING", "AS", "USING", "PIVOT")
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val alias = if (keywords.contains(m.group(2).toUpperCase))
          m.group(1).split('.').last else m.group(2)
        val end = if (keywords.contains(m.group(2).toUpperCase))
          m.start + m.group(0).lastIndexOf(m.group(2)) else m.end
        val repl = s"FROM (SELECT inline(${m.group(1)})) AS $alias"
        rewriteImplicitUnnestFrom(sql.substring(0, m.start) + repl + sql.substring(end))
    }
  }

  /** `(SELECT AS STRUCT e1 AS a, e2 AS b, …)` with no FROM →
    * `struct(e1 AS a, …)` (BigQuery's typed-struct scalar subquery). */
  private def rewriteSelectAsStruct(sql: String): String = {
    val pat = "(?is)\\(\\s*SELECT\\s+AS\\s+STRUCT\\b".r
    pat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val open = m.start
        val close = matchParen(sql, open)
        val body = sql.substring(m.end, close)
        if (indexOfTopLevel(body, "FROM") >= 0) return sql // table-backed — out of scope
        val repl = s"struct(${body.trim})"
        rewriteSelectAsStruct(sql.substring(0, open) + repl + sql.substring(close + 1))
    }
  }

  /** DATE_ADD/DATE_SUB(d, INTERVAL n unit) → Spark arithmetic. */
  private def rewriteDateArith(sql: String, fname: String, sign: Int): String =
    rewriteCall(sql, fname) { args =>
      val d = args(0).trim
      val im = "(?i)^\\s*INTERVAL\\s+(\\d+)\\s+(\\w+)\\s*$".r.findFirstMatchIn(args(1))
        .getOrElse(sys.error(s"$fname without INTERVAL arg: ${args(1)}"))
      val n = im.group(1).toInt
      im.group(2).toUpperCase match {
        case "DAY" => if (sign > 0) s"date_add($d, $n)" else s"date_sub($d, $n)"
        case "WEEK" => if (sign > 0) s"date_add($d, ${7 * n})" else s"date_sub($d, ${7 * n})"
        case "MONTH" => s"add_months($d, ${sign * n})"
        case "QUARTER" => s"add_months($d, ${sign * 3 * n})"
        case "YEAR" => s"add_months($d, ${sign * 12 * n})"
        case other => sys.error(s"Unsupported $fname unit $other")
      }
    }

  /** BigQuery strftime format literal → Spark datetime pattern literal
    * (both sides single-quoted SQL strings). */
  private def strftimeToSpark(fmtLiteral: String): String = {
    val raw = fmtLiteral.trim.stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      if (raw.charAt(i) == '%' && i + 1 < raw.length) {
        sb ++= (raw.charAt(i + 1) match {
          case 'F' => "yyyy-MM-dd"
          case 'Y' => "yyyy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'e' => "d"
          case 'H' => "HH"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'j' => "DDD"
          case other => sys.error(s"Unsupported strftime token %$other")
        })
        i += 2
      } else { sb += raw.charAt(i); i += 1 }
    }
    s"'${sb.toString}'"
  }

  /** Replace bare-identifier GROUP BY items that name an explicit
    * SELECT alias with that item's ordinal (see call site). Each GROUP
    * BY is matched to the nearest preceding SELECT at the same paren
    * depth; clause scopes end at ORDER/LIMIT/HAVING/UNION/`)`. */
  private def rewriteGroupByAliases(sql: String): String = {
    val groupBys = tokenPositions(sql, "GROUP").filter { case (i, _) =>
      "(?is)^GROUP\\s+BY\\b".r.findFirstIn(sql.substring(i)).isDefined
    }
    // rewrite from last to first so indices stay valid
    groupBys.sortBy(-_._1).foldLeft(sql) { case (s, (gIdx, depth)) =>
      rewriteOneGroupBy(s, gIdx, depth)
    }
  }

  private def rewriteOneGroupBy(sql: String, gIdx: Int, depth: Int): String = {
    val selects = tokenPositions(sql, "SELECT")
    val sel = selects.filter(p => p._1 < gIdx && p._2 == depth).map(_._1).lastOption
      .getOrElse(return sql)
    val froms = tokenPositions(sql, "FROM")
    val from = froms.filter(p => p._1 > sel && p._1 < gIdx && p._2 == depth).map(_._1)
      .headOption.getOrElse(return sql)
    val selectItems = splitTopLevel(sql.substring(sel + "SELECT".length, from))
    val aliasToOrdinal: Map[String, Int] = selectItems.zipWithIndex.flatMap { case (item, i) =>
      "(?is)\\s+AS\\s+(\\w+)\\s*$".r.findFirstMatchIn(item).map(_.group(1).toLowerCase -> (i + 1))
    }.toMap
    if (aliasToOrdinal.isEmpty) return sql
    // Spark binds GROUP BY ordinals AFTER star expansion: any `*`/`t.*`
    // in the select list shifts positions underneath the ordinal, so the
    // rewrite would silently bind the wrong column — leave the aliases
    // untouched (the query then resolves or fails loudly in analysis)
    if (selectItems.exists(_.trim.endsWith("*"))) return sql
    val byEnd = gIdx + "(?is)^GROUP\\s+BY".r.findFirstIn(sql.substring(gIdx)).get.length
    val clauseEnd = clauseEndFrom(sql, byEnd, depth)
    val items = splitTopLevel(sql.substring(byEnd, clauseEnd))
    val rewritten = items.map { item =>
      val bare = item.trim
      if (bare.matches("(?i)[A-Za-z_]\\w*") && aliasToOrdinal.contains(bare.toLowerCase)) {
        // keep the item's original whitespace so clause keywords that
        // follow (ORDER BY on the next line) stay separated
        val lead = item.takeWhile(_.isWhitespace)
        val trail = item.reverse.takeWhile(_.isWhitespace).reverse
        s"$lead${aliasToOrdinal(bare.toLowerCase)}$trail"
      } else item
    }
    sql.substring(0, byEnd) + rewritten.mkString(",") + sql.substring(clauseEnd)
  }

  /** Positions (index, parenDepth) of a keyword token, string-aware. */
  private def tokenPositions(sql: String, word: String): Seq[(Int, Int)] = {
    val out = mutable.ArrayBuffer[(Int, Int)]()
    var depth = 0
    var i = 0
    val upper = sql.toUpperCase
    val w = word.toUpperCase
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '"' || c == '\'') i = endOfString(sql, i)
      else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (upper.startsWith(w, i) &&
          (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
          (i + w.length >= sql.length || !isWordChar(sql.charAt(i + w.length))))
          out += ((i, depth))
        i += 1
      }
    }
    out.toSeq
  }

  /** End of the clause starting at `start` (same paren depth): first
    * ORDER/LIMIT/HAVING/UNION/WINDOW/QUALIFY token or closing paren. */
  private def clauseEndFrom(sql: String, start: Int, depth: Int): Int = {
    var d = depth
    var i = start
    val upper = sql.toUpperCase
    val enders = Seq("ORDER", "LIMIT", "HAVING", "UNION", "WINDOW", "QUALIFY")
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '"' || c == '\'') i = endOfString(sql, i)
      else {
        if (c == '(') d += 1
        else if (c == ')') { if (d == depth) return i; d -= 1 }
        else if (d == depth && (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
          enders.exists(k => upper.startsWith(k, i) &&
            (i + k.length >= sql.length || !isWordChar(sql.charAt(i + k.length)))))
          return i
        i += 1
      }
    }
    sql.length
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  // ---- generic helpers -------------------------------------------------

  /** Rewrite every call of `fname` (case-insensitive, paren-matched,
    * top-level-comma-split args) via `f`. `f`'s output is not
    * re-scanned, so renames to names containing `fname` are safe. */
  private def rewriteCall(sql: String, fname: String)(f: Seq[String] => String): String = {
    val pat = ("(?i)\\b" + java.util.regex.Pattern.quote(fname) + "\\s*\\(").r
    val out = new StringBuilder
    var rest = sql
    var guard = 0
    while (guard < 10000) {
      guard += 1
      pat.findFirstMatchIn(rest) match {
        case None => out ++= rest; return out.toString
        case Some(m) =>
          val open = m.end - 1
          val close = matchParen(rest, open)
          out ++= rest.substring(0, m.start)
          out ++= f(splitTopLevel(rest.substring(open + 1, close)))
          rest = rest.substring(close + 1)
      }
    }
    sys.error(s"rewriteCall($fname) did not terminate")
  }

  /** Index of the ')' matching the '(' at `open` (string-aware). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') i = endOfString(s, i) - 1
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    sys.error(s"Unbalanced parens from $open in: ${s.substring(open).take(120)}")
  }

  /** Split on top-level commas (string- and paren-aware). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') { val e = endOfString(s, i); cur ++= s.substring(i, e); i = e }
      else {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        if (c == ',' && depth == 0) { out += cur.toString; cur.clear() }
        else cur += c
        i += 1
      }
    }
    out += cur.toString
    out.toSeq
  }

  /** End (exclusive) of the string literal starting at `start`. */
  private def endOfString(s: String, start: Int): Int = {
    val q = s.charAt(start)
    var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == '\\') i += 2
      else if (s.charAt(i) == q) return i + 1
      else i += 1
    }
    s.length
  }

  private def endOfLine(s: String, start: Int): Int =
    s.indexOf('\n', start) match { case -1 => s.length; case x => x }

  /** SQL keywords after which a `[` starts an array literal, never an
    * index (an identifier cannot directly follow them). */
  private val literalIntroducers = Set(
    "SELECT", "THEN", "ELSE", "WHEN", "IN", "AND", "OR", "NOT", "ON",
    "WHERE", "RETURN", "AS", "BY", "ALL", "DISTINCT", "UNION", "VALUES",
    "CASE", "END", "IF", "IFNULL", "COALESCE", "FROM", "HAVING", "LIMIT")

  /** The maximal trailing identifier-ish word of the builder, if any. */
  private def trailingWord(sb: StringBuilder): Option[String] = {
    var i = sb.length - 1
    while (i >= 0 && sb.charAt(i).isWhitespace) i -= 1
    val end = i + 1
    while (i >= 0 && { val c = sb.charAt(i); c.isLetterOrDigit || c == '_' }) i -= 1
    if (i + 1 < end) Some(sb.substring(i + 1, end)) else None
  }

  private def lastNonSpace(sb: StringBuilder): Option[Char] = {
    var i = sb.length - 1
    while (i >= 0 && sb.charAt(i).isWhitespace) i -= 1
    if (i >= 0) Some(sb.charAt(i)) else None
  }

  /** Rewrite one trailing QUALIFY in a (sub)query. Handles the corpus
    * shape `SELECT ... FROM ... QUALIFY <window-pred>` (graphics
    * dashboard W1/W2); nested QUALIFY levels aren't used there.
    * Window predicates can't live in WHERE, so the predicate is
    * projected (`AS __qualify`) and stripped with Spark's native
    * `SELECT * EXCEPT`. */
  private def rewriteQualify(sql: String): String = {
    val idx = indexOfTopLevel(sql, "QUALIFY")
    if (idx < 0) return sql
    val before = sql.substring(0, idx)
    val after = sql.substring(idx + "QUALIFY".length)
    // predicate runs to end of this clause (corpus: end of CTE body/query)
    val (pred, rest) = splitAtTopLevelEnd(after)
    val selIdx = lastIndexOfTopLevel(before, "SELECT")
    require(selIdx >= 0, "QUALIFY without SELECT")
    val sel = before.substring(selIdx)
    val fromIdx = indexOfTopLevel(sel, "FROM")
    require(fromIdx >= 0, "QUALIFY SELECT without FROM")
    val inner = sel.substring(0, fromIdx) + s", ${pred.trim} AS __qualify " +
      sel.substring(fromIdx)
    s"${before.substring(0, selIdx)}SELECT * EXCEPT(__qualify) FROM ($inner) WHERE __qualify $rest"
  }

  private val splitLiteralPattern =
    """(?i)\bSPLIT\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*(\uE000\d+\uE001)\s*\)""".r

  /** Escape a literal delimiter so it survives both Spark's SQL string
    * parser (backslash-escaped) and Java-regex interpretation in
    * `split`: each regex metacharacter becomes `\\c` in the SQL text,
    * which the SQL parser reduces to `\c`. */
  private def regexEscapeForSqlLiteral(d: String): String =
    d.flatMap {
      case c if "\\^$.|?*+()[]{}".indexOf(c) >= 0 => "\\\\" + c
      case c => c.toString
    }

  /** Index of a top-level (paren-depth-0) keyword, case-insensitive. */
  /** Keyword-boundary identifier char: letters, digits, underscore —
    * `__qualify` must NOT re-match the QUALIFY keyword (the idempotence
    * bug DialectPropertySpec caught: a second translate re-wrapped its
    * own `WHERE __qualify`). */
  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** If position `i` starts a string literal or comment, the index just
    * past it; else `i`. The top-level scanners below use this so a
    * keyword INSIDE a literal (`s != 'QUALIFY'`) or a comment can never
    * be taken for a clause boundary — the bug DialectPropertySpec's
    * fuzz caught on first run. */
  private def skipOpaque(s: String, i: Int): Int = {
    val c = s.charAt(i)
    if (c == '"' || c == '\'') endOfString(s, i)
    else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') endOfLine(s, i)
    else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
      val e = s.indexOf("*/", i + 2)
      if (e < 0) s.length else e + 2
    } else i
  }

  private def indexOfTopLevel(s: String, kw: String): Int = {
    var depth = 0
    var i = 0
    val upper = s.toUpperCase
    while (i < s.length) {
      val j = skipOpaque(s, i)
      if (j > i) { i = j }
      else {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && upper.startsWith(kw, i) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              (i + kw.length >= s.length || !isIdentChar(s.charAt(i + kw.length))))
              return i
        }
        i += 1
      }
    }
    -1
  }

  private def lastIndexOfTopLevel(s: String, kw: String): Int = {
    var found = -1
    var depth = 0
    var i = 0
    val upper = s.toUpperCase
    while (i < s.length) {
      val j = skipOpaque(s, i)
      if (j > i) { i = j }
      else {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && upper.startsWith(kw, i) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              !isIdentChar(s.charAt(math.min(i + kw.length, s.length - 1))))
              found = i
        }
        i += 1
      }
    }
    found
  }

  /** Clause keywords that terminate a QUALIFY predicate when seen at
    * top level (a trailing ORDER BY / LIMIT after QUALIFY belongs to
    * the enclosing query, not the predicate). */
  private val clauseEnders = Seq("ORDER", "LIMIT", "GROUP", "HAVING", "WINDOW", "UNION")

  /** Split at the end of the current clause: the first top-level ')',
    * ',' (CTE boundary), clause keyword, or end of string. */
  private def splitAtTopLevelEnd(s: String): (String, String) = {
    var depth = 0
    var i = 0
    val upper = s.toUpperCase
    while (i < s.length) {
      val j = skipOpaque(s, i)
      if (j > i) { i = j }
      else {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' if depth == 0 => return (s.substring(0, i), s.substring(i))
          case ')' => depth -= 1
          case ',' if depth == 0 => return (s.substring(0, i), s.substring(i))
          case _ =>
            if (depth == 0 && (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              clauseEnders.exists { kw =>
                upper.startsWith(kw, i) &&
                  (i + kw.length >= s.length || !isIdentChar(s.charAt(i + kw.length)))
              }) return (s.substring(0, i), s.substring(i))
        }
        i += 1
      }
    }
    (s, "")
  }
}
