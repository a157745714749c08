package graft.dag

/** BigQuery-dialect → Spark SQL translation for the reference's SQL
  * corpus (SURVEY §2.8 shim table; "hard part #2" in §7). Covers the
  * constructs the corpus actually uses; each rule names its Spark
  * equivalent. Token/regex-level by design: the corpus is templated SQL
  * strings, and these rewrites compose with ViewDag's `ref()` rendering.
  *
  * Handled: backtick-quoted ids, COUNTIF, SAFE_CAST, SAFE_DIVIDE,
  * JSON_VALUE, NET.HOST, FARM_FINGERPRINT, ARRAY_LENGTH,
  * GENERATE_DATE_ARRAY, DATE_TRUNC arg order (+ WEEK(SUNDAY)),
  * `x IN UNNEST(arr)`, trailing QUALIFY (single level).
  */
object Dialect {

  def translate(sql: String): String = {
    var s = sql

    // backtick identifiers → plain (Spark accepts backticks, but strip
    // for ids already resolved by ref())
    // (left as-is: Spark SQL parses backticks natively)

    // COUNTIF(p) → count_if(p)
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

    // JSON_VALUE(x, p) → get_json_object(x, p)
    s = s.replaceAll("(?i)\\bJSON_VALUE\\s*\\(", "get_json_object(")

    // NET.HOST(x) → parse_url(x, 'HOST')
    s = s.replaceAll("(?i)\\bNET\\.HOST\\s*\\(\\s*([^)]+)\\)", "parse_url($1, 'HOST')")

    // FARM_FINGERPRINT(x) → xxhash64(x)
    s = s.replaceAll("(?i)\\bFARM_FINGERPRINT\\s*\\(", "xxhash64(")

    // ARRAY_LENGTH(x) → size(x)
    s = s.replaceAll("(?i)\\bARRAY_LENGTH\\s*\\(", "size(")

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
      val delim = regexEscapeForSqlLiteral(m.group(2))
      java.util.regex.Matcher.quoteReplacement(s"split($expr, '$delim', -1)")
    })

    // SPLIT(x) single-arg → split(x, ',') (BigQuery defaults the
    // delimiter to comma; Spark requires it)
    s = s.replaceAll("(?i)\\bSPLIT\\s*\\(\\s*([^,()]+(?:\\([^()]*\\))?[^,()]*)\\s*\\)",
      "split($1, ',')")

    // x IN UNNEST(arr) / x NOT IN UNNEST(arr) → [NOT] array_contains(arr, x)
    s = s.replaceAll("(?i)([\\w`.\"']+(?:\\([^()]*\\))?)\\s+NOT\\s+IN\\s+UNNEST\\s*\\(\\s*([^)]+)\\)",
      "NOT array_contains($2, $1)")
    s = s.replaceAll("(?i)([\\w`.\"']+(?:\\([^()]*\\))?)\\s+IN\\s+UNNEST\\s*\\(\\s*([^)]+)\\)",
      "array_contains($2, $1)")

    // trailing QUALIFY <pred> → wrap: SELECT * FROM (sel, pred AS __q) WHERE __q
    s = rewriteQualify(s)

    s
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
    """(?i)\bSPLIT\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*'([^']*)'\s*\)""".r

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
  private def indexOfTopLevel(s: String, kw: String): Int = {
    var depth = 0
    var i = 0
    val upper = s.toUpperCase
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
            (i + kw.length >= s.length || !Character.isLetterOrDigit(s.charAt(i + kw.length))))
            return i
      }
      i += 1
    }
    -1
  }

  private def lastIndexOfTopLevel(s: String, kw: String): Int = {
    var found = -1
    var depth = 0
    var i = 0
    val upper = s.toUpperCase
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
            !Character.isLetterOrDigit(s.charAt(math.min(i + kw.length, s.length - 1))))
            found = i
      }
      i += 1
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
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' if depth == 0 => return (s.substring(0, i), s.substring(i))
        case ')' => depth -= 1
        case ',' if depth == 0 => return (s.substring(0, i), s.substring(i))
        case _ =>
          if (depth == 0 && (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
            clauseEnders.exists { kw =>
              upper.startsWith(kw, i) &&
                (i + kw.length >= s.length || !Character.isLetterOrDigit(s.charAt(i + kw.length)))
            }) return (s.substring(0, i), s.substring(i))
      }
      i += 1
    }
    (s, "")
  }
}
