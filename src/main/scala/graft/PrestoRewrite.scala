package graft

import java.util.Locale

/**
 * Presto-dialect SQL-text rewrites for the front door (GraftCli /
 * GraftServer). The reference hands its users a Presto prompt
 * (presto-mgr.py:205 `connect`), so the three Presto spellings that
 * Spark's GRAMMAR (not its function registry) rejects are rewritten to
 * their exact-semantics Spark forms before parsing:
 *
 *  1. quoted datetime units — `date_diff('day', a, b)` → `date_diff(day, a, b)`
 *     (Spark handles these in AstBuilder.visitTimestampdiff/-add; a
 *     registry entry can never intercept the quoted form);
 *  2. generic `TRY(expr)` — Spark has the `try_*` family but no generic
 *     wrapper. The COMMON bodies rewrite (CAST → try_cast, element_at →
 *     try_element_at, a single top-level +,-,*,/,% → try_add/…); anything
 *     else is refused loudly rather than silently changing semantics;
 *  3. zip-`UNNEST(a, b[, c]) [WITH ORDINALITY]` — Presto's multi-array
 *     UNNEST zips the arrays positionally (NULL-padding the shorter) with
 *     an optional 1-based BIGINT ordinality. Spark expresses the same
 *     thing as `LATERAL VIEW inline(zip_with(...))` — pure builtin
 *     higher-order functions, codegen end-to-end, no UDFs.
 *
 * Every rewrite is literal-aware: a pattern inside a string literal,
 * quoted identifier, or comment is never touched (the r17 ADVICE find —
 * the old regex ran over the raw text).
 */
object PrestoRewrite {

  /** Apply all dialect rewrites (the front door's one entry point).
    * Order matters only for MAP-before-ARRAY (the MAP constructor is
    * detected by its `ARRAY[` argument prefixes). Every rewrite here
    * fires ONLY on text Spark's parser rejects outright (quoted units,
    * TRY(, UNNEST(, ARRAY[, MAP(ARRAY[, bare VARCHAR), so no legal
    * Spark query can silently change meaning. */
  def apply(text: String): String =
    rewriteBareTypes(rewriteArrayLiterals(rewriteMapConstructor(
      rewriteUnnest(rewriteTry(rewriteDatetime(text))))))

  // ---------------------------------------------------------------- spans

  /** Character spans the rewrites must never fire inside: single- and
    * double-quoted string literals, backtick identifiers, `--` line
    * comments, and (nested) bracketed comments. '' escaping falls out
    * naturally: the escaped quote closes one span and opens another. */
  private[graft] def protectedSpans(text: String): IndexedSeq[(Int, Int)] = {
    val spans = Vector.newBuilder[(Int, Int)]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val start = i
        i += 1
        while (i < n && text.charAt(i) != c) i += 1
        i += 1 // past the closing quote (or end of text)
        spans += ((start, math.min(i, n)))
      } else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        val start = i
        while (i < n && text.charAt(i) != '\n') i += 1
        spans += ((start, i))
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        val start = i
        i += 2
        var depth = 1
        while (i < n && depth > 0) {
          if (text.startsWith("/*", i)) { depth += 1; i += 2 }
          else if (text.startsWith("*/", i)) { depth -= 1; i += 2 }
          else i += 1
        }
        spans += ((start, i))
      } else i += 1
    }
    spans.result()
  }

  private def outside(spans: IndexedSeq[(Int, Int)], pos: Int): Boolean =
    !spans.exists(s => pos >= s._1 && pos < s._2)

  // ------------------------------------------------------- datetime units

  /** The quoted-unit pattern only fires on a unit KEYWORD quoted directly
    * after the function name — a date string there (the 2-arg Spark
    * forms) never matches. */
  private val DatetimeUnitQuote =
    ("(?i)\\b(date_diff|datediff|date_add|dateadd|timestampdiff|timestampadd)\\s*\\(\\s*" +
      "'(year|quarter|month|week|day|dayofyear|hour|minute|second|millisecond|microsecond)'\\s*,").r

  private[graft] def rewriteDatetime(text: String): String = {
    val spans = protectedSpans(text)
    val sb = new StringBuilder
    var last = 0
    DatetimeUnitQuote.findAllMatchIn(text).foreach { m =>
      // the match itself CONTAINS a quoted literal (the unit) — what must
      // hold is that the match STARTS outside any literal/comment
      if (m.start >= last && outside(spans, m.start)) {
        sb.append(text.substring(last, m.start))
        sb.append(m.group(1)).append('(').append(m.group(2)).append(", ")
        last = m.end
      }
    }
    sb.append(text.substring(last))
    sb.toString
  }

  // ------------------------------------------------------------- TRY(...)

  private val TryOpen = "(?i)\\btry\\s*\\(".r

  /** From the index of an opening '(' (exclusive), return the index of
    * its matching ')' — quote- and comment-aware. -1 if unbalanced. */
  private[graft] def matchParen(text: String, open: Int): Int = {
    val spans = protectedSpans(text)
    var depth = 1
    var i = open + 1
    while (i < text.length) {
      if (!outside(spans, i)) {
        // jump to the end of the protected span
        i = spans.find(s => i >= s._1 && i < s._2).get._2
      } else {
        text.charAt(i) match {
          case '(' => depth += 1; i += 1
          case ')' => depth -= 1; if (depth == 0) return i; i += 1
          case _ => i += 1
        }
      }
    }
    -1
  }

  /** Top-level (depth-0, literal-aware) occurrences of binary arithmetic
    * operators in `body`, excluding unary +/- and exponent signs. */
  private def topLevelOps(body: String): Seq[(Int, Char)] = {
    val spans = protectedSpans(body)
    val ops = Seq.newBuilder[(Int, Char)]
    var depth = 0
    var i = 0
    while (i < body.length) {
      if (!outside(spans, i)) {
        i = spans.find(s => i >= s._1 && i < s._2).get._2
      } else {
        val c = body.charAt(i)
        c match {
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          case '/' | '*' | '%' if depth == 0 => ops += ((i, c))
          case '+' | '-' if depth == 0 =>
            // binary only: a preceding operand must exist (previous
            // non-space char is not an operator/comma/open paren) and
            // this must not be a float exponent sign (1e-5)
            var j = i - 1
            while (j >= 0 && Character.isWhitespace(body.charAt(j))) j -= 1
            val binary = j >= 0 && !"(,+-*/%<>=".contains(body.charAt(j))
            val exponent = j == i - 1 && j >= 1 &&
              (body.charAt(j) == 'e' || body.charAt(j) == 'E') &&
              Character.isDigit(body.charAt(j - 1))
            if (binary && !exponent) ops += ((i, c))
          case _ =>
        }
        i += 1
      }
    }
    ops.result()
  }

  /** `cast(...)`-shaped check: the body IS one call of `name`, i.e. the
    * name's '(' matches the body's final ')'. */
  private def isOneCall(body: String, name: String): Boolean = {
    val b = body.trim
    val lower = b.toLowerCase(Locale.ROOT)
    if (!lower.startsWith(name)) return false
    var i = name.length
    while (i < b.length && Character.isWhitespace(b.charAt(i))) i += 1
    i < b.length && b.charAt(i) == '(' && matchParen(b, i) == b.length - 1
  }

  private def rewriteTryBody(body: String): String = {
    val b = body.trim
    if (isOneCall(b, "cast") || isOneCall(b, "element_at")) s"try_$b"
    else topLevelOps(b) match {
      case Seq((pos, op)) =>
        val fn = op match {
          case '/' => "try_divide"
          case '*' => "try_multiply"
          case '%' => "try_mod"
          case '+' => "try_add"
          case '-' => "try_subtract"
        }
        val l = b.substring(0, pos).trim
        val r = b.substring(pos + 1).trim
        require(l.nonEmpty && r.nonEmpty,
          s"TRY: malformed arithmetic body: $b")
        s"$fn($l, $r)"
      case other =>
        throw new IllegalArgumentException(
          "TRY(...): unsupported body '" + b + "' — the dialect rewrite " +
            "serves CAST(x AS t), element_at(a, i), and a single " +
            "top-level +, -, *, /, % (found " + other.size + " operators). " +
            "Spell the Spark try_* function directly for other forms.")
    }
  }

  private[graft] def rewriteTry(text: String): String = {
    var cur = text
    var guard = 0
    var continue = true
    while (continue && guard < 64) {
      guard += 1
      val spans = protectedSpans(cur)
      // innermost-last: take the LAST match so nested TRY(TRY(...)) bodies
      // rewrite inside-out
      TryOpen.findAllMatchIn(cur).toSeq.reverse
        .find(m => outside(spans, m.start)) match {
        case Some(m) =>
          val open = m.end - 1
          val close = matchParen(cur, open)
          require(close > 0, s"TRY: unbalanced parentheses after offset ${m.start}")
          val body = cur.substring(open + 1, close)
          cur = cur.substring(0, m.start) + rewriteTryBody(body) +
            cur.substring(close + 1)
        case None => continue = false
      }
    }
    cur
  }

  // -------------------------------------- ARRAY[...] / MAP(ARRAY, ARRAY)

  /** From the index of an opening '[' (exclusive), the index of its
    * matching ']' — literal-aware, counts square brackets only. */
  private[graft] def matchBracket(text: String, open: Int): Int = {
    val spans = protectedSpans(text)
    var depth = 1
    var i = open + 1
    while (i < text.length) {
      if (!outside(spans, i)) {
        i = spans.find(s => i >= s._1 && i < s._2).get._2
      } else {
        text.charAt(i) match {
          case '[' => depth += 1; i += 1
          case ']' => depth -= 1; if (depth == 0) return i; i += 1
          case _ => i += 1
        }
      }
    }
    -1
  }

  private val ArrayOpen = "(?i)\\barray\\s*\\[".r

  /** Presto's `ARRAY[...]` literal → Spark's `array(...)`. A subscript
    * chain directly on the literal (`ARRAY[..][i]`) rewrites to
    * `element_at` so Presto's 1-BASED indexing is preserved — rewriting
    * the literal but keeping Spark's 0-based `[i]` would silently shift
    * every element. (Subscripts on COLUMNS are untouched: that text is
    * already legal Spark and not this rewrite's to reinterpret.) */
  private[graft] def rewriteArrayLiterals(text: String): String = {
    var cur = text
    var guard = 0
    var continue = true
    while (continue && guard < 256) {
      guard += 1
      val spans = protectedSpans(cur)
      ArrayOpen.findAllMatchIn(cur).find(m => outside(spans, m.start)) match {
        case Some(m) =>
          val open = m.end - 1
          val close = matchBracket(cur, open)
          require(close > 0, s"ARRAY[: unbalanced brackets after offset ${m.start}")
          var expr = "array(" + cur.substring(open + 1, close) + ")"
          var end = close
          // fold any directly-attached subscripts into 1-based element_at
          var chaining = true
          while (chaining) {
            var j = end + 1
            while (j < cur.length && Character.isWhitespace(cur.charAt(j))) j += 1
            if (j < cur.length && cur.charAt(j) == '[') {
              val idxClose = matchBracket(cur, j)
              require(idxClose > 0,
                s"ARRAY[..][: unbalanced subscript after offset $j")
              expr = s"element_at($expr, ${cur.substring(j + 1, idxClose).trim})"
              end = idxClose
            } else chaining = false
          }
          cur = cur.substring(0, m.start) + expr + cur.substring(end + 1)
        case None => continue = false
      }
    }
    cur
  }

  private val MapOpen = "(?i)\\bmap\\s*\\(".r
  private val ArrayArg = "(?is)^array\\s*\\[.*".r

  /** Presto's `MAP(ARRAY[keys], ARRAY[values])` → `map_from_arrays` —
    * Spark's `map(...)` is the interleaved k1,v1,… spelling, a DIFFERENT
    * constructor. Only fires when BOTH arguments are `ARRAY[` literal
    * forms (text Spark rejects), so a legal Spark `map(...)` is never
    * reinterpreted. */
  private[graft] def rewriteMapConstructor(text: String): String = {
    var cur = text
    var from = 0
    var guard = 0
    while (guard < 256) {
      guard += 1
      val spans = protectedSpans(cur)
      MapOpen.findAllMatchIn(cur)
        .find(m => m.start >= from && outside(spans, m.start)) match {
        case Some(m) =>
          val open = m.end - 1
          val close = matchParen(cur, open)
          val args = if (close > 0) splitTopLevel(cur.substring(open + 1, close))
                     else Seq.empty
          if (args.length == 2 && args.forall(a => ArrayArg.matches(a.trim))) {
            cur = cur.substring(0, m.start) + "map_from_arrays(" +
              cur.substring(open + 1)
            from = m.start + "map_from_arrays(".length
          } else from = m.end // legal Spark map(...): leave it, scan on
        case None => return cur
      }
    }
    cur
  }

  // ------------------------------------------------- bare type spellings

  /** Presto types Spark rejects: bare `VARCHAR` (no length) → STRING,
    * `VARBINARY` → BINARY (`VARCHAR(n)` stays — legal Spark), and the
    * `DECIMAL '1.23'` literal → Spark's `1.23BD` typed literal, whose
    * precision/scale inference from the digits matches Presto's. A
    * non-numeric DECIMAL '...' body is left for the parser to refuse. */
  private val BareVarType = "(?i)\\b(varchar|varbinary)\\b(?!\\s*\\()".r
  private val DecimalLit = "(?i)\\bdecimal\\s+'(-?[0-9]+(?:\\.[0-9]+)?)'".r

  private[graft] def rewriteBareTypes(text: String): String = {
    def pass(in: String, re: scala.util.matching.Regex,
             render: scala.util.matching.Regex.Match => String): String = {
      val spans = protectedSpans(in)
      val sb = new StringBuilder
      var last = 0
      re.findAllMatchIn(in).foreach { m =>
        if (m.start >= last && outside(spans, m.start)) {
          sb.append(in.substring(last, m.start))
          sb.append(render(m))
          last = m.end
        }
      }
      sb.append(in.substring(last))
      sb.toString
    }
    // DECIMAL-literal pass FIRST: its match starts outside any literal
    // (the quoted digits are part of the Presto form itself)
    val afterDecimal = pass(text, DecimalLit, m => s"${m.group(1)}BD")
    pass(afterDecimal, BareVarType,
      m => if (m.group(1).equalsIgnoreCase("varchar")) "STRING" else "BINARY")
  }

  // ---------------------------------------------------- UNNEST(a, b, ...)

  private val UnnestOpen = "(?i)\\bcross\\s+join\\s+unnest\\s*\\(".r
  private val AfterUnnest =
    "(?is)^(\\s*with\\s+ordinality)?\\s*(?:as\\s+)?([A-Za-z_][A-Za-z0-9_]*)\\s*\\(([^)]*)\\)".r
  private val BareUnnest = "(?i)\\bunnest\\s*\\(".r

  /** Split `args` on top-level commas (literal- and paren-aware). */
  private[graft] def splitTopLevel(args: String): Seq[String] = {
    val spans = protectedSpans(args)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < args.length) {
      if (!outside(spans, i)) {
        val end = spans.find(s => i >= s._1 && i < s._2).get._2
        cur.append(args.substring(i, end))
        i = end
      } else {
        val c = args.charAt(i)
        c match {
          case '(' | '[' => depth += 1; cur += c
          case ')' | ']' => depth -= 1; cur += c
          case ',' if depth == 0 => out += cur.toString; cur.clear()
          case _ => cur += c
        }
        i += 1
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Presto zips N arrays positionally, NULL-padding the shorter —
    * exactly `zip_with`'s contract. Ordinality is 1-based BIGINT. The
    * generated text is pure builtin higher-order functions feeding
    * `inline`, so the expansion stays inside whole-stage codegen and the
    * arrays never leave their scan task. */
  private def unnestLateralView(exprs: Seq[String], cols: Seq[String],
                                ordinality: Boolean, alias: String): String = {
    def named(pairs: Seq[(String, String)]): String =
      pairs.map { case (c, e) => s"'$c', $e" }.mkString("named_struct(", ", ", ")")
    val ordCol = if (ordinality) Some(cols.last) else None
    val valCols = if (ordinality) cols.dropRight(1) else cols
    require(valCols.length == exprs.length, s"UNNEST: ${exprs.length} array " +
      s"argument(s) but ${valCols.length} value column name(s) " +
      (if (ordinality) "(last name is the WITH ORDINALITY column) " else "") +
      s"in AS $alias(${cols.mkString(", ")})")
    // one struct array carrying the zipped values, with STABLE inner
    // field names (z1..zN) so the ordinality wrapper can re-project
    val zipped = exprs match {
      case Seq(e1) =>
        s"transform($e1, v -> named_struct('z1', v))"
      case Seq(e1, e2) =>
        s"zip_with($e1, $e2, (l, r) -> named_struct('z1', l, 'z2', r))"
      case Seq(e1, e2, e3) =>
        s"zip_with(zip_with($e1, $e2, (l, r) -> named_struct('z1', l, 'z2', r)), " +
          s"$e3, (s, v) -> named_struct('z1', s.z1, 'z2', s.z2, 'z3', v))"
      case more => throw new IllegalArgumentException(
        s"UNNEST: up to 3 zipped arrays are served, got ${more.length}")
    }
    val projected = ordCol match {
      case Some(o) =>
        val fields = valCols.zipWithIndex.map { case (c, i) => (c, s"s.z${i + 1}") } :+
          ((o, "CAST(i + 1 AS BIGINT)"))
        s"transform($zipped, (s, i) -> ${named(fields)})"
      case None if exprs.length == 1 =>
        // single array, no ordinality: explode directly (no struct hop)
        return s"LATERAL VIEW explode(${exprs.head}) $alias AS ${valCols.head}"
      case None =>
        val fields = valCols.zipWithIndex.map { case (c, i) => (c, s"s.z${i + 1}") }
        s"transform($zipped, s -> ${named(fields)})"
    }
    s"LATERAL VIEW inline($projected) $alias"
  }

  private[graft] def rewriteUnnest(text: String): String = {
    var cur = text
    var guard = 0
    var continue = true
    while (continue && guard < 64) {
      guard += 1
      val spans = protectedSpans(cur)
      UnnestOpen.findAllMatchIn(cur).toSeq
        .find(m => outside(spans, m.start)) match {
        case Some(m) =>
          val open = m.end - 1
          val close = matchParen(cur, open)
          require(close > 0, s"UNNEST: unbalanced parentheses after offset ${m.start}")
          val exprs = splitTopLevel(cur.substring(open + 1, close))
          val rest = cur.substring(close + 1)
          AfterUnnest.findFirstMatchIn(rest) match {
            case Some(a) =>
              val ordinality = a.group(1) != null
              val alias = a.group(2)
              val cols = a.group(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
              val lateral = unnestLateralView(exprs, cols, ordinality, alias)
              cur = cur.substring(0, m.start) + lateral + rest.substring(a.end)
            case None => throw new IllegalArgumentException(
              "UNNEST: the dialect rewrite needs the aliased form " +
                "CROSS JOIN UNNEST(a[, b[, c]]) [WITH ORDINALITY] AS t(col, ...) — " +
                "missing AS t(col, ...) after: " + cur.substring(m.start,
                  math.min(cur.length, close + 1)))
          }
        case None => continue = false
      }
    }
    // any UNNEST left over is a form this rewrite doesn't serve (comma
    // join, map unnest): refuse with guidance instead of a Spark parse
    // error that never mentions UNNEST
    val spans = protectedSpans(cur)
    BareUnnest.findAllMatchIn(cur).find(m => outside(spans, m.start)).foreach { m =>
      throw new IllegalArgumentException(
        "UNNEST: unsupported form at offset " + m.start + " — the dialect " +
          "rewrite serves CROSS JOIN UNNEST(a[, b[, c]]) [WITH ORDINALITY] " +
          "AS t(col, ...) over arrays. For maps use explode() directly.")
    }
    cur
  }
}
