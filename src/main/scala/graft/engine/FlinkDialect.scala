package graft.engine

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Flink SQL → Spark SQL dialect layer: statement splitting and text-level
  * rewriting of the constructs Spark's parser rejects or interprets
  * differently (SURVEY.md §7.4).
  *
  * This is deliberately a TEXT-level shim, not a forked parser: everything
  * after the rewrite is Catalyst's own parsing/analysis/optimization, so the
  * whole surface keeps predicate pushdown, codegen, AQE etc. for free.
  *
  * Handled here (reference locations in test/syntax-test.fsql):
  *  - statement split on ';' respecting strings, quoted idents, comments and
  *    BEGIN STATEMENT SET ... END blocks (the reference's own splitter at
  *    notebookController.ts:88 naively splits inside strings — fixed here);
  *  - window TVFs TUMBLE/HOP/CUMULATE/SESSION (F:196-239) → window()/
  *    session_window() grouping;
  *  - 1-based array subscripts arr[i] → try_element_at(arr, i) (F:453);
  *  - PROCTIME() → current_timestamp() (F:19);
  *  - ELEMENT(x) → guarded single-element extraction (generic over type);
  *  - SIMILAR TO → anchored regexp_like translation (G:279);
  *  - Flink join-strategy hints → Spark hint names (G:54);
  *  - streaming-runtime hints (STATE_TTL, MINI_BATCH, LOOKUP...) → stripped;
  *  - TIMESTAMP_LTZ type name → TIMESTAMP (instant semantics).
  */
object FlinkDialect {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)


  // ---------------------------------------------------------------- split --

  /** Split a script into statements on ';', ignoring separators inside
    * '...'/"..."/`...` literals, -- line comments, block comments, and
    * keeping BEGIN STATEMENT SET ... END; together as one statement. */
  def split(script: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    val n = script.length
    var inSet = false
    def flush(): Unit = {
      val s = cur.toString.trim
      if (s.nonEmpty) out += s
      cur.clear()
    }
    while (i < n) {
      val c = script.charAt(i)
      def startsWithWord(w: String): Boolean =
        script.regionMatches(true, i, w, 0, w.length) &&
          (i + w.length >= n || !Character.isLetterOrDigit(script.charAt(i + w.length))) &&
          (i == 0 || !Character.isLetterOrDigit(script.charAt(i - 1)))
      c match {
        case '\'' | '"' | '`' =>
          val q = c
          cur += c; i += 1
          while (i < n && script.charAt(i) != q) {
            // '' escape inside single quotes
            cur += script.charAt(i); i += 1
          }
          if (i < n) { cur += q; i += 1 }
          // doubled quote: keep consuming
          if (i < n && script.charAt(i) == q && q == '\'') { /* handled next loop */ }
        case '-' if i + 1 < n && script.charAt(i + 1) == '-' =>
          while (i < n && script.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && script.charAt(i + 1) == '*' =>
          val hint = i + 2 < n && script.charAt(i + 2) == '+'
          val start = i
          i += 2
          while (i + 1 < n && !(script.charAt(i) == '*' && script.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, n)
          if (hint) cur ++= script.substring(start, i) // keep optimizer hints
        case ';' =>
          if (inSet) cur += c else flush()
          i += 1
        case _ =>
          if (startsWithWord("BEGIN") &&
              script.substring(i).toUpperCase.replaceAll("\\s+", " ").startsWith("BEGIN STATEMENT SET"))
            inSet = true
          else if (inSet && startsWithWord("END")) {
            // only a STANDALONE END terminates the set: nothing but whitespace
            // since the last ';' (a CASE ... END inside an insert is
            // mid-statement and must not close the block)
            val sinceSemi = cur.toString.substring(cur.toString.lastIndexOf(';') + 1)
            if (sinceSemi.trim.isEmpty) inSet = false
          }
          cur += c; i += 1
      }
    }
    flush()
    out.toSeq
  }

  // -------------------------------------------------------------- rewrite --

  private val TumbleTvf: Regex =
    """(?is)TABLE\s*\(\s*TUMBLE\s*\(\s*(?:TABLE|DATA\s*=>\s*TABLE)\s+([\w.`]+)\s*,\s*DESCRIPTOR\s*\(\s*([\w.`]+)\s*\)\s*,\s*INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""".r
  private val HopTvf: Regex =
    """(?is)TABLE\s*\(\s*HOP\s*\(\s*(?:TABLE|DATA\s*=>\s*TABLE)\s+([\w.`]+)\s*,\s*DESCRIPTOR\s*\(\s*([\w.`]+)\s*\)\s*,\s*INTERVAL\s+'([^']+)'\s+(\w+)\s*,\s*INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""".r
  private val CumulateTvf: Regex =
    """(?is)TABLE\s*\(\s*CUMULATE\s*\(\s*(?:TABLE|DATA\s*=>\s*TABLE)\s+([\w.`]+)\s*,\s*DESCRIPTOR\s*\(\s*([\w.`]+)\s*\)\s*,\s*INTERVAL\s+'([^']+)'\s+(\w+)\s*,\s*INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""".r
  private val SessionTvf: Regex =
    """(?is)TABLE\s*\(\s*SESSION\s*\(\s*(?:TABLE|DATA\s*=>\s*TABLE)\s+([\w.`]+)(?:\s+PARTITION\s+BY\s+[\w.`,\s]+?)?\s*,\s*DESCRIPTOR\s*\(\s*([\w.`]+)\s*\)\s*,\s*INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""".r

  /** 'MINUTE'/'MINUTES' → "minutes" etc. (Spark duration strings). */
  def unitName(unit: String): String = unit.toUpperCase.stripSuffix("S") match {
    case "MINUTE" => "minutes"
    case "HOUR"   => "hours"
    case "SECOND" => "seconds"
    case "DAY"    => "days"
    case other    => other.toLowerCase + "s"
  }

  private def dur(v: String, unit: String): String = s"$v ${unitName(unit)}"

  private def durSeconds(v: String, unit: String): Long = {
    val mult = unit.toUpperCase.stripSuffix("S") match {
      case "SECOND" => 1L
      case "MINUTE" => 60L
      case "HOUR"   => 3600L
      case "DAY"    => 86400L
      case other => throw new IllegalArgumentException(
        s"Unsupported CUMULATE interval unit '$other' (use SECOND/MINUTE/HOUR/DAY)")
    }
    v.trim.toLong * mult
  }

  /** Rewrite one Flink statement into Spark SQL text. */
  def rewrite(stmt0: String): String = {
    var s = stmt0

    // ---- mask string literals and backticked identifiers FIRST: no rule
    // below may ever touch the INSIDE of a quoted constant or identifier
    // ('code 0xFF', a literal that happens to spell a TVF call, `group by`).
    // EXEMPTION: literals whose content is purely numeric/duration-shaped
    // ([0-9:. -]) stay visible — the window-TVF rules parse INTERVAL 'n'
    // out of them, and no rewrite rule can match inside that alphabet.
    // (r11: the DialectFuzzSpec corpus caught the pre-mask SIMILAR TO and
    // TVF rules rewriting inside adversarial literals.)
    // Placeholder tag made unforgeable per call: if the raw text already
    // contains a would-be placeholder (e.g. the string `__GRAFT_LIT_5__`
    // typed literally outside any quote), extend the tag until no
    // collision exists. Without this, a forged out-of-range index threw
    // IndexOutOfBoundsException at restore (an internal error, breaking
    // the total/named-rejections contract) and a colliding in-range one
    // silently substituted an unrelated literal.
    // CASE-INSENSITIVE collision scan: the SIMILAR TO rule matches its
    // placeholder under a pattern-wide (?i), so a lowercase forged
    // `__graft_lit_0__` would reach literals(i) if only the exact case
    // escalated the tag
    var tag = "GRAFT"
    val sLower = s.toLowerCase
    while (sLower.contains(("__" + tag + "_LIT_").toLowerCase) ||
        sLower.contains(("__" + tag + "_BT_").toLowerCase) ||
        sLower.contains(("__" + tag + "_TS_LTZ__").toLowerCase))
      tag += "X"
    val litTag = "__" + tag + "_LIT_"
    val btTag = "__" + tag + "_BT_"
    val literals = ArrayBuffer.empty[String]
    val simpleLit = """^'[0-9:. \-]*'$""".r
    // iterative scanner, NOT a regex: '(?:[^']|'')*' recursed once per
    // character and its unrolled form once per '' escape — either way a
    // document-sized literal (a corpus INSERT) overflowed the stack
    // (found by the r13 NamespaceFuzz soak / LongStatementSpec)
    s = foldLiterals(s)(lit =>
      if (simpleLit.findFirstIn(lit).isDefined) lit
      else {
        literals += lit
        s"$litTag${literals.size - 1}__"
      })
    val bticks = ArrayBuffer.empty[String]
    s = """`[^`]+`""".r.replaceAllIn(s, m => {
      bticks += m.matched
      s"$btTag${bticks.size - 1}__"
    })
    // resolve a captured identifier token for re-emission inside backticks:
    // a masked `quoted ident` placeholder must contribute its NAME, not a
    // nested-backtick mess
    def idText(tok: String): String =
      (Regex.quote(btTag) + "(\\d+)__").r.findFirstMatchIn(tok)
        .map(m => bticks(m.group(1).toInt).stripPrefix("`").stripSuffix("`"))
        .getOrElse(tok)

    // window TVFs → inline subqueries projecting window_start/window_end,
    // plus (conditionally, see below) the window struct itself as __w:
    // grouping must include the TimeWindow attribute — not just the
    // extracted start/end — for Spark to recognize a streaming window
    // aggregation and allow append mode. Batch semantics are unchanged
    // (start/end functionally determine __w).
    var tumbleHops = 0
    s = TumbleTvf.replaceAllIn(s, m => Regex.quoteReplacement {
      val (t, ts0, v, u) = (m.group(1), m.group(2), m.group(3), m.group(4))
      val ts = idText(ts0)
      tumbleHops += 1
      s"(SELECT *, window(`$ts`, '${dur(v, u)}') AS __w, " +
        s"window(`$ts`, '${dur(v, u)}').start AS window_start, " +
        s"window(`$ts`, '${dur(v, u)}').end AS window_end FROM $t)"
    })
    s = HopTvf.replaceAllIn(s, m => Regex.quoteReplacement {
      val (t, ts0, sv, su, zv, zu) =
        (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
      val ts = idText(ts0)
      // HOP(table, descriptor, slide, size)
      tumbleHops += 1
      s"(SELECT *, window(`$ts`, '${dur(zv, zu)}', '${dur(sv, su)}') AS __w, " +
        s"window(`$ts`, '${dur(zv, zu)}', '${dur(sv, su)}').start AS window_start, " +
        s"window(`$ts`, '${dur(zv, zu)}', '${dur(sv, su)}').end AS window_end FROM $t)"
    })
    if (tumbleHops > 0) {
      // inject __w into the GROUP BY only in the unambiguous case: exactly
      // one TUMBLE/HOP, no other TVF family in the statement, and exactly
      // one GROUP BY listing both window_start and window_end (any order,
      // keys allowed). Otherwise strip the __w projection entirely — a
      // SELECT-*-passthrough TVF must not grow an extra column, and a
      // statement mixing TVF families must not have a foreign __w pushed
      // into the wrong aggregation.
      // lookahead bounded at clause keywords (ORDER/HAVING/LIMIT/WINDOW) so
      // window_start appearing only AFTER the GROUP BY clause (e.g. in
      // ORDER BY) cannot trigger __w injection into a grouping that does
      // not actually list the window columns
      // the {0,4000} bound exists only to keep the lookahead's backtracking
      // depth finite on pathological statements — 4000 chars is far beyond
      // any realistic GROUP BY key list (the depth stays bounded regardless)
      val gbRe = ("""(?i)(GROUP\s+BY\s+)""" +
        """(?=(?:(?!\b(?:ORDER|HAVING|LIMIT|WINDOW)\b)[^()]){0,4000}\bwindow_start\b)""" +
        """(?=(?:(?!\b(?:ORDER|HAVING|LIMIT|WINDOW)\b)[^()]){0,4000}\bwindow_end\b)""").r
      val otherTvf = CumulateTvf.findFirstIn(s).isDefined ||
        SessionTvf.findFirstIn(s).isDefined
      val gbMatches = gbRe.findAllIn(s).size
      if (tumbleHops == 1 && !otherTvf && gbMatches == 1)
        s = gbRe.replaceAllIn(s, "$1`__w`, ")
      else {
        // diagnose the silent case: a single-TVF statement that mentions the
        // window columns after GROUP BY but whose key list ran past the
        // lookahead bound would skip __w injection and change window-agg
        // behavior (streaming state eviction) with no signal — warn loudly
        if (tumbleHops == 1 && !otherTvf &&
            """(?is)GROUP\s+BY\b.*\bwindow_start\b""".r.findFirstIn(s).isDefined)
          log.warn("window TVF: GROUP BY mentions window_start but the " +
            "bounded window-key scan did not match — __w was NOT injected; " +
            "if this GROUP BY key list genuinely exceeds 4000 characters, " +
            "shorten it or group by window_start/window_end explicitly")
        s = s.replaceAll("""(?i)window\([^)]*\)\s+AS\s+__w,\s*""", "")
      }
    }
    // CUMULATE projects the aligned size-window STRUCT as __w too: grouping
    // by (__w, window_start, window_end, keys) has identical batch
    // granularity (__w ↔ window_start), and on a STREAMING table the struct
    // carries the watermark tag, so the aggregation is recognized as an
    // event-time window agg — state for a size-window (all its cumulative
    // steps) is evicted once the watermark passes its end, instead of
    // growing forever on the derived columns (the bounded-state shape
    // pinned by Windows.cumulateStreamingAgg's spec).
    var cumulates = 0
    s = CumulateTvf.replaceAllIn(s, m => Regex.quoteReplacement {
      val (t, ts0, sv, su, zv, zu) =
        (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
      val ts = idText(ts0)
      val step = durSeconds(sv, su); val size = durSeconds(zv, zu)
      cumulates += 1
      s"""(SELECT *, window_start + make_dt_interval(0, 0, 0, __end_sec) AS window_end FROM (
         |  SELECT *, window(`$ts`, '$size seconds') AS __w,
         |    window(`$ts`, '$size seconds').start AS window_start,
         |    explode(sequence(
         |      ((unix_micros(cast(`$ts` as timestamp_ltz)) - unix_micros(cast(window(`$ts`, '$size seconds').start as timestamp_ltz))) div 1000000 div $step + 1) * $step,
         |      ${size}L, ${step}L)) AS __end_sec
         |  FROM $t))""".stripMargin
    })
    if (cumulates > 0) {
      // same unambiguity rules as TUMBLE/HOP above: one CUMULATE, no other
      // TVF family, exactly one GROUP BY naming both window_start/end
      val gbRe = ("""(?i)(GROUP\s+BY\s+)""" +
        """(?=(?:(?!\b(?:ORDER|HAVING|LIMIT|WINDOW)\b)[^()]){0,600}\bwindow_start\b)""" +
        """(?=(?:(?!\b(?:ORDER|HAVING|LIMIT|WINDOW)\b)[^()]){0,600}\bwindow_end\b)""").r
      val otherTvf = tumbleHops > 0 || SessionTvf.findFirstIn(s).isDefined
      if (cumulates == 1 && !otherTvf && gbRe.findAllIn(s).size == 1)
        s = gbRe.replaceAllIn(s, "$1`__w`, ")
      else
        s = s.replaceAll("""(?i)window\([^)]*\)\s+AS\s+__w,\s*""", "")
    }
    // SESSION TVF: needs the GROUP BY rewritten onto session_window(); handle
    // the canonical "GROUP BY window_start, window_end[, ...]" shape.
    // SESSION TVF canonical shape:
    //   SELECT window_start, window_end, ... GROUP BY window_start, window_end[, keys]
    // → group on session_window(ts, gap); select its .start/.end fields
    // (Spark names the grouping struct `session_window`); later references
    // (ORDER BY window_start) then resolve against the SELECT aliases.
    SessionTvf.findFirstMatchIn(s).foreach { m =>
      val (t, ts0, v, u) = (m.group(1), m.group(2), m.group(3), m.group(4))
      val ts = idText(ts0)
      val gap = dur(v, u)
      s = SessionTvf.replaceAllIn(s, Regex.quoteReplacement(t))
      s = s.replaceAll("(?i)GROUP\\s+BY\\s+window_start\\s*,\\s*window_end",
        Regex.quoteReplacement(s"GROUP BY session_window(`$ts`, '$gap')"))
      // FIRST remaining occurrence only — that is the SELECT list (GROUP BY's
      // pair was consumed above). Later references (ORDER BY/HAVING
      // window_start) resolve against these SELECT aliases; rewriting them
      // too would inject `AS` where aliases are illegal.
      s = """(?i)\bwindow_start\s*,\s*window_end\b""".r.replaceFirstIn(s,
        "session_window.start AS window_start, session_window.end AS window_end")
    }

    // [NOT] SIMILAR TO pattern → anchored regexp_like ('%'→'.*', '_'→'.').
    // The pattern literal arrives either unmasked (simple numeric-ish
    // content) or as a masked placeholder; either way the translated regex
    // is emitted as a NEW masked literal so no later rule can touch it.
    // Regex metacharacters that are LITERALS in SQL SIMILAR TO (. ^ $ \)
    // are escaped first — 'a.b' must match only "a.b", not "aXb"; the
    // escapes run before %/_ translation so the introduced '.'/'.*' survive.
    // The LEFT OPERAND is extracted by an iterative backward scan, not a
    // regex: the former operand pattern ((?:[\w.`']|\(...\))+) recursed once
    // per character in java.util.regex, so a long statement (~20 KB of
    // VALUES tuples) overflowed the stack while merely SCANNING for a
    // SIMILAR TO that was not there (found by the r13 NamespaceFuzz soak).
    locally {
      val simRe = ("""(?i)\s+(NOT\s+)?SIMILAR\s+TO\s+(?:'([^']*)'|""" +
        Regex.quote(litTag) + """(\d+)__)""").r
      val ms = simRe.findAllMatchIn(s).toList
      if (ms.nonEmpty) {
        val out = new StringBuilder
        var last = 0
        ms.foreach { m =>
          val opEnd = m.start
          val opStart = similarOperandStart(s, opEnd)
          if (opStart >= opEnd || opStart < last)
            // no parsable operand (or one overlapping a prior rewrite):
            // leave the text alone for Spark's own parse error
            out.append(s.substring(last, m.end))
          else {
            val pat =
              if (m.group(2) != null) m.group(2)
              else literals(m.group(3).toInt)
                .stripPrefix("'").stripSuffix("'").replace("''", "'")
            // DOUBLE backslash in the emitted SQL text: Spark's string-
            // literal unescaping consumes one layer ('\.' parses to '.'),
            // the regex engine needs the other
            val rx = pat.replace("\\", "\\\\\\\\").replace(".", "\\\\.")
              .replace("^", "\\\\^").replace("$", "\\\\$")
              .replace("%", ".*").replace("_", ".")
            literals += "'^" + rx.replace("'", "''") + "$'"
            val neg = if (m.group(1) != null) "NOT " else ""
            out.append(s.substring(last, opStart))
            out.append(neg).append("regexp_like(")
              .append(s.substring(opStart, opEnd))
              .append(s", $litTag${literals.size - 1}__)")
          }
          last = m.end
        }
        out.append(s.substring(last))
        s = out.toString
      }
    }

    // PROCTIME() → current_timestamp()
    s = s.replaceAll("(?i)\\bPROCTIME\\s*\\(\\s*\\)", "current_timestamp()")

    // SOURCE_WATERMARK() (G:467) is only meaningful in a WATERMARK DDL clause
    // (TableEnv maps it to a zero-delay watermark there); as a query function
    // it has no Spark counterpart — fail fast with a named reason (the
    // protobuf pattern) rather than leak an "undefined function" error
    if ("""(?i)\bSOURCE_WATERMARK\s*\(""".r.findFirstIn(s).isDefined)
      throw new IllegalArgumentException(
        "SOURCE_WATERMARK() is connector-defined and only supported inside a " +
          "WATERMARK FOR ... AS SOURCE_WATERMARK() DDL clause (mapped to a " +
          "zero-delay watermark); it cannot be evaluated in a query")

    // quantified subquery comparisons x op ANY/SOME/ALL (SELECT ...) (G:279)
    s = rewriteQuantified(s)

    // the UNKNOWN boolean literal (F:566) is a NULL boolean — but leave the
    // IS [NOT] UNKNOWN predicate forms alone (native in Spark)
    s = """(?i)\b(IS\s+(?:NOT\s+)?)?UNKNOWN\b""".r.replaceAllIn(s, m =>
      if (m.group(1) != null) Regex.quoteReplacement(m.matched)
      else "CAST(NULL AS BOOLEAN)")

    // COLLECT(x) → MULTISET as element→count map (SURVEY §1.2 convention;
    // F:269). Direct one-pass aggregate whose BUFFER is the count map —
    // O(distinct values per group) memory. The pre-r16 rewrite through
    // `multiset_from_array(collect_list(x))` buffered every group element
    // first, which is O(group size) memory and OOM'd a 50M-element group
    // at the sf100 sweep (COLLECT exists precisely for low-cardinality
    // columns over huge groups — it must not cost group-size memory).
    s = """(?i)(?<![\w_])COLLECT\s*\(([^()]+)\)""".r.replaceAllIn(s, m =>
      Regex.quoteReplacement(s"multiset_agg(${m.group(1).trim})"))

    // JSON aggregates/constructors (G:431). Aggregation order is
    // nondeterministic in any parallel engine, so the rewrites sort elements
    // (by value / by key) — a deterministic refinement of Flink's semantics.
    val arg = """(?:[^()]|\([^()]*\))""" // argument text with one paren level
    s = ("""(?i)\bJSON_ARRAYAGG\s*\((""" + arg + """+)\)""").r.replaceAllIn(s, m =>
      Regex.quoteReplacement(s"to_json(array_sort(collect_list(${m.group(1).trim})))"))
    s = ("""(?i)\bJSON_OBJECTAGG\s*\(\s*KEY\s+(""" + arg + """+?)\s+VALUE\s+(""" + arg + """+?)\s*\)""").r
      .replaceAllIn(s, m =>
        Regex.quoteReplacement("to_json(map_from_entries(array_sort(collect_list(" +
          s"struct(${m.group(1).trim}, ${m.group(2).trim})))))"))
    s = ("""(?i)\bJSON_OBJECT\s*\((""" + arg + """*KEY""" + arg + """*)\)""").r.replaceAllIn(s, m => {
      val pairs = m.group(1).split("(?i),\\s*(?=KEY\\b)").map { p =>
        val mm = """(?is)KEY\s+(.+?)\s+VALUE\s+(.+)""".r.findFirstMatchIn(p.trim)
          .getOrElse(throw new IllegalArgumentException(s"Bad JSON_OBJECT entry: $p"))
        s"${mm.group(1).trim}, ${mm.group(2).trim}"
      }
      Regex.quoteReplacement(s"to_json(named_struct(${pairs.mkString(", ")}))")
    })
    s = """(?i)\bJSON_ARRAY\s*\(([^()]*)\)""".r.replaceAllIn(s, m =>
      Regex.quoteReplacement(s"to_json(array(${m.group(1).trim}))"))

    // CROSS JOIN UNNEST(arr) AS t(c) (F:164-167) → LATERAL VIEW explode;
    // UNNEST in FROM position otherwise → explode via lateral view too
    s = """(?is)CROSS\s+JOIN\s+UNNEST\s*\(([^()]+)\)\s+AS\s+(\w+)\s*\((\w+)\)""".r
      .replaceAllIn(s, m => Regex.quoteReplacement(
        s"LATERAL VIEW explode(${m.group(1)}) ${m.group(2)} AS ${m.group(3)}"))

    // ELEMENT(x) → guarded single-element access (Flink: exactly-one or error)
    s = s.replaceAll("(?i)\\bELEMENT\\s*\\(([^()]+)\\)",
      "(CASE WHEN size($1) = 1 THEN element_at($1, 1) " +
        "WHEN $1 IS NULL THEN NULL " +
        "ELSE raise_error('ELEMENT() argument must have exactly one element') END)")

    // ARRAY[...] / MAP[...] constructors (G:447) → array(...) / map(...)
    // (innermost-first so nesting unwinds)
    var ctorChanged = true
    while (ctorChanged) {
      val s2 = s
        .replaceAll("(?i)\\bARRAY\\s*\\[([^\\[\\]]*)\\]", "array($1)")
        .replaceAll("(?i)\\bMAP\\s*\\[([^\\[\\]]*)\\]", "map($1)")
      ctorChanged = s2 != s
      s = s2
    }

    // ROW(a, b) constructor (G:459) → struct(a, b): field names follow the
    // argument columns, so FLATTEN / dotted access see Flink-shaped names.
    // \b after ROW can't be relied on alone (ROW_NUMBER has no boundary
    // before _, so it's safe; ROWS/ROW in frames/MATCH clauses carry no
    // opening paren, which the lookahead requires)
    s = """(?i)(?<![\w_])ROW\s*\(""".r.replaceAllIn(s, "struct(")
    // FLATTEN(r) (G:459) expands a composite column to its fields — Spark's
    // qualified star does exactly this in a select list
    s = """(?i)(?<![\w_])FLATTEN\s*\(\s*([\w.`]+)\s*\)""".r.replaceAllIn(s, m =>
      Regex.quoteReplacement(s"${m.group(1)}.*"))

    // 1-based subscripts x[e] → try_element_at(x, e) — any index expression
    // (F:453): try_element_at is 1-based for arrays and, unlike element_at
    // under Spark 4's default ANSI mode (which THROWS), returns NULL for an
    // out-of-range index or missing map key — Flink's documented value — and
    // identical for map keys; handles chains a[1][2] and call bases f(x)[i]
    s = rewriteSubscripts(s)

    // Flink hex literals 0xFF (F:573) — Spark's parser reads 0xFF as an
    // identifier, so rewrite to the decimal value
    s = """\b0[xX]([0-9a-fA-F]+)\b""".r.replaceAllIn(s,
      m => java.lang.Long.parseLong(m.group(1), 16).toString)

    // TIMESTAMP_LTZ → Spark TIMESTAMP (instant semantics) via a placeholder
    // so the bare-TIMESTAMP rule below cannot re-map it; Flink's TIMESTAMP —
    // bare or with precision — is WALL-CLOCK (bare ≡ TIMESTAMP(6)), so both
    // forms map to TIMESTAMP_NTZ. Mapping only the precisioned form (the
    // pre-r8 behavior) silently gave the same Flink type two different Spark
    // types, drifting by the session offset in any non-UTC deployment.
    s = s.replaceAll("(?i)\\bTIMESTAMP_LTZ\\b(\\s*\\(\\d\\))?", "__" + tag + "_TS_LTZ__")
    s = s.replaceAll("(?i)\\bTIMESTAMP\\b(\\s*\\(\\d\\))?", "TIMESTAMP_NTZ")
    // Spark's own TIMESTAMP_LTZ keyword (instant semantics), NOT bare
    // TIMESTAMP: emitting TIMESTAMP made a second rewrite pass remap it to
    // TIMESTAMP_NTZ — an instant silently became wall-clock whenever
    // already-rewritten SQL re-entered the dialect (DialectFuzzSpec F5)
    s = s.replace("__" + tag + "_TS_LTZ__", "TIMESTAMP_LTZ")

    // SQL-standard type synonyms FIRST, so the bare-CHAR rule below cannot
    // corrupt CHAR VARYING(n) into STRING VARYING(n) (r13 advisor find).
    // CHARACTER_LENGTH et al are single \w+ tokens (underscore is a word
    // char), so \b cannot split them.
    s = s.replaceAll("(?i)\\bCHAR(?:ACTER)?\\s+VARYING\\b", "VARCHAR")
    s = s.replaceAll("(?i)\\bCHARACTER\\b", "CHAR")

    // Explicit-length character/binary CASTs → Flink trim/pad shims (r13
    // advisor find): Spark parses CHAR(n)/VARCHAR(n) in CAST but ERASES the
    // length, while Flink (since 1.15, FLINK-24413) trims to n — see
    // rewriteCastLengths for the exact semantics.
    s = rewriteCastLengths(s)

    // Length-optional character/binary types in EXPRESSIONS (r12, found by
    // the SqlFuzz cross-engine sweep): Flink accepts bare VARCHAR/CHAR in
    // CAST, Spark demands a length (DATATYPE_MISSING_SIZE). Map the bare
    // forms to STRING — the same posture TableEnv.mapType takes for DDL —
    // and VARBINARY/BYTES to BINARY (Spark has no VARBINARY type). This is
    // a DOCUMENTED DIVERGENCE (SURVEY §2.10): Flink defaults the missing
    // length to 1 and would trim, a footgun virtually no real query
    // intends; a caller wanting the trim writes the length explicitly and
    // rewriteCastLengths above gives exact Flink behavior. The lookahead
    // keeps precisioned VARCHAR(n)/CHAR(n) (ROW fields, DDL passthrough —
    // cast positions were already shimmed above); CHAR_LENGTH et al are
    // single \w+ tokens, so \b can't split them.
    s = s.replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")
    s = s.replaceAll("(?i)\\bCHAR\\b(?!\\s*\\()", "STRING")
    // VARBINARY(n) outside a cast position (ROW fields, DDL passthrough)
    // still collapses to BINARY — Spark has no VARBINARY type to carry the
    // precision; cast positions were already shimmed above.
    s = s.replaceAll("(?i)\\bVARBINARY\\b(\\s*\\(\\s*\\d+\\s*\\))?", "BINARY")
    s = s.replaceAll("(?i)\\bBYTES\\b", "BINARY")

    // EXPLAIN variants (F:535-539): Flink modifiers → Spark EXPLAIN forms
    s = s.replaceAll("(?i)\\bEXPLAIN\\s+PLAN\\s+FOR\\b", "EXPLAIN")
    s = s.replaceAll("(?i)\\bEXPLAIN\\s+ESTIMATED_COST\\b", "EXPLAIN COST")
    s = s.replaceAll("(?i)\\bEXPLAIN\\s+CHANGELOG_MODE\\b", "EXPLAIN")
    s = s.replaceAll("(?i)\\bEXPLAIN\\s+JSON_EXECUTION_PLAN\\b", "EXPLAIN FORMATTED")

    // temporal join `FOR SYSTEM_TIME AS OF x` (F:159-162): batch semantics =
    // join against the dimension snapshot, so the clause drops; true
    // versioned-as-of is the AsOfJoin operator (operators/AsOfJoin.scala)
    s = s.replaceAll("(?i)\\bFOR\\s+SYSTEM_TIME\\s+AS\\s+OF\\s+[\\w.`()]+", "")

    // hint translation (G:54): Flink names → Spark hint names; runtime-tuning
    // hints are stripped (no Spark counterpart; Catalyst already mini-batches
    // via partial aggregation)
    s = s.replaceAll("(?i)\\bSHUFFLE_MERGE\\b", "MERGE")
    s = s.replaceAll("(?i)\\bNEST_LOOP\\b", "SHUFFLE_REPLICATE_NL")
    s = """(?is)/\*\+\s*(?:OPTIONS|LOOKUP|STATE_TTL|MINI_BATCH|SPLIT_DISTINCT_AGG|AGG_STRATEGY|ASYNC_LOOKUP|RETRY_STRATEGY)\s*\([^)]*\)\s*\*/""".r
      .replaceAllIn(s, "")

    // ---- restore masked identifiers, then string literals
    bticks.zipWithIndex.reverse.foreach { case (bt, i) =>
      s = s.replace(s"$btTag${i}__", bt)
    }
    literals.zipWithIndex.reverse.foreach { case (lit, i) =>
      s = s.replace(s"$litTag${i}__", lit)
    }

    s.trim
  }

  /** Split an UPDATE SET clause on top-level commas (quotes/parens safe). */
  def splitAssignments(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\'' =>
          cur += c; i += 1
          while (i < s.length && s.charAt(i) != '\'') { cur += s.charAt(i); i += 1 }
          if (i < s.length) cur += '\''
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  // ------------------------------------------- quantified comparisons -----

  private val QuantRe =
    """(?i)(<>|!=|<=|>=|=|<|>)\s*\b(ALL|ANY|SOME)\b\s*\(""".r

  /** `x op ANY/SOME/ALL (SELECT ...)` (G:279) → NULL-correct Spark SQL.
    * Spark has no quantified comparison, so:
    *  - the equality family becomes a membership CASE over a hit-count
    *    subquery (NOT IN/NOT-IN fast paths are deliberately avoided — see
    *    [[quantifiedSql]]: Spark's IN-subquery is two-valued outside filters);
    *  - ordering ops → a CASE over uncorrelated scalar aggregate subqueries
    *    (count/min/max): the subquery collapses to one broadcast scalar per
    *    aggregate, so at 100 TB the outer table is scanned once with no join,
    *    and identical subquery plans are deduped by Spark's subquery reuse.
    * NULL semantics match the standard exactly: empty set → TRUE for ALL /
    * FALSE for ANY; otherwise FALSE/TRUE wins if a witness row decides, else
    * NULL when the needle is NULL or the set contains NULLs.
    * Runs on masked text (string literals / backticks are placeholders), so
    * the LHS backscan only ever sees identifier-shaped tokens. */
  private def rewriteQuantified(s0: String): String = {
    var s = s0
    var from = 0
    var continue = true
    while (continue) {
      QuantRe.findFirstMatchIn(s.substring(from)) match {
        case None => continue = false
        case Some(inner) =>
          val mStart = from + inner.start
          val mEnd = from + inner.end
          val op0 = inner.group(1)
          val quant =
            if (inner.group(2).equalsIgnoreCase("SOME")) "ANY" else inner.group(2).toUpperCase
          // balanced close paren of the subquery
          val open = mEnd - 1
          var i = open + 1
          var depth = 1
          while (i < s.length && depth > 0) {
            val c = s.charAt(i)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            i += 1
          }
          val close = i - 1
          // a truncated statement can END at "ANY (" — close lands before
          // open; treat as no subquery instead of a negative substring
          val sub = if (close > open) s.substring(open + 1, close).trim else ""
          // only rewrite genuine subqueries; anything else is left for Catalyst
          if (depth == 0 && sub.regionMatches(true, 0, "SELECT", 0, 6)) {
            // LHS: identifier chain, or a balanced (...) call with its name
            var j = mStart - 1
            while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
            val lhsEnd = j + 1
            // unwind trailing balanced groups — ')' (call/paren expr) and
            // ']' (subscript, possibly chained: tags[1][2] = ANY (...)) —
            // then the identifier chain. The subscript pass runs AFTER this
            // rewrite, so '[' is still present here.
            var unwinding = true
            while (unwinding && j >= 0) {
              s.charAt(j) match {
                case ')' =>
                  var d = 1; j -= 1
                  while (j >= 0 && d > 0) {
                    val c = s.charAt(j)
                    if (c == ')') d += 1 else if (c == '(') d -= 1
                    j -= 1
                  }
                case ']' =>
                  var d = 1; j -= 1
                  while (j >= 0 && d > 0) {
                    val c = s.charAt(j)
                    if (c == ']') d += 1 else if (c == '[') d -= 1
                    j -= 1
                  }
                case _ => unwinding = false
              }
            }
            while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' || s.charAt(j) == '.')) j -= 1
            // extend left over binary arithmetic/concat operators: comparison
            // binds looser, so `price * 1.1 > ALL (...)` and `a || b = ANY
            // (...)` must bind the whole chain, not the last token. Stop when
            // the preceding token is a keyword (start of the clause).
            val stopWords = Set("SELECT", "WHERE", "AND", "OR", "NOT", "WHEN",
              "THEN", "ELSE", "CASE", "ON", "BY", "HAVING", "IN", "IS", "LIKE",
              "BETWEEN", "END", "SET", "RETURN")
            var extending = true
            while (extending) {
              var p = j
              while (p >= 0 && s.charAt(p).isWhitespace) p -= 1
              val opLen =
                if (p >= 1 && s.charAt(p) == '|' && s.charAt(p - 1) == '|') 2
                else if (p >= 0 && "+-*/%".indexOf(s.charAt(p)) >= 0) 1
                else 0
              if (opLen == 0) extending = false
              else {
                var q2 = p - opLen
                while (q2 >= 0 && s.charAt(q2).isWhitespace) q2 -= 1
                var q3 = q2
                if (q3 >= 0 && s.charAt(q3) == ')') {
                  var d = 1; q3 -= 1
                  while (q3 >= 0 && d > 0) {
                    val ch = s.charAt(q3)
                    if (ch == ')') d += 1 else if (ch == '(') d -= 1
                    q3 -= 1
                  }
                }
                while (q3 >= 0 && (s.charAt(q3).isLetterOrDigit || s.charAt(q3) == '_' || s.charAt(q3) == '.')) q3 -= 1
                val tok = s.substring(q3 + 1, q2 + 1).trim
                if (tok.isEmpty || stopWords.contains(tok.toUpperCase)) {
                  // a +/- with NO left operand (clause start, keyword, or
                  // another operator before it) is a UNARY sign: absorb it
                  // into the operand and keep scanning (`WHERE -5 > ALL
                  // (...)`, `a * -5 = ANY (...)`) — leaving it outside
                  // would emit `- (CASE ...)`, unary minus over boolean
                  if (opLen == 1 && (s.charAt(p) == '+' || s.charAt(p) == '-'))
                    j = p - 1
                  else extending = false
                } else j = q3
              }
            }
            val lhs = s.substring(j + 1, lhsEnd).trim
            // a keyword "LHS" means the real operand extends further left
            // (CASE ... END op ALL (...)) — the backscan cannot bound it, so
            // fail with a named reason instead of emitting mangled SQL
            if (Set("END", "NULL", "TRUE", "FALSE", "THEN", "ELSE", "WHEN",
                "AND", "OR", "NOT", "IN", "BETWEEN", "LIKE", "IS")
                .contains(lhs.toUpperCase))
              throw new IllegalArgumentException(
                s"Quantified comparison after '$lhs' is not supported: wrap the " +
                  "left-hand expression in parentheses, e.g. (CASE ... END) > ALL (...)")
            // row-value LHS `(a, b) = ANY (...)`: the scalar CASE rewrite
            // cannot express a row comparison — fail with named guidance
            // instead of emitting `__qc = (a, b)`, which cannot resolve
            if (lhs.startsWith("(")) {
              var d = 0; var topComma = false
              lhs.foreach { c =>
                if (c == '(') d += 1 else if (c == ')') d -= 1
                else if (c == ',' && d == 1) topComma = true
              }
              if (topComma) throw new IllegalArgumentException(
                s"Quantified comparison with a row-value left-hand side $lhs " +
                  "is not supported — compare the columns individually " +
                  "(a = ANY (...) AND b = ANY (...) is NOT equivalent; use " +
                  "EXISTS with a row predicate instead)")
            }
            // the subquery text is inlined into up to five scalar
            // subqueries (Spark's ReuseSubquery dedups the identical ones);
            // a NON-deterministic set could disagree between copies — the
            // known non-deterministic builtins are rejected loudly
            if ("""(?i)\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|rand_integer)\s*\(""".r
                .findFirstIn(sub).isDefined)
              throw new IllegalArgumentException(
                "Quantified comparison over a non-deterministic subquery is " +
                  "not supported (the rewrite evaluates the set more than " +
                  "once) — materialize the subquery into a view first")
            if (lhs.nonEmpty) {
              // compound operands substitute into the CASE several times —
              // parenthesize so precedence can't shift around IS NULL / =
              val lhsSafe =
                if (lhs.forall(c => c.isLetterOrDigit || c == '_' || c == '.' || c == '`')) lhs
                else s"($lhs)"
              val repl = quantifiedSql(lhsSafe, if (op0 == "!=") "<>" else op0, quant, sub)
              s = s.substring(0, j + 1) + repl + s.substring(close + 1)
              // replacement contains no quantifier keyword adjacent to a
              // comparison op, but the subquery text (inlined verbatim) may
              // itself hold a nested quantified comparison — rescan from the
              // start of the replacement
              from = j + 1
            } else from = mEnd
          } else from = mEnd
      }
    }
    s
  }

  /** Build the Spark SQL replacement for one quantified comparison.
    * Deliberately NOT `= ANY`→IN / `<> ALL`→NOT IN: Spark lowers an
    * IN-subquery outside a filter to an ExistenceJoin whose result is
    * two-valued, collapsing UNKNOWN to FALSE — wrong whenever the needle is
    * NULL or the set contains NULLs and the predicate is projected. The
    * membership CASE below keeps the standard's three-valued result in any
    * context; its hit-count subquery is a correlated scalar aggregate with
    * an equality predicate, which Catalyst decorrelates to one aggregate +
    * join pass over the subquery.
    *
    * Single-evaluation assumption: the subquery TEXT is inlined into up to
    * five scalar subqueries. Spark's ReuseSubquery rule collapses the
    * byte-identical copies, but the rewrite is only semantically sound for
    * deterministic subqueries — the caller rejects the known
    * non-deterministic builtins before reaching here. */
  private def quantifiedSql(lhs: String, op: String, quant: String, sub: String): String = {
    def sq(agg: String) = s"(SELECT $agg FROM ($sub) __gq(__qc))"
    def hits = s"(SELECT count(*) FROM ($sub) __gq(__qc) WHERE __qc = $lhs)"
    val cnt = sq("count(*)")
    val nullGuard = s"$lhs IS NULL OR $cnt <> ${sq("count(__qc)")}"
    (op, quant) match {
      case ("=", "ANY") =>
        s"(CASE WHEN $hits > 0 THEN TRUE" +
          s" WHEN $cnt = 0 THEN FALSE" +
          s" WHEN $nullGuard THEN CAST(NULL AS BOOLEAN) ELSE FALSE END)"
      case ("<>", "ALL") =>
        s"(CASE WHEN $hits > 0 THEN FALSE" +
          s" WHEN $cnt = 0 THEN TRUE" +
          s" WHEN $nullGuard THEN CAST(NULL AS BOOLEAN) ELSE TRUE END)"
      case ("=", "ALL") =>
        s"(CASE WHEN $cnt = 0 THEN TRUE" +
          s" WHEN ${sq("min(__qc)")} <> $lhs OR ${sq("max(__qc)")} <> $lhs THEN FALSE" +
          s" WHEN $nullGuard THEN CAST(NULL AS BOOLEAN) ELSE TRUE END)"
      case ("<>", "ANY") =>
        s"(CASE WHEN $cnt = 0 THEN FALSE" +
          s" WHEN ${sq("min(__qc)")} <> $lhs OR ${sq("max(__qc)")} <> $lhs THEN TRUE" +
          s" WHEN $nullGuard THEN CAST(NULL AS BOOLEAN) ELSE FALSE END)"
      case (o, "ALL") =>
        // witness extreme: the set element hardest to beat
        val ext = if (o == ">" || o == ">=") "max" else "min"
        s"(CASE WHEN $cnt = 0 THEN TRUE" +
          s" WHEN NOT ($lhs $o ${sq(s"$ext(__qc)")}) THEN FALSE" +
          s" WHEN $nullGuard THEN CAST(NULL AS BOOLEAN) ELSE TRUE END)"
      case (o, _) =>
        // ANY: the easiest witness decides TRUE
        val ext = if (o == ">" || o == ">=") "min" else "max"
        s"(CASE WHEN $lhs $o ${sq(s"$ext(__qc)")} THEN TRUE" +
          s" WHEN $cnt = 0 THEN FALSE" +
          s" WHEN $nullGuard THEN CAST(NULL AS BOOLEAN) ELSE FALSE END)"
    }
  }

  private val IdentSubRe = """([\w.`]+)\s*\[([^\[\]]+)\]""".r

  /** Innermost-first subscript rewriting. Identifier bases go through the
    * regex; `)`-ended bases (function calls, or chains this rewrite itself
    * produced) are resolved by a balanced-paren backscan. String literals
    * are already masked when this runs, so brackets inside constants are
    * untouchable by construction. */
  private def rewriteSubscripts(s0: String): String = {
    var s = s0
    var changed = true
    while (changed) {
      changed = false
      IdentSubRe.findFirstMatchIn(s) match {
        case Some(m) =>
          s = s.substring(0, m.start) +
            s"try_element_at(${m.group(1)}, ${m.group(2).trim})" + s.substring(m.end)
          changed = true
        case None =>
          val idx = s.indexOf(")[")
          if (idx >= 0) {
            // walk back to the balanced '(' and its leading identifier chain
            var depth = 1
            var i = idx - 1
            while (i >= 0 && depth > 0) {
              val c = s.charAt(i)
              if (c == ')') depth += 1 else if (c == '(') depth -= 1
              if (depth > 0) i -= 1
            }
            var j = i - 1
            while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' || s.charAt(j) == '.')) j -= 1
            val close = s.indexOf(']', idx + 2)
            if (i >= 0 && close > idx) {
              val base = s.substring(j + 1, idx + 1)
              val inner = s.substring(idx + 2, close).trim
              s = s.substring(0, j + 1) + s"try_element_at($base, $inner)" + s.substring(close + 1)
              changed = true
            }
          }
      }
    }
    s
  }

  // ---------------------------------------------- CAST length fidelity --
  // Since Flink 1.15 (FLINK-24413; `table.exec.legacy-cast-behaviour`
  // disabled by default) a CAST to CHAR(n)/VARCHAR(n) TRIMS the value to n
  // code points — CHAR(n) additionally right-pads with spaces — and
  // BINARY(n)/VARBINARY(n) trims to n bytes, BINARY(n) zero-padding.
  // Spark PARSES these types inside CAST but erases the length entirely
  // (CAST('abc' AS VARCHAR(1)) = 'abc'), silently keeping the untrimmed
  // value. Rewrite explicit-length character/binary casts into
  // rpad/substring shims with exactly Flink's semantics (Spark's rpad
  // truncates when the input exceeds the target length, matching the
  // trim; rpad also accepts BINARY with a binary pad since 3.3).
  // Length-LESS forms (bare CHAR/VARCHAR/VARBINARY) are handled by the
  // STRING/BINARY fallback in rewrite() — a documented divergence.
  private val CastKw = """(?i)\b(TRY_CAST|CAST)\s*\(""".r
  private val CharN = """(?i)^CHAR\s*\(\s*(\d+)\s*\)$""".r
  private val VarcharN = """(?i)^VARCHAR\s*\(\s*(\d+)\s*\)$""".r
  private val BinaryN = """(?i)^BINARY\s*\(\s*(\d+)\s*\)$""".r
  private val VarbinaryN = """(?i)^VARBINARY\s*\(\s*(\d+)\s*\)$""".r

  private def castShim(kw: String, expr: String, tpe: String): Option[String] =
    tpe match {
      case CharN(n) => Some(s"rpad($kw($expr AS STRING), $n, ' ')")
      case VarcharN(n) if n.toLong < Int.MaxValue =>
        Some(s"substring($kw($expr AS STRING), 1, $n)")
      case VarcharN(_) => Some(s"$kw($expr AS STRING)") // VARCHAR(max) ≡ STRING
      case BinaryN(n) => Some(s"rpad($kw($expr AS BINARY), $n, X'00')")
      case VarbinaryN(n) if n.toLong < Int.MaxValue =>
        Some(s"substring($kw($expr AS BINARY), 1, $n)")
      case VarbinaryN(_) => Some(s"$kw($expr AS BINARY)")
      case _ => None
    }

  /** Index of the matching ')' for the '(' at `open`, or -1. Runs on
    * masked text, so parens inside string literals cannot confuse it
    * (the only unmasked literals are numeric/duration-shaped). */
  /** Iteratively rewrite every single-quoted literal ('' escapes included)
    * through `f` (which receives the literal WITH its quotes); non-literal
    * text is copied verbatim, an unterminated trailing literal is copied
    * as-is. A hand scanner, not a regex: java.util.regex recurses once per
    * character for `(?:[^']|'')*` (and once per escape for the unrolled
    * form), so literal length must not drive match depth — a ~10 KB string
    * literal in a statement overflowed the stack (r13 soak finding). */
  def foldLiterals(s: String)(f: String => String): String = {
    val n = s.length
    if (s.indexOf('\'') < 0) return s
    val out = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 // '' escape
            else { closed = true; i += 1 }
          } else i += 1
        }
        if (closed) out.append(f(s.substring(start, i)))
        else out.append(s.substring(start))
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Start index of a SIMILAR TO left operand ending (exclusive) at `end`:
    * walks BACKWARD over identifier/placeholder characters, simple quoted
    * literals and balanced parenthesized groups — iteratively, so operand
    * length cannot overflow the stack the way a regex group loop does
    * (java.util.regex recurses once per character for `(?:A|B)+`). Returns
    * `end` when no operand precedes the position. Mirrors the shapes the
    * old regex accepted: `(?:[\w.`']|\((?:[^()']|'[^']*'|\([^()]*\))*\))+`. */
  private def similarOperandStart(s: String, end: Int): Int = {
    var i = end
    var start = end
    var done = false
    while (!done && i > 0) {
      val c = s.charAt(i - 1)
      if (c == ')') {
        // balanced paren walk, quote-aware (a ')' inside '...' is content)
        var depth = 0; var j = i; var stop = false; var bad = false
        while (j > 0 && !stop) {
          j -= 1
          s.charAt(j) match {
            case '\'' =>
              var k = j - 1
              while (k >= 0 && s.charAt(k) != '\'') k -= 1
              if (k < 0) { stop = true; bad = true } else j = k
            case ')' => depth += 1
            case '(' => depth -= 1; if (depth == 0) stop = true
            case _ => ()
          }
        }
        if (bad || depth != 0) done = true
        else { i = j; start = i }
      } else if (c == '\'') {
        // a simple inline literal chunk ('12:30'): jump to its opening quote
        var k = i - 2
        while (k >= 0 && s.charAt(k) != '\'') k -= 1
        if (k < 0) done = true else { i = k; start = i }
      } else if (c == '_' || c == '.' || c == '`' || Character.isLetterOrDigit(c)) {
        i -= 1; start = i
      } else done = true
    }
    start
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** Start index of the LAST depth-0 `AS` keyword in a CAST body (the type
    * separator; any AS inside the operand sits behind its own parens). */
  private def lastTopLevelAs(s: String): Int = {
    var depth = 0; var last = -1; var i = 0
    def wordAt(j: Int) = j >= 0 && j < s.length &&
      (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'A' || c == 'a') &&
          (s.charAt(i + 1) == 'S' || s.charAt(i + 1) == 's') &&
          !wordAt(i - 1) && !wordAt(i + 2)) last = i
      i += 1
    }
    last
  }

  /** Rewrite every explicit-length character/binary CAST in `s` (masked
    * text) into its Flink trim/pad shim; all other casts pass through with
    * only their operands recursively processed. */
  def rewriteCastLengths(s: String): String =
    CastKw.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(s, open)
        if (close < 0) s // unbalanced: leave for Spark's parser to reject
        else {
          val inner = rewriteCastLengths(s.substring(open + 1, close))
          val kw = m.group(1).toUpperCase(java.util.Locale.ROOT)
          val asIdx = lastTopLevelAs(inner)
          val body =
            if (asIdx < 0) s"$kw($inner)"
            else castShim(kw, inner.substring(0, asIdx).trim,
                inner.substring(asIdx + 2).trim)
              .getOrElse(s"$kw($inner)")
          s.substring(0, m.start) + body + rewriteCastLengths(s.substring(close + 1))
        }
    }

  /** Convenience: rewrite + run one statement. */
  def sql(spark: org.apache.spark.sql.SparkSession, stmt: String): org.apache.spark.sql.DataFrame =
    spark.sql(rewrite(stmt))
}
