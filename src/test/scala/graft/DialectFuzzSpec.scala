package graft

import org.scalacheck.{Gen, rng}
import graft.engine.FlinkDialect

/** Grammar-shaped fuzz of the dialect layer (r11, VERDICT task 5): 10k+
  * generated statements over the shapes a real user's "first weird query"
  * hits — identifiers that embed keywords, string literals carrying SQL
  * text / ';' / comment markers, hint placement, nested constructs, odd
  * whitespace and case — asserting:
  *   F1 split() returns exactly the joined statements, each payload intact;
  *   F2 rewrite() is total (never throws) and leaves no internal
  *      __GRAFT_* placeholder residue;
  *   F3 string literals and backticked identifiers survive rewrite()
  *      VERBATIM unless the construct's contract consumes them (window TVF
  *      intervals, SIMILAR TO patterns);
  *   F4 rewrite() output of well-formed generated statements reparses
  *      under Spark's own parser.
  * Seeded generators: a failure reproduces by seed printed in the assert.
  */
class DialectFuzzSpec extends SparkTestBase {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(seed + i)))
      .flatten.take(n).toSeq
  }

  // ---------------------------------------------------------- generators --

  /** Identifiers deliberately embedding rewrite-rule keywords. */
  private val ident: Gen[String] = Gen.oneOf(
    "tumble_x", "hopper", "session_id", "cumulated", "rowdy", "row_cnt",
    "elements", "collector", "unknown_flag", "proctime_ts", "similarity",
    "window_start_x", "arrays", "mapped", "flattened", "x0xFF", "ts")

  /** Backticked identifiers with content no rule may ever touch. */
  private val btIdent: Gen[String] = Gen.oneOf(
    "`select`", "`group by`", "`tumble`", "`a;b`", "`0xAB`", "`x[1]`",
    "`window_start`", "`similar to`", "`collect`", "`proctime()`")

  /** String-literal payloads that look exactly like rewritable constructs.
    * None may be altered by rewrite() (single-quote-free so the literal
    * embeds without escaping; the '' escape form is covered separately). */
  private val litPayload: Gen[String] = Gen.oneOf(
    "TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL 1 MINUTE)",
    "GROUP BY window_start, window_end",
    "x SIMILAR TO pattern", "ARRAY[1, 2]", "MAP[k, v]", "a[1][2]",
    "0xFF and 0x10", "PROCTIME()", "ROW(a, b)", "COLLECT(x)",
    "ELEMENT(arr)", "TIMESTAMP_LTZ(3)", "FOR SYSTEM_TIME AS OF now",
    "SHUFFLE_MERGE NEST_LOOP", "JSON_OBJECT(KEY k VALUE v)",
    "1 = ANY (SELECT v)", "UNKNOWN", "; -- not a split point",
    "/*+ STATE_TTL(t AS 1h) */", "it -- looks like a comment",
    "/* block */ END")

  /** Full literals with doubled-quote escapes whose CONTENT is exactly a
    * rewritable construct — the sharpest corruption bait for any rule that
    * runs before literal masking. */
  private val escLiteral: Gen[String] = Gen.oneOf(
    "'it''s'",
    "'TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL ''1'' MINUTE))'",
    "'INTERVAL ''5'' MINUTE'",
    "'x SIMILAR TO ''%a%'''",
    "'TABLE(SESSION(TABLE e, DESCRIPTOR(ts), INTERVAL ''2'' HOUR))'")

  private val literal: Gen[String] =
    Gen.frequency(3 -> litPayload.map(p => s"'$p'"), 1 -> escLiteral)

  /** Simple scalar expressions mixing the above. */
  private val scalar: Gen[String] = Gen.oneOf(
    ident, btIdent, literal, Gen.const("1.5"), Gen.const("42"),
    ident.map(i => s"CASE WHEN $i > 0 THEN $i ELSE 0 END"),
    Gen.zip(ident, literal).map { case (i, l) => s"concat($i, $l)" })

  private val hint: Gen[String] = Gen.oneOf(
    "", "/*+ BROADCAST(t) */ ", "/*+ SHUFFLE_MERGE(t) */ ",
    "/*+ STATE_TTL('t' = '1h') */ ", "/*+ MINI_BATCH('enabled'='true') */ ")

  private val unit: Gen[String] =
    Gen.oneOf("SECOND", "MINUTE", "HOUR", "MINUTES", "second")

  /** Real Flink constructs the rules MUST still rewrite. */
  private val flinkConstruct: Gen[String] = Gen.oneOf(
    Gen.zip(Gen.choose(1, 30), unit).map { case (v, u) =>
      s"TABLE(TUMBLE(TABLE events, DESCRIPTOR(event_time), INTERVAL '$v' $u))" },
    Gen.zip(Gen.choose(1, 10), Gen.choose(10, 40), unit).map { case (a, b, u) =>
      s"table( hop(TABLE events, DESCRIPTOR(event_time), INTERVAL '$a' $u, INTERVAL '$b' $u) )" },
    Gen.const("events FOR SYSTEM_TIME AS OF proc_ts"))

  private val whereClause: Gen[String] = Gen.oneOf(
    Gen.const(""),
    ident.map(i => s" WHERE $i SIMILAR TO 'a%b_c.d'"),
    ident.map(i => s" WHERE $i = ANY (SELECT v FROM u)"),
    ident.map(i => s" WHERE $i > 0xFF"),
    Gen.zip(ident, literal).map { case (i, l) => s" WHERE $i <> $l" })

  /** A well-formed-by-construction SELECT whose skeleton Spark can parse
    * after rewrite (tables/columns need not exist — F4 parses, not runs). */
  private val selectStmt: Gen[String] = for {
    h <- hint
    cols <- Gen.nonEmptyListOf(scalar).map(_.take(4))
    extra <- Gen.oneOf("", ", ARRAY[1, 2][1]", ", ROW(a, b) AS r",
      ", COLLECT(v) AS m", ", CAST(NULL AS TIMESTAMP_LTZ) AS tl")
    src <- Gen.frequency(8 -> Gen.const("t"), 2 -> flinkConstruct)
    w <- whereClause
  } yield s"SELECT $h${cols.mkString(", ")}$extra FROM $src$w"

  private val otherStmt: Gen[String] = Gen.oneOf(
    "SET 'table.exec.state.ttl' = '1 h'",
    "SHOW TABLES", "DESCRIBE t", "EXPLAIN PLAN FOR SELECT a FROM t",
    "CREATE VIEW v AS SELECT a, 'x;y' AS s FROM t",
    "INSERT INTO snk SELECT a FROM t WHERE s <> ';'")

  /** A real TVF aggregation with a DECOY literal/alias mentioning the
    * window columns — bait for the GROUP-BY injection lookaheads. */
  private val tvfWithDecoy: Gen[String] = for {
    v <- Gen.choose(1, 30)
    u <- unit
    decoy <- Gen.oneOf("'GROUP BY window_start, window_end' AS note",
      "'window_start' AS ws_lit", "window_start_x")
    tail <- Gen.oneOf("", " ORDER BY window_start", " HAVING count(*) > 0")
  } yield s"SELECT window_start, window_end, $decoy, count(*) AS n FROM " +
    s"TABLE(TUMBLE(TABLE events, DESCRIPTOR(event_time), INTERVAL '$v' $u)) " +
    s"GROUP BY window_start, window_end$tail"

  private val statement: Gen[String] =
    Gen.frequency(7 -> selectStmt, 2 -> otherStmt, 1 -> tvfWithDecoy)

  // ----------------------------------------------------------- F1: split --

  test("F1: split returns each generated statement with payloads intact") {
    val seed = 0xd1a1ec7L
    val scripts = samples(Gen.listOfN(4, statement), 500, seed)
    scripts.zipWithIndex.foreach { case (stmts, i) =>
      // tag each statement with a unique marker column so count mismatches
      // are attributable; separators vary comment noise around the ';'
      val tagged = stmts.zipWithIndex.map { case (s, j) =>
        if (s.toUpperCase.startsWith("SELECT")) s"SELECT $j AS __tag_$j, " + s.drop(7)
        else s
      }
      val script = tagged.mkString(";\n-- inter;statement comment\n") + ";"
      val got = FlinkDialect.split(script)
      assert(got.size == tagged.size, s"[case $i seed $seed] $script\n-> $got")
      got.zip(tagged).foreach { case (g, t) =>
        // literal payloads (incl. ';') must survive splitting verbatim
        """'(?:[^']|'')*'""".r.findAllIn(t).foreach { lit =>
          assert(g.contains(lit), s"[case $i] literal $lit lost from: $g")
        }
      }
    }
  }

  // --------------------------------------------- F2/F3: rewrite invariants --

  test("F2: rewrite is total and leaves no placeholder residue (10k stmts)") {
    val seed = 0xf2f2f2L
    samples(statement, 10000, seed).zipWithIndex.foreach { case (stmt, i) =>
      val out = FlinkDialect.rewrite(stmt) // must not throw
      assert(!out.contains("__GRAFT_LIT_") && !out.contains("__GRAFT_BT_") &&
        !out.contains("__GRAFT_TS_LTZ__"),
        s"[case $i seed $seed] placeholder residue:\n$stmt\n-> $out")
    }
  }

  test("F3: string literals and backticked idents survive rewrite verbatim") {
    val seed = 0xf3f3f3L
    samples(selectStmt, 4000, seed).zipWithIndex.foreach { case (stmt, i) =>
      val out = FlinkDialect.rewrite(stmt)
      // every literal of the INPUT must appear verbatim in the OUTPUT,
      // except those the construct's contract consumes: TVF interval
      // literals (folded into window()'s duration string) and SIMILAR TO
      // patterns (translated into a regexp)
      val consumed = ("""(?is)INTERVAL\s+('[^']*')""".r.findAllMatchIn(stmt) ++
        """(?is)SIMILAR\s+TO\s+('[^']*')""".r.findAllMatchIn(stmt))
        .map(_.group(1)).toSet
      // literals inside a runtime-tuning hint vanish with the whole hint —
      // the dialect strips those hints by contract
      val strippedHints =
        ("""(?is)/\*\+\s*(?:OPTIONS|LOOKUP|STATE_TTL|MINI_BATCH|SPLIT_DISTINCT_AGG""" +
          """|AGG_STRATEGY|ASYNC_LOOKUP|RETRY_STRATEGY)\s*\([^)]*\)\s*\*/""").r
      val inStripped = strippedHints.findAllIn(stmt)
        .flatMap(h => """'(?:[^']|'')*'""".r.findAllIn(h)).toSet
      """'(?:[^']|'')*'""".r.findAllIn(stmt).toSeq
        .filterNot(consumed.contains).filterNot(inStripped.contains)
        .foreach { lit =>
          assert(out.contains(lit),
            s"[case $i seed $seed] literal $lit altered:\n$stmt\n-> $out")
        }
      """`[^`]+`""".r.findAllIn(stmt).foreach { bt =>
        assert(out.contains(bt),
          s"[case $i seed $seed] backtick ident $bt altered:\n$stmt\n-> $out")
      }
    }
  }

  test("F5: rewrite is idempotent — a second pass changes nothing") {
    // users (and the gateway's own EXPLAIN paths) can feed already-rewritten
    // SQL back through the dialect; every rule's output must be a fixpoint
    val seed = 0xf5f5f5L
    samples(statement, 4000, seed).zipWithIndex.foreach { case (stmt, i) =>
      val once = FlinkDialect.rewrite(stmt)
      val twice = FlinkDialect.rewrite(once)
      assert(twice == once,
        s"[case $i seed $seed] rewrite not idempotent:\n$stmt\n-1->\n$once\n-2->\n$twice")
    }
  }

  test("F6: mutilated statements fail cleanly, never with an internal error") {
    // truncations, dropped characters, unbalanced quotes: split/rewrite
    // must pass the text through or raise a named IllegalArgumentException
    // — an NPE or StringIndexOutOfBounds is a parser bug, whatever the input
    val seed = 0xf6f6f6L
    val mutG = for {
      stmt <- statement
      mode <- Gen.choose(0, 3)
      at <- Gen.choose(0, math.max(stmt.length - 1, 0))
    } yield mode match {
      case 0 => stmt.take(at)                          // truncate
      case 1 => stmt.patch(at, "", 1)                  // drop one char
      case 2 => stmt.patch(at, "'", 0)                 // unbalanced quote
      case _ => stmt.patch(at, "((", 0)                // unbalanced parens
    }
    samples(mutG, 4000, seed).zipWithIndex.foreach { case (stmt, i) =>
      try {
        FlinkDialect.split(stmt).foreach(FlinkDialect.rewrite)
      } catch {
        case _: IllegalArgumentException => // named rejection: fine
        case e: Throwable =>
          fail(s"[case $i seed $seed] internal error ${e.getClass.getSimpleName} " +
            s"on:\n$stmt\n${e.getMessage}")
      }
    }
  }

  test("F7: forged placeholder tokens in the input are inert plain text") {
    // text that literally spells a masking placeholder (outside any quote
    // or inside one) must neither crash the restore (out-of-range index was
    // an IndexOutOfBoundsException pre-r12) nor get silently substituted
    // with an unrelated masked literal (in-range collision) — the dialect
    // escalates its placeholder tag until it cannot collide with the input
    val forged = Seq(
      // out-of-range forged index, no masked literals at all
      "SELECT a FROM t WHERE b = __GRAFT_LIT_5__",
      // in-range collision: one real masked literal ('x%'), plus a forged
      // token that would alias it
      "SELECT __GRAFT_LIT_0__ FROM t WHERE c LIKE 'x%y'",
      // forged backtick placeholder and TS_LTZ marker
      "SELECT __GRAFT_BT_3__, __GRAFT_TS_LTZ__ FROM t",
      // forged token INSIDE a string literal must come back verbatim
      "SELECT '__GRAFT_LIT_9__ payload' AS s FROM t",
      // SIMILAR TO with a forged placeholder where a masked pattern could be
      "SELECT a FROM t WHERE b SIMILAR TO __GRAFT_LIT_7__",
      // LOWERCASE forgeries: the SIMILAR TO rule matches placeholders under
      // a pattern-wide (?i), so the anti-forgery escalation must be
      // case-insensitive too (r12 review finding)
      "SELECT a FROM t WHERE b SIMILAR TO __graft_lit_0__",
      "SELECT a FROM t WHERE c = 'x' AND b SIMILAR TO __graft_lit_0__",
      "SELECT __graft_bt_1__, __Graft_Ts_Ltz__ FROM t")
    forged.zipWithIndex.foreach { case (stmt, i) =>
      val out = FlinkDialect.rewrite(stmt) // must not throw
      // every forged token present in the input survives to the output
      // verbatim (it is plain text, not a placeholder of THIS call)
      "(?i)(?:__GRAFT_(?:LIT|BT)_\\d+__|__GRAFT_TS_LTZ__)".r.findAllIn(stmt).toSet
        .foreach { tok: String => assert(out.contains(tok),
          s"[case $i] forged token $tok mangled:\n$stmt\n-> $out") }
      // and a real literal in the same statement is never replaced by junk
      if (stmt.contains("'x%y'"))
        assert(out.contains("'x%y'"), s"[case $i] real literal lost: $out")
    }
    // idempotence holds with forged tokens too (tag escalation is stable)
    forged.foreach { stmt =>
      val once = FlinkDialect.rewrite(stmt)
      assert(FlinkDialect.rewrite(once) == once, s"not idempotent on: $stmt")
    }
  }

  test("F8: __w injection survives a GROUP BY key list past 600 chars (r13 ADVICE)") {
    // the window-key lookahead is bounded (backtracking depth), but the
    // bound must sit far above realistic clause sizes: a 40-key GROUP BY
    // (~1.1k chars before window_start) must still get __w injected, or
    // streaming window-agg state eviction silently changes
    val keys = (0 until 40).map(i => s"some_rather_long_key_name_$i")
    val stmt = s"SELECT window_start, window_end, ${keys.mkString(", ")}, COUNT(*) AS c " +
      "FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' MINUTES)) " +
      s"GROUP BY ${keys.mkString(", ")}, window_start, window_end"
    assert(keys.mkString(", ").length > 600, "test must exceed the old bound")
    val out = FlinkDialect.rewrite(stmt)
    assert(out.contains("`__w`, "), s"__w not injected past 600 chars:\n$out")
    // and the genuinely-unbounded case (past 4000 chars) degrades by
    // stripping the __w projection — never a foreign column in the output
    val hugeKeys = (0 until 200).map(i => s"some_rather_long_key_name_$i")
    val huge = s"SELECT window_start, window_end, COUNT(*) AS c " +
      "FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' MINUTES)) " +
      s"GROUP BY ${hugeKeys.mkString(", ")}, window_start, window_end"
    val outHuge = FlinkDialect.rewrite(huge)
    assert(!outHuge.contains("AS __w"), s"__w projection must strip:\n$outHuge")
  }

  // --------------------------------------------------------- F4: reparse --

  test("F4: rewrite output of well-formed statements reparses under Spark") {
    val seed = 0xf4f4f4L
    val parser = spark.sessionState.sqlParser
    samples(selectStmt, 2000, seed).zipWithIndex.foreach { case (stmt, i) =>
      val out = FlinkDialect.rewrite(stmt)
      try parser.parsePlan(out)
      catch {
        case e: Exception =>
          fail(s"[case $i seed $seed] rewrite output does not parse:\n" +
            s"$stmt\n-> $out\n${e.getMessage.linesIterator.take(4).mkString("\n")}")
      }
    }
  }
}
