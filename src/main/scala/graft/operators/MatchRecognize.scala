package graft.operators

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MATCH_RECOGNIZE (CEP) — reference test/syntax-test.fsql:465-482, grammar
  * syntaxes/flink.tmLanguage.json:363-367. Spark has no counterpart
  * (SURVEY.md §2.9), so this is a custom operator.
  *
  * Supported surface:
  *   PARTITION BY cols / ORDER BY col
  *   MEASURES FIRST/LAST(V.field), MIN/MAX/SUM/AVG(V.field), COUNT(V.*),
  *            CLASSIFIER(), MATCH_NUMBER()
  *   ONE ROW PER MATCH | ALL ROWS PER MATCH
  *   AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO FIRST v | TO LAST v
  *   PATTERN: concatenation of variables or alternation groups (A|B), each
  *            with quantifiers + * ?  (greedy)
  *   DEFINE V AS <predicate over V's own row, PREV/NEXT(x.f[,n]) input-row
  *            navigation, FIRST/LAST(x.f[,n]) match-state navigation>
  *   (pattern variables without a DEFINE are always-true, as in Flink)
  *
  * Execution model (100 TB-ready):
  *  - DEFINE predicates are evaluated by CATALYST as projected boolean
  *    columns — codegen'd, pushdown-friendly; the NFA only ever sees bits;
  *  - PREV/NEXT navigation becomes lag/lead window columns computed AFTER the
  *    operator's own repartition+sort on the same keys, so Catalyst reuses
  *    the exchange and sort — navigation costs zero extra shuffles;
  *  - BATCH: rows are hash-partitioned on the PARTITION BY key and
  *    secondary-sorted (repartition + sortWithinPartitions), then a single
  *    mapPartitions pass runs the backtracking matcher per key-run — the
  *    classic secondary-sort pattern: one shuffle, streaming within
  *    partitions, memory bounded by the largest single key's row count;
  *  - STREAMING ([[matchRecognizeStream]]): the SAME matcher runs inside
  *    `flatMapGroupsWithState` with event-time timeouts. Rows at or below
  *    the watermark are immutable, so matches that end strictly before the
  *    mature frontier emit exactly once; a match (or failed attempt) that
  *    touched the frontier is retained — rows that can never join a future
  *    match are dropped from state, giving the same state bound as Flink's
  *    keyed CEP (watermark lag × per-key rate).
  */
object MatchRecognize {

  sealed trait Quant
  case object One extends Quant
  case object Plus extends Quant
  case object Star extends Quant
  case object Opt extends Quant

  /** one pattern token: a variable or an alternation group, with quantifier */
  final case class PatTok(vars: Seq[String], quant: Quant)

  /** measure kinds: first | last | min | max | sum | avg | count |
    * classifier | match_number. `mode` is "final" (whole match — the only
    * choice in ONE ROW mode) or "running" (rows up to and including the
    * current one, the ALL ROWS default in Flink). */
  final case class Measure(alias: String, kind: String, variable: String, field: String,
      mode: String = "final")

  /** PREV/NEXT navigation used by a DEFINE predicate: the predicate text
    * references `name`, which materializes as lag/lead(field, offset). */
  final case class Nav(name: String, fn: String, field: String, offset: Int)

  /** Match-state-dependent navigation in DEFINE (G:363-367): FIRST/LAST walk
    * the rows mapped to `variable` in the CURRENT match attempt (including
    * the row under test), so they cannot be precomputed as columns; PREV/NEXT
    * appear here too on the streaming path, where lag/lead window columns
    * are unavailable. The predicate text references `name`, which the kernel
    * fills per evaluation. `offset`: n-th from the first/last mapped row
    * (FIRST/LAST, default 0) or input-row distance (PREV/NEXT, default 1). */
  final case class DynNavSpec(name: String, kind: String, variable: String,
      field: String, offset: Int)

  /** AFTER MATCH SKIP strategy (G:363-367 declares all four). */
  sealed trait SkipMode extends Serializable
  case object SkipPastLastRow extends SkipMode
  case object SkipToNextRow extends SkipMode
  /** Resume at the first/last row mapped to `variable` in the just-completed
    * match. Per the SQL standard, a resume position equal to the match start
    * is an infinite loop and raises an error at runtime. */
  final case class SkipToFirst(variable: String) extends SkipMode
  final case class SkipToLast(variable: String) extends SkipMode

  private def quantOf(q: String): Quant = q match {
    case "+" => Plus
    case "*" => Star
    case "?" => Opt
    case _   => One
  }

  private val TokRe =
    """\(\s*(\w+(?:\s*\|\s*\w+)*)\s*\)\s*([+*?]\??|\{\d+(?:,\d*)?\})?|(\w+)\s*([+*?]\??|\{\d+(?:,\d*)?\})?""".r
  private val BraceQuantRe = """\{(\d+)(?:,(\d*))?\}""".r

  /** Parse a full PATTERN body into ordered alternatives:
    * `PERMUTE(A, B, C)` expands to every ordering (G:363); `A B | C D` splits
    * on top-level `|` into sequence alternatives; otherwise one sequence. */
  def parseAlternatives(p0: String): Seq[Seq[PatTok]] = {
    val p = p0.trim
    val perm = """(?is)^PERMUTE\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)$""".r
    perm.findFirstMatchIn(p) match {
      case Some(m) =>
        val vars = m.group(1).split(",").map(_.trim).toSeq
        require(vars.length <= 6, s"PERMUTE over ${vars.length} variables (max 6)")
        vars.permutations.map(_.map(v => PatTok(Seq(v), One))).toSeq
      case None =>
        // split on '|' outside parentheses → ordered sequence alternatives
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        var depth = 0
        p.foreach {
          case '(' => depth += 1; cur += '('
          case ')' => depth -= 1; cur += ')'
          case '|' if depth == 0 => parts += cur.toString; cur.clear()
          case c => cur += c
        }
        parts += cur.toString
        parts.toSeq.map(parsePattern).filter(_.nonEmpty)
    }
  }

  /** Parse "A+ (B|C)* D?" into tokens. Range quantifiers expand:
    * `A{n}` → n required A's, `A{n,m}` → n required + (m-n) optional,
    * `A{n,}` → n required + A*. Anything the tokenizer cannot consume —
    * including reluctant `+?`/`*?`/`??` (not implemented; greedy-vs-
    * reluctant changes which rows land in which variable) — is a loud
    * error: a silently-dropped quantifier would run a DIFFERENT pattern
    * and return wrong matches with no sign anything was ignored. */
  def parsePattern(p: String): Seq[PatTok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PatTok]
    var last = 0
    def gapCheck(upTo: Int): Unit = {
      val gap = p.substring(last, upTo).trim
      require(gap.isEmpty,
        s"unsupported PATTERN syntax at '$gap' in '$p' — this engine " +
          "implements variables, (a|b) groups, +, *, ?, {n}, {n,}, {n,m}, " +
          "and PERMUTE(...)")
    }
    TokRe.findAllMatchIn(p).foreach { m =>
      gapCheck(m.start)
      last = m.end
      val (vars, q) =
        if (m.group(1) != null)
          (m.group(1).split("\\|").map(_.trim).toSeq, Option(m.group(2)).getOrElse(""))
        else (Seq(m.group(3)), Option(m.group(4)).getOrElse(""))
      q match {
        case "" | "+" | "*" | "?" => out += PatTok(vars, quantOf(q))
        case BraceQuantRe(n0, max0) =>
          // expansion is one token per repetition, so the bound is user
          // input: PATTERN (A{2,999999999}) built a billion-element token
          // list and hung the session (r13 probe). Cap with a named error
          // BEFORE any toInt (digits beyond Long are caught by the regex's
          // \d+ against BigInt-free parsing via length); every realistic
          // CEP pattern sits orders of magnitude below the cap.
          val cap = 10000
          require(n0.length <= 9 && n0.toLong <= cap &&
              Option(max0).filter(_.nonEmpty).forall(mx =>
                mx.length <= 9 && mx.toLong <= cap),
            s"range quantifier '$q' in '$p' exceeds the $cap-repetition " +
              "bound (patterns expand to one token per repetition); use an " +
              "unbounded tail like A{n,} or restate the pattern")
          val n = n0.toInt
          require(n > 0 || max0 != null, s"A{0} matches nothing: '$q' in '$p'")
          (1 to n).foreach(_ => out += PatTok(vars, One))
          Option(max0) match {
            case None => () // {n}: exactly n
            case Some("") => out += PatTok(vars, Star) // {n,}: unbounded tail
            case Some(mx) =>
              require(mx.toInt >= n, s"bad range quantifier '$q' in '$p'")
              (n until mx.toInt).foreach(_ => out += PatTok(vars, Opt))
          }
        case other => throw new IllegalArgumentException(
          s"unsupported quantifier '$other' in PATTERN '$p' — reluctant " +
            "quantifiers are not implemented (greedy matching only)")
      }
    }
    gapCheck(p.length)
    out.toSeq
  }

  // ---------------------------------------------------------------- kernel --

  /** Serializable matcher + measure evaluator shared by the batch
    * mapPartitions pass and the streaming stateful function.
    *
    * Two predicate paths: static variables read precomputed boolean bit
    * columns (Catalyst codegen, the common case); variables whose DEFINE
    * uses match-state navigation (`dynBound(v) != null`) evaluate a bound
    * Catalyst expression per candidate row, with FIRST/LAST slots computed
    * from the attempt's partial variable assignment and PREV/NEXT slots
    * read positionally from the buffered group. */
  private[operators] final class Kernel(
      pats: Array[Array[(Array[Int], Quant)]],
      nVars: Int,
      condIdx: Array[Int],
      keyIdx: Array[Int],
      baseIdx: Array[Int],
      varNames: Array[String],
      measures: Array[Measure],
      varIdx: Map[String, Int],
      fieldIdx: Map[String, Int],
      allRows: Boolean,
      // 0 = past last row, 1 = to next row, 2 = to first var, 3 = to last var
      skipKind: Int = 0,
      skipVar: Int = -1,
      // dynamic-DEFINE support (empty/full-null when every variable is static)
      dynBound: Array[org.apache.spark.sql.catalyst.expressions.Expression] = Array.empty,
      navKinds: Array[Int] = Array.empty, // 0 prev, 1 next, 2 first, 3 last
      navVars: Array[Int] = Array.empty,
      navFieldIdx: Array[Int] = Array.empty,
      navFieldTypes: Array[DataType] = Array.empty,
      navOffs: Array[Int] = Array.empty,
      // navMask(v)(k): does variable v's DEFINE reference nav slot k? Slots a
      // predicate never reads are skipped — crucially, a foreign NEXT slot
      // must not set hitEnd (holding an attempt that is fully decidable)
      navMask: Array[Array[Boolean]] = Array.empty,
      rowSchema: StructType = new StructType()) extends Serializable {

    private val hasDyn = dynBound.exists(_ != null)

    @transient private lazy val toCatalyst =
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(rowSchema)

    /** per-scan state for dynamic evaluation */
    @transient private var curIrows: Array[org.apache.spark.sql.catalyst.InternalRow] = _
    @transient private var curClosed: Boolean = true

    /** Evaluate a dynamic DEFINE for candidate variable `v` at row `p`,
      * given the attempt's partial assignment over [start, p). */
    private def dynEval(v: Int, p: Int, assign: Array[Int], start: Int, len: Int): Boolean = {
      val slots = new Array[Any](navKinds.length)
      val mask = navMask(v)
      var k = 0
      while (k < navKinds.length) {
        if (!mask(k)) { k += 1 }
        else { navKinds(k) match {
          case 0 => // PREV: n-th previous input row (null before the group start)
            val q = p - navOffs(k)
            if (q >= 0) slots(k) = curIrows(q).get(navFieldIdx(k), navFieldTypes(k))
          case 1 => // NEXT: n-th following input row; beyond the streaming
            // frontier the value is unknowable yet → hold the attempt
            val q = p + navOffs(k)
            if (q < len) slots(k) = curIrows(q).get(navFieldIdx(k), navFieldTypes(k))
            else if (!curClosed) hitEnd = true
          case kind => // FIRST (2) / LAST (3) over rows mapped to navVars(k),
            // the row under test counting as mapped to `v`
            val tv = navVars(k)
            var q = if (kind == 2) start else p
            val step = if (kind == 2) 1 else -1
            var seen = -1
            var found = -1
            while (found < 0 && q >= start && q <= p) {
              val a = if (q == p) v else assign(q)
              if (a == tv) { seen += 1; if (seen == navOffs(k)) found = q }
              q += step
            }
            if (found >= 0) slots(k) = curIrows(found).get(navFieldIdx(k), navFieldTypes(k))
        }
        k += 1 }
      }
      val r = dynBound(v).eval(new org.apache.spark.sql.catalyst.expressions.JoinedRow(
        curIrows(p),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(slots)))
      r != null && r.asInstanceOf[Boolean]
    }

    def conds(grp: IndexedSeq[Row]): Array[Array[Boolean]] =
      Array.tabulate(nVars) { v =>
        val a = new Array[Boolean](grp.length)
        var i = 0
        while (i < grp.length) {
          val x = grp(i).get(condIdx(v))
          a(i) = x != null && x.asInstanceOf[Boolean]
          i += 1
        }
        a
      }

    /** set by tryMatch: end of the last successful match */
    private var matchEnd: Int = -1
    /** set by tryMatch: the attempt touched the end of the input — with more
      * rows appended it might match (or match longer). */
    private var hitEnd: Boolean = false

    /** Try each pattern alternative in declared order; first match wins.
      * hitEnd accumulates across attempted alternatives — an earlier
      * alternative that failed at the frontier could still win with future
      * rows, so the caller must hold even a later alternative's match. */
    private def tryMatch(len: Int, conds: Array[Array[Boolean]], start: Int): Array[Int] = {
      hitEnd = false
      var ai = 0
      while (ai < pats.length) {
        val assign = tryOne(pats(ai), len, conds, start)
        if (assign != null) return assign
        ai += 1
      }
      null
    }

    private def tryOne(pat: Array[(Array[Int], Quant)], len: Int,
        conds: Array[Array[Boolean]], start: Int): Array[Int] = {
      val assign = new Array[Int](len)
      // static variables read the precomputed bit; dynamic ones evaluate
      // against the attempt's partial assignment (rows in [start, p) are
      // recorded in `assign` before any evaluation at p, including during
      // the greedy forward scan below)
      def condAt(v: Int, p: Int): Boolean =
        if (dynBound.isEmpty || dynBound(v) == null) conds(v)(p)
        else dynEval(v, p, assign, start, len)
      def rec(pos: Int, tok: Int): Int = {
        if (tok == pat.length) return pos
        val (alts, q) = pat(tok)
        def altAt(p: Int): Int = {
          var k = 0
          while (k < alts.length) {
            if (condAt(alts(k), p)) return alts(k)
            k += 1
          }
          -1
        }
        // One/Opt BACKTRACK over the variable choice: when a row satisfies
        // both A and B in (A|B), committing to A must not kill a match
        // that only exists under B (a downstream dynamic DEFINE or SKIP TO
        // may depend on which variable the row mapped to) — SQL alternation
        // tries the next alternative on downstream failure. Greedy runs
        // (+/*) keep first-satisfying per row: per-row choice backtracking
        // inside a run is exponential, and the run's variables are
        // interchangeable for the overwhelmingly common static DEFINEs.
        q match {
          case One =>
            if (pos >= len) { hitEnd = true; -1 }
            else {
              var k = 0
              while (k < alts.length) {
                if (condAt(alts(k), pos)) {
                  assign(pos) = alts(k)
                  val r = rec(pos + 1, tok + 1)
                  if (r >= 0) return r
                }
                k += 1
              }
              -1
            }
          case Opt =>
            if (pos >= len) { hitEnd = true; rec(pos, tok + 1) }
            else {
              var k = 0
              while (k < alts.length) {
                if (condAt(alts(k), pos)) {
                  assign(pos) = alts(k)
                  val r = rec(pos + 1, tok + 1)
                  if (r >= 0) return r
                }
                k += 1
              }
              rec(pos, tok + 1)
            }
          case Plus | Star =>
            // greedy forward scan, recording assignments as it extends so a
            // dynamic FIRST/LAST at row p sees the run's prefix; backtracking
            // only shrinks the run, so recorded prefixes stay valid
            var end = pos
            var growing = true
            while (growing && end < len) {
              val v = altAt(end)
              if (v >= 0) { assign(end) = v; end += 1 } else growing = false
            }
            if (end >= len) hitEnd = true // run capped by the frontier
            val minLen = if (q == Plus) 1 else 0
            var runLen = end - pos // greedy: longest run first
            while (runLen >= minLen) {
              val r = rec(pos + runLen, tok + 1)
              if (r >= 0) return r
              runLen -= 1
            }
            -1
        }
      }
      val e = rec(start, 0)
      if (e < 0) null
      else { matchEnd = e; assign }
    }

    private def num(x: Any): Double = x match {
      case null => 0.0
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case o => o.toString.toDouble
    }
    private def ordKey(x: Any): Comparable[Any] = x.asInstanceOf[Comparable[Any]]

    /** One aggregate measure over the rows [start, endBound) assigned to
      * the measure's variable. */
    private def aggValue(grp: IndexedSeq[Row], assign: Array[Int],
        start: Int, endBound: Int, m: Measure): Any = {
      val v = varIdx(m.variable)
      val rowsOfVar = (start until endBound).filter(assign(_) == v)
      m.kind match {
        case "count" => rowsOfVar.size.toLong
        case "first" => rowsOfVar.headOption.map(grp(_).get(fieldIdx(m.field))).orNull
        case "last"  => rowsOfVar.lastOption.map(grp(_).get(fieldIdx(m.field))).orNull
        case "sum" | "avg" =>
          val xs = rowsOfVar.map(r => num(grp(r).get(fieldIdx(m.field))))
          if (xs.isEmpty) null
          else {
            // exact 4-decimal accumulation (matches Spark/DuckDB
            // SUM(CAST(x AS DECIMAL(18,4)))): plain double summation
            // drifts an ULP from any SQL oracle
            val s = xs.map(v => new java.math.BigDecimal(v)
              .setScale(4, java.math.RoundingMode.HALF_UP))
              .reduce(_.add(_))
            if (m.kind == "sum") s.doubleValue()
            else s.doubleValue() / xs.size
          }
        case "min" => if (rowsOfVar.isEmpty) null
          else rowsOfVar.map(grp(_).get(fieldIdx(m.field))).minBy(ordKey)
        case "max" => if (rowsOfVar.isEmpty) null
          else rowsOfVar.map(grp(_).get(fieldIdx(m.field))).maxBy(ordKey)
      }
    }

    private def measureRow(grp: IndexedSeq[Row], assign: Array[Int],
        start: Int, end: Int, mno: Long): Row = {
      val head = grp(start)
      val vals = keyIdx.toSeq.map(head.get) ++
        measures.toSeq.map { m =>
          m.kind match {
            case "match_number" => mno
            case "classifier" =>
              if (end > start) varNames(assign(end - 1)) else null
            case _ => aggValue(grp, assign, start, end, m) // ONE ROW: final
          }
        }
      Row.fromSeq(vals)
    }

    /** Scan rows [ctx, grp.length): emit greedy non-overlapping matches.
      * Rows [0, ctx) are navigation context only (streaming PREV history) —
      * never a match start. `closed = true` (batch / drained key): a match
      * ending exactly at the end emits too. `closed = false` (streaming):
      * matches or failed attempts that touched the frontier stop the scan —
      * `retainFrom` is the first index a future row could still affect.
      * @return (output rows, retainFrom, matchNo after) */
    def scan(grp: IndexedSeq[Row], closed: Boolean, matchNo0: Long,
        ctx: Int = 0): (Seq[Row], Int, Long) = {
      val cs = conds(grp)
      if (hasDyn) {
        curIrows = new Array[org.apache.spark.sql.catalyst.InternalRow](grp.length)
        var k = 0
        while (k < grp.length) {
          curIrows(k) = toCatalyst(grp(k))
            .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          k += 1
        }
      }
      curClosed = closed
      val out = ArrayBuffer.empty[Row]
      var matchNo = matchNo0
      var i = ctx
      var retainFrom = -1
      while (i < grp.length && retainFrom < 0) {
        val assign = tryMatch(grp.length, cs, i)
        if (assign != null) {
          val end = matchEnd
          // a match is FINAL only when NO attempted path touched the
          // frontier: hitEnd accumulates across alternatives tried BEFORE
          // the winner, so "ends before the frontier" is NOT sufficient — a
          // more-preferred alternative that ran out of rows could still
          // complete with future data and must win (PATTERN (A B B | C)
          // with A,B-prefix buffered: emitting C now would contradict the
          // batch result once the final B arrives)
          if (closed || !hitEnd) {
            matchNo += 1
            if (allRows) {
              var j = i
              while (j < end) {
                val jj = j
                out += Row.fromSeq(baseIdx.toSeq.map(grp(jj).get) ++
                  measures.toSeq.map { m =>
                    m.kind match {
                      case "classifier" => varNames(assign(jj))
                      case "match_number" => matchNo
                      case _ =>
                        // RUNNING (Flink's ALL ROWS default): rows up to and
                        // including this one; FINAL: the whole match
                        val bound = if (m.mode == "running") jj + 1 else end
                        aggValue(grp, assign, i, bound, m)
                    }
                  })
                j += 1
              }
            } else out += measureRow(grp, assign, i, end, matchNo)
            // AFTER MATCH SKIP: PAST LAST ROW resumes after the match;
            // TO NEXT ROW re-attempts from the next row (overlapping
            // matches); TO FIRST/LAST v resumes at v's first/last mapped row
            i = skipKind match {
              case 1 => i + 1
              case 2 | 3 =>
                var j = if (skipKind == 2) i else end - 1
                val step = if (skipKind == 2) 1 else -1
                while (j >= i && j < end && assign(j) != skipVar) j += step
                if (j < i || j >= end)
                  throw new IllegalStateException(
                    "AFTER MATCH SKIP TO FIRST/LAST: variable not present in match")
                if (j == i)
                  throw new IllegalStateException(
                    "AFTER MATCH SKIP TO FIRST/LAST would loop: resume row equals the match start")
                j
              case _ => math.max(end, i + 1)
            }
          } else retainFrom = i // boundary match: hold for more data
        } else if (!closed && hitEnd) retainFrom = i // could match later
        else i += 1
      }
      (out.toSeq, if (retainFrom < 0) grp.length else retainFrom, matchNo)
    }
  }

  // ------------------------------------------------------------ operator --

  /** Shared prep: projection + bits; returns (withBits df, kernel, outSchema). */
  private def prepare(
      df: DataFrame,
      partitionBy: Seq[String], orderBy: String,
      defines: Seq[(String, Column)], patterns: Seq[Seq[PatTok]],
      measures: Seq[Measure], navs: Seq[Nav], allRows: Boolean,
      streaming: Boolean, skip: SkipMode = SkipPastLastRow,
      dynNavs: Seq[DynNavSpec] = Nil): (DataFrame, Kernel, StructType) = {

    val varIdx = defines.map(_._1).zipWithIndex.toMap
    require(patterns.nonEmpty && patterns.forall(_.forall(_.vars.forall(varIdx.contains))),
      s"PATTERN variable without DEFINE: ${patterns.flatten.flatMap(_.vars)}")
    if (streaming)
      require(navs.isEmpty,
        "streaming PREV/NEXT must be passed as DynNavSpec (lag/lead columns are batch-only)")

    val measureFields =
      measures.filter(m => !Set("count", "classifier", "match_number")(m.kind))
        .map(_.field).distinct
    // columns the DEFINE predicates read: analyze them against a probe df
    // (nav names dummied to their source field so the probe type-checks; the
    // real lag/lead columns are built post-sort, dynamic slots at match time)
    val navNames = navs.map(_.name).toSet ++ dynNavs.map(_.name)
    val probe = (navs.map(nv => nv.name -> nv.field) ++
        dynNavs.map(nv => nv.name -> nv.field))
      .foldLeft(df)((d, nv) => d.withColumn(nv._1, col(nv._2)))
    val defineRefs = probe.select(defines.map(_._2): _*)
      .queryExecution.analyzed.expressions
      .flatMap(_.references.map(_.name))
      .distinct.filterNot(navNames).filter(df.columns.contains)
    // a DEFINE is dynamic iff it references any match-state nav slot; the
    // per-define slot sets also become the kernel's navMask
    val dynNames = dynNavs.map(_.name).toSet
    val defineDynRefs: IndexedSeq[Set[String]] =
      if (dynNavs.isEmpty) IndexedSeq.fill(defines.size)(Set.empty[String])
      else defines.toIndexedSeq.map { case (_, c) =>
        probe.select(c).queryExecution.analyzed.expressions
          .flatMap(_.references.map(_.name)).toSet.intersect(dynNames)
      }
    val isDyn: IndexedSeq[Boolean] = defineDynRefs.map(_.nonEmpty)
    val baseCols =
      if (allRows) df.columns.toSeq
      else ((partitionBy :+ orderBy) ++ measureFields ++ navs.map(_.field) ++
        dynNavs.map(_.field) ++ defineRefs).distinct
    val projected = df.select(baseCols.map(col): _*)

    val sorted =
      if (streaming) projected // grouping/ordering happens in the state fn
      else projected
        .repartition(partitionBy.map(col): _*)
        .sortWithinPartitions((partitionBy :+ orderBy).map(col): _*)

    // PREV/NEXT navigation: lag/lead over the SAME (key, order) — the window
    // reuses the exchange+sort above (no new shuffle); then the DEFINE
    // predicates collapse to codegen'd boolean bits
    val navSpec = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderBy))
    val withNav = navs.foldLeft(sorted) { (d, nv) =>
      d.withColumn(nv.name,
        (if (nv.fn == "next") lead(col(nv.field), nv.offset)
         else lag(col(nv.field), nv.offset)).over(navSpec))
    }
    // dynamic DEFINEs get a placeholder bit (never read) — their predicate
    // is bound below and evaluated by the kernel at match time
    val withBits = withNav.select(
      baseCols.map(col) ++
        defines.zipWithIndex.map { case ((_, c), i) =>
          (if (isDyn(i)) lit(false) else c).as(s"__c_$i")
        }: _*)

    val inSchema = withBits.schema
    val measureFieldIdx = measureFields.map(f => f -> inSchema.fieldIndex(f)).toMap
    def measureType(m: Measure): DataType = m.kind match {
      case "count" | "match_number" => LongType
      case "classifier" => StringType
      case "avg" | "sum" => DoubleType
      case _ => inSchema(measureFieldIdx(m.field)).dataType
    }
    val outSchema =
      if (allRows) StructType(
        baseCols.map(c => inSchema(inSchema.fieldIndex(c))) ++
          measures.map(m => StructField(m.alias, measureType(m), nullable = true)))
      else StructType(
        partitionBy.map(inSchema(_)) ++
          measures.map(m => StructField(m.alias, measureType(m), nullable = true)))

    // bind dynamic DEFINE predicates against (row schema ++ nav slots):
    // AttributeReferences become positional BoundReferences, so the kernel
    // evaluates them with a JoinedRow(input row, nav slot row) — no
    // per-evaluation analysis, and the Expression tree ships to executors
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Expression}
    val dynBound: Array[Expression] =
      if (!isDyn.contains(true)) Array.empty
      else {
        val navFields = dynNavs.map(nv =>
          StructField(nv.name, inSchema(inSchema.fieldIndex(nv.field)).dataType, nullable = true))
        val extSchema = StructType(inSchema.fields ++ navFields)
        val nameToIdx = extSchema.fieldNames.zipWithIndex.toMap
        val dummy = df.sparkSession.createDataFrame(
          java.util.Collections.emptyList[Row](), extSchema)
        defines.zipWithIndex.map { case ((_, c), i) =>
          if (!isDyn(i)) null
          else {
            val analyzed = dummy.select(c.cast("boolean")).queryExecution.analyzed
            val e = analyzed.expressions.head match {
              case a: Alias => a.child
              case other => other
            }
            e.transform {
              case a: AttributeReference =>
                BoundReference(nameToIdx(a.name), a.dataType, a.nullable)
            }
          }
        }.toArray
      }

    val kernel = new Kernel(
      pats = patterns.map(_.map(t => (t.vars.map(varIdx).toArray, t.quant)).toArray).toArray,
      nVars = defines.size,
      condIdx = defines.indices.map(i => inSchema.fieldIndex(s"__c_$i")).toArray,
      keyIdx = partitionBy.map(inSchema.fieldIndex).toArray,
      baseIdx = baseCols.map(inSchema.fieldIndex).toArray,
      varNames = defines.map(_._1).toArray,
      measures = measures.toArray,
      varIdx = varIdx,
      fieldIdx = measureFieldIdx,
      allRows = allRows,
      skipKind = skip match {
        case SkipPastLastRow => 0
        case SkipToNextRow => 1
        case SkipToFirst(_) => 2
        case SkipToLast(_) => 3
      },
      skipVar = skip match {
        case SkipToFirst(v) => varIdx.getOrElse(v, throw new IllegalArgumentException(
          s"SKIP TO FIRST $v: no such pattern variable"))
        case SkipToLast(v) => varIdx.getOrElse(v, throw new IllegalArgumentException(
          s"SKIP TO LAST $v: no such pattern variable"))
        case _ => -1
      },
      dynBound = dynBound,
      navKinds = dynNavs.map(nv => nv.kind match {
        case "prev" => 0; case "next" => 1; case "first" => 2; case _ => 3
      }).toArray,
      navVars = dynNavs.map(nv =>
        if (nv.kind == "first" || nv.kind == "last")
          varIdx.getOrElse(nv.variable, throw new IllegalArgumentException(
            s"${nv.kind.toUpperCase}(${nv.variable}.${nv.field}): no such pattern variable"))
        else -1).toArray,
      navFieldIdx = dynNavs.map(nv => inSchema.fieldIndex(nv.field)).toArray,
      navFieldTypes = dynNavs.map(nv =>
        inSchema(inSchema.fieldIndex(nv.field)).dataType).toArray,
      navOffs = dynNavs.map(_.offset).toArray,
      navMask = defineDynRefs.map(refs => dynNavs.map(nv => refs(nv.name)).toArray).toArray,
      rowSchema = inSchema)
    (withBits, kernel, outSchema)
  }

  def matchRecognize(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: String,
      defines: Seq[(String, Column)],
      pattern: Seq[PatTok],
      measures: Seq[Measure],
      navs: Seq[Nav] = Nil,
      allRows: Boolean = false,
      altPatterns: Seq[Seq[PatTok]] = Nil,
      skip: SkipMode = SkipPastLastRow,
      defineNavs: Seq[DynNavSpec] = Nil): DataFrame = {

    val (withBits, kernel, outSchema) =
      prepare(df, partitionBy, orderBy, defines, pattern +: altPatterns, measures,
        navs, allRows, streaming = false, skip = skip, dynNavs = defineNavs)
    val keyIdx = partitionBy.map(withBits.schema.fieldIndex)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)

    val out = withBits.mapPartitions { rows =>
      new Iterator[Row] {
        val it = rows.buffered
        var pending: Iterator[Row] = Iterator.empty
        def sameKey(a: Row, b: Row): Boolean = keyIdx.forall(i => a.get(i) == b.get(i))
        def advance(): Unit = {
          while (!pending.hasNext && it.hasNext) {
            val grp = ArrayBuffer(it.next())
            while (it.hasNext && sameKey(grp.head, it.head)) grp += it.next()
            pending = kernel.scan(grp.toIndexedSeq, closed = true, 0L)._1.iterator
          }
        }
        def hasNext: Boolean = { advance(); pending.hasNext }
        def next(): Row = { advance(); pending.next() }
      }
    }(enc)

    out.toDF()
  }

  // ----------------------------------------------------------- streaming --

  /** Versioned envelope for the streaming operator's per-key state. The
    * version field exists so a future format change can MIGRATE in place;
    * checkpoints from the unversioned tuple formats (v1 `(rows, matchNo)`,
    * v2 `(rows, matchNo, ctxLen)`) cannot — restoring one raises a clear
    * restart-from-fresh-checkpoint error instead of an opaque
    * ClassCastException deep in the state store. */
  final case class CepState(
      version: Int, rows: Array[Row], matchNo: Long, ctxLen: Int)
  private val CepStateVersion = 3

  /** Streaming MATCH_RECOGNIZE: the same kernel inside
    * `flatMapGroupsWithState` with event-time timeouts. `orderBy` must be
    * the event-time column; the input must carry a watermark (bindings with
    * a WATERMARK DDL clause do; otherwise pass `watermarkDelay`). Matches
    * emit exactly once, when the watermark passes their last row.
    *
    * All four AFTER MATCH SKIP modes run on this path. The overlapping
    * modes (TO NEXT ROW, TO FIRST/LAST v) resume the scan INSIDE emitted
    * matches; that is a kernel position, so retention is unchanged — rows
    * from the first unfinished attempt onward are held, and every attempt
    * before it (overlapping or not) has already been resolved exactly.
    *
    * State is the versioned [[CepState]] envelope — a checkpoint written by
    * the pre-envelope tuple formats does not restore; restart such queries
    * from a fresh checkpointLocation (the failure says so).
    *
    * Greedy pending-tail semantics (CepFuzzSpec, r11): a match attempt
    * whose greedy quantifier could still extend — e.g. `B+` with the key's
    * last seen row matching B — is HELD, not emitted: a future row (above
    * the watermark by definition) may lengthen it, so emission would be
    * speculative. The attempt resolves when a deciding row arrives (one
    * that fails the quantifier's variable, or completes the tail). Flink
    * rejects greedy-tail patterns on streams outright for this reason;
    * here they run, with matches closed by data, never by time. On
    * sentinel-terminated inputs (every key's data ends in rows matching no
    * variable) stream output is bit-identical to the batch kernel — fuzzed
    * across random patterns in CepFuzzSpec. */
  def matchRecognizeStream(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: String,
      defines: Seq[(String, Column)],
      pattern: Seq[PatTok],
      measures: Seq[Measure],
      watermarkDelay: Option[String] = None,
      allRows: Boolean = false,
      altPatterns: Seq[Seq[PatTok]] = Nil,
      defineNavs: Seq[DynNavSpec] = Nil,
      skip: SkipMode = SkipPastLastRow): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val watermarked = watermarkDelay match {
      case Some(d) => df.withColumn(orderBy, col(orderBy).cast("timestamp"))
        .withWatermark(orderBy, d)
      case None => df
    }
    val (withBits, kernel, outSchema) =
      prepare(watermarked, partitionBy, orderBy, defines, pattern +: altPatterns,
        measures, Nil, allRows, streaming = true, skip = skip, dynNavs = defineNavs)
    // PREV references need history: retain up to maxPrev rows before the
    // scan resume point as navigation-only context (never a match start)
    val maxPrev = defineNavs.collect { case nv if nv.kind == "prev" => nv.offset }
      .maxOption.getOrElse(0)
    val schema = withBits.schema
    val keyIdx = partitionBy.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(orderBy)
    val rowEnc = org.apache.spark.sql.Encoders.row(schema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    // state: buffered rows + match counter + leading context-row count,
    // inside the versioned envelope
    val stateEnc = org.apache.spark.sql.Encoders.javaSerialization[CepState]

    def tsMillis(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case l: Long => l
      case other => throw new IllegalArgumentException(s"not an event time: $other")
    }

    val grouped = withBits.as(rowEnc)
      .groupByKey(StateKeys.encoder(withBits.schema, partitionBy))(
        org.apache.spark.sql.Encoders.STRING)

    val out = grouped.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (_: String, rows: Iterator[Row], state: GroupState[CepState]) => {
        // the java-serialization blob of a pre-envelope checkpoint
        // deserializes to a Tuple, and the first field access throws CCE —
        // surface the documented guidance instead of the raw cast failure
        val restored = try {
          state.getOption.map(s =>
            if (s.version == CepStateVersion) s
            else throw new IllegalStateException(
              s"streaming MATCH_RECOGNIZE state version ${s.version} found, " +
                s"expected $CepStateVersion — this checkpoint was written by " +
                "an incompatible release; restart from a fresh checkpointLocation"))
        } catch {
          case cce: ClassCastException => throw new IllegalStateException(
            "streaming MATCH_RECOGNIZE state predates the versioned CepState " +
              "envelope (the old (rows, matchNo[, ctxLen]) tuple format) and " +
              "cannot be restored — restart from a fresh checkpointLocation", cce)
        }
        val CepState(_, held, matchNo0, ctx0) =
          restored.getOrElse(CepState(CepStateVersion, Array.empty[Row], 0L, 0))
        // new rows pass the late filter (ts >= watermark) while context rows
        // are strictly below it, so appending + sorting keeps ctx a prefix
        val buf = (held ++ rows).sortBy(tsMillis)
        val wm = state.getCurrentWatermarkMs()
        // STRICTLY below the watermark: Spark's late filter admits rows at
        // exactly the watermark, so ts == wm is not immutable yet
        val matureLen = buf.count(tsMillis(_) < wm) // sorted → prefix
        val mature = buf.take(matureLen).toIndexedSeq
        val (emitted, retainFrom, matchNo) =
          kernel.scan(mature, closed = false, matchNo0, ctx = ctx0)
        val dropFrom = math.max(retainFrom - maxPrev, 0)
        val kept = buf.drop(dropFrom)
        state.update(CepState(CepStateVersion, kept, matchNo, retainFrom - dropFrom))
        // wake up when the watermark moves, so held matches drain even if
        // the key receives no more input; fully-drained keys go dormant (a
        // counter-sized entry, no timer — Flink keeps per-key NFA state the
        // same way absent a state TTL). Context-only leftovers don't count
        // as pending work.
        if (!state.hasTimedOut || kept.length > retainFrom - dropFrom)
          state.setTimeoutTimestamp(wm + 1000)
        emitted.iterator
      })(stateEnc, outEnc)

    out.toDF()
  }

  // ------------------------------------------------------------ SQL form --

  private val MrRegex =
    ("""(?is)SELECT\s+\*\s+FROM\s+([\w.`]+)\s+MATCH_RECOGNIZE\s*\(\s*""" +
      """PARTITION\s+BY\s+([\w.`,\s]+?)\s+ORDER\s+BY\s+([\w.`]+)\s+""" +
      """MEASURES\s+(.*?)\s+(ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH\s+""" +
      """AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|TO\s+(?:FIRST|LAST)\s+\w+)\s+""" +
      """PATTERN\s*\(\s*(.*?)\s*\)\s+""" +
      // trailing derived-table alias `) AS m` / `) m` is standard SQL and
      // appears throughout the reference corpus; SELECT * output is
      // identical with or without it, so it parses and is ignored
      """DEFINE\s+(.*?)\s*\)\s*(?:(?:AS\s+)?\w+\s*)?$""").r

  /** Does this statement use MATCH_RECOGNIZE? */
  def isMatchRecognize(sql: String): Boolean =
    sql.toUpperCase.contains("MATCH_RECOGNIZE")

  private val MeasureRe =
    """(?i)(?:(RUNNING|FINAL)\s+)?(FIRST|LAST|MIN|MAX|SUM|AVG|COUNT)\s*\(\s*(\w+)\.(\w+|\*)\s*\)\s+AS\s+(\w+)""".r
  private val IntroRe =
    """(?i)(CLASSIFIER|MATCH_NUMBER)\s*\(\s*\)\s+AS\s+(\w+)""".r
  private val NavRe =
    """(?i)\b(PREV|NEXT|FIRST|LAST)\s*\(\s*(\w+)\.(\w+)(?:\s*,\s*(\d+))?\s*\)""".r

  /** Split a MEASURES/DEFINE list on top-level commas — paren-depth aware (a
    * regex lookahead mis-splits on nested calls like COALESCE(f(x), g(y)))
    * AND quote-aware (a literal like 'x,y' or a backticked name must not
    * split or shift depth). */
  private def splitTop(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\'' | '`' =>
          val q = c
          cur += c; i += 1
          while (i < s.length && s.charAt(i) != q) { cur += s.charAt(i); i += 1 }
          if (i < s.length) { cur += q; i += 1 }
        case '(' => depth += 1; cur += c; i += 1
        case ')' => depth -= 1; cur += c; i += 1
        case ',' if depth == 0 => out += cur.toString; cur.clear(); i += 1
        case other => cur += other; i += 1
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Run the SQL form against a registered table (streaming tables route to
    * the stateful streaming operator). */
  def sql(spark: org.apache.spark.sql.SparkSession, stmt: String): DataFrame = {
    val m = MrRegex.findFirstMatchIn(stmt.trim.stripSuffix(";"))
      .getOrElse(throw new IllegalArgumentException(
        "Unsupported MATCH_RECOGNIZE form; supported subset: PARTITION BY / ORDER BY / " +
          "MEASURES agg(V.f)|CLASSIFIER()|MATCH_NUMBER() AS a / ONE|ALL ROW(S) PER MATCH / " +
          "AFTER MATCH SKIP PAST LAST ROW / PATTERN (concat of vars or (A|B) groups " +
          "with + * ?) / DEFINE V AS predicate (PREV/NEXT supported)"))
    val table = m.group(1)
    val partitionBy = m.group(2).split(",").map(_.trim).toSeq
    val orderBy = m.group(3).trim
    val allRows = m.group(5).equalsIgnoreCase("ALL ROWS")
    // parse the MEASURES list item-by-item so output columns keep the
    // declared order (aggregates and CLASSIFIER/MATCH_NUMBER may interleave)
    val measures = splitTop(m.group(4)).map { item =>
      // matches must CONSUME the whole item — a partial regex hit on e.g.
      // `LAST(a.p) - FIRST(a.p) AS delta` would alias the fragment wrong,
      // and an unmatched item must not silently vanish from the schema
      MeasureRe.findFirstMatchIn(item).filter(_.matched.trim == item.trim).map { mm =>
        // Flink defaults: RUNNING in ALL ROWS mode, FINAL in ONE ROW mode
        val mode = Option(mm.group(1)).map(_.toLowerCase)
          .getOrElse(if (allRows) "running" else "final")
        Measure(mm.group(5), mm.group(2).toLowerCase, mm.group(3), mm.group(4), mode)
      }.orElse(IntroRe.findFirstMatchIn(item).filter(_.matched.trim == item.trim).map { mm =>
        Measure(mm.group(2), mm.group(1).toLowerCase, "", "")
      }).getOrElse(throw new IllegalArgumentException(
        s"unsupported MEASURES item '$item' — supported: [RUNNING|FINAL] " +
          "FIRST/LAST/MIN/MAX/SUM/AVG/COUNT(var.field|var.*) AS alias, " +
          "CLASSIFIER() AS alias, MATCH_NUMBER() AS alias"))
    }
    val skip: SkipMode = m.group(6).toUpperCase.replaceAll("\\s+", " ") match {
      case "PAST LAST ROW" => SkipPastLastRow
      case "TO NEXT ROW" => SkipToNextRow
      case s if s.startsWith("TO FIRST ") => SkipToFirst(m.group(6).trim.split("\\s+").last)
      case s if s.startsWith("TO LAST ") => SkipToLast(m.group(6).trim.split("\\s+").last)
    }
    val patternAlts = parseAlternatives(m.group(7))
    val pattern = patternAlts.head

    val input = spark.table(table)
    val streaming = input.isStreaming

    // navigation in DEFINE. PREV/NEXT are position-based (previous/next INPUT
    // row, whatever matched — Flink semantics); FIRST/LAST walk the rows
    // mapped to a variable in the current match attempt. Routing per define:
    //  - batch, PREV/NEXT only → lag/lead columns (codegen, zero extra
    //    shuffle: the window reuses the operator's own exchange+sort);
    //  - FIRST/LAST anywhere, or any navigation on the streaming path →
    //    match-state slots evaluated by the kernel (DynNavSpec).
    val navs = ArrayBuffer.empty[Nav]
    val dynNavs = ArrayBuffer.empty[DynNavSpec]
    val defined = splitTop(m.group(8)).map { d =>
      val Array(v, cond0) = d.split("(?i)\\s+AS\\s+", 2)
      val variable = v.trim
      val local = ArrayBuffer.empty[DynNavSpec]
      val navRewritten = NavRe.replaceAllIn(cond0.trim, mm => {
        val fn = mm.group(1).toLowerCase
        val navVar = mm.group(2)
        val field = mm.group(3)
        val off = Option(mm.group(4)).map(_.toInt)
          .getOrElse(if (fn == "prev" || fn == "next") 1 else 0)
        val name = s"__nav_${fn}_${navVar}_${field}_$off"
        if (!local.exists(_.name == name)) local += DynNavSpec(name, fn, navVar, field, off)
        name
      })
      val dynamic = streaming ||
        local.exists(nv => nv.kind == "first" || nv.kind == "last")
      local.foreach { nv =>
        if (dynamic) { if (!dynNavs.exists(_.name == nv.name)) dynNavs += nv }
        else if (!navs.exists(_.name == nv.name)) navs += Nav(nv.name, nv.kind, nv.field, nv.offset)
      }
      // own-row predicate: strip the variable prefix (A.price → price)
      variable -> expr(navRewritten.replaceAll(s"(?i)\\b$variable\\.", ""))
    }
    // pattern variables without a DEFINE are always-true (Flink semantics);
    // collect them across ALL alternatives, not just the first
    val undefinedVars = patternAlts.flatten.flatMap(_.vars).distinct
      .filterNot(v => defined.exists(_._1.equalsIgnoreCase(v)))
    val defines = defined ++ undefinedVars.map(_ -> lit(true))

    if (streaming)
      matchRecognizeStream(input, partitionBy, orderBy, defines, pattern, measures,
        watermarkDelay = None, allRows = allRows, altPatterns = patternAlts.tail,
        defineNavs = dynNavs.toSeq, skip = skip)
    else
      matchRecognize(input, partitionBy, orderBy, defines, pattern,
        measures, navs.toSeq, allRows, altPatterns = patternAlts.tail,
        skip = skip, defineNavs = dynNavs.toSeq)
  }
}
