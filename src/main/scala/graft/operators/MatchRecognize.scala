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
  *   AFTER MATCH SKIP PAST LAST ROW
  *   PATTERN: concatenation of variables or alternation groups (A|B), each
  *            with quantifiers + * ?  (greedy)
  *   DEFINE V AS <predicate over V's own row, PREV(x.f[,n]) / NEXT(x.f[,n])>
  *   (pattern variables without a DEFINE are always-true, as in Flink)
  *
  * Execution model (100 TB-ready):
  *  - DEFINE predicates are evaluated by CATALYST as projected boolean
  *    columns — codegen'd, pushdown-friendly; the NFA only ever sees bits;
  *  - PREV/NEXT navigation becomes lag/lead window columns computed AFTER the
  *    operator's own repartition+sort on the same keys, so Catalyst reuses
  *    the exchange and sort — navigation costs zero extra shuffles;
  *  - rows are hash-partitioned on the PARTITION BY key and secondary-sorted
  *    (repartition + sortWithinPartitions), then a single mapPartitions pass
  *    runs the backtracking matcher per key-run — the classic
  *    secondary-sort pattern: one shuffle, streaming within partitions,
  *    memory bounded by the largest single key's row count (same bound as
  *    Flink's keyed CEP state).
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
    * classifier | match_number */
  final case class Measure(alias: String, kind: String, variable: String, field: String)

  /** PREV/NEXT navigation used by a DEFINE predicate: the predicate text
    * references `name`, which materializes as lag/lead(field, offset). */
  final case class Nav(name: String, fn: String, field: String, offset: Int)

  private def quantOf(q: String): Quant = q match {
    case "+" => Plus
    case "*" => Star
    case "?" => Opt
    case _   => One
  }

  private val TokRe =
    """\(\s*(\w+(?:\s*\|\s*\w+)*)\s*\)\s*([+*?])?|(\w+)\s*([+*?])?""".r

  /** Parse "A+ (B|C)* D?" into tokens. */
  def parsePattern(p: String): Seq[PatTok] =
    TokRe.findAllMatchIn(p).map { m =>
      if (m.group(1) != null)
        PatTok(m.group(1).split("\\|").map(_.trim).toSeq,
          quantOf(Option(m.group(2)).getOrElse("")))
      else
        PatTok(Seq(m.group(3)), quantOf(Option(m.group(4)).getOrElse("")))
    }.toSeq

  def matchRecognize(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: String,
      defines: Seq[(String, Column)],
      pattern: Seq[PatTok],
      measures: Seq[Measure],
      navs: Seq[Nav] = Nil,
      allRows: Boolean = false): DataFrame = {

    val varIdx = defines.map(_._1).zipWithIndex.toMap
    require(pattern.forall(_.vars.forall(varIdx.contains)),
      s"PATTERN variable without DEFINE: ${pattern.flatMap(_.vars)}")
    if (allRows)
      require(measures.forall(m => m.kind == "classifier" || m.kind == "match_number"),
        "ALL ROWS PER MATCH supports CLASSIFIER()/MATCH_NUMBER() measures")

    // 1. project the needed columns (all of them in ALL ROWS mode — the
    //    match emits the input rows themselves)
    val measureFields =
      measures.filter(m => !Set("count", "classifier", "match_number")(m.kind))
        .map(_.field).distinct
    // columns the DEFINE predicates read: analyze them against a probe df
    // (nav names dummied to their source field so the probe type-checks; the
    // real lag/lead columns are built post-sort)
    val navNames = navs.map(_.name).toSet
    val probe = navs.foldLeft(df)((d, nv) => d.withColumn(nv.name, col(nv.field)))
    val defineRefs = probe.select(defines.map(_._2): _*)
      .queryExecution.analyzed.expressions
      .flatMap(_.references.map(_.name))
      .distinct.filterNot(navNames).filter(df.columns.contains)
    val baseCols =
      if (allRows) df.columns.toSeq
      else ((partitionBy :+ orderBy) ++ measureFields ++ navs.map(_.field) ++ defineRefs).distinct
    val projected = df.select(baseCols.map(col): _*)

    // 2. one shuffle + in-partition sort (secondary sort)
    val sorted = projected
      .repartition(partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy :+ orderBy).map(col): _*)

    // 3. PREV/NEXT navigation: lag/lead over the SAME (key, order) — the
    //    window reuses the exchange+sort above (no new shuffle); then the
    //    DEFINE predicates collapse to codegen'd boolean bits
    val navSpec = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(orderBy))
    val withNav = navs.foldLeft(sorted) { (d, nv) =>
      d.withColumn(nv.name,
        (if (nv.fn == "next") lead(col(nv.field), nv.offset)
         else lag(col(nv.field), nv.offset)).over(navSpec))
    }
    val withBits = withNav.select(
      baseCols.map(col) ++
        defines.zipWithIndex.map { case ((_, c), i) => c.as(s"__c_$i") }: _*)

    val inSchema = withBits.schema
    val keyIdx = partitionBy.map(inSchema.fieldIndex)
    val condIdx = defines.indices.map(i => inSchema.fieldIndex(s"__c_$i"))
    val fieldIdx = measureFields.map(f => f -> inSchema.fieldIndex(f)).toMap
    val baseIdx = baseCols.map(inSchema.fieldIndex)
    val varNames = defines.map(_._1).toArray

    def measureType(m: Measure): DataType = m.kind match {
      case "count" | "match_number" => LongType
      case "classifier" => StringType
      case "avg" | "sum" => DoubleType
      case _ => inSchema(fieldIdx(m.field)).dataType
    }
    val outSchema =
      if (allRows) StructType(
        baseCols.map(c => inSchema(inSchema.fieldIndex(c))) ++
          measures.map(m => StructField(m.alias, measureType(m), nullable = true)))
      else StructType(
        partitionBy.map(inSchema(_)) ++
          measures.map(m => StructField(m.alias, measureType(m), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pat: Array[(Array[Int], Quant)] =
      pattern.map(t => (t.vars.map(varIdx).toArray, t.quant)).toArray
    val nVars = defines.size

    val out = withBits.mapPartitions { rows =>
      new Iterator[Row] {
        val it = rows.buffered
        var pending: Iterator[Row] = Iterator.empty

        def sameKey(a: Row, b: Row): Boolean = keyIdx.forall(i => a.get(i) == b.get(i))

        /** Backtracking matcher: fills `assign` with the matched variable per
          * consumed row for the greedy match starting at `start`; returns the
          * end position via `matchEnd`, or null if no match. */
        def tryMatch(grp: ArrayBuffer[Row], conds: Array[Array[Boolean]], start: Int): Array[Int] = {
          val assign = new Array[Int](grp.length)
          def rec(pos: Int, tok: Int): Int = {
            if (tok == pat.length) return pos
            val (alts, q) = pat(tok)
            // first alternative whose predicate holds at a row wins that row
            def altAt(p: Int): Int = {
              var k = 0
              while (k < alts.length) {
                if (conds(alts(k))(p)) return alts(k)
                k += 1
              }
              -1
            }
            q match {
              case One =>
                if (pos < grp.length) {
                  val v = altAt(pos)
                  if (v >= 0) { assign(pos) = v; rec(pos + 1, tok + 1) } else -1
                } else -1
              case Opt =>
                if (pos < grp.length && altAt(pos) >= 0) {
                  assign(pos) = altAt(pos)
                  val r = rec(pos + 1, tok + 1)
                  if (r >= 0) r else rec(pos, tok + 1)
                } else rec(pos, tok + 1)
              case Plus | Star =>
                var end = pos
                while (end < grp.length && altAt(end) >= 0) end += 1
                val minLen = if (q == Plus) 1 else 0
                var len = end - pos // greedy: longest run first
                while (len >= minLen) {
                  var i = pos
                  while (i < pos + len) { assign(i) = altAt(i); i += 1 }
                  val r = rec(pos + len, tok + 1)
                  if (r >= 0) return r
                  len -= 1
                }
                -1
            }
          }
          val e = rec(start, 0)
          if (e < 0) null
          else {
            // mark rows outside [start, e) as unassigned
            val res = new Array[Int](grp.length)
            java.util.Arrays.fill(res, -1)
            var i = start
            while (i < e) { res(i) = assign(i); i += 1 }
            matchEnd = e
            res
          }
        }
        var matchEnd: Int = -1

        def emit(grp: ArrayBuffer[Row]): Iterator[Row] = {
          val conds = Array.tabulate(nVars) { v =>
            val a = new Array[Boolean](grp.length)
            var i = 0
            while (i < grp.length) {
              val x = grp(i).get(condIdx(v))
              a(i) = x != null && x.asInstanceOf[Boolean]
              i += 1
            }
            a
          }
          val results = ArrayBuffer.empty[Row]
          var matchNo = 0L
          var i = 0
          while (i < grp.length) {
            val assign = tryMatch(grp, conds, i)
            if (assign == null) i += 1
            else {
              val end = matchEnd
              matchNo += 1
              if (allRows) {
                var j = i
                while (j < end) {
                  if (assign(j) >= 0) {
                    val mno = matchNo
                    val vals = baseIdx.map(grp(j).get) ++ measures.map { m =>
                      m.kind match {
                        case "classifier" => varNames(assign(j))
                        case "match_number" => mno
                      }
                    }
                    results += Row.fromSeq(vals)
                  }
                  j += 1
                }
              } else {
                val head = grp(i)
                val mno = matchNo
                val vals = partitionBy.indices.map(j => head.get(keyIdx(j))) ++
                  measures.map { m =>
                    lazy val v = varIdx(m.variable)
                    lazy val rowsOfVar = (i until end).filter(assign(_) == v)
                    m.kind match {
                      case "match_number" => mno
                      case "classifier" =>
                        if (end > i && assign(end - 1) >= 0) varNames(assign(end - 1)) else null
                      case "count" => rowsOfVar.size.toLong
                      case "first" => rowsOfVar.headOption.map(grp(_).get(fieldIdx(m.field))).orNull
                      case "last"  => rowsOfVar.lastOption.map(grp(_).get(fieldIdx(m.field))).orNull
                      case "sum" | "avg" =>
                        val xs = rowsOfVar.map(r => num(grp(r).get(fieldIdx(m.field))))
                        if (xs.isEmpty) null
                        else {
                          // exact 4-decimal accumulation (matches Spark/DuckDB
                          // SUM(CAST(x AS DECIMAL(18,4)))): plain double
                          // summation drifts an ULP from any SQL oracle
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
                results += Row.fromSeq(vals)
              }
              i = math.max(end, i + 1) // AFTER MATCH SKIP PAST LAST ROW
            }
          }
          results.iterator
        }

        def num(x: Any): Double = x match {
          case null => 0.0
          case d: Double => d
          case f: Float => f.toDouble
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case d: java.math.BigDecimal => d.doubleValue()
          case o => o.toString.toDouble
        }
        def ordKey(x: Any): Comparable[Any] = x.asInstanceOf[Comparable[Any]]

        def advance(): Unit = {
          while (!pending.hasNext && it.hasNext) {
            val grp = ArrayBuffer(it.next())
            while (it.hasNext && sameKey(grp.head, it.head)) grp += it.next()
            pending = emit(grp)
          }
        }
        def hasNext: Boolean = { advance(); pending.hasNext }
        def next(): Row = { advance(); pending.next() }
      }
    }(enc)

    out.toDF()
  }

  // ------------------------------------------------------------ SQL form --

  private val MrRegex =
    ("""(?is)SELECT\s+\*\s+FROM\s+([\w.`]+)\s+MATCH_RECOGNIZE\s*\(\s*""" +
      """PARTITION\s+BY\s+([\w.`,\s]+?)\s+ORDER\s+BY\s+([\w.`]+)\s+""" +
      """MEASURES\s+(.*?)\s+(ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH\s+""" +
      """AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW\s+""" +
      """PATTERN\s*\(\s*(.*?)\s*\)\s+""" +
      """DEFINE\s+(.*?)\s*\)\s*$""").r

  /** Does this statement use MATCH_RECOGNIZE? */
  def isMatchRecognize(sql: String): Boolean =
    sql.toUpperCase.contains("MATCH_RECOGNIZE")

  private val MeasureRe =
    """(?i)(FIRST|LAST|MIN|MAX|SUM|AVG|COUNT)\s*\(\s*(\w+)\.(\w+|\*)\s*\)\s+AS\s+(\w+)""".r
  private val IntroRe =
    """(?i)(CLASSIFIER|MATCH_NUMBER)\s*\(\s*\)\s+AS\s+(\w+)""".r
  private val NavRe =
    """(?i)\b(PREV|NEXT)\s*\(\s*(\w+)\.(\w+)(?:\s*,\s*(\d+))?\s*\)""".r

  /** Run the SQL form against a registered table. */
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
    val measures =
      MeasureRe.findAllMatchIn(m.group(4)).map { mm =>
        Measure(mm.group(4), mm.group(1).toLowerCase, mm.group(2), mm.group(3))
      }.toSeq ++
        IntroRe.findAllMatchIn(m.group(4)).map { mm =>
          Measure(mm.group(2), mm.group(1).toLowerCase, "", "")
        }.toSeq
    val pattern = parsePattern(m.group(6))

    // PREV/NEXT in DEFINE → named lag/lead navigation columns (position-based
    // in Flink too: PREV(B.f) is the previous INPUT row's f, whatever matched)
    val navs = ArrayBuffer.empty[Nav]
    def rewriteNav(cond: String): String = NavRe.replaceAllIn(cond, mm => {
      val fn = mm.group(1).toLowerCase
      val field = mm.group(3)
      val off = Option(mm.group(4)).map(_.toInt).getOrElse(1)
      val name = s"__${fn}_${field}_$off"
      if (!navs.exists(_.name == name)) navs += Nav(name, fn, field, off)
      name
    })

    val defined = m.group(7).split(",(?![^()]*\\))").toSeq.map { d =>
      val Array(v, cond) = d.split("(?i)\\s+AS\\s+", 2)
      val variable = v.trim
      // own-row predicate: strip the variable prefix (A.price → price)
      val c = rewriteNav(cond.trim).replaceAll(s"(?i)\\b$variable\\.", "")
      variable -> expr(c)
    }
    // pattern variables without a DEFINE are always-true (Flink semantics)
    val undefinedVars = pattern.flatMap(_.vars).distinct
      .filterNot(v => defined.exists(_._1.equalsIgnoreCase(v)))
    val defines = defined ++ undefinedVars.map(_ -> lit(true))

    matchRecognize(spark.table(table), partitionBy, orderBy, defines, pattern,
      measures, navs.toSeq, allRows)
  }
}
