package graft.operators

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MATCH_RECOGNIZE (CEP) — reference test/syntax-test.fsql:465-482, grammar
  * syntaxes/flink.tmLanguage.json:363-367. Spark has no counterpart
  * (SURVEY.md §2.9), so this is a custom operator.
  *
  * Supported subset (exactly the corpus shape):
  *   PARTITION BY cols / ORDER BY col
  *   MEASURES FIRST/LAST(V.field), MIN/MAX/SUM/AVG(V.field), COUNT(V.*)
  *   ONE ROW PER MATCH / AFTER MATCH SKIP PAST LAST ROW
  *   PATTERN over concatenation with quantifiers + * ?  (greedy)
  *   DEFINE V AS <predicate over V's own row>
  *
  * Execution model (100 TB-ready):
  *  - DEFINE predicates are evaluated by CATALYST as projected boolean
  *    columns — codegen'd, pushdown-friendly; the NFA only ever sees bits;
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
  final case class PatTok(variable: String, quant: Quant)

  /** measure kinds: first | last | min | max | sum | avg | count */
  final case class Measure(alias: String, kind: String, variable: String, field: String)

  /** Parse "A+ B C* D?" into tokens. */
  def parsePattern(p: String): Seq[PatTok] =
    p.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { t =>
      t.last match {
        case '+' => PatTok(t.dropRight(1), Plus)
        case '*' => PatTok(t.dropRight(1), Star)
        case '?' => PatTok(t.dropRight(1), Opt)
        case _   => PatTok(t, One)
      }
    }

  def matchRecognize(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: String,
      defines: Seq[(String, Column)],
      pattern: Seq[PatTok],
      measures: Seq[Measure]): DataFrame = {

    val varIdx = defines.map(_._1).zipWithIndex.toMap
    require(pattern.forall(t => varIdx.contains(t.variable)),
      s"PATTERN variable without DEFINE: ${pattern.map(_.variable)}")

    // 1. Catalyst evaluates predicates + keeps only needed columns
    val measureFields = measures.filter(_.kind != "count").map(_.field).distinct
    val baseCols = (partitionBy :+ orderBy) ++ measureFields
    val projected = df.select(
      baseCols.distinct.map(col) ++
        defines.zipWithIndex.map { case ((_, c), i) => c.as(s"__c_$i") }: _*)

    // 2. one shuffle + in-partition sort (secondary sort)
    val sorted = projected
      .repartition(partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy :+ orderBy).map(col): _*)

    val inSchema = sorted.schema
    val keyIdx = partitionBy.map(inSchema.fieldIndex)
    val condIdx = defines.indices.map(i => inSchema.fieldIndex(s"__c_$i"))
    val fieldIdx = measureFields.map(f => f -> inSchema.fieldIndex(f)).toMap

    def measureType(m: Measure): DataType = m.kind match {
      case "count" => LongType
      case "avg"   => DoubleType
      case "sum"   => DoubleType
      case _       => inSchema(fieldIdx(m.field)).dataType
    }
    val outSchema = StructType(
      partitionBy.map(inSchema(_)) ++
        measures.map(m => StructField(m.alias, measureType(m), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pat = pattern.map(t => (varIdx(t.variable), t.quant)).toArray
    val nVars = defines.size

    val out = sorted.mapPartitions { rows =>
      new Iterator[Row] {
        val it = rows.buffered
        var pending: Iterator[Row] = Iterator.empty

        def sameKey(a: Row, b: Row): Boolean = keyIdx.forall(i => a.get(i) == b.get(i))

        /** Backtracking matcher: returns var-assignment (varIdxPerRow) for
          * the longest-prefix greedy match starting at `start`, or null. */
        def tryMatch(grp: ArrayBuffer[Row], conds: Array[Array[Boolean]], start: Int): Array[Int] = {
          val assign = new Array[Int](grp.length)
          def rec(pos: Int, tok: Int): Int = {
            if (tok == pat.length) return pos
            val (v, q) = pat(tok)
            q match {
              case One =>
                if (pos < grp.length && conds(v)(pos)) { assign(pos) = v; rec(pos + 1, tok + 1) }
                else -1
              case Opt =>
                if (pos < grp.length && conds(v)(pos)) {
                  assign(pos) = v
                  val r = rec(pos + 1, tok + 1)
                  if (r >= 0) r else rec(pos, tok + 1)
                } else rec(pos, tok + 1)
              case Plus | Star =>
                var end = pos
                while (end < grp.length && conds(v)(end)) end += 1
                val minLen = if (q == Plus) 1 else 0
                var len = end - pos // greedy: longest run first
                while (len >= minLen) {
                  var i = pos
                  while (i < pos + len) { assign(i) = v; i += 1 }
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
            while (i < grp.length) { a(i) = grp(i).getAs[Boolean](condIdx(v)); i += 1 }
            a
          }
          val results = ArrayBuffer.empty[Row]
          var i = 0
          while (i < grp.length) {
            val assign = tryMatch(grp, conds, i)
            if (assign == null) i += 1
            else {
              val end = matchEnd
              val head = grp(i)
              val vals = partitionBy.indices.map(j => head.get(keyIdx(j))) ++
                measures.map { m =>
                  val v = varIdx(m.variable)
                  val rowsOfVar = (i until end).filter(assign(_) == v)
                  m.kind match {
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
      """MEASURES\s+(.*?)\s+ONE\s+ROW\s+PER\s+MATCH\s+""" +
      """AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW\s+""" +
      """PATTERN\s*\(\s*([^)]*?)\s*\)\s+""" +
      """DEFINE\s+(.*?)\s*\)\s*$""").r

  /** Does this statement use MATCH_RECOGNIZE? */
  def isMatchRecognize(sql: String): Boolean =
    sql.toUpperCase.contains("MATCH_RECOGNIZE")

  private val MeasureRe =
    """(?i)(FIRST|LAST|MIN|MAX|SUM|AVG|COUNT)\s*\(\s*(\w+)\.(\w+|\*)\s*\)\s+AS\s+(\w+)""".r

  /** Run the corpus-shaped SQL form against a registered table. */
  def sql(spark: org.apache.spark.sql.SparkSession, stmt: String): DataFrame = {
    val m = MrRegex.findFirstMatchIn(stmt.trim.stripSuffix(";"))
      .getOrElse(throw new IllegalArgumentException(
        "Unsupported MATCH_RECOGNIZE form; supported subset: PARTITION BY / ORDER BY / " +
          "MEASURES agg(V.f) AS a / ONE ROW PER MATCH / AFTER MATCH SKIP PAST LAST ROW / " +
          "PATTERN (concat with + * ?) / DEFINE V AS predicate"))
    val table = m.group(1)
    val partitionBy = m.group(2).split(",").map(_.trim).toSeq
    val orderBy = m.group(3).trim
    val measures = MeasureRe.findAllMatchIn(m.group(4)).map { mm =>
      Measure(mm.group(4), mm.group(1).toLowerCase, mm.group(2), mm.group(3))
    }.toSeq
    val pattern = parsePattern(m.group(5))
    val defines = m.group(6).split(",(?![^()]*\\))").toSeq.map { d =>
      val Array(v, cond) = d.split("(?i)\\s+AS\\s+", 2)
      val variable = v.trim
      // own-row predicate: strip the variable prefix (A.price → price)
      val c = cond.trim.replaceAll(s"(?i)\\b$variable\\.", "")
      variable -> expr(c)
    }
    matchRecognize(spark.table(table), partitionBy, orderBy, defines, pattern, measures)
  }
}
