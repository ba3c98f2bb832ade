package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flink's streaming "Window Top-N" special query:
  *
  *   SELECT ... FROM (
  *     SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start, window_end
  *       [, extra keys] ORDER BY metric [DESC]) AS rn
  *     FROM ( <windowed aggregation> )
  *   ) WHERE rn <= N
  *
  * Spark streams reject window functions, but the APPEND-mode windowed
  * aggregation underneath emits ALL of a window's groups atomically in the
  * micro-batch where the watermark closes the window — so the rank is
  * computable per micro-batch with an ordinary batch window function, no
  * extra state. This rewrites the statement to (inner streaming aggregation,
  * per-batch rank+filter transform); the gateway applies the transform
  * inside its foreachBatch sink.
  *
  * Flink imposes the same shape (PARTITION BY must include window_start and
  * window_end); we require that too, since it is exactly what makes the
  * per-batch evaluation correct.
  */
object StreamingTopN {

  private val Re =
    ("""(?is)^SELECT\s+(.*?)\s+FROM\s*\(\s*SELECT\s+\*\s*,\s*ROW_NUMBER\s*\(\s*\)\s+OVER\s*\(""" +
      """\s*PARTITION\s+BY\s+([\w.`,\s]+?)\s+ORDER\s+BY\s+(.+?)\s*\)\s+AS\s+(\w+)\s+""" +
      """FROM\s*\((.*)\)\s*(?:AS\s+)?\w*\s*\)(?:\s+(?:AS\s+)?\w+)?\s+WHERE\s+(\w+)\s*(?:<=\s*(\d+)|=\s*1)\s*$""").r

  /** The (inner streaming DataFrame, per-batch transform) pair when `stmt`
    * is the window-top-N pattern over a STREAMING aggregation; None lets
    * batch statements fall through to the native window plan. Only
    * statements whose PARTITION BY names window_start AND window_end reach
    * the spark.sql probe, so ordinary batch rank queries never pay the
    * extra analysis. */
  def rewrite(spark: SparkSession, stmt: String,
      dialect: String => String): Option[(DataFrame, DataFrame => DataFrame)] =
    for {
      m <- Re.findFirstMatchIn(stmt.trim)
      if m.group(4).equalsIgnoreCase(m.group(6)) // rn alias matches the WHERE
      partCols = m.group(2).split(",").map(_.trim.replace("`", "")).toSeq
      // window_start + window_end in PARTITION BY is what makes windows
      // close atomically per batch — same requirement as Flink
      if partCols.exists(_.equalsIgnoreCase("window_start")) &&
        partCols.exists(_.equalsIgnoreCase("window_end"))
      inner <- try Some(spark.sql(dialect(m.group(5)))) catch { case _: Exception => None }
      if inner.isStreaming
    } yield {
      val rnAlias = m.group(4)
      // WHERE rn <= N, or the window-dedup special case WHERE rn = 1
      val n = Option(m.group(7)).map(_.toInt).getOrElse(1)
      val OrderItem =
        """(?is)^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$""".r
      // top-level comma split, not raw split(","): a multi-argument rank
      // expression like GREATEST(a, b) DESC must stay one item; and the
      // expression goes through the dialect like its sibling fragments
      val orderCols = graft.engine.FlinkDialect.splitAssignments(m.group(3))
        .map(_.trim).map {
        case OrderItem(e, dir, nulls) =>
          val base = expr(dialect(e)) // full expressions allowed, e.g. GREATEST(a, b)
          val desc = dir != null && dir.equalsIgnoreCase("DESC")
          // Spark defaults (asc → nulls first, desc → nulls last) unless an
          // explicit NULLS FIRST/LAST overrides
          (desc, Option(nulls).map(_.toUpperCase)) match {
            case (false, Some("LAST")) => base.asc_nulls_last
            case (false, _) => base.asc
            case (true, Some("FIRST")) => base.desc_nulls_first
            case (true, _) => base.desc
          }
      }
      val outer = m.group(1).trim
      val transform: DataFrame => DataFrame = { batch =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
        val ranked = batch.withColumn(rnAlias, row_number().over(w))
          .filter(col(rnAlias) <= n)
        if (outer == "*") ranked
        else ranked.selectExpr(graft.engine.FlinkDialect.splitAssignments(outer)
          .map(dialect): _*)
      }
      (inner, transform)
    }
}
