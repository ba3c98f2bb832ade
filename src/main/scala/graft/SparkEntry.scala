package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-area query modules; every entry in `queries` that is
  * SQL-expressible has a matching DuckDB oracle in `oracleSql` with
  * identically-aliased columns and an identical total ORDER BY.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Joins.queries ++ SetsAndSubqueries.queries ++
      Aggregates.queries ++ OverWindows.queries ++ WindowTVFs.queries ++ Funcs.queries ++ Funcs2.queries ++ PipelineQueries.queries ++ DialectQueries.queries ++ CepQueries.queries ++ MiscQueries.queries ++ StreamParityQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val m = Relational.oracle ++ Joins.oracle ++ SetsAndSubqueries.oracle ++
      Aggregates.oracle ++ OverWindows.oracle ++ WindowTVFs.oracle ++ Funcs.oracle ++ Funcs2.oracle ++ PipelineQueries.oracle ++ DialectQueries.oracle ++ CepQueries.oracle ++ MiscQueries.oracle ++ StreamParityQueries.oracle
    // the kernel-identity cut variant must produce byte-for-byte what the
    // substring-identity cut produces on this single-byte corpus — same
    // oracle, verbatim
    m + ("q_cut_spans_kernel" -> m("q_cut_spans"))
  }
}
