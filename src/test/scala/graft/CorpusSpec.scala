package graft

import graft.engine.{FlinkDialect, Gateway}

/** Drive the reference's ENTIRE syntax-test corpus
  * (/root/reference/test/syntax-test.fsql, 100 statements) through the
  * gateway. Every statement must either succeed or fail for an ENVIRONMENTAL
  * reason (this container has no kafka connector jar / no external catalogs,
  * so statements over those tables can't resolve) — never with a parse error
  * or an unrouted-statement crash. This is the closest thing to "a reference
  * user runs their whole script here".
  */
class CorpusSpec extends SparkTestBase {

  /** environmental failure classes: missing kafka-backed tables (the
    * spark-sql-kafka jar is not in /opt/spark/jars) and undefined external
    * catalogs/schemas. UNRESOLVED_COLUMN is deliberately NOT blanket-allowed
    * (a broken rewrite would hide behind it) — only the one syntax-only
    * corpus statement probing a nonexistent `backtick identifier` column may
    * produce it. */
  private val environmental = Seq(
    "TABLE_OR_VIEW_NOT_FOUND", "CATALOG_NOT_FOUND", "SCHEMA_NOT_FOUND",
    // the corpus LOADs then UNLOADs the hive module: the load fails for
    // the no-Hive-runtime reason (r8 real module registry), and the unload
    // then correctly reports the module absent — an environmental cascade,
    // not a routing failure
    "needs a Hive runtime", "No module with name 'hive'",
    // the corpus DROPs its TEMPORARY table with plain DROP TABLE IF
    // EXISTS; Flink's CatalogManager refuses a DROP TABLE through a
    // temporary shadow unconditionally (the shadow check precedes the
    // ignoreIfNotExists handling), so this refusal is engine parity —
    // the corpus is a SYNTAX test in the reference and never executes
    "use DROP TEMPORARY TABLE")
  private def allowedUnresolvedColumn(msg: String): Boolean =
    msg.contains("UNRESOLVED_COLUMN") && msg.contains("backtick identifier")

  test("all 100 reference corpus statements route cleanly through the gateway") {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/test/syntax-test.fsql")), "UTF-8")
    val stmts = FlinkDialect.split(script)
    assert(stmts.size == 100, s"splitter found ${stmts.size} statements")
    val gw = new Gateway(spark)
    val h = gw.openSession()
    var ok = 0
    val unexpected = scala.collection.mutable.ArrayBuffer.empty[String]
    stmts.zipWithIndex.foreach { case (stmt, i) =>
      val page = gw.fetchResults(gw.executeStatement(h, stmt), 0)
      if (page.columns == Seq("error")) {
        val msg = page.rows.headOption.flatMap(_.headOption)
          .map(String.valueOf(_)).getOrElse("")
        if (!environmental.exists(msg.contains) && !allowedUnresolvedColumn(msg))
          unexpected += s"#$i ${stmt.replaceAll("\\s+", " ").take(80)} :: ${msg.take(120)}"
      } else ok += 1
    }
    assert(unexpected.isEmpty,
      s"non-environmental failures:\n${unexpected.mkString("\n")}")
    // 39 statements run fully with no kafka connector and no external
    // catalogs present; regressions below that mean lost coverage.
    // (Was 42 before r8: LOAD/UNLOAD MODULE hive used to "succeed" as
    // documented no-ops — the real module registry now fails them with the
    // honest no-Hive-runtime reason, trading 2 hollow successes for
    // fail-fast behavior, like the connector DDL posture. Was 40 before
    // r12: DROP TABLE IF EXISTS through the corpus's temporary table used
    // to no-op via Spark; it now refuses with Flink's named reason.)
    assert(ok >= 39, s"only $ok statements succeeded")
  }
}
