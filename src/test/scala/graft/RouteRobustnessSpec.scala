package graft

import scala.util.Random
import graft.engine.{Gateway, TableEnv}

/** Negative-path fuzz of the GATEWAY route (r12): every statement family
  * the route matches by regex — the DDL lifecycle chain, the three
  * INSERT forms, UPDATE/DELETE/MERGE, SHOW/DESCRIBE — is mutated
  * (truncated, character-dropped, quote/paren-unbalanced) and executed.
  * Whatever the input, the result must be a real result or a NAMED error
  * page; an internal error surfacing through the error channel
  * (MatchError from a regex group, StringIndexOutOfBounds from a slice,
  * NPE from a missing lookup) is a routing bug. The dialect layer has
  * the same property pinned at 4k cases (DialectFuzzSpec F6); this
  * drives the full route with real execution. */
class RouteRobustnessSpec extends SparkTestBase {

  test("1200 mutated statements: the route answers or refuses, never breaks") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("robust")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    // seed objects so mutated references sometimes resolve
    val dir = java.nio.file.Files.createTempDirectory("graft-robust").toString
    Seq(
      "CREATE TABLE rb_t (id BIGINT, v BIGINT, tag STRING) WITH " +
        s"('connector'='filesystem','path'='$dir','format'='parquet')",
      "INSERT INTO rb_t VALUES (1, 10, 'a'), (2, 20, 'b')",
      "CREATE VIEW rb_v AS SELECT id FROM rb_t",
      "CREATE TEMPORARY VIEW rb_tv AS SELECT 7 AS x",
      "CREATE TEMPORARY TABLE rb_p (x INT)"
    ).foreach(s => assert(run(s).columns != Seq("error"), s))

    val bases = Seq(
      "CREATE TABLE rb_new (id BIGINT) WITH ('connector'='datagen','number-of-rows'='2')",
      "CREATE TABLE IF NOT EXISTS rb_t (id BIGINT) WITH ('connector'='datagen','number-of-rows'='2')",
      "CREATE TEMPORARY TABLE rb_p2 (x INT, y STRING)",
      "CREATE OR REPLACE VIEW rb_v AS SELECT id, v FROM rb_t WHERE v > 5",
      "CREATE TEMPORARY VIEW IF NOT EXISTS rb_tv2 AS SELECT 1 AS a",
      "INSERT INTO rb_t VALUES (3, 30, 'c')",
      "INSERT INTO rb_t (v, id) VALUES (40, 4)",
      "INSERT OVERWRITE rb_t SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'z')) AS t(id, v, tag)",
      "UPDATE rb_t SET v = v + 1 WHERE MOD(id, 2) = 0",
      "DELETE FROM rb_t WHERE tag IS NULL",
      "MERGE INTO rb_t t USING rb_v s ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = 0",
      "DROP TABLE IF EXISTS rb_gone",
      "DROP TEMPORARY TABLE IF EXISTS rb_p",
      "DROP VIEW IF EXISTS rb_v",
      "DROP TEMPORARY VIEW IF EXISTS rb_tv",
      "ALTER TABLE rb_t RENAME TO rb_t2",
      "ALTER TABLE rb_t SET ('number-of-rows'='9')",
      "SHOW CREATE TABLE rb_t",
      "SHOW CREATE VIEW rb_v",
      "DESCRIBE rb_t",
      "SELECT id, v FROM rb_t ORDER BY id LIMIT 3")
    val rnd = new Random(0xa12L)
    val internalMarkers = Seq("MatchError", "NullPointerException",
      "IndexOutOfBounds", "ClassCastException", "StackOverflow",
      "scala.Predef", "UnsupportedOperationException: empty")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    (1 to 1200).foreach { i =>
      val base = bases(rnd.nextInt(bases.size))
      val at = rnd.nextInt(math.max(base.length - 1, 1))
      val stmt = rnd.nextInt(4) match {
        case 0 => base.take(at)
        case 1 => base.patch(at, "", 1)
        case 2 => base.patch(at, "'", 0)
        case _ => base.patch(at, "((", 0)
      }
      val r = try run(stmt) catch {
        case e: Throwable =>
          bad += s"[case $i] THREW ${e.getClass.getSimpleName} on: $stmt"
          null
      }
      if (r != null && r.columns == Seq("error")) {
        val msg = r.rows.headOption.flatMap(_.headOption)
          .map(String.valueOf(_)).getOrElse("")
        if (msg.isEmpty || internalMarkers.exists(msg.contains))
          bad += s"[case $i] internal error on: $stmt\n  -> ${msg.take(200)}"
      }
    }
    assert(bad.isEmpty, s"${bad.size} internal errors:\n${bad.take(8).mkString("\n")}")
    gw.closeSession(h)
  }
}
