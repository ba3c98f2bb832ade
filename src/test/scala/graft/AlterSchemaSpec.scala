package graft

import graft.engine.{Gateway, TableEnv}

/** ALTER TABLE ADD/MODIFY/DROP schema evolution on bindings (FLIP-273,
  * reference grammar G:315 — r13: previously only SET/RENAME routed; the
  * Flink column forms leaked raw Spark parse errors and ADD COLUMN hit
  * EXPECT_TABLE_NOT_VIEW against the binding materialization). */
class AlterSchemaSpec extends SparkTestBase {

  private def page(gw: Gateway, h: String, sql: String) =
    gw.fetchResults(gw.executeStatement(h, sql), 0)

  private def ok(gw: Gateway, h: String, sql: String): Unit = {
    val r = page(gw, h, sql)
    assert(r.columns != Seq("error"), s"`$sql` errored: ${r.rows}")
  }

  private def err(gw: Gateway, h: String, sql: String, contains: String): Unit = {
    val r = page(gw, h, sql)
    assert(r.columns == Seq("error"), s"`$sql` should refuse, got ${r.rows.take(1)}")
    assert(r.rows.head.head.toString.contains(contains),
      s"`$sql` error should mention '$contains': ${r.rows.head.head}")
  }

  test("column ADD/MODIFY/DROP with position, computed and metadata forms") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("alter_schema")
    ok(gw, h, "CREATE TABLE ae (a INT, ts TIMESTAMP(3)) WITH " +
      "('connector'='datagen','number-of-rows'='3')")
    // single, list, computed, FIRST/AFTER positions, Spark-style COLUMN kw
    ok(gw, h, "ALTER TABLE ae ADD b STRING")
    ok(gw, h, "ALTER TABLE ae ADD (c DOUBLE, d AS a * 2, e INT FIRST)")
    ok(gw, h, "ALTER TABLE ae ADD COLUMN f STRING AFTER a")
    val sel = page(gw, h, "SELECT * FROM ae")
    assert(sel.columns == Seq("e", "a", "f", "ts", "b", "c", "d"),
      s"declared order must hold: ${sel.columns}")
    assert(sel.rows.size == 3)
    // MODIFY retypes in place; DROP removes
    ok(gw, h, "ALTER TABLE ae MODIFY b BIGINT")
    ok(gw, h, "ALTER TABLE ae DROP c")
    assert(page(gw, h, "SELECT * FROM ae").columns
      == Seq("e", "a", "f", "ts", "b", "d"))
    // named refusals: dup add, missing drop/modify, referenced/constrained
    err(gw, h, "ALTER TABLE ae ADD b STRING", "already exists")
    err(gw, h, "ALTER TABLE ae DROP nosuch", "does not exist")
    err(gw, h, "ALTER TABLE ae MODIFY nosuch INT", "does not exist")
    err(gw, h, "ALTER TABLE ae DROP a", "referenced by computed column")
    gw.closeSession(h)
  }

  test("watermark and primary-key evolution; SHOW CREATE round-trips") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("alter_wm")
    ok(gw, h, "CREATE TABLE aw (id INT, ts TIMESTAMP(3)) WITH " +
      "('connector'='datagen','number-of-rows'='2')")
    ok(gw, h, "ALTER TABLE aw ADD WATERMARK FOR ts AS ts - INTERVAL '5' SECOND")
    err(gw, h, "ALTER TABLE aw ADD WATERMARK FOR ts AS ts - INTERVAL '9' SECOND",
      "already has a watermark")
    ok(gw, h, "ALTER TABLE aw MODIFY WATERMARK FOR ts AS ts - INTERVAL '9' SECOND")
    err(gw, h, "ALTER TABLE aw DROP ts", "carries the watermark")
    ok(gw, h, "ALTER TABLE aw ADD PRIMARY KEY (id) NOT ENFORCED")
    err(gw, h, "ALTER TABLE aw DROP id", "primary key")
    // the reconstructed DDL reflects every alteration and re-creates
    val show = page(gw, h, "SHOW CREATE TABLE aw")
    val ddl = show.rows.head.head.toString
    assert(ddl.contains("WATERMARK FOR") && ddl.contains("'9' SECOND")
      && ddl.contains("PRIMARY KEY"), ddl)
    ok(gw, h, "DROP TABLE aw")
    ok(gw, h, ddl)
    val desc = page(gw, h, "DESCRIBE aw")
    assert(desc.rows.map(_.head.toString) == Seq("id", "ts"), desc.rows)
    ok(gw, h, "ALTER TABLE aw DROP WATERMARK")
    ok(gw, h, "ALTER TABLE aw DROP PRIMARY KEY")
    err(gw, h, "ALTER TABLE aw DROP WATERMARK", "no watermark")
    gw.closeSession(h)
  }

  test("ALTER propagates across sessions; temp shadow blocks it") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h1 = gw.openSession("alter_s1")
    val h2 = gw.openSession("alter_s2")
    ok(gw, h1, "CREATE TABLE ap (a INT) WITH ('connector'='datagen','number-of-rows'='2')")
    // session 2 materializes the pre-ALTER table, then must see the change
    assert(page(gw, h2, "SELECT * FROM ap").columns == Seq("a"))
    ok(gw, h1, "ALTER TABLE ap ADD b STRING")
    assert(page(gw, h2, "SELECT * FROM ap").columns == Seq("a", "b"),
      "other sessions must re-materialize after ALTER")
    // a temp-table shadow in the altering session blocks the verb by name
    ok(gw, h1, "CREATE TABLE shad (x INT) WITH " +
      "('connector'='datagen','number-of-rows'='1')")
    // connector-less temporary relations are the session objects that
    // shadow shared names (r12 namespace rules)
    ok(gw, h2, "CREATE TEMPORARY TABLE shad (y INT)")
    err(gw, h2, "ALTER TABLE shad ADD z INT", "shadows")
    ok(gw, h1, "ALTER TABLE shad ADD z INT") // unshadowed session can
    gw.closeSession(h1); gw.closeSession(h2)
  }
}
