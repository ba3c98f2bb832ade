package graft

import graft.engine.{Gateway, TableEnv}

/** Long-statement robustness (r13): the 10× NamespaceFuzz soak found that a
  * ~20 KB `VALUES (1),(2),…` statement overflowed the JVM stack inside
  * java.util.regex — the SIMILAR TO rule's left-operand pattern
  * `(?:[\w.`']|\(...\))+` recursed once per character while merely SCANNING
  * a statement with no SIMILAR TO in it, and the raw StackOverflowError
  * (an Error, not an Exception) escaped the gateway to the client.
  *
  * Contract pinned here: statement length alone must never crash the
  * gateway — every site that regex-scans whole statements (literal
  * masking, SIMILAR TO, GROUP BY window lookaheads) is depth-bounded, and
  * the gateway's statement boundary converts a residual StackOverflowError
  * into an error page. The reference's own notebook splitter feeds
  * arbitrarily long cells (notebookController.ts:88); a training-data
  * pipeline INSERTs document-sized string literals.
  */
class LongStatementSpec extends SparkTestBase {

  private def page(gw: Gateway, h: String, sql: String) =
    gw.fetchResults(gw.executeStatement(h, sql), 0)

  private def values(n: Int): String =
    "(VALUES " + (1 to n).map(i => s"($i)").mkString(",") + ") AS t(v)"

  test("20 KB VALUES statements route without stack overflow (the soak reproducer)") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("long_stmt")
    // plain SELECT, CREATE VIEW, CREATE TEMPORARY VIEW — the three forms
    // the namespace fuzz issues with a growing VALUES body
    val body = s"SELECT v FROM ${values(5000)}"
    val sel = page(gw, h, body)
    assert(sel.columns == Seq("v"), s"long SELECT failed: ${sel.rows.take(1)}")

    val cv = page(gw, h, s"CREATE VIEW long_v AS $body")
    assert(cv.columns != Seq("error"), s"CREATE VIEW failed: ${cv.rows}")
    val c1 = page(gw, h, "SELECT count(*) AS c FROM long_v")
    assert(c1.rows.head.head.toString.toLong == 5000L)

    val ctv = page(gw, h, s"CREATE TEMPORARY VIEW long_t AS $body")
    assert(ctv.columns != Seq("error"), s"CREATE TEMPORARY VIEW failed: ${ctv.rows}")
    val c2 = page(gw, h, "SELECT count(*) AS c FROM long_t")
    assert(c2.rows.head.head.toString.toLong == 5000L)

    page(gw, h, "DROP VIEW long_v")
    page(gw, h, "DROP TEMPORARY VIEW long_t")
    gw.closeSession(h)
  }

  test("a 200 KB string literal (with '' escapes) masks iteratively") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("long_lit")
    // document-sized literal: 2000 repetitions of a 100-char chunk that
    // includes a doubled-quote escape, so both the char-run and the
    // escape-loop paths of the masking regex are exercised
    val chunk = "lorem ipsum dolor sit amet, d''angelo " + ("x" * 60) + " "
    val lit = chunk * 2000
    val r = page(gw, h, s"SELECT length('$lit') AS n")
    assert(r.columns == Seq("n"), s"long literal failed: ${r.rows.take(1)}")
    // '' unescapes to ' in the value
    assert(r.rows.head.head.toString.toLong == (chunk.length - 1).toLong * 2000)
    gw.closeSession(h)
  }

  test("SIMILAR TO at the end of a long statement still rewrites") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("long_sim")
    val r = page(gw, h,
      s"SELECT count(*) AS c FROM ${values(3000)} WHERE CAST(v AS STRING) SIMILAR TO '1%'")
    // 1, 10..19, 100..199, 1000..1999 = 1 + 10 + 100 + 1000
    assert(r.rows.head.head.toString.toLong == 1111L, s"got ${r.rows}")
    gw.closeSession(h)
  }

  test("NOT SIMILAR TO negates the rewritten predicate") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("not_sim")
    val r = page(gw, h,
      s"SELECT count(*) AS c FROM ${values(200)} WHERE CAST(v AS STRING) NOT SIMILAR TO '1%'")
    // values 1..200 starting with '1': 1, 10..19, 100..199 → 111; 200-111=89
    assert(r.rows.head.head.toString.toLong == 89L, s"got ${r.rows}")
    gw.closeSession(h)
  }

  test("a 2000-column datagen DDL materializes in one projection") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("wide_ddl")
    // wide feature tables are a normal training-pipeline shape; the old
    // per-column withColumn loop re-analyzed a growing plan per column
    // (quadratic with a full-analyzer constant: 1000 columns took 65 s,
    // 5000 hung) — as one select this must stay in test-suite time
    val cols = (0 until 2000).map(i => s"c$i BIGINT").mkString(", ")
    val t0 = System.nanoTime()
    val r = page(gw, h,
      s"CREATE TABLE wide_ls ($cols) WITH ('connector'='datagen','number-of-rows'='3')")
    assert(r.columns != Seq("error"), s"wide DDL failed: ${r.rows}")
    val q = page(gw, h, "SELECT c0, c1999 FROM wide_ls")
    assert(q.columns == Seq("c0", "c1999") && q.rows.size == 3)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, f"wide DDL+read took $secs%.1f s — per-column analysis is back")
    page(gw, h, "DROP TABLE wide_ls")
    gw.closeSession(h)
  }

  test("pathological nesting answers an error page, never a raw throw") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("deep_nest")
    // 20k nested parens blow Catalyst's recursive-descent parser stack;
    // the gateway boundary must convert the StackOverflowError (an Error,
    // not an Exception) into an error page — this is the only test that
    // exercises that catch arm
    val deep = "SELECT " + "(" * 20000 + "1" + ")" * 20000
    val r = page(gw, h, deep)
    assert(r.columns == Seq("error"), s"expected error page, got ${r.columns}")
    assert(r.rows.head.head.toString.nonEmpty)
    // the session is still alive and usable afterwards
    val ok = page(gw, h, "SELECT 1 AS x")
    assert(ok.columns == Seq("x") && ok.rows.head.head.toString == "1")
    gw.closeSession(h)
  }

  test("SIMILAR TO operand shapes survive the backward-scan extraction") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("sim_shapes")
    def one(sql: String): String = {
      val r = page(gw, h, sql)
      assert(r.columns != Seq("error"), s"`$sql` errored: ${r.rows}")
      r.rows.head.head.toString
    }
    // qualified + backticked identifier operand
    assert(one("SELECT count(*) AS c FROM (VALUES ('ab'),('ba')) AS t(`s`) " +
      "WHERE t.`s` SIMILAR TO 'a%'") == "1")
    // function-call operand (parenthesized group with inner parens)
    assert(one("SELECT count(*) AS c FROM (VALUES ('ab'),('BA')) AS t(s) " +
      "WHERE UPPER(s) SIMILAR TO 'B_'") == "1")
    // literal operand (simple numeric-ish literals stay unmasked)
    assert(one("SELECT CASE WHEN '12:30' SIMILAR TO '12%' THEN 1 ELSE 0 END AS c") == "1")
    // no operand at all → named error page, not a crash
    val bad = page(gw, h, "SELECT 1 WHERE SIMILAR TO 'x'")
    assert(bad.columns == Seq("error"))
    gw.closeSession(h)
  }
}
