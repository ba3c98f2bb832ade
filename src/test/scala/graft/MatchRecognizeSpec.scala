package graft

import org.apache.spark.sql.functions._
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize._

class MatchRecognizeSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: Seq[(Int, Int, Double)]) =
    rows.toDF("k", "seq", "price")

  test("corpus pattern A+ B: runs of low prices ending in a high price") {
    // k=1: L L H | L H   → two matches; k=2: H only → no match (A+ needs one A)
    val df = mk(Seq(
      (1, 1, 10.0), (1, 2, 20.0), (1, 3, 150.0),
      (1, 4, 30.0), (1, 5, 200.0),
      (2, 1, 500.0)))
    val out = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") >= 100)),
      pattern = parsePattern("A+ B"),
      measures = Seq(
        Measure("start_price", "first", "A", "price"),
        Measure("end_price", "last", "B", "price"),
        Measure("avg_low", "avg", "A", "price"),
        Measure("n_low", "count", "A", "*")))
      .orderBy("k", "start_price")
    val rows = out.collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, 10.0, 150.0, 15.0, 2L),
      (1, 30.0, 200.0, 30.0, 1L)))
  }

  test("greedy backtracking: A* absorbs what it can but yields to later tokens") {
    // all rows satisfy A (value < 1000); B needs >= 100.
    // A* greedy takes 0..n, must leave one row for B: match = A* (first two) B (third)
    val df = mk(Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 150.0)))
    val out = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 1000), "B" -> (col("price") >= 100)),
      pattern = parsePattern("A* B"),
      measures = Seq(
        Measure("n_a", "count", "A", "*"),
        Measure("b_val", "first", "B", "price")))
    val rows = out.collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((2L, 150.0)))
  }

  test("AFTER MATCH SKIP PAST LAST ROW: matches never overlap") {
    val df = mk(Seq((1, 1, 1.0), (1, 2, 100.0), (1, 3, 2.0), (1, 4, 200.0), (1, 5, 3.0)))
    val out = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") >= 100)),
      pattern = parsePattern("A B"),
      measures = Seq(Measure("n", "count", "A", "*")))
    assert(out.count() == 2) // (1,100), (2,200); trailing 3.0 unmatched
  }

  test("AFTER MATCH SKIP TO NEXT ROW: overlapping matches, numbered in order") {
    // low-run of 4: pairs (1,2) (2,3) (3,4) overlap under TO NEXT ROW;
    // PAST LAST ROW would only yield (1,2) and (3,4)
    val df = mk(Seq((1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0), (1, 4, 4.0), (1, 5, 500.0)))
    val toNext = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") < 100)),
      pattern = parsePattern("A B"),
      measures = Seq(
        Measure("a_price", "first", "A", "price"),
        Measure("m", "match_number", "", "")),
      skip = SkipToNextRow)
      .orderBy("a_price")
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(toNext.toSeq == Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)))
    val pastLast = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") < 100)),
      pattern = parsePattern("A B"),
      measures = Seq(Measure("a_price", "first", "A", "price")))
    assert(pastLast.count() == 2)
    // SQL form routes the skip mode
    df.createOrReplaceTempView("mr_skip")
    val sqlOut = MatchRecognize.sql(spark,
      """SELECT * FROM mr_skip MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS a_price
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A B)
        |  DEFINE A AS A.price < 100, B AS B.price < 100
        |)""".stripMargin)
    assert(sqlOut.count() == 3)
  }

  test("AFTER MATCH SKIP TO LAST: next match anchors at the shared boundary row") {
    // rising runs 1<2<3, then 3>1, 1<5: SKIP TO LAST B lets the peak row
    // (3) anchor the next attempt, chaining runs at their boundary
    val df = mk(Seq((1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0), (1, 4, 1.0), (1, 5, 5.0)))
    df.createOrReplaceTempView("mr_tolast")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_tolast MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS base, LAST(B.price) AS peak
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO LAST B
        |  PATTERN (A B+)
        |  DEFINE B AS B.price > PREV(B.price)
        |)""".stripMargin)
      .orderBy("base").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // PAST LAST ROW would give (1,3) and (1,5); TO LAST B re-anchors at the
    // peak row 3, which starts (3 -> fails: 1 not > 3), then (1,5) from row 4
    assert(out.toSeq == Seq((1.0, 3.0), (1.0, 5.0)))
    // loop guard: a resume position equal to the match start raises
    val df2 = mk(Seq((1, 1, 10.0), (1, 2, 200.0)))
    val err = intercept[org.apache.spark.SparkException] {
      MatchRecognize.matchRecognize(
        df2, Seq("k"), "seq",
        defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") >= 100)),
        pattern = parsePattern("A B"),
        measures = Seq(Measure("n", "count", "A", "*")),
        skip = SkipToFirst("A")).collect()
    }
    assert(err.getMessage.contains("would loop"))
  }

  test("SQL form parses the corpus statement shape") {
    mk(Seq((7, 1, 50.0), (7, 2, 60.0), (7, 3, 120.0)))
      .withColumnRenamed("k", "customer_id")
      .withColumnRenamed("seq", "order_time")
      .createOrReplaceTempView("mr_orders")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_orders MATCH_RECOGNIZE (
        |    PARTITION BY customer_id
        |    ORDER BY order_time
        |    MEASURES
        |        FIRST(A.order_time) AS start_time,
        |        LAST(B.order_time) AS end_time,
        |        AVG(A.price) AS avg_price
        |    ONE ROW PER MATCH
        |    AFTER MATCH SKIP PAST LAST ROW
        |    PATTERN (A+ B)
        |    DEFINE
        |        A AS A.price < 100,
        |        B AS B.price >= 100
        |)""".stripMargin)
    val r = out.collect()
    assert(r.length == 1)
    assert(r.head.getAs[Int]("start_time") == 1)
    assert(r.head.getAs[Int]("end_time") == 3)
    assert(r.head.getAs[Double]("avg_price") == 55.0)
  }

  test("alternation group (A|B)+ routes each row to the first matching alt") {
    // A: <50, B: 50..99, C: >=100 — run L(10) B(60) L(20) then C(150)
    val df = mk(Seq((1, 1, 10.0), (1, 2, 60.0), (1, 3, 20.0), (1, 4, 150.0)))
    val out = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq(
        "A" -> (col("price") < 50),
        "B" -> (col("price") >= 50 && col("price") < 100),
        "C" -> (col("price") >= 100)),
      pattern = parsePattern("(A|B)+ C"),
      measures = Seq(
        Measure("n_a", "count", "A", "*"),
        Measure("n_b", "count", "B", "*"),
        Measure("c_val", "last", "C", "price")))
    val rows = out.collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((2L, 1L, 150.0)))
  }

  test("PREV navigation: rising run detected via lag bits, no extra shuffle") {
    // prices 1 3 5 2 4 | k=1: anchor(1) rise(3,5) | anchor(2) rise(4)
    val df = mk(Seq((1, 1, 1.0), (1, 2, 3.0), (1, 3, 5.0), (1, 4, 2.0), (1, 5, 4.0)))
    df.createOrReplaceTempView("mr_rise")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_rise MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS base, LAST(B.price) AS peak, COUNT(B.*) AS n
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE B AS B.price > PREV(B.price)
        |)""".stripMargin)
    val rows = out.orderBy("base").collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1.0, 5.0, 2L), (2.0, 4.0, 1L)))
    // plan audit: navigation must not add a second shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"PREV navigation added shuffles:\n$plan")
  }

  test("ALL ROWS PER MATCH emits matched input rows with CLASSIFIER/MATCH_NUMBER") {
    val df = mk(Seq((1, 1, 10.0), (1, 2, 150.0), (1, 3, 20.0), (1, 4, 200.0), (1, 5, 7.0)))
    df.createOrReplaceTempView("mr_all")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_all MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES CLASSIFIER() AS label, MATCH_NUMBER() AS mno
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A+ B)
        |  DEFINE A AS A.price < 100, B AS B.price >= 100
        |)""".stripMargin)
    val rows = out.orderBy("seq").collect()
      .map(r => (r.getAs[Int]("seq"), r.getAs[String]("label"), r.getAs[Long]("mno")))
    assert(rows.toSeq == Seq(
      (1, "A", 1L), (2, "B", 1L), (3, "A", 2L), (4, "B", 2L))) // seq 5 unmatched
  }

  test("ALL ROWS PER MATCH: RUNNING vs FINAL aggregate measures") {
    val df = mk(Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 150.0)))
    df.createOrReplaceTempView("mr_rf")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_rf MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES SUM(A.price) AS rs,
        |           FINAL SUM(A.price) AS fs,
        |           RUNNING COUNT(A.*) AS rc,
        |           CLASSIFIER() AS c
        |  ALL ROWS PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A+ B)
        |  DEFINE A AS A.price < 100, B AS B.price >= 100
        |)""".stripMargin)
    val rows = out.orderBy("seq").collect()
      .map(r => (r.getAs[Int]("seq"), r.getAs[Double]("rs"), r.getAs[Double]("fs"),
        r.getAs[Long]("rc"), r.getAs[String]("c")))
    // bare agg defaults to RUNNING in ALL ROWS mode (Flink semantics)
    assert(rows.toSeq == Seq(
      (1, 10.0, 30.0, 1L, "A"),
      (2, 30.0, 30.0, 2L, "A"),
      (3, 30.0, 30.0, 2L, "B")))
  }

  test("PERMUTE matches the variables in any order") {
    val df = mk(Seq((1, 1, 10.0), (1, 2, 150.0), (2, 1, 200.0), (2, 2, 20.0)))
    df.createOrReplaceTempView("mr_perm")
    // k=1: low then high (A B); k=2: high then low (B A) — PERMUTE takes both
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_perm MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS a_val, FIRST(B.price) AS b_val
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (PERMUTE(A, B))
        |  DEFINE A AS A.price < 100, B AS B.price >= 100
        |)""".stripMargin)
    val rows = out.orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1, 10.0, 150.0), (2, 20.0, 200.0)))
  }

  test("top-level sequence alternation prefers the earlier alternative") {
    val df = mk(Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 150.0), (1, 4, 30.0), (1, 5, 160.0)))
    df.createOrReplaceTempView("mr_seqalt")
    // A A B | A B: rows 1-3 take the 3-row alternative (declared first);
    // rows 4-5 can only take A B
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_seqalt MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES COUNT(A.*) AS n_a, LAST(B.price) AS b_val
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A A B | A B)
        |  DEFINE A AS A.price < 100, B AS B.price >= 100
        |)""".stripMargin)
    val rows = out.orderBy("b_val").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((2L, 150.0), (1L, 160.0)))
  }

  test("FIRST cross-variable navigation in DEFINE: run below the anchor value") {
    // anchor 10: run 5,7 (<10) then 12 breaks; anchor 12: run 3,2
    val df = mk(Seq((1, 1, 10.0), (1, 2, 5.0), (1, 3, 7.0),
      (1, 4, 12.0), (1, 5, 3.0), (1, 6, 2.0)))
    df.createOrReplaceTempView("mr_firstnav")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_firstnav MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS anchor, COUNT(B.*) AS n_below
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE B AS B.price < FIRST(A.price)
        |)""".stripMargin)
    val rows = out.orderBy("anchor").collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(rows.toSeq == Seq((10.0, 2L), (12.0, 2L)))
  }

  test("LAST same-variable navigation with offset: rising run without PREV") {
    // values 1 3 2 5 7 4: matches (1,3) and (2,5,7); trailing 4 unmatched
    val df = mk(Seq((1, 1, 1.0), (1, 2, 3.0), (1, 3, 2.0),
      (1, 4, 5.0), (1, 5, 7.0), (1, 6, 4.0)))
    df.createOrReplaceTempView("mr_lastnav")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_lastnav MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS base, LAST(B.price) AS peak, COUNT(B.*) AS n
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE B AS B.price > COALESCE(LAST(B.price, 1), FIRST(A.price))
        |)""".stripMargin)
    val rows = out.orderBy("base").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1.0, 3.0, 1L), (2.0, 7.0, 2L)))
    // equivalence with the PREV formulation on the same data
    val prevOut = MatchRecognize.sql(spark,
      """SELECT * FROM mr_lastnav MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS base, LAST(B.price) AS peak, COUNT(B.*) AS n
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B+)
        |  DEFINE B AS B.price > PREV(B.price)
        |)""".stripMargin)
      .orderBy("base").collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(prevOut.toSeq == rows.toSeq)
  }

  test("FIRST/LAST in DEFINE mixes with a static define and greedy backtracking") {
    // B: strictly above anchor, C closes at >= 100. 10 | 20 30 | 150
    val df = mk(Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (1, 4, 150.0)))
    df.createOrReplaceTempView("mr_mixnav")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_mixnav MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS anchor, COUNT(B.*) AS n_up, LAST(C.price) AS close_val
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B* C)
        |  DEFINE B AS B.price > FIRST(A.price) AND B.price < 100,
        |         C AS C.price >= 100
        |)""".stripMargin)
    val rows = out.collect().map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((10.0, 2L, 150.0)))
  }

  test("MEASURES/DEFINE lists split safely around literals with commas and parens") {
    val df = Seq((1, 1, "a,b", 10.0), (1, 2, "x(", 150.0)).toDF("k", "seq", "label", "price")
    df.createOrReplaceTempView("mr_lit")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_lit MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(A.price) AS a_val, LAST(B.price) AS b_val
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B)
        |  DEFINE A AS A.label = 'a,b', B AS B.label <> '(oops, nested)'
        |)""".stripMargin)
    val rows = out.collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((10.0, 150.0)))
  }


  test("range quantifiers expand; unsupported pattern syntax errors loudly") {
    // A{2} B: exactly two lows then a high — a silent drop of {2} would
    // run A B and also match single-low prefixes
    val df = mk(Seq(
      (1, 1, 10.0), (1, 2, 20.0), (1, 3, 150.0), // L L H -> match
      (2, 1, 10.0), (2, 2, 150.0)))              // L H   -> no match
    val out = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") >= 100)),
      pattern = parsePattern("A{2} B"),
      measures = Seq(Measure("n_low", "count", "A", "*")))
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 2L)))
    // {n,m}: 1..2 lows accepted
    val out2 = MatchRecognize.matchRecognize(
      df, Seq("k"), "seq",
      defines = Seq("A" -> (col("price") < 100), "B" -> (col("price") >= 100)),
      pattern = parsePattern("A{1,2} B"),
      measures = Seq(Measure("n_low", "count", "A", "*")))
    assert(out2.collect().map(r => (r.getInt(0), r.getLong(1))).toSet == Set((1, 2L), (2, 1L)))
    // reluctant and unknown syntax refuse instead of silently running a
    // different pattern
    assert(intercept[IllegalArgumentException](parsePattern("A+? B"))
      .getMessage.contains("reluctant"))
    assert(intercept[IllegalArgumentException](parsePattern("A ^ B"))
      .getMessage.contains("unsupported PATTERN"))
    // quantifier bombs: expansion is one token per repetition, so an
    // unbounded count is user-controlled memory — A{2,999999999} built a
    // billion-token list and hung the session before the cap (r13)
    assert(intercept[IllegalArgumentException](parsePattern("A{2,999999999}"))
      .getMessage.contains("10000-repetition bound"))
    assert(intercept[IllegalArgumentException](parsePattern("A{999999999999999,}"))
      .getMessage.contains("10000-repetition bound"))
    // at the cap itself the expansion still works
    assert(parsePattern("A{10000}").size == 10000)
  }

  test("trailing derived-table alias after MATCH_RECOGNIZE(...) routes") {
    // `) AS m` / `) m` is standard SQL and pervasive in the reference
    // corpus; it was rejected as an unsupported form until r13
    mk(Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 150.0)))
      .createOrReplaceTempView("mr_alias")
    for (alias <- Seq("AS m", "m", "")) {
      val out = MatchRecognize.sql(spark,
        s"""SELECT * FROM mr_alias MATCH_RECOGNIZE (
           |  PARTITION BY k ORDER BY seq
           |  MEASURES COUNT(A.price) AS n_low
           |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
           |  PATTERN (A{2} B)
           |  DEFINE A AS A.price < 100, B AS B.price >= 100) $alias""".stripMargin)
      assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        == Seq((1, 2L)), s"alias form '$alias'")
    }
  }

  test("unsupported MEASURES items error instead of vanishing from the schema") {
    val stmt =
      """SELECT * FROM t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES LAST(A.price) - FIRST(A.price) AS delta
        |  ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A+) DEFINE A AS A.price < 100)""".stripMargin
    mk(Seq((1, 1, 10.0))).createOrReplaceTempView("t")
    val e = intercept[IllegalArgumentException](MatchRecognize.sql(spark, stmt))
    assert(e.getMessage.contains("unsupported MEASURES item"), e.getMessage)
  }

  test("alternation backtracks the variable choice when a downstream DEFINE needs it") {
    // row 1 satisfies A and B; C is defined via FIRST(B.price), so the
    // match only exists when row 1 maps to B — first-satisfying commitment
    // to A must not kill it (SQL alternation tries the next alternative on
    // downstream failure)
    mk(Seq((1, 1, 50.0), (1, 2, 60.0))).createOrReplaceTempView("mr_altbt")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_altbt MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES LAST(C.price) AS c_price
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((A|B) C)
        |  DEFINE A AS A.price < 100, B AS B.price < 100,
        |         C AS C.price > FIRST(B.price)
        |)""".stripMargin)
    assert(out.collect().map(_.getDouble(1)).toSeq == Seq(60.0))
  }

  test("undefined pattern variables are always-true (Flink semantics)") {
    val df = mk(Seq((1, 1, 500.0), (1, 2, 150.0)))
    df.createOrReplaceTempView("mr_any")
    val out = MatchRecognize.sql(spark,
      """SELECT * FROM mr_any MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(X.price) AS anchor, LAST(B.price) AS bval
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (X B)
        |  DEFINE B AS B.price >= 100
        |)""".stripMargin)
    val rows = out.collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((500.0, 150.0)))
  }
}
