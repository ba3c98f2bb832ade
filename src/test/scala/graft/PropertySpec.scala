package graft

import org.scalacheck.Gen
import graft.engine.FlinkDialect
import graft.functions.RollingHashes

/** Property-based tests (scalacheck generators, 100 samples per property)
  * for the hand-rolled parsers/kernels — the components most likely to
  * break on adversarial input.
  */
class PropertySpec extends SparkTestBase {

  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(100).foreach(check)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  // ---- statement splitter: join-then-split is the identity ----

  private val word = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
  private val tricky = Gen.oneOf(
    "'a;b'", "';'", "'it''s'", "`q;id`", "x", "1.5", "(a, b)",
    "'--not a comment'", "'/*still a string*/'")
  private val statement: Gen[String] = for {
    n <- Gen.choose(1, 5)
    parts <- Gen.listOfN(n, Gen.oneOf(word, tricky))
  } yield "SELECT " + parts.mkString(" ")

  test("split(join(statements)) == statements for arbitrary tricky content") {
    forAll(Gen.listOfN(4, statement)) { stmts =>
      whenever(stmts.forall(_.trim.nonEmpty)) {
        val script = stmts.mkString(";\n") + ";"
        assert(FlinkDialect.split(script).map(_.trim) == stmts.map(_.trim))
      }
    }
  }

  test("split drops comments but never statement content") {
    forAll(Gen.listOfN(3, statement)) { stmts =>
      whenever(stmts.nonEmpty) {
        val script = stmts.mkString("; -- trailing; comment\n") + "; /* tail; */"
        assert(FlinkDialect.split(script).size == stmts.size)
      }
    }
  }

  // ---- rolling hashes: kernel == naive per-window polynomial hash ----

  test("rolling hash equals naive window hash for arbitrary strings and k") {
    forAll(Gen.zip(Gen.asciiPrintableStr, Gen.choose(1, 12), Gen.long)) { case (s, k, seed) =>
      val bytes = s.getBytes("UTF-8")
      val out = RollingHashes.compute(bytes, k, seed)
      assert(out.length == math.max(bytes.length - k + 1, 0))
      out.indices.foreach { i =>
        var h = 0L
        (i until i + k).foreach(j => h = h * RollingHashes.B + (bytes(j) & 0xff).toLong)
        var x = h ^ seed
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        assert(out(i) == x, s"window $i of '$s' (k=$k)")
      }
    }
  }

  test("phash: segment-sum reference == kernel for arbitrary byte payloads") {
    forAll(Gen.zip(Gen.asciiPrintableStr, Gen.choose(0, 3))) { case (s, rep) =>
      val bytes = (s * (rep + 1)).getBytes("UTF-8")
      val got = graft.functions.HashKernels.phash(bytes)
      val n = bytes.length
      val expected = if (n == 0) 0L else {
        val sums = new Array[Long](65)
        bytes.indices.foreach(i => sums(((i.toLong * 65) / n).toInt) += (bytes(i) & 0xff).toLong)
        (0 until 64).foldLeft(0L)((acc, b) => if (sums(b) > sums(b + 1)) acc | (1L << b) else acc)
      }
      assert(got == expected, s"payload of ${n} bytes")
    }
  }

  // ---- rewriter: idempotent on already-Spark SQL, literal-preserving ----

  test("rewrite preserves arbitrary string literals verbatim") {
    val litGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const("0xFF"), Gen.const("a[1]"),
      Gen.const("SHUFFLE_MERGE"), Gen.const("PROCTIME()")))
      .map(ws => ws.mkString(" "))
    forAll(litGen) { content =>
      whenever(!content.contains("'")) {
        val r = FlinkDialect.rewrite(s"SELECT '$content' AS c FROM t")
        assert(r.contains(s"'$content'"), r)
      }
    }
  }

  test("quantified comparisons match three-valued reference semantics exhaustively") {
    val ops = Seq("=", "<>", "<", "<=", ">", ">=")
    val sets: Seq[Seq[Option[Int]]] = Seq(
      Seq(), Seq(Some(1)), Seq(None), Seq(Some(1), None),
      Seq(Some(1), Some(2)), Seq(Some(2), Some(2)), Seq(None, None))
    val needles: Seq[Option[Int]] = Seq(None, Some(0), Some(1), Some(2))
    def opFn(o: String)(a: Int, b: Int): Boolean = o match {
      case "="  => a == b
      case "<>" => a != b
      case "<"  => a < b
      case "<=" => a <= b
      case ">"  => a > b
      case _    => a >= b
    }
    // the SQL-standard reference: a comparison with any NULL operand is
    // UNKNOWN; ALL is a three-valued conjunction (empty → TRUE), ANY a
    // three-valued disjunction (empty → FALSE)
    def ref(o: String, q: String, x: Option[Int], set: Seq[Option[Int]]): Option[Boolean] = {
      val cmps = set.map(c => for { a <- x; b <- c } yield opFn(o)(a, b))
      if (q == "ALL") {
        if (cmps.contains(Some(false))) Some(false)
        else if (cmps.contains(None)) None
        else Some(true)
      } else {
        if (cmps.contains(Some(true))) Some(true)
        else if (cmps.contains(None)) None
        else Some(false)
      }
    }
    def subSql(set: Seq[Option[Int]]): String =
      if (set.isEmpty) "SELECT v FROM VALUES (0) AS t(v) WHERE 1 = 0"
      else "SELECT v FROM VALUES " + set.map {
        case Some(i) => s"($i)"
        case None => "(CAST(NULL AS INT))"
      }.mkString(", ") + " AS t(v)"
    val cases = for { o <- ops; q <- Seq("ANY", "ALL"); s <- sets; x <- needles }
      yield (o, q, s, x)
    cases.grouped(24).foreach { grp =>
      val cols = grp.zipWithIndex.map { case ((o, q, s, x), i) =>
        val nd = x.map(_.toString).getOrElse("CAST(NULL AS INT)")
        s"$nd $o $q (${subSql(s)}) AS c$i"
      }
      val row = spark.sql(FlinkDialect.rewrite("SELECT " + cols.mkString(", "))).head()
      grp.zipWithIndex.foreach { case ((o, q, s, x), i) =>
        val got = Option(row.get(i)).map(_.asInstanceOf[Boolean])
        assert(got == ref(o, q, x, s), s"$x $o $q $s: got $got want ${ref(o, q, x, s)}")
      }
    }
  }

  test("StateKeys encoding is injective over arbitrary multi-column keys") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    val enc = graft.operators.StateKeys.encoder(schema, Seq("a", "b"))
    val cell = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(null: String),
      Gen.const("null"), Gen.const(""), Gen.const("1:"), Gen.const(""))
    forAll(Gen.zip(cell, cell, cell, cell)) { case (a1, b1, a2, b2) =>
      val k1 = enc(org.apache.spark.sql.Row(a1, b1))
      val k2 = enc(org.apache.spark.sql.Row(a2, b2))
      assert((k1 == k2) == (a1 == a2 && b1 == b2),
        s"($a1,$b1) vs ($a2,$b2): '$k1' vs '$k2'")
    }
  }
}
