package graft

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TableEnv

/** Grammar-shaped fuzz of the hand-rolled CREATE TABLE parser (r11,
  * companion to DialectFuzzSpec): generated DDLs over adversarial shapes —
  * column names that start with clause keywords (watermark_ts,
  * primary_color, constraint_id), backticked names, nested generic types,
  * option values carrying ';' / clause keywords — asserting
  *   D1 parse is total and captures EVERY declared column;
  *   D2 parse ∘ render ∘ parse is a fixpoint: re-parsing the binding's own
  *      SHOW CREATE TABLE text reproduces the binding exactly.
  * No SparkSession needed — the parser is pure. */
class DdlFuzzSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(seed + i)))
      .flatten.take(n).toSeq
  }

  /** (declared name, parsed name) — backticks strip in the binding. */
  private val colName: Gen[(String, String)] = Gen.oneOf(
    ("plain_col", "plain_col"),
    ("watermark_ts", "watermark_ts"),     // starts with clause keyword
    ("primary_color", "primary_color"),   // ditto
    ("constraint_id", "constraint_id"),   // ditto
    ("`order`", "order"),                 // reserved word, quoted
    ("`with space`", "with space"),
    ("tumble_x", "tumble_x"),
    ("distributed_flag", "distributed_flag"),
    ("partitioned_x", "partitioned_x"))

  private val colType: Gen[String] = Gen.oneOf(
    "STRING", "INT", "BIGINT", "DOUBLE", "BOOLEAN", "VARBINARY",
    "TIMESTAMP(3)", "TIMESTAMP_LTZ(3)", "DECIMAL(10, 2)", "ARRAY<INT>",
    "MAP<STRING, INT>", "ROW<a INT, b STRING>")

  private val option: Gen[(String, String)] = Gen.oneOf(
    ("connector", "filesystem"),
    ("path", "/tmp/x;y"),                          // ';' in a value
    ("note", "DISTRIBUTED BY (x) INTO 4 BUCKETS"), // clause keyword in a value
    ("fmt.opt", "a = b"),
    ("topic", "WATERMARK FOR ts"),
    ("format", "json"))

  private case class DdlCase(
      ddl: String, names: Seq[String], nCols: Int,
      hasWm: Boolean, pk: Seq[String], opts: Map[String, String])

  private val ddlGen: Gen[DdlCase] = for {
    rawCols <- Gen.listOfN(5, Gen.zip(colName, colType)).map(_.distinctBy(_._1._2))
    n <- Gen.choose(1, rawCols.size max 1)
    cols = rawCols.take(n)
    withWm <- Gen.oneOf(true, false)
    withPk <- Gen.oneOf(true, false)
    temp <- Gen.oneOf(true, false)
    opts <- Gen.listOfN(3, option).map(_.toMap + ("connector" -> "filesystem"))
  } yield {
    val colDefs = cols.map { case ((decl, _), t) => s"  $decl $t" }
    val wmCol = "wm_ts"
    val wm = if (withWm)
      Seq(s"  $wmCol TIMESTAMP(3)", s"  WATERMARK FOR $wmCol AS $wmCol - INTERVAL '5' SECOND")
    else Nil
    val pkCols = if (withPk) Seq(cols.head._1._2) else Nil
    val pk = if (withPk) Seq(s"  PRIMARY KEY (${cols.head._1._1}) NOT ENFORCED") else Nil
    val optStr = opts.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
    DdlCase(
      s"CREATE ${if (temp) "TEMPORARY " else ""}TABLE fuzz_t (\n" +
        (colDefs ++ wm ++ pk).mkString(",\n") + s"\n) WITH ($optStr)",
      cols.map(_._1._2) ++ (if (withWm) Seq(wmCol) else Nil),
      cols.size + (if (withWm) 1 else 0),
      withWm, pkCols, opts)
  }

  test("D1: every declared column survives parsing, whatever its name") {
    val seed = 0xdd1L
    samples(ddlGen, 2000, seed).zipWithIndex.foreach { case (c, i) =>
      val b = TableEnv.parseCreateTable(c.ddl)
      assert(b.cols.map(_.name) == c.names,
        s"[case $i seed $seed] columns lost/mangled:\n${c.ddl}\n-> ${b.cols}")
      assert(b.watermark.isDefined == c.hasWm, s"[case $i] watermark:\n${c.ddl}")
      assert(b.primaryKey == c.pk, s"[case $i] pk:\n${c.ddl}\n-> $b")
      c.opts.foreach { case (k, v) =>
        assert(b.options.get(k).contains(v),
          s"[case $i] option $k lost:\n${c.ddl}\n-> ${b.options}")
      }
    }
  }

  test("D3: mutilated DDLs fail cleanly, never with an internal error") {
    val seed = 0xdd3L
    val mutG = for {
      c <- ddlGen
      mode <- Gen.choose(0, 3)
      at <- Gen.choose(0, math.max(c.ddl.length - 1, 0))
    } yield mode match {
      case 0 => c.ddl.take(at)
      case 1 => c.ddl.patch(at, "", 1)
      case 2 => c.ddl.patch(at, "'", 0)
      case _ => c.ddl.patch(at, ")", 0)
    }
    samples(mutG, 3000, seed).zipWithIndex.foreach { case (ddl, i) =>
      try TableEnv.parseCreateTable(ddl)
      catch {
        case _: IllegalArgumentException => // named rejection: fine
        case e: Throwable =>
          fail(s"[case $i seed $seed] internal error ${e.getClass.getSimpleName} " +
            s"on:\n$ddl\n${e.getMessage}")
      }
    }
  }

  test("D2: parse ∘ showCreateTable ∘ parse is a fixpoint") {
    val seed = 0xdd2L
    samples(ddlGen, 2000, seed).zipWithIndex.foreach { case (c, i) =>
      val b1 = TableEnv.parseCreateTable(c.ddl)
      val rendered = TableEnv.showCreateTable(b1)
      val b2 = TableEnv.parseCreateTable(rendered)
      assert(b2.copy(name = b1.name) == b1,
        s"[case $i seed $seed] round-trip drift:\n${c.ddl}\n--rendered--\n" +
          s"$rendered\n--b1--\n$b1\n--b2--\n$b2")
    }
  }
}
