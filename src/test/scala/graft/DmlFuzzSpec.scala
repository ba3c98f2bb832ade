package graft

import scala.collection.mutable
import scala.util.Random
import graft.engine.{Gateway, TableEnv}

/** Model-based fuzz of the batch DML surface (r12): random INSERT INTO /
  * INSERT with column list / INSERT OVERWRITE / UPDATE / DELETE / MERGE
  * against a filesystem binding, differential against an in-memory
  * reference model of the table's rows. After EVERY op the full table
  * contents are compared as a sorted multiset — the atomic
  * directory-swap rewrite (TableEnv.swapRewrite), relation-cache
  * refreshes, the column-list NULL-fill alignment, and MERGE's
  * first-match-wins clause chain all sit on this path, and a stale cache
  * or misaligned write shows up as a row diff immediately.
  *
  * Runs three ways: a plain parquet binding, a DISTRIBUTED BY bucketed
  * one (the bucketed DML path rewrites through the saved catalog table
  * and must preserve the zero-shuffle contract — EngineSpec pins the
  * plan shape; this spec pins the DATA under sustained mutation), and a
  * jdbc binding on embedded Derby (UPDATE/DELETE push the statement down
  * to the database — a different execution path entirely; MERGE is
  * documented-unsupported there and the fuzz redistributes that op).
  */
class DmlFuzzSpec extends SparkTestBase {

  private case class R(id: Long, v: Long, tag: String)

  for (variant <- Seq("plain", "bucketed", "jdbc", "partitioned"))
  test(s"model fuzz: 40 random DML ops converge with the reference model ($variant)") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession(s"dml_$variant")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    def isErr(r: gw.Page) = r.columns == Seq("error")

    val dir = java.nio.file.Files.createTempDirectory("graft-dmlfuzz").toString
    val mk = run(variant match {
      case "jdbc" =>
        s"CREATE TABLE dml_t (id BIGINT, v BIGINT, tag STRING) WITH " +
          s"('connector'='jdbc','url'='jdbc:derby:$dir/db;create=true'," +
          "'table-name'='dml_fuzz')"
      case v =>
        val dist =
          if (v == "bucketed") "DISTRIBUTED BY (id) INTO 4 BUCKETS "
          else if (v == "partitioned") "PARTITIONED BY (tag) "
          else ""
        s"CREATE TABLE dml_t (id BIGINT, v BIGINT, tag STRING) $dist" +
          s"WITH ('connector'='filesystem','path'='$dir','format'='parquet')"
    })
    assert(!isErr(mk), mk.rows)

    val seed = Map("plain" -> "550", "bucketed" -> "551", "jdbc" -> "552", "partitioned" -> "553")(variant)
    val rnd = new Random(sys.env.getOrElse("DML_FUZZ_SEED", seed).toLong)
    val model = mutable.ArrayBuffer.empty[R]
    var opLog = List.empty[String]

    def rows(k: Int): Seq[R] =
      Seq.fill(k)(R(rnd.nextInt(20).toLong, rnd.nextInt(100).toLong,
        Seq("a", "b", "c")(rnd.nextInt(3))))

    def actual(): Seq[(Long, Long, String)] = {
      val b = TableEnv.lookup("dml_t").get
      TableEnv.batchDF(gw.session(h).spark, b)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2)))
    }

    def check(step: Int): Unit = {
      val got = actual().sortBy(t => (t._1, t._2, String.valueOf(t._3)))
      val want = model.map(r => (r.id, r.v, r.tag))
        .sortBy(t => (t._1, t._2, String.valueOf(t._3))).toSeq
      assert(got == want,
        s"step $step: table diverged from model\n got: $got\nwant: $want\n" +
          s"recent:\n${opLog.take(6).mkString("\n")}")
    }

    (1 to soak(40)).foreach { step =>
      val op = rnd.nextInt(100)
      def exec(sql: String): Unit = {
        opLog = s"[$step] $sql" :: opLog
        val r = run(sql)
        assert(!isErr(r), s"step $step `$sql` failed: ${r.rows}")
      }

      if (op < 25) { // INSERT INTO ... VALUES (full row)
        val rs = rows(1 + rnd.nextInt(3))
        exec(s"INSERT INTO dml_t VALUES " +
          rs.map(r => s"(${r.id}, ${r.v}, '${r.tag}')").mkString(", "))
        model ++= rs
      } else if (op < 35) { // INSERT with a reordered column list: tag -> NULL
        val rs = rows(1 + rnd.nextInt(2))
        exec(s"INSERT INTO dml_t (v, id) VALUES " +
          rs.map(r => s"(${r.v}, ${r.id})").mkString(", "))
        model ++= rs.map(_.copy(tag = null))
      } else if (op < 43) { // INSERT OVERWRITE replaces everything
        val rs = rows(2 + rnd.nextInt(3))
        exec(s"INSERT OVERWRITE dml_t SELECT * FROM (VALUES " +
          rs.map(r => s"(CAST(${r.id} AS BIGINT), CAST(${r.v} AS BIGINT), '${r.tag}')")
            .mkString(", ") + ") AS t(id, v, tag)")
        model.clear(); model ++= rs
      } else if (op < 52) { // UPDATE with predicate (SET sees the OLD row)
        val k = 1 + rnd.nextInt(9); val m = rnd.nextInt(3)
        exec(s"UPDATE dml_t SET v = v + $k WHERE MOD(id, 3) = $m")
        model.indices.foreach { i =>
          if (model(i).id % 3 == m) model(i) = model(i).copy(v = model(i).v + k)
        }
      } else if (op < 58) { // column-swap UPDATE: both SETs see the OLD row
        val m = rnd.nextInt(2)
        exec(s"UPDATE dml_t SET id = v, v = id WHERE MOD(v, 2) = $m")
        model.indices.foreach { i =>
          val r = model(i)
          if (((r.v % 2) + 2) % 2 == m) model(i) = r.copy(id = r.v, v = r.id)
        }
      } else if (op < 65) { // UPDATE all rows
        val t = s"u$step"
        exec(s"UPDATE dml_t SET tag = '$t'")
        model.indices.foreach(i => model(i) = model(i).copy(tag = t))
      } else if (op < 75) { // DELETE with predicate
        val k = 20 + rnd.nextInt(80)
        exec(s"DELETE FROM dml_t WHERE v > $k")
        val keep = model.filterNot(_.v > k); model.clear(); model ++= keep
      } else if (op < 80) { // DELETE the NULL-tagged rows (IS NULL path)
        exec(s"DELETE FROM dml_t WHERE tag IS NULL")
        val keep = model.filter(_.tag != null); model.clear(); model ++= keep
      } else if (variant == "jdbc") { // MERGE is filesystem-only: append instead
        val rs = rows(1)
        exec(s"INSERT INTO dml_t VALUES " +
          rs.map(r => s"(${r.id}, ${r.v}, '${r.tag}')").mkString(", "))
        model ++= rs
      } else { // MERGE: distinct-id source, update matched / insert new
        val srcIds = rnd.shuffle((0 until 20).toList).take(2 + rnd.nextInt(3))
        val src = srcIds.map(id => (id.toLong, rnd.nextInt(100).toLong))
        exec("CREATE OR REPLACE TEMPORARY VIEW dml_src AS SELECT * FROM (VALUES " +
          src.map { case (id, v) => s"(CAST($id AS BIGINT), CAST($v AS BIGINT))" }
            .mkString(", ") + ") AS t(id, v)")
        exec("MERGE INTO dml_t t USING dml_src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET v = s.v " +
          "WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'm')")
        val byId = src.toMap
        model.indices.foreach { i =>
          byId.get(model(i).id).foreach(nv => model(i) = model(i).copy(v = nv))
        }
        val present = model.map(_.id).toSet
        model ++= src.collect { case (id, v) if !present(id) => R(id, v, "m") }
      }
      check(step)
    }
    gw.closeSession(h)
  }
}
