package graft

import org.apache.spark.sql.functions._
import graft.engine.{Gateway, Jobs, TableEnv}

/** Batch UPDATE/DELETE (corpus F:189-193), the debezium-json CDC envelope
  * format (F:42), and COMPILE/EXECUTE PLAN (G:379).
  */
class CdcDmlSpec extends SparkTestBase {

  private def gwSession(): (Gateway, String) = {
    val gw = new Gateway(spark)
    (gw, gw.openSession())
  }

  test("UPDATE and DELETE rewrite a filesystem binding via directory swap") {
    TableEnv.clear()
    val (gw, h) = gwSession()
    val out = java.nio.file.Files.createTempDirectory("graft-dml").toString
    gw.executeStatement(h,
      "CREATE TABLE dml_src (id BIGINT, v DOUBLE) WITH ('connector'='datagen','number-of-rows'='50')")
    gw.executeStatement(h,
      s"CREATE TABLE dml_t (id BIGINT, v DOUBLE) WITH ('connector'='filesystem','path'='$out','format'='parquet')")
    gw.fetchResults(gw.executeStatement(h, "INSERT INTO dml_t SELECT id, v FROM dml_src"), 0)
    val before = spark.read.parquet(out).agg(sum("v")).head().getDouble(0)
    val up = gw.fetchResults(gw.executeStatement(h,
      "UPDATE dml_t SET v = v * 2 WHERE id >= 0"), 0)
    assert(up.rows.head.head.toString.contains("50 rows updated"))
    val after = spark.read.parquet(out).agg(sum("v")).head().getDouble(0)
    assert(math.abs(after - 2 * before) < 1e-6)
    // partial update evaluates SET against OLD values only where matched
    val median = spark.read.parquet(out).selectExpr("percentile(id, 0.5)").head().getDouble(0).toLong
    gw.fetchResults(gw.executeStatement(h, s"UPDATE dml_t SET v = 0 WHERE id <= $median"), 0)
    val zeros = spark.read.parquet(out).filter(col("v") === 0).count()
    assert(zeros > 0 && zeros < 50)
    val del = gw.fetchResults(gw.executeStatement(h, s"DELETE FROM dml_t WHERE id <= $median"), 0)
    assert(del.rows.head.head.toString.contains("deleted"))
    assert(spark.read.parquet(out).count() == 50 - zeros)
    // binding still queryable after swaps
    val n = gw.fetchResults(gw.executeStatement(h, "SELECT COUNT(*) AS n FROM dml_t"), 0)
    assert(n.rows.head.head.toString.toLong == 50 - zeros)
  }

  test("UPDATE and DELETE push down to a jdbc binding") {
    import spark.implicits._
    TableEnv.clear()
    val (gw, h) = gwSession()
    val dir = java.nio.file.Files.createTempDirectory("graft-dml-jdbc")
    gw.executeStatement(h,
      s"""CREATE TABLE jt (id BIGINT, v BIGINT, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='jdbc','url'='jdbc:derby:$dir/db;create=true','table-name'='jt_rows')""".stripMargin)
    val b = TableEnv.lookup("jt").get
    TableEnv.batchInsert(spark, b, (1L to 10L).map(i => (i, i)).toDF("id", "v"))
    val up = gw.fetchResults(gw.executeStatement(h, "UPDATE jt SET v = v + 100 WHERE id <= 3"), 0)
    assert(up.rows.head.head.toString.contains("3 rows updated"))
    assert(TableEnv.batchDF(spark, b).filter($"v" > 100).count() == 3)
    val del = gw.fetchResults(gw.executeStatement(h, "DELETE FROM jt WHERE id > 8"), 0)
    assert(del.rows.head.head.toString.contains("2 rows deleted"))
    assert(TableEnv.batchDF(spark, b).count() == 8)
  }

  private def writeDebezium(dir: java.nio.file.Path): Unit = {
    val lines = Seq(
      """{"before": null, "after": {"id": 1, "name": "ada"}, "op": "c", "ts_ms": 1000}""",
      """{"before": null, "after": {"id": 2, "name": "bob"}, "op": "c", "ts_ms": 1001}""",
      """{"before": {"id": 2, "name": "bob"}, "after": {"id": 2, "name": "bob2"}, "op": "u", "ts_ms": 1002}""",
      """{"before": {"id": 1, "name": "ada"}, "after": null, "op": "d", "ts_ms": 1003}""")
    java.nio.file.Files.write(dir.resolve("cdc.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("debezium-json decodes images, op and ts_ms metadata") {
    TableEnv.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-dbz")
    writeDebezium(dir)
    TableEnv.createTable(spark,
      s"""CREATE TABLE dbz (
         |  id BIGINT, name STRING,
         |  op STRING METADATA FROM 'op' VIRTUAL,
         |  src_ts TIMESTAMP(3) METADATA FROM 'ts_ms' VIRTUAL
         |) WITH ('connector'='filesystem','path'='$dir','format'='debezium-json')""".stripMargin)
    val rows = TableEnv.batchDF(spark, TableEnv.lookup("dbz").get)
      .orderBy(col("__ts_ms"))
      .collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("c", "c", "u", "d"))
    // after-image for c/u, before-image for d
    assert(rows(2).getAs[String]("name") == "bob2")
    assert(rows(3).getAs[Long]("id") == 1 && rows(3).getAs[String]("name") == "ada")
    assert(rows.head.getAs[java.time.LocalDateTime]("src_ts") != null ||
      rows.head.get(rows.head.fieldIndex("src_ts")) != null)
  }

  test("canal-json and maxwell-json decode to the same changelog shape") {
    TableEnv.clear()
    val cdir = java.nio.file.Files.createTempDirectory("graft-canal")
    java.nio.file.Files.write(cdir.resolve("c.json"), Seq(
      """{"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "old": null, "type": "INSERT", "ts": 5000}""",
      """{"data": [{"id": 1, "name": "a"}], "old": null, "type": "DELETE", "ts": 5001}""")
      .mkString("\n").getBytes("UTF-8"))
    TableEnv.createTable(spark,
      s"""CREATE TABLE canal_t (id BIGINT, name STRING, op STRING METADATA FROM 'op' VIRTUAL)
         |WITH ('connector'='filesystem','path'='$cdir','format'='canal-json')""".stripMargin)
    val canal = TableEnv.batchDF(spark, TableEnv.lookup("canal_t").get)
      .orderBy(col("__ts_ms"), col("id")).collect()
    assert(canal.map(r => (r.getAs[Long]("id"), r.getAs[String]("op"))).toSeq ==
      Seq((1L, "c"), (2L, "c"), (1L, "d"))) // data[] exploded; DELETE carries the row
    val mdir = java.nio.file.Files.createTempDirectory("graft-maxwell")
    java.nio.file.Files.write(mdir.resolve("m.json"), Seq(
      """{"data": {"id": 7, "name": "x"}, "old": null, "type": "insert", "ts": 9}""",
      """{"data": {"id": 7, "name": "x2"}, "old": {"id": 7, "name": "x"}, "type": "update", "ts": 10}""")
      .mkString("\n").getBytes("UTF-8"))
    TableEnv.createTable(spark,
      s"""CREATE TABLE maxwell_t (id BIGINT, name STRING)
         |WITH ('connector'='filesystem','path'='$mdir','format'='maxwell-json')""".stripMargin)
    val mx = TableEnv.batchDF(spark, TableEnv.lookup("maxwell_t").get)
      .orderBy(col("__ts_ms")).collect()
    assert(mx.map(r => (r.getAs[String]("name"), r.getAs[String]("__op"), r.getAs[Long]("__ts_ms"))).toSeq ==
      Seq(("x", "c", 9000L), ("x2", "u", 10000L))) // seconds → millis
  }

  test("ogg-json decodes images, op letters and GoldenGate metadata") {
    TableEnv.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-ogg")
    java.nio.file.Files.write(dir.resolve("ogg.json"), Seq(
      """{"before": null, "after": {"id": 1, "name": "ada"}, "op_type": "I", "op_ts": "2024-01-01 00:00:01.000000", "current_ts": "2024-01-01 00:00:02.000000", "table": "SRC.T", "pos": "0001", "primary_keys": ["id"]}""",
      """{"before": {"id": 1, "name": "ada"}, "after": {"id": 1, "name": "ada2"}, "op_type": "U", "op_ts": "2024-01-01 00:00:03.000000", "current_ts": "2024-01-01 00:00:04.000000", "table": "SRC.T", "pos": "0002", "primary_keys": ["id"]}""",
      """{"before": {"id": 1, "name": "ada2"}, "after": null, "op_type": "D", "op_ts": "2024-01-01 00:00:05.000000", "current_ts": "2024-01-01 00:00:06.000000", "table": "SRC.T", "pos": "0003", "primary_keys": ["id"]}""")
      .mkString("\n").getBytes("UTF-8"))
    TableEnv.createTable(spark,
      s"""CREATE TABLE ogg_t (
         |  id BIGINT, name STRING,
         |  op STRING METADATA FROM 'op' VIRTUAL,
         |  src_tbl STRING METADATA FROM 'table' VIRTUAL,
         |  pks ARRAY<STRING> METADATA FROM 'primary-keys' VIRTUAL,
         |  ingest TIMESTAMP(3) METADATA FROM 'ingestion-timestamp' VIRTUAL
         |) WITH ('connector'='filesystem','path'='$dir','format'='ogg-json')""".stripMargin)
    val rows = TableEnv.batchDF(spark, TableEnv.lookup("ogg_t").get)
      .orderBy(col("__ts_ms")).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("c", "u", "d"))
    // after-image for I/U, before-image for D
    assert(rows(1).getAs[String]("name") == "ada2")
    assert(rows(2).getAs[String]("name") == "ada2")
    assert(rows.map(_.getAs[String]("src_tbl")).distinct.toSeq == Seq("SRC.T"))
    assert(rows.head.getAs[scala.collection.Seq[String]]("pks") == Seq("id"))
    // op_ts drives __ts_ms (millis); current_ts drives ingestion-timestamp
    assert(rows.head.getAs[Long]("__ts_ms") == 1704067201000L)
    assert(rows.head.get(rows.head.fieldIndex("ingest")) != null)
  }

  test("mysql-cdc connector: verbatim corpus DDL parses; snapshot + changelog replay") {
    TableEnv.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-mysql-cdc")
    writeDebezium(dir)
    // the corpus DDL (F:705-720) with the emulation knob appended
    TableEnv.createTable(spark,
      s"""CREATE TABLE mysql_cdc_source (
         |    id BIGINT,
         |    name STRING,
         |    PRIMARY KEY (id) NOT ENFORCED
         |) WITH (
         |    'connector' = 'mysql-cdc',
         |    'hostname' = 'localhost',
         |    'port' = '3306',
         |    'username' = 'root',
         |    'password' = 'password',
         |    'database-name' = 'mydb',
         |    'table-name' = 'users',
         |    'server-id' = '5400-5404',
         |    'server-time-zone' = 'UTC',
         |    'changelog.path' = '$dir'
         |)""".stripMargin)
    val b = TableEnv.lookup("mysql_cdc_source").get
    // bounded read = snapshot: ada inserted then deleted, bob updated to bob2
    val snap = TableEnv.batchDF(spark, b).collect()
    assert(snap.map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSeq ==
      Seq((2L, "bob2")), snap.mkString(","))
    assert(!snap.head.schema.fieldNames.contains("__op"))
    // same-millisecond insert+delete tie: the delete wins deterministically
    // (a deleted key must never be resurrected by an ambiguous tie)
    java.nio.file.Files.write(dir.resolve("tie.json"), Seq(
      """{"before": null, "after": {"id": 9, "name": "tie"}, "op": "c", "ts_ms": 2000}""",
      """{"before": {"id": 9, "name": "tie"}, "after": null, "op": "d", "ts_ms": 2000}""")
      .mkString("\n").getBytes("UTF-8"))
    val snap2 = TableEnv.batchDF(spark, b).collect()
    assert(!snap2.exists(_.getAs[Long]("id") == 9L), snap2.mkString(","))
    // unbounded read = the changelog rows, op/ts riding along
    val stream = TableEnv.streamDF(spark, b)
    assert(stream.isStreaming && stream.columns.contains("__op"))
    // without the knob the binding fails fast with a pointer to it
    TableEnv.createTable(spark,
      """CREATE TABLE pg_bare (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
        |WITH ('connector'='postgres-cdc','hostname'='x','database-name'='d')""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      TableEnv.batchDF(spark, TableEnv.lookup("pg_bare").get)
    }
    assert(e.getMessage.contains("changelog.path"))
  }

  test("CDC end-to-end: debezium stream applied to a jdbc PK sink") {
    import spark.implicits._
    TableEnv.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-dbz-e2e")
    writeDebezium(dir)
    val dbdir = java.nio.file.Files.createTempDirectory("graft-dbz-db")
    TableEnv.createTable(spark,
      s"""CREATE TABLE cdc_src (id BIGINT, name STRING)
         |WITH ('connector'='filesystem','path'='$dir','format'='debezium-json')""".stripMargin)
    TableEnv.createTable(spark,
      s"""CREATE TABLE cdc_snk (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='jdbc','url'='jdbc:derby:$dbdir/db;create=true','table-name'='cdc_state')""".stripMargin)
    val snk = TableEnv.lookup("cdc_snk").get
    val stream = TableEnv.streamDF(spark, TableEnv.lookup("cdc_src").get)
    assert(stream.isStreaming && stream.columns.contains("__op"))
    TableEnv.startStreamingInsert(spark, snk, stream)
    try {
      var tries = 0
      def state() = try TableEnv.batchDF(spark, snk).collect() catch { case _: Exception => Array.empty[org.apache.spark.sql.Row] }
      while (state().isEmpty && tries < 100) { Thread.sleep(200); tries += 1 }
      Thread.sleep(1000) // let the full batch apply
      val rows = state()
      // ada was inserted then deleted; bob was inserted then updated
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "bob2")),
        rows.mkString(","))
    } finally Jobs.stopAll()
  }

  test("elasticsearch-7 sink spools the exact bulk-API NDJSON stream") {
    import spark.implicits._
    TableEnv.clear()
    val spool = java.nio.file.Files.createTempDirectory("graft-es").toString
    // corpus DDL (F:654-662) + the spool path
    TableEnv.createTable(spark,
      s"""CREATE TABLE es_sink (
         |    id STRING,
         |    name STRING,
         |    PRIMARY KEY (id) NOT ENFORCED
         |) WITH (
         |    'connector' = 'elasticsearch-7',
         |    'hosts' = 'http://localhost:9200',
         |    'index' = 'my-index',
         |    'path' = '$spool'
         |)""".stripMargin)
    val b = TableEnv.lookup("es_sink").get
    TableEnv.batchInsert(spark, b, Seq(("1", "ada"), ("2", "bo\"b")).toDF("id", "name"))
    val lines = spark.read.option("recursiveFileLookup", "true")
      .textFile(spool).collect().sorted
    assert(lines.length == 4, lines.mkString("|")) // 2 docs × (action + source)
    assert(lines.contains("""{"index":{"_index":"my-index","_id":"1"}}"""))
    assert(lines.contains("""{"id":"2","name":"bo\"b"}""")) // json-escaped doc
    // changelog input: one compacted action per key, delete action for d
    val cdc = Seq(
      ("1", "ada", "u", 10L), ("1", "ada2", "u", 11L), ("2", "x", "d", 12L))
      .toDF("id", "name", "__op", "__ts_ms")
    val recs = TableEnv.esBulkRecords(cdc, b).as[String].collect().sorted
    assert(recs.length == 2, recs.mkString("|"))
    assert(recs.contains("""{"delete":{"_index":"my-index","_id":"2"}}"""))
    assert(recs.exists(_.endsWith("""{"id":"1","name":"ada2"}""")), recs.mkString("|"))
    // a CDC stream into a PK-less index has no addressable documents
    val bare = TableEnv.parseCreateTable(
      "CREATE TABLE es_bare (id STRING) WITH ('connector'='elasticsearch-7')")
    val e = intercept[IllegalArgumentException] {
      TableEnv.esBulkRecords(Seq(("1", "d", 1L)).toDF("id", "__op", "__ts_ms"), bare)
    }
    assert(e.getMessage.contains("PRIMARY KEY"))
  }

  test("upsert-kafka records: PK key json, tombstone value for CDC deletes") {
    import spark.implicits._
    TableEnv.clear()
    val b = TableEnv.parseCreateTable(
      """CREATE TABLE uk (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
        |WITH ('connector'='upsert-kafka','topic'='t')""".stripMargin)
    val plain = TableEnv.upsertKafkaRecords(
      Seq((1L, "a")).toDF("id", "name"), b).collect()
    assert(plain.head.getString(0) == """{"id":1}""")
    assert(plain.head.getString(1) == """{"id":1,"name":"a"}""")
    val cdc = TableEnv.upsertKafkaRecords(
      Seq((1L, "a", "u", 5L), (2L, "b", "d", 6L)).toDF("id", "name", "__op", "__ts_ms"), b)
      .orderBy("key").collect()
    assert(cdc(0).getString(1) == """{"id":1,"name":"a"}""")
    assert(cdc(1).getString(0) == """{"id":2}""" && cdc(1).isNullAt(1)) // tombstone
  }

  test("COMPILE PLAN persists statement + plan; EXECUTE PLAN replays it") {
    TableEnv.clear()
    val (gw, h) = gwSession()
    val out = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val planFile = s"$out/insert.plan"
    gw.executeStatement(h,
      "CREATE TABLE cp_src (id BIGINT) WITH ('connector'='datagen','number-of-rows'='10')")
    gw.executeStatement(h,
      s"CREATE TABLE cp_snk (id BIGINT) WITH ('connector'='filesystem','path'='$out/data','format'='parquet')")
    val comp = gw.fetchResults(gw.executeStatement(h,
      s"COMPILE PLAN '$planFile' FOR INSERT INTO cp_snk SELECT id FROM cp_src"), 0)
    assert(comp.rows.head.head.toString.contains("compiled"))
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(planFile)), "UTF-8")
    assert(txt.startsWith("GRAFT COMPILED PLAN") && txt.contains("Physical Plan"))
    val exec = gw.fetchResults(gw.executeStatement(h, s"EXECUTE PLAN '$planFile'"), 0)
    assert(exec.rows.head.head.toString.contains("Inserted into cp_snk"))
    assert(spark.read.parquet(s"$out/data").count() == 10)
  }

  test("MERGE INTO: update, delete, and insert clauses with first-match-wins") {
    import spark.implicits._
    TableEnv.clear()
    val (gw, h) = gwSession()
    val out = java.nio.file.Files.createTempDirectory("graft-merge").toString
    gw.executeStatement(h,
      s"CREATE TABLE mt (id BIGINT, v BIGINT, tag STRING) WITH ('connector'='filesystem','path'='$out','format'='parquet')")
    val b = TableEnv.lookup("mt").get
    TableEnv.batchInsert(spark, b,
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")).toDF("id", "v", "tag"))
    val srcDir = java.nio.file.Files.createTempDirectory("graft-merge-src").toString
    Seq((1L, 100L), (3L, 300L), (4L, 400L)).toDF("sid", "sv")
      .write.mode("overwrite").parquet(srcDir)
    gw.executeStatement(h,
      s"CREATE TABLE msrc (sid BIGINT, sv BIGINT) WITH ('connector'='filesystem','path'='$srcDir','format'='parquet')")
    val res = gw.fetchResults(gw.executeStatement(h,
      """MERGE INTO mt t USING msrc s ON t.id = s.sid
        |WHEN MATCHED AND s.sv >= 300 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.sv, tag = 'merged'
        |WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.sid, s.sv, 'new')""".stripMargin), 0)
    assert(res.rows.head.head.toString.contains("2 matched rows affected, 1 inserted"))
    val got = spark.read.parquet(out).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // id=1 updated, id=2 untouched, id=3 deleted (first clause wins), id=4 inserted
    assert(got == Seq((1L, 100L, "merged"), (2L, 20L, "b"), (4L, 400L, "new")))
  }

  test("MERGE UPDATE casts SET expressions back to the column type; CASE in AND parses") {
    import spark.implicits._
    TableEnv.clear()
    val (gw, h) = gwSession()
    val out = java.nio.file.Files.createTempDirectory("graft-merge3").toString
    gw.executeStatement(h,
      s"CREATE TABLE mt3 (id BIGINT, v BIGINT) WITH ('connector'='filesystem','path'='$out','format'='parquet')")
    TableEnv.batchInsert(spark, TableEnv.lookup("mt3").get,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    val srcDir = java.nio.file.Files.createTempDirectory("graft-merge3-src").toString
    Seq((1L, 5L), (2L, 0L)).toDF("sid", "sv").write.mode("overwrite").parquet(srcDir)
    gw.executeStatement(h,
      s"CREATE TABLE msrc3 (sid BIGINT, sv BIGINT) WITH ('connector'='filesystem','path'='$srcDir','format'='parquet')")
    // SET v = v * 1.5 would widen BIGINT to DOUBLE and brick the binding's
    // declared schema on the next read; the AND predicate carries a CASE
    // whose inner THEN must not terminate the clause condition
    gw.fetchResults(gw.executeStatement(h,
      """MERGE INTO mt3 t USING msrc3 s ON t.id = s.sid
        |WHEN MATCHED AND CASE WHEN s.sv > 0 THEN true ELSE false END
        |  THEN UPDATE SET v = t.v * 1.5""".stripMargin), 0)
    val got = spark.read.parquet(out).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 15L), (2L, 20L))) // id=2's clause predicate is false
  }

  test("MERGE INTO rejects multi-match cardinality violations") {
    import spark.implicits._
    TableEnv.clear()
    val (gw, h) = gwSession()
    val out = java.nio.file.Files.createTempDirectory("graft-merge2").toString
    gw.executeStatement(h,
      s"CREATE TABLE mt2 (id BIGINT, v BIGINT) WITH ('connector'='filesystem','path'='$out','format'='parquet')")
    TableEnv.batchInsert(spark, TableEnv.lookup("mt2").get, Seq((1L, 10L)).toDF("id", "v"))
    val srcDir2 = java.nio.file.Files.createTempDirectory("graft-merge2-src").toString
    Seq((1L, 1L), (1L, 2L)).toDF("sid", "sv").write.mode("overwrite").parquet(srcDir2)
    gw.executeStatement(h,
      s"CREATE TABLE msrc2 (sid BIGINT, sv BIGINT) WITH ('connector'='filesystem','path'='$srcDir2','format'='parquet')")
    val r = gw.fetchResults(gw.executeStatement(h,
      "MERGE INTO mt2 t USING msrc2 s ON t.id = s.sid WHEN MATCHED THEN UPDATE SET v = s.sv"), 0)
    assert(r.rows.head.head.toString.toLowerCase.contains("cardinality"))
    // target untouched after the failed merge
    assert(spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L)))
  }

  test("MERGE INTO rejects mispaired clause/action combinations") {
    TableEnv.clear()
    val (gw, h) = gwSession()
    val out = java.nio.file.Files.createTempDirectory("graft-merge4").toString
    gw.executeStatement(h,
      s"CREATE TABLE mt4 (id BIGINT, v BIGINT) WITH ('connector'='filesystem','path'='$out','format'='parquet')")
    gw.executeStatement(h,
      "CREATE TABLE msrc4 (sid BIGINT, sv BIGINT) WITH ('connector'='datagen','number-of-rows'='3')")
    // WHEN MATCHED + INSERT would silently claim matched rows as a no-op in
    // the first-match-wins chain; WHEN NOT MATCHED + UPDATE/DELETE would
    // MatchError deep in the rewrite — both must fail fast at parse
    val m1 = gw.fetchResults(gw.executeStatement(h,
      "MERGE INTO mt4 t USING msrc4 s ON t.id = s.sid WHEN MATCHED THEN INSERT VALUES (s.sid, s.sv)"), 0)
    assert(m1.columns == Seq("error") &&
      m1.rows.head.head.toString.contains("UPDATE or DELETE"), s"got $m1")
    val m2 = gw.fetchResults(gw.executeStatement(h,
      "MERGE INTO mt4 t USING msrc4 s ON t.id = s.sid WHEN NOT MATCHED THEN UPDATE SET v = s.sv"), 0)
    assert(m2.columns == Seq("error") &&
      m2.rows.head.head.toString.contains("can only INSERT"), s"got $m2")
    val m3 = gw.fetchResults(gw.executeStatement(h,
      "MERGE INTO mt4 t USING msrc4 s ON t.id = s.sid WHEN NOT MATCHED THEN DELETE"), 0)
    assert(m3.columns == Seq("error") &&
      m3.rows.head.head.toString.contains("can only INSERT"), s"got $m3")
  }

  test("ALTER evolution over a CDC binding: generations NULL-fill, drops project away (r14)") {
    TableEnv.clear()
    val gw = new graft.engine.Gateway(spark)
    val h = gw.openSession("cdc_alter")
    def run(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-alter")
    java.nio.file.Files.write(dir.resolve("cdc.json"), Seq(
      """{"before": null, "after": {"id": 1, "name": "ada"}, "op": "c", "ts_ms": 1000}""",
      """{"before": null, "after": {"id": 2, "name": "bob"}, "op": "c", "ts_ms": 1001}""")
      .mkString("\n").getBytes("UTF-8"))
    assert(run(s"CREATE TABLE dbz_ev (id BIGINT, name STRING) WITH " +
      s"('connector'='filesystem','path'='$dir','format'='debezium-json')")
      .columns != Seq("error"))
    // ADD: old changelog lines lack the field -> NULL-fill; a new
    // generation carries it
    assert(run("ALTER TABLE dbz_ev ADD score DOUBLE").columns != Seq("error"))
    java.nio.file.Files.write(dir.resolve("cdc2.json"),
      ("""{"before": null, "after": {"id": 3, "name": "eve", "score": 9.5}, "op": "c", "ts_ms": 1002}""" + "\n")
        .getBytes("UTF-8"))
    val r1 = run("SELECT id, name, score FROM dbz_ev ORDER BY id")
    assert(r1.rows.map(_.toList) ==
      Seq(List(1L, "ada", null), List(2L, "bob", null), List(3L, "eve", 9.5)), r1.rows)
    // DROP: the changelog still carries 'name'; it must project away
    assert(run("ALTER TABLE dbz_ev DROP name").columns != Seq("error"))
    val r2 = run("SELECT id, score FROM dbz_ev ORDER BY id")
    assert(r2.rows.map(_.toList) ==
      Seq(List(1L, null), List(2L, null), List(3L, 9.5)), r2.rows)
    // retype on a json-backed cdc binding re-parses text: DOUBLE -> STRING ok
    assert(run("ALTER TABLE dbz_ev MODIFY score STRING").columns != Seq("error"))
    assert(run("SELECT score FROM dbz_ev WHERE id = 3").rows == Seq(Seq("9.5")))
    gw.closeSession(h)
  }
}
