package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.engine.TableEnv

/** jdbc + values connector bindings (reference test/syntax-test.fsql:639-651,
  * grammar syntaxes/flink.tmLanguage.json:513). Derby runs in-process so the
  * jdbc path is exercised offline end-to-end.
  */
class JdbcValuesSpec extends SparkTestBase {

  private lazy val derbyUrl = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("corpus jdbc sink DDL parses; options translate to Spark JDBC keys") {
    val b = TableEnv.parseCreateTable(
      """CREATE TABLE jdbc_sink (
        |    id BIGINT,
        |    name STRING,
        |    PRIMARY KEY (id) NOT ENFORCED
        |) WITH (
        |    'connector' = 'jdbc',
        |    'url' = 'jdbc:mysql://localhost:3306/mydb',
        |    'table-name' = 'users',
        |    'username' = 'root',
        |    'password' = 'password',
        |    'sink.buffer-flush.max-rows' = '1000',
        |    'sink.buffer-flush.interval' = '10s'
        |)""".stripMargin)
    assert(b.connector == "jdbc" && b.primaryKey == Seq("id"))
    val o = TableEnv.jdbcOptions(b)
    assert(o("url").startsWith("jdbc:mysql://"))
    assert(o("dbtable") == "users" && o("user") == "root")
    assert(o("password") == "password" && o("batchsize") == "1000")
    // partitioned-scan translation (the parallel-read scale path)
    val scan = TableEnv.parseCreateTable(
      """CREATE TABLE jsrc (id BIGINT, v DOUBLE) WITH (
        |  'connector'='jdbc','url'='jdbc:derby:x','table-name'='t',
        |  'scan.partition.column'='id','scan.partition.num'='8',
        |  'scan.partition.lower-bound'='0','scan.partition.upper-bound'='100000',
        |  'scan.fetch-size'='500')""".stripMargin)
    val so = TableEnv.jdbcOptions(scan)
    assert(so("partitionColumn") == "id" && so("numPartitions") == "8")
    assert(so("lowerBound") == "0" && so("upperBound") == "100000" && so("fetchsize") == "500")
  }

  test("jdbc round-trip on derby: append, PK upsert, read back") {
    import spark.implicits._
    TableEnv.clear()
    TableEnv.createTable(spark,
      s"""CREATE TABLE dim_jdbc (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='jdbc','url'='$derbyUrl','table-name'='dim_users')""".stripMargin)
    val b = TableEnv.lookup("dim_jdbc").get
    TableEnv.batchInsert(spark, b, Seq((1L, "alice"), (2L, "bob")).toDF("id", "name"))
    // PK upsert: id=2 updated in place, id=3 inserted
    TableEnv.batchInsert(spark, b, Seq((2L, "bob-v2"), (3L, "carol")).toDF("id", "name"))
    val back = TableEnv.batchDF(spark, b)
    assert(back.count() == 3)
    assert(back.filter($"id" === 2).select("name").head().getString(0) == "bob-v2")
    // INSERT OVERWRITE replaces contents
    TableEnv.batchInsert(spark, b, Seq((9L, "only")).toDF("id", "name"), overwrite = true)
    assert(TableEnv.batchDF(spark, b).count() == 1)
  }

  test("lookup join: rate stream against a jdbc dimension") {
    import spark.implicits._
    TableEnv.clear()
    TableEnv.createTable(spark,
      s"""CREATE TABLE lk_dim (id BIGINT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='jdbc','url'='$derbyUrl','table-name'='lk_users')""".stripMargin)
    val dimB = TableEnv.lookup("lk_dim").get
    TableEnv.batchInsert(spark, dimB,
      (0L until 8L).map(i => (i, s"user-$i")).toDF("id", "name"))
    val src = TableEnv.parseCreateTable(
      "CREATE TABLE lkj (id BIGINT) WITH ('connector'='datagen','rows-per-second'='500')")
    val dim = TableEnv.batchDF(spark, dimB).withColumnRenamed("id", "dim_id")
    val stream2 = TableEnv.streamDF(spark, src)
      .withColumn("k", pmod(col("id"), lit(8)))
      .join(broadcast(dim), col("k") === col("dim_id"))
    assert(stream2.isStreaming)
    val q = stream2.writeStream.format("memory").queryName("jdbc_lookup_out").start()
    try {
      var tries = 0
      while (spark.table("jdbc_lookup_out").isEmpty && tries < 50) { Thread.sleep(200); tries += 1 }
      val rows = spark.table("jdbc_lookup_out")
      assert(!rows.isEmpty)
      assert(rows.schema.fieldNames.contains("name"))
      assert(rows.filter(col("name").startsWith("user-")).count() > 0)
    } finally q.stop()
  }

  test("jdbc streaming sink: rate stream upserted into derby via foreachBatch") {
    TableEnv.clear()
    TableEnv.createTable(spark,
      s"""CREATE TABLE snk_jdbc (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='jdbc','url'='$derbyUrl','table-name'='snk_rows')""".stripMargin)
    val snk = TableEnv.lookup("snk_jdbc").get
    val src = TableEnv.parseCreateTable(
      "CREATE TABLE snkj (id BIGINT) WITH ('connector'='datagen','rows-per-second'='500')")
    val stream = TableEnv.streamDF(spark, src)
      .select(pmod(col("id"), lit(16)).as("id")) // 16 distinct keys → upsert path
    val name = TableEnv.startStreamingInsert(spark, snk, stream)
    try {
      var tries = 0
      def cnt() = try TableEnv.batchDF(spark, snk).count() catch { case _: Exception => 0L }
      while (cnt() == 0 && tries < 50) { Thread.sleep(200); tries += 1 }
      assert(cnt() > 0 && cnt() <= 16, s"upsert kept ${cnt()} rows for 16 keys")
    } finally graft.engine.Jobs.stopAll()
  }

  test("CREATE CATALOG: second catalog usable end-to-end, then dropped") {
    import graft.engine.Gateway
    val gw = new Gateway(spark)
    val h = gw.openSession()
    val s = gw.session(h).spark
    val mk = gw.fetchResults(gw.executeStatement(h,
      "CREATE CATALOG memcat WITH ('type' = 'generic_in_memory')"), 0)
    assert(mk.rows.head.head.toString.contains("memcat"))
    // full lifecycle inside the new catalog (3-level identifiers)
    s.sql("CREATE TABLE memcat.APP.people (id BIGINT, name STRING)")
    s.sql("INSERT INTO memcat.APP.people VALUES (1, 'ada'), (2, 'grace')")
    assert(s.sql("SELECT COUNT(*) AS n FROM memcat.APP.people").head().getLong(0) == 2)
    val tabs = gw.fetchResults(gw.executeStatement(h, "SHOW TABLES IN memcat.APP"), 0)
    assert(tabs.rows.exists(_.exists(v => v != null && v.toString.toLowerCase.contains("people"))))
    val cats = gw.fetchResults(gw.executeStatement(h, "SHOW CATALOGS"), 0)
    assert(cats.rows.exists(_.exists(v => v != null && v.toString == "memcat")))
    // jdbc catalog over an on-disk derby url binds the same way
    val dir = java.nio.file.Files.createTempDirectory("graft-cat")
    gw.fetchResults(gw.executeStatement(h,
      s"CREATE CATALOG dbycat WITH ('type'='jdbc','base-url'='jdbc:derby:$dir/cat;create=true')"), 0)
    s.sql("CREATE TABLE dbycat.APP.kv (k BIGINT, v STRING)")
    assert(s.sql("SELECT COUNT(*) AS n FROM dbycat.APP.kv").head().getLong(0) == 0)
    // drop removes the registration
    gw.fetchResults(gw.executeStatement(h, "DROP CATALOG dbycat"), 0)
    assert(s.conf.getOption("spark.sql.catalog.dbycat").isEmpty)
  }

  test("values connector: data-id rows bind and SELECT; empty without data") {
    TableEnv.clear()
    TableEnv.registerValues("fixture-1",
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    TableEnv.createTable(spark,
      """CREATE TABLE v_src (id BIGINT, tag STRING)
        |WITH ('connector'='values','data-id'='fixture-1','bounded'='true')""".stripMargin)
    val got = spark.table("v_src").orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    TableEnv.createTable(spark,
      "CREATE TABLE v_empty (id BIGINT) WITH ('connector'='values')")
    assert(spark.table("v_empty").count() == 0)
  }
}
