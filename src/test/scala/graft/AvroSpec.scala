package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.TableEnv
import graft.sources.AvroFiles

/** Avro container files (filesystem format) and the kafka `avro` /
  * `avro-confluent` value formats (reference F:622-640; G:518), built on the
  * core Avro library — real codec, our Spark plumbing. */
class AvroSpec extends SparkTestBase {

  private val fullSchema = StructType(Seq(
    StructField("b", BooleanType), StructField("i", IntegerType),
    StructField("l", LongType), StructField("f", FloatType),
    StructField("d", DoubleType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("dec", DecimalType(12, 3)),
    StructField("dt", DateType), StructField("ts", TimestampType),
    StructField("ntz", TimestampNTZType),
    StructField("arr", ArrayType(LongType)),
    StructField("m", MapType(StringType, DoubleType)),
    StructField("rec", StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))))

  private def fullRow(i: Long): Row = Row(
    i % 2 == 0, i.toInt, i, i.toFloat, i.toDouble, s"s$i",
    Array[Byte](i.toByte, (i + 1).toByte),
    new java.math.BigDecimal(s"$i.25").setScale(3),
    java.sql.Date.valueOf("2024-03-01"),
    java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456"),
    java.time.LocalDateTime.parse("2024-03-01T10:30:00.000123"),
    Seq(i, i + 1), Map("k" -> i.toDouble), Row(i, s"y$i"))

  test("container round-trip preserves every supported type") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-rt").toString
    val df = spark.createDataFrame(
      java.util.List.of(fullRow(1), fullRow(2), Row(null, null, null, null, null,
        null, null, null, null, null, null, null, null, null)), fullSchema)
      .repartition(2)
    val n = AvroFiles.write(df, dir, overwrite = true)
    assert(n == 3)
    val back = AvroFiles.read(spark, dir, fullSchema)
    assert(back.schema == fullSchema)
    val rows = back.orderBy(col("l").asc_nulls_last).collect()
    assert(rows.length == 3)
    val r = rows.head
    assert(r.getAs[Long]("l") == 1L && r.getAs[String]("s") == "s1")
    assert(r.getAs[Array[Byte]]("bin").toSeq == Seq(1.toByte, 2.toByte))
    assert(r.getAs[java.math.BigDecimal]("dec") ==
      new java.math.BigDecimal("1.250"))
    assert(r.getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")) // micros kept
    assert(r.getAs[java.time.LocalDateTime]("ntz").getNano == 123000)
    assert(r.getAs[scala.collection.Seq[Long]]("arr") == Seq(1L, 2L))
    assert(r.getAs[scala.collection.Map[String, Double]]("m") == Map("k" -> 1.0))
    assert(r.getAs[Row]("rec") == Row(1L, "y1"))
    assert(rows.last.toSeq.forall(_ == null)) // all-null row survives
  }

  test("filesystem avro binding: INSERT + SELECT through the engine") {
    TableEnv.clear()
    val gw = new graft.engine.Gateway(spark)
    val h = gw.openSession()
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-tbl").toString
    gw.executeStatement(h,
      "CREATE TABLE av_src (id BIGINT, v DOUBLE) WITH ('connector'='datagen','number-of-rows'='100')")
    gw.executeStatement(h,
      s"CREATE TABLE av_t (id BIGINT, v DOUBLE) WITH ('connector'='filesystem','path'='$dir','format'='avro')")
    gw.fetchResults(gw.executeStatement(h, "INSERT INTO av_t SELECT id, v FROM av_src"), 0)
    val srcSum = gw.fetchResults(gw.executeStatement(h,
      "SELECT SUM(id) AS s FROM av_src"), 0).rows.head.head.toString.toLong
    val cnt = gw.fetchResults(gw.executeStatement(h, "SELECT COUNT(*) AS n, SUM(id) AS s FROM av_t"), 0)
    assert(cnt.rows.head.head.toString.toLong == 100L)
    assert(cnt.rows.head(1).toString.toLong == srcSum)
    // the files on disk are genuine avro container files
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val magic = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
    assert(magic.toSeq == Seq('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
    // INSERT OVERWRITE replaces
    gw.fetchResults(gw.executeStatement(h,
      "INSERT OVERWRITE av_t SELECT id, v FROM (SELECT * FROM av_src ORDER BY id LIMIT 10)"), 0)
    val cnt2 = gw.fetchResults(gw.executeStatement(h, "SELECT COUNT(*) AS n FROM av_t"), 0)
    assert(cnt2.rows.head.head.toString.toLong == 10L)
  }

  test("kafka avro-confluent value decode: wire header stripped, schema applied") {
    val payload = StructType(Seq(
      StructField("user_id", LongType), StructField("name", StringType)))
    val bytes = AvroFiles.encodeValue(Row(7L, "ada"), payload,
      confluent = true, schemaId = 42)
    assert(bytes(0) == 0x00 && bytes.length > 5)
    // the column decoder is what the kafka source path applies to `value`
    implicit val enc = Encoders.BINARY
    val df = spark.createDataset(Seq(bytes)).toDF("value")
      .select(AvroFiles.fromAvroValue(col("value"), payload, confluent = true).as("d"))
      .select("d.user_id", "d.name")
    assert(df.collect().toSeq == Seq(Row(7L, "ada")))
    // plain avro (no header) decodes through the same path
    val plain = AvroFiles.encodeValue(Row(8L, "bob"), payload)
    val df2 = spark.createDataset(Seq(plain)).toDF("value")
      .select(AvroFiles.fromAvroValue(col("value"), payload, confluent = false).as("d"))
    assert(df2.select("d.name").head().getString(0) == "bob")
    // corrupted header fails loudly, not silently
    val e = intercept[Exception] {
      spark.createDataset(Seq(Array[Byte](1, 2, 3))).toDF("value")
        .select(AvroFiles.fromAvroValue(col("value"), payload, confluent = true))
        .collect()
    }
    assert(e.getMessage != null)
    // the corpus DDL (F:626-640) parses and registers with the format carried
    TableEnv.clear()
    TableEnv.createTable(spark,
      """CREATE TABLE kafka_avro_source (
        |    user_id BIGINT,
        |    item_id BIGINT,
        |    category_id BIGINT,
        |    behavior STRING
        |) WITH (
        |    'connector' = 'kafka',
        |    'topic' = 'user_behavior_avro',
        |    'properties.bootstrap.servers' = 'localhost:9092',
        |    'format' = 'avro-confluent',
        |    'avro-confluent.url' = 'http://schema-registry:8081'
        |)""".stripMargin)
    assert(TableEnv.lookup("kafka_avro_source").get.format == "avro-confluent")
  }

  test("self-referential INSERT OVERWRITE and numeric widening read") {
    TableEnv.clear()
    val gw = new graft.engine.Gateway(spark)
    val h = gw.openSession()
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-self").toString
    gw.executeStatement(h,
      "CREATE TABLE avs_src (id BIGINT, v DOUBLE) WITH ('connector'='datagen','number-of-rows'='20')")
    gw.executeStatement(h,
      s"CREATE TABLE avs_t (id BIGINT, v DOUBLE) WITH ('connector'='filesystem','path'='$dir','format'='avro')")
    gw.fetchResults(gw.executeStatement(h, "INSERT INTO avs_t SELECT id, v FROM avs_src"), 0)
    // overwrite FROM ITSELF: the old generation must be read, not deleted
    // out from under the job
    gw.fetchResults(gw.executeStatement(h,
      "INSERT OVERWRITE avs_t SELECT id, v FROM (SELECT * FROM avs_t ORDER BY id LIMIT 10)"), 0)
    val n = gw.fetchResults(gw.executeStatement(h, "SELECT COUNT(*) AS n FROM avs_t"), 0)
    assert(n.rows.head.head.toString.toLong == 10L)
    // only one generation of files remains after the overwrite commit
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.map(_.getName.split("-").last).distinct.length == 1, files.map(_.getName).toSeq)

    // widening: a file written with INT/FLOAT reads into BIGINT/DOUBLE columns
    val wdir = java.nio.file.Files.createTempDirectory("graft-avro-widen").toString
    val narrow = StructType(Seq(
      StructField("i", IntegerType), StructField("f", FloatType)))
    AvroFiles.write(spark.createDataFrame(
      java.util.List.of(Row(7, 1.5f)), narrow), wdir)
    val wide = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType)))
    val r = AvroFiles.read(spark, wdir, wide).head()
    assert(r.getLong(0) == 7L && r.getDouble(1) == 1.5d)
  }

  test("kafka record decode covers raw, csv, key.fields and debezium-avro-confluent") {
    import spark.implicits._
    TableEnv.clear()
    // a synthetic kafka source frame: the decode path is a pure transform
    def kafkaFrame(key: Array[Byte], value: Array[Byte]) =
      Seq((key, value, new java.sql.Timestamp(1700000000000L), 0, 42L))
        .toDF("key", "value", "timestamp", "partition", "offset")

    // raw: single STRING column from the value bytes, charset-decoded
    val braw = TableEnv.parseCreateTable(
      """CREATE TABLE raw_t (line STRING, off BIGINT METADATA FROM 'offset' VIRTUAL)
        |WITH ('connector'='kafka','topic'='t','format'='raw')""".stripMargin)
    val rawRow = TableEnv.decodeKafkaRecords(
      kafkaFrame(null, "héllo".getBytes("UTF-8")), braw).head()
    assert(rawRow.getAs[String]("line") == "héllo" && rawRow.getAs[Long]("off") == 42L)
    // raw rejects multi-column tables and non-string/bytes types
    val bbad = TableEnv.parseCreateTable(
      "CREATE TABLE raw_bad (a STRING, bcol STRING) WITH ('connector'='kafka','format'='raw')")
    val e1 = intercept[Exception] {
      TableEnv.decodeKafkaRecords(kafkaFrame(null, "x".getBytes), bbad).head()
    }
    assert(e1.getMessage.contains("exactly one"))

    // csv value format
    val bcsv = TableEnv.parseCreateTable(
      """CREATE TABLE csv_t (id BIGINT, name STRING)
        |WITH ('connector'='kafka','format'='csv')""".stripMargin)
    val csvRow = TableEnv.decodeKafkaRecords(kafkaFrame(null, "7,ada".getBytes), bcsv).head()
    assert(csvRow.getAs[Long]("id") == 7L && csvRow.getAs[String]("name") == "ada")
    // 'value.format' is an alias for 'format', and its csv.* options apply
    val bvf = TableEnv.parseCreateTable(
      """CREATE TABLE vf_t (id BIGINT, name STRING)
        |WITH ('connector'='kafka','value.format'='csv','csv.field-delimiter'='|')""".stripMargin)
    val vfRow = TableEnv.decodeKafkaRecords(kafkaFrame(null, "8|eve".getBytes), bvf).head()
    assert(vfRow.getAs[Long]("id") == 8L && vfRow.getAs[String]("name") == "eve")

    // key.fields + EXCEPT_KEY: id comes from the json key, name from value
    val bkey = TableEnv.parseCreateTable(
      """CREATE TABLE kv_t (id BIGINT, name STRING)
        |WITH ('connector'='kafka','format'='json','key.format'='json',
        |      'key.fields'='id','value.fields-include'='EXCEPT_KEY')""".stripMargin)
    val kvRow = TableEnv.decodeKafkaRecords(
      kafkaFrame("""{"id": 9}""".getBytes, """{"name": "bob"}""".getBytes), bkey).head()
    assert(kvRow.getAs[Long]("id") == 9L && kvRow.getAs[String]("name") == "bob")
    // key.fields without key.format fails fast
    val bnofmt = TableEnv.parseCreateTable(
      """CREATE TABLE kv_bad (id BIGINT) WITH ('connector'='kafka','format'='json','key.fields'='id')""")
    val e2 = intercept[IllegalArgumentException] {
      TableEnv.decodeKafkaRecords(kafkaFrame("k".getBytes, "v".getBytes), bnofmt)
    }
    assert(e2.getMessage.contains("key.format"))

    // debezium-avro-confluent: the debezium envelope, avro-confluent encoded
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val envSchema = StructType(Seq(
      StructField("before", payload), StructField("after", payload),
      StructField("op", StringType), StructField("ts_ms", LongType)))
    val env = Row(null, Row(3L, "cda"), "c", 1700000001234L)
    val bytes = AvroFiles.encodeValue(env, envSchema, confluent = true)
    val bdbz = TableEnv.parseCreateTable(
      """CREATE TABLE dbz_av (id BIGINT, name STRING)
        |WITH ('connector'='kafka','format'='debezium-avro-confluent')""".stripMargin)
    val dbzRow = TableEnv.decodeKafkaRecords(kafkaFrame(null, bytes), bdbz).head()
    assert(dbzRow.getAs[Long]("id") == 3L && dbzRow.getAs[String]("name") == "cda")
    assert(dbzRow.getAs[String]("__op") == "c" && dbzRow.getAs[Long]("__ts_ms") == 1700000001234L)

    // protobuf: hand-rolled wire decode, DDL schema as descriptor
    val pbSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val pbBytes = graft.sources.ProtobufWire.encodeMessage(Row(42L, "pb"), pbSchema)
    val bpb = TableEnv.parseCreateTable(
      "CREATE TABLE pb_t (id BIGINT, name STRING) WITH ('connector'='kafka','format'='protobuf')")
    val pbRow = TableEnv.decodeKafkaRecords(kafkaFrame(null, pbBytes), bpb).head()
    assert(pbRow.getAs[Long]("id") == 42L && pbRow.getAs[String]("name") == "pb")
    // descriptor-needing column types still fail fast with the reason
    val bpb2 = TableEnv.parseCreateTable(
      "CREATE TABLE pb_bad (ts TIMESTAMP(3)) WITH ('connector'='kafka','format'='protobuf')")
    val e3 = intercept[IllegalArgumentException] {
      TableEnv.decodeKafkaRecords(kafkaFrame(null, pbBytes), bpb2)
    }
    assert(e3.getMessage.contains("descriptor"), e3.getMessage)
  }

  test("avro filesystem binding streams: file stream decoded per batch") {
    TableEnv.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-stream").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType)))
    AvroFiles.write(spark.createDataFrame(
      java.util.List.of(Row(1L, "a"), Row(2L, "b")), schema), dir)
    TableEnv.createTable(spark,
      s"CREATE TABLE av_s (id BIGINT, tag STRING) WITH ('connector'='filesystem','path'='$dir','format'='avro')")
    val sdf = TableEnv.streamDF(spark, TableEnv.lookup("av_s").get)
    assert(sdf.isStreaming)
    val q = sdf.writeStream.format("memory").queryName("av_mem").start()
    try {
      q.processAllAvailable()
      // a second file arriving is picked up as a new micro-batch
      AvroFiles.write(spark.createDataFrame(
        java.util.List.of(Row(3L, "c")), schema), dir)
      q.processAllAvailable()
      val got = spark.table("av_mem").orderBy("id").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
