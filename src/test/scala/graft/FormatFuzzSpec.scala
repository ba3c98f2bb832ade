package graft

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.engine.{Gateway, TableEnv}
import graft.sources.{AvroFiles, ProtobufWire}

/** Corrupt-BYTES fuzz of the format decoders (r14, VERDICT item 2).
  * CdcFuzzSpec mutates envelope STRUCTURE; this spec mutates raw bytes —
  * truncations, bit flips, zeroed spans, injected bytes — and pins the
  * decode contract for every binary/wire path: a corruption surfaces a
  * NAMED decode error (or a DROPMALFORMED-style skip when tolerance was
  * asked for), never a raw internal exception, a hang, an unbounded
  * allocation, or a silently null-keyed row. ~560 mutations total. */
class FormatFuzzSpec extends SparkTestBase {

  private def mutate(rnd: Random, orig: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
    case 0 => // truncate
      orig.take(rnd.nextInt(math.max(orig.length, 1)))
    case 1 => // single bit flip
      val b = orig.clone()
      if (b.nonEmpty) { val i = rnd.nextInt(b.length); b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte }
      b
    case 2 => // zero a span
      val b = orig.clone()
      if (b.nonEmpty) {
        val i = rnd.nextInt(b.length)
        val len = 1 + rnd.nextInt(math.min(16, b.length - i))
        java.util.Arrays.fill(b, i, i + len, 0x00.toByte)
      }
      b
    case _ => // insert random bytes
      val i = if (orig.isEmpty) 0 else rnd.nextInt(orig.length)
      val ins = Array.fill(1 + rnd.nextInt(8))(rnd.nextInt(256).toByte)
      orig.take(i) ++ ins ++ orig.drop(i)
  }

  /** Walk the cause chain for a named decode message. */
  private def named(e: Throwable, markers: Seq[String]): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12)
      .exists(c => Option(c.getMessage).exists(m => markers.exists(m.contains)))

  test("protobuf wire: 200 corrupt messages decode to a row or a named error") {
    val rnd = new Random(0xf14aL)
    val schema = StructType.fromDDL(
      "id BIGINT, name STRING, score DOUBLE, tags ARRAY<STRING>, attrs MAP<STRING, BIGINT>")
    val valid = ProtobufWire.encodeMessage(
      Row(7L, "ada lovelace", 1.5, Seq("x", "y", "zebra"), Map("k" -> 9L, "j" -> 3L)), schema)
    var errors = 0; var rows = 0
    (1 to 200).foreach { i =>
      val m = mutate(rnd, valid)
      try { ProtobufWire.decodeMessage(m, 0, m.length, schema); rows += 1 }
      catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.startsWith("protobuf:"),
            s"mutation $i: unnamed protobuf error: ${e.getMessage}")
          errors += 1
        case e: Throwable =>
          fail(s"mutation $i escaped the named-error contract: " +
            s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(errors > 0 && rows > 0, s"degenerate fuzz: errors=$errors rows=$rows")
    // adversarial: forged length near Int.MaxValue — the addition-overflow
    // bounds bypass fixed in r14 would have sent the reader out of bounds
    val forged = Array[Byte](0x12, -1, -1, -1, -1, 0x07) // field 2, wire 2, len=MaxValue
    val e = intercept[IllegalArgumentException](
      ProtobufWire.decodeMessage(forged, 0, forged.length, schema))
    assert(e.getMessage.contains("bad length"), e.getMessage)
  }

  test("avro containers: 120 corrupt files answer one named error or decode") {
    val schema = StructType.fromDDL("id BIGINT, name STRING, score DOUBLE")
    val dir = java.nio.file.Files.createTempDirectory("graft-avrofuzz")
    val srcDf = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "ada", 1.5), Row(2L, "bob", 2.5), Row(3L, "eve", 0.25)),
      schema).coalesce(1)
    AvroFiles.write(srcDf, dir.toString)
    val part = new java.io.File(dir.toString).listFiles()
      .find(_.getName.endsWith(".avro")).get
    val valid = java.nio.file.Files.readAllBytes(part.toPath)
    val rnd = new Random(0xa14aL)
    var errors = 0; var decoded = 0
    val mdir = java.nio.file.Files.createTempDirectory("graft-avrofuzz-m")
    val target = mdir.resolve("data.avro")
    (1 to 120).foreach { i =>
      java.nio.file.Files.write(target, mutate(rnd, valid))
      try { AvroFiles.read(spark, mdir.toString, schema).collect(); decoded += 1 }
      catch {
        case e: Exception =>
          assert(named(e, Seq("avro container is corrupt")),
            s"mutation $i: unnamed avro error: ${Results.msg(e)}")
          errors += 1
      }
    }
    assert(errors > 0 && decoded > 0, s"degenerate fuzz: errors=$errors decoded=$decoded")
  }

  test("avro allocation caps are IN EFFECT, not just set (r15 ADVICE)") {
    // avro caches org.apache.avro.limits.* in SystemLimitException's static
    // init — AvroFiles now forces a re-read (resetLimits) and asserts the
    // effective value, so the cap can't be silently disabled by class-load
    // ordering. Verify through avro's own enforcement entry point.
    AvroFiles.toAvroSchema(StructType.fromDDL("id BIGINT")) // ensure init ran
    val cap = java.lang.Long.parseLong(
      System.getProperty("org.apache.avro.limits.bytes.maxLength"))
    assert(cap <= 512L * 1024 * 1024, s"unexpected cap $cap")
    intercept[org.apache.avro.SystemLimitException](
      org.apache.avro.SystemLimitException.checkMaxBytesLength(cap + 1))
    intercept[org.apache.avro.SystemLimitException](
      org.apache.avro.SystemLimitException.checkMaxStringLength(cap + 1))
  }

  private object Results {
    def msg(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12)
        .map(c => s"${c.getClass.getSimpleName}: ${c.getMessage}").mkString(" <- ")
  }

  test("avro-confluent frames: 100 corrupt values answer a named error or decode") {
    val schema = StructType.fromDDL("id BIGINT, name STRING")
    val valid = AvroFiles.encodeValue(Row(42L, "ada lovelace"), schema, confluent = true)
    val rnd = new Random(0xc14aL)
    var errors = 0; var decoded = 0
    import org.apache.spark.sql.functions.col
    (1 to 100).foreach { i =>
      val m = mutate(rnd, valid)
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(m)),
        StructType(Seq(StructField("value", BinaryType))))
      try { df.select(AvroFiles.fromAvroValue(col("value"), schema, confluent = true)).collect(); decoded += 1 }
      catch {
        case e: Exception =>
          assert(named(e, Seq("avro value is corrupt", "avro-confluent: missing wire-format header")),
            s"mutation $i: unnamed avro-value error: ${Results.msg(e)}")
          errors += 1
      }
    }
    assert(errors > 0 && decoded > 0, s"degenerate fuzz: errors=$errors decoded=$decoded")
  }

  test("CDC envelopes: 140 byte-corrupt changelogs fail fast by name or skip with tolerance") {
    TableEnv.clear()
    val gw = new Gateway(spark)
    val h = gw.openSession("fmt_fuzz")
    def page(s: String) = gw.fetchResults(gw.executeStatement(h, s), 0)
    val samples = Map(
      "debezium-json" -> Seq(
        """{"before": null, "after": {"id": 1, "name": "ada"}, "op": "c", "ts_ms": 1000}""",
        """{"before": {"id": 1, "name": "ada"}, "after": {"id": 1, "name": "ada2"}, "op": "u", "ts_ms": 1001}"""),
      "canal-json" -> Seq(
        """{"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "old": null, "type": "INSERT", "ts": 5000}"""),
      "maxwell-json" -> Seq(
        """{"data": {"id": 7, "name": "x"}, "old": null, "type": "insert", "ts": 9}"""),
      "ogg-json" -> Seq(
        """{"before": null, "after": {"id": 3, "name": "g"}, "op_type": "I", "op_ts": "2024-01-02 03:04:05.000000", "pos": "1"}"""))
    val rnd = new Random(0xd14aL)
    var errors = 0; var decoded = 0
    samples.foreach { case (fmt, lines) =>
      val strictDir = java.nio.file.Files.createTempDirectory(s"graft-cdcfuzz-$fmt")
      val tolDir = java.nio.file.Files.createTempDirectory(s"graft-cdcfuzz-t-$fmt")
      val t = fmt.replace("-", "_")
      assert(page(s"CREATE TABLE ${t}_s (id BIGINT, name STRING) WITH " +
        s"('connector'='filesystem','path'='$strictDir','format'='$fmt')")
        .columns != Seq("error"))
      assert(page(s"CREATE TABLE ${t}_t (id BIGINT, name STRING) WITH " +
        s"('connector'='filesystem','path'='$tolDir','format'='$fmt'," +
        s"'$fmt.ignore-parse-errors'='true')").columns != Seq("error"))
      val valid = lines.mkString("\n").getBytes("UTF-8")
      (1 to 25).foreach { i =>
        val m = mutate(rnd, valid)
        java.nio.file.Files.write(strictDir.resolve("cdc.json"), m)
        val p = page(s"SELECT * FROM ${t}_s")
        if (p.columns == Seq("error")) {
          // FAILFAST names the malformed record (Flink default semantics)
          assert(p.rows.head.head.toString.nonEmpty)
          errors += 1
        } else decoded += 1
        // tolerant binding: the same bytes NEVER error — corrupt lines drop
        java.nio.file.Files.write(tolDir.resolve("cdc.json"), m)
        val q = page(s"SELECT * FROM ${t}_t")
        assert(q.columns != Seq("error"),
          s"$fmt tolerant read must skip, got: ${q.rows.take(1)}")
        // and no silently null-keyed changelog row survives the decode
        assert(!q.rows.exists(r => r.forall(_ == null)),
          s"$fmt tolerant read produced an all-null row")
      }
      // intact bytes still decode on the strict binding (sanity)
      java.nio.file.Files.write(strictDir.resolve("cdc.json"), valid)
      val ok = page(s"SELECT * FROM ${t}_s")
      assert(ok.columns != Seq("error"), s"$fmt valid read failed: ${ok.rows.take(1)}")
      assert(ok.rows.nonEmpty)
    }
    assert(errors > 0 && decoded > 0, s"degenerate fuzz: errors=$errors decoded=$decoded")
    // the session survived ~280 adversarial statements
    assert(page("SELECT 1 AS one").rows == Seq(Seq(1)))
    gw.closeSession(h)
  }
}
