package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.ProtobufWire

/** The hand-rolled protobuf wire codec: round-trips, proto3 presence
  * semantics, and — because no protobuf library exists here to cross-check
  * against — byte-exact pins of the PUBLIC wire-format spec examples
  * (developers.google.com/protocol-buffers/docs/encoding). */
class ProtobufSpec extends SparkTestBase {

  private def rt(row: Row, schema: StructType): Row =
    ProtobufWire.decodeMessage(ProtobufWire.encodeMessage(row, schema), 0,
      ProtobufWire.encodeMessage(row, schema).length, schema)

  test("wire conformance: the spec's canonical byte examples") {
    // `message Test1 { int32 a = 1; }` with a=150 → bytes 08 96 01
    val s1 = StructType(Seq(StructField("a", IntegerType)))
    assert(ProtobufWire.encodeMessage(Row(150), s1).toSeq ==
      Seq(0x08, 0x96, 0x01).map(_.toByte))
    assert(ProtobufWire.decodeMessage(
      Array(0x08, 0x96, 0x01).map(_.toByte), 0, 3, s1) == Row(150))
    // `message Test2 { string b = 2; }` with b="testing" → 12 07 74..67
    val s2 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val test2 = Array(0x12, 0x07, 0x74, 0x65, 0x73, 0x74, 0x69, 0x6e, 0x67).map(_.toByte)
    assert(ProtobufWire.encodeMessage(Row(0, "testing"), s2).toSeq == test2.toSeq)
    assert(ProtobufWire.decodeMessage(test2, 0, test2.length, s2) == Row(0, "testing"))
    // `message Test3 { Test1 c = 3; }` with c.a=150 → 1a 03 08 96 01
    val s3 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", s1)))
    val test3 = Array(0x1a, 0x03, 0x08, 0x96, 0x01).map(_.toByte)
    assert(ProtobufWire.encodeMessage(Row(0, "", Row(150)), s3).toSeq == test3.toSeq)
    assert(ProtobufWire.decodeMessage(test3, 0, test3.length, s3) == Row(0, "", Row(150)))
    // packed `repeated int32 d = 4` with [3, 270, 86942] → 22 06 03 8e 02 9e a7 05
    val s4 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", s1), StructField("d", ArrayType(IntegerType))))
    val test4 = Array(0x22, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05).map(_.toByte)
    assert(ProtobufWire.encodeMessage(Row(0, "", null, Seq(3, 270, 86942)), s4).toSeq
      == test4.toSeq)
    assert(ProtobufWire.decodeMessage(test4, 0, test4.length, s4) ==
      Row(0, "", null, Seq(3, 270, 86942)))
  }

  test("round-trip: every supported scalar type, negatives included") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("t", ByteType),
      StructField("s", ShortType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("str", StringType),
      StructField("bin", BinaryType)))
    val row = Row(true, (-7).toByte, (-300).toShort, -123456, -9876543210L,
      1.5f, -2.25, "héllo", Array[Byte](1, 2, 3))
    val back = rt(row, schema)
    assert(back.getBoolean(0) && back.getByte(1) == -7 && back.getShort(2) == -300)
    assert(back.getInt(3) == -123456 && back.getLong(4) == -9876543210L)
    assert(back.getFloat(5) == 1.5f && back.getDouble(6) == -2.25)
    assert(back.getString(7) == "héllo")
    assert(back.getAs[Array[Byte]](8).toSeq == Seq[Byte](1, 2, 3))
  }

  test("proto3 presence: defaults omitted on write, restored on read; messages are NULL") {
    val inner = StructType(Seq(StructField("x", IntegerType)))
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType),
      StructField("m", inner), StructField("a", ArrayType(LongType)),
      StructField("mp", MapType(StringType, IntegerType))))
    // all defaults → zero bytes on the wire
    assert(ProtobufWire.encodeMessage(Row(0, "", null, Seq.empty, Map.empty), schema).isEmpty)
    // and a zero-byte message decodes to proto3 defaults (NULL message)
    val dec = ProtobufWire.decodeMessage(Array.empty[Byte], 0, 0, schema)
    assert(dec == Row(0, "", null, Seq.empty, Map.empty))
    // SQL NULL scalars are indistinguishable from defaults after a round
    // trip — the documented proto3 semantics (no null scalars on the wire)
    assert(rt(Row(null, null, null, null, null), schema) ==
      Row(0, "", null, Seq.empty, Map.empty))
  }

  test("repeated fields: packed written, unpacked accepted; string arrays tag-per-item") {
    val schema = StructType(Seq(
      StructField("nums", ArrayType(IntegerType)),
      StructField("words", ArrayType(StringType))))
    val row = Row(Seq(1, 128, -5), Seq("a", "bb"))
    assert(rt(row, schema) == row)
    // hand-build the UNPACKED form of nums (tag 08 per element) — a
    // conformant reader must accept both encodings
    // -5 as int32 varint = 10-byte two's complement
    val neg5 = Array(0xfb, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01)
    val unpacked = (Array(0x08, 0x01, 0x08, 0x80, 0x02, 0x08) ++ neg5).map(_.toByte)
    val dec = ProtobufWire.decodeMessage(unpacked, 0, unpacked.length, schema)
    assert(dec.getSeq[Int](0) == Seq(1, 256, -5), dec.toString)
  }

  test("maps: entry messages round-trip; entries with missing key/value get defaults") {
    val schema = StructType(Seq(
      StructField("m", MapType(StringType, LongType)),
      StructField("im", MapType(IntegerType, StringType))))
    val row = Row(Map("k1" -> 10L, "k2" -> 0L), Map(7 -> "seven"))
    val back = rt(row, schema)
    assert(back.getMap[String, Long](0) == Map("k1" -> 10L, "k2" -> 0L))
    assert(back.getMap[Int, String](1) == Map(7 -> "seven"))
    // entry with only a value (missing key field) → default key
    val onlyVal = Array(0x0a, 0x04, 0x10, 0x2a, 0x08, 0x00).map(_.toByte) // m: {v=42,k=0...}
    // field 1 (m) len 4: field2 varint 42, field1 varint 0 — order-free
    val dec = ProtobufWire.decodeMessage(onlyVal, 0, onlyVal.length,
      StructType(Seq(StructField("m", MapType(IntegerType, LongType)))))
    assert(dec.getMap[Int, Long](0) == Map(0 -> 42L), dec.toString)
  }

  test("unknown fields are skipped; truncated/garbage bytes fail loudly") {
    val schema = StructType(Seq(StructField("a", IntegerType)))
    // field 9 (unknown): varint; field 8 (unknown): length-delimited; then a=5
    val withUnknown = Array(0x48, 0x63, 0x42, 0x02, 0x01, 0x02, 0x08, 0x05).map(_.toByte)
    assert(ProtobufWire.decodeMessage(withUnknown, 0, withUnknown.length, schema) == Row(5))
    intercept[IllegalArgumentException] { // truncated varint
      ProtobufWire.decodeMessage(Array(0x08, 0x96).map(_.toByte), 0, 2, schema)
    }
    intercept[IllegalArgumentException] { // length overruns the buffer
      val s = StructType(Seq(StructField("s", StringType)))
      ProtobufWire.decodeMessage(Array(0x0a, 0x7f, 0x61).map(_.toByte), 0, 3, s)
    }
  }

  test("DDL validation: descriptor-needing types fail fast with the reason") {
    val e = intercept[IllegalArgumentException] {
      ProtobufWire.validate(StructType(Seq(StructField("ts", TimestampType))))
    }
    assert(e.getMessage.contains("descriptor"), e.getMessage)
    intercept[IllegalArgumentException] {
      ProtobufWire.validate(StructType(Seq(StructField("d", DecimalType(10, 2)))))
    }
    intercept[IllegalArgumentException] { // float map keys are not a thing
      ProtobufWire.validate(StructType(Seq(
        StructField("m", MapType(DoubleType, StringType)))))
    }
    // nested coverage: the bad type is named by path
    val e2 = intercept[IllegalArgumentException] {
      ProtobufWire.validate(StructType(Seq(StructField("outer", StructType(Seq(
        StructField("when", DateType)))))))
    }
    assert(e2.getMessage.contains("outer.when"), e2.getMessage)
    // proto3 has no repeated-of-repeated/map and no repeated/map map values
    // — protoc requires a wrapper message; the DDL gate must say so instead
    // of crashing mid-scan with a wire-type error
    for (bad <- Seq(
        ArrayType(ArrayType(IntegerType)),
        ArrayType(MapType(StringType, IntegerType)),
        MapType(StringType, ArrayType(LongType)),
        MapType(StringType, MapType(StringType, StringType)))) {
      val e3 = intercept[IllegalArgumentException] {
        ProtobufWire.validate(StructType(Seq(StructField("c", bad))))
      }
      assert(e3.getMessage.contains("ROW"), s"$bad: ${e3.getMessage}")
    }
    // the legal wrapped forms pass
    ProtobufWire.validate(StructType(Seq(
      StructField("ok1", ArrayType(StructType(Seq(StructField("v", ArrayType(IntegerType)))))),
      StructField("ok2", MapType(StringType, StructType(Seq(StructField("v", ArrayType(LongType)))))))))
  }

  test("degradation symmetry: wire/type mismatches skip, truncation fails — everywhere") {
    // a map VALUE whose wire type evolved (string → varint here) skips the
    // entry field tolerantly, like a top-level mismatch — not a thrown
    // error that kills the scan
    val ms = StructType(Seq(StructField("m", MapType(StringType, IntegerType))))
    // field 1 entry: key "k" (tag 0a), value as STRING "vv" (tag 12, wire 2
    // — mismatches IntegerType's varint): value falls back to default 0
    val evolved = Array(0x0a, 0x07, 0x0a, 0x01, 0x6b, 0x12, 0x02, 0x76, 0x76).map(_.toByte)
    assert(ProtobufWire.decodeMessage(evolved, 0, evolved.length, ms) ==
      Row(Map("k" -> 0)), "evolved map value must degrade, not throw")
    // a truncated unknown FIXED field fails loudly like truncated varints —
    // field 9 wire 1 (fixed64) with only 3 payload bytes
    val s = StructType(Seq(StructField("a", IntegerType)))
    intercept[IllegalArgumentException] {
      ProtobufWire.decodeMessage(Array(0x49, 0x01, 0x02, 0x03).map(_.toByte), 0, 4, s)
    }
  }

  test("column decode end to end: nested rows and arrays through the kafka-value path") {
    import spark.implicits._
    val inner = StructType(Seq(
      StructField("x", IntegerType), StructField("tags", ArrayType(StringType))))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("nested", inner)))
    val rows = Seq(
      Row(1L, Row(10, Seq("a", "b"))),
      Row(2L, null),
      Row(3L, Row(0, Seq.empty[String])))
    val payloads = rows.map(r => ProtobufWire.encodeMessage(r, schema))
    val df = payloads.toDF("value")
      .select(ProtobufWire.fromProtoValue(org.apache.spark.sql.functions.col("value"), schema).as("d"))
      .select("d.*")
    val out = df.collect().sortBy(_.getLong(0))
    assert(out(0) == Row(1L, Row(10, Seq("a", "b"))))
    assert(out(1).getLong(0) == 2L && out(1).isNullAt(1))
    // message fields HAVE presence in proto3: a set-but-all-default inner
    // message is written as a zero-length field and comes back non-null
    assert(out(2) == Row(3L, Row(0, Seq.empty[String])))
  }
}
