package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro format support for the `filesystem` connector and the kafka
  * `avro` / `avro-confluent` value formats (reference F:622-640 declares the
  * avro-confluent kafka source; G:518 lists both formats).
  *
  * Spark's avro DataSource module is not on this classpath, but the core
  * Avro library is — so the container codec is the real one (Avro object
  * container files, snappy-compressed), only the Spark plumbing is ours:
  *   - write: one container file per partition, written through the Hadoop
  *     FileSystem API to a temp name and renamed on success (rename is the
  *     task-commit; a failed task leaves only an invisible `.tmp`). No
  *     driver funnel — each executor writes its own partition.
  *   - read: `binaryFile` scan (so Catalyst handles listing/partitioning/
  *     streaming) + a per-partition decode; one task decodes one container
  *     file. Container files are the avro unit of splitting at block level;
  *     at 100 TB the parallelism comes from many part files, the normal
  *     avro layout. File bytes are held in memory per task — the writer
  *     side sizes parts at one per shuffle partition, the usual 128 MB-ish.
  *
  * Schema mapping (both directions): boolean/int/long/float/double/string/
  * bytes, decimal(p,s) as bytes+logical, date as int+date,
  * TIMESTAMP → long+timestamp-micros, TIMESTAMP_NTZ → long+
  * local-timestamp-micros, arrays, string-keyed maps, nested records;
  * nullable fields as union(null, T). */
object AvroFiles {

  // Cap avro's decoder limits once (r14 corrupt-bytes hardening): a forged
  // length word in a corrupt container/frame would otherwise drive a
  // GB-scale allocation BEFORE any bounds check (avro 1.12 defaults are
  // unlimited). 512 MB is far above any legitimate single datum here; over
  // the cap avro raises its named SystemLimitException instead.
  //
  // avro caches these properties in SystemLimitException's STATIC INIT, so
  // setting them here is a no-op if any other code path loaded an avro
  // class first (test ordering, a future refactor) — and the cap would be
  // silently disabled. Force a re-read via the package-private
  // resetLimits() (the same hook avro's own tests use), then positively
  // assert the cap is in effect; a silent no-op is exactly the failure
  // mode this guard exists to prevent.
  private val avroAllocCap = 512L * 1024 * 1024
  locally {
    for (k <- Seq("org.apache.avro.limits.string.maxLength",
        "org.apache.avro.limits.bytes.maxLength"))
      if (System.getProperty(k) == null)
        System.setProperty(k, avroAllocCap.toString)
    val cls = classOf[org.apache.avro.SystemLimitException]
    val reset = cls.getDeclaredMethod("resetLimits")
    reset.setAccessible(true)
    reset.invoke(null)
    val effective = math.min(
      java.lang.Long.parseLong(
        System.getProperty("org.apache.avro.limits.bytes.maxLength")),
      Int.MaxValue - 8L) // avro clamps to MAX_ARRAY_VM_LIMIT
    val capped =
      try { org.apache.avro.SystemLimitException.checkMaxBytesLength(effective + 1); false }
      catch { case _: org.apache.avro.SystemLimitException => true }
    require(capped, "avro decoder allocation cap is NOT in effect — " +
      "org.apache.avro.limits.* were read before AvroFiles could set them")
  }

  // ---------------------------------------------------------- schema map --

  def toAvroSchema(st: StructType, name: String = "record"): Schema = {
    val fields = st.fields.toSeq.map { f =>
      new Schema.Field(f.name, nullable(toAvro(f.dataType, name + "_" + f.name)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def toAvro(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, _) => Schema.createArray(nullable(toAvro(et, name + "_item")))
    case MapType(StringType, vt, _) => Schema.createMap(nullable(toAvro(vt, name + "_value")))
    case st: StructType => toAvroSchema(st, name)
    case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
  }

  // ------------------------------------------------------- value converts --

  /** Catalyst external value → avro datum, driven by the CATALYST type (the
    * avro schema was derived from it, so the shapes agree). */
  private def toDatum(v: Any, dt: DataType, schema: Schema): Any = {
    if (v == null) return null
    // strip the nullable union for child construction
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType | StringType => v
      case ByteType => v.asInstanceOf[Byte].toInt
      case ShortType => v.asInstanceOf[Short].toInt
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case DateType => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case ArrayType(et, _) =>
        val es = s.getElementType
        v.asInstanceOf[scala.collection.Seq[Any]].map(toDatum(_, et, es)).asJava
      case MapType(StringType, vt, _) =>
        val vs = s.getValueType
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, x) => k -> toDatum(x, vt, vs) }.asJava
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toDatum(row.get(i), f.dataType, s.getField(f.name).schema()))
        }
        rec
      case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
    }
  }

  /** avro datum → Catalyst external value, driven by the DECLARED Catalyst
    * type (reader-side projection: fields are matched by name and numerics
    * widen, so a file written with int/float where the table declares
    * BIGINT/DOUBLE still reads). */
  private def fromDatum(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case BooleanType => v
      case LongType => v.asInstanceOf[Number].longValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case IntegerType => v.asInstanceOf[Number].intValue()
      case ByteType => v.asInstanceOf[Number].byteValue()
      case ShortType => v.asInstanceOf[Number].shortValue()
      case StringType => v.toString // Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case d: DecimalType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()))
      case TimestampType =>
        val us = v.asInstanceOf[Number].longValue()
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val us = v.asInstanceOf[Number].longValue()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.map(fromDatum(_, et)).toSeq
      case MapType(StringType, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala
          .map { case (k, x) => k.toString -> fromDatum(x, vt) }.toMap
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        val vals = st.fields.map { f =>
          val fld = rec.getSchema.getField(f.name)
          if (fld == null) null else fromDatum(rec.get(fld.pos()), f.dataType)
        }
        new GenericRowWithSchema(vals.toArray[Any], st)
      case other => throw new IllegalArgumentException(s"avro: unsupported type $other")
    }
  }

  // ----------------------------------------------------------------- read --

  private val binaryFileSchema = StructType(Seq(
    StructField("path", StringType), StructField("modificationTime", TimestampType),
    StructField("length", LongType), StructField("content", BinaryType)))

  /** Decode one container file's bytes into declared-schema Rows. Any
    * decode failure (truncated container, flipped bytes, codec checksum
    * mismatch, not-an-avro-file) surfaces as ONE named error — never a raw
    * avro internal exception (r14 corrupt-bytes fuzz contract). */
  private def decodeContainer(bytes: Array[Byte], schema: StructType): Iterator[Row] = {
    def corrupt(e: Exception): Nothing = throw new IllegalArgumentException(
      s"avro container is corrupt or not an avro file: ${e.getMessage}", e)
    val reader =
      try DataFileReader.openReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      catch { case e: Exception => corrupt(e) }
    new Iterator[Row] {
      def hasNext: Boolean =
        try { val h = reader.hasNext; if (!h) reader.close(); h }
        catch { case e: Exception => corrupt(e) }
      def next(): Row =
        try fromDatum(reader.next(), schema).asInstanceOf[Row]
        catch { case e: Exception => corrupt(e) }
    }
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    decodeDF(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path), schema)

  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    decodeDF(spark.readStream.format("binaryFile").schema(binaryFileSchema)
      .option("pathGlobFilter", "*.avro").load(path), schema)

  private def decodeDF(files: DataFrame, schema: StructType): DataFrame = {
    implicit val enc = Encoders.row(schema)
    files.select(col("content"))
      .mapPartitions(_.flatMap(r => decodeContainer(r.getAs[Array[Byte]](0), schema)))
  }

  // ---------------------------------------------------------------- write --

  /** Write each partition as one snappy container file under `path`;
    * returns the number of ROWS written.
    *
    * Commit protocol: every part is written to a per-ATTEMPT `.tmp` name
    * (concurrent speculative/zombie attempts never share a file) and
    * renamed to its jobId-stamped target; if the target already exists a
    * sibling attempt committed first — drop our tmp and accept. Overwrite
    * deletes the PREVIOUS files only after the job succeeds, so a
    * self-referential `INSERT OVERWRITE t ... FROM t` reads the old file
    * listing while the new files land, and a mid-job failure leaves the
    * old data intact (the orphaned new-jobId parts are swept by the next
    * overwrite). `tag` pins the job id — the streaming sink passes the
    * micro-batch id, making a replayed batch overwrite-idempotent instead
    * of appending duplicates. */
  def write(df: DataFrame, path: String, overwrite: Boolean = false,
      tag: Option[String] = None): Long = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "row").toString
    // rebuild a Configuration executor-side from the driver's entries
    // (Configuration itself is not serializable)
    val confEntries = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toArray
    val dir = new org.apache.hadoop.fs.Path(path)
    val driverConf = spark.sparkContext.hadoopConfiguration
    val dfs = dir.getFileSystem(driverConf)
    dfs.mkdirs(dir)
    val jobId = tag.getOrElse(java.util.UUID.randomUUID().toString.take(8))
    val keepOld = !overwrite
    val previous =
      if (keepOld) Array.empty[org.apache.hadoop.fs.Path]
      else dfs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName != "." && !p.getName.contains(s"-$jobId.avro"))
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val avroSchema = new Schema.Parser().parse(avroJson)
        val attempt = java.util.UUID.randomUUID().toString.take(8)
        // task commit target is STAGED (dot-prefixed → invisible to readers
        // and globs): tasks finishing early must not expose rows while
        // sibling tasks can still fail the job — the driver promotes the
        // whole generation after the action completes (FileOutputCommitter
        // v1 shape: task commit atomic, job commit a driver rename sweep)
        val target = new org.apache.hadoop.fs.Path(path, f".staged-part-$pid%05d-$jobId.avro")
        val tmp = new org.apache.hadoop.fs.Path(path, f".part-$pid%05d-$jobId-$attempt.tmp")
        val fs = target.getFileSystem(conf)
        val out = fs.create(tmp, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
          .setCodec(CodecFactory.snappyCodec())
          .create(avroSchema, out)
        var n = 0L
        try {
          rows.foreach { row =>
            w.append(toDatum(row, schema, avroSchema).asInstanceOf[GenericRecord])
            n += 1
          }
        } finally w.close() // closes the stream too
        // task commit: rename wins or a sibling attempt already committed
        if (!fs.rename(tmp, target)) {
          if (fs.exists(target)) fs.delete(tmp, false) // lost the race — fine
          else throw new java.io.IOException(
            s"avro write: commit rename failed for $target")
        }
        Iterator.single(n)
      }
    }.sum().toLong
    // job commit: every task succeeded — promote the staged generation to
    // its visible names, then (overwrite) retire the previous files. A
    // mid-JOB failure before this point leaves only dot-files no reader
    // sees; a re-run never duplicates rows. (A driver crash mid-promotion
    // can still expose a partial generation — the standard limitation of
    // rename-based job commit without a manifest.)
    dfs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith(".staged-") &&
        p.getName.contains(s"-$jobId.avro"))
      .foreach { p =>
        val visible = new org.apache.hadoop.fs.Path(dir, p.getName.stripPrefix(".staged-"))
        if (!dfs.rename(p, visible) && !dfs.exists(visible))
          throw new java.io.IOException(s"avro write: job commit failed for $visible")
      }
    previous.foreach(p => try dfs.delete(p, false) catch { case _: Exception => () })
    written
  }

  // ------------------------------------------------- kafka value formats --

  /** Column decoder for kafka `avro` / `avro-confluent` message values.
    * Plain avro is the raw binary encoding of the declared schema;
    * avro-confluent prefixes it with the registry wire header (magic 0x00 +
    * 4-byte schema id), which we strip — with no registry in this
    * environment the DDL schema IS the reader schema, the normal case for a
    * declared Flink table. */
  def fromAvroValue(c: org.apache.spark.sql.Column, schema: StructType,
      confluent: Boolean): org.apache.spark.sql.Column = {
    val avroJson = toAvroSchema(schema, "row").toString
    val f = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      // parse the schema and build the reader ONCE per executor instance,
      // not per record (GenericDatumReader keeps its resolver per thread,
      // so sharing across concurrent tasks is safe)
      @transient private lazy val avroSchema = new Schema.Parser().parse(avroJson)
      @transient private lazy val reader = new GenericDatumReader[GenericRecord](avroSchema)
      override def call(bytes: Array[Byte]): Row = {
        if (bytes == null) return null
        val body =
          if (!confluent) bytes
          else {
            if (bytes.length < 5 || bytes(0) != 0x00) throw new IllegalArgumentException(
              "avro-confluent: missing wire-format header (magic byte 0)")
            java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
          }
        try {
          val dec = DecoderFactory.get().binaryDecoder(body, null)
          fromDatum(reader.read(null, dec), schema).asInstanceOf[Row]
        } catch {
          // named error, never a raw avro internal (r14 corrupt-bytes fuzz)
          case e: Exception => throw new IllegalArgumentException(
            s"avro value is corrupt for the declared schema: ${e.getMessage}", e)
        }
      }
    }, schema)
    f(c)
  }

  /** Binary-encode a Row (test helper + `to_avro` analog for kafka sinks). */
  def encodeValue(row: Row, schema: StructType, confluent: Boolean = false,
      schemaId: Int = 1): Array[Byte] = {
    val avroSchema = toAvroSchema(schema, "row")
    val out = new java.io.ByteArrayOutputStream()
    if (confluent) {
      out.write(0x00)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array())
    }
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](avroSchema)
      .write(toDatum(row, schema, avroSchema).asInstanceOf[GenericRecord], enc)
    enc.flush()
    out.toByteArray
  }
}
