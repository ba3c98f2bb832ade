package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque BINARY
  * columns with typed metadata, decoded/feature-extracted in partition-local
  * batches.
  *
  * The actual codec step is a clearly-marked STUB (no image/audio libraries
  * in this environment): `decodeStub` derives deterministic fake metadata
  * from the raw bytes. Everything around it — the binary column, the schema
  * of the decoded struct, the `mapPartitions` batch shape (the Scala analog
  * of `mapInPandas`: one iterator per partition, library handles initialized
  * once per partition, rows streamed through), and the chunked frame-sampling
  * explode — is real and is what survives a swap-in of a real codec.
  *
  * Scale: decode is partition-local (no shuffle); frame sampling is a
  * projection-explode with bounded fanout (numFrames), so output size is
  * predictable at planning time.
  */
object Multimodal {

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** STUB codec: deterministic pseudo-metadata from payload bytes.
    * A real implementation would hand `bytes` to an image library here;
    * the function signature and batch shape are the contract. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    val first = if (n > 0) bytes(0) & 0xff else 0
    val width = 64 + n % 448
    val height = 64 + (n * 7) % 448
    val format = (first % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    (width, height, format)
  }

  /** Attach a synthetic binary payload column (UTF-8 bytes of a string col) —
    * stands in for real image bytes in the fixtures. */
  def withBinaryPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))

  /** Decode binary payloads to typed metadata in partition-local batches
    * (mapPartitions ≈ mapInPandas: per-partition init, streamed rows). */
  def decodeImages(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val withBin = df.select(col(idCol).cast("long").as("doc_id"), col("payload"))
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    withBin.mapPartitions { rows =>
      // per-partition codec init would go here (once, not per row)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, fmt) = decodeStub(bytes)
        Row(id, bytes.length.toLong, w, h, fmt)
      }
    }(enc)
  }

  /** Frame sampling for "video" payloads: explode fixed-size byte chunks with
    * a per-frame digest — the Spark-side shape of decode-every-Nth-frame. */
  def sampleFrames(df: DataFrame, idCol: String, chunkBytes: Int = 128): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1),
            greatest(ceil(length(col("payload")) / lit(chunkBytes.toDouble)), lit(1)).cast("int")),
          i => call_function("substring", col("payload"), (i - 1) * chunkBytes + 1, lit(chunkBytes))))
          .as(Seq("frame_no", "frame_bytes")))
      .select(col("doc_id"), (col("frame_no") + 1).cast("bigint").as("frame_no"),
        length(col("frame_bytes")).cast("bigint").as("frame_len"),
        md5(col("frame_bytes")).as("frame_digest"))

  /** 64-bit perceptual hash of an opaque binary payload — the dHash analog
    * for byte streams (see [[graft.functions.HashKernels.phash]]): adjacent
    * length-proportional segment sums vote the bits, so payloads differing
    * only by byte-value noise (re-encodes, small corruptions) land within a
    * few bits of each other. Codegen'd kernel — runs in the scan. */
  def perceptualHash(payload: Column): Column =
    graft.functions.HashExprs.phash64(payload)

  /** Near-duplicate payload pairs by perceptual hash: the 64-bit phash is
    * cut into four 16-bit bands; a candidate pair must agree exactly on at
    * least one band, then candidates are verified by full hamming distance
    * ≤ `maxHamming`. Banding recall: pairs at hamming ≤ 3 are GUARANTEED a
    * clean band (pigeonhole over 4 bands); above that, blocking is
    * probabilistic like any LSH — e.g. 4 differing bits landing one per
    * band hide the pair (the bound is a recall/cost dial, same trade as the
    * MinHash bands). The band bucket is the blocking key — one shuffle, no
    * all-pairs; `maxBucket` is the skew guard shared with the MinHash join
    * ([[graft.pipeline.Dedup.bandedPairs]]): oversized buckets degrade to
    * star edges against the bucket representative, never to zero pairs or a
    * quadratic task. The default cap is high enough that healthy corpora
    * never hit it, so the cap-free SQL oracle stays exact at test scale. */
  def phashNearDupPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 8, maxBucket: Int = 10000): DataFrame = {
    val h = df.select(col(idCol).as("id"), perceptualHash(col(payloadCol)).as("ph"))
    val banded = h.select(col("id"), col("ph"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("ph"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bucket")))
    graft.pipeline.Dedup.bandedPairs(banded, maxBucket, carry = Seq("ph"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
