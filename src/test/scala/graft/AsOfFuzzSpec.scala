package graft

import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.AsOfJoin

/** Randomized differential check of the as-of join (r11, the CepFuzzSpec
  * pattern): random left/right event sets — including EXACT ties between a
  * left and right timestamp, the classic as-of edge — are run through
  * THREE independent implementations that must agree row-for-row:
  *   1. a scalar in-memory reference (for each left row, the latest right
  *      row with rts <= lts — trivially correct by construction);
  *   2. the batch window-function operator (leftAsOf);
  *   3. the streaming carry-forward state operator (leftAsOfStream) over
  *      real micro-batches with interleaved left/right waves.
  */
class AsOfFuzzSpec extends SparkTestBase {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(seed + i)))
      .flatten.take(n).toSeq
  }

  private case class Case(
      lefts: Seq[(Long, Long, Long)],       // (key, event_id, lts-sec)
      rights: Seq[(Long, Long, Double)])    // (key, rts-sec, payload)

  private val caseG: Gen[Case] = for {
    nL <- Gen.choose(6, 20)
    nR <- Gen.choose(2, 10)
    lSecs <- Gen.listOfN(nL, Gen.choose(3600L, 3700L))
    rSecs <- Gen.listOfN(nR, Gen.choose(3600L, 3700L))
    // force some exact lts == rts ties: copy a few left times into right
    ties <- Gen.someOf(lSecs)
  } yield {
    val lefts = for {
      k <- Seq(0L, 1L)
      (s, i) <- lSecs.zipWithIndex
    } yield (k, k * 1000L + i, s)
    val rightSecs = (rSecs ++ ties.take(3)).distinct // unique per (key, ts)
    val rights = for {
      k <- Seq(0L, 1L)
      s <- rightSecs
    } yield (k, s, (k * 10000L + s).toDouble)
    Case(lefts, rights)
  }

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  /** scalar reference: latest right with rts <= lts (ties visible). */
  private def reference(c: Case): Set[(Long, Long, Option[Double])] =
    c.lefts.map { case (k, id, lts) =>
      val best = c.rights.filter(r => r._1 == k && r._2 <= lts)
        .sortBy(_._2).lastOption.map(_._3)
      (k, id, best)
    }.toSet

  test("as-of join: scalar reference == batch == streaming on 8 random cases with ties") {
    val seed = 0xa50fL
    val lSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, event_id BIGINT, lts TIMESTAMP")
    val rSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, rts TIMESTAMP, payload DOUBLE")
    graft.queries.StreamParityQueries.withParityConf(spark) {
      samples(caseG, 8, seed).zipWithIndex.foreach { case (c, ci) =>
        val want = reference(c)
        val lRows = c.lefts.sortBy(_._3).map { case (k, id, s) => Row(k, id, ts(s)) }
        val rRows = c.rights.sortBy(_._2).map { case (k, s, p) => Row(k, ts(s), p) }
        def df(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType) =
          spark.createDataFrame(new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
        def tuples(out: DataFrame): Set[(Long, Long, Option[Double])] =
          out.filter(col("k") >= 0)
            .select(col("k"), col("event_id"), col("payload"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

        val batch = tuples(AsOfJoin.leftAsOf(
          df(lRows, lSchema), df(rRows, rSchema), "k", "lts", "rts", Seq("payload")))
        assert(batch == want,
          s"[case $ci seed $seed] batch != reference:\n  batch: $batch\n  want:  $want")

        implicit val sqlCtx = spark.sqlContext
        val lMem = MemoryStream[Row](
          org.apache.spark.sql.Encoders.row(lSchema), spark.sqlContext)
        val rMem = MemoryStream[Row](
          org.apache.spark.sql.Encoders.row(rSchema), spark.sqlContext)
        val out = AsOfJoin.leftAsOfStream(
          lMem.toDF(), rMem.toDF(), "k", "lts", "rts", Seq("payload"))
        val sink = s"asof_fuzz_$ci"
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          // two interleaved waves (right first, the production arrival
          // pattern), then far-future pushers on BOTH sides to drain state
          val (ln, rn) = (lRows.length, rRows.length)
          Seq(0, 1).foreach { i =>
            val lw = lRows.slice(i * ln / 2, (i + 1) * ln / 2)
            val rw = rRows.slice(i * rn / 2, (i + 1) * rn / 2)
            if (rw.nonEmpty) rMem.addData(rw: _*)
            if (lw.nonEmpty) lMem.addData(lw: _*)
            q.processAllAvailable()
          }
          Seq(100000L, 200000L).foreach { sec =>
            lMem.addData(Row(-1L, -1L, ts(sec)))
            rMem.addData(Row(-1L, ts(sec), 0.0))
            q.processAllAvailable()
          }
        } finally q.stop()
        val streamed = tuples(spark.table(sink).drop("lts"))
        assert(streamed == want,
          s"[case $ci seed $seed] stream != reference:\n  stream: $streamed\n  want:   $want")
      }
    }
  }
}
