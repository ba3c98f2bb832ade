package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Two paths, per the 100 TB design rule:
  *  - `bruteForceTopK`: exact cosine top-k for a SMALL broadcast query set —
  *    the scored stream is (query_id, vec_id, sim) triples only, and the
  *    top-k is a per-query window over that narrow stream. Linear scans,
  *    no quadratic blowup; this is the correctness baseline.
  *  - `ivfTopK`: inverted-file ANN — vectors are bucketed once by nearest
  *    centroid (a broadcast argmin, one linear pass), and each query probes
  *    only its `nProbe` nearest buckets. At 1000 executors the bucket
  *    assignment is a narrow shuffle on centroid id and probe joins touch
  *    ~nProbe/C of the data instead of all of it.
  *
  * All arithmetic is double-precision left-fold (`aggregate(zip_with(...)`)
  * so scores are bit-deterministic.
  */
object Similarity {

  /** dot(a, b) in double precision, sequential accumulation (deterministic —
    * bit-identical to a left fold, so DuckDB list_sum oracles still match);
    * native kernel expression, stays in codegen. */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashExprs.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbours for each query vector.
    * @param queries small DataFrame (query_id, query_vec) — broadcast. */
  def bruteForceTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(
        col(queryIdCol).as("query_id"), col(queryVecCol).as("q"))))
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("q")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk").cast("bigint").as("rnk"))
  }

  /** k-means refinement of IVF centroids: seeded deterministically with the
    * first `nCentroids` vectors by id, then `iters` rounds of broadcast-
    * assign + per-dimension mean over a bounded training sample (how FAISS
    * trains IVF too — clustering quality needs a sample, not the corpus, so
    * the training cost is constant in the table size). Assignment uses
    * cosine, so un-normalized means are fine (cosine is scale-invariant).
    * Clusters that lose all members drop out (fewer, denser buckets). */
  /** Below this sample/population ratio the bounded k-means sample is a
    * silent quality cap — the centroids describe ≤10% of the corpus. */
  private[graft] val CoverageWarnRatio = 0.1

  /** The last coverage warning [[kmeansCentroids]] raised (probe/spec
    * visibility — log output is not inspectable from a spec). */
  private[graft] val lastCoverageWarning =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  /** Thin-sample warning text, None when coverage is healthy. Pure — the
    * threshold decision is spec-pinned here, logging is a side channel.
    * `popIsFloor` marks popN as a lower bound (the caller probed a capped
    * count rather than scanning the full table). */
  private[graft] def coverageWarning(sampleN: Long, popN: Long,
      popIsFloor: Boolean = false): Option[String] =
    if (popN > 0 && sampleN.toDouble / popN < CoverageWarnRatio) {
      // a floor population makes the count a LOWER bound but the derived
      // percentage an UPPER bound — the two prefixes point opposite ways
      val popB = if (popIsFloor) ">=" else ""
      val pctB = if (popIsFloor) "<=" else ""
      Some(f"IVF k-means trained on $sampleN of $popB$popN vectors " +
        f"($pctB${100.0 * sampleN / popN}%.2f%%) — centroid quality is " +
        "sample-limited; raise trainLimit if recall matters at this scale")
    } else None

  def kmeansCentroids(
      vectors: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 3, trainLimit: Int = 4096): DataFrame = {
    val spark = vectors.sparkSession
    // one TakeOrdered job pulls the bounded sample (≤ trainLimit × dim
    // doubles, a few MB); Lloyd's iterations then run on the driver — exact,
    // deterministic, and free of the ~12 shuffles a distributed loop costs.
    // Only full-table ASSIGNMENT (ivfAssign) needs the cluster.
    // Ordering by xxhash64(id) keeps the sample deterministic but spreads it
    // uniformly over the table — first-N-by-id would bias the centroids
    // toward whatever content correlates with low ids (ingest time, source).
    // The floor also scales with C: at production centroid counts (O(√N),
    // thousands) a fixed cap would leave single-digit samples per centroid —
    // 8×C keeps Lloyd's meaningful while the sample stays driver-bounded
    // (8×C×dim doubles; ~4 MB at C=1024, dim=64).
    val limit = math.max(trainLimit, nCentroids * 8)
    val sample: Array[Array[Double]] = vectors
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(limit)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    // a full sample means the table is larger than the cap — probe whether
    // it exceeds sample/ratio with a BOUNDED count (limit short-circuits the
    // scan at threshold+1 rows; a full count() here was an extra whole-table
    // job per ad-hoc ivfTopK call at production scale) and surface thin
    // coverage instead of silently capping quality at 100x scale
    val warning =
      if (sample.length < limit) None
      else {
        val threshold = math.ceil(sample.length / CoverageWarnRatio).toLong
        val seen = vectors.limit(math.min(threshold + 1, Int.MaxValue.toLong).toInt).count()
        coverageWarning(sample.length.toLong, seen, popIsFloor = seen > threshold)
      }
    lastCoverageWarning.set(warning)
    warning.foreach(w =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(w))
    val k = math.min(nCentroids, sample.length)
    def dotA(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotA(a, b) / (math.sqrt(dotA(a, a)) * math.sqrt(dotA(b, b)))
    val cents = Array.tabulate(k)(i => sample(i).clone())
    for (_ <- 0 until iters) {
      val dim = if (sample.isEmpty) 0 else sample(0).length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestSim = -2.0
        var c = 0
        while (c < k) {
          val s = cos(v, cents(c))
          if (s > bestSim) { bestSim = s; best = c } // ties keep lowest index
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      for (c <- 0 until k if counts(c) > 0)
        cents(c) = sums(c).map(_ / counts(c)) // empty clusters keep their seed
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "centroid_id INT, cvec ARRAY<DOUBLE>")
    spark.createDataFrame(
      cents.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i, v.toSeq) }.toSeq.asJava, schema)
  }

  /** IVF index: assign every vector to its nearest centroid — a PURE
    * PROJECTION, zero shuffles. The centroid set is tiny (C rows) and
    * collected once; per row the argmax runs in ONE codegen'd kernel
    * expression over the driver-side centroid matrix
    * ([[graft.functions.VecKernels.argmaxDotD]]) — constant generated-code
    * size whatever C is, so C=1024 neither blows up janino nor re-compiles
    * per centroid (the previous C-way struct-`greatest` over inlined dot
    * products grew the generated method with C; the shape before that —
    * crossJoin(broadcast) + groupBy(vec_id) — shuffled the ENTIRE corpus).
    * Ranking by dot/|c| is argmax-equivalent to cosine: the per-row |v|
    * factor is constant across candidates. Scores are bit-identical to the
    * struct-`greatest` shape (same sequential fold + one division), and
    * selection pins the same semantics (spec: "ivfAssign kernel parity"):
    * highest score, ties → lowest centroid id; NaN (a NaN vector component
    * poisons every dot) sorts greatest exactly like Spark's struct
    * ordering, so all-NaN picks the lowest centroid id; a zero-norm
    * centroid scores -Infinity and never wins (the old cosine path scored
    * it NaN = always-wins — the -Infinity behavior is the deliberate,
    * documented divergence). */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val v = col(vecCol).cast("array<double>")
    val norms = cents.map { case (_, cvec) => math.sqrt(cvec.map(x => x * x).sum) }
    vectors.select(col(idCol).as("vec_id"), v.as("v"),
      graft.functions.HashExprs.vec_argmax_dot(
        v, cents.map(_._2), norms, cents.map(_._1)).as("centroid_id"))
  }

  /** Centroid matrix sorted by ascending id (the kernel's first-wins scan
    * makes that ordering the lowest-id tie-break). */
  private def collectCentroids(centroids: DataFrame): Array[(Int, Array[Double])] = {
    val cents = centroids
      .select(col("centroid_id"), col("cvec").cast("array<double>"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(cents.nonEmpty, "ivfAssign needs at least one centroid")
    cents
  }

  /** The round-9 assignment shape (C candidate structs under `greatest`),
    * kept package-private as the parity/AB baseline for the kernel above —
    * not a production path: generated code grows with C. */
  private[graft] def ivfAssignGreatest(
      vectors: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val v = col(vecCol).cast("array<double>")
    val candidates = cents.map { case (cid, cvec) =>
      val cnorm = math.sqrt(cvec.map(x => x * x).sum)
      val score =
        if (cnorm == 0.0) lit(Double.NegativeInfinity)
        else dot(v, typedLit(cvec.toSeq)) / lit(cnorm)
      struct(score.as("s"), lit(-cid).as("negid"), lit(cid).as("cid"))
    }
    val best =
      if (candidates.length == 1) candidates.head
      else greatest(candidates.toIndexedSeq: _*)
    vectors.select(col(idCol).as("vec_id"), v.as("v"),
      best.getField("cid").as("centroid_id"))
  }

  /** ANN top-k: probe the `nProbe` centroids nearest to each query, exact
    * rerank within those buckets only. */
  def ivfTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      kmeansIters: Int = 3, trainLimit: Int = 4096): DataFrame = {
    val centroids = kmeansCentroids(vectors, idCol, vecCol, nCentroids, kmeansIters, trainLimit)
    val assigned = ivfAssign(vectors, idCol, vecCol, centroids)
    probeAssigned(centroids, assigned, queries, queryIdCol, queryVecCol, k, nProbe)
  }

  /** Probe an assigned IVF corpus: nProbe nearest buckets per query, exact
    * rerank inside probed buckets only. Shared between [[ivfTopK]] and the
    * persisted-index path ([[IvfIndex.probe]]) so both return identical
    * rows for the same centroids/assignment. When `assigned` is a parquet
    * read partitioned by centroid_id, the broadcast join on the partition
    * column engages dynamic partition pruning — unprobed buckets are never
    * scanned. */
  private[pipeline] def probeAssigned(centroids: DataFrame, assigned: DataFrame,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).cast("array<double>").as("q"))
    // probe set per query (tiny: queries × centroids, both broadcastable)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q"), col("centroid_id"),
        cosine(col("q"), col("cvec")).as("csim"))
    val wp = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("centroid_id").asc)
    val probeSet = probes.withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("q"), col("centroid_id"))
    // rerank only vectors in probed buckets
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(broadcast(probeSet), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("q")), 6).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk").cast("bigint").as("rnk"))
  }

  /** Deterministic Rademacher (±1) hyperplane matrix for cosine LSH:
    * entry (bit, dim) is the sign of a splitmix64-style avalanche of the
    * fixed seed — reproducible across runs/JVMs, no RNG state. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (b, d) =>
      var z = seed + (b.toLong * dim + d + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
    }

  /** Random-hyperplane (sign-of-projection) LSH signature: bit b of the
    * result is 1 iff dot(v, plane_b) > 0. With Rademacher planes each
    * projection is a ±-weighted sum — evaluated as one fold per bit over
    * the vector, all inside codegen (no UDF). Collision probability is
    * 1 - angle/π per bit, the standard cosine-LSH family. */
  def cosineLshSignature(vec: Column, nBits: Int = 16, dim: Int = 64,
      seed: Long = 42L): Column = {
    val planes = hyperplanes(nBits, dim, seed)
    val v = vec.cast("array<double>")
    planes.zipWithIndex.map { case (plane, b) =>
      val lits = array(plane.map(lit(_)): _*)
      when(dot(v, lits) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k via cosine LSH: vectors are bucketed by signature (one
    * linear pass, one narrow shuffle), queries probe their own bucket plus
    * every bucket within hamming distance 1 (multi-probe: nBits+1 buckets
    * per query — a broadcast fan-out of the tiny query set, never of the
    * corpus). Exact rerank inside probed buckets only. Recall is tunable
    * via nBits (fewer bits → bigger buckets → higher recall, more rerank). */
  def lshTopK(
      vectors: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nBits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = cosineLshSignature(col("v"), nBits, dim, seed)
    val bucketed = vectors
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", sig)
    val q = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).cast("array<double>").as("q"))
      .withColumn("qsig", cosineLshSignature(col("q"), nBits, dim, seed))
    // multi-probe: own bucket + flip each single bit
    val probed = q.select(col("query_id"), col("q"), col("qsig"), explode(array(
      lit(0L) +: (0 until nBits).map(b => lit(1L << b)): _*)).as("flip"))
      .select(col("query_id"), col("q"),
        (col("qsig").bitwiseXOR(col("flip"))).as("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    bucketed.join(broadcast(probed), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("q")), 6).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk").cast("bigint").as("rnk"))
  }

  /** Symmetric int8 quantization for embedding storage: per-vector scale
    * max|x|/127, code_i = floor(x_i/scale + 0.5) (explicit floor-of-shifted
    * so both Spark and a SQL oracle round identically — no HALF_UP vs
    * HALF_EVEN drift). 4× smaller than float32; dequantized error ≤
    * scale/2 per component. Pure projection. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // one quantize_i8 kernel pass (r19): the lambda pipeline ran TWO
    // interpreted per-element transforms per vector (abs for the max, then
    // the code mapping) — PipelineSpec pins kernel == lambda twin
    val q = graft.functions.HashExprs.quantize_i8(col(vecCol).cast("array<double>"))
    df.select(col(idCol),
      round(q.getField("scale"), 9).as("scale"),
      q.getField("codes").as("codes"))
  }

  /** The pre-r19 lambda formulation, kept as the kernel's parity baseline
    * (spec-only; see [[quantizeInt8]]). */
  private[graft] def quantizeInt8Columns(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scale = array_max(transform(v, x => abs(x))) / 127.0
    df.select(col(idCol),
      round(scale, 9).as("scale"),
      when(scale === 0, transform(v, _ => lit(0L)))
        .otherwise(transform(v, x => floor(x / scale + 0.5).cast("bigint")))
        .as("codes"))
  }
}
