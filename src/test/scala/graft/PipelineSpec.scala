package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHashes
import graft.functions.RollingHashes.rolling_hashes
import graft.pipeline.{CorpusFilters, Dedup, Sampling, Similarity}

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("rolling_hashes: codegen result == interpreted twin, O(n) shingles") {
    val df = Seq("abcdefgh", "", "ab", "the quick brown fox").toDF("s")
    val got = df.select(col("s"), rolling_hashes(col("s"), 3, 42L).as("h")).collect()
    got.foreach { r =>
      val expected = RollingHashes.compute(r.getString(0).getBytes("UTF-8"), 3, 42L)
      assert(r.getSeq[Long](1).toArray.sameElements(expected), s"mismatch for '${r.getString(0)}'")
    }
    // shingle count = max(n-k+1, 0)
    assert(got.map(r => r.getSeq[Long](1).length).toSeq ==
      got.map(r => math.max(r.getString(0).getBytes("UTF-8").length - 2, 0)).toSeq)
  }

  test("rolling_hashes128 distinct == array_distinct(rolling_hashes128) (r19)") {
    import graft.functions.RollingHashes.rolling_hashes128
    val edge = Seq("", "a", "abcdefgh", "aaaaaaaaaaaaaaaa", "ababababab",
      "héllo wörld héllo wörld", "the quick brown fox " * 50)
    for (k <- Seq(3, 20)) {
      val df = (edge ++ Tables.load(spark, sfDir, "documents")
        .select(col("text")).limit(50).collect().map(_.getString(0)).toSeq).toDF("s")
      val kernel = df.select(rolling_hashes128(col("s"), k, distinct = true).as("g"))
        .collect().map(_.getSeq[Array[Byte]](0).map(_.toSeq))
      val viaDistinct = df.select(array_distinct(
          rolling_hashes128(col("s"), k)).as("g"))
        .collect().map(_.getSeq[Array[Byte]](0).map(_.toSeq))
      assert(kernel.toSeq == viaDistinct.toSeq, s"k=$k")
    }
  }

  test("rolling hash equals direct polynomial hash of each window") {
    val s = "abcdef"
    val k = 3
    val out = RollingHashes.compute(s.getBytes, k, 7L)
    def direct(sub: String): Long = {
      var h = 0L
      sub.getBytes.foreach(b => h = h * RollingHashes.B + (b & 0xff))
      // apply the same fmix64 ^ seed finalizer
      var x = h ^ 7L
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      x
    }
    (0 to s.length - k).foreach { i =>
      assert(out(i) == direct(s.substring(i, i + k)), s"window $i")
    }
  }

  test("minhash LSH finds planted near-duplicates and skips distant docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight " * 3
    val nearDup = base.replace("quick", "rapid") // one token changed
    val distant = "completely different content about database engines and query optimizers " * 4
    val docs = Seq((1L, base), (2L, nearDup), (3L, distant)).toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"expected planted pair, got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "distant doc must not pair")
  }

  test("semantic dedup finds planted embedding near-duplicates, skips distant vectors") {
    // three tight planted groups + isolated distant vectors, no label column
    def vec(seed: Int, eps: Double = 0.0): Seq[Float] =
      (0 until 16).map(i => (math.sin(seed * 31 + i) + eps * ((i % 5) - 2)).toFloat)
    val rows =
      Seq((1L, vec(1)), (2L, vec(1, 0.002)), (3L, vec(1, -0.002)),   // group 1
          (10L, vec(7)), (11L, vec(7, 0.003)),                       // group 2
          (20L, vec(42)), (21L, vec(99)))                            // isolated
    val df = rows.toDF("vec_id", "embedding")
    // C ≈ √N: over-clustering a tiny corpus (e.g. C=4 for 7 vectors) can
    // hand each planted variant its own centroid and split the group —
    // the operator's contract is C = O(√N), same as the IVF index
    val pairs = Dedup.semanticNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.99, nCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"group-1 planted pairs missing: $pairs")
    assert(pairs.contains((10L, 11L)), s"group-2 planted pair missing: $pairs")
    assert(!pairs.exists(p => p._1 >= 20L || p._2 >= 20L),
      s"isolated vectors must not pair: $pairs")
    // the skew guard path: one-cluster corpus larger than maxCluster still
    // yields connectivity (star edges), never a quadratic bucket
    val big = (0L until 40L).map(i => (i, vec(5, 0.0001 * i))).toDF("vec_id", "embedding")
    val cands = Dedup.semanticCandidatePairs(big, "vec_id", "embedding",
      nCentroids = 1, maxCluster = 8)
    val groups = graft.pipeline.CorpusFilters.duplicateGroups(cands)
    assert(groups.select(countDistinct(col("cluster_id"))).head().getLong(0) == 1L,
      "oversized cluster must stay one connected component via star edges")
    val nPairs = cands.count()
    assert(nPairs < 40L * 39 / 2, s"oversized cluster emitted all-pairs ($nPairs)")
  }

  test("incremental dedup is exact even when the bloom prefilter false-positives") {
    // fpp = 0.5 over a tiny expected count forces bloom false positives, so
    // the exact-confirmation join must strip them; bloom has no false
    // negatives, so no true duplicate can be missed either way
    val history = (0 until 200).map(i => (i.toLong, s"doc text number $i")).toDF("doc_id", "text")
    val newDocs = (150 until 350).map(i => (1000L + i, s"doc text number $i")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(newDocs, history, "doc_id", "text",
        fpp = 0.5, expectedItems = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (150 until 350).foreach { i =>
      assert(out(1000L + i) == (i < 200), s"doc $i flagged ${out(1000L + i)}")
    }
    // normalization applies on both sides: case/whitespace variants are dups
    val outNorm = Dedup.incrementalDedup(
        Seq((1L, "DOC   Text  NUMBER 7")).toDF("doc_id", "text"),
        history, "doc_id", "text", expectedItems = 200)
      .collect()
    assert(outNorm.head.getBoolean(2), "normalized variant must be flagged")
    // no history shuffle: both joins against the corpus are broadcast
    val plan = Dedup.incrementalDedup(newDocs, history, "doc_id", "text",
        expectedItems = 200)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"history-side shuffle join:\n$plan")
    // null text (routine in raw crawl data) must flow through as not-a-dup,
    // not NPE inside the bloom probe
    val withNulls = Seq((1L, null: String), (2L, "doc text number 7"))
      .toDF("doc_id", "text")
    val nullOut = Dedup.incrementalDedup(withNulls, history, "doc_id", "text",
        expectedItems = 200)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(nullOut == Map(1L -> false, 2L -> true))
  }

  test("incremental dedup refuses an unknown-size history instead of a silent count scan") {
    // parquet scans carry no CBO row count by default — the operator must
    // demand expectedItems, not silently pay a third scan of the history
    val dir = java.nio.file.Files.createTempDirectory("graft-nostats")
    try {
      (0 until 50).map(i => (i.toLong, s"t $i")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(dir.toString)
      val history = spark.read.parquet(dir.toString)
      val newDocs = Seq((1L, "t 1")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        Dedup.incrementalDedup(newDocs, history, "doc_id", "text")
      }
      assert(e.getMessage.contains("expectedItems"), e.getMessage)
      // with the size stated, the same inputs work
      val out = Dedup.incrementalDedup(newDocs, history, "doc_id", "text",
          expectedItems = 50)
        .collect()
      assert(out.head.getBoolean(2))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("incremental dedup falls back to shuffle joins above the broadcast-candidate cap") {
    // every new row is a duplicate → the candidate set is batch-sized; with
    // the cap below it the operator must degrade to plain joins (no forced
    // broadcast) and still return the exact answer
    val history = (0 until 300).map(i => (i.toLong, s"doc text number $i")).toDF("doc_id", "text")
    val newDocs = (0 until 300).map(i => (1000L + i, s"doc text number $i")).toDF("doc_id", "text")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast so a FORCED broadcast hint would be visible;
      // above the cap the operator must emit plain (shuffle-able) joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Dedup.incrementalDedup(newDocs, history, "doc_id", "text",
        expectedItems = 300, maxBroadcastCandidates = 10)
      val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(flags.size == 300 && flags.values.forall(identity), "all rows are dups")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"expected shuffle-join degradation above the cap:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed incremental dedup: zero Exchange on the history side, batch and streaming") {
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("DROP TABLE IF EXISTS graft_digests_spec")
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File("spark-warehouse/graft_digests_spec"))
    val history = (0 until 400).map(i => (i.toLong, s"doc text number $i")).toDF("doc_id", "text")
    Dedup.materializeHistoryDigests(history, "text", "graft_digests_spec", buckets = 4)
    val newDocs = (300 until 500).map(i => (1000L + i, s"doc text number $i")).toDF("doc_id", "text")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val out = Dedup.incrementalDedupBucketed(newDocs, "graft_digests_spec", "doc_id", "text")
      val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      (300 until 500).foreach { i =>
        assert(flags(1000L + i) == (i < 400), s"doc $i flagged ${flags(1000L + i)}")
      }
      // the bucketed scan satisfies the join's partitioning: the ONLY
      // Exchange shuffles the new batch to the bucket count — the history
      // digest table is read in place
      // AQE's toString echoes the initial plan below the final one — count
      // Exchanges only in the executed (final) section
      val plan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"history side must not shuffle:\n${plan.take(2500)}")
      assert(plan.contains("Bucketed: true"), plan.take(2500))

      // streaming: same join as a stream-static join against the digest
      // TABLE — the static side re-scans (no distinct re-derivation) and
      // still carries no Exchange
      val dir = java.nio.file.Files.createTempDirectory("graft-bucketstream")
      try {
        newDocs.write.mode("overwrite").parquet(dir.toString)
        val stream = spark.readStream
          .schema(newDocs.schema).parquet(dir.toString)
        val sout = Dedup.incrementalDedupBucketed(stream, "graft_digests_spec", "doc_id", "text")
        assert(sout.isStreaming)
        val q = sout.writeStream.outputMode("append").format("memory")
          .queryName("inc_bucket_stream").trigger(Trigger.AvailableNow()).start()
        try assert(q.awaitTermination(60000), "bucketed dedup stream did not finish")
        finally q.stop()
        val streamed = spark.table("inc_bucket_stream").collect()
          .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
        assert(streamed == flags, "stream == batch parity")
        val splan = org.apache.spark.sql.graft.Shims.lastExecutedPlan(q).toString
          .split("== Initial Plan ==").head
        assert("Exchange hashpartitioning".r.findAllIn(splan).size <= 1,
          s"history side must not shuffle in the micro-batch plan:\n${splan.take(2500)}")
        assert(!splan.contains("HashAggregate"),
          s"static side must not re-derive distinct():\n${splan.take(2500)}")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("minhash signature approximates true Jaccard") {
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val b = "one two three four five six seven eight nine ten thirteen fourteen"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    val sigs = df.select(col("id"), Dedup.minhashSignature(col("text"), 64, 5).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / 64
    val trueJ = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.id") === 1 && col("y.id") === 2)
      .select(Dedup.ngramJaccard(col("x.text"), col("y.text"), 5)).head().getDouble(0)
    assert(math.abs(est - trueJ) < 0.25, s"minhash est $est vs true $trueJ")
  }

  test("simhash: identical docs equal, near-dups close in hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("beta", "betb")),
      (4L, "totally unrelated words about spark flink kafka and parquet files")
    ).toDF("id", "text")
    val hs = df.select(col("id"), Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(1L) == hs(2L))
    assert(hamming(hs(1L), hs(3L)) < hamming(hs(1L), hs(4L)))
    assert(hamming(hs(1L), hs(3L)) <= 16)
  }

  test("IVF top-k achieves reasonable recall against brute force") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // probing all centroids must reproduce brute force exactly
    val full = Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
  }

  test("semantic candidate pairs: constant shuffle count, no quadratic join") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val cands = Dedup.semanticCandidatePairs(e, "vec_id", "embedding",
      nCentroids = 8, maxCluster = 64)
    cands.count()
    val plan = cands.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the assignment itself is shuffle-free (pinned by the ivfAssign spec
    // below); pair enumeration must stay at a CONSTANT number of hash
    // Exchanges — (band,bucket) for the windows/self-join (+ reuse) and the
    // final pair distinct — independent of data size, and must never fall
    // into an unblocked quadratic join
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in the candidate plan:\n${plan.take(2000)}")
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nEx <= 5, s"expected a constant few Exchanges, got $nEx:\n${plan.take(2500)}")
  }

  test("ivfAssign is a shuffle-free projection and matches the join-shape assignment") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val centroids = Similarity.kmeansCentroids(e, "vec_id", "embedding", nCentroids = 8)
    val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", centroids)
    // zero Exchanges: nearest-centroid is computed in the scan projection
    val plan = assigned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n${plan.take(1500)}")
    // ...and the argmax kernel runs INSIDE whole-stage codegen (one static
    // call in the generated projection, not an interpreted fallback)
    val generated = org.apache.spark.sql.execution.debug.codegenString(
      assigned.queryExecution.executedPlan)
    assert(generated.contains("argmaxDotD"),
      s"kernel not in generated code:\n${generated.take(800)}")
    // same result as the reference crossJoin + groupBy(vec_id) shape
    val joined = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("centroid_id"),
        (Similarity.dot(col("v"), col("cvec")) /
          (sqrt(Similarity.dot(col("v"), col("v"))) *
           sqrt(Similarity.dot(col("cvec"), col("cvec"))))).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"), struct(col("csim"), -col("centroid_id"))).as("centroid_id"))
    val a = assigned.select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = joined.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, s"${a.toSet.diff(b.toSet).take(5)} vs ${b.toSet.diff(a.toSet).take(5)}")
  }

  test("ivfAssign kernel parity: NaN/Infinity vectors, ties, zero-norm centroids") {
    // hand-built centroids: unit-x (id 0), unit-y (id 3), zero-norm (id 7)
    val cents = Seq((0, Seq(1.0, 0.0)), (3, Seq(0.0, 1.0)), (7, Seq(0.0, 0.0)))
      .toDF("centroid_id", "cvec")
    val vecs = Seq(
      (1L, Seq(2.0f, 0.1f)),                   // plain → centroid 0
      (2L, Seq(0.1f, 5.0f)),                   // plain → centroid 3
      (3L, Seq(Float.NaN, 1.0f)),              // NaN poisons every dot
      (4L, Seq(Float.PositiveInfinity, 1.0f)), // Inf·0 = NaN on centroid 3
      (5L, Seq(Float.NegativeInfinity, 1.0f)),
      (6L, Seq(0.0f, 0.0f))                    // exact tie across live centroids
    ).toDF("vec_id", "embedding")
    def run(f: (org.apache.spark.sql.DataFrame, String, String,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) =
      f(vecs, "vec_id", "embedding", cents).select("vec_id", "centroid_id")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kernel = run(Similarity.ivfAssign)
    val structGreatest = run(Similarity.ivfAssignGreatest)
    // the kernel replicates struct-greatest selection exactly: Double.compare
    // puts NaN greatest (like Spark's ordering), first-wins over ascending
    // ids keeps the lowest centroid id on ties
    assert(kernel == structGreatest, s"$kernel vs $structGreatest")
    assert(kernel(1L) == 0 && kernel(2L) == 3)
    assert(kernel(3L) == 0, "all-NaN scores tie → lowest centroid id")
    assert(kernel(6L) == 0, "exact score tie → lowest centroid id")
    // zero-norm centroid scores -Infinity, never wins over a live one (the
    // old cosine join shape scored it NaN = always-wins; the -Infinity
    // divergence is deliberate and pinned here)
    assert(!kernel.values.exists(_ == 7), s"zero-norm centroid chosen: $kernel")
    // ...unless every centroid is degenerate — then lowest id, no crash
    val onlyDead = Seq((5, Seq(0.0, 0.0)), (9, Seq(0.0, 0.0))).toDF("centroid_id", "cvec")
    val dead = Similarity.ivfAssign(vecs, "vec_id", "embedding", onlyDead)
      .select("centroid_id").distinct().collect().map(_.getInt(0)).toSeq
    assert(dead == Seq(5), dead.toString)
    // the kernel reads ARRAY<FLOAT> directly (per-element widen — bit-equal
    // to casting the array first, without materializing the copy)
    val mat = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val norms = Array(1.0, 1.0)
    val ids = Array(0, 3)
    val viaFloat = vecs.select($"vec_id",
        graft.functions.HashExprs.vec_argmax_dot($"embedding", mat, norms, ids).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaDouble = vecs.select($"vec_id", graft.functions.HashExprs.vec_argmax_dot(
        $"embedding".cast("array<double>"), mat, norms, ids).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaFloat == viaDouble, s"$viaFloat vs $viaDouble")
    // non-numeric input fails analysis, not silently mis-decodes
    intercept[org.apache.spark.sql.AnalysisException] {
      vecs.select(graft.functions.HashExprs.vec_argmax_dot(
        lit("nope"), mat, norms, ids)).collect()
    }
  }

  test("persisted IVF index: save/load probe == in-memory probe, scan is partition-pruned") {
    import graft.pipeline.IvfIndex
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val (centroids, assigned) = IvfIndex.build(e, "vec_id", "embedding", nCentroids = 8)
    val mem = IvfIndex.probe(centroids, assigned, q, "vec_id", "embedding", k = 10, nProbe = 2)
    val dirPath = java.nio.file.Files.createTempDirectory("graft-ivf")
    val dir = dirPath.toString
    IvfIndex.save(dir, centroids, assigned)
    val (c2, a2) = IvfIndex.load(spark, dir)
    val disk = IvfIndex.probe(c2, a2, q, "vec_id", "embedding", k = 10, nProbe = 2)
    assert(mem.exceptAll(disk).isEmpty && disk.exceptAll(mem).isEmpty)
    assert(mem.count() > 0)
    // the index directory really is one partition per bucket
    val parts = new java.io.File(s"$dir/assigned").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("centroid_id="))
    assert(parts.length > 1, parts.mkString(","))
    // and the probe plan prunes: with nProbe=2 of 8 buckets, the scan of the
    // persisted assignment must carry a partition filter on centroid_id
    // (dynamic pruning from the broadcast probe set)
    disk.collect()
    val physical = disk.queryExecution.executedPlan.toString
    assert(physical.contains("dynamicpruning") || physical.contains("PartitionFilters: [isnotnull(centroid_id"),
      s"no partition pruning on the persisted IVF scan:\n${physical.take(2000)}")
    org.apache.commons.io.FileUtils.deleteQuietly(dirPath.toFile)
  }

  test("k-means sample coverage: thin training samples warn, healthy ones don't") {
    // the decision function is pinned: below CoverageWarnRatio of the
    // population the warning names both counts and the knob to raise
    assert(Similarity.coverageWarning(4096L, 1000000L).exists(w =>
      w.contains("4096") && w.contains("1000000") && w.contains("trainLimit")))
    assert(Similarity.coverageWarning(4096L, 8000L).isEmpty, "51% coverage is healthy")
    assert(Similarity.coverageWarning(4096L, 0L).isEmpty)
    // end to end: a trainLimit far under the corpus size must raise the
    // warning; a trainLimit covering the corpus must not (and must not
    // even pay the count job — the sample came back under the cap)
    val e = Tables.load(spark, sfDir, "embeddings")
    val pop = e.count()
    Similarity.kmeansCentroids(e, "vec_id", "embedding",
      nCentroids = 4, trainLimit = math.max((pop / 20).toInt, 4))
    assert(Similarity.lastCoverageWarning.get().isDefined,
      s"no warning training on ~5% of $pop vectors")
    Similarity.kmeansCentroids(e, "vec_id", "embedding",
      nCentroids = 4, trainLimit = (pop * 2).toInt)
    assert(Similarity.lastCoverageWarning.get().isEmpty)
    // ivfTopK exposes the knob
    val q = e.filter(col("vec_id") < 2)
    Similarity.ivfTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5,
      nCentroids = 4, nProbe = 4, trainLimit = math.max((pop / 20).toInt, 4)).collect()
    assert(Similarity.lastCoverageWarning.get().isDefined)
  }

  test("k-means centroids beat first-N seeding on skewed clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 3 tight orthogonal clusters, sizes 500/60/40 — first-N-by-id seeds all
    // land inside cluster 0, scattering the minority clusters across buckets
    val centers = Seq(Array(10.0, 0, 0, 0), Array(0.0, 10, 0, 0), Array(0.0, 0, 10, 0))
    val data = (0 until 600).map { i =>
      val c = if (i < 500) 0 else if (i < 560) 1 else 2
      (i.toLong, centers(c).map(_ + rnd.nextGaussian() * 0.1))
    }
    val df = data.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id".isin(0L, 510L, 570L))
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallWith(iters: Int) = {
      val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", 10,
        nCentroids = 6, nProbe = 1, kmeansIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & ivf).size.toDouble / brute.size
    }
    val naive = recallWith(0) // = round-1 first-N centroids
    val kmeans = recallWith(3)
    assert(kmeans >= naive, s"k-means recall $kmeans below naive $naive")
    assert(kmeans >= 0.95, s"k-means recall too low: $kmeans")
  }

  test("token counts are 0 for empty or whitespace-only text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "two words")).toDF("doc_id", "text")
    val counts = df.select(col("doc_id"), graft.pipeline.TextAnalysis.tokenCount(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 0L, 2L -> 0L, 3L -> 2L))
    val q = graft.pipeline.TextAnalysis.qualityFeatures(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(q(1L) == 0L && q(2L) == 0L)
  }

  test("as-of join carries the latest right row even when its payload is null") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "lts")
    val right = Seq((1L, 5L, Some("old")), (1L, 50L, None: Option[String]))
      .toDF("k", "rts", "payload")
    val out = graft.operators.AsOfJoin.leftAsOf(left, right, "k", "lts", "rts", Seq("payload"))
    // latest right row at ts=50 has a NULL payload; must NOT fall back to 'old'
    assert(out.collect().head.getAs[String]("payload") == null)
  }

  test("salted join works when both key columns share a name") {
    val big = Seq((1, 100L), (2, 200L)).toDF("id", "row_id")
    val small = Seq((1, "one"), (2, "two")).toDF("id", "label")
    val out = graft.operators.SkewJoin.saltedInnerJoin(big, "id", "row_id", small, "id", salts = 4)
    assert(out.count() == 2)
  }

  test("exact dedup groups duplicate normalized texts") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other doc")
    ).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("group_size") == 2).get
    assert(dup.getAs[Long]("keeper_id") == 1L)
  }

  test("repetition stats: hand-computed fractions on known documents") {
    val df = Seq(
      // 3 lines, one duplicated; words "a b a b a" → dup_word 3/5;
      // 2-grams: (a b, b a, a b, b a) → top 2/4; no 5-gram repeats (1 gram)
      (1L, "a b\na b\nc d"),
      (2L, "a b a b a"),
      (3L, "x y z w v")          // all distinct
    ).toDF("doc_id", "text")
    val got = CorpusFilters.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("dup_line_frac") == 0.333333) // 1/3 rounded to 6
    assert(got(2L).getAs[Long]("n_words") == 5L)
    assert(got(2L).getAs[Double]("dup_word_frac") == 0.6)
    assert(got(2L).getAs[Double]("top_2gram_frac") == 0.5)
    assert(got(2L).getAs[Double]("dup_5gram_frac") == 0.0)
    assert(got(3L).getAs[Double]("dup_word_frac") == 0.0)
    assert(got(3L).getAs[Double]("top_2gram_frac") == 0.25) // 4 distinct 2-grams, max run 1
  }

  test("word_ngrams kernel == interpreted lambda twin") {
    val df = Seq("a b c d e", "  leading and   multi  spaces ", "tab\tand\nnewline sep",
      "one", "", "x y", "\tleading tab words", "trailing newline\n", "\n\t ").toDF("text")
    for (n <- Seq(2, 3, 5)) {
      // canonical tokenization: split on \s+, drop empties (split(trim(...))
      // leaves a phantom '' token behind leading non-space whitespace)
      val words = filter(split(col("text"), "\\s+"), w => length(w) > 0)
      val lambda = when(size(words) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
      val rows = df.select(
        CorpusFilters.wordGrams(col("text"), n).as("kernel"),
        lambda.as("lambda"),
        CorpusFilters.wordGrams(col("text"), n, distinct = true).as("kdistinct"),
        array_distinct(lambda).as("ldistinct")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n all grams")
        assert(r.getSeq[String](2) == r.getSeq[String](3), s"n=$n distinct grams")
      }
    }
  }

  test("quality_stats kernel == regex/lambda twin") {
    val stops = graft.pipeline.TextAnalysis.StopWords
    val df = Seq("The the THE and banana", "  spaced   out  ", "", "one",
      "symbols !@# mixed a1b2 and... the-end", "tabs\tand\nnewlines the it",
      "\tleading tab", "trailing\n").toDF("text")
    val t = col("text")
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val twin = df.select(
      size(words).cast("bigint").as("n_words"),
      length(regexp_replace(t, "\\s", "")).cast("bigint").as("letters"),
      size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("bigint").as("symbols"),
      size(array_distinct(transform(
        filter(words, w => lower(w).isin(stops: _*)), w => lower(w)))).cast("bigint").as("stops"),
      size(filter(words, w => lower(w).isin(stops: _*))).cast("bigint").as("stop_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val kernel = df.select(graft.functions.TextExprs.quality_stats(t, stops).as("s"))
      .collect().map { r =>
        val a = r.getSeq[Long](0); (a(0), a(1), a(2), a(3), a(4))
      }
    assert(kernel.toSeq == twin.toSeq)
    // ...and the occurrence stat on real corpus text (the qualityFeatures
    // numerator; the synthetic rows above cover case folding and repeats)
    val docs = Tables.load(spark, sfDir, "documents").limit(100)
    val corpusWords = filter(split(col("text"), "\\s+"), w => length(w) > 0)
    val tw = docs.select(size(filter(corpusWords,
        w => lower(w).isin(stops: _*))).cast("bigint")).collect().map(_.getLong(0))
    val kn = docs.select(graft.functions.TextExprs.quality_stats(col("text"), stops))
      .collect().map(_.getSeq[Long](0)(4))
    assert(kn.toSeq == tw.toSeq)
  }

  test("maxRunCount equals the max element frequency") {
    val df = Seq(Seq("b", "a", "b", "c", "b"), Seq("x"), Seq.empty[String]).toDF("arr")
    val got = df.select(CorpusFilters.maxRunCount(col("arr"))).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3, 1, 0))
  }

  test("max_freq kernel == interpreted maxRunCount fold (r19)") {
    val arrs = Seq(
      Seq("b", "a", "b", "c", "b"), Seq("x"), Seq.empty[String],
      Seq("a a", "b", "a a", "a", "a"), // multi-word grams, ties
      Seq("ü", "ü", "u"), Seq.fill(100)("same"))
    val df = arrs.toDF("arr")
    val kernel = df.select(graft.functions.TextExprs.max_freq(col("arr")))
      .collect().map(_.getLong(0))
    val fold = df.select(CorpusFilters.maxRunCount(col("arr")))
      .collect().map(_.getInt(0).toLong)
    assert(kernel.toSeq == fold.toSeq)
    // and on real corpus 2-grams (the repetitionStats consumer)
    val g2 = Tables.load(spark, sfDir, "documents")
      .select(CorpusFilters.wordGrams(col("text"), 2).as("arr"))
    val k2 = g2.select(graft.functions.TextExprs.max_freq(col("arr")))
      .collect().map(_.getLong(0))
    val f2 = g2.select(CorpusFilters.maxRunCount(col("arr")))
      .collect().map(_.getInt(0).toLong)
    assert(k2.toSeq == f2.toSeq)
  }

  test("char_ngrams kernel == array_distinct(transform(sequence, substring)) lambda (r19)") {
    def lambda(k: Int) = array_distinct(transform(
      sequence(lit(1), length(col("s")) - (k - 1)),
      i => call_function("substring", col("s"), i, lit(k))))
    val edge = Seq("", "a", "ab", "abc", "abcd", "aaaa", "ababab",
      "héllo wörld", "汉字漢字汉", "a b a b", " ab ",
      "xy", "😀ab😀") // surrogate pair (4-byte UTF-8)
    for (k <- Seq(1, 3, 20)) {
      val df = (edge ++ Tables.load(spark, sfDir, "documents")
        .select(col("text")).limit(50).collect().map(_.getString(0)).toSeq).toDF("s")
      val got = df.select(graft.functions.TextExprs.char_ngrams(col("s"), k,
        distinct = true).as("g")).collect().map(_.getSeq[String](0))
      val want = df.select(lambda(k).as("g")).collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"k=$k")
    }
    // null text: kernel is null-safe like the lambda
    val nulls = Seq[Option[String]](None, Some("abc")).toDF("s")
    val gn = nulls.select(graft.functions.TextExprs.char_ngrams(col("s"), 3,
      distinct = true).as("g")).collect().map(r => Option(r.get(0)))
    assert(gn(0).isEmpty && gn(1).nonEmpty)
  }

  test("lang_id kernel == split/filter/regexp column formulation (r19)") {
    import graft.pipeline.TextAnalysis
    val edge = Seq(
      "", "   ", "the and of is that with for",        // en sweep
      "der und die das ist", "le la les et est",       // de / fr
      "el los y es no para", "the der le el",          // es / 4-way tie -> en
      "y", " y ", "\tthe\nand ", "THE AND OF",         // single/ws/case
      "nothing matches here zzz", "汉字 the and of",    // und / han overrides
      "mixed 漢 text", "no der der le le",             // zh / tie de vs fr -> de
      "ü ö ä the", "is is is der der der")             // non-ASCII tokens / tie
    val df = (edge ++ Tables.load(spark, sfDir, "documents")
      .select(col("text")).limit(50).collect().map(_.getString(0)).toSeq).toDF("text")
    val kernel = df.select(TextAnalysis.languageId(col("text"))).collect().map(_.getString(0))
    val cols = df.select(TextAnalysis.languageIdColumns(col("text"))).collect().map(_.getString(0))
    assert(kernel.toSeq == cols.toSeq)
  }

  test("quality gate rejects on the first failing rule, in order") {
    val df = Seq(
      (1L, Seq.fill(30)("the word and of it").mkString(" ")),     // keep
      (2L, "tiny doc"),                                           // too_short
      (3L, Seq.fill(40)("pneumonoultramicroscopic").mkString(" ")), // word_length
      (4L, Seq.fill(40)("zz qq ww").mkString(" "))                // stopwords
    ).toDF("doc_id", "text")
    val got = CorpusFilters.qualityGate(df, "doc_id", "text", minWords = 20, maxMeanWordLen = 8.0)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("reject_reason")).toMap
    assert(got(1L) == null)
    assert(got(2L) == "too_short")
    assert(got(3L) == "word_length")
    assert(got(4L) == "stopwords")
  }

  test("boilerplate ngrams count distinct docs, not occurrences") {
    val df = Seq(
      (1L, "shared boiler plate text here and more"),
      (2L, "prefix shared boiler plate text here suffix"),
      // gram appears twice within one doc: must count once
      (3L, "shared boiler plate text here shared boiler plate text here")
    ).toDF("doc_id", "text")
    val got = CorpusFilters.boilerplateNgrams(df, "doc_id", "text", n = 5, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.contains(("shared boiler plate text here", 3L, 1L)))
  }

  test("hashed boilerplate variant matches the string-keyed results") {
    val docs = Tables.load(spark, sfDir, "documents")
    val byString = CorpusFilters.boilerplateNgrams(docs, "doc_id", "text", 5, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val byHash = CorpusFilters.boilerplateNgramsHashed(docs, "doc_id", "text", 5, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byHash == byString)
  }

  test("decontamination flags exactly the docs sharing an eval n-gram") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "intro alpha beta gamma delta outro"),  // shares the 4-gram
      (2L, "alpha beta delta gamma nothing here"), // same words, wrong order
      (3L, "unrelated content entirely different") // clean
    ).toDF("doc_id", "text")
    val got = CorpusFilters.decontaminate(train, eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("duplicate groups: min-label propagation finds planted components") {
    // components: {1,2,3,4} (a chain — needs propagation depth), {10,11}, {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find path (default) and the distributed label-propagation
    // path (forced with driverLimit = 0) must agree
    val viaDriver = CorpusFilters.duplicateGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = CorpusFilters.duplicateGroups(pairs, driverLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == expected)
    assert(viaLoop == expected)
  }

  test("duplicate groups: distributed branch matches union-find on chains and on the corpus") {
    // a 12-deep path graph: min-label propagation advances the root label
    // one hop per round, so this pins the O(diameter) convergence claim
    // (rounds ≈ diameter, NOT the 3-5 of shallow stars) and that maxIters
    // is honored as a ceiling, not a fixed cost
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = CorpusFilters.duplicateGroupsDistributed(chain, maxIters = 20)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 12L).map(_ -> 0L).toMap, got.toString)
    assert(rounds >= 12 && rounds <= 14, s"expected ~diameter rounds, got $rounds")
    // shallow stars converge in the documented 3-5
    val stars = (1L to 60L).filter(_ % 4 != 0).map(i => (i - i % 4, i)).toDF("id_a", "id_b")
    val (_, starRounds) = CorpusFilters.duplicateGroupsDistributed(stars, maxIters = 20)
    assert(starRounds <= 5, s"stars took $starRounds rounds")
    // corpus-shaped input: the REAL LSH pair stream — both branches must
    // produce identical cluster assignments, not just counts
    val corpusPairs = Dedup.nearDuplicatePairs(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", threshold = 0.5)
    val viaUf = CorpusFilters.duplicateGroups(corpusPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = CorpusFilters.duplicateGroupsDistributed(corpusPairs)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf.nonEmpty && viaUf == viaProp,
      s"branches disagree on ${viaUf.size}/${viaProp.size} corpus assignments")
  }

  test("tf-idf: rarer terms outrank common ones at equal tf") {
    val df = Seq(
      (1L, "apple banana common"), (2L, "apple cherry common"), (3L, "apple dates common")
    ).toDF("doc_id", "text")
    val top1 = CorpusFilters.tfidfTopTerms(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'apple'/'common' appear in all docs (df=3); the unique term wins everywhere
    assert(top1 == Map(1L -> "banana", 2L -> "cherry", 3L -> "dates"))
  }

  test("cosine LSH top-k achieves reasonable recall; identical vectors collide") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 10, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall too low: $recall")
    // identical vectors always share a bucket (hamming distance 0)
    val sig = Similarity.cosineLshSignature(col("embedding"), nBits = 16)
    val sigs = q.select(sig).collect().map(_.getLong(0))
    val sigs2 = q.select(sig).collect().map(_.getLong(0))
    assert(sigs.toSeq == sigs2.toSeq) // deterministic across evaluations
  }

  test("word_counts kernel == explode+groupBy term frequencies") {
    import spark.implicits._
    import graft.functions.TextExprs
    val docs = Seq(
      (1L, "a b a  c\tb a"), (2L, ""), (3L, "   "), (4L, "solo"),
      (5L, "x x x x x"), (6L, " lead and trail "), (7L, "Ü ü Ü mixed ü"))
      .toDF("id", "text")
    val kernel = docs.select(col("id"), explode(TextExprs.word_counts(col("text"))).as("tc"))
      .select(col("id"), col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val lambda = docs.select(col("id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kernel == lambda, s"${kernel.diff(lambda)} vs ${lambda.diff(kernel)}")
  }

  test("PII scrub: counts match placeholders, redaction is idempotent") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "write to alice.smith+x@sub.example.org or bob@ex.io today"),
      (2L, "server 10.0.0.1 talked to 192.168.255.254; call +49 30 123456"),
      (3L, "no pii here, just words and 42 numbers"),
      (4L, "mix: c@d.co at 8.8.8.8 dial +1 555 0100 end"),
      // overlap: the email's dotted domain also matches the IP pattern —
      // cascade counting must report 1 email, 0 ips (one placeholder each)
      (5L, "edge bob@10.2.3.44.co overlap")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    def count(s: String, sub: String): Int = s.sliding(sub.length).count(_ == sub)
    out.values.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(r.getAs[Long]("n_emails") == count(red, "<EMAIL>"), red)
      assert(r.getAs[Long]("n_ips") == count(red, "<IP>"), red)
      assert(r.getAs[Long]("n_phones") == count(red, "<PHONE>"), red)
    }
    assert(out(1L).getAs[Long]("n_emails") == 2)
    assert(out(2L).getAs[Long]("n_ips") == 2 && out(2L).getAs[Long]("n_phones") == 1)
    assert(out(3L).getAs[String]("redacted") == "no pii here, just words and 42 numbers")
    assert(out(4L).getAs[String]("redacted") == "mix: <EMAIL> at <IP> dial <PHONE> end")
    assert(out(5L).getAs[Long]("n_emails") == 1 && out(5L).getAs[Long]("n_ips") == 0)
    assert(out(5L).getAs[String]("redacted") == "edge <EMAIL> overlap")
    // idempotent: placeholders contain no digits/@, so a second scrub is a no-op
    val once = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
    val twice = TextAnalysis.piiScrub(once, "doc_id", "text")
      .select(col("doc_id"), col("redacted")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, r) => assert(twice(id) == r.getAs[String]("redacted")) }
  }

  test("duplicated spans: kernel gram identity == literal substrings on the corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val byKernel = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20)
      .orderBy("doc_id").collect()
    val bySubstr = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20,
        useKernel = false)
      .orderBy("doc_id").collect()
    assert(byKernel.length == bySubstr.length && byKernel.length == docs.count())
    byKernel.zip(bySubstr).foreach { case (a, b) => assert(a == b) }
  }

  test("duplicated spans: overlapping windows merge to exact union coverage") {
    // docs 1 and 2 share the 12-char prefix "aaaabbbbcccc": with k=4 the
    // duplicated windows at positions 1..9 overlap — union = 12 chars, not 9*4
    val docs = Seq(
      (1L, "aaaabbbbccccXXXX"),
      (2L, "aaaabbbbccccYYYY"),
      (3L, "zzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("dup_chars") == 12L && out(0).getAs[Long]("n_dup_grams") == 9L)
    assert(out(1).getAs[Long]("dup_chars") == 12L)
    // doc 3's windows repeat within itself only — one doc, not duplicated
    assert(out(2).getAs[Long]("dup_chars") == 0L)
  }

  test("strip boilerplate lines: cross-doc lines removed, order kept, within-doc dups don't count") {
    val docs = Seq(
      (1L, "keep me\ncommon footer\nalso mine"),
      (2L, "other text\ncommon footer"),
      // 'twice' repeats within doc 3 only — countDistinct(doc) == 1, stays
      (3L, "twice\ntwice\nunique tail"),
      // doc 4 is nothing but the common line — clean_text must be ''
      (4L, "common footer")).toDF("doc_id", "text")
    val out = CorpusFilters.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "keep me\nalso mine")
    assert(out(0).getAs[Long]("n_removed") == 1L && out(0).getAs[Long]("n_lines") == 3L)
    assert(out(1).getAs[String]("clean_text") == "other text")
    assert(out(2).getAs[String]("clean_text") == "twice\ntwice\nunique tail")
    assert(out(2).getAs[Long]("n_removed") == 0L)
    assert(out(3).getAs[String]("clean_text") == "" && out(3).getAs[Long]("n_removed") == 1L)
  }

  test("shuffle order: a seeded permutation of all rows, different per seed") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Sampling.shuffleOrder(docs, "doc_id", seed = 1L).collect()
    val b = Sampling.shuffleOrder(docs, "doc_id", seed = 2L).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a.map(_.getLong(0)).sorted.toSeq == ids, "seed 1 must be a permutation")
    assert(b.map(_.getLong(0)).sorted.toSeq == ids, "seed 2 must be a permutation")
    assert(a.map(_.getLong(0)).toSeq != b.map(_.getLong(0)).toSeq,
      "different seeds must give different epoch orders")
    // reproducible: same seed, same order
    val a2 = Sampling.shuffleOrder(docs, "doc_id", seed = 1L).collect()
    assert(a.map(_.getLong(0)).toSeq == a2.map(_.getLong(0)).toSeq)
  }

  test("budget mix: rates derive from actual totals; uncapped sources keep everything") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = Sampling.capSourceTokens(docs, "doc_id", "source", "text", capTokens = 1200L)
      .collect()
    // per-source totals for the rate formula
    val totals = docs
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratesSeen = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    ratesSeen.foreach { case (src, rate) =>
      assert(rate == math.min(1000L, 1200000L / totals(src)),
        s"rate for $src must be floor(1000*cap/total)")
    }
    // a source under the cap keeps every doc
    val kept = out.map(_.getLong(0)).toSet
    totals.filter(_._2 <= 1200L).keys.foreach { src =>
      val ids = docs.filter(col("source") === src).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.forall(kept.contains), s"uncapped source $src must keep all docs")
    }
    // deterministic: second run identical
    val again = Sampling.capSourceTokens(docs, "doc_id", "source", "text", 1200L)
      .collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("corpus operators: multilingual symbols, port bypass, blank lines, short docs, empty docs") {
    import spark.implicits._
    import graft.pipeline.{CorpusFilters, Dedup, TextAnalysis}
    // a Russian document is letters, not symbols — the ASCII-alnum kernel
    // classified 100% of it as symbols and the default 10% cap rejected
    // every non-Latin document
    val ru = Seq((1L, "Это обычный русский текст без лишних символов и достаточно длинный чтобы пройти фильтры качества el la"))
      .toDF("doc_id", "text")
    val gate = CorpusFilters.qualityGate(ru, "doc_id", "text", minWords = 3, minStopwords = 0)
      .collect().head
    assert(gate.getAs[Double]("symbol_ratio") < 0.05, gate.toString)
    // a :port must not bypass the domain blocklist
    val urls = Seq((1L, "see http://malware.evil.com:8080/x now"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.urlStats(urls, "doc_id", "text", Seq("evil.com"))
      .collect().head.getAs[Boolean]("has_blocked"))
    // leading tab: no phantom token
    assert(Seq(("\tfoo bar")).toDF("text")
      .select(TextAnalysis.tokenCount(col("text"))).head.getLong(0) == 2L)
    // blank lines are structure, not boilerplate — paragraph breaks survive
    val para = Seq((1L, "alpha\n\nbeta"), (2L, "gamma\n\ndelta"))
      .toDF("doc_id", "text")
    val stripped = CorpusFilters.stripBoilerplateLines(para, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(stripped(1L) == "alpha\n\nbeta", stripped.toString)
    // identical sub-shingle docs ARE duplicates (jaccard 1), different ones are not (0)
    val jac = Seq(("abc", "abc"), ("abc", "xyz")).toDF("a", "b")
      .select(Dedup.ngramJaccard(col("a"), col("b"), n = 9)).collect()
    assert(jac(0).getDouble(0) == 1.0 && jac(1).getDouble(0) == 0.0)
    // an empty-text doc still gets its per-doc unigram row (NULL score)
    val lm = CorpusFilters.unigramLogProb(
      Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm == Map(1L -> 2L, 2L -> 0L), lm.toString)
    // string ids route to the distributed clustering branch instead of
    // crashing the driver union-find's long cast
    val groups = CorpusFilters.duplicateGroups(
      Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b"))
      .collect().map(_.getString(1)).distinct
    assert(groups.toSeq == Seq("a"), groups.mkString(","))
    // non-convergence is an error naming the knob, never silent wrong labels
    val chain = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      CorpusFilters.duplicateGroupsDistributed(chain, maxIters = 3)._1.collect()
    }
    assert(e.getMessage.contains("maxIters"), e.getMessage)
  }

  test("sampling hash: ANSI-safe at production ids; salt decorrelates; NULL source capped") {
    import spark.implicits._
    // ids past ~8.4e9: the unreduced LCG multiply overflows Long, and ANSI
    // mode (Spark 4's default, never disabled here) makes that a crash
    val big = Seq(10000000000L, 8400000001L, Long.MaxValue - 5).toDF("id")
    big.select(Sampling.hashBucket(col("id"))).collect()
    Sampling.shuffleOrder(big, "id", seed = 3L).collect()
    // the salt must make chained stages sample independently: at rate 500,
    // an unsalted second stage would agree with the first on EVERY id
    val ids = spark.range(2000).toDF("id")
    val h = ids.select(Sampling.hashBucket(col("id")).as("b0"),
      Sampling.hashBucket(col("id"), salt = 1L).as("b1")).collect()
    val agree = h.count(r => (r.getLong(0) < 500L) == (r.getLong(1) < 500L))
    assert(agree > 100 && agree < 1900, s"salted stage still correlated: $agree/2000 agree")
    // a NULL-source doc is capped like any source, not dropped by the join
    val docs = Seq((1L, null: String, "a b c"), (2L, "s", "d e"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.capSourceTokens(docs, "doc_id", "source", "text", 1000000L).collect()
    assert(out.length == 2, s"NULL-source doc vanished: ${out.mkString(",")}")
  }

  test("packSequences: duplicate ids still pack end-to-end (ROWS frame)") {
    import spark.implicits._
    // two docs share id=1: the default RANGE frame would sum both peers
    // into each row's running total and produce overlapping token_starts
    val df = Seq((1L, "s", "a b"), (1L, "s", "c d e"), (2L, "s", "f"))
      .toDF("doc_id", "source", "text")
    val rows = Sampling.packSequences(df, "doc_id", "source", "text", 4L)
      .orderBy("token_start").collect()
    var expectStart = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("token_start") == expectStart,
        s"packing not end-to-end: ${rows.mkString(",")}")
      expectStart += r.getAs[Long]("n_tokens")
    }
    assert(expectStart == 6L)
  }

  test("rank quantiles: nearest-rank values on a known distribution") {
    // group g: values 10..100 step 10 (n=10): p250→rank3=30, p500→rank5=50,
    // p750→rank8=80, p900→rank9=90
    val df = (1 to 10).map(i => ("g", i * 10L, i.toLong)).toDF("src", "v", "id")
    val out = Sampling.rankQuantiles(df, "src", "v", "id")
      .orderBy("pct_mille").collect()
    assert(out.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((250, 30L), (500, 50L), (750, 80L), (900, 90L)))
  }

  test("phash: kernel matches a direct reimplementation; value noise stays within a few bits") {
    val texts = Seq("the quick brown fox jumps over the lazy dog " * 6, "short", "")
    def ref(bytes: Array[Byte]): Long = {
      val n = bytes.length
      if (n == 0) 0L else {
        val sums = new Array[Long](65)
        bytes.indices.foreach(i => sums(((i.toLong * 65) / n).toInt) += (bytes(i) & 0xff).toLong)
        (0 until 64).foldLeft(0L)((acc, b) => if (sums(b) > sums(b + 1)) acc | (1L << b) else acc)
      }
    }
    val out = texts.toDF("t")
      .select(graft.pipeline.Multimodal.perceptualHash(encode(col("t"), "UTF-8")))
      .collect().map(_.getLong(0))
    assert(out.toSeq == texts.map(t => ref(t.getBytes("UTF-8"))))
    // byte-value noise (same length): few bits flip
    val base = ref(texts.head.getBytes("UTF-8"))
    val noisy = ref(texts.head.replace('o', '0').getBytes("UTF-8"))
    assert(java.lang.Long.bitCount(base ^ noisy) <= 16)
  }

  test("image codec: ImageIO decodes real png/jpeg/bmp/gif bytes to true dimensions") {
    // the codec is REAL: bytes rendered by ImageIO are decoded back by
    // ImageIO for width/height/format, and lossless formats return an exact
    // mean pixel value — no derived-from-length pseudo-metadata anywhere
    import graft.pipeline.Multimodal
    val readers = new Multimodal.ImageReaders
    for (fmt <- Seq("png", "jpeg", "bmp", "gif")) {
      val img = new java.awt.image.BufferedImage(
        37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(200, 200, 200)); g.fillRect(0, 0, 37, 21)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK $fmt writer")
      val Some((w, h, f, mean)) = Multimodal.decodeImage(bos.toByteArray, readers)
      assert((w, h, f) == (37, 21, fmt), s"$fmt decoded to ($w,$h,$f)")
      // gif included: the JDK writer palettizes it, so this pins that
      // mean_px reads COLORS through the IndexColorModel, not palette
      // indices (a solid-gray gif would otherwise report ~0)
      if (fmt == "png" || fmt == "bmp" || fmt == "gif")
        assert(mean.contains(200.0), s"$fmt mean_px: $mean")
      if (fmt == "jpeg") assert(mean.isEmpty, "jpeg must stay header-only")
    }
    // corrupt/unknown payloads must decode to None, not throw
    assert(Multimodal.decodeImage("not an image at all".getBytes, readers).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](0x89.toByte, 'P', 'N', 'G'), readers).isEmpty)
    // truncated png: valid magic, unreadable body
    val png = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB), "png", b); b.toByteArray }
    assert(Multimodal.decodeImage(png.take(20), readers).isEmpty)
  }

  test("image decode on the corpus: fixture manifest round-trips through real encoded bytes") {
    import graft.pipeline.Multimodal
    val docs = Tables.load(spark, sfDir, "documents")
    val decoded = Multimodal.decodeImages(
      spark, Multimodal.withImagePayload(docs, "doc_id"), "doc_id").collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val id = r.getLong(0)
      val (w, h, fmt, v) = Multimodal.fixtureSpec(id)
      assert(r.getInt(2) == w && r.getInt(3) == h && r.getString(4) == fmt, r.toString)
      assert(r.getLong(1) > 0L, "n_bytes must be the real encoded size")
      if (fmt == "jpeg") assert(r.isNullAt(5), "jpeg is header-only")
      else assert(r.getDouble(5) == v.toDouble, s"lossless mean drifted: $r")
    }
    // all three formats exercised across the corpus
    assert(decoded.map(_.getString(4)).toSet == Set("png", "jpeg", "bmp"))
  }

  test("audio decode: real WAV bytes round-trip the fixture manifest; corrupt payloads are NULL-safe") {
    import graft.pipeline.Multimodal
    // the renderer emits a genuine RIFF/WAVE container
    val wav = Multimodal.renderAudioFixture(7L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // mono + stereo, all three rates, exact constant-sample RMS
    for (id <- 0L to 5L) {
      val (rate, ch, frames, value) = Multimodal.audioFixtureSpec(id)
      val Some((r, c, f, rms)) = Multimodal.decodeAudio(Multimodal.renderAudioFixture(id))
      assert((r, c, f) == (rate, ch, frames.toLong), s"id=$id decoded ($r,$c,$f)")
      assert(rms == value.toDouble, s"id=$id rms=$rms expected $value")
    }
    // corrupt/truncated/foreign payloads: None, never a throw
    assert(Multimodal.decodeAudio("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(wav.take(16)).isEmpty)
    assert(Multimodal.decodeAudio(Multimodal.renderFixture(3L)).isEmpty, "a png is not audio")
    // negative ids must render valid audio (floorMod manifest), not crash the scan
    for (id <- Seq(-1L, -700L, -20001L)) {
      val (nr, nc, nf, nv) = Multimodal.audioFixtureSpec(id)
      assert(nc >= 1 && nf > 0 && nv >= 0, s"id=$id spec=($nr,$nc,$nf,$nv)")
      val Some((r2, c2, f2, rms2)) = Multimodal.decodeAudio(Multimodal.renderAudioFixture(id))
      assert((r2, c2, f2, rms2) == (nr, nc, nf.toLong, nv.toDouble), s"id=$id")
    }
    // batch path on the corpus: manifest round-trips, no nulls for valid rows
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 100)
    val decoded = Multimodal.decodeAudioBatch(
      Multimodal.withAudioPayload(docs, "doc_id"), "doc_id").collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val (rate, ch, frames, value) = Multimodal.audioFixtureSpec(r.getLong(0))
      assert(r.getInt(2) == rate && r.getInt(3) == ch && r.getLong(4) == frames.toLong, r.toString)
      assert(r.getDouble(5) == value.toDouble, r.toString)
    }
    assert(decoded.map(_.getInt(2)).toSet == Set(8000, 16000, 22050))
    assert(decoded.map(_.getInt(3)).toSet == Set(1, 2))
    // missing vs empty payload stay distinguishable in the batch path:
    // NULL payload → NULL n_bytes; a real zero-length blob → n_bytes = 0
    val edge = Multimodal.decodeAudioBatch(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(900L, null),
          org.apache.spark.sql.Row(901L, Array.emptyByteArray))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.BinaryType)))),
      "doc_id").collect().map(r => r.getLong(0) -> r).toMap
    assert(edge(900L).isNullAt(1), "missing payload must yield NULL n_bytes")
    assert(edge(901L).getLong(1) == 0L, "empty payload must yield n_bytes = 0")
    assert(edge.values.forall(_.isNullAt(2)), "neither decodes")
  }

  test("phash near-dup pairs: identical payloads pair at hamming 0; blocking finds corpus near-dups") {
    val docs = Seq(
      (1L, "a document body that is long enough to segment meaningfully ok"),
      (2L, "a document body that is long enough to segment meaningfully ok"),
      (3L, "completely different content with other words and other sums!!")
    ).toDF("doc_id", "text")
    val withBin = graft.pipeline.Multimodal.withBinaryPayload(docs, "text")
    val pairs = graft.pipeline.Multimodal.phashNearDupPairs(withBin, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)), s"identical payloads must pair: ${pairs.toSeq}")
    // the corpus near-dups surface through band blocking (non-empty at sf0.001)
    val corpus = graft.pipeline.Multimodal.withBinaryPayload(
      Tables.load(spark, sfDir, "documents"), "text")
    assert(graft.pipeline.Multimodal.phashNearDupPairs(corpus, "doc_id", "payload")
      .count() > 0)
  }

  test("cut spans: owner keeps the duplicated region, others lose exactly it") {
    // docs 1..3 share the 12-char region "AAAABBBBCCCC" (k=4): doc 1 is the
    // min-id owner and keeps its text verbatim; docs 2 and 3 have the region
    // (and every window overlapping it) cut out
    val docs = Seq(
      (1L, "xxAAAABBBBCCCCyy"),
      (2L, "mmmmAAAABBBBCCCCnnnn"),
      (3L, "AAAABBBBCCCC"),
      (4L, "totally unrelated!!")).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "xxAAAABBBBCCCCyy",
      "min-id owner must keep its occurrence")
    assert(out(0).getAs[Long]("removed_chars") == 0L)
    // doc 2: the duplicated windows are the 9 starts of AAAABBBBCCCC inside
    // it (positions 5..13) → merged cut [5, 17) = exactly the shared region
    assert(out(1).getAs[String]("clean_text") == "mmmmnnnn")
    assert(out(1).getAs[Long]("removed_chars") == 12L)
    // doc 3 is nothing but the shared region → cut to empty, not null
    assert(out(2).getAs[String]("clean_text") == "")
    assert(out(2).getAs[Long]("removed_chars") == 12L)
    // doc 4 untouched (and shorter-than-k docs would pass through too)
    assert(out(3).getAs[String]("clean_text") == "totally unrelated!!")
  }

  test("cut spans kernel pair identity == substring identity on single-byte text (r15)") {
    // the scale path: the two-family 128-bit rolling-hash identity must cut
    // EXACTLY what the exact-substring identity cuts (byte == char on this
    // corpus); collisions would show as extra cuts, a broken second family
    // (e.g. a seed-only variant, which shares every collision) would show
    // as nothing-diverges-ever, so also assert the two hash families really
    // differ on the same input
    // deterministic subset — a bare limit() picks DIFFERENT rows for each
    // of the operator's several self-references
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 400)
    val bySub = Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 20)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val byKernel = Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 20,
        useKernel = true)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // NOTE: assert's clue evaluates eagerly — keep it total
    val firstDiff = bySub.zip(byKernel).indexWhere { case (a, b) => a != b }
    assert(bySub == byKernel,
      s"sizes ${bySub.size}/${byKernel.size}, first divergence at row $firstDiff: " +
        (if (firstDiff >= 0) s"sub=${bySub(firstDiff)} ker=${byKernel(firstDiff)}" else ""))
    val h1 = graft.functions.RollingHashes.compute("abcdefghij".getBytes, 4, 0L)
    val h2 = graft.functions.RollingHashes.compute("abcdefghij".getBytes, 4, 0L,
      graft.functions.RollingHashes.B2)
    assert(h1.toSeq != h2.toSeq, "the two polynomial families must be independent")
  }

  test("cut spans kernel == substring identity at realistic k (50, 100) (r16)") {
    // Lee et al. 2022 dedups at ~50-token granularity; the k=20 parity pin
    // above exercises dense overlaps, this one pins the kernel at the span
    // lengths a production corpus run would use — the window arithmetic
    // (rolling pop/push over 50/100-byte windows, island merging at larger
    // k) must agree with the literal-substring identity exactly.
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 400)
    Seq(50, 100).foreach { k =>
      val bySub = Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = k)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val byKernel = Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = k,
          useKernel = true)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val firstDiff = bySub.zip(byKernel).indexWhere { case (a, b) => a != b }
      assert(bySub == byKernel,
        s"k=$k: sizes ${bySub.size}/${byKernel.size}, first divergence at row " +
          s"$firstDiff: " +
          (if (firstDiff >= 0) s"sub=${bySub(firstDiff)} ker=${byKernel(firstDiff)}" else ""))
      // the cut must be non-trivial at this k on the corpus, or the parity
      // pin proves nothing (documents plants cross-doc duplicated spans)
      assert(bySub.exists(r => r(2).asInstanceOf[Long] > 0L),
        s"k=$k: corpus subset cut nothing — parity vacuous")
    }
  }

  test("spans K-pass (scratch-bounded): identical to single-pass, kernel == substring (r17)") {
    // passes > 1 slices the gram shuffle by gram hash into K scratch-bounded
    // jobs (the fourth-decade path: the single-pass shuffle's scratch
    // exceeds a node's local disk at sf100 — r16 named skips). Gram slices
    // are disjoint and per-gram decisions depend only on same-gram rows, so
    // the union must equal the single-pass result EXACTLY — pinned here for
    // both operators and both gram identities, plus kernel == substring ON
    // the K-pass path itself.
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 400)
    val scratch = java.nio.file.Files.createTempDirectory("kpass-spec-").toString
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    Seq(false, true).foreach { kern =>
      val cov1 = rows(Dedup.duplicatedSpanCoverage(docs, "doc_id", "text",
        k = 20, useKernel = kern))
      val covK = rows(Dedup.duplicatedSpanCoverage(docs, "doc_id", "text",
        k = 20, useKernel = kern, passes = 3,
        scratchDir = Some(s"$scratch/cov-$kern")))
      assert(covK == cov1, s"coverage K-pass diverged (kernel=$kern)")
      val cut1 = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text",
        k = 20, useKernel = kern))
      val cutK = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text",
        k = 20, useKernel = kern, passes = 3,
        scratchDir = Some(s"$scratch/cut-$kern")))
      assert(cutK == cut1, s"cut K-pass diverged (kernel=$kern)")
    }
    // kernel == substring directly on the K-pass results (the r16 verdict's
    // done-criterion for the fourth-decade variant)
    val kSub = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 20,
      useKernel = false, passes = 2, scratchDir = Some(s"$scratch/p-sub")))
    val kKer = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 20,
      useKernel = true, passes = 2, scratchDir = Some(s"$scratch/p-ker")))
    assert(kSub == kKer, "K-pass kernel identity must match substring identity")
    assert(kSub.exists(r => r(2).asInstanceOf[Long] > 0L), "parity vacuous: nothing cut")
  }

  test("cut spans: removed_chars equals coverage dup_chars for non-owner docs") {
    // on the real corpus, a doc that owns none of its duplicated grams must
    // have removed_chars == the coverage operator's dup_chars; owners have
    // removed_chars <= dup_chars. Cut text length must always reconcile.
    val docs = Tables.load(spark, sfDir, "documents")
    val cov = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20,
        useKernel = false)
      .select(col("doc_id"), col("dup_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 20)
      .collect().foreach { r =>
        val id = r.getLong(0)
        assert(r.getAs[Long]("removed_chars") <= cov(id))
        assert(r.getAs[String]("clean_text").length ==
          r.getAs[Long]("n_chars") - r.getAs[Long]("removed_chars"))
      }
  }

  test("banded pairs: oversized buckets emit star edges, not zero pairs and not all-pairs") {
    // 50 byte-identical payloads: every band bucket holds all 50 rows.
    // With maxBucket=10 the old drop-the-bucket guard returned ZERO pairs;
    // star edges keep every member connected to the min-id representative.
    val docs = (1L to 50L).map(i => (i, "exactly the same payload bytes"))
      .toDF("doc_id", "text")
    val withBin = graft.pipeline.Multimodal.withBinaryPayload(docs, "text")
    val pairs = graft.pipeline.Multimodal.phashNearDupPairs(
        withBin, "doc_id", "payload", maxHamming = 0, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == (2L to 50L).map(i => (1L, i)).toSet,
      s"expected 49 star edges to doc 1, got ${pairs.length}")
    // healthy buckets (cap not hit) still produce ALL intra-bucket pairs
    val allPairs = graft.pipeline.Multimodal.phashNearDupPairs(
        withBin, "doc_id", "payload", maxHamming = 0, maxBucket = 100)
      .count()
    assert(allPairs == 50L * 49 / 2)
  }

  test("phash banding knob: sizing rule, wider-band selectivity, stats census, recall floor (r16)") {
    import graft.pipeline.Multimodal
    // the sizing rule: smallest power-of-two band width >= log2(n) — the
    // most bands (best recall) that keep expected candidates ~linear
    assert(Multimodal.phashBandsFor(1000L) == 4)
    assert(Multimodal.phashBandsFor(65536L) == 4) // log2 = 16 exactly
    assert(Multimodal.phashBandsFor(65537L) == 2) // past 2^16: 32-bit bands
    assert(Multimodal.phashBandsFor(1L << 32) == 2)
    assert(Multimodal.phashBandsFor((1L << 32) + 1) == 1) // exact-hash blocking
    // maxHamming participates (r17, was a declared-but-dead parameter): the
    // CHEAPEST banding keeping the h < bands recall guarantee wins when
    // selectivity affords it; selectivity still caps from above
    assert(Multimodal.phashBandsFor(1000L, maxHamming = 0) == 1) // exact blocking suffices
    assert(Multimodal.phashBandsFor(1000L, maxHamming = 1) == 2)
    assert(Multimodal.phashBandsFor(1000L, maxHamming = 3) == 4)
    assert(Multimodal.phashBandsFor(1L << 32, maxHamming = 3) == 2) // selectivity caps
    assert(Multimodal.phashBandsFor((1L << 32) + 1, maxHamming = 1) == 1)
    val docs = Tables.load(spark, sfDir, "documents")
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    def candTotal(bands: Int): Long =
      Multimodal.phashBandingStats(withBin, "doc_id", "payload", bands = bands)
        .collect()
        .map(r => r.getAs[Long]("exact_pairs") + r.getAs[Long]("degraded_pairs")).sum
    // wider bands are strictly more selective on the census corpus — the
    // dial the r13 census needed (4x16 bands: 13B candidates at sf100)
    val (c4, c2, c1) = (candTotal(4), candTotal(2), candTotal(1))
    assert(c2 < c4, s"2x32 banding must cut candidates vs 4x16 ($c2 !< $c4)")
    assert(c1 <= c2, s"1x64 (exact-hash) must be the most selective ($c1 !<= $c2)")
    // refinement containment: agreeing on a 32-bit band implies agreeing on
    // both of its 16-bit halves, so wide-band VERIFIED pairs are a subset
    // of the default banding's (no skew cap in play at this scale)
    def pairSet(bands: Int): Set[(Long, Long)] =
      Multimodal.phashNearDupPairs(withBin, "doc_id", "payload",
          maxHamming = 8, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (p4, p2) = (pairSet(4), pairSet(2))
    assert(p2.subsetOf(p4), s"wide-band pairs must refine the default's: ${(p2 -- p4).take(3)}")
    // recall floor: hamming < bands is GUARANTEED a clean band — exact
    // duplicates (hamming 0) must pair under EVERY banding, including 1x64
    val planted = Seq(
      (9000001L, "an exactly duplicated payload body for the recall floor"),
      (9000002L, "an exactly duplicated payload body for the recall floor"),
      (9000003L, "some completely unrelated other content ............. !")
    ).toDF("doc_id", "text")
    Seq(1, 2, 4, 8).foreach { bands =>
      val pairs = Multimodal.phashNearDupPairs(
          Multimodal.withBinaryPayload(planted, "text"), "doc_id", "payload",
          maxHamming = 0, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.contains((9000001L, 9000002L)),
        s"exact dup must survive bands=$bands: ${pairs.toSeq}")
    }
    // invalid band counts refuse by name
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashBandingStats(withBin, "doc_id", "payload", bands = 3)
    }
    assert(e.getMessage.contains("divide 64"))
    // AUTO default (r17): leaving `bands` unset applies the sizing rule —
    // on this corpus that IS the 4x16 banding, so the default-call pairs
    // equal the explicit ones (a caller who never reads the scaladoc gets
    // phashBandsFor, not the proven-OOM-at-corpus-scale fixed default)
    val autoPairs = Multimodal.phashNearDupPairs(withBin, "doc_id", "payload",
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Multimodal.phashBandsFor(docs.count(), 8) == 4)
    assert(autoPairs == p4, "auto banding must equal the sizing-rule banding")
  }

  test("int8 quantization round-trips within scale/2 per component") {
    val e = Tables.load(spark, sfDir, "embeddings").limit(50)
    val out = Similarity.quantizeInt8(e, "vec_id", "embedding")
      .join(e.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "vec_id")
      .collect()
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val codes = r.getSeq[Long](r.fieldIndex("codes"))
      val v = r.getSeq[Double](r.fieldIndex("v"))
      assert(codes.forall(c => c >= -127 && c <= 127), "codes must fit int8")
      codes.zip(v).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9,
          s"dequant error beyond scale/2: code=$c x=$x scale=$scale")
      }
    }
  }

  test("quantize_i8 kernel == interpreted lambda twin (r19)") {
    // corpus vectors + synthetic corners: zeros, negatives, null element,
    // empty array, all-null array
    val e = Tables.load(spark, sfDir, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("vec_id")).collect().map { r =>
        (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
          r.getSeq[Any](2))
      }.toSeq
    assert(rows(Similarity.quantizeInt8(e, "vec_id", "embedding")) ==
      rows(Similarity.quantizeInt8Columns(e, "vec_id", "embedding")))
    val edge = Seq(
      (1L, Seq(0.0f, 0.0f)),               // scale 0 -> all-zero codes
      (2L, Seq(-2.5f, 1.25f, 0.0f)),       // negatives, floor rounding
      (3L, Seq.empty[Float]),              // empty -> null scale, [] codes
      (4L, Seq(127.0f)), (5L, Seq(1e-30f)) // extremes
    ).toDF("vec_id", "embedding")
    assert(rows(Similarity.quantizeInt8(edge, "vec_id", "embedding")) ==
      rows(Similarity.quantizeInt8Columns(edge, "vec_id", "embedding")))
  }

  test("spans K-pass r18: default scratch is block-manager-managed (no temp dirs); size-aware slicing identical") {
    // r17 verdict seam #1: the default K-pass scratch was a DRIVER-LOCAL
    // temp parquet dir with no lifecycle — wrong on a multi-node cluster
    // (executors task-commit per-node, the union read goes partial) and
    // leaked GBs per invocation. r18 default: eagerly-materialized
    // DISK_ONLY persistence — block-manager scratch, per-executor-correct,
    // released via the explicit releaseSpansScratch handle (Dataset
    // persistence is CacheManager-pinned; the ContextCleaner never drops
    // it — measured r18: 40 GB survived its gate). Pins: (a) the default
    // path creates NO graft-spans-kpass temp dir; (b) default K-pass ==
    // single-pass; (c) size-aware (census + LPT bucket packing) K-pass ==
    // single-pass for both operators; (d) the release handle reports the
    // slices it dropped and goes quiet once drained.
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 400)
    Dedup.releaseSpansScratch(spark): Unit // drain any earlier test's slices
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def kpassDirs(): Int = Option(tmp.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("graft-spans-kpass-"))
    val dirsBefore = kpassDirs()
    val cov1 = rows(Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20))
    val covK = rows(Dedup.duplicatedSpanCoverage(docs, "doc_id", "text",
      k = 20, passes = 3)) // DEFAULT scratch: no scratchDir
    assert(covK == cov1, "default (persisted) K-pass diverged from single-pass")
    assert(kpassDirs() == dirsBefore,
      "default K-pass must not create driver-local temp scratch dirs")
    val covS = rows(Dedup.duplicatedSpanCoverage(docs, "doc_id", "text",
      k = 20, passes = 3, sizeAware = true))
    assert(covS == cov1, "size-aware K-pass coverage diverged from single-pass")
    val cut1 = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text",
      k = 20, useKernel = true))
    val cutS = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text",
      k = 20, useKernel = true, passes = 3, sizeAware = true))
    assert(cutS == cut1, "size-aware K-pass cut diverged from single-pass")
    val cutD = rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text",
      k = 20, useKernel = false, passes = 2))
    assert(cutD == rows(Dedup.cutDuplicatedSpans(docs, "doc_id", "text",
      k = 20, useKernel = false)), "default K-pass cut diverged (substring identity)")
    assert(kpassDirs() == dirsBefore, "no temp scratch dirs after any default K-pass")
    assert(cut1.exists(r => r(2).asInstanceOf[Long] > 0L), "parity vacuous: nothing cut")
    // (d) scratch lifecycle: the runs above persisted 3+3+3+2 slices in
    // this session; the release handle drops them all, then goes quiet
    assert(Dedup.releaseSpansScratch(spark) == 11,
      "release handle must drop every persisted K-pass slice of this session")
    assert(Dedup.releaseSpansScratch(spark) == 0, "second release must be a no-op")
  }

  test("kpassSlices evicts stopped sessions; release handle unchanged for live ones (r19 verdict #2)") {
    // The scratch map is keyed by SparkSession with strong references and
    // (pre-r19) removed entries only via releaseSpansScratch — a gateway
    // that churns sessions through K-pass runs without the release handle
    // pinned each dead session + its cached slice plans in the companion
    // object for JVM lifetime (the r16 openSessionSparks shape). Eviction
    // now fires on every map access via the kpassSessionStopped predicate;
    // the suite JVM shares ONE SparkContext so the probe overrides the
    // predicate rather than genuinely stopping a context (the default IS
    // the real isStopped — also pinned here).
    val docs2 = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 200)
    Dedup.releaseSpansScratch(spark): Unit
    val s2 = spark.newSession()
    val defaultPred = Dedup.kpassSessionStopped
    assert(!defaultPred(spark), "default predicate: a live session is not stopped")
    try {
      val docsS2 = Tables.load(s2, sfDir, "documents").filter(col("doc_id") < 200)
      // live path: entry registered, release handle drops it (count = passes)
      Dedup.duplicatedSpanCoverage(docsS2, "doc_id", "text", k = 20, passes = 2)
        .collect(): Unit
      assert(Dedup.kpassScratchSessions.exists(_ eq s2), "K-pass run must register its session")
      assert(Dedup.releaseSpansScratch(s2) == 2, "live-session release must drop both slices")
      assert(!Dedup.kpassScratchSessions.exists(_ eq s2))
      // stopped path A: a K-pass run in ANOTHER session prunes the dead entry
      Dedup.duplicatedSpanCoverage(docsS2, "doc_id", "text", k = 20, passes = 2)
        .collect(): Unit
      assert(Dedup.kpassScratchSessions.exists(_ eq s2))
      Dedup.kpassSessionStopped = s => s eq s2 // simulate: s2's context stopped
      Dedup.duplicatedSpanCoverage(docs2, "doc_id", "text", k = 20, passes = 2)
        .collect(): Unit
      assert(!Dedup.kpassScratchSessions.exists(_ eq s2),
        "registration access must evict the stopped session's entry")
      assert(Dedup.kpassScratchSessions.exists(_ eq spark), "live session stays registered")
      assert(Dedup.releaseSpansScratch(s2) == 0, "evicted entry: release is a no-op")
      assert(Dedup.releaseSpansScratch(spark) == 2)
      // stopped path B: release handle on a stopped session with a live
      // entry removes it WITHOUT unpersist (the block manager died with
      // the context; unpersist would throw)
      Dedup.kpassSessionStopped = defaultPred
      Dedup.duplicatedSpanCoverage(docsS2, "doc_id", "text", k = 20, passes = 2)
        .collect(): Unit
      Dedup.kpassSessionStopped = s => s eq s2
      assert(Dedup.releaseSpansScratch(s2) == 2,
        "stopped-session release must still report and drop the entry")
      assert(!Dedup.kpassScratchSessions.exists(_ eq s2))
    } finally {
      Dedup.kpassSessionStopped = defaultPred
      Dedup.releaseSpansScratch(spark): Unit
      Dedup.releaseSpansScratch(s2): Unit
    }
  }

  test("size-aware K-pass warns when the persist-scratch estimate blows the budget (r19 verdict #3)") {
    // The r18 sweep measured DISK_ONLY position batches >10x the size of
    // parquet scratch (60 GB overflow vs ~2 GB at the fourth decade) — the
    // census is already in hand under sizeAware, so a persist-mode run
    // whose gram-shuffle estimate exceeds the configured budget must say
    // so BEFORE the first pass, by name, recommending scratchDir.
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 200)
    val key = "spark.graft.kpass.persistScratchWarnBytes"
    Dedup.releaseSpansScratch(spark): Unit
    try {
      spark.conf.set(key, "1") // any census total exceeds 1 byte
      Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20,
        passes = 2, sizeAware = true).collect(): Unit
      val warn = Dedup.lastScratchWarning
      assert(warn.isDefined, "tiny budget must fire the scratch warning")
      assert(warn.get.contains("scratchDir") && warn.get.contains(key),
        s"warning must name the knob and the remedy: $warn")
      Dedup.releaseSpansScratch(spark): Unit
      // default budget (64 GiB): the test corpus is far under it
      spark.conf.unset(key)
      Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20,
        passes = 2, sizeAware = true).collect(): Unit
      assert(Dedup.lastScratchWarning.isEmpty, "default budget must stay quiet at test scale")
      Dedup.releaseSpansScratch(spark): Unit
      // caller-owned parquet scratch: the persist estimate does not apply
      spark.conf.set(key, "1")
      val dir = java.nio.file.Files.createTempDirectory("graft-warn-probe").toString
      Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20,
        passes = 2, sizeAware = true, scratchDir = Some(dir)).collect(): Unit
      assert(Dedup.lastScratchWarning.isEmpty,
        "parquet-scratch mode must not fire the persist warning")
    } finally {
      spark.conf.unset(key)
      Dedup.releaseSpansScratch(spark): Unit
    }
  }

  test("K-pass lifecycle race: releaseSpansScratch + clear() against in-flight runs (r19 verdict #6)") {
    // The release handle unpersists CacheManager-pinned slices; a release
    // landing between a pass's materialization and the union read forces
    // recompute-from-source, never wrong rows — raced here for 3 seeds
    // against concurrent K-pass runs and mid-run TableEnv.clear() (the
    // slices buffer is synchronized; release-during-union-read had no
    // concurrency coverage before this pin).
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 250)
    val expected = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    Seq(9101, 9102, 9103).foreach { seed =>
      Dedup.releaseSpansScratch(spark): Unit
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      pool.submit(new Runnable {
        def run(): Unit = try {
          (1 to 3).foreach { i =>
            val got = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text",
              k = 20, passes = 2).orderBy("doc_id").collect().map(_.toSeq).toSeq
            if (got != expected)
              failures.add(s"seed $seed run $i: K-pass diverged under release race")
          }
        } catch { case e: Throwable => failures.add(s"seed $seed runner: $e") }
        finally done.set(true)
      })
      pool.submit(new Runnable {
        def run(): Unit = try {
          val rnd = new scala.util.Random(seed)
          while (!done.get()) {
            Thread.sleep((1 + rnd.nextInt(20)).toLong)
            Dedup.releaseSpansScratch(spark): Unit
          }
        } catch { case e: Throwable => failures.add(s"seed $seed releaser: $e") }
      })
      pool.submit(new Runnable {
        def run(): Unit = try {
          val rnd = new scala.util.Random(seed * 7)
          while (!done.get()) {
            Thread.sleep((5 + rnd.nextInt(40)).toLong)
            graft.engine.TableEnv.clear()
          }
        } catch { case e: Throwable => failures.add(s"seed $seed clearer: $e") }
      })
      pool.shutdown()
      assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS),
        s"seed $seed: race workers did not finish")
      assert(failures.isEmpty, s"${failures.toArray.mkString("; ")}")
      Dedup.releaseSpansScratch(spark): Unit
    }
  }

  test("assignBuckets: LPT isolates heavy buckets, balances the rest, deterministic") {
    val skew = Seq(1000L, 1L, 1L, 1L, 500L, 499L, 1L, 1L)
    val a = Dedup.assignBuckets(skew, 3)
    assert(a.length == skew.length && a.forall(s => s >= 0 && s < 3))
    val loads = (0 until 3).map(p =>
      skew.zipWithIndex.collect { case (w, i) if a(i) == p => w }.sum)
    // the 1000-weight bucket dominates a third of the total, so LPT must
    // give it a slice of its own; the remaining 1004 splits near-evenly
    assert(loads.sorted == Seq(502L, 502L, 1000L), s"unbalanced LPT loads: $loads")
    assert(a.toSeq == Dedup.assignBuckets(skew, 3).toSeq, "assignment must be deterministic")
    // uniform weights spread exactly evenly
    val u = Dedup.assignBuckets(Seq.fill(9)(10L), 3)
    assert((0 until 3).forall(p => u.count(_ == p) == 3), "uniform weights must spread evenly")
    // more passes than non-empty buckets: every pass id stays in range
    // (empty passes are legal — slicedPositions gives them a false filter)
    val few = Dedup.assignBuckets(Seq(5L, 0L), 4)
    assert(few.forall(s => s >= 0 && s < 4))
  }

  test("phash AUTO banding: approxRows avoids re-executing a computed input (r17 verdict)") {
    import graft.pipeline.Multimodal
    import spark.implicits._
    // an opaque computed pipeline the optimizer can't see through (the
    // decode-mapPartitions shape): each full evaluation bumps the counter
    // once per partition
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 200)
    val src = Multimodal.withBinaryPayload(docs, "text")
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val opaque = src.mapPartitions { it =>
      PipelineSpec.opaqueEvals.incrementAndGet(); it
    }.toDF("doc_id", "payload")
    val parts = opaque.rdd.getNumPartitions
    val n = docs.count()
    PipelineSpec.opaqueEvals.set(0L)
    val hinted = Multimodal.phashNearDupPairs(opaque, "doc_id", "payload",
      maxHamming = 8, approxRows = n).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evalsHinted = PipelineSpec.opaqueEvals.get()
    PipelineSpec.opaqueEvals.set(0L)
    val counted = Multimodal.phashNearDupPairs(opaque, "doc_id", "payload",
      maxHamming = 8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val evalsCounted = PipelineSpec.opaqueEvals.get()
    assert(hinted == counted, "approxRows changed the result (same decade, same banding)")
    // the no-hint auto path pays EXACTLY one extra full evaluation of the
    // opaque input (its count() fallback); approxRows removes it
    assert(evalsCounted - evalsHinted == parts.toLong,
      s"expected one extra evaluation ($parts partitions) for the count() " +
        s"fallback; hinted=$evalsHinted counted=$evalsCounted")
    // the mechanism the stats path rides on: Catalyst row-count statistics
    // are available for plans with derivable cardinality, so such inputs
    // never pay the count() even without approxRows
    assert(spark.range(70000).queryExecution.optimizedPlan.stats.rowCount
      .contains(BigInt(70000)))
  }

  test("phash banding recall at radius > bands-1: measured floor on corpus truth (r18)") {
    import graft.pipeline.Multimodal
    // The pigeonhole containment (hamming < bands => recalled) is pinned
    // above; this pins MEASURED recall in the probabilistic regime, so the
    // banding trade's recall claim has a floor, not just a guarantee
    // boundary (r17 verdict #2). Ground truth: exact all-pairs hamming on
    // a bounded slice (deterministic corpus + deterministic phash => exact
    // recall values, stable across runs).
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 450)
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val hashed = withBin.select(col("doc_id"),
      Multimodal.perceptualHash(col("payload")).as("ph"))
    val a = hashed.select(col("doc_id").as("id_a"), col("ph").as("ph_a"))
    val b = hashed.select(col("doc_id").as("id_b"), col("ph").as("ph_b"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int").as("h"))
      .filter(col("h") <= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def recalled(bands: Int): Set[(Long, Long)] =
      Multimodal.phashNearDupPairs(withBin, "doc_id", "payload",
        maxHamming = 8, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1, 2, 4).foreach { bands =>
      val got = recalled(bands)
      // containment regime: exact (sanity re-pin)
      val guaranteed = truth.filter(_._3 < bands).map(t => (t._1, t._2)).toSet
      assert(guaranteed.subsetOf(got), s"bands=$bands broke the pigeonhole guarantee")
      // probabilistic regime: per-radius recall above the guarantee.
      // Floors are MEASURED values on this corpus slice minus margin
      // (deterministic corpus + deterministic phash => the exact curve:
      //   bands=2: h=2 0.28, h=3 0.30, h=4 0.08, h>=6 0.00
      //   bands=4: h=4 0.83, h=5 0.68, h=6 0.43, h=7 0.46, h=8 0.36
      // — note bands=2 at h=2 sits BELOW the independent-uniform theory
      // value 0.5: this corpus's phash bit flips tend to SPLIT across the
      // 32-bit halves, the opposite of clustering. This is the honest
      // anchor for the AUTO-banding trade: past ~10^6 rows auto picks
      // 2x32, whose recall above radius 1 is guaranteed by NOTHING and
      // measured here at <=0.3 — callers needing radius-8 recall at
      // corpus scale need a longer hash, which phashBandsFor's scaladoc
      // says in as many words.)
      val floors: Map[(Int, Int), Double] = Map(
        (2, 2) -> 0.15, (2, 3) -> 0.15,
        (4, 4) -> 0.60, (4, 5) -> 0.45, (4, 6) -> 0.25, (4, 7) -> 0.25, (4, 8) -> 0.20)
      (bands to 8).foreach { h =>
        val at = truth.filter(_._3 == h).map(t => (t._1, t._2)).toSet
        if (at.nonEmpty) {
          val recall = got.intersect(at).size.toDouble / at.size
          floors.get((bands, h)).foreach { f =>
            assert(recall >= f,
              f"bands=$bands h=$h: recall $recall%.4f under measured floor $f (n=${at.size})")
          }
          // bands=1 is exact-hash blocking: zero recall above radius 0 is
          // STRUCTURAL (one band, exact match required) — pin the cliff
          if (bands == 1 && h >= 1)
            assert(recall == 0.0, s"bands=1 must recall nothing above radius 0, got $recall at h=$h")
        }
      }
    }
    assert(truth.exists(_._3 >= 2), "recall pin vacuous: no truth pairs above radius 1")
  }

  test("phash128: kernel matches a direct reimplementation; value noise stays within a few bits") {
    val texts = Seq("the quick brown fox jumps over the lazy dog " * 6, "short", "")
    def ref(bytes: Array[Byte]): (Long, Long) = {
      val n = bytes.length
      if (n == 0) (0L, 0L) else {
        val sums = new Array[Long](129)
        bytes.indices.foreach(i => sums(((i.toLong * 129) / n).toInt) += (bytes(i) & 0xff).toLong)
        val out = new Array[Long](2)
        (0 until 128).foreach(b => if (sums(b) > sums(b + 1)) out(b >> 6) |= (1L << (b & 63)))
        (out(0), out(1))
      }
    }
    val got = texts.toDF("t")
      .select(graft.pipeline.Multimodal.perceptualHash128(encode(col("t"), "UTF-8")))
      .collect().map(r => { val a = r.getSeq[Long](0); (a(0), a(1)) })
    assert(got.toSeq == texts.map(t => ref(t.getBytes("UTF-8"))))
    // byte-value noise: bits flip, but bounded. SCATTERED edits flip about
    // the same count as on the 64-bit hash (each edit perturbs ~1 segment
    // at either granularity — measured: median d128 == d64 at 1..16
    // planted edits); this heavy correlated substitution flips more.
    def h128(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = ref(texts.head.getBytes("UTF-8"))
    val noisy = ref(texts.head.replace('o', '0').getBytes("UTF-8"))
    assert(h128(base, noisy) > 0 && h128(base, noisy) <= 32)
  }

  test("phash128 banding: sizing rule, pigeonhole containment, identical payloads pair") {
    import graft.pipeline.Multimodal
    // sizing rule: smallest power-of-two band width >= log2(n), 128 bits
    // to spend — twice the bands of phashBandsFor at every decade
    assert(Multimodal.phashBandsFor128(1000L) == 8)
    assert(Multimodal.phashBandsFor128(65536L) == 8) // log2 = 16 exactly
    assert(Multimodal.phashBandsFor128(65537L) == 4) // past 2^16: 32-bit bands
    assert(Multimodal.phashBandsFor128(1L << 32) == 4)
    assert(Multimodal.phashBandsFor128((1L << 32) + 1) == 2) // 64-bit bands
    // maxHamming trims pointless extra bands (recall guarantee needs only
    // h+1), capped by selectivity
    assert(Multimodal.phashBandsFor128(1000L, maxHamming = 0) == 2)
    assert(Multimodal.phashBandsFor128(1000L, maxHamming = 1) == 2)
    assert(Multimodal.phashBandsFor128(1000L, maxHamming = 3) == 4)
    assert(Multimodal.phashBandsFor128(1000L, maxHamming = 7) == 8)
    assert(Multimodal.phashBandsFor128(1000L, maxHamming = 8) == 8) // no guarantee attainable
    assert(Multimodal.phashBandsFor128(1L << 32, maxHamming = 1) == 2) // recall trims below selectivity
    assert(Multimodal.phashBandsFor128((1L << 32) + 1, maxHamming = 7) == 2) // selectivity caps
    // identical payloads pair at hamming 0 through the pair operator
    val docs = Seq(
      (1L, "a document body that is long enough to segment meaningfully ok"),
      (2L, "a document body that is long enough to segment meaningfully ok"),
      (3L, "completely different content with other words and other sums!!")
    ).toDF("doc_id", "text")
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val pairs = Multimodal.phash128NearDupPairs(withBin, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)), s"identical payloads must pair: ${pairs.toSeq}")
    // pigeonhole containment on corpus truth: every pair at hamming < bands
    // is found by the banded operator, for the 4x32 AND 8x16 bandings
    val corpus = Multimodal.withBinaryPayload(
      Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 450), "text")
    val hashed = corpus.select(col("doc_id"),
      Multimodal.perceptualHash128(col("payload")).as("ph"))
      .select(col("doc_id"),
        element_at(col("ph"), 1).as("w0"), element_at(col("ph"), 2).as("w1"))
    val a = hashed.select(col("doc_id").as("id_a"),
      col("w0").as("a0"), col("w1").as("a1"))
    val b = hashed.select(col("doc_id").as("id_b"),
      col("w0").as("b0"), col("w1").as("b1"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("a0").bitwiseXOR(col("b0"))) +
          bit_count(col("a1").bitwiseXOR(col("b1")))).cast("int").as("h"))
      .filter(col("h") <= 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(truth.nonEmpty, "containment pin vacuous: no 128-bit truth pairs at radius <= 16")
    Seq(4, 8).foreach { bands =>
      val got = Multimodal.phash128NearDupPairs(corpus, "doc_id", "payload",
          maxHamming = 16, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val guaranteed = truth.filter(_._3 < bands).map(t => (t._1, t._2)).toSet
      assert(guaranteed.subsetOf(got), s"bands=$bands broke the pigeonhole guarantee")
    }
    // the 128-bit banding census mirrors the 64-bit one: one row per band,
    // and with no oversized buckets the exact_pairs column counts every
    // intra-bucket candidate the pair join will see
    val stats = Multimodal.phash128BandingStats(corpus, "doc_id", "payload",
      bands = 4).collect()
    assert(stats.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(stats.forall(_.getLong(3) == 0L), "spec corpus must not hit the skew cap")
    assert(stats.map(_.getLong(4)).sum > 0L, "census saw no candidate pairs — vacuous")
  }

  test("phash128 4x32 recalls the planted near-dups that 64-bit 2x32 loses (r18 verdict)") {
    import graft.pipeline.Multimodal
    // The comparison that matters is end-to-end on GENUINE near-duplicates,
    // not on hash-space collisions: on this synthetic corpus, unrelated
    // docs collide at 64-bit hamming 4-8 (same word distribution => the
    // coarse adjacent-segment comparisons correlate structurally across
    // docs), so "64-bit truth at radius 4-8" is mostly noise — while the
    // fine 129-segment hash pushes those same unrelated pairs out to ~50-70
    // bits. Plant REAL near-dups instead: seeded byte-value edits of corpus
    // docs (the noise the hash exists to absorb), then ask each operator —
    // at its corpus-scale banding and default radius — whether it pairs
    // each original with its perturbed copy.
    val base = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 400 && length(col("text")) >= 100)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rng = new java.util.Random(20260817L)
    val edits = 8
    val planted = base.map { case (id, text) =>
      val c = text.getBytes("UTF-8")
      (0 until edits).foreach { _ =>
        c(rng.nextInt(c.length)) = (32 + rng.nextInt(95)).toByte
      }
      (id + 100000L, new String(c, "UTF-8"))
    }
    val all = (base ++ planted).toSeq.toDF("doc_id", "text")
    val withBin = Multimodal.withBinaryPayload(all, "text")
    val wanted = base.map { case (id, _) => (id, id + 100000L) }.toSet
    val got64 = Multimodal.phashNearDupPairs(withBin, "doc_id", "payload",
        maxHamming = 8, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got128 = Multimodal.phash128NearDupPairs(withBin, "doc_id", "payload",
        maxHamming = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r64 = wanted.count(got64.contains).toDouble / wanted.size
    val r128 = wanted.count(got128.contains).toDouble / wanted.size
    // measured (seed 20260817, 8 edits): 2x32 ~0.62, 4x32 ~0.98 — the gap
    // is the point, floors leave margin for corpus-slice variation
    assert(r128 > r64,
      f"128-bit 4x32 recall $r128%.4f must beat 64-bit 2x32 $r64%.4f on planted near-dups")
    assert(r128 >= 0.9, f"128-bit 4x32 recall $r128%.4f under 0.9 floor")
    assert(r64 <= 0.85, f"64-bit 2x32 recall $r64%.4f unexpectedly high — pin stale?")
  }
}

object PipelineSpec {
  /** Evaluation counter for the opaque-input pin above (incremented once
    * per partition per full evaluation of the mapPartitions input). */
  val opaqueEvals = new java.util.concurrent.atomic.AtomicLong(0L)
}
