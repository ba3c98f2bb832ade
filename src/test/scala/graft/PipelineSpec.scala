package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHashes
import graft.functions.RollingHashes.rolling_hashes
import graft.pipeline.{Dedup, Similarity}

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
}
