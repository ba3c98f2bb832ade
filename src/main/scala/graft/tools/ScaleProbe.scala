package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{CorpusFilters, Dedup, Similarity, TextAnalysis}

/** Scale probe beyond the driver's sf0.1: synthesizes a corpus N× larger than
  * the bench documents table (plus planted near-duplicates) and times the
  * dedup/similarity/text paths. Results are recorded in PLANS.md. Run:
  *   sbt "runMain graft.tools.ScaleProbe 2000000"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic docs: 15 tokens from a 64-word vocab, deterministic per doc_id
    val vocab = (0 until 64).map(i => s"w$i")
    val docs = spark.range(n).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        (0 until 15).map(j =>
          element_at(typedLit(vocab),
            (pmod(xxhash64(col("doc_id"), lit(j)), lit(64)) + 1).cast("int"))): _*))
    docs.cache().count()

    // shuffle-write accounting per timed block (A/B evidence for the
    // hash-narrowed exchanges; listener events are async → short settle)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // PROBE_ONLY=<substring> runs just the matching blocks (re-probing one
    // operator family without paying the full sweep)
    val only = sys.env.get("PROBE_ONLY")
    def time(name: String)(f: => Long): Option[Long] = if (only.forall(name.contains)) {
      Thread.sleep(300)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val mb = (shuffleBytes.get() - b0) / 1e6
      println(f"[probe] $name%-24s $secs%8.1f s   shuffle=$mb%9.1f MB   result=$r")
      Some(r)
    } else None

    time(s"exact dedup ($n docs)") {
      Dedup.exactGroups(docs, "doc_id", "text").filter(col("group_size") > 1).count()
    }
    // round-7: daily-ingest incremental dedup — bloom vs bucketed-digest
    // path on the same inputs. New batch = n/10 rows straddling the history
    // boundary (half duplicate by construction, half genuinely new).
    val batchIds = spark.range(n - n / 20, n + n / 20).toDF("doc_id")
    val newBatch = batchIds.withColumn("text", concat_ws(" ",
      (0 until 15).map(j =>
        element_at(typedLit(vocab),
          (pmod(xxhash64(col("doc_id"), lit(j)), lit(64)) + 1).cast("int"))): _*))
    time("incdedup bloom") {
      Dedup.incrementalDedup(newBatch, docs, "doc_id", "text", expectedItems = n)
        .filter(col("is_duplicate")).count()
    }
    time("incdedup digest build") {
      Dedup.materializeHistoryDigests(docs, "text", "probe_digests", buckets = 16); n
    }
    time("incdedup bucketed") {
      Dedup.incrementalDedupBucketed(newBatch, "probe_digests", "doc_id", "text")
        .filter(col("is_duplicate")).count()
    }

    time("simhash groups") {
      docs.select(Dedup.simhash(col("text")).as("h")).groupBy("h").count()
        .filter(col("count") > 1).count()
    }
    time("minhash signatures") {
      // aggregate over the signature so Catalyst can't prune the computation
      docs.select(Dedup.minhashSignature(col("text")).as("sig"))
        .agg(sum(pmod(element_at(col("sig"), 1), lit(1000)))).head(); n
    }
    time("quality features") {
      TextAnalysis.qualityFeatures(docs, "doc_id", "text")
        .agg(sum(col("n_tokens"))).head().getLong(0)
    }

    time("repetition stats") {
      CorpusFilters.repetitionStats(docs, "doc_id", "text")
        .agg(sum(col("n_words"))).head().getLong(0)
    }
    time("quality gate") {
      CorpusFilters.qualityGate(docs, "doc_id", "text")
        .filter(col("keep")).count()
    }
    time("boilerplate 5-grams") {
      CorpusFilters.boilerplateNgrams(docs, "doc_id", "text", n = 5, minDocs = 2)
        .count()
    }
    time("boilerplate hashed") {
      CorpusFilters.boilerplateNgramsHashed(docs, "doc_id", "text", n = 5, minDocs = 2)
        .count()
    }
    time("decontaminate (1% eval)") {
      CorpusFilters.decontaminate(
        docs.filter(col("doc_id") % 100 =!= 0), docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", n = 8).filter(col("contaminated")).count()
    }
    time("tf-idf top terms") {
      CorpusFilters.tfidfTopTerms(docs, "doc_id", "text", k = 3).count()
    }
    time("unigram LM scoring") {
      CorpusFilters.unigramLogProb(docs, "doc_id", "text")
        .agg(sum(col("n_tokens"))).head().getLong(0)
    }
    time("pii scrub") {
      TextAnalysis.piiScrub(docs, "doc_id", "text")
        .agg(sum(col("n_emails") + col("n_ips") + col("n_phones"))).head(); n
    }
    time("url stats") {
      TextAnalysis.urlStats(docs, "doc_id", "text", Seq(".tracker.net"))
        .agg(sum(col("n_urls"))).head(); n
    }
    time("split assign") {
      TextAnalysis.splitAssign(docs, "text")
        .groupBy(col("split")).count().collect(); n
    }
    time("chunk docs (32/8)") {
      graft.pipeline.Sampling.chunkDocs(docs, "doc_id", "text", 32, 8).count()
    }
    time("mix + pack") {
      graft.pipeline.Sampling.packSequences(
        graft.pipeline.Sampling.mixSources(docs.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(4)))), "doc_id", "source",
          Map("src0" -> 1000, "src1" -> 500), defaultRate = 100),
        "doc_id", "source", "text").count()
    }

    time("duplicated spans (k=20)") {
      Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", k = 20)
        .agg(sum(col("dup_chars"))).head().getLong(0)
    }
    time("cut duplicated spans") {
      Dedup.cutDuplicatedSpans(docs, "doc_id", "text", k = 20, useKernel = true)
        .agg(sum(col("removed_chars"))).head().getLong(0)
    }
    time("strip boilerplate lines") {
      // derive "lines" by splitting on a frequent vocab word — same shape
      // as newline splitting on a real corpus
      CorpusFilters.stripBoilerplateLines(
        docs.withColumn("text", regexp_replace(col("text"), " w0 ", "\n")),
        "doc_id", "text", minDocs = 2)
        .agg(sum(col("n_removed"))).head().getLong(0)
    }
    // clustering fallback at scale: the distributed label-propagation
    // branch of duplicateGroups, forced on a ≥2M-edge graph (stars of 4
    // chained pairwise — diameter ~4, the shape LSH near-dup output has).
    // Parity vs the driver union-find on the SAME edges is the correctness
    // pin; wall time and round count land in PLANS.md.
    // EDGE_DOCS scales the clustering graph independently of the corpus
    // size n (the 20M-edge probe should not pay a 23M-doc synthesis first);
    // edges ≈ 0.875 × edgeDocs, so EDGE_DOCS=22857144 → 20,000,001 edges.
    val edgeDocs = sys.env.get("EDGE_DOCS").map(_.toLong)
      .getOrElse(math.max(n, 2700000L)) // ≥2M edges after the 3-in-4 filter
    val star = spark.range(edgeDocs).toDF("id")
      .filter(col("id") % 4 =!= 0)
      .select((col("id") - (col("id") % 4)).as("id_a"), col("id").as("id_b"))
    val chain = spark.range(edgeDocs / 8).toDF("i")
      .select((col("i") * 8).as("id_a"), (col("i") * 8 + 4).as("id_b"))
    val bigPairs = star.union(chain)
    val propagated = time(s"cluster propagate (${edgeDocs / 4 * 3 + edgeDocs / 8} edges)") {
      val (labels, rounds) = CorpusFilters.duplicateGroupsDistributed(bigPairs, maxIters = 20)
      val nClusters = labels.select(col("cluster_id")).distinct().count()
      println(s"[probe] cluster propagate rounds=$rounds clusters=$nClusters")
      nClusters
    }
    // Parity pin: driver union-find on the same edges below ~8M edges; at
    // the 20M+ probe (CLUSTER_ANALYTIC=1) collecting 2×20M edge rows to
    // the driver is the thing the distributed branch exists to avoid, so
    // the pin switches to the synthetic graph's ANALYTIC component count —
    // stars of 4 pairwise-chained merge to exactly edgeDocs/8 components
    // (requires 8 | edgeDocs; r8 confirmed 337,500 = 2.7M/8 against
    // union-find). Wrong merges or early convergence still break it.
    if (sys.env.contains("CLUSTER_ANALYTIC")) {
      require(edgeDocs % 8 == 0, "analytic pin needs 8 | edgeDocs")
      for (p <- propagated) require(p == edgeDocs / 8,
        s"clustering analytic pin broken: propagate=$p expected=${edgeDocs / 8}")
    } else {
      val unionFound = time("cluster union-find (same edges)") {
        // driverLimit raised so the driver path takes the same input
        CorpusFilters.duplicateGroups(bigPairs, driverLimit = Long.MaxValue)
          .select(col("cluster_id")).distinct().count()
      }
      // enforced — a probe that only prints two numbers records a broken
      // branch (non-convergence in maxIters, a wrong merge) as "verified";
      // member-level equality is pinned in PipelineSpec at spec scale
      // (skipped only when PROBE_ONLY excluded one of the two blocks)
      for (p <- propagated; u <- unionFound) require(p == u,
        s"clustering parity broken at scale: propagate=$p unionFind=$u")
    }

    time("phash near-dup pairs") {
      graft.pipeline.Multimodal.phashNearDupPairs(
        docs.withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", maxHamming = 4, maxBucket = 2000).count()
    }
    time("global shuffle order") {
      // noop sink so the range-partitioned total sort actually runs
      // (an agg or limit on top would let Catalyst drop or top-k the sort)
      graft.pipeline.Sampling.shuffleOrder(docs, "doc_id", seed = 7L)
        .write.format("noop").mode("overwrite").save(); n
    }
    time("rank quantiles") {
      graft.pipeline.Sampling.rankQuantiles(
        docs.withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(16))))
          .withColumn("n_chars", length(col("text"))),
        "source", "n_chars", "doc_id").count()
    }

    // CEP at scale: n events over 10k keys, A+ B runs (value derived from a
    // hash so runs are irregular); one shuffle + per-key linear matcher
    val events = spark.range(n).toDF("event_id")
      .withColumn("user_id", pmod(xxhash64(col("event_id")), lit(10000)))
      .withColumn("value", pmod(xxhash64(col("event_id"), lit(1)), lit(200)).cast("double"))
    events.cache().count()
    time(s"match_recognize ($n events)") {
      graft.operators.MatchRecognize.matchRecognize(
        events, Seq("user_id"), "event_id",
        defines = Seq("A" -> (col("value") < 100), "B" -> (col("value") >= 100)),
        pattern = graft.operators.MatchRecognize.parsePattern("A+ B"),
        measures = Seq(graft.operators.MatchRecognize.Measure("n_low", "count", "A", "*")))
        .count()
    }
    // as-of join at scale: n left rows against n/10 right versions
    time(s"as-of join ($n x ${n / 10})") {
      val left = events.select(col("user_id"), col("event_id"), col("event_id").as("lts"))
      val right = events.filter(pmod(col("event_id"), lit(10)) === 0)
        .select(col("user_id"), col("event_id").as("rts"), col("value").as("payload"))
      graft.operators.AsOfJoin.leftAsOf(left, right, "user_id", "lts", "rts", Seq("payload"))
        .count()
    }

    // round-9: IVF assignment at volume — the projection shape must show
    // ~zero shuffle regardless of corpus size (synthetic 64-dim embeddings).
    // round-10: sweep C — at 100 TB, C is O(√N) (thousands), and the argmax
    // kernel must stay ONE constant-size codegen expression with per-row
    // cost linear in C (the struct-greatest shape it replaced grew the
    // generated method — and its janino compile time — with C).
    val vecs = spark.range(n).toDF("vec_id")
      .withColumn("embedding", array((0 until 64).map(d =>
        (pmod(xxhash64(col("vec_id"), lit(d)), lit(1000)) / 500.0 - 1.0)): _*))
    for (c <- Seq(16, 256, 1024)) {
      val name = s"ivf assign C=$c ($n vecs)"
      // training runs outside time() (build cost is not the probed
      // assignment cost) but must still honor PROBE_ONLY — at C=1024 the
      // sample job + driver Lloyd's are tens of seconds
      if (only.forall(name.contains)) {
        val centroids = graft.pipeline.Similarity.kmeansCentroids(
          vecs, "vec_id", "embedding", nCentroids = c)
        time(name) {
          graft.pipeline.Similarity.ivfAssign(vecs, "vec_id", "embedding", centroids)
            .select(col("centroid_id")).groupBy("centroid_id").count().count()
        }
      }
    }

    // round-9: replication-below-aggregation A/B at volume — CUMULATE
    // (explode factor 4) and HOP (expand factor 3), row-expansion vs
    // two-phase on identical inputs. The shuffle columns tell the story:
    // row expansion shuffles the replicated input, two-phase shuffles
    // post-aggregation groups.
    import graft.operators.Windows
    val tsEvents = events
      .withColumn("ts", timestamp_seconds(col("event_id") % 864000L).cast("timestamp_ntz"))
      .withColumn("event_type", concat(lit("t"), pmod(col("event_id"), lit(5))))
    tsEvents.cache().count()
    val cumAggs = Seq(Windows.CumAgg.count("cnt"), Windows.CumAgg.dsum("value", "sv"))
    time(s"cumulate row-expansion ($n)") {
      Windows.cumulate(tsEvents, "ts", 900, 3600)
        .groupBy(col("window_start"), col("window_end"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          expr("cast(sum(cast(value as decimal(18,4))) as double)").as("sv")).count()
    }
    time(s"cumulate two-phase ($n)") {
      Windows.cumulativeAgg(tsEvents, "ts", 900, 3600, Seq("event_type"), cumAggs).count()
    }
    time(s"hop native expand ($n)") {
      Windows.hop(tsEvents, "ts", "5 minutes", "15 minutes")
        .groupBy(col("window_start"), col("window_end"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          expr("cast(sum(cast(value as decimal(18,4))) as double)").as("sv")).count()
    }
    time(s"hop panes ($n)") {
      Windows.hopAggregate(tsEvents, "ts", 300, 900, Seq("event_type"), cumAggs).count()
    }
    spark.stop()
  }
}
