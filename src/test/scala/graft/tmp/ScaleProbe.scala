package graft.tmp

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway dev probe: do the hot operators hold at ~200x the sf0.1 row
  * count on this machine? Synthesizes 20M events / 1M documents in memory
  * (probe-only data — the oracle gate always runs on the provided
  * testdata) and times the operators whose scale behavior matters most.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 64).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val nEvents = 20000000L
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id")), lit(200000)).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + (col("id") % 7776000L) * 1000000L).as("ts"),
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("signup"), lit("error")),
        (pmod(col("id"), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id") + 7), lit(100000)) / lit(100.0)).as("value"))
      .localCheckpoint() // materialize once so every probe reads the same input

    time("baseline_count") { events.count() }

    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = events.filter(col("event_type") === "click")
    time("asof_native_4M_x_4M") {
      graft.plans.AsOfJoinNative.asOf(purchases, clicks, "user_id", "ts", "ts",
        "event_id", Seq("value")).count()
    }
    time("sessionize_20M") {
      graft.operators.Sessionize.sessionCounts(events, "user_id", col("ts"),
        col("event_id"), 1800L).count()
    }
    time("snapshot_latest_20M") {
      graft.operators.Snapshots.latest(events, Seq(col("user_id")), col("ts"),
        col("event_id")).count()
    }
    time("ws_correct_step_20M") {
      val st = events.select(col("event_id"), col("event_type").as("dataset"),
        when(col("event_id") % 5 === 2, lit("click")).as("proposed"),
        when(col("event_id") % 3 === 1, array(lit("click")))
          .otherwise(array().cast("array<string>")).as("previous"))
      graft.operators.WsCorrection.correctStep(st, col("dataset"), col("previous"), col("proposed"))
        .groupBy(col("new_dataset"), col("sync_event")).count().count()
    }

    // the composed engagement run: one 20M-row scan, 6-way explode into a
    // low-cardinality agg; deny lists ~10-20k keys (broadcast regime)
    val evProps = events.withColumn("props",
      concat(lit("{\"k\": "), pmod(xxhash64(col("event_id") + 13), lit(120)), lit("}")))
    val kCol = nullif(regexp_extract(col("props"), "[0-9]+", 0), lit("")).cast("int")
    time("engagement_pipeline_20M") {
      val testDeny = evProps.filter(col("event_type") === "error" && col("value") > 998.0)
        .select(col("user_id"))
      val withdrawn = evProps.filter(col("event_type") === "error" && col("value") > 995.0)
        .select(col("user_id"))
      graft.analysis.EngagementPipeline.funnel(evProps, "user_id", col("event_type"),
        col("ts"), "2024-01-08 00:00:00", "2024-03-01 00:00:00",
        testDeny, withdrawn, c => c.cast("int") >= 100, "ws_", kCol).count()
    }
    time("configured_view_20M") {
      import graft.config._
      val cfg = PipelineConfig(
        datasets = Seq(
          AnalysisDatasetConfig(Seq("purchase", "view"), DatasetType.ResearchQuestionAnswer, "activity_raw"),
          AnalysisDatasetConfig(Seq("click"), DatasetType.ResearchQuestionAnswer, "click_raw"),
          AnalysisDatasetConfig(Seq("signup"), DatasetType.Demographic, "age_raw",
            Seq(CodingConfig("age_category", Some(AgeCategoryConfig("age_raw",
              Seq((0, 17, "child"), (18, 64, "adult"), (65, 120, "elder")))))))),
        projectStart = Some("2024-01-08 00:00:00"), projectEnd = Some("2024-03-01 00:00:00"))
      val noTest = evProps.filter(col("event_type") === "error" && col("value") > 998.0)
        .select(col("user_id"))
      ConfiguredPipeline.run(evProps, cfg, "user_id", col("event_type"), col("ts"),
        col("event_id"), col("props"), kCol, noTest).count()
    }

    time("range_join_hot_intervals_20M") {
      graft.operators.RangeJoin.hotIntervalStats(events, col("ts"), col("user_id")).count()
    }
    time("ols_imputed_20M") {
      graft.analysis.Regression.olsImputedByGroup(events, Seq(col("event_type")),
        when(col("event_id") % 5 === 0, lit(null).cast("double")).otherwise(col("value")),
        col("value")).count()
    }

    // 1M docs, ~40 words each, with planted near-dups (every 100th doc is a
    // 1-word variant of its predecessor)
    val words = (0 until 500).map(i => s"w$i")
    val docs = spark.range(1000000L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(j =>
        element_at(array(words.map(lit): _*),
          (pmod(xxhash64(col("id") / 100 * 100 + lit(j * 7)), lit(500)) + 1).cast("int"))) :+
        when(col("id") % 100 === 99, concat(lit("uniq"), col("id"))).otherwise(lit("common")): _*)
        .as("text"))
      .localCheckpoint()

    time("docs_count") { docs.count() }
    time("minhash_sigs_1M") {
      graft.dedup.Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16).count()
    }
    time("simhash64_1M") {
      graft.dedup.Dedup.simhash64(docs, col("doc_id"), col("text")).count()
    }
    time("token_count_1M") {
      docs.select(graft.functions.TokenCount.tokenCount(col("text")).as("n"))
        .agg(sum(col("n"))).count()
    }

    // round-3 curation operators at 1M docs
    val C = graft.curation.Curation
    time("decontaminate_1M_vs_10k") {
      C.decontaminate(docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        col("doc_id"), col("text"), 3).count()
    }
    time("line_dedup_1M") {
      C.lineDedup(docs, col("doc_id"), C.wordLines(col("text"), 8)).count()
    }
    time("seq_packing_1M") {
      C.packStats(docs, col("doc_id"),
        graft.functions.TokenCount.tokenCount(col("text")),
        C.hashShard(col("doc_id"), 256), 2048).count()
    }
    time("mixture_1M") {
      C.mixtureStats(docs, col("doc_id"),
        concat(lit("src"), pmod(col("doc_id"), lit(20))), Map("src0" -> 50)).count()
    }
    time("curation_funnel_1M_boilerplate") {
      // skew probe for the digest-keyed first-keeper join: every 3rd doc is
      // the SAME quality-passing text — one md5 key carries 333k probe rows
      val boiler = (1 to 20).map(i => s"the w$i x$i y$i z$i").mkString(" ")
      val bdocs = docs.withColumn("text",
        when(col("doc_id") % 3 === 0, lit(boiler)).otherwise(col("text")))
      C.curationFunnel(bdocs, col("doc_id"), col("text"),
        concat(lit("src"), pmod(col("doc_id"), lit(20))), Map("src0" -> 50)).count()
    }
    time("vocab_encode_1M") {
      val v = graft.text.Vocab.build(docs, col("text"), 600)
      graft.text.Vocab.encode(docs, col("doc_id"), col("text"), v)
        .agg(sum(col("token_id"))).count()
    }
    time("lm_bigram_score_1M") {
      graft.text.LangModel.bigramScore(docs, col("doc_id"), col("text"))
        .agg(sum(col("n_bigrams"))).count()
    }
    time("pii_redact_1M") {
      docs.select(graft.text.Redact.piiColumns(col("text")): _*)
        .agg(sum(col("n_emails"))).count()
    }

    // incremental ingest path at 1M-doc archive: band keys for the archive
    // computed once, 10k-doc batch joins + verifies against them. Candidate
    // volume is the cost driver (99 planted archive twins per batch doc ->
    // ~1M verified pairs, the worst realistic case)
    time("incremental_dedup_1M_vs_10k") {
      val newB = docs.filter(col("doc_id") % 100 === 99)
      val idx = docs.filter(col("doc_id") % 100 =!= 99)
      graft.dedup.Dedup.incrementalDedupVerified(newB, idx,
        col("doc_id"), col("text"), 3, 16, 4, 0.5).count()
    }
    // span-leakage matrix at 1M docs x 20 sources: ~5M exploded spans,
    // distinct-ed to (hash, source) before the bounded self-join
    time("cross_source_leakage_1M") {
      C.crossSourceLeakage(docs, col("text"),
        concat(lit("src"), pmod(col("doc_id"), lit(20))), 16, 8).count()
    }
    // containment at 1M docs: the shared-shingle pair join with the hot-
    // shingle cap (the cap is the scale lever — the probe corpus's block
    // structure makes every block's shingles shared by ~100 docs)
    time("containment_1M_capped") {
      graft.dedup.Dedup.ngramContainment(docs, col("doc_id"), col("text"), 3,
        col("doc_id") % 1000 === 0, 0.5, maxShingleFreq = 150L).count()
    }

    // 200k embeddings in 256 clusters (40x sf0.1): the semdedup pair stage
    // is ~n²/k dots per cluster — the probe pins the constant so the
    // centroid-count-grows-with-corpus rule in the docs stays honest
    val vecs = spark.range(200000L).select(
      col("id"),
      transform(sequence(lit(0), lit(31)),
        j => (pmod(xxhash64(col("id") * 37 + j), lit(1000)) / lit(500.0) - 1.0)).as("vec"))
      .localCheckpoint()
    time("semdedup_200k_256c") {
      graft.similarity.Knn.semDedup(vecs, vecs.filter(col("id") < 256), 0.95).count()
    }
    // the learned-quantizer path: Lloyd-trained centroids instead of the
    // fixed low-id seed set (what a 100 TB deployment runs, k ~ n/1000)
    time("semdedup_200k_trained256") {
      val cent = graft.similarity.Knn.kmeansCentroids(vecs, 256, 2)
      graft.similarity.Knn.semDedup(vecs, cent, 0.95).count()
    }
    // bloom screening vs exact broadcast at a 100k-doc benchmark: the
    // filter ships ~2 MB instead of ~100 MB of shingle strings
    time("decontaminate_bloom_1M_vs_100k") {
      C.decontaminateBloom(docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        col("doc_id"), col("text"), 3, 4000000L, 1L << 24).count()
    }

    // late round-4 training-prep batch at 1M docs / 200k vectors
    time("contamination_score_1M_vs_10k") {
      C.contaminationScore(docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0), col("doc_id"), col("text"), 3).count()
    }
    time("shuffle_order_1M") {
      C.shuffleOrder(docs, col("doc_id"), "epoch0", 64).count()
    }
    // BPE: train on ~10k word types (the planted uniq words), then the
    // memoized encode — per-task cache should make encode ~word-type bound
    val bpeMerges = {
      val t0 = System.nanoTime()
      val m = graft.text.Bpe.train(docs, col("text"), 200, 100000)
      println(f"SCALE bpe_train_1M_200merges ${(System.nanoTime() - t0) / 1e9}%.2f s (${m.size} merges)")
      m
    }
    time("bpe_encode_stats_1M") {
      graft.text.Bpe.encodeStats(docs, col("doc_id"), col("text"), bpeMerges).count()
    }
    time("training_pipeline_1M") {
      // the composed pretraining-curation run end-to-end. A stopword tail
      // lets the word-soup corpus PASS the quality stage (otherwise every
      // doc dies at no_stopwords and the later passes idle); the sparse
      // benchmark (1 doc per 100 near-dup groups) contaminates ~1% of the
      // corpus, so dedup/decontamination/mixture all do real work
      // the unique u<id> token sits in EVERY tail trigram window (incl.
      // the junction with the original text), so the tail adds stopword
      // mass without creating a single cross-doc trigram — contamination
      // then comes only from the planted near-dup groups (~1%)
      val tailed = docs.withColumn("text",
        concat(col("text"), lit(" u"), col("doc_id"), lit(" the of u"),
          col("doc_id"), lit(" and to u"), col("doc_id"), lit(" in is")))
        .withColumn("lang", lit("en"))
      graft.curation.Curation.trainingPipeline(
        tailed.filter(col("doc_id") % 100 =!= 0),
        tailed.filter(col("doc_id") % 10000 === 0),
        col("doc_id"), col("text"), col("lang"), col("lang"),
        Map("en" -> 80)).count()
    }
    time("dim_stats_200k_x_32") {
      graft.similarity.Knn.dimStats(vecs.select(col("vec").as("embedding")),
        col("embedding")).count()
    }
    spark.stop()
  }
}
