package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior: every operator must return empty results —
  * not crash, not hang — on an empty corpus (the first run of a pipeline
  * always sees one).
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A testdata-shaped directory whose documents/events/orders are empty. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    def writeEmpty(name: String): Unit = {
      val schema = graft.sources.Tables.load(spark, TestSpark.sf, name).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    Seq("documents", "orders", "customer", "nation", "embeddings").foreach(writeEmpty)
    // events needs the raw long-nanos ts column the reader rebuilds from
    val evSchema = org.apache.spark.sql.types.StructType(
      graft.sources.Tables.events(spark, TestSpark.sf).schema.map {
        case f if f.name == "ts" =>
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType)
        case f => f
      })
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("dedup family returns empty on an empty corpus") {
    assert(graft.operators.Dedup.exactDedupGroups(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.ngramJaccardPairs(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.minhashLshPairs(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.nearDupClusters(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.dedupedCorpus(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.simhashSignatures(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.simhashNearDupPairs(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.decontaminate(spark, emptyDir).count() == 0)
  }

  test("text analysis returns empty on an empty corpus") {
    assert(graft.operators.TextAnalysis.textStats(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.tfidfTopTerms(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.repetitionStats(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.tokenFrequencies(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.chunkDocuments(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.sequencePackingPlan(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.sourceCap(spark, emptyDir).count() == 0)
  }

  test("event operators return empty on an empty stream history") {
    assert(graft.streaming.Events.windowedCounts(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.sessionize(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.purchasesWithRecentClicks(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.clickToPurchaseFunnel(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.asofSignup(spark, emptyDir).count() == 0)
  }

  test("round-3 operators behave on an empty corpus") {
    assert(graft.operators.Dedup.dupNgramFraction(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.incrementalDedup(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.embeddingNearDupPairs(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.mixtureSample(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.lengthCurriculumBuckets(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annBruteForceTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annMultiIndexTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annLshTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annIvfTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.quantizeInt8(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.eventTransitionMatrix(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.windowTopTypes(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.typedFormatMoments(spark, emptyDir).count() == 0)
    // the expectations REPORT is the exception: an empty batch trivially
    // satisfies every check — 4 rows, all passed (never a crash/NPE)
    val checks = graft.operators.Extended.dataExpectations(spark, emptyDir).collect()
    assert(checks.length == 4 && checks.forall(_.getBoolean(2)))
  }

  test("round-5 operators behave on an empty corpus") {
    assert(graft.operators.Dedup.sourceOverlapMatrix(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.trainTestSplitLeakage(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.incrementalEmbeddingDedup(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.semanticDedup(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.ngramLmPerplexity(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.tokenEntropy(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.passageDedup(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annTwoStageTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annPqTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annLshRerankTopK(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.perceptualHashes(spark, emptyDir).count() == 0)
    // the two corpus-level REPORTS are the global-aggregate exception
    // (one row, zero counts, null-safe statistics — never a crash):
    val zipf = graft.operators.TextAnalysis.zipfFit(spark, emptyDir).collect()
    assert(zipf.length == 1 && zipf(0).getLong(0) == 0L, "zipf: 1 row, empty vocab")
    val growth = graft.operators.TextAnalysis.vocabGrowth(spark, emptyDir).collect()
    assert(growth.length == 10 && growth.forall(_.getLong(2) == 0L),
      "vocab growth: all-decile curve at zero")
  }

  test("round-6 operators behave on an empty corpus") {
    assert(graft.operators.Dedup.containmentPairs(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.dedupAudit(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.qualitySurvivors(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.gopherRules(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.dsirWeights(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.ccnetPerplexityCut(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annDiversifiedTopK(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.mediaDedupClusters(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.heavyHitters(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annRadiusSearch(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.cohortRetention(spark, emptyDir).count() == 0)
  }

  test("round-7 operators behave on an empty corpus") {
    assert(graft.operators.Dedup.normalizedDedupGroups(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.readability(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.charClassProfile(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.sourceKlDivergence(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.annFilteredTopK(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.kmeansStep(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.audioEnergyProfile(spark, emptyDir).count() == 0)
  }

  test("batch-10 operators behave on an empty corpus") {
    assert(graft.operators.Dedup.longestSharedSpan(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.eventDedup(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.ewmaSpend(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.tokenBurstiness(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.keyframes(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.clusterCohesion(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.hourlyAnomaly(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.silenceTrim(spark, emptyDir).count() == 0)
  }

  test("batch-12 operators behave on an empty corpus") {
    assert(graft.operators.TextAnalysis.temperatureMixture(spark, emptyDir).count() == 0)
    assert(graft.operators.TextAnalysis.coverageCurve(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.labelSilhouette(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.spendDeciles(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.maxConcurrency(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.enrichedWindowCounts(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.audioClipping(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.indexQualityReport(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.bounceRate(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.byteEntropyProfile(spark, emptyDir).count() == 0)
    // d23 is a one-row global report — zeros, never a crash
    val eff = graft.operators.Dedup.effectiveTokens(spark, emptyDir).collect()
    assert(eff.length == 1 && eff(0).getLong(0) == 0L && eff(0).getLong(2) == 0L)
  }

  test("batch-15 operators behave on an empty corpus") {
    assert(graft.multimodal.Multimodal.pixelFrameStats(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.shotBoundaries(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.funnel(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.disorderAudit(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.attributedPairs(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.attributionOuter(spark, emptyDir).count() == 0)
    // d24/s14 are grid REPORTS (the d23 precedent): one row per grid
    // value, all zero, never a crash and never a NaN
    val sweep = graft.operators.Dedup.thresholdSweep(spark, emptyDir).collect()
    assert(sweep.length == graft.operators.Dedup.ThresholdSweep.length)
    sweep.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    }
    val curve = graft.operators.Similarity.recallCurve(spark, emptyDir).collect()
    assert(curve.length == graft.operators.Similarity.RecallKs.length)
    curve.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    }
  }

  test("batch-16 operators behave on an empty corpus") {
    // t33 is a grid report (the d24/s14 contract): one row per grid
    // value, all zero, never a NaN
    val sweep = graft.operators.TextAnalysis.qualityThresholdSweep(spark, emptyDir).collect()
    assert(sweep.length == graft.operators.TextAnalysis.QualitySweep.length)
    sweep.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    }
    assert(graft.operators.Dedup.clusterSizeDistribution(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.scd2Intervals(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.audioLevelCrossings(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.lastObservationCarriedForward(spark, emptyDir).count() == 0)
    assert(graft.streaming.Events.funnelStagesStateful(spark, emptyDir).count() == 0)
    assert(graft.operators.Similarity.quantizationImpact(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.errorContext(spark, emptyDir).count() == 0)
    assert(graft.operators.Dedup.incrementalContainmentDedup(spark, emptyDir).count() == 0)
    // the r10 auto-width registered forms: empty corpus derives extra = 0
    // and lands on the base pipeline
    assert(graft.operators.Dedup.simhashNearDupPairsAuto(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.mediaDedupClustersAuto(spark, emptyDir).count() == 0)
    // d28: an empty corpus persists empty index tables and the probe
    // finds nothing — never an error
    assert(graft.operators.Dedup.incrementalContainmentIndexed(spark, emptyDir).count() == 0)
    // the live audit floors on an empty index too — a monitoring loop
    // over a not-yet-populated index reads (0,0,0,1.0,0)
    graft.operators.Dedup.persistContainmentIndex(spark, emptyDir,
      prefix = "empty_audit_idx")
    val emptyAudit = graft.operators.Dedup
      .containmentIndexDriftAudit(spark, 0.8, "empty_audit_idx").collect()(0)
    assert((emptyAudit.getAs[Long]("frozen_candidate_rows"),
      emptyAudit.getAs[Long]("fresh_candidate_rows"),
      emptyAudit.getAs[Double]("drift_ratio"),
      emptyAudit.getAs[Long]("rebuild_recommended")) == ((0L, 0L, 1.0, 0L)),
      s"empty live audit: $emptyAudit")
    assert(graft.operators.Dedup.bandOccupancyAudit(spark, emptyDir).count() == 0)
    // t34 is a funnel report: always 8 stage rows, all-zero on an empty
    // corpus (the global aggregate emits one row of zeros; stack unpivots)
    val funnel = graft.operators.Curation.curationFunnel(spark, emptyDir).collect()
    assert(funnel.length == 8 &&
      funnel.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L),
      s"empty funnel: ${funnel.mkString(";")}")
    // t35 is a grid report: one row per budget fraction, all zero
    val curve = graft.operators.TextAnalysis.tokenBudgetCurve(spark, emptyDir).collect()
    assert(curve.length == graft.operators.TextAnalysis.TokenBudgetGrid.length &&
      curve.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getLong(3) == 0L && r.getDouble(4) == 0.0),
      s"empty budget curve: ${curve.mkString(";")}")
    assert(graft.multimodal.Multimodal.gradientHashes(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal
      .mediaBandOccupancyAudit(spark, emptyDir).count() == 0)
    assert(graft.multimodal.Multimodal.curvatureHashes(spark, emptyDir).count() == 0)
    // d26 is a config report: each parameter lands on its documented
    // floor for an empty corpus, never an error
    val cfg = graft.operators.Dedup.autoConfigReport(spark, emptyDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(cfg == Map("d5_emb_band_bits" -> 3L, "s2_lsh_bucket_bits" -> 8L,
      "s3_ivf_sub_bits" -> 0L, "d9_simhash_extra_band_bits" -> 0L,
      "m6_phash_extra_band_bits" -> 0L,
      "st_watermark_delay_us" -> 1L,
      "st_shuffle_partitions" -> 1L,
      "st9_funnel_partitions" -> 1L), s"floors: $cfg")
    // d30 is a report too: zero volumes, ratio 1.0, no rebuild on an
    // empty corpus — a policy row, never an error
    val drift = graft.operators.Dedup.indexOrderDriftAudit(spark, emptyDir)
      .collect()
    assert(drift.length == 1)
    assert((drift(0).getAs[Long]("prefix_rows"),
      drift(0).getAs[Long]("frozen_candidate_rows"),
      drift(0).getAs[Long]("fresh_candidate_rows"),
      drift(0).getAs[Double]("drift_ratio"),
      drift(0).getAs[Long]("rebuild_recommended")) ==
      ((0L, 0L, 0L, 1.0, 0L)), s"d30 empty: ${drift(0)}")
    // the file-arrival dial (not a report row — delivery state, not
    // corpus statistics) floors on an empty replay too
    assert(graft.streaming.Events.deriveFileArrivalDelayUs(spark, emptyDir) == 1L)
    // the IVF index family floors the same way: an empty-corpus index
    // probes to zero rows, and both drift audits read (0, 0, 1.0, 0)
    assert(graft.operators.Similarity.annIvfIndexed(spark, emptyDir)
      .count() == 0)
    val ivfDrift = graft.operators.Similarity.ivfDriftAudit(spark, emptyDir)
      .collect()
    assert(ivfDrift.length == 1)
    assert((ivfDrift(0).getAs[Long]("frozen_candidate_rows"),
      ivfDrift(0).getAs[Long]("fresh_candidate_rows"),
      ivfDrift(0).getAs[Double]("drift_ratio"),
      ivfDrift(0).getAs[Long]("rebuild_recommended")) == ((0L, 0L, 1.0, 0L)),
      s"s17 empty: ${ivfDrift(0)}")
    graft.operators.Similarity.persistIvfIndex(spark, emptyDir,
      prefix = "empty_ivf_idx")
    val ivfLive = graft.operators.Similarity
      .ivfIndexDriftAudit(spark, "empty_ivf_idx").collect()(0)
    assert((ivfLive.getAs[Long]("frozen_candidate_rows"),
      ivfLive.getAs[Long]("fresh_candidate_rows"),
      ivfLive.getAs[Double]("drift_ratio"),
      ivfLive.getAs[Long]("rebuild_recommended")) == ((0L, 0L, 1.0, 0L)),
      s"empty live IVF audit: $ivfLive")
    // the PQ index family floors identically: an empty-corpus index
    // stores an EMPTY codebook (no rows to carry the bits column — the
    // stored-bits scalar falls back to the build derivation), probes to
    // zero rows, and both drift audits read (0, 0, 1.0, 0)
    assert(graft.operators.Similarity.annPqIndexed(spark, emptyDir)
      .count() == 0)
    val pqDrift = graft.operators.Similarity.pqDriftAudit(spark, emptyDir)
      .collect()
    assert(pqDrift.length == 1)
    assert((pqDrift(0).getAs[Long]("frozen_distortion_u6"),
      pqDrift(0).getAs[Long]("fresh_distortion_u6"),
      pqDrift(0).getAs[Double]("drift_ratio"),
      pqDrift(0).getAs[Long]("rebuild_recommended")) == ((0L, 0L, 1.0, 0L)),
      s"s19 empty: ${pqDrift(0)}")
    graft.operators.Similarity.persistPqIndex(spark, emptyDir,
      prefix = "empty_pq_idx")
    val pqLive = graft.operators.Similarity
      .pqIndexDriftAudit(spark, "empty_pq_idx").collect()(0)
    assert((pqLive.getAs[Long]("frozen_distortion_u6"),
      pqLive.getAs[Long]("fresh_distortion_u6"),
      pqLive.getAs[Double]("drift_ratio"),
      pqLive.getAs[Long]("rebuild_recommended")) == ((0L, 0L, 1.0, 0L)),
      s"empty live PQ audit: $pqLive")
    graft.operators.Similarity.dropPqTables(spark, "empty_pq_idx")
    // s20 on an empty corpus: one all-zeros row, norms floored to 0.0
    val sanity = graft.operators.Similarity
      .vectorSanityReport(spark, emptyDir).collect()
    assert(sanity.length == 1)
    assert((sanity(0).getAs[Long]("n_vectors"),
      sanity(0).getAs[Long]("n_clean"),
      sanity(0).getAs[Double]("min_norm"),
      sanity(0).getAs[Double]("avg_norm")) == ((0L, 0L, 0.0, 0.0)),
      s"s20 empty: ${sanity(0)}")
    // s21 on an empty corpus: zeros with coverage vacuously 100.0 — the
    // gate must pass a pipeline's first run
    val cov = graft.operators.Similarity
      .modalityCoverageAudit(spark, emptyDir).collect()
    assert(cov.length == 1)
    assert((cov(0).getAs[Long]("n_docs"), cov(0).getAs[Long]("n_vectors"),
      cov(0).getAs[Long]("docs_without_vector"),
      cov(0).getAs[Long]("vectors_without_doc"),
      cov(0).getAs[Double]("coverage_pct")) == ((0L, 0L, 0L, 0L, 100.0)),
      s"s21 empty: ${cov(0)}")
    // m18 on an empty corpus: an empty index (width floored to 0) probed
    // by an empty batch — zero pairs, never a crash
    graft.multimodal.Multimodal.persistMediaIndex(spark, emptyDir,
      "empty_midx", corpusFilter = org.apache.spark.sql.functions.lit(true))
    assert(graft.multimodal.Multimodal.incrementalMediaFromIndex(
      spark, emptyDir, "empty_midx").count() == 0)
    // m19 is a policy row (the d30 convention): zero volumes, ratio
    // floored to 1.0, no rebuild
    val mdrift = graft.multimodal.Multimodal
      .mediaIndexDriftAudit(spark, emptyDir).collect()
    assert(mdrift.length == 1)
    assert((mdrift(0).getAs[Long]("frozen_collision_rows"),
      mdrift(0).getAs[Long]("fresh_collision_rows"),
      mdrift(0).getAs[Double]("drift_ratio"),
      mdrift(0).getAs[Long]("rebuild_recommended")) == ((0L, 0L, 1.0, 0L)),
      s"m19 empty: ${mdrift(0)}")
  }

  test("relational aggregates behave on empty orders (global aggs emit one null-ish row)") {
    // a global aggregate over zero rows still emits one row — pinned so the
    // contract is explicit, not accidental
    assert(graft.operators.Extended.hashSampledOrderStats(spark, emptyDir).count() == 0)
    assert(graft.operators.Extended.priceHistogram(spark, emptyDir).count() == 0)
    val profile = graft.operators.Profile.ordersProfile(spark, emptyDir).collect()
    assert(profile.length == 1 && profile(0).getLong(0) == 0)
  }
}
