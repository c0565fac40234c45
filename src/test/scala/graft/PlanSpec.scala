package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions — the scale properties the engine is designed
  * around, pinned as tests so a refactor that silently de-optimizes a plan
  * (extra shuffle, lost column pruning, lost broadcast) fails CI.
  */
class PlanSpec extends AnyFunSuite {
  import graft.operators.{Extended, Relational}
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  private def initialPlan(df: DataFrame) =
    df.queryExecution.executedPlan

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => allScans(a.inputPlan)
    }.flatten

  test("q5 multi-join: dims broadcast, never shuffled as build sides") {
    val p = planString(Relational.revenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("q1 pivot: lineitem scan prunes to the two referenced columns") {
    val scans = allScans(initialPlan(Relational.pivotMonthlyQty(spark, sf)))
    assert(scans.nonEmpty)
    val readCols = scans.head.schema.fieldNames.toSet
    assert(readCols == Set("l_quantity", "l_shipdate"),
      s"scan reads $readCols, expected only quantity+shipdate")
  }

  test("q7 top-1: ORDER BY + LIMIT 1 plans as TakeOrderedAndProject (no global sort)") {
    val p = planString(Relational.bestPerformingPart(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q3 group+window share one exchange (partkey clustering satisfies both)") {
    val plan = initialPlan(Relational.top1DayPerPart(spark, sf))
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => countShuffles(a.inputPlan)
      }.sum
    val shuffles = countShuffles(plan)
    // one exchange for repartition(l_partkey) + one for the final orderBy
    assert(shuffles <= 2, s"expected <=2 shuffles, got $shuffles:\n$plan")
  }

  test("q9 holiday: dim filter is pushed transitively onto the orders scan") {
    val plan = initialPlan(Extended.holidayPivot(spark, sf))
    val scans = plan.collect { case s: FileSourceScanExec => s }
    // the orders scan must carry a data filter (year/dow/holiday pushed
    // through the join key), not scan everything
    val p = plan.toString
    assert(p.contains("year(cast(o_orderdate"), s"no transitive pushdown:\n$p")
  }

  test("d8 decontamination: eval n-grams broadcast into a semi join") {
    val p = planString(graft.operators.Dedup.decontaminate(spark, sf, release = false))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi join:\n$p")
  }

  test("q29 range join: bucketized plan has no nested-loop/cartesian stage") {
    val p = planString(graft.streaming.Events.purchasesWithRecentClicks(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a quadratic join:\n$p")
  }

  test("q33 hash sample: membership predicate is a scan-level filter, no shuffle before agg") {
    val plan = initialPlan(graft.operators.Extended.hashSampledOrderStats(spark, sf))
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => countShuffles(a.inputPlan)
      }.sum
    // one exchange for the groupBy + one for the presentation sort — the
    // sampling itself must not add any
    assert(countShuffles(plan) <= 2, s"sampling added shuffles:\n$plan")
  }

  test("no query plan degenerates to a cartesian/nested-loop join (except declared quadratic ones)") {
    // intentionally non-equi or broadcast-cross plans:
    //  - s1 (r7): now multi-index candidate-driven — the corpus×queries
    //    brute-force scan moved to the UNREGISTERED annBruteForceTopK
    //    baseline; s1's remaining BNLJ nodes are the IVF quantizer's two
    //    1-row centroid broadcasts (exactly s3's exempted shape)
    //  - s3/t8/t11/q36: crossJoin(broadcast(<1-row or dim>)) scalar/centroid fan-in
    //  - q23: correlated scalar subquery decorrelates to a single-row join
    // (d5 earned its way OUT of this set: banded-LSH candidates, r3)
    // (q44 joined the set in r4: its global revenue share moved OFF the
    // single-partition window onto the q36 scalar-total broadcast shape)
    //  - d14 (r5): the s3 coarseQuantizer's 1-row centArr broadcast — same
    //    shape s3 is exempted for; the pair join itself is an equi join
    //  - t20 (r5): the 1-row vocabulary-size scalar broadcast (t8's shape)
    //  - t22 (r5): t11's 1-row percentile-boundary broadcast
    //  - s7 (r5): ONLY the 1-row int8-grid broadcast — its candidate stage
    //    is the sub-linear LSH join (that being the point of s7)
    //  - s5/s6 (r6): now candidate-driven (the r5 corpus×queries coarse
    //    scans moved to the FullScan recall baselines) — their remaining
    //    BNLJ nodes are all 1-row broadcasts: the s3 quantizer pair (s5)
    //    and the int8-grid/PQ-codebook (both)
    //  - t23 (r6): the 1-row model-totals scalar broadcast (t20's shape)
    //  - t24 (r6): inherits t20's vocabulary-scalar broadcast, planned
    //    once per reference of the scored frame (bounds branch + scoring
    //    branch → 2; the registered form checkpoints the scores so the
    //    duplication exists only in this live inspection plan); its own
    //    additions — grouped sketch + broadcast equi join on source —
    //    add none
    val quadraticByDesign = Set(
      "s1_ann_topk", "s3_ann_ivf_topk", "s4_quantize_int8",
      "t8_tfidf", "t11_length_buckets", "t14_mixture_sample",
      "q36_histogram", "q44_supplier_revenue", "q23_correlated_subq",
      "q49_expectations", "d14_auto_cells", "s5_two_stage_ann",
      "t20_lm_perplexity", "s6_pq_ann", "t22_vocab_growth",
      "s7_lsh_rerank", "t23_dsir_weights", "t24_ccnet_cut",
      "q52_ewma_spend", "t30_burstiness",
      "t31_temp_mixture", "t32_coverage_curve", "s12_silhouette",
      "q54_spend_deciles", "s13_index_quality",
      //  - s16/s17 (r13): the s3 quantizer shape again — every BNLJ is a
      //    1-row broadcast (probe-side centroid array fan-in; s17 holds
      //    TWO quantizers plus the 1×1 policy-row fold), pinned below
      "s16_ivf_indexed", "s17_ivf_drift",
      //  - s18/s19 (r13): the PQ codebook shape (s6's exemption) — every
      //    BNLJ is the 1-row codebook broadcast (s18: stored-codes recon
      //    + query encode; s19: frozen + fresh distortion passes plus
      //    the 1×1 policy-row fold), pinned below; s18's candidate join
      //    is an equi hash join on bucket — not here
      "s18_pq_indexed", "s19_pq_drift",
      //  - s21 (r13): a pure 1-row-report fold — all three BNLJ nodes are
      //    the 1×1 crossJoins stitching the four single-row aggregates
      //    into the one audit row (the s17/s19 policy-row shape); the
      //    orphan joins themselves are key-only anti equi joins — not here
      //  - s22 (r14): the composed index's 1-row broadcasts — stored
      //    centroids under the probe ranking (+ the DPP subquery's
      //    embedded copy, the s16 shape) and the stored codebook under
      //    the candidate reconstruction and the query encode (the s18
      //    shape); the cell candidate join and both rerank joins are
      //    equi hash joins — not here
      "s22_ivfpq_ann",
      //  - s23 (r15): the composed drift policy holds s17's shape TWICE
      //    (frozen + fresh quantizer 1-row broadcasts over assignment +
      //    probe ranking) plus s19's two codebook broadcasts plus the
      //    THREE 1×1 crossJoins stitching four 1-row volumes into the
      //    composed policy row — all 1-row broadcasts, pinned below
      "s23_ivfpq_drift",
      "s21_modality_coverage")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(quadraticByDesign)
      .flatMap { name =>
        val p =
          try planString(livePlanOf(name))
          catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
          || p.startsWith("PLAN FAILED")) Some(name -> p.linesIterator.take(3).mkString(" | "))
        else None
      }
    assert(offenders.isEmpty,
      s"unexpected quadratic joins in: ${offenders.map(_._1)}\n${offenders.take(2)}")
  }

  test("exempted queries carry EXACTLY their documented broadcast-cross joins, no more") {
    // the quadraticByDesign exemption removes a query from the cartesian
    // gate entirely — so pin each exempted plan's BNLJ/cartesian NODE
    // COUNT instead: a regression that adds an unexpected quadratic join
    // to an exempted query moves its count and fails here
    // counts > 1 are the SAME 1-row broadcast planned once per reference
    // (a codes/assigned frame consumed by two join sides re-plans its
    // grid/centroid crossJoin); q23's correlated subquery decorrelates to
    // a plain hash join — zero.
    val expectedBnlj = Map(
      // s1 = 2 (r7): the IVF quantizer's 1-row centroid broadcasts
      // (assignment + probe ranking) — the s3 shape; the r6 corpus×queries
      // BNLJ left the registry with the brute-force demotion
      "s1_ann_topk" -> 2, "s3_ann_ivf_topk" -> 2, "s4_quantize_int8" -> 1,
      "t8_tfidf" -> 1, "t11_length_buckets" -> 1, "t14_mixture_sample" -> 1,
      "q36_histogram" -> 1, "q44_supplier_revenue" -> 1,
      "q23_correlated_subq" -> 0, "q49_expectations" -> 1,
      "d14_auto_cells" -> 2, "s5_two_stage_ann" -> 4,
      "t20_lm_perplexity" -> 1, "s6_pq_ann" -> 2, "t22_vocab_growth" -> 1,
      // t24 = 3: t20's one-row LM-total broadcast re-planned per consumer
      // of the shared scored frame (grid chain + final cut join)
      "s7_lsh_rerank" -> 2, "t23_dsir_weights" -> 1, "t24_ccnet_cut" -> 3,
      // r7 batch 10: one 1-row scalar broadcast each (q52's anchor
      // timestamp, t30's corpus doc count)
      "q52_ewma_spend" -> 1, "t30_burstiness" -> 1,
      // r7 batch 12: one 1-row scalar broadcast each (t31's totals, s12's
      // centroid array, q54's boundary row); t32 adds the 3-row
      // checkpoint frame to its totals broadcast
      "t31_temp_mixture" -> 1, "t32_coverage_curve" -> 2,
      "s12_silhouette" -> 1, "q54_spend_deciles" -> 1,
      // s13 composes s1 (2 centroid broadcasts) with s2 (0)
      "s13_index_quality" -> 2,
      // s16 = 2: the probe side's 1-row stored-centroid broadcast,
      // counted once on the join's build side and once inside the
      // dynamic-partition-pruning subquery the _icell scan carries (DPP
      // embeds a copy of the pruning side's plan); the corpus join
      // itself is an equi hash join on cent_id — not here
      "s16_ivf_indexed" -> 2,
      // s17 = 5: two quantizers × (assignment + probe ranking) 1-row
      // centroid broadcasts + the 1×1 frozen×fresh policy-row fold
      "s17_ivf_drift" -> 5,
      // s18 = 2: the stored 1-row codebook broadcast, once under the
      // corpus-codes reconstruction and once under the query encode;
      // the bucket candidate join and both rerank joins are equi hash
      // joins — zero BNLJ there
      "s18_pq_indexed" -> 2,
      // s19 = 3: frozen + fresh 1-row codebook broadcasts (one
      // distortion pass each) + the 1×1 frozen×fresh policy-row fold
      "s19_pq_drift" -> 3,
      // s21 = 3: the 1×1 crossJoins stitching the four 1-row aggregates
      // into the audit row; both orphan anti-joins are equi — zero there
      "s21_modality_coverage" -> 3,
      // s22 = 4: stored-centroid 1-row broadcast on the probe ranking
      // plus its DPP-subquery copy (the s16 pair), and the stored
      // 1-row codebook once under the candidate-codes reconstruction
      // and once under the query encode (the s18 pair)
      "s22_ivfpq_ann" -> 4,
      // s23 = 9: s17's four (two quantizers × assignment + probe
      // ranking) + s19's two (frozen/fresh codebook distortion passes)
      // + the three 1×1 policy-row folds
      "s23_ivfpq_drift" -> 9)
    // (r7: s11/t29's one-row broadcasts plan as broadcast HASH joins —
    // zero BNLJ nodes — so they stay under the main gate, unexempted)
    val actual = expectedBnlj.keys.map { n =>
      val p = planString(livePlanOf(n))
      n -> ("BroadcastNestedLoopJoin".r.findAllIn(p).size +
        "CartesianProduct".r.findAllIn(p).size)
    }.toMap
    assert(actual == expectedBnlj,
      s"drifted: ${actual.toSeq.sorted.filterNot(kv => expectedBnlj.get(kv._1).contains(kv._2))}")
  }

  private def allWindows(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.window.WindowExec] =
    p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => allWindows(a.inputPlan)
    }.flatten

  test("t11 curriculum buckets: no global sort / empty-partition window in the shipped plan") {
    val plan = initialPlan(graft.operators.TextAnalysis.lengthCurriculumBuckets(spark, sf))
    // the scale-killer this replaces was ntile over Window.orderBy with no
    // partition key — a single-partition sort of the whole corpus
    assert(allWindows(plan).isEmpty, s"unexpected window:\n$plan")
    assert(!plan.toString.contains("ntile("), s"ntile leaked back in:\n$plan")
  }

  // Queries whose registered form ends in localCheckpoint (the cache-release
  // discipline) plan as an opaque ExistingRDD scan, which would make the
  // suite-wide gates below vacuously pass for them. Each such query exposes
  // a `release = false` seam returning the LIVE plan; the gates inspect
  // that instead. (d6/d7 stay opaque by nature: iterative label propagation
  // executes during construction and its per-round plan is O(1) by design —
  // audited in DedupSpec, not here.)
  private def livePlanOf(name: String): org.apache.spark.sql.DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    name match {
      case "d2_ngram_jaccard"    => Dedup.ngramJaccardPairs(spark, sf, release = false)
      case "d17_containment_dedup" => Dedup.containmentPairs(spark, sf, release = false)
      case "d19_dedup_audit"     => Dedup.dedupAudit(spark, sf, release = false)
      case "d3_minhash_lsh"      => Dedup.minhashLshPairs(spark, sf, release = false)
      case "d5_embedding_neardup" => Dedup.embeddingNearDupPairs(spark, sf, release = false)
      case "d8_decontaminate"    => Dedup.decontaminate(spark, sf, release = false)
      case "d9_simhash_pairs"    => Dedup.simhashNearDupPairs(spark, sf, release = false)
      case "d10_dup_ngram_frac"  => Dedup.dupNgramFraction(spark, sf, release = false)
      case "d11_incremental_dedup" => Dedup.incrementalDedup(spark, sf, release = false)
      case "d12_incremental_dedup_indexed" =>
        Dedup.incrementalDedupIndexed(spark, sf, release = false)
      case "d13_auto_banded" =>
        Dedup.incrementalEmbeddingDedup(spark, sf, bandBits = 0, release = false)
      case "d15_source_overlap"  => Dedup.sourceOverlapMatrix(spark, sf, release = false)
      case "d16_split_leakage"   => Dedup.trainTestSplitLeakage(spark, sf, release = false)
      case "t20_lm_perplexity"   => TextAnalysis.ngramLmPerplexity(spark, sf, release = false)
      case "t9_repetition"       => TextAnalysis.repetitionStats(spark, sf, release = false)
      case "t13_quality_filter"  => TextAnalysis.qualityFilterVerdicts(spark, sf)
      case "t21_zipf_fit"        => TextAnalysis.zipfFit(spark, sf, release = false)
      case "t23_dsir_weights"    => TextAnalysis.dsirWeights(spark, sf, release = false)
      case "t24_ccnet_cut"       => TextAnalysis.ccnetPerplexityCut(spark, sf, release = false)
      case "t32_coverage_curve"  => TextAnalysis.coverageCurve(spark, sf, release = false)
      case _ => SparkEntry.queries(name)(spark, sf)
    }
  }

  test("no registered query plans an empty-partition (single-partition) window") {
    // Window.partitionBy() funnels the whole input through ONE partition —
    // the t11/q44 scale-killer shape. After rewriting q44 to the scalar-
    // aggregate + crossJoin(broadcast) spelling this gate holds with ZERO
    // exemptions, so any future query that reaches for a global window
    // fails here instead of shipping a single-partition bottleneck.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val empties =
        try allWindows(initialPlan(livePlanOf(name)))
          .filter(_.partitionSpec.isEmpty)
        catch { case _: Throwable => Nil } // plan failures are the gate below's job
      if (empties.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"single-partition windows in: $offenders")
  }

  test("t26 heavy hitters: sketch aggregates stay object-hash, verify pass broadcasts") {
    val plan = initialPlan(graft.operators.TextAnalysis.heavyHitters(spark, sf))
    val s = plan.toString
    assert(s.contains("ObjectHashAggregate"),
      "typed MG sketch should plan as ObjectHashAggregate (partial per-partition summaries)")
    assert(s.contains("BroadcastHashJoin"),
      "the exact verify pass must broadcast the <= k-row candidate sketch")
    assert(!s.contains("SortMergeJoin"),
      "no corpus-side shuffle join belongs in the verify pass")
  }

  test("s3 IVF: centroid assignment is map-side (no window/exchange touches the corpus scan)") {
    val plan = initialPlan(graft.operators.Similarity.annIvfTopK(spark, sf))
    // the only window allowed is the final per-query top-k (partitioned by
    // query_id over the bounded candidate set) — assignment/probe argmax
    // must not reintroduce a Window.partitionBy(vec_id) over corpus×ncells
    val offending = allWindows(plan).filterNot { w =>
      w.partitionSpec.nonEmpty &&
        w.partitionSpec.forall(_.references.map(_.name).forall(_ == "query_id"))
    }
    assert(offending.isEmpty, s"non-top-k window in IVF plan:\n$offending")
  }

  test("d5 banded-LSH: covered by the suite no-cartesian gate without exemption") {
    val p = planString(graft.operators.Dedup.embeddingNearDupPairs(spark, sf, release = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d5 fell back to a quadratic join:\n$p")
  }

  test("q58 SCD2: both per-user windows ride one clustering exchange") {
    val plan = initialPlan(Extended.scd2Intervals(spark, sf))
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => countShuffles(a.inputPlan)
      }.sum
    // one exchange clusters by user_id (the lag AND the post-filter lead
    // windows both consume it), one for the final orderBy — a third
    // would mean the repeat-collapse filter broke the co-partitioning
    assert(countShuffles(plan) <= 2, s"expected <=2 shuffles:\n$plan")
  }

  test("m14 level crossings: map-side fold, no shuffle before the ordered output") {
    val plan = initialPlan(
      graft.multimodal.Multimodal.audioLevelCrossings(spark, sf))
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => countShuffles(a.inputPlan)
      }.sum
    // documentsParallel's repartition + the final orderBy range exchange
    assert(countShuffles(plan) <= 2, s"expected <=2 shuffles:\n$plan")
  }

  test("whole-stage codegen covers the relational hot paths") {
    val df = Relational.revenueByNation(spark, sf)
    df.collect() // materialize THIS queryExecution so AQE finalizes in-place
    val p = planString(df)
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen spans in:\n$p")
  }
}
