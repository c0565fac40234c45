package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 registrations: the auto-scaling d13/d14 forms became the graded
  * surface and s5/s6 became candidate-driven. These tests pin (a) the
  * gate-scale equivalence of auto and r5-pinned forms (the derivations
  * collapse to the pinned parameters at 500 vectors / 10 labels, so the
  * registered results must be identical there), (b) the sizing derivations
  * at the scales the soaks run (the values the DuckDB scalar-subquery
  * twins must reproduce), and (c) the candidate-driven s5/s6 contracts:
  * results live inside their generator's candidate set, rerank scores are
  * exact, and recall tracks the generator.
  */
class Round6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("d13 auto banding equals the r5 pinned registration at gate scale") {
    import graft.operators.Dedup
    val auto = Dedup.incrementalEmbeddingDedup(spark, sf, bandBits = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pinned = Dedup.incrementalEmbeddingDedup(spark, sf,
        bandBits = Dedup.EmbBandBits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == pinned,
      s"auto=${auto.size} pinned=${pinned.size} " +
        s"onlyAuto=${(auto -- pinned).take(3)} onlyPinned=${(pinned -- auto).take(3)}")
    assert(auto.nonEmpty, "planted near-dups should cross the parity split")
  }

  test("d14 auto cells equal the r5 pinned registration at gate scale") {
    import graft.operators.Dedup
    val auto = Dedup.semanticDedupAuto(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val pinned = Dedup.semanticDedup(spark, sf, subBits = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(auto == pinned,
      s"auto=${auto.size} pinned=${pinned.size} " +
        s"onlyAuto=${(auto -- pinned).take(3)} onlyPinned=${(pinned -- auto).take(3)}")
    assert(auto.nonEmpty, "planted near-dup embeddings should be pruned")
  }

  test("sizing derivations: the values the DuckDB scalar subqueries must replay") {
    import graft.operators.{Dedup, Similarity}
    // deriveBandBits(n) = max(3, round(log2(n / 60))); the oracle spells
    // round(ln(max(n,1)/60)/ln(2)) with greatest(3, ·) — same values
    assert(Dedup.deriveBandBits(500) == 3)   // gate scale -> r5 pinned config
    assert(Dedup.deriveBandBits(2000) == 5)  // sf0.1 (bench scale)
    assert(Dedup.deriveBandBits(20000) == 8) // 10x soak
    assert(Dedup.deriveBandBits(60000) == 10) // 30x soak (bands cap at 63/10=6)
    assert(Seq(3, 5, 8, 10).forall(b => math.min(8, 63 / b) >= 6),
      "effective band count stays >= 6 across the soak scales")
    // deriveSubBits(n, labels) = max(0, round(log2(sqrt(n)/2/labels)))
    assert(Similarity.deriveSubBits(500, 10) == 0)  // gate scale -> pinned cells
    assert(Similarity.deriveSubBits(2000, 10) == 1)
    assert(Similarity.deriveSubBits(20000, 10) == 3)
    assert(Similarity.deriveSubBits(200000, 10) == 4)
    assert(Similarity.deriveSubBits(0, 0) == 0, "empty corpus degenerates")
    // deriveLshBits(n) = clamp(8..30, round(log2(n / 60))) — the s2/s6/s7
    // bucket sizing the LshCandCtesSql scalar subquery replays
    assert(Similarity.deriveLshBits(500) == 8)    // gate scale -> r5 pinned 2^8
    assert(Similarity.deriveLshBits(2000) == 8)   // bench scale: floor holds
    assert(Similarity.deriveLshBits(20000) == 8)  // 10x soak: floor holds
    assert(Similarity.deriveLshBits(60000) == 10) // 30x soak: buckets grow
    assert(Similarity.deriveLshBits(200000) == 12)
    assert(Similarity.deriveLshBits(0) == 8, "empty corpus floors")
  }

  test("s2 auto bucket sizing equals the r5 pinned registration at gate scale") {
    import graft.operators.Similarity
    val auto = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val pinned = Similarity.annLshTopK(spark, sf, lshBits = Similarity.LshBits)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(auto == pinned, s"auto=${auto.size} pinned=${pinned.size}")
    assert(auto.nonEmpty)
  }

  test("s5 candidate-driven: results live in the IVF candidate set, rerank exact") {
    import graft.operators.Similarity
    val raw = graft.sources.Tables.embeddings(spark, sf)
    val cand = Similarity.ivfCandidates(raw, autoCells = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s5 = Similarity.annTwoStageTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s1 = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s5.nonEmpty)
    // every returned neighbor came from the generator — the coarse stage
    // never saw a non-candidate row
    val escaped = s5.filterNot(g => cand((g._1, g._2)))
    assert(escaped.isEmpty, s"non-candidate results: ${escaped.take(3)}")
    // ranks contiguous, scores non-increasing, rerank scores exact
    s5.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
    val exact = s1.map(r => (r._1, r._2) -> r._4).toMap
    s5.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // the composition cannot beat its candidate generator: recall vs s1
    // is bounded by IVF cell recall (3 of 10 label cells probed at this
    // scale — measured 0.46, the same profile the registered s3 carries).
    // The real contract is that s5 keeps what s3's exact in-cell ranking
    // keeps: same candidates, and the int8 coarse stage over a 20-wide
    // shortlist loses almost nothing before the exact rerank.
    val s3 = Similarity.annIvfTopK(spark, sf, autoCells = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = s3.count { case (q, n) => s5.exists(g => g._1 == q && g._2 == n) }
    assert(hits.toDouble / s3.size >= 0.9, s"s5 recalls ${hits}/${s3.size} of s3's top-5")
  }

  test("s6 candidate-driven: results live in the LSH candidate set, rerank exact") {
    import graft.operators.Similarity
    val raw = graft.sources.Tables.embeddings(spark, sf)
    val cand = Similarity.lshCandidates(raw).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s6 = Similarity.annPqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s1 = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s6.nonEmpty)
    val escaped = s6.filterNot(g => cand((g._1, g._2)))
    assert(escaped.isEmpty, s"non-candidate results: ${escaped.take(3)}")
    s6.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
    }
    val exact = s1.map(r => (r._1, r._2) -> r._4).toMap
    s6.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // same candidate generator as s7; the PQ coarse stage is lossier than
    // the int8 grid but the exact rerank recovers the final ordering, so
    // s6 keeps most of what s2's exact in-bucket ranking keeps
    val s2 = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = s2.count { case (q, n) => s6.exists(g => g._1 == q && g._2 == n) }
    assert(hits.toDouble / s2.size >= 0.7, s"s6 recalls ${hits}/${s2.size} of s2's top-5")
  }

  test("t21 hapax sub-partitioning: forced splits reproduce the global rank exactly") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.{col, count, explode, lit, substring}
    // the real corpus vocabulary (the exact frame zipfFit ranks)
    val tf = graft.sources.Tables.documentsParallel(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("freq"))
      .cache()
    try {
      val reference = tf.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (t, f) => (-f, t) }
        .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
      val plain = TextAnalysis.zipfRanked(spark, tf, maxGroup = Long.MaxValue)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      // maxGroup = 1 forces EVERY frequency group through the prefix
      // sub-partitioning path (the 100 TB hapax regime, shrunk to fit)
      val split = TextAnalysis.zipfRanked(spark, tf, maxGroup = 1L, prefixLen = 2)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(plain == reference, "unsplit rank drifted from the global sort")
      assert(split == reference, "sub-partitioned rank drifted from the global sort")
      // the bound holds: with every group split, no (freq, prefix) window
      // partition exceeds the per-prefix vocabulary width
      val widest = tf
        .groupBy(col("freq"), substring(col("token"), 1, 2).as("sub"))
        .agg(count(lit(1)).cast("long").as("n"))
        .collect().map(_.getLong(2)).max
      assert(widest < tf.count(),
        "prefix sub-partitioning failed to divide the vocabulary at all")
    } finally tf.unpersist()
  }

  test("t21 zipf fit is invariant under the sub-partitioned ranking path") {
    import graft.operators.TextAnalysis
    // zipfFit consumes zipfRanked; the OLS inputs are (ln rank, ln freq),
    // so identical ranks must give an identical single-row fit. Run the
    // registered form twice — once as shipped (no splits at this scale),
    // once through a session with the splitting engaged via zipfRanked's
    // contract being exercised above. Here we pin the shipped output is
    // deterministic across runs (cache release + recompute).
    val a = TextAnalysis.zipfFit(spark, sf).collect().head
    val b = TextAnalysis.zipfFit(spark, sf).collect().head
    assert(a == b, s"zipf fit not deterministic: $a vs $b")
  }

  test("t23 DSIR: target-like raw docs outweigh alien ones; target docs excluded") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.{col, length, lit}
    val spark2 = spark
    import spark2.implicits._
    // target source src1: a characteristic bigram vocabulary; raw source
    // src2 holds one doc written in the target's bigram distribution and
    // one written in a disjoint vocabulary — DSIR must rank the mimic
    // above the alien (that ordering IS the data-selection contract).
    val targetText = (0 until 60).map(i => s"t${i % 12}").mkString(" ")
    val mimicText = (0 until 40).map(i => s"t${(i + 3) % 12}").mkString(" ")
    val alienText = (0 until 40).map(i => s"z${i % 17}").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_t23").toString
    Seq(
      (1L, targetText, "src1"), (2L, targetText + " t0 t1", "src1"),
      (10L, mimicText, "src2"), (11L, alienText, "src2"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set(10L, 11L),
      s"only raw (non-target) docs are scored: ${rows.keySet}")
    assert(rows(10L) > rows(11L),
      s"target-mimicking doc must outweigh the alien one: $rows")
    // the mimic's features are common under the target model -> its
    // log-ratio should be positive; the alien's target counts are all
    // zero-smoothed -> negative
    assert(rows(10L) > 0 && rows(11L) < 0, s"sign contract: $rows")
  }

  test("t24 CCNet cut: per-source tercile ordering, boundary ties to the lower cut") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.ccnetPerplexityCut(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._4).toSet.subsetOf(Set("head", "middle", "tail")))
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val byCut = docs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // cut ordering: every head ppl is strictly below every middle ppl
      // (boundary ties all land in the lower cut), middles below tails
      for {
        h <- byCut.get("head"); m <- byCut.get("middle")
      } assert(h.max < m.min, s"$src: head/middle overlap")
      for {
        m <- byCut.get("middle"); t <- byCut.get("tail")
      } assert(m.max < t.min, s"$src: middle/tail overlap")
      // a source with >= 3 scored docs exercises all three cuts unless
      // ties collapse a boundary; at minimum the head cut is non-empty
      assert(byCut.contains("head"), s"$src: no head cut")
    }
  }

  test("full-scan baselines remain quadratic-by-design and UNREGISTERED") {
    // the r5 forms retired from the registry; a re-registration would
    // reintroduce the corpus x queries coarse scan to the graded surface
    val names = SparkEntry.queries.keySet
    assert(!names.contains("d13_incremental_embedding") &&
      !names.contains("d14_semantic_dedup"),
      "r5 pinned forms must stay retired from the registry")
    assert(names.contains("d13_auto_banded") && names.contains("d14_auto_cells"),
      "auto-scaling forms must stay registered")
  }

  test("t25 gopher rules: map-side ratios equal an exploded recomputation") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    import graft.operators.TextAnalysis
    val g = TextAnalysis.gopherRules(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(g.count() == docs.count(), "one report row per document")
    // alternate formulation: explode the tokens and aggregate — total
    // non-space chars == sum of token lengths, etc.
    val alt = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(length(col("tok"))).cast("double") / count(lit(1)) + 1e-9, 4)
          .as("mwl"),
        round(sum(when(col("tok").rlike("[a-z]"), 1.0).otherwise(0.0))
          / count(lit(1)) + 1e-9, 4).as("fa"),
        size(collect_set(when(col("tok")
          .isInCollection(TextAnalysis.GopherStops), col("tok")))).cast("long")
          .as("stops"))
    val joined = g.join(alt, "doc_id")
    assert(joined.filter(col("n_words") =!= col("n") ||
      col("mean_word_len") =!= col("mwl") ||
      col("frac_alpha") =!= col("fa") ||
      col("n_stop_kinds") =!= col("stops")).count() == 0,
      "map-side ratios must equal the exploded recomputation")
    // rule diversity: assert both rule_words verdicts on a PLANTED
    // two-doc fixture (r7, ADVICE) — the shared testdata regenerates
    // every round, so "a 23-token and a 78-token doc both exist" is a
    // fixture property, not a code property
    val dir = java.nio.file.Files.createTempDirectory("graft_t25").toString
    val longText = (1 to 60).map(i => s"alpha$i").mkString(" ")
    val planted = Seq(
      (1L, longText, "en", "web", longText.length.toLong),
      (2L, "too short to pass", "en", "web", 17L))
    spark.createDataFrame(planted)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val verdicts = TextAnalysis.gopherRules(spark, dir)
      .select(col("doc_id"), col("rule_words")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts == Map(1L -> true, 2L -> false),
      s"60-word doc must pass rule_words, 4-word doc must fail: $verdicts")
  }

  test("s8 diversified top-k: cap binds on a planted same-label cluster") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_s8").toString
    // five identical-direction vectors: query 0 plus corpus 1,2,3 (label 1)
    // and 4 (label 2). Identical vectors share an LSH bucket by
    // construction; cosine ties break by neighbor_id ascending.
    val base = (0 until Similarity.Dim).map(_ => 1.0f)
    val rows = Seq((0L, base, 1), (1L, base, 1), (2L, base, 1),
      (3L, base, 1), (4L, base, 2))
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val capped = Similarity.annDiversifiedTopK(spark, dir, k = 2, perLabelCap = 1)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    // uncapped top-2 would be (1, label1), (2, label1); the cap must
    // replace the second label-1 hit with the label-2 vector
    assert(capped.toSeq == Seq((1L, 1, 1L), (4L, 2, 2L)),
      s"cap=1 should yield neighbor 1 then the label-2 vector 4, got ${capped.toSeq}")
    // registered form invariants at gate scale: per-(query,label) counts
    // never exceed the cap and ranks are contiguous from 1
    val reg = Similarity.annDiversifiedTopK(spark, sf).collect()
    val byQL = reg.groupBy(r => (r.getLong(0), r.getInt(2))).view.mapValues(_.length)
    assert(byQL.values.forall(_ <= 2), "per-label cap violated")
    reg.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(3)).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"ranks not contiguous for query $q")
    }
  }

  test("t26 heavy hitters: sketch-then-verify equals the exact threshold count") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    import graft.operators.TextAnalysis
    // exact formulation: full groupBy count, same integer-ceil threshold
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val n = toks.count()
    val expected = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >=
        (n + TextAnalysis.HeavyHittersK - 1) / TextAnalysis.HeavyHittersK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = TextAnalysis.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"got ${got.size} expected ${expected.size}")
    assert(got.nonEmpty, "the small fixed vocabulary must produce heavy hitters")
  }

  test("t26 sketch guarantee survives forced decrements (tiny k, planted skew)") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // one doc: 100 x 'hot' + 40 distinct cold tokens; k=2 forces the
    // MG decrement path constantly, but count(hot)=100 > n/(k+1)=46.7
    // must survive the sketch, and the verify threshold ceil(140/2)=70
    // admits exactly 'hot'
    val dir = java.nio.file.Files.createTempDirectory("graft_t26").toString
    val text = (Seq.fill(100)("hot") ++ (1 to 40).map(i => s"cold$i")).mkString(" ")
    spark.createDataFrame(Seq((1L, text, "en", "src1")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.heavyHitters(spark, dir, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("hot", 100L)), s"got ${out.toSeq}")
    // exact-boundary corpus: count(hot) == ceil(n/k) precisely (70 hot +
    // 70 cold singles, k=2 -> threshold 70). A fractional-division
    // threshold spelling (70.5) drops it; the integer-exact spelling and
    // the oracle's `//` both admit it.
    val dir2 = java.nio.file.Files.createTempDirectory("graft_t26b").toString
    val text2 = (Seq.fill(70)("hot") ++ (1 to 70).map(i => s"cold$i")).mkString(" ")
    spark.createDataFrame(Seq((1L, text2, "en", "src1")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = TextAnalysis.heavyHitters(spark, dir2, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out2.toSeq == Seq(("hot", 70L)),
      s"exact-boundary count ceil(n/k) must be admitted, got ${out2.toSeq}")
    // merge path: the same answer at any partitioning (mergeable-summary
    // property, Agarwal et al. 2013)
    import spark.implicits._
    val sk4 = spark.createDataset(
        Seq.fill(100)("hot") ++ (1 to 40).map(i => s"cold$i"))
      .repartition(4)
      .groupByKey(_ => 0)
      .agg(new TextAnalysis.MisraGriesAgg(2).toColumn.name("s"))
      .collect()(0)._2
    assert(sk4.n == 140L && sk4.counters.contains("hot"),
      s"hot must survive a 4-way partitioned merge, got ${sk4.counters}")
  }

  test("s9 radius search: exact precision, every pair verified against brute force") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    graft.expressions.VectorExpressions.register(spark)
    val out = Similarity.annRadiusSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty, "radius 0.2 should return pairs on testdata")
    assert(out.forall(_._3 >= 0.2), "radius filter must be exact")
    // every returned pair must appear in the BRUTE-FORCE radius set with
    // the identical rounded cosine (precision 1.0; recall is candidate-
    // bounded by design and covered by s2's recall contract)
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val brute = e.crossJoin(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(expr("array_cosine(qe, embedding)"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.forall(brute.contains), "returned pair missing from brute-force radius set")
  }

  test("q50 cohort retention: offset-0 anchors at 1.0, matches countDistinct recomputation") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Events
    val rows = Events.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val cohortN = rows.filter(_.getLong(1) == 0L)
      .map(r => (r.getDate(0).toString, r.getLong(2))).toMap
    rows.foreach { r =>
      val (c, off, n, ret) =
        (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3))
      if (off == 0L) assert(ret == 1.0, s"cohort $c offset 0 must retain 1.0")
      assert(n <= cohortN(c), s"cohort $c offset $off exceeds cohort size")
      assert(ret > 0.0 && ret <= 1.0)
    }
    // alternate formulation: countDistinct over raw (not pre-distinct) days
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    val alt = ev.join(first, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    val got = rows.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == alt, "pre-distinct count(*) must equal countDistinct recomputation")
  }

  test("d19 audit reconciles with d2/d17 and classifies a planted wrapper pair") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    // gate-scale reconciliation: class counts sum to d17's pairs, the
    // 'both' class count equals d2's pairs (jaccard <= containment)
    val audit = Dedup.dedupAudit(spark, sf).collect()
    val total = audit.map(_.getLong(1)).sum
    assert(total == Dedup.containmentPairs(spark, sf).count())
    val both = audit.filter(_.getString(0) == "both").map(_.getLong(1)).sum
    assert(both == Dedup.ngramJaccardPairs(spark, sf).count())
    audit.foreach(r => assert(r.getDouble(2) <= r.getDouble(3) + 1e-9,
      "avg jaccard must not exceed avg containment"))
    // planted wrapper: an article verbatim inside a much larger page —
    // containment 1.0, jaccard well under threshold -> containment_only
    val dir = java.nio.file.Files.createTempDirectory("graft_d19").toString
    val article = (1 to 12).map(i => s"word$i").mkString(" ")
    val wrapper = (1 to 60).map(i => s"chrome$i").mkString(" ") + " " + article
    val docs = Seq((1L, article, "en", "src1"), (2L, wrapper, "en", "src1"))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Dedup.dedupAudit(spark, dir).collect()
    assert(planted.length == 1 && planted(0).getString(0) == "containment_only" &&
      planted(0).getLong(1) == 1L,
      s"wrapper pair must class containment_only, got ${planted.toSeq}")
    assert(planted(0).getDouble(3) == 1.0, "article is fully contained")
    assert(planted(0).getDouble(2) < 0.8, "jaccard stays under threshold")
  }
}
