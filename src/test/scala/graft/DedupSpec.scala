package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("prefix-filtered exact join == naive all-pairs == minhash LSH on planted near-dups") {
    val naive = Dedup.ngramJaccardPairsNaive(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefixFiltered = Dedup.ngramJaccardPairs(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test data should contain planted near-dup pairs")
    assert(prefixFiltered == naive, s"prefix=${prefixFiltered.size} naive=${naive.size}")
    assert(lsh == naive, s"LSH=${lsh.size} naive=${naive.size}")
  }

  test("d2 prefix filter keeps pairs at exactly the threshold boundary (r6 regression)") {
    // |A| = 5 trigram shingles (7 tokens), |B| = 4 (A's first 6 tokens):
    // jaccard = 4/5 = 0.8 EXACTLY. The pre-r6 code lost this pair twice
    // over — the prefix length (n·(1-τ)).cast(int) floored just below
    // the exact integer because 1.0-0.8 = 0.19999999999999996, dropping
    // A's second prefix slot (its only rare-but-shared shingle), and the
    // length filter computed 5·0.8 a hair above 4, pruning |B| = τ·|A|.
    // Found by the off-gate sf0.1 oracle sweep (pair 1568/2466), shrunk
    // to this minimal fixture.
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_d2_boundary").toString
    Seq(
      (1L, (0 until 7).map(i => s"tok$i").mkString(" "), "en", "src"),
      (2L, (0 until 6).map(i => s"tok$i").mkString(" "), "en", "src"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.8)), s"boundary pair lost or distorted: $got")
    // and the naive baseline agrees
    val naive = Dedup.ngramJaccardPairsNaive(spark, dir).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive == Seq((1L, 2L)))
  }

  test("near-dup pairs have small simhash hamming distance; random pairs large") {
    val sims = Dedup.simhashSignatures(spark, sf)
    val pairs = Dedup.ngramJaccardPairs(spark, sf)
    val withHam = pairs
      .join(sims.withColumnRenamed("doc_id", "id_a").withColumnRenamed("simhash", "sh_a"), "id_a")
      .join(sims.withColumnRenamed("doc_id", "id_b").withColumnRenamed("simhash", "sh_b"), "id_b")
      .select(Dedup.hamming(col("sh_a"), col("sh_b")).as("ham"))
    val maxNearDupHam = withHam.agg(max("ham")).collect()(0).getInt(0)
    assert(maxNearDupHam <= 12, s"near-dup hamming too large: $maxNearDupHam")

    // random pairs sit well above near-dups (the shared ~30-word vocabulary
    // compresses distances below the ~32 of independent corpora)
    val randomAvg = sims.as("a").join(sims.as("b"),
        col("a.doc_id") + 7 === col("b.doc_id"))
      .select(Dedup.hamming(col("a.simhash"), col("b.simhash")).as("ham"))
      .agg(avg("ham")).collect()(0).getDouble(0)
    assert(randomAvg > maxNearDupHam,
      s"no separation: random avg $randomAvg vs near-dup max $maxNearDupHam")
  }

  test("exact dedup groups partition the corpus") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val sumCopies = Dedup.exactDedupGroups(spark, sf)
      .agg(sum("n_copies")).collect()(0).getLong(0)
    assert(sumCopies == total)
  }

  test("gate-scale coupling: auto-derived d5/s3 parameters equal the oracle-pinned ones") {
    // the registered queries pin bandBits/cells to what the static DuckDB
    // twins replay; the auto-scaling API defaults must coincide at the
    // fixture sizes the correctness gate runs — if a regenerated fixture
    // grows past the derivation breakpoints, THIS fails instead of the
    // oracle silently diverging
    val e = graft.sources.Tables.embeddings(spark, sf)
    val n = e.count().max(1L)
    val nLabels = e.select("label").distinct().count().max(1L)
    val d5Bits = Dedup.deriveBandBits(n)
    assert(d5Bits == Dedup.EmbBandBits,
      s"d5 auto-derivation ($d5Bits bits at n=$n) left the oracle's ${Dedup.EmbBandBits}")
    val s3SubBits = Similarity.deriveSubBits(n, nLabels)
    assert(s3SubBits == 0,
      s"s3 auto-derivation (subBits=$s3SubBits at n=$n) left the oracle's per-label cells")
  }

  test("d5 banded-LSH near-dup pairs: subset of naive with high recall") {
    val naive = Dedup.embeddingNearDupPairsNaive(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.embeddingNearDupPairs(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test data should contain above-threshold pairs")
    // exact-cosine verification ⇒ no false positives, ever
    assert((banded -- naive).isEmpty, s"false positives: ${banded -- naive}")
    // recall on the isotropic corpus (pair cosines ≈0.45 ⇒ p≈0.65/bit;
    // expected 1-(1-p³)⁸ ≈ 0.92 — the floor leaves room for per-pair luck)
    val recall = (banded intersect naive).size.toDouble / naive.size
    assert(recall >= 0.6, s"banded recall = $recall (${banded.size}/${naive.size})")
  }

  test("t11 boundary binning tracks the exact-ntile baseline") {
    import graft.operators.TextAnalysis
    val approx = TextAnalysis.lengthCurriculumBuckets(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = TextAnalysis.lengthCurriculumBucketsExactNtile(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(approx.values.sum == total, "binning must partition the corpus")
    assert(approx.keySet == Set(1L, 2L, 3L, 4L))
    // bucket sizes match the equal-count baseline up to boundary ties
    approx.foreach { case (b, n) =>
      assert(math.abs(n - total / 4.0) <= total * 0.15,
        s"bucket $b size $n drifts from ${total / 4} beyond tie slack")
    }
  }

  test("IVF ANN achieves >=40% recall@5 on isotropic data (nprobe=3 of 10 cells)") {
    val bf = Similarity.annBruteForceTopK(spark, sf).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvfTopK(spark, sf).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.nonEmpty)
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.4, s"IVF recall@5 = $recall")
  }

  test("hyperplane-LSH ANN output respects the top-k contract (recall is data-dependent)") {
    val lsh = Similarity.annLshTopK(spark, sf)
    val rows = lsh.collect()
    assert(rows.nonEmpty)
    // per query: ranks are 1..m ascending with strictly descending-or-tied cos
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      val coss = sorted.map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("label-propagation clusters equal driver-side union-find on the same pairs") {
    val pairs = Dedup.minhashLshPairs(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // reference union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(d => d -> find(d)).toMap
    val got = Dedup.nearDupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("d12 indexed incremental dedup == computed d11, and rebuild is once per session") {
    val computed = Dedup.incrementalDedup(spark, sf).collect().toSeq
    val indexed = Dedup.incrementalDedupIndexed(spark, sf).collect().toSeq
    assert(indexed == computed,
      s"indexed=${indexed.size} computed=${computed.size}")
    // second invocation must reuse the session's index (probe-only) and
    // still produce identical output
    val again = Dedup.incrementalDedupIndexed(spark, sf).collect().toSeq
    assert(again == computed)
  }

  test("deduped corpus = all docs minus non-root cluster members") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val clusters = Dedup.nearDupClusters(spark, sf).collect()
    val losers = clusters.count(r => r.getLong(0) != r.getLong(1))
    assert(Dedup.dedupedCorpus(spark, sf).count() == total - losers)
  }

  test("embedding near-dup output is symmetric-free and thresholded") {
    val rows = Dedup.embeddingNearDupPairs(spark, sf, threshold = 0.3).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 - 1e-9)
    }
  }

  private def writeDocs(prefix: String, docs: Seq[(Long, String)]): String = {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d17 positional filter kills boilerplate probes before the verify join") {
    // The adversarial shape that spilled tens of GB in the first 100×
    // soak attempt: a short "stub" page S whose rare-first PREFIX is its
    // syndication header (c-block, df = 21: S + the 20 host pages),
    // because everything else S carries is an even COMMONER footer
    // (f-block, df = 31 via the chaff docs — commoner shingles sort
    // AFTER rarer ones, so the header lands in the prefix while
    // containment stays far below τ). S's prefix probes every host in
    // the candidate equi-join, but the c-windows occupy the LAST 5
    // positions of each host's own rare-first list (hosts are dominated
    // by unique content), so the positional bound min(n_s−i, n_l−j) ≤ 5
    // can never reach the required overlap ⌈0.8·15⌉ = 12 — all 20
    // probes must die in the aggregated candidate stage, BEFORE the
    // verify join ships shingle arrays. Pinned by candidate COUNT so a
    // positional-filter regression is caught here, not by a soak re-run.
    val fBlock = (0 until 10).map(i => s"foot$i")
    val cBlock = (0 until 7).map(i => s"head$i")
    val stub = (fBlock ++ cBlock).mkString(" ")
    val hosts = (0 until 20).map { k =>
      (100L + k, ((0 until 40).map(j => s"h${k}u$j") ++ cBlock).mkString(" "))
    }
    val chaff = (0 until 30).map { k =>
      (200L + k, ((0 until 30).map(j => s"x${k}u$j") ++ fBlock).mkString(" "))
    }
    val dir = writeDocs("graft_d17_positional", ((1L, stub) +: hosts) ++ chaff)
    val (verified, caches) = Dedup.containmentVerified(spark, dir, 0.8)
    val nCand = verified.count()
    caches.foreach(_.unpersist(true))
    assert(nCand == 0, s"positional filter regressed: $nCand boilerplate " +
      "probes reached the verify join (the unfiltered candidate join admits 20)")
    // and nothing here is a true pair, so the registered output is empty
    assert(Dedup.containmentPairs(spark, dir).count() == 0)
  }

  test("d2 positional filter bounds the candidate count on a boilerplate corpus") {
    // The symmetric-join twin of the d17 pin above, for the r9-ported
    // PPJoin positional bound in ngramCandidates: 40 docs of 5 unique +
    // 25 shared (boilerplate) shingles. Every pair shares the 2
    // boilerplate shingles that land in BOTH prefixes (prefix length
    // ⌊0.2·30⌋+1 = 7 covers rare-first positions 0–6; uniques fill 0–4),
    // so the pre-positional candidate join admits all C(40,2) = 780
    // pairs — but the earliest common match sits at positions (5, 5),
    // bounding the overlap by min(30−5, 30−5) = 25 < ⌈0.8/1.8·60⌉ = 27,
    // so every boilerplate pair must die in the aggregated candidate
    // stage (true jaccard is 25/35 ≈ 0.714 < τ, far from the answer).
    // Docs 500/501 are exact duplicates — the control pair whose match
    // at positions (0, 0) bounds 30 ≥ 27 and must survive. Pinned by
    // candidate COUNT so a regression of the positional filter is caught
    // here, not by a sf10 soak re-run.
    val shared = (0 until 27).map(i => s"c$i")
    val docs = (0 until 40).map { k =>
      (k + 1L, ((0 until 5).map(j => s"u${k}x$j") ++ shared).mkString(" "))
    }
    val dupText = ((0 until 5).map(j => s"dupx$j") ++ shared).mkString(" ")
    val dir = writeDocs("graft_d2_positional",
      docs ++ Seq((500L, dupText), (501L, dupText)))
    val (dsh, prefix, candidates) = Dedup.ngramCandidates(spark, dir, 0.8)
    val nCand = candidates.count()
    dsh.unpersist(true); prefix.unpersist(true)
    assert(nCand == 1, s"positional filter regressed: $nCand candidate pairs " +
      "reached the verify join (the unfiltered prefix join admits 861; only " +
      "the exact-duplicate control pair may survive)")
    val out = Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((500L, 501L, 1.0)), s"registered output: ${out.toSeq}")
  }

  test("d17 containment catches the near-subset pair Jaccard structurally misses") {
    // the dominant web-crawl duplication mode: the same 22-token article
    // syndicated inside a 62-token boilerplate wrapper. All 20 of the
    // article's trigram shingles appear verbatim in the wrapper, so
    // containment = 1.0 — while jaccard = 20/60 = 0.33 sits far below any
    // usable dedup threshold.
    val article = (0 until 22).map(i => s"art$i").mkString(" ")
    val wrapper = ((0 until 20).map(i => s"nav$i") ++
      (0 until 22).map(i => s"art$i") ++
      (0 until 20).map(i => s"foot$i")).mkString(" ")
    val dir = writeDocs("graft_d17_subset", Seq((1L, article), (2L, wrapper)))
    val cont = Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(cont == Seq((1L, 2L, 1.0)), s"containment pair lost: $cont")
    assert(Dedup.ngramJaccardPairs(spark, dir).count() == 0,
      "jaccard at 0.8 must NOT see the subset pair — that asymmetry is d17's point")
  }

  test("d17 prefix filter keeps pairs at exactly the containment boundary; == naive") {
    // A = 7 tokens -> 5 shingles; B = A's first 6 tokens + 20 boilerplate
    // tokens: shares exactly 4 of A's 5 shingles -> containment 4/5 = 0.8
    // EXACTLY, on the smaller side's prefix boundary (prefix length
    // 5 - ceil(0.8*5) + 1 = 2, and one of A's two rarest shingles must be
    // shared — exercising the epsilon inside the ceil).
    val a = (0 until 7).map(i => s"tok$i").mkString(" ")
    val b = ((0 until 6).map(i => s"tok$i") ++
      (0 until 20).map(i => s"pad$i")).mkString(" ")
    val dir = writeDocs("graft_d17_boundary", Seq((1L, a), (2L, b)))
    val got = Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.8)), s"boundary containment pair lost: $got")
    // and on the organic fixture the prefix-filtered join equals naive
    val naive = Dedup.containmentPairsNaive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fast = Dedup.containmentPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty, "fixture should contain containment pairs")
    assert(fast == naive, s"fast=${fast.size} naive=${naive.size}")
  }

  test("d18 keeps the highest-quality cluster member, d7 the mechanical min-id") {
    // three near-dups of increasing length: the corpus-quality survivor is
    // doc 3 (most tokens), the idempotency survivor (d7) is doc 1 (min id)
    val base = (0 until 50).map(i => s"w$i").mkString(" ")
    val dir = writeDocs("graft_d18_quality", Seq(
      (1L, base), (2L, base + " extra1"), (3L, base + " extra1 extra2")))
    val rows = Dedup.qualitySurvivors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((1L, 3L, 52L, 3L)),
      s"expected cluster root 1 surviving via doc 3 (52 tokens, 3 members): $rows")
    val kept = Dedup.dedupedCorpus(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), s"d7 keeps the min id: $kept")
  }

  test("d18 survivor tie-break is the smallest doc id among equal token counts") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    // 2 and 3 tie on tokens (same length); 3 differs in ONE token so the
    // pair graph still connects all three through the shared base
    val dir = writeDocs("graft_d18_tie", Seq(
      (5L, base), (6L, base + " x1"), (7L, base + " x2")))
    val rows = Dedup.qualitySurvivors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((5L, 6L, 41L, 3L)),
      s"tie at 41 tokens must resolve to the smaller id 6: $rows")
  }
}
