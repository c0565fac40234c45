package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 registrations: s1 became multi-index candidate-driven (the
  * r6 verdict's last corpus×queries plan left the graded registry — the
  * brute-force scan survives only as the unregistered exact-recall
  * baseline, the same demotion s5/s6's full scans got in r6), and s9's
  * radius filter moved onto the 4dp-rounded cosine so the boundary is
  * pinned across engines.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("s1 multi-index: candidate-bounded, exact scores, recall dominates both indexes") {
    import graft.operators.Similarity
    graft.expressions.VectorExpressions.register(spark)
    val raw = graft.sources.Tables.embeddings(spark, sf)
    val lsh = Similarity.lshCandidates(raw).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCandidates(raw, autoCells = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = Similarity.annMultiIndexTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bf = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s1.nonEmpty)
    // every returned neighbor came from one of the two generators — the
    // exact rerank never saw a non-candidate row
    val union = lsh ++ ivf
    val escaped = s1.filterNot(g => union((g._1, g._2)))
    assert(escaped.isEmpty, s"non-candidate results: ${escaped.take(3)}")
    // ranks contiguous from 1, scores non-increasing per query
    s1.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
    // scoring is EXACT: any (query, neighbor) the brute force also ranked
    // carries the identical 4dp cosine
    val exact = bf.map(r => (r._1, r._2) -> r._4).toMap
    s1.foreach { case (q, n, _, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9, s"($q,$n) cos"))
    }
    // the union's recall vs the exact baseline dominates EACH index
    // alone — the point of multi-index retrieval. s2 = exact top-k over
    // the LSH candidates, so comparing candidate-set coverage of the true
    // top-k pairs compares the indexes directly.
    val truth = bf.map(r => (r._1, r._2)).toSet
    val lshRecall = truth.count(lsh).toDouble / truth.size
    val ivfRecall = truth.count(ivf).toDouble / truth.size
    val s1Recall = truth.count { p => s1.exists(g => (g._1, g._2) == p) }
      .toDouble / truth.size
    assert(s1Recall >= lshRecall - 1e-12 && s1Recall >= ivfRecall - 1e-12,
      s"union recall $s1Recall must dominate lsh=$lshRecall ivf=$ivfRecall")
    // gate-scale absolute floor: 500 vectors spread 256 LSH buckets thin
    // and probe 3 of 10 IVF label cells — the per-index profile measures
    // ~0.46 here (the registered s3's documented recall); the union can't
    // be worse, and at soak scales the derivations widen both indexes
    assert(s1Recall >= 0.4, s"multi-index recall unexpectedly low: $s1Recall")
  }

  test("s1 multi-index: a neighbor found by both indexes scores once (the distinct)") {
    import graft.operators.Similarity
    val s1 = Similarity.annMultiIndexTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.distinct.length == s1.length,
      "duplicate (query, neighbor) rows — the candidate union must dedupe")
  }

  test("s9 radius filter binds on the ROUNDED cosine (the cross-engine boundary pin)") {
    import graft.operators.Similarity
    val got = Similarity.annRadiusSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, c) =>
      assert(c >= Similarity.RadiusDefault, s"($q,$n) cos $c below radius")
      // 4dp-rounded: scaled value is integral (what makes >= radius a
      // deterministic comparison on both engines)
      assert(math.abs(c * 10000 - math.rint(c * 10000)) < 1e-6,
        s"($q,$n) cos $c not 4dp-rounded")
    }
  }
}
