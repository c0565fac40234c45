package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Round-5 operator invariants. */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("t17 source cap: contiguous ranks per source, cap honored, cut ordered by quality") {
    val rows = TextAnalysis.sourceCap(spark, sf, cap = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    val bySource = rows.groupBy(_._2)
    assert(bySource.size > 1, "cap must be exercised across several sources")
    bySource.foreach { case (src, docs) =>
      val n = docs.length.toLong
      assert(docs.map(_._4).sorted.toSeq == (1L to n).toSeq,
        s"$src: ranks are not a permutation of 1..$n")
      docs.foreach { case (_, _, _, rk, kept) =>
        assert(kept == (rk <= 10), s"$src: kept flag disagrees with rank $rk")
      }
      // the rank order IS (quality desc, doc_id asc) — the deterministic cut
      val ordered = docs.sortBy { case (id, _, q, _, _) => (-q, id) }
      assert(ordered.map(_._4).toSeq == (1L to n).toSeq,
        s"$src: rank order is not (quality desc, doc_id)")
      // no dropped document outranks a kept one on quality
      val keptMin = docs.filter(_._5).map(_._3).min
      val dropMax = docs.filterNot(_._5).map(_._3).maxOption.getOrElse(Double.MinValue)
      assert(dropMax <= keptMin, s"$src: kept/dropped quality inversion")
      assert(docs.count(_._5) == math.min(10L, n), s"$src: kept count")
    }
  }

  test("d13 incremental embedding dedup equals the cross-parity slice of d5's pairs") {
    import graft.operators.Dedup
    val d13 = Dedup.incrementalEmbeddingDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // d5 with the same oracle-pinned banding; its (id_a < id_b) pairs with
    // opposite parity, re-keyed as (odd batch, even corpus)
    val d5cross = Dedup.embeddingNearDupPairs(spark, sf,
        bands = Dedup.EmbBands, bandBits = Dedup.EmbBandBits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, c) => (if (a % 2 != 0) (a, b) else (b, a)) -> c }
      .toMap
    assert(d13 == d5cross,
      s"d13=${d13.size} d5cross=${d5cross.size} " +
        s"onlyD13=${(d13.keySet -- d5cross.keySet).take(3)} " +
        s"onlyD5=${(d5cross.keySet -- d13.keySet).take(3)}")
    assert(d13.nonEmpty, "planted embedding near-dups should cross the parity split")
  }
}
