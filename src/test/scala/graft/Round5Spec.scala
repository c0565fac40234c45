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
}
