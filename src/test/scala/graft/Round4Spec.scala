package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-4 additions: pointer-jump connected components, AsOfJoin SQL
  * metrics, codec seam, dialect rendering matrix.
  */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("connected components: diameter-1000 chain converges in O(log n) rounds") {
    // a path graph 0-1-2-…-1000: pure one-hop min-label propagation needs
    // ~1000 rounds (the r3 verdict's pathological high-diameter component);
    // the pointer-jump fallback must close it within jumpAfter + ~log₂(1000)
    // + slack rounds — maxIters=25 would be a hard failure without the jump
    val pairs = spark.range(1000)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cc = Dedup.connectedComponents(pairs, maxIters = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length == 1001, s"every chain node labeled: ${cc.length}")
    assert(cc.forall(_._2 == 0L), "single component rooted at node 0")
  }

  test("connected components: pointer-jump result equals pure propagation on a multi-component graph") {
    // components: {0..5} (star), {10,11}, {20} appears only via self-pair?
    // no self-pairs — {20,21}; plus a 12-node path 30..41 that crosses the
    // jump threshold under a tight round budget
    val edges: Seq[(Long, Long)] =
      Seq((0L, 1L), (0L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L)) ++
        (30L until 41L).map(i => (i, i + 1))
    import spark.implicits._
    val pairs = edges.toDF("id_a", "id_b")
    val jumped = Dedup.connectedComponents(pairs, maxIters = 30, jumpAfter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Dedup.connectedComponents(pairs, maxIters = 100, jumpAfter = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(jumped == plain, s"jump fallback changed the clustering")
    assert(jumped(5L) == 0L && jumped(11L) == 10L && jumped(21L) == 20L &&
      jumped(41L) == 30L)
  }
}
