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

  test("t15 chunking: windows tile every document with the declared overlap") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    val (size, stride) = (32, 24)
    val chunks = TextAnalysis.chunkDocuments(spark, sf, size, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    val nToks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == nToks.keySet, "every document chunked")
    chunks.foreach { case (id, cs) =>
      val n = nToks(id)
      val sorted = cs.sortBy(_._2)
      // chunk indexes are dense 0..m with the documented count
      val expected = math.max(math.ceil((n - size).toDouble / stride).toLong, 0L) + 1
      assert(sorted.map(_._2).toSeq == (0L until expected), s"doc $id index gap")
      // every chunk is full except possibly the last; windows tile to the
      // last token (start of last chunk + its length == n)
      sorted.dropRight(1).foreach { case (_, _, len) => assert(len == size) }
      val (_, lastIdx, lastLen) = sorted.last
      assert(lastIdx * stride + lastLen == n, s"doc $id not tiled to the end")
    }
    assert(chunks.values.exists(_.length > 1), "fixture must exercise real fan-out")
  }

  test("t16 packing: bins partition each source's docs in order, full bins reach the budget") {
    import graft.operators.TextAnalysis
    val budget = 512
    val bins = TextAnalysis.sequencePackingPlan(spark, sf, budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySource = bins.groupBy(_._1)
    val docs = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDoc = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    // fixture precondition for the density/fill bounds below: one document
    // never spans a whole bin
    assert(maxDoc < budget, s"fixture docs ($maxDoc tokens) exceed the bin budget")
    assert(bySource.keySet == docs.keySet)
    bySource.foreach { case (src, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length), s"$src bin gap")
      assert(sorted.map(_._3).sum == docs(src), s"$src docs not partitioned")
      // contiguous fill: an interior bin closes when the cumulative count
      // crosses its boundary, so it is full up to one straddling document
      sorted.dropRight(1).foreach { case (_, b, _, toks) =>
        assert(toks >= budget - maxDoc, s"$src bin $b underfull: $toks")
      }
    }
    assert(bySource.values.exists(_.length > 1), "fixture must produce multiple bins")
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
