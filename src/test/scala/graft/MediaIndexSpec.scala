package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.LiveIndexPointer

/** The persisted media band index family (m18/m19, r13): the unified
  * band layout's tier equality, probe parity with the fresh twin and the
  * brute-force cross join at every escalation tier, the frozen-width
  * append, the live-vs-registered drift audit coupling, the genuine
  * width-drift verdict flip on a planted oversize corpus, and the
  * blue/green rotate lifecycle.
  */
class MediaIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("batch_id"), col("corpus_id"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bandSet(df: DataFrame): Set[(Long, Int, Long)] =
    df.select(col("doc_id"), col("band"), col("bkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  /** Brute-force batch(odd)×corpus(even) pairs at combined width `e` —
    * the banded probe's ground truth (pigeonhole recall is exact, so the
    * sets must be EQUAL, not merely superset).
    */
  private def bruteCrossAt(e: Int): Set[(Long, Long, Long)] = {
    val h = Multimodal.perceptualHashesWide2(spark, sf).cache()
    val b = h.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id").as("batch_id"), col("phash").as("ha"),
        col("ghash").as("ga"), col("chash").as("ca"))
    val c = h.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("corpus_id"), col("phash").as("hb"),
        col("ghash").as("gb"), col("chash").as("cb"))
    val out = pairSet(b.crossJoin(c)
      .withColumn("hamming", Multimodal.combinedHammingAt(7, e))
      .filter(col("hamming") <= 7))
    h.unpersist()
    out
  }

  test("mediaBandsAll spans all three escalation tiers bit-for-bit") {
    val h = Multimodal.perceptualHashesWide2(spark, sf).cache()
    assert(bandSet(Multimodal.mediaBandsAll(h, 7, 0)) ==
      bandSet(Multimodal.mediaBands(h, 7)),
      "extra = 0 must reproduce the narrow m5/m6 layout")
    assert(bandSet(Multimodal.mediaBandsAll(h, 7, 3)) ==
      bandSet(Multimodal.mediaBandsWide(h, 7, 3)),
      "the gradient tier must reproduce mediaBandsWide")
    assert(bandSet(Multimodal.mediaBandsAll(h, 7, 8)) ==
      bandSet(Multimodal.mediaBandsWide2(h, 7, 8)),
      "the curvature tier must reproduce mediaBandsWide2")
    h.unpersist()
  }

  test("m18 probe equals the fresh twin and the brute-force cross join " +
    "at the gate width; the registered wrapper is deterministic") {
    Multimodal.persistMediaIndex(spark, sf, "mt_even")
    val probe = pairSet(Multimodal.incrementalMediaFromIndex(spark, sf, "mt_even"))
    assert(probe == pairSet(Multimodal.incrementalMediaFresh(spark, sf)),
      "index probe and fresh recompute must agree")
    assert(probe == bruteCrossAt(0),
      "banded retrieval must equal the brute-force cross join (pigeonhole)")
    // radius-7 twins are rare in the gate corpus (the registered m18
    // self-probes for that reason); nonvacuous retrieval is pinned on the
    // planted fixture below
  }

  test("forced-wide probes equal the brute-force cross join at each tier " +
    "(pigeonhole recall survives the widened keys; masks verify exactly)") {
    for (e <- Seq(3, 8)) {
      Multimodal.persistMediaIndex(spark, sf, s"mt_w$e",
        forceExtraBits = Some(e))
      assert(pairSet(Multimodal.incrementalMediaFromIndex(spark, sf, s"mt_w$e"))
        == bruteCrossAt(e), s"tier extra=$e")
    }
  }

  test("append adopts the frozen width: stored rows equal a same-width " +
    "build over the union; re-appending an indexed doc is refused") {
    Multimodal.persistMediaIndex(spark, sf, "mt_app",
      corpusFilter = col("doc_id") % 3 === 0, forceExtraBits = Some(2))
    Multimodal.appendToMediaIndex(spark, sf, col("doc_id") % 3 === 1, "mt_app")
    intercept[IllegalArgumentException] {
      Multimodal.appendToMediaIndex(spark, sf, col("doc_id") % 3 === 1, "mt_app")
    }
    Multimodal.persistMediaIndex(spark, sf, "mt_ref",
      corpusFilter = col("doc_id") % 3 =!= 2, forceExtraBits = Some(2))
    def stored(t: String) = spark.table(t)
      .select(col("doc_id"), col("band"), col("bkey"),
        col("phash"), col("ghash"), col("chash"))
      .collect().map(_.toSeq).toSet
    assert(stored("mt_app_mband") == stored("mt_ref_mband"),
      "appended rows must be indistinguishable from built rows")
    assert(pairSet(Multimodal.incrementalMediaFromIndex(spark, sf, "mt_app",
        batchFilter = col("doc_id") % 3 === 2)) ==
      pairSet(Multimodal.incrementalMediaFromIndex(spark, sf, "mt_ref",
        batchFilter = col("doc_id") % 3 === 2)))
  }

  test("live drift audit prices the STORED keys and equals the " +
    "registered closed form on a full-corpus index") {
    Multimodal.persistMediaIndex(spark, sf, "mt_full",
      corpusFilter = lit(true))
    val live = Multimodal.mediaIndexDriftAuditLive(spark, "mt_full")
      .collect()(0).toSeq
    val closed = Multimodal.mediaIndexDriftAudit(spark, sf,
      buildFilter = lit(true)).collect()(0).toSeq
    assert(live == closed,
      s"stored-key pricing must equal the recomputed closed form: $live vs $closed")
    assert(live(2) == 1.0 && live(3) == 0L,
      "an unappended full-corpus index has no drift")
  }

  test("planted width drift: a narrow-frozen index over an oversize " +
    "corpus flips the verdict arithmetic and rotates to ratio 1.0") {
    // a corpus past the 8192-doc derive boundary, built frozen at the
    // narrow width it would have derived when small — the staleness m19
    // exists for. 9000 synthetic docs; fresh derivation gives extra = 1.
    // ids ≡ 0 and ≡ 1 (mod 100) share a payload, planting one exact twin
    // per centuria so retrieval is nonvacuous at the radius.
    val dir = java.nio.file.Files.createTempDirectory("graft_mdrift").toString
    val eff = "(CASE WHEN id % 100 < 2 THEN id - id % 100 ELSE id END)"
    val textExpr = s"repeat(concat('media payload ', CAST($eff AS STRING), " +
      s"' '), CAST($eff % 7 + 3 AS INT))"
    spark.range(9000).selectExpr(
      "id AS doc_id", s"$textExpr AS text",
      "'en' AS lang", "'syn' AS source",
      s"CAST(length($textExpr) AS BIGINT) AS n_chars")
      .coalesce(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Multimodal.persistMediaIndex(spark, dir, "media_drift_blue",
      corpusFilter = lit(true), forceExtraBits = Some(0))
    Multimodal.flipMediaIndex(spark, "media_drift_blue", "media_drift")
    val audit = Multimodal.mediaIndexDriftAuditLive(spark, "media_drift_blue")
      .collect()(0)
    val frozen = audit.getLong(0); val fresh = audit.getLong(1)
    val ratio = audit.getDouble(2)
    assert(frozen > fresh,
      "one extra derived bit must split frozen buckets: " +
        s"frozen=$frozen fresh=$fresh")
    assert(ratio == math.round(frozen.toDouble / fresh * 10000) / 10000.0)
    assert(audit.getLong(3) == (if (ratio >= Multimodal.MediaDriftRebuildRatio) 1L else 0L),
      "the verdict must bind at the published threshold")
    // rotate at a ratio the measured drift clears; the pairs a probe
    // serves refine per the new width's combined signature, and the
    // post-rotate audit must read no drift at all
    assert(Multimodal.rotateMediaIndex(spark, "media_drift",
      rebuildRatio = math.min(ratio - 0.0001, Multimodal.MediaDriftRebuildRatio)))
    val after = LiveIndexPointer.current(spark, "media_drift").get
    assert(after == "media_drift_green", s"pointer must flip, got $after")
    val cfg = spark.table("media_drift_green_mcfg").collect()(0)
    assert(cfg.getAs[Long]("extra_bits") == 1L,
      "the rebuild must adopt the freshly derived width")
    val post = Multimodal.mediaIndexDriftAuditLive(spark, "media_drift_green")
      .collect()(0)
    assert(post.getDouble(2) == 1.0 && post.getLong(3) == 0L)
    // the live pointer serves the rebuilt (green) index, and the planted
    // twins make the retrieval nonvacuous: every ≡0 (mod 100) doc finds
    // its ≡1 twin at hamming 0
    val served = pairSet(Multimodal.incrementalMediaLive(spark, dir,
      "media_drift", batchFilter = col("doc_id") % 100 === 0))
    assert(served == pairSet(Multimodal.mediaProbeOf(spark, "media_drift_green",
      Multimodal.perceptualHashesWide2(spark, dir)
        .filter(col("doc_id") % 100 === 0))))
    assert((0 until 9000 by 100).map(g => (g.toLong, g + 1L, 0L)).toSet
      .subsetOf(served), "every planted twin must be retrieved")
    Multimodal.unlinkMediaPointer(spark, "media_drift")
  }

  test("rotate below threshold is a no-op: pointer, tables, and served " +
    "pairs untouched") {
    Multimodal.persistMediaIndex(spark, sf, "media_live_blue")
    Multimodal.flipMediaIndex(spark, "media_live_blue", "media_live")
    val before = pairSet(Multimodal.incrementalMediaLive(spark, sf, "media_live"))
    assert(!Multimodal.rotateMediaIndex(spark, "media_live"),
      "an undrifted index must not rotate at the published threshold")
    assert(LiveIndexPointer.current(spark, "media_live").get == "media_live_blue")
    assert(pairSet(Multimodal.incrementalMediaLive(spark, sf, "media_live")) == before)
    Multimodal.unlinkMediaPointer(spark, "media_live")
  }
}
