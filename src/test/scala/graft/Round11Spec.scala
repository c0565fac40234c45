package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.multimodal.Multimodal

/** Round-11 additions: the m16 media band-occupancy audit (d29's
  * machinery applied to m6's pigeonhole chunks) and the pinned
  * [[Multimodal.MediaExtraBitsCap]] boundary.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("m16 collision_rows is exactly the m6 band join's output volume") {
    // the closed-form Σ C(s,2) must equal what mediaBandCandidates'
    // equi-join actually emits — the invariant that makes m16 a
    // trustworthy price tag for m6 (the d29 contract, media geometry)
    val audit = Multimodal.mediaBandOccupancyAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit.map(_._1).toSeq == (0L until 8L).toSeq,
      "one row per radius-7 chunk")
    val hashes = Multimodal.perceptualHashes(spark, sf).cache()
    try {
      val emitted = Multimodal.mediaBandCandidates(hashes, 7).count()
      assert(audit.map(_._4).sum == emitted,
        s"closed form ${audit.map(_._4).sum} != emitted $emitted")
    } finally { hashes.unpersist(); () }
    val n = graft.sources.Tables.documentsParallel(spark, sf).count()
    audit.foreach { case (band, buckets, maxOcc, _) =>
      // chunk widths alternate 6/7 bits at the 52/8 boundaries
      assert(buckets <= (1L << 7) && buckets <= n, s"band $band buckets")
      assert(maxOcc >= 1L && maxOcc <= n, s"band $band occupancy")
    }
  }

  test("MediaExtraBitsCap boundary: binds first past 2^19 docs, and the layout refuses to cross it") {
    // the cap (6 = the minimum radius-7 chunk slot) leaves the derivation
    // untouched through 2^19 docs and binds from 2^19 + 1 on — the
    // boundary the m6 scaladoc names, pinned here in integers the way
    // Round10Spec pins the oracle-width coupling
    assert(Dedup.deriveExtraBandBits(1L << 19) == 6, "2^19 docs still fit")
    assert(Dedup.deriveExtraBandBits((1L << 19) + 1) == 7,
      "first doc past the capped key space")
    assert(math.min(Multimodal.MediaExtraBitsCap,
      Dedup.deriveExtraBandBits((1L << 19) + 1)) == 6,
      "the registered form caps at 6")
    // and the layout itself is a tripwire: an uncapped derivation passed
    // straight through would overlap adjacent chunks' gradient slots, so
    // mediaBandsWide refuses rather than silently losing pairs
    val hashes = spark.range(4).select(col("id").as("doc_id"),
      graft.functions.TextFunctions.hash52(col("id").cast("string")).as("phash"),
      graft.functions.TextFunctions.hash52b(col("id").cast("string")).as("ghash"))
    val e = intercept[IllegalArgumentException] {
      Multimodal.mediaBandsWide(hashes, 7, 7)
    }
    assert(e.getMessage.contains("extraBits"))
  }

  test("past the cap, band volume grows quadratically again — the priced boundary") {
    // d29's machinery over a SYNTHETIC uniform-hash corpus (hash52/hash52b
    // of the doc id — deterministic, no perceptual structure, so every
    // collision is a random tie): doubling the corpus past the cap
    // boundary must ~quadruple the closed-form band volume, because the
    // key space cannot widen further without the third-hash funding dial
    // the m6 scaladoc names. Kept at test scale (2^15 → 2^16 docs at the
    // capped width); graft.SoakDiag's m6cap section prices the real
    // 2^19/2^20 boundary corpus in the soak ledger.
    def volumeAt(n: Long): Long =
      Multimodal.mediaBandsWide(
          spark.range(n).select(col("id").as("doc_id"),
            graft.functions.TextFunctions.hash52(col("id").cast("string"))
              .as("phash"),
            graft.functions.TextFunctions.hash52b(col("id").cast("string"))
              .as("ghash")),
          7, Multimodal.MediaExtraBitsCap)
        .groupBy(col("band"), col("bkey")).count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .collect()(0).getLong(0)
    val v1 = volumeAt(1L << 15)
    val v2 = volumeAt(1L << 16)
    // expected ratio 4.0 (C(n,2) doubles twice); allow wide noise margin
    assert(v1 > 0, "uniform corpus at 2^15 must already collide")
    assert(v2 > 3 * v1 && v2 < 5 * v1,
      s"volume $v1 -> $v2 is not the ~4x of a saturated fixed-width layout")
  }
}
