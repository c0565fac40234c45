package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 changes: d21's window hash became the codegen'd rolling
  * combination of per-token hashes (WindowHashes — O(L) per doc instead
  * of O(L·n) string bytes), m12 registered the REAL GIF pixel-frame
  * sampler with a closed-form oracle, and spendDeciles derives its
  * sketch accuracy from the customer count (ADVICE r7).
  */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("WindowHashes equals the direct per-window polynomial, and empty below n") {
    import graft.expressions.{RollingHash, WindowHashes}
    val rnd = new scala.util.Random(8)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(6)
      val L = rnd.nextInt(20)
      val th = Array.fill(L)(rnd.nextLong())
      val got = WindowHashes.hashes(th, n)
      if (L < n) assert(got.isEmpty, s"trial $trial: L=$L < n=$n must be empty")
      else {
        assert(got.length == L - n + 1)
        for (i <- got.indices) {
          // direct Horner evaluation of window i — the definition
          var h = 0L
          for (j <- 0 until n)
            h = RollingHash.addmod(RollingHash.mulmod(h, RollingHash.Base),
              java.lang.Long.remainderUnsigned(th(i + j), RollingHash.Mod))
          assert(got(i) == h, s"trial $trial window $i")
        }
      }
    }
  }

  test("WindowHashes: equal token windows collide, single-token swaps don't") {
    import graft.expressions.WindowHashes
    // two "documents" sharing a 5-token run at different positions
    val shared = Array(11L, 22L, 33L, 44L, 55L)
    val a = Array(1L, 2L) ++ shared ++ Array(9L)
    val b = Array(7L) ++ shared
    val ha = WindowHashes.hashes(a, 5)
    val hb = WindowHashes.hashes(b, 5)
    assert(ha(2) == hb(1), "the shared window must hash identically at any offset")
    // windows overlapping the shared run only partially must differ
    assert(ha.count(hb.contains) == 1, s"exactly one shared window: ${ha.toSeq} vs ${hb.toSeq}")
  }

  test("d21 rolling spelling matches the r7 string spelling row-for-row") {
    import graft.operators.Dedup
    val n = Dedup.SpanWindowTokens
    // the retired r7 spelling, inlined as the independent witness
    val d = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("wins"))
      .select(col("doc_id"), posexplode(col("wins")).as(Seq("pos", "s")))
    val owners = d.groupBy(col("s"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val oldShared = d.join(owners, "s")
      .filter(col("mn") < col("doc_id") || col("mx") > col("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.longestSharedSpan(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.filter(_._2 > 0L) == oldShared.filter(_._2 > 0L),
      "shared-window counts must be invariant under the hash spelling change")
  }

  test("m12 fixtures: the real GIF decode matches the closed-form frame math") {
    import graft.multimodal.Multimodal
    val media = Multimodal.syntheticGifMedia(spark, sf)
    val out = Multimodal.pixelFrameSamples(media, Multimodal.PixelStride)
      .collect().groupBy(_.doc_id)
    assert(out.nonEmpty)
    out.foreach { case (d, frames) =>
      val nFrames = (2 + d % 7).toInt
      val wantIdx = (0 until nFrames by Multimodal.PixelStride).toSet
      assert(frames.map(_.frame_idx).toSet == wantIdx, s"doc $d stride fan-out")
      frames.foreach { f =>
        val s = (1 + (d * 5 + f.frame_idx * 3) % Multimodal.PixelSplitMod).toInt
        assert((f.width, f.height) == ((Multimodal.PixelW, Multimodal.PixelH)))
        val wantMean = (s * Multimodal.PixelDark.toDouble +
          (Multimodal.PixelH - s) * Multimodal.PixelBright.toDouble) / Multimodal.PixelH
        assert(math.abs(f.mean_lum - wantMean) < 1e-9,
          s"doc $d frame ${f.frame_idx}: mean ${f.mean_lum} != $wantMean")
        assert(f.frame_phash == (1L << 52) - (1L << (2 * s)),
          s"doc $d frame ${f.frame_idx}: phash split=$s")
      }
    }
  }

  test("spendDeciles boundaries stay exact rank-ceil with the derived accuracy") {
    import graft.operators.Extended
    val got = Extended.spendDeciles(spark, sf).collect()
    val b = Extended.DecileBuckets
    // tie-safe witness: the exact rank-ceil boundaries computed directly
    // from per-customer spend, bucket assignment strict > like the op
    val spends = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
      .collect().map(_.getDouble(1)).sorted
    val n = spends.length
    val boundVals = (1 until b).map(i => spends(math.ceil(n.toDouble * i / b).toInt - 1))
    val wantPerBucket = spends.groupBy(s => boundVals.count(s > _).toLong)
      .view.mapValues(_.length.toLong).toMap
    val perBucket = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perBucket == wantPerBucket,
      s"derived-accuracy sketch must reproduce exact rank-ceil buckets: $perBucket vs $wantPerBucket")
    // Lorenz invariants: shares sum to ~1, cum_share monotone
    val cum = got.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
    assert(math.abs(cum.last - 1.0) < 1e-4)
  }
}
