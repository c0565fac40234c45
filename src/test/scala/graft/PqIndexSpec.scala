package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** The persisted PQ index family (s18/s19, r13): probe parity with s6,
  * the codes round-trip, the frozen-codec append, the live-vs-registered
  * drift audit coupling, the distribution-vs-sampling drift contrast the
  * s19 scaladoc claims, and the blue/green rotate lifecycle.
  */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq

  test("codes round-trip: reconstruct-from-stored-codes equals the " +
    "direct encode for every vector") {
    val raw = Tables.embeddings(spark, sf)
    val cb = Similarity.pqCodebook(raw, 8, 4)
    def rvMap(df: DataFrame) = df.select("vec_id", "rv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val direct = rvMap(Similarity.pqEncode(raw, cb, 8))
    val viaCodes = rvMap(Similarity.pqReconFromCodes(
      Similarity.pqEncodeCodes(
        raw.select(col("vec_id"), col("embedding")), cb, 8)
        .select(col("vec_id"), col("codes")),
      cb, 8))
    assert(viaCodes == direct,
      "the stored code must name exactly the argmin entry the direct " +
        "encode reconstructs through")
  }

  test("s18 persisted probe equals s6 verbatim; append adopts the " +
    "frozen codec; re-appending an indexed id is refused") {
    Similarity.persistPqIndex(spark, sf, "pqt_full")
    assert(rows(Similarity.annPqFromIndex(spark, sf, "pqt_full")) ==
      rows(Similarity.annPqTopK(spark, sf)))
    // a drifted index: built over the even half, odd half appended under
    // the STORED codebook and bucket bits
    Similarity.persistPqIndex(spark, sf, "pqt_half",
      corpusFilter = col("vec_id") % 2 === 0)
    Similarity.appendToPqIndex(spark, sf, col("vec_id") % 2 =!= 0,
      "pqt_half")
    intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(spark, sf, col("vec_id") % 2 =!= 0,
        "pqt_half")
    }
    // append parity: stored (codes, bucket) == every corpus vector
    // encoded/hashed from scratch under the stored (frozen) codec
    val storedCb = Similarity.pqCbArrOf(
      spark.table("pqt_half_pcb").select(col("sub"), col("bkt"), col("cv")))
    val bits = spark.table("pqt_half_pcb")
      .agg(max(col("lsh_bits"))).collect()(0).getInt(0)
    def codeMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getLong(2))).toMap
    val stored = codeMap(spark.table("pqt_half_pcode")
      .select(col("vec_id"), col("codes"), col("bucket")))
    val expected = codeMap(Similarity.pqEncodeCodes(
      Tables.embeddings(spark, sf).select(col("vec_id"),
        expr(graft.functions.VectorFunctions
          .hyperplaneBucketSql("embedding", 64, bits)).as("bucket"),
        col("embedding")),
      storedCb, 8)
      .select(col("vec_id"), col("codes"), col("bucket")))
    assert(stored == expected)
    Seq("pqt_full", "pqt_half").foreach(Similarity.dropPqTables(spark, _))
  }

  test("the live audit equals the registered closed form; every " +
    "plantable natural staleness stays inside the measured wobble band") {
    // the index realizes s19's frozen hypothesis: built over label < 5,
    // the rest appended under the stored codebook
    Similarity.persistPqIndex(spark, sf, "pqt_drift",
      corpusFilter = col("label") < 5)
    Similarity.appendToPqIndex(spark, sf, col("label") >= 5, "pqt_drift")
    val live = Similarity.pqIndexDriftAudit(spark, "pqt_drift")
      .collect()(0)
    val reg = Similarity.pqDriftAudit(spark, sf).collect()(0)
    assert(live.getAs[Long]("frozen_distortion_u6") ==
      reg.getAs[Long]("frozen_distortion_u6"),
      s"live $live vs registered $reg — the stored code must lose " +
        "exactly what the argmin loses under the same codebook")
    assert(live.getAs[Long]("fresh_distortion_u6") ==
      reg.getAs[Long]("fresh_distortion_u6"))
    assert(live.getAs[Double]("drift_ratio") ==
      reg.getAs[Double]("drift_ratio"))
    // the honest registered regime (the s19/PqDriftRebuildRatio
    // scaladocs' measured claim): the STRONGEST staleness this corpus
    // can plant — a codebook trained before half the sources existed —
    // moves distortion less than 3% in either direction (sub-1.0 is
    // legal: one-Lloyd-step sign-seeded codebooks are not optimal), a
    // GENUINE near-miss (the totals differ), and no rebuild fires
    assert(reg.getAs[Long]("frozen_distortion_u6") !=
      reg.getAs[Long]("fresh_distortion_u6"),
      "the band pin is vacuous if the two codebooks price identically")
    assert(reg.getAs[Double]("drift_ratio") > 0.97 &&
      reg.getAs[Double]("drift_ratio") < 1.03,
      s"label-skew ratio ${reg.getAs[Double]("drift_ratio")} left the " +
        "measured wobble band — the threshold derivation needs re-basing")
    assert(reg.getAs[Long]("rebuild_recommended") == 0L)
    val sampled = Similarity.pqDriftAudit(spark, sf,
      buildFilter = col("vec_id") % 2 === 0).collect()(0)
    assert(sampled.getAs[Double]("drift_ratio") > 0.97 &&
      sampled.getAs[Double]("drift_ratio") < 1.03)
    assert(sampled.getAs[Long]("rebuild_recommended") == 0L,
      "a random-half build must not trigger a rebuild")
    // ...and even sub-band drift moves the CODES — the mechanism by
    // which a stale codebook would move coarse scores → recall
    val raw = Tables.embeddings(spark, sf)
    val frozenCodes = Similarity.pqEncodeCodes(
      raw.select(col("vec_id"), col("embedding")),
      Similarity.pqCodebook(raw.filter(col("label") < 5), 8, 4), 8)
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val freshCodes = Similarity.pqEncodeCodes(
      raw.select(col("vec_id"), col("embedding")),
      Similarity.pqCodebook(raw, 8, 4), 8)
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(frozenCodes != freshCodes,
      "frozen and fresh codebooks must code some vector differently at " +
        "gate scale, or the drift fixture is vacuous")
    Similarity.dropPqTables(spark, "pqt_drift")
  }

  test("the verdict boundary is real: a planted distribution shift — " +
    "new mass far from every frozen entry — flips rebuild_recommended") {
    import spark.implicits._
    // half A: deterministic small vectors; half B: A shifted +10 in
    // every dimension (the embedding-model-bump regime the s19 scaladoc
    // names — no frozen entry is anywhere near B)
    def vec(id: Long, shift: Float): Array[Float] =
      Array.tabulate(64)(d =>
        (((id * 31 + d * 7) % 13).toFloat - 6.0f) / 6.0f + shift)
    val a = (0L until 64L).map(i => (i, vec(i, 0.0f)))
    val b = (64L until 128L).map(i => (i, vec(i, 10.0f)))
    val full = (a ++ b).toDF("vec_id", "embedding")
    val frozenCb = Similarity.pqCodebook(a.toDF("vec_id", "embedding"), 8, 4)
    val freshCb = Similarity.pqCodebook(full, 8, 4)
    val row = Similarity.pqPolicyRow(
      Similarity.pqDistortionU6(full, frozenCb, 8),
      Similarity.pqDistortionU6(full, freshCb, 8)).collect()(0)
    assert(row.getAs[Double]("drift_ratio") >=
      Similarity.PqDriftRebuildRatio,
      s"planted shift measured ${row.getAs[Double]("drift_ratio")} — " +
        "must clear the threshold or the policy can never fire")
    assert(row.getAs[Long]("rebuild_recommended") == 1L)
    // degenerate floor: a corpus the codec represents exactly (all
    // vectors identical) prices 0 under both codebooks → ratio floors
    // at 1.0, no rebuild — never a divide-by-zero
    val const = (0L until 16L).map(i => (i, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val constRow = Similarity.pqPolicyRow(
      Similarity.pqDistortionU6(const, Similarity.pqCodebook(const, 8, 4), 8),
      Similarity.pqDistortionU6(const, Similarity.pqCodebook(const, 8, 4), 8))
      .collect()(0)
    assert(constRow.getAs[Long]("frozen_distortion_u6") == 0L)
    assert(constRow.getAs[Double]("drift_ratio") == 1.0)
    assert(constRow.getAs[Long]("rebuild_recommended") == 0L)
  }

  test("s20 vector sanity: the severity ladder counts each corruption " +
    "class exactly once and norms cover only the clean survivors") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    // one row per ladder rung + clean survivors with known norms:
    // 0.125²·64 = 1.0 exactly (the near-unit pin), 0.2f → 1.6, 0.3f → 2.4
    val rows = Seq(
      Row(1L, null),
      Row(2L, Seq.fill(32)(0.1f)),
      Row(3L, Seq.fill[Any](63)(0.1f) :+ null),
      Row(4L, Seq.fill(63)(0.1f) :+ Float.NaN),
      Row(5L, Seq.fill(63)(0.1f) :+ Float.PositiveInfinity),
      Row(6L, Seq.fill(64)(0.0f)),
      Row(7L, Seq.fill(64)(0.125f)),
      Row(8L, Seq.fill(64)(0.2f)),
      Row(9L, Seq.fill(64)(0.3f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val r = Similarity.vectorSanityOf(df).collect()(0)
    assert(r.getAs[Long]("n_vectors") == 9L)
    assert(r.getAs[Long]("n_null_vec") == 1L)
    assert(r.getAs[Long]("n_wrong_dim") == 1L)
    assert(r.getAs[Long]("n_null_entries") == 1L)
    assert(r.getAs[Long]("n_nonfinite") == 2L,
      "NaN and +Inf must both land on the non-finite rung")
    assert(r.getAs[Long]("n_clean") == 4L,
      "the ladder must partition: 9 = 1+1+1+2+4")
    assert(r.getAs[Long]("n_zero_norm") == 1L)
    assert(r.getAs[Long]("n_near_unit") == 1L)
    assert(r.getAs[Double]("min_norm") == 0.0)
    assert(r.getAs[Double]("max_norm") == 2.4)
    assert(r.getAs[Double]("avg_norm") == 1.25,
      s"avg over clean survivors (0 + 1 + 1.6 + 2.4)/4: $r")
  }

  test("PQ blue/green rotate: pointer cutover, post-rotate probe IS s6, " +
    "post-rotate ratio exactly 1.0, idle-color residue heals") {
    val alias = "pqt_live"
    val blue = s"${alias}_blue"
    val green = s"${alias}_green"
    Similarity.unlinkPqPointer(spark, alias)
    intercept[IllegalStateException] {
      Similarity.annPqLive(spark, sf, alias)
    }
    Similarity.persistPqIndex(spark, sf, blue,
      corpusFilter = col("label") < 5)
    Similarity.flipPqIndex(spark, blue, alias)
    Similarity.appendToPqIndex(spark, sf, col("label") >= 5, blue)
    // the live probe resolves the pointer to the drifted blue index
    assert(rows(Similarity.annPqLive(spark, sf, alias)) ==
      rows(Similarity.annPqFromIndex(spark, sf, blue)))
    // forced rotate (ratio floor 0): rebuild into green, flip, retire
    assert(Similarity.rotatePqIndex(spark, alias, rebuildRatio = 0.0))
    assert(!spark.catalog.tableExists(s"${blue}_pcode"),
      "the old color must be retired after the flip")
    // post-rotate the codec is fresh over the full corpus, so the live
    // probe IS s6 and the audit reads exactly 1.0
    assert(rows(Similarity.annPqLive(spark, sf, alias)) ==
      rows(Similarity.annPqTopK(spark, sf)))
    val post = Similarity.pqIndexDriftAudit(spark, green).collect()(0)
    assert(post.getAs[Double]("drift_ratio") == 1.0)
    assert(post.getAs[Long]("rebuild_recommended") == 0L)
    // crash between rebuild and flip: complete-but-unreferenced idle
    // color; the next rotate heals it even when it declines to act
    Similarity.rebuildPqIndexTo(spark, green, blue)
    assert(!Similarity.rotatePqIndex(spark, alias, rebuildRatio = 1.01))
    assert(!spark.catalog.tableExists(s"${blue}_pcode"),
      "idle-color residue must be healed by the next rotate")
    Similarity.dropPqTables(spark, green)
    Similarity.unlinkPqPointer(spark, alias)
  }
}
