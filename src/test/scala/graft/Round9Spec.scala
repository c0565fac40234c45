package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: the batch-16 operators (t33 quality sweep, d25
  * cluster sizes, q58 SCD2 intervals, m14 level crossings) and the
  * filter-before-distinct reorder of the d9/m6 band verifies.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("q58 reconstructs SCD2 episodes from a planted change stream") {
    val spark2 = spark
    import spark2.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    // user 1: view, view (repeat collapses), click, view; user 2: one state
    val rows = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(5), 1L, "view"),
      (3L, ts(10), 1L, "click"), (4L, ts(20), 1L, "view"),
      (5L, ts(0), 2L, "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q58").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Extended.scd2Intervals(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "view", ts(0), Some(ts(10)), false),
      (1L, "click", ts(10), Some(ts(20)), false),
      (1L, "view", ts(20), None, true),
      (2L, "purchase", ts(0), None, true)), s"intervals: ${got.toSeq}")
  }

  test("q58 intervals tile each user's timeline: contiguous, alternating, one open") {
    val rows = graft.operators.Extended.scd2Intervals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, eps) =>
      // scd2Intervals emits per-user episodes ordered by valid_from
      val sorted = eps.sortBy(_._3.getTime)
      // exactly one open (current) interval, and it is the last
      assert(sorted.count(_._5) == 1 && sorted.last._5, s"user $uid open-interval")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $uid gap: ${a._4} -> ${b._3}")
          assert(a._2 != b._2, s"user $uid consecutive episodes share state ${a._2}")
        case _ =>
      }
    }
  }

  test("t33 grid is monotone and consistent with the t1 score distribution") {
    val sweep = graft.operators.TextAnalysis.qualityThresholdSweep(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq ==
      graft.operators.TextAnalysis.QualitySweep, "one row per grid value, ordered")
    // raising the cut can only shrink the surviving corpus
    sweep.sliding(2).foreach { case Array((t1v, d1, k1), (t2v, d2, k2)) =>
      assert(d1 >= d2 && k1 >= k2, s"not monotone at $t1v -> $t2v")
    }
    // each grid row equals a direct recount at that threshold
    val stats = graft.operators.TextAnalysis.textStats(spark, sf)
      .select(col("quality_score"), col("n_tokens")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    sweep.foreach { case (t, nd, nt) =>
      val kept = stats.filter(_._1 >= t)
      assert(nd == kept.length && nt == kept.map(_._2).sum, s"recount at $t")
    }
  }

  test("d25 sizes partition d6's cluster membership exactly") {
    val clusters = graft.operators.Dedup.nearDupClusters(spark, sf)
    val byRoot = clusters.groupBy(col("cluster_root")).count()
      .collect().map(_.getLong(1))
    val dist = graft.operators.Dedup.clusterSizeDistribution(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dist.nonEmpty && dist.forall(_._1 >= 2), "sizes start at 2")
    assert(dist.map(_._2).sum == byRoot.length, "cluster count partitioned")
    assert(dist.map(_._3).sum == byRoot.sum, "doc count partitioned")
    dist.foreach { case (size, n, docs) =>
      assert(docs == size * n)
      assert(byRoot.count(_ == size).toLong == n, s"size-$size cluster count")
    }
  }

  test("m14 counts level crossings exactly on planted payloads") {
    val spark2 = spark
    import spark2.implicits._
    // 'a' = 97 < 100 <= 'z' = 122: "azaz" crosses at every step; "aaaa"
    // never; "dddd" ('d' = 100, AT the level) never — >= binds above
    val dir = java.nio.file.Files.createTempDirectory("graft_m14").toString
    Seq((1L, "azaz"), (2L, "aaaa"), (3L, "dddd"), (4L, "za"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.multimodal.Multimodal.audioLevelCrossings(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((4L, 3L, 1.0, true)), s"azaz: ${got(1L)}")
    assert(got(2L) == ((4L, 0L, 0.0, false)), s"aaaa: ${got(2L)}")
    assert(got(3L) == ((4L, 0L, 0.0, false)), s"dddd: ${got(3L)}")
    assert(got(4L) == ((2L, 1L, 1.0, true)), s"za: ${got(4L)}")
  }

  test("q59 LOCF carries exactly the last purchase value forward") {
    val spark2 = spark
    import spark2.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    // user 1: view (nothing yet), purchase 5.0, click (carries 5.0),
    // purchase 7.5, view (carries 7.5); user 2: never purchases
    val rows = Seq(
      (1L, ts(0), 1L, "view", 9.9), (2L, ts(1), 1L, "purchase", 5.0),
      (3L, ts(2), 1L, "click", 1.1), (4L, ts(3), 1L, "purchase", 7.5),
      (5L, ts(4), 1L, "view", 2.2), (6L, ts(0), 2L, "click", 3.3))
    val dir = java.nio.file.Files.createTempDirectory("graft_q59").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Extended.lastObservationCarriedForward(spark, dir)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))).toMap
    assert(got(1L) == ((None, false)), s"pre-purchase view: ${got(1L)}")
    assert(got(2L) == ((Some(5.0), false)), "the purchase itself is observed, not imputed")
    assert(got(3L) == ((Some(5.0), true)))
    assert(got(4L) == ((Some(7.5), false)))
    assert(got(5L) == ((Some(7.5), true)))
    assert(got(6L) == ((None, false)), "no purchase ever -> stays null, not imputed")
  }

  test("q60 attributes errors to the interrupted activity; pre-activity errors to none") {
    val spark2 = spark
    import spark2.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    // user 1: error before any activity ('none'), view, error in view
    // (120 s in), click, two errors in click (60 s and 120 s in)
    val rows = Seq(
      (1L, ts(0), 1L, "error"), (2L, ts(1), 1L, "view"),
      (3L, ts(3), 1L, "error"), (4L, ts(5), 1L, "click"),
      (5L, ts(6), 1L, "error"), (6L, ts(7), 1L, "error"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q60").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Extended.errorContext(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got("none") == ((1L, 1L, None)), s"pre-activity: ${got.get("none")}")
    assert(got("view") == ((1L, 1L, Some(120.0))), s"view context: ${got.get("view")}")
    assert(got("click") == ((2L, 1L, Some(90.0))), s"click context: ${got.get("click")}")
    assert(got.size == 3)
  }

  test("d27 equals d17's pairs restricted to the batch×corpus boundary") {
    // the incremental cross-side machinery must find EXACTLY the pairs
    // the full self-join finds across the odd/even split — no corpus-
    // side pair lost by running the asymmetric probe both ways
    val full = graft.operators.Dedup.containmentPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b, c) =>
        (if (a % 2 != 0) a else b, if (a % 2 == 0) a else b, c) }.toSet
    val incr = graft.operators.Dedup.incrementalContainmentDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr == full && incr.nonEmpty,
      s"incr=${incr.size} full-cross=${full.size} diff=${(incr diff full).take(3)}")
  }

  test("s15 regret is the one-sided price of the int8 pick") {
    val rows = graft.operators.Similarity.quantizationImpact(spark, sf)
      .collect().map(r => (r.getBoolean(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (agree, trueCos, pickCos, regret) =>
      // the true pick maximizes float cosine over the SHARED candidate
      // set and rounding is monotone, so regret can never go negative
      assert(regret >= 0.0, s"negative regret: $regret")
      if (agree) assert(regret == 0.0 && trueCos == pickCos,
        "agreement must mean zero regret")
    }
    // one row per query vector (vec_id % 50 == 0)
    val nQueries = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == nQueries)
  }

  test("d9/m6 filter-first pairs equal a distinct-first recount") {
    // the r9 reorder must not change the result set — recount d9's pairs
    // through the pre-r9 shape (distinct before the Hamming verify)
    val sigs = graft.operators.Dedup.simhashSignatures(spark, sf).cache()
    val distinctFirst = graft.operators.Dedup.simhashCandidates(sigs)
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val registered = graft.operators.Dedup.simhashNearDupPairs(spark, sf)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    sigs.unpersist()
    assert(registered == distinctFirst && registered.nonEmpty)
  }
}
