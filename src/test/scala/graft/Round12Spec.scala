package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.multimodal.Multimodal
import graft.streaming.Events

/** Round-12 additions: the GLOBAL watermark-delay derivation (r11 ADVICE
  * — Spark's watermark is one value across all keys), the stateful
  * shuffle-partition dial (r11 verdict #1), the d30 frozen-order drift
  * audit, the containment-index append crash-window repair, and the m16
  * audit's wide2 escalation.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("cross-user disorder: only the GLOBAL derivation sizes a safe watermark") {
    // the r11 ADVICE scenario made executable: each user's own stream is
    // perfectly ordered (st8's per-user audit reports zero lateness), but
    // user 2's event ARRIVES after user 1's much-later event times — a
    // per-user-derived delay (the 1 µs floor) lets the single global
    // engine watermark drop it; the global derivation measures the
    // cross-user trail and admits every row
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(off: Long) = java.sql.Timestamp.from(t0.plusSeconds(off))
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_disorder").toString
    Seq((1L, ts(1000L), 1L), (2L, ts(1100L), 1L), (3L, ts(1200L), 1L),
        (4L, ts(0L), 2L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // st8 (per-user) sees a fully ordered corpus; the global derivation
    // sees the 1200 s cross-user trail
    val st8Max = Events.disorderAudit(spark, dir)
      .agg(max(c("max_lateness_us"))).collect()(0).getLong(0)
    assert(st8Max == 0L, "every per-user stream is in order")
    val derived = Events.deriveWatermarkDelayUs(spark, dir)
    assert(derived == 1200L * 1000000L + 1L,
      s"global derivation must measure the cross-user trail: $derived")

    // replay one arrival per micro-batch (arrival order = event_id, the
    // derivation's proxy) through a real watermark + stateful op: the
    // per-user-floor delay drops user 2's event, the derived delay
    // admits all four
    for ((delayUs, expDrops) <- Seq(1L -> 1L, derived -> 0L)) {
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val q = mem.toDF().toDF("event_id", "ts")
        .withWatermark("ts", Events.watermarkDelayString(delayUs))
        .dropDuplicates("event_id")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"r12_disorder_$delayUs").start()
      try {
        Seq(1000L, 1100L, 1200L, 0L).zipWithIndex.foreach { case (off, i) =>
          mem.addData((i + 1L, ts(off)))
          q.processAllAvailable()
        }
        val survived = spark.sql(s"SELECT count(*) FROM r12_disorder_$delayUs")
          .collect()(0).getLong(0)
        assert(4L - survived == expDrops,
          s"delay $delayUs µs: dropped ${4 - survived}, expected $expDrops")
      } finally q.stop()
    }
  }

  test("maxGlobalLatenessUs: the chunked two-level form equals the naive global running max") {
    val spark2 = spark
    import spark2.implicits._
    // arrival domain wide enough to exercise many chunks, with ties
    val rng = new scala.util.Random(12)
    val rows = (0 until 2000).map { i =>
      (rng.nextInt(10000000).toLong / 3L * 3L, rng.nextInt(1000000).toLong)
    }
    val naive = {
      // max over rows of (max us among arr' <= arr) - us  (RANGE ties)
      val byArr = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq.sortBy(_._1)
      var run = Long.MinValue
      val runMax = byArr.map { case (a, m) => run = math.max(run, m); a -> run }.toMap
      rows.map { case (a, u) => math.max(runMax(a) - u, 0L) }.max
    }
    val got = Events.maxGlobalLatenessUs(rows.toDF("arr", "us"))
    assert(got == naive, s"chunked $got != naive $naive")
  }

  test("watermarkDelayString quantizes the µs dial to the engine's real millisecond tick") {
    assert(Events.watermarkDelayMs(1L) == 2L)     // the 1 µs floor -> 2 ms
    assert(Events.watermarkDelayMs(1000L) == 2L)  // exactly 1 ms -> 2 ms
    assert(Events.watermarkDelayMs(1001L) == 3L)  // ceil + guard
    assert(Events.watermarkDelayString(1L) == "2 milliseconds")
  }

  test("d26 derives the stateful shuffle-partition dial from the attribution state horizon") {
    val rows = Dedup.autoConfigReport(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val h = Events.attributionStateHorizonRows(spark, sf)
    assert(rows("st_shuffle_partitions") ==
      ((h, Events.deriveStatefulShufflePartitions(h).toLong)),
      s"report row ${rows("st_shuffle_partitions")} != derivation over $h")
    // the dial's shape: one store per 2^16 state rows, clamped [1, 32]
    assert(Events.deriveStatefulShufflePartitions(0L) == 1)
    assert(Events.deriveStatefulShufflePartitions(65536L) == 1)
    assert(Events.deriveStatefulShufflePartitions(65537L) == 2)
    assert(Events.deriveStatefulShufflePartitions(1L << 21) == 32)
    assert(Events.deriveStatefulShufflePartitions(1000000000000L) == 32)
    // tiny state at every observable scale -> the floor: the r11 control
    // measured that fewer stores are strictly faster until ~2^16 rows
    assert(rows("st_shuffle_partitions")._2 == 1L,
      "gate-scale state sits far below the crossover")
  }

  test("d30 closed form equals the real prefix-equi-join volume, and prefix_rows is order-invariant") {
    val audit = Dedup.indexOrderDriftAudit(spark, sf).collect()(0)
    val prefixRows = audit.getAs[Long]("prefix_rows")
    val frozenVol = audit.getAs[Long]("frozen_candidate_rows")
    // the d29/m16 contract: the histogram product IS the join's row count
    val sh = Dedup.shingleStrings(spark, sf).cache()
    try {
      val dfz = sh.filter(col("doc_id") % 2 === 0)
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
      // order-invariance of prefix_rows (the reshaped d30 emits it once,
      // from the fresh order): the frozen order's own volume row must
      // carry the same prefix length
      val frozenRow = Dedup.driftVolumeUnder(sh,
        dfz, 0.8, "frozen_build").collect()(0)
      assert(frozenRow.getAs[Long]("prefix_rows") == prefixRows,
        "prefix LENGTH per doc depends only on its shingle count")
      assert(frozenRow.getAs[Long]("candidate_rows") == frozenVol)
      val pos = Dedup.driftPositions(sh, dfz, 0.8).cache()
      try {
        val real = pos.filter(col("in_prefix")).select(col("s")).as("a")
          .join(pos.select(col("s")).as("b"), col("a.s") === col("b.s"))
          .count()
        assert(real == frozenVol, s"closed form $frozenVol != emitted $real")
      } finally { pos.unpersist(); () }
    } finally { sh.unpersist(); () }
  }

  test("containment-index append: a crash between the writes is healed by any later append") {
    val prefix = "r12_crash_index"
    val freshPrefix = "r12_crash_fresh"
    // build over an even EIGHTH of the docs so two more even eighths can
    // play the crashed batch and the unrelated one; batch probes stay odd
    Dedup.persistContainmentIndex(spark, sf, prefix,
      corpusFilter = col("doc_id") % 8 === 0)
    // simulate the crash window: batch A's _cfull half landed, the
    // _cdocs commit marker did not
    val addA = Dedup.docShingles(spark, sf).filter(col("doc_id") % 8 === 2)
    Dedup.appendShinglesToCfull(spark, addA, prefix, 32)
    // an UNRELATED later append must heal A's residue (the heal keys on
    // _cfull \ _cdocs globally, not on the incoming batch — a crashed
    // batch that is never retried must not leave orphans forever)
    Dedup.appendToContainmentIndex(spark, sf, col("doc_id") % 8 === 4, prefix)
    // A itself can then re-append cleanly (never registered, residue gone)
    Dedup.appendToContainmentIndex(spark, sf, col("doc_id") % 8 === 2, prefix)
    // post-repair probe == a probe against a fresh build over the same
    // corpus (the StorageLayoutSpec equivalence, re-proven post-crash)
    Dedup.persistContainmentIndex(spark, sf, freshPrefix,
      corpusFilter =
        col("doc_id") % 8 === 0 || col("doc_id") % 8 === 2 ||
          col("doc_id") % 8 === 4)
    def probe(p: String) =
      Dedup.incrementalContainmentFromIndex(spark, sf, p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val healed = probe(prefix)
    assert(healed.nonEmpty && healed == probe(freshPrefix),
      "healed index must probe identically to a fresh rebuild")
    // a COMPLETE append is still refused — the duplicate guard survives
    val e = intercept[IllegalArgumentException] {
      Dedup.appendToContainmentIndex(spark, sf, col("doc_id") % 8 === 2, prefix)
    }
    assert(e.getMessage.contains("already indexed"))
  }

  test("file-arrival dial: an mtime-shuffled multi-batch replay loses nothing at the twin delay") {
    // the r11 trap made a spec: the file source delivers files in MTIME
    // order, so a parallel-written (mtime-shuffled) corpus arrives
    // time-travelled even when every file is internally ts-sorted — the
    // corpus-contract dial alone (event_id order, 1 µs here) would let
    // the watermark jump to the furthest-ahead file and drop the rest;
    // deriveFileArrivalDelayUs prices the arrival the source actually
    // has, and the twins take the max of both dials
    import org.apache.spark.sql.functions._
    val staged = java.nio.file.Files.createTempDirectory("graft_r12_mtime").toString
    graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .repartitionByRange(4, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(s"$staged/events.parquet")
    val parts = new java.io.File(s"$staged/events.parquet").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis()
    // REVERSED mtimes: the latest-ts file arrives first
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + (parts.length - 1 - i) * 1000L) }
    val corpusDial = Events.deriveWatermarkDelayUs(spark, staged)
    val fileDial = Events.deriveFileArrivalDelayUs(spark, staged)
    assert(corpusDial == 1L, "event_id order is clean — the corpus dial floors")
    assert(fileDial > 1000000L,
      s"the reversed arrival must dominate the dial: $fileDial")
    assert(Events.twinDelayUs(spark, staged) == fileDial)

    val batch = Events.attributedPairs(spark, staged).count()
    def replayAt(delayUs: Long): Long = {
      val d = Events.watermarkDelayString(delayUs)
      val schema = spark.read.parquet(s"$staged/events.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$staged/events.parquet")
      val joined = Events.attributionJoin(
        src.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("click_ts"))
          .withWatermark("click_ts", d),
        src.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", d),
        Events.AttributionWindowMinutes)
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(s"r12_mtime_$delayUs").start()
      try { q.processAllAvailable()
        spark.sql(s"SELECT count(*) FROM r12_mtime_$delayUs")
          .collect()(0).getLong(0)
      } finally q.stop()
    }
    assert(replayAt(fileDial) == batch,
      "at the file-arrival dial the shuffled replay is lossless")
    assert(replayAt(corpusDial) < batch,
      "the corpus dial alone under-sizes this arrival — the negative control")
  }

  test("file-arrival dial prices mtime ties conservatively — either delivery order is covered") {
    // the source's tie-break is nondeterministic, so two files sharing an
    // mtime must each count the other as possibly-prior: the dial covers
    // the worse order (later-ts file first), not the luckier one
    val spark2 = spark
    import spark2.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(off: Long) = java.sql.Timestamp.from(t0.plusSeconds(off))
    val staged = java.nio.file.Files.createTempDirectory("graft_r12_tie").toString
    // file A: events at 0..100 s; file B: events at 3600..3700 s
    Seq((1L, ts(0L)), (2L, ts(100L))).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$staged/a")
    Seq((3L, ts(3600L)), (4L, ts(3700L))).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$staged/b")
    val dir = new java.io.File(s"$staged/events.parquet"); dir.mkdirs()
    def move(src: String, name: String): java.io.File = {
      val part = new java.io.File(s"$staged/$src").listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(dir, name)
      assert(part.renameTo(dst)); dst
    }
    val fa = move("a", "part-00000-aaa.snappy.parquet")
    val fb = move("b", "part-00001-bbb.snappy.parquet")
    val base = System.currentTimeMillis() / 1000L * 1000L
    fa.setLastModified(base); fb.setLastModified(base)
    // worst order is B then A: A's earliest row (0 s) trails B's max
    // (3700 s) by the full 3700 s
    assert(Events.deriveFileArrivalDelayUs(spark, staged) ==
      3700L * 1000000L + 1L)
    // distinct mtimes with A strictly first: nothing trails, the floor
    fb.setLastModified(base + 2000L)
    assert(Events.deriveFileArrivalDelayUs(spark, staged) == 1L)
  }

  test("withDerivedStatefulPartitions sets the dial for the body and restores the session value") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val h = Events.attributionStateHorizonRows(spark, sf)
    val inside = Events.withDerivedStatefulPartitions(spark, sf) { p =>
      assert(p == Events.deriveStatefulShufflePartitions(h))
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside == Events.deriveStatefulShufflePartitions(h).toString)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev,
      "session value must be restored")
    // restored even when the body throws
    intercept[RuntimeException] {
      Events.withDerivedStatefulPartitions(spark, sf, Some(1L << 20)) { _ =>
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
  }

  test("m16 audit escalates to the wide2 layout past the gradient cap — Σ C(s,2) still prices the real join") {
    // the r11 ADVICE fix: past 2^19 docs m6 runs the curvature-funded
    // wide2 bands, so the audit must price THAT join — pinned at a
    // forced wide2 width the way Round11Spec pins the narrow layout
    val e = 8
    val hashes = Multimodal.perceptualHashesWide2(spark, sf).cache()
    try {
      val audit = Multimodal
        .bandOccupancyOf(Multimodal.mediaBandsWide2(hashes, 7, e))
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      assert(audit.map(_._1).toSeq == (0L until 8L).toSeq)
      val emitted = Multimodal.mediaBandCandidatesWide2(hashes, 7, e).count()
      assert(audit.map(_._2).sum == emitted,
        s"closed form ${audit.map(_._2).sum} != emitted $emitted")
    } finally { hashes.unpersist(); () }
  }
}
