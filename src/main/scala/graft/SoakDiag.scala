package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak-ledger diagnostics main — the pair/candidate counts that
  * adjudicate the expensive rows of the full-suite 100× soak
  * (`soak100_out.json`). The per-pair methodology (SURVEY §2.11a) judges
  * a pair-producing operator's soak wall-clock against how its TRUE pair
  * output and its CANDIDATE set grew, not against corpus row count — an
  * operator whose candidates grew 150× on 100× data is pair-linear even
  * when its wall-clock is super-linear in rows. This main prints, for
  * one corpus dir, every count that judgment needs:
  *
  *   - d2/d24: AllPairs prefix-filter candidates + verified pairs at the
  *     registered τ=0.8 and at the d24 grid floor τ=0.7
  *   - d17/d19: asymmetric-containment candidates surviving the PPJoin
  *     positional filter + verified pairs at τ=0.8 (d19 shares d17's
  *     candidate machinery, so one measurement covers both)
  *   - d9: 13-bit-band simhash candidates + pairs within Hamming ≤ 3
  *   - d21: window-hash rows and shared-window rows (d21 never
  *     enumerates pairs; its cost driver is the shared-window count)
  *   - m6: pigeonhole pHash band candidates + pairs at radius 7
  *
  * Usage: runMain graft.SoakDiag [sfDir]
  * Output: one line per metric — `[soakdiag] <name> <seconds> <count>` —
  * plus a trailing JSON line with every count, for the ledger.
  */
object SoakDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/soakdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_DIAG_ONLY: comma-separated metric-name prefixes — run
    // only the matching sections (resume a partial sweep without
    // re-paying the completed ones)
    val only = sys.env.get("SPARK_GRAFT_DIAG_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // boundary-anchored prefix match: ONLY=d2 selects d2_candidates_t08
    // but not d21/d24/d28 (r10 ADVICE — the bare-prefix match made a
    // d2-only resume silently re-run d28's side-effecting index build)
    def wanted(name: String): Boolean =
      only.forall(_.exists(p => name == p || name.startsWith(p + "_")))

    val out = scala.collection.mutable.LinkedHashMap[String, Long]()
    def time(name: String)(f: => Long): Unit = if (wanted(name)) {
      // same hygiene as Bench: drop caches + reap shuffle files between
      // measurements — but ONLY the caches this block created. The d9/m6
      // sections deliberately hold a section-level sigs/hashes cache
      // across their two metrics; a global unpersist here would silently
      // turn the second metric into a full recompute (a once-unpersisted
      // RDD never re-caches), overstating its seconds.
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val n = f
      out(name) = n
      println(f"[soakdiag] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $n%12d")
      scala.util.Try {
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !before.contains(id) }
          .values.foreach(_.unpersist(true))
        System.gc()
      }
      ()
    }
    /** A count computed as a by-product of an already-timed block — logged
      * and ledgered without a misleading ~0 s timing of its own.
      */
    def untimed(name: String, n: Long): Unit = if (wanted(name)) {
      out(name) = n
      println(f"[soakdiag] $name%-24s       (untimed)  $n%12d")
    }

    time("n_docs") {
      sources.Tables.documentsParallel(spark, dir).count()
    }

    // d2 at the registered τ=0.8, then the d24 grid floor τ=0.7: the
    // sweep's single corpus pass runs at the floor, so its candidate
    // count is the one that prices d24's PPJoin
    Seq(0.8, 0.7).foreach { t =>
      val tag = (t * 10).round.toInt
      val (docs, prefix, candidates) =
        operators.Dedup.ngramCandidates(spark, dir, t)
      time(s"d2_candidates_t0$tag") { candidates.count() }
      docs.unpersist(); prefix.unpersist()
      time(s"d2_pairs_t0$tag") {
        operators.Dedup.ngramJaccardPairs(spark, dir, threshold = t).count()
      }
    }

    // d17/d19: candidates AFTER the positional filter (the verify join's
    // input — the number the r8 232.8 s wall is judged by), then output.
    // Two recomputing passes, NOT a shared cache: the verify frame
    // carries both shingle arrays, so caching it at 100× is ~160 GB of
    // disk — the exact spill the registered query avoids (measured: the
    // cached variant died disk-full at sf10).
    locally {
      val (verified, caches) =
        operators.Dedup.containmentVerified(spark, dir, 0.8)
      time("d17_candidates") { verified.count() }
      time("d17_pairs") { verified.filter(col("containment") >= 0.8).count() }
      caches.foreach(_.unpersist())
    }

    // d28: the per-BATCH cost asymmetry the persisted containment index
    // buys. At the registered fixture the batch is HALF the corpus, so
    // batch-side work dominates and d28 ≈ d27 in the bench; the index's
    // value is the scaling in BATCH size at a FIXED corpus — measured
    // here with a 0.5% batch slice: the d27 recompute still pays the
    // full corpus shingle+df+sort (O(corpus) per batch, any batch), the
    // d28 probe pays only the slice's own work against pre-shuffled
    // files. The index BUILD gets its own timed row (r10 verdict #5):
    // production pays it once per corpus rebuild and amortizes it over
    // every batch, and the amortization argument deserves its number
    // next to the probe asymmetry — the metric is _cfull's row count
    // (one per corpus shingle position, the table the build exists to
    // pre-shuffle).
    if (wanted("d28")) {
      val prefix = s"graft_diag_d28_${dir.hashCode & Int.MaxValue}"
      time("d28_index_build") {
        operators.Dedup.persistContainmentIndex(spark, dir, prefix)
        spark.table(s"${prefix}_cfull").count()
      }
      val small = col("doc_id") % 200 === 1
      time("d28_probe_halfbatch") {
        operators.Dedup
          .incrementalContainmentFromIndex(spark, dir, prefix).count()
      }
      time("d28_probe_smallbatch") {
        operators.Dedup.incrementalContainmentFromIndex(
          spark, dir, prefix, batchFilter = small).count()
      }
      // named under the d28 prefix so DIAG_ONLY=d28 runs the whole
      // comparison (wanted() matches on the d28_ boundary)
      time("d28_vs_d27recompute_smallbatch") {
        operators.Dedup.incrementalContainmentDedup(
          spark, dir, batchFilter = small).count()
      }
      // drop the three bucketed diag tables — _cfull is shingle-scale,
      // and a soak host's effective disk is ~76 GB (r10 ADVICE)
      Seq(s"${prefix}_cdocs", s"${prefix}_cdf", s"${prefix}_cfull").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
        loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(loc, true)
      }
    }

    // d27: the batch(odd)×corpus(even) asymmetric-containment probe —
    // cross-BOUNDARY candidates surviving the positional filter (the
    // verify join's input, summed over both probe directions) and the
    // verified pairs at τ=0.8. First-class counts so d27's soak wall is
    // adjudicated per-pair like d17's, not by proxy.
    locally {
      val (verified, caches) =
        operators.Dedup.incrementalContainmentVerified(spark, dir, 0.8)
      time("d27_candidates") { verified.count() }
      time("d27_pairs") { verified.filter(col("containment") >= 0.8).count() }
      caches.foreach(_.unpersist())
    }

    // d9: band-join output volume priced in CLOSED FORM (Σ per-bucket
    // C(s,2) — exactly what the equi-join emits, at O(n) cost), then the
    // verified pairs through the r9 filter-first pipeline. The distinct
    // candidate count (what the PRE-r9 pipeline shuffled) is not
    // materialized here: at band-saturated scales it alone is a
    // multi-hundred-second distinct — the very cost the r9 reorder
    // removed — and the sf1/sf3 measurements already anchor that column.
    // r10: the REGISTERED form derives its band width from the corpus
    // count (deriveExtraBandBits), so this prices the layout the query
    // actually runs — extra bits ledgered alongside.
    if (wanted("d9")) {
      val e = operators.Dedup.deriveExtraBandBits(
        sources.Tables.documentsParallel(spark, dir).count().max(1L))
      untimed("d9_extra_bits", e)
      val sigs =
        (if (e == 0) operators.Dedup.simhashSignatures(spark, dir)
         else operators.Dedup.simhashSignaturesWide(spark, dir, e)).cache()
      time("d9_band_rows") {
        (if (e == 0) operators.Dedup.simhashBands(sigs)
         else operators.Dedup.simhashBandsWide(sigs, e))
          .groupBy(col("band"), col("bkey")).count()
          .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
          .collect()(0).get(0) match { case null => 0L; case v => v.toString.toLong }
      }
      time("d9_pairs") {
        (if (e == 0)
           operators.Dedup.simhashCandidates(sigs)
             .withColumn("hamming",
               bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
         else
           operators.Dedup.simhashCandidatesWide(sigs, e)
             .withColumn("hamming",
               bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) +
                 bit_count(col("sh2_a").bitwiseXOR(col("sh2_b")))))
          .filter(col("hamming") <= 3)
          .select(col("id_a"), col("id_b")).distinct().count()
      }
      sigs.unpersist()
    }

    // d21: no pair set exists — the cost drivers are total window-hash
    // rows (the shuffle into the (min,max)-owner reduction) and the
    // shared-window rows that flow into the per-doc islands window. ONE
    // timed block runs the whole aggregation (the expensive part); the
    // second count is a by-product of the same collect, ledgered untimed
    // rather than wearing a fake ~0 s of its own.
    if (wanted("d21")) {
      var shared = 0L
      time("d21_windows") {
        val span = operators.Dedup.longestSharedSpan(spark, dir)
          .agg(sum(col("n_windows")).as("w"), sum(col("n_shared")).as("s"))
          .collect()(0)
        shared = Option(span.get(1)).fold(0L)(_.toString.toLong)
        Option(span.get(0)).fold(0L)(_.toString.toLong)
      }
      untimed("d21_shared_windows", shared)
    }

    // m6: same scheme as d9 — closed-form band volume + filter-first
    // pairs (at radius 7 the base 6-7-bit bands saturate, so the volume
    // is ~n²/8 and materializing a distinct over it is exactly the
    // pre-r9 cost the reorder removed). r10: priced at the registered
    // form's derived width, like d9.
    if (wanted("m6")) {
      val cap = multimodal.Multimodal.MediaExtraBitsCap
      val e = math.min(multimodal.Multimodal.MediaExtraBitsCap2,
        operators.Dedup.deriveExtraBandBits(
          sources.Tables.documentsParallel(spark, dir).count().max(1L)))
      untimed("m6_extra_bits", e)
      val hashes =
        (if (e == 0) multimodal.Multimodal.perceptualHashes(spark, dir)
         else if (e <= cap) multimodal.Multimodal.perceptualHashesWide(spark, dir)
         else multimodal.Multimodal.perceptualHashesWide2(spark, dir)).cache()
      time("m6_band_rows") {
        (if (e == 0) multimodal.Multimodal.mediaBands(hashes, 7)
         else if (e <= cap) multimodal.Multimodal.mediaBandsWide(hashes, 7, e)
         else multimodal.Multimodal.mediaBandsWide2(hashes, 7, e))
          .groupBy(col("band"), col("bkey")).count()
          .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
          .collect()(0).get(0) match { case null => 0L; case v => v.toString.toLong }
      }
      time("m6_pairs") {
        (if (e == 0)
           multimodal.Multimodal.mediaBandCandidates(hashes, 7)
             .withColumn("hamming",
               bit_count(col("ha").bitwiseXOR(col("hb"))))
             .filter(col("hamming") <= 7)
         else if (e <= cap)
           multimodal.Multimodal.mediaNearDupPairsWide(hashes, 7, e)
         else
           multimodal.Multimodal.mediaNearDupPairsWide2(hashes, 7, e))
          .select(col("id_a"), col("id_b")).distinct().count()
      }
      hashes.unpersist()
    }

    // m6cap: the gradient-slot boundary priced in closed form — a
    // SYNTHETIC uniform-hash corpus (deterministic hash52 variants of the
    // doc id: no perceptual structure, every tie is random) straddling
    // the ~2^19-doc boundary where the derivation first wants a 7th bit
    // the gradient hash cannot give. Three rows tell the story: at 2^19
    // the 6-bit width is exact; at 2^20 FROZEN at 6 bits the volume
    // ~quadruples (C(n,2) doubling twice against a fixed key space);
    // FUNDED at 7 bits by the curvature hash (wide2, r11) it halves back
    // — the ~2×-per-bit relief the funding dial buys, measured. Corpus-
    // independent, so run under DIAG_ONLY=m6cap on any one dir.
    if (wanted("m6cap")) {
      def synthetic(n: Long) =
        spark.range(n).select(col("id").as("doc_id"),
          graft.functions.TextFunctions.hash52(col("id").cast("string"))
            .as("phash"),
          graft.functions.TextFunctions.hash52b(col("id").cast("string"))
            .as("ghash"),
          graft.functions.TextFunctions.hash52(
            concat(col("id").cast("string"), lit("c"))).as("chash"))
      def volume(bands: org.apache.spark.sql.DataFrame): Long =
        bands.groupBy(col("band"), col("bkey")).count()
          .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
          .collect()(0).get(0) match { case null => 0L; case v => v.toString.toLong }
      time("m6cap_volume_2p19") {
        volume(multimodal.Multimodal.mediaBandsWide(synthetic(1L << 19), 7, 6))
      }
      time("m6cap_volume_2p20_frozen6") {
        volume(multimodal.Multimodal.mediaBandsWide(synthetic(1L << 20), 7, 6))
      }
      time("m6cap_volume_2p20_funded7") {
        volume(multimodal.Multimodal.mediaBandsWide2(synthetic(1L << 20), 7, 7))
      }
      // ...and the volumes PAID: the full banded near-dup pipeline
      // (band self-join + combined-signature hamming verify) at the same
      // 2^20 boundary corpus — random ties never survive the verify, so
      // the count is ~0 and the wall IS the saturation cost the funding
      // dial removes
      time("m6cap_wall_2p20_frozen6") {
        multimodal.Multimodal
          .mediaNearDupPairsWide(synthetic(1L << 20), 7, 6).count()
      }
      time("m6cap_wall_2p20_funded7") {
        multimodal.Multimodal
          .mediaNearDupPairsWide2(synthetic(1L << 20), 7, 7).count()
      }
      // one more doubling (2^21, where deriveExtraBandBits wants 8):
      // frozen volume is 4x the funded, yet the walls barely separate —
      // the verify is a codegen'd loop INSIDE the band SMJ (no pair
      // shuffle, ~1e8 candidate probes/s/core on uniform ties), so the
      // quadratic term is latent until the volume outgrows what that
      // loop absorbs...
      time("m6cap_wall_2p21_frozen6") {
        multimodal.Multimodal
          .mediaNearDupPairsWide(synthetic(1L << 21), 7, 6).count()
      }
      time("m6cap_wall_2p21_funded8") {
        multimodal.Multimodal
          .mediaNearDupPairsWide2(synthetic(1L << 21), 7, 8).count()
      }
      // ...which it does two doublings later: at 2^23 the frozen width
      // faces ~68B candidate probes (16x per doubling pair) vs the
      // funded-10 width's ~4.3B — the wall onset the closed-form rows
      // predict, and the synthetic corpus still UNDERSTATES the real
      // cost (uniform ties have no skewed buckets and zero survivors, so
      // nothing shuffles; the real-corpus m6 soak is where saturation
      // also pays shuffle and skew: 107.5 s -> 24.1 s, r10)
      time("m6cap_wall_2p23_frozen6") {
        multimodal.Multimodal
          .mediaNearDupPairsWide(synthetic(1L << 23), 7, 6).count()
      }
      time("m6cap_wall_2p23_funded10") {
        multimodal.Multimodal
          .mediaNearDupPairsWide2(synthetic(1L << 23), 7, 10).count()
      }
    }

    // d30: frozen-order drift vs APPENDED FRACTION — the containment
    // index's rebuild-cadence signal at soak scale: freeze the df order
    // over 1/2, 1/4, 1/8 of the corpus (the remainder plays the appended
    // docs, adopting the frozen order through the df-0 lookup) and price
    // the prefix join's candidate volume in closed form against the
    // fresh-rebuild order. The gap growing as the frozen snapshot ages
    // is the documented selectivity drift; when it pulls away, rebuild.
    if (wanted("d30")) {
      val sh = operators.Dedup.shingleStrings(spark, dir).cache()
      time("d30_fresh_candidates") {
        operators.Dedup.driftVolumeUnder(sh,
          sh.groupBy(col("s")).agg(count(lit(1)).as("df")),
          0.8, "fresh").collect()(0).getLong(2)
      }
      Seq(2, 4, 8).foreach { k =>
        time(s"d30_frozen_candidates_div$k") {
          operators.Dedup.driftVolumeUnder(sh,
            sh.filter(col("doc_id") % k === 0).groupBy(col("s"))
              .agg(count(lit(1)).as("df")),
            0.8, "frozen").collect()(0).getLong(2)
        }
        // the r13 POLICY consumed at soak scale: the drift ratio (×10⁴,
        // the registered query's 4-decimal rounding as an integer row)
        // and the rebuild verdict at Dedup.DriftRebuildRatio — the sweep
        // is where the verdict visibly flips as the frozen snapshot ages
        // (r12 numbers: sf1 never flips at 1.19–1.48; sf3 flips at
        // 7/8-stale 2.01; sf10 at 1/4-stale 2.42)
        for (fresh <- out.get("d30_fresh_candidates");
             frozen <- out.get(s"d30_frozen_candidates_div$k")) {
          val ratio = if (fresh == 0L) 1.0 else frozen.toDouble / fresh
          untimed(s"d30_drift_ratio_x10000_div$k", math.round(ratio * 10000))
          untimed(s"d30_rebuild_recommended_div$k",
            if (ratio >= operators.Dedup.DriftRebuildRatio) 1L else 0L)
        }
      }
      sh.unpersist()
      ()
    }

    // d31: the d30 policy's ACT step at soak scale, driven through the
    // SHIPPED lifecycle (pointer + rotate), not hand-composed steps —
    // build over the even half, append the odd half (a genuinely drifted
    // live index), flip the pointer to it, then rotate twice:
    //  - at the library DriftRebuildRatio the half-stale fixture KEEPs
    //    (drift 1.18-1.39 < 2.0), so the keep wall prices what a
    //    steady-state deployment pays per policy tick — exactly the LIVE
    //    audit (frozen volume straight off _cfull's stored positions, no
    //    recompute).
    //  - at a hair-trigger 1.1 the same rotate ACTs: audit + blue/green
    //    rebuild + atomic pointer flip + retire of the old color, the
    //    full cutover wall. The rebuild inside should undercut
    //    d28_index_build (it reads the already-shingled _cdocs instead
    //    of re-tokenizing), and the post-rotate audit — against whatever
    //    the pointer NOW names — must read exactly 10000 (= 1.0): a
    //    structural check, not a timing.
    if (wanted("d31")) {
      val alias = "soak_d31"
      val p = s"${alias}_blue"
      time("d31_index_build_half") {
        operators.Dedup.persistContainmentIndex(spark, dir, p,
          corpusFilter = col("doc_id") % 2 === 0)
        spark.table(s"${p}_cfull").count()
      }
      time("d31_append_other_half") {
        operators.Dedup.appendToContainmentIndex(spark, dir,
          col("doc_id") % 2 =!= 0, p)
        spark.table(s"${p}_cfull").count()
      }
      operators.Dedup.flipContainmentIndex(spark, p, alias)
      var audit: org.apache.spark.sql.Row = null
      time("d31_live_audit") {
        audit = operators.Dedup.containmentIndexDriftAudit(spark, 0.8, p)
          .collect()(0)
        audit.getAs[Long]("frozen_candidate_rows")
      }
      untimed("d31_fresh_candidates", audit.getAs[Long]("fresh_candidate_rows"))
      untimed("d31_drift_ratio_x10000",
        math.round(audit.getAs[Double]("drift_ratio") * 10000))
      untimed("d31_rebuild_recommended",
        audit.getAs[Long]("rebuild_recommended"))
      time("d31_rotate_keep_wall") {
        if (operators.Dedup.rotateContainmentIndex(spark, alias)) 1L else 0L
      }
      time("d31_rotate_act_wall") {
        if (operators.Dedup.rotateContainmentIndex(spark, alias,
          rebuildRatio = 1.1)) 1L else 0L
      }
      val live = operators.Dedup.currentContainmentPrefix(spark, alias).get
      untimed("d31_rotated_to_green", if (live == s"${alias}_green") 1L else 0L)
      var post: org.apache.spark.sql.Row = null
      time("d31_post_audit") {
        post = operators.Dedup.containmentIndexDriftAudit(spark, 0.8, live)
          .collect()(0)
        post.getAs[Long]("frozen_candidate_rows")
      }
      untimed("d31_post_ratio_x10000",
        math.round(post.getAs[Double]("drift_ratio") * 10000))
      Seq(p, s"${alias}_green")
        .foreach(operators.Dedup.dropIndexTables(spark, _))
      operators.Dedup.unlinkContainmentPointer(spark, alias)
    }

    // s16: the persisted IVF index lifecycle at soak scale — the d28/d31
    // discipline on the ANN family. probe-vs-s3-recompute names the
    // index's break-even (what a probe saves is s3's corpus
    // re-assignment — compute-light at 64-d soak widths, so expect
    // near-parity walls here; the bytes-read win is the DPP-pinned scan
    // fraction), and rotate-act prices the full cutover the
    // IvfDriftRebuildRatio derivation amortizes. The half-built index is
    // genuinely drifted (odd half appended under the frozen quantizer);
    // the post-rotate audit must read exactly 10000 (= 1.0).
    if (wanted("s16")) {
      val alias = "soak_s16"
      val p = s"${alias}_blue"
      time("s16_index_build_half") {
        operators.Similarity.persistIvfIndex(spark, dir, p,
          corpusFilter = col("vec_id") % 2 === 0)
        spark.table(s"${p}_icell").count()
      }
      time("s16_append_other_half") {
        operators.Similarity.appendToIvfIndex(spark, dir,
          col("vec_id") % 2 =!= 0, p)
        spark.table(s"${p}_icell").count()
      }
      operators.Similarity.flipIvfIndex(spark, p, alias)
      time("s16_probe_live") {
        operators.Similarity.annIvfLive(spark, dir, alias).count()
      }
      time("s16_s3_recompute") {
        operators.Similarity.annIvfTopK(spark, dir).count()
      }
      var audit: org.apache.spark.sql.Row = null
      time("s16_live_audit") {
        audit = operators.Similarity.ivfIndexDriftAudit(spark, p)
          .collect()(0)
        audit.getAs[Long]("frozen_candidate_rows")
      }
      untimed("s16_fresh_candidates", audit.getAs[Long]("fresh_candidate_rows"))
      untimed("s16_drift_ratio_x10000",
        math.round(audit.getAs[Double]("drift_ratio") * 10000))
      untimed("s16_rebuild_recommended",
        audit.getAs[Long]("rebuild_recommended"))
      // force the ACT branch (ratio 0 clears any drift) so the cutover
      // wall is measured even when the half-stale fixture KEEPs
      time("s16_rotate_act_wall") {
        if (operators.Similarity.rotateIvfIndex(spark, alias,
          rebuildRatio = 0.0)) 1L else 0L
      }
      val live = operators.LiveIndexPointer.current(spark, alias).get
      untimed("s16_rotated_to_green", if (live == s"${alias}_green") 1L else 0L)
      var post: org.apache.spark.sql.Row = null
      time("s16_post_audit") {
        post = operators.Similarity.ivfIndexDriftAudit(spark, live)
          .collect()(0)
        post.getAs[Long]("frozen_candidate_rows")
      }
      untimed("s16_post_ratio_x10000",
        math.round(post.getAs[Double]("drift_ratio") * 10000))
      Seq(p, s"${alias}_green")
        .foreach(operators.Similarity.dropIvfTables(spark, _))
      operators.Similarity.unlinkIvfPointer(spark, alias)
    }

    // s18: the persisted PQ index lifecycle at soak scale — same ledger
    // shape as s16. The amortization claim is stronger here than for
    // IVF: a probe skips the codebook LEARN (two corpus-sized hash
    // aggregations over 8·8·n exploded (sub,bkt,pos) rows) plus the
    // corpus re-encode, so probe-vs-s6-recompute should separate
    // visibly where s16's near-parity was expected. The half-built
    // index realizes s19's frozen hypothesis (built on label < 5, the
    // rest appended under the frozen codec); per the measured-wobble
    // finding its audit should read ~10000 (±3%) — the honest
    // robustness result — and the post-rotate audit exactly 10000.
    if (wanted("s18")) {
      val alias = "soak_s18"
      val p = s"${alias}_blue"
      time("s18_index_build_half") {
        operators.Similarity.persistPqIndex(spark, dir, p,
          corpusFilter = col("label") < 5)
        spark.table(s"${p}_pcode").count()
      }
      time("s18_append_other_half") {
        operators.Similarity.appendToPqIndex(spark, dir,
          col("label") >= 5, p)
        spark.table(s"${p}_pcode").count()
      }
      operators.Similarity.flipPqIndex(spark, p, alias)
      time("s18_probe_live") {
        operators.Similarity.annPqLive(spark, dir, alias).count()
      }
      time("s18_s6_recompute") {
        operators.Similarity.annPqTopK(spark, dir).count()
      }
      var audit: org.apache.spark.sql.Row = null
      time("s18_live_audit") {
        audit = operators.Similarity.pqIndexDriftAudit(spark, p)
          .collect()(0)
        audit.getAs[Long]("frozen_distortion_u6")
      }
      untimed("s18_fresh_distortion_u6",
        audit.getAs[Long]("fresh_distortion_u6"))
      untimed("s18_drift_ratio_x10000",
        math.round(audit.getAs[Double]("drift_ratio") * 10000))
      untimed("s18_rebuild_recommended",
        audit.getAs[Long]("rebuild_recommended"))
      // force the ACT branch (ratio 0 clears any drift) so the cutover
      // wall is measured even though the wobble-band fixture KEEPs
      time("s18_rotate_act_wall") {
        if (operators.Similarity.rotatePqIndex(spark, alias,
          rebuildRatio = 0.0)) 1L else 0L
      }
      val live = operators.LiveIndexPointer.current(spark, alias).get
      untimed("s18_rotated_to_green", if (live == s"${alias}_green") 1L else 0L)
      var post: org.apache.spark.sql.Row = null
      time("s18_post_audit") {
        post = operators.Similarity.pqIndexDriftAudit(spark, live)
          .collect()(0)
        post.getAs[Long]("frozen_distortion_u6")
      }
      untimed("s18_post_ratio_x10000",
        math.round(post.getAs[Double]("drift_ratio") * 10000))
      Seq(p, s"${alias}_green")
        .foreach(operators.Similarity.dropPqTables(spark, _))
      operators.Similarity.unlinkPqPointer(spark, alias)
    }

    // s22: the composed IVF-PQ lifecycle at soak scale — the fifth
    // persisted structure priced with the s16/s18 ledger shape. The
    // break-even question is SHARPER here because the probe dodges BOTH
    // composed families' corpus-sided costs at once: vs s5 it skips the
    // per-probe full-corpus assignment (reading only the probed cells'
    // partitions), and vs s6 it skips the codebook learn + corpus
    // encode AND the full-corpus candidate hash (reading 8-int codes,
    // never floats, off the pruned cells). So expect
    // probe < min(s5, s6) recomputes, with the gap widening as scale
    // grows (the recomputes are corpus-linear; the probe scan is
    // ~nprobe/ncells of the corpus). The half-built index realizes
    // s23's frozen hypothesis (both components learned from the even
    // half, odds appended); its composed audit carries BOTH ratios.
    if (wanted("s22")) {
      val alias = "soak_s22"
      val p = s"${alias}_blue"
      time("s22_index_build_half") {
        operators.Similarity.persistIvfPqIndex(spark, dir, p,
          corpusFilter = col("vec_id") % 2 === 0)
        spark.table(s"${p}_xcell").count()
      }
      time("s22_append_other_half") {
        operators.Similarity.appendToIvfPqIndex(spark, dir,
          col("vec_id") % 2 =!= 0, p)
        spark.table(s"${p}_xcell").count()
      }
      operators.Similarity.flipIvfPqIndex(spark, p, alias)
      time("s22_probe_live") {
        operators.Similarity.annIvfPqLive(spark, dir, alias).count()
      }
      time("s22_s5_recompute") {
        operators.Similarity.annTwoStageTopK(spark, dir).count()
      }
      time("s22_s6_recompute") {
        operators.Similarity.annPqTopK(spark, dir).count()
      }
      var audit: org.apache.spark.sql.Row = null
      time("s22_live_audit") {
        audit = operators.Similarity.ivfPqIndexDriftAudit(spark, p)
          .collect()(0)
        audit.getAs[Long]("frozen_candidate_rows")
      }
      untimed("s22_cell_ratio_x10000",
        math.round(audit.getAs[Double]("cell_drift_ratio") * 10000))
      untimed("s22_code_ratio_x10000",
        math.round(audit.getAs[Double]("code_drift_ratio") * 10000))
      untimed("s22_rebuild_recommended",
        audit.getAs[Long]("rebuild_recommended"))
      // force the ACT branch (normalized ratio floor 0) so the composed
      // cutover wall is measured even when the half-stale fixture KEEPs
      time("s22_rotate_act_wall") {
        if (operators.Similarity.rotateIvfPqIndex(spark, alias,
          rebuildRatio = 0.0)) 1L else 0L
      }
      val live22 = operators.LiveIndexPointer.current(spark, alias).get
      untimed("s22_rotated_to_green",
        if (live22 == s"${alias}_green") 1L else 0L)
      var post: org.apache.spark.sql.Row = null
      time("s22_post_audit") {
        post = operators.Similarity.ivfPqIndexDriftAudit(spark, live22)
          .collect()(0)
        post.getAs[Long]("frozen_candidate_rows")
      }
      untimed("s22_post_cell_ratio_x10000",
        math.round(post.getAs[Double]("cell_drift_ratio") * 10000))
      untimed("s22_post_code_ratio_x10000",
        math.round(post.getAs[Double]("code_drift_ratio") * 10000))
      Seq(p, s"${alias}_green")
        .foreach(operators.Similarity.dropIvfPqTables(spark, _))
      operators.Similarity.unlinkIvfPqPointer(spark, alias)
    }

    // m18: the persisted media band index lifecycle at soak scale — the
    // fourth family, same ledger shape as s16/s18. Two claims to ground:
    // probe-vs-recompute (what a probe saves is the corpus re-hash +
    // re-band — three codegen'd byte folds per corpus doc, the m5/m15/m17
    // cost shape; probed before the append so probe and twin share one
    // pair definition and their counts must be EQUAL), and the WIDTH
    // drift the m19 policy prices: the even half derives one fewer bit
    // than the full corpus at every soak scale (each half→full doubling
    // crosses a ⌈log₂⌉ boundary). The honest MEASURED finding (r13): on
    // THIS corpus the one-bit ratio lands at ~1.43–1.48, not the ~2.0 of
    // the even-split model, because SoakGen's replica tails make the
    // collision volume near-dup-DOMINATED — true pairs agree on the
    // extra gradient/curvature bits too, so no honest widening separates
    // them, and the ratio saturates at (true + random_frozen) /
    // (true + random_fresh). The verdict KEEPing at half-stale is the
    // policy working as designed: it recommends a rebuild only when the
    // REMOVABLE (random) share of probe cost dominates — a rebuild
    // cannot reduce the true-pair mass. MediaIndexSpec's mostly-unique
    // planted corpus is the random-dominated regime and DOES flip.
    // Rebuild re-bands STORED signatures only (no payload re-hash), so
    // rotate-act should undercut build+append; post-rotate audit must
    // read exactly 10000.
    if (wanted("m18")) {
      val alias = "soak_m18"
      val p = s"${alias}_blue"
      time("m18_index_build_half") {
        multimodal.Multimodal.persistMediaIndex(spark, dir, p,
          corpusFilter = col("doc_id") % 2 === 0)
        spark.table(s"${p}_mband").count()
      }
      multimodal.Multimodal.flipMediaIndex(spark, p, alias)
      // probe BEFORE the append so probe and twin share one pair
      // definition (batch=odd × index=even) — the two counts printed
      // below must be EQUAL, a correctness pin riding the soak
      time("m18_probe_live") {
        multimodal.Multimodal.incrementalMediaLive(spark, dir, alias).count()
      }
      time("m18_fresh_recompute") {
        multimodal.Multimodal.incrementalMediaFresh(spark, dir).count()
      }
      time("m18_append_other_half") {
        multimodal.Multimodal.appendToMediaIndex(spark, dir,
          col("doc_id") % 2 =!= 0, p)
        spark.table(s"${p}_mband").count()
      }
      var audit: org.apache.spark.sql.Row = null
      time("m18_live_audit") {
        audit = multimodal.Multimodal.mediaIndexDriftAuditLive(spark, p)
          .collect()(0)
        audit.getAs[Long]("frozen_collision_rows")
      }
      untimed("m18_fresh_collisions",
        audit.getAs[Long]("fresh_collision_rows"))
      untimed("m18_drift_ratio_x10000",
        math.round(audit.getAs[Double]("drift_ratio") * 10000))
      untimed("m18_rebuild_recommended",
        audit.getAs[Long]("rebuild_recommended"))
      // force the ACT branch (ratio 0 clears any drift) so the cutover
      // wall is measured even at scales where the boundary isn't crossed
      time("m18_rotate_act_wall") {
        if (multimodal.Multimodal.rotateMediaIndex(spark, alias,
          rebuildRatio = 0.0)) 1L else 0L
      }
      val live = operators.LiveIndexPointer.current(spark, alias).get
      untimed("m18_rotated_to_green", if (live == s"${alias}_green") 1L else 0L)
      var post: org.apache.spark.sql.Row = null
      time("m18_post_audit") {
        post = multimodal.Multimodal.mediaIndexDriftAuditLive(spark, live)
          .collect()(0)
        post.getAs[Long]("frozen_collision_rows")
      }
      untimed("m18_post_ratio_x10000",
        math.round(post.getAs[Double]("drift_ratio") * 10000))
      Seq(p, s"${alias}_green")
        .foreach(multimodal.Multimodal.dropMediaIndexTables(spark, _))
      multimodal.Multimodal.unlinkMediaPointer(spark, alias)
    }

    // Staged-copy arrival ordering, shared by the streaming sections: the
    // parallel write lands part files with effectively RANDOM modification
    // times (task-completion order), and the file source delivers files in
    // mtime order — so without this, a staged "ts-sorted" corpus arrives
    // shuffled at file granularity, the watermark jumps to the
    // furthest-ahead file, and every file delivered behind it is dropped
    // as late (measured: 2 of 8 files' attribution pairs silently lost at
    // gate scale). Setting strictly ascending mtimes in part order (=
    // ts-range order) makes arrival genuinely event-time-ordered — the
    // production firehose shape the sections claim to model.
    def orderArrival(dir0: String): Unit = {
      val parts = new java.io.File(dir0).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val base = System.currentTimeMillis()
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(base + i * 1000L) }
    }

    // The watermark delay the STAGED arrival actually needs — the r12
    // rule that every withWatermark reads a derived dial, applied at the
    // granularity the file source really has (the library's own
    // file-arrival derivation, so the path production callers use is
    // the one being soaked). Range-partitioned ts-sorted staging
    // measures 0 → the 1 µs floor; any staging regression (the r11
    // mtime-shuffle trap) would surface here as a huge derived delay
    // instead of silently dropping rows.
    def stagedArrivalDelayUs(stagedDir: String): Long =
      streaming.Events.deriveFileArrivalDelayUs(spark, stagedDir)

    // Run a streaming section at ITS OWN derived shuffle-partition count
    // (the r11 verdict's dial: size spark.sql.shuffle.partitions for a
    // stateful job to its STATE volume, not its core count) through the
    // library's own wrapper, so the path production callers use is the
    // one being soaked.
    def atDerivedPartitions[A](stateRows: Long)(f: Int => A): A =
      streaming.Events.withDerivedStatefulPartitions(
        spark, dir, Some(stateRows))(f)

    // st9: the timeout-armed funnel machine driven over the REAL events
    // corpus through a file-source readStream — the st8-to-watermark
    // methodology applied to STATE SIZE (r10 verdict #7). The corpus
    // parquet is not time-ordered, and an unordered file stream would
    // advance the watermark to ~max after one batch and drop everything
    // later as late (a vacuously tiny state) — so the section stages a
    // range-partitioned ts-sorted copy (the arrival shape a production
    // firehose actually has) and streams it one file per micro-batch.
    // The claim under test: peak state rows are bounded by the keys of
    // the watermark's trailing day window (~the busiest adjacent days,
    // ledgered alongside), NOT by the stream-lifetime (user, day) key
    // count — the property that lets st9 run forever on a firehose.
    if (wanted("st9")) {
      val sp = spark; import sp.implicits._
      val staged = s"/tmp/graft_soak_st9_${dir.hashCode & Int.MaxValue}"
      val ev = sources.Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val nFiles = 64
      ev.repartitionByRange(nFiles, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(s"$staged/events.parquet")
      orderArrival(s"$staged/events.parquet")
      val perDay = ev.groupBy(to_date(col("ts")).as("d"))
        .agg(countDistinct(col("user_id")).as("k"))
        .orderBy(col("d")).collect().map(_.getLong(1))
      untimed("st9_total_user_days",
        ev.select(col("user_id"), to_date(col("ts"))).distinct().count())
      untimed("st9_max_day_keys", perDay.max)
      // the state-rows input is the LIBRARY's dial since r13
      // (Events.funnelStateHorizonKeys, surfaced as d26 row
      // st9_funnel_partitions) — SoakDiag consumes the replayed row
      // rather than re-deriving it ad hoc, same convention as st10/st11
      val maxAdjacent = streaming.Events.funnelStateHorizonKeys(spark, dir)
      untimed("st9_max_adjacent_day_keys", maxAdjacent)
      val st9DelayUs = stagedArrivalDelayUs(staged)
      untimed("st9_derived_delay_us", st9DelayUs)
      val emitted = new java.util.concurrent.atomic.LongAdder
      var peakState = 0L
      var nBatches = 0L
      // state = live (user, day) keys, bounded by the adjacent-day key
      // count — that measured bound is the derivation's state-rows input
      atDerivedPartitions(maxAdjacent) { p =>
        untimed("st9_derived_partitions", p)
        time("st9_stream_wall") {
          val schema = spark.read.parquet(s"$staged/events.parquet").schema
          val src = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$staged/events.parquet")
          val ds = src.select(col("user_id"), to_date(col("ts")).as("day"),
              unix_micros(col("ts")).as("us"), col("event_id"),
              col("event_type"), col("ts"))
            .as[streaming.Events.FunnelEventTs]
          val q = streaming.Events.funnelStagesExpiringOf(ds, st9DelayUs)
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$staged/ckpt")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[streaming.Events.FunnelStageRow],
               _: Long) => emitted.add(b.count())
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val progressed = q.recentProgress.filter(_.stateOperators.nonEmpty)
          peakState =
            if (progressed.isEmpty) 0L
            else progressed.map(_.stateOperators(0).numRowsTotal).max
          nBatches = q.recentProgress.length.toLong
          emitted.sum()
        }
      }
      untimed("st9_peak_state_rows", peakState)
      untimed("st9_batches", nBatches)
      // the staged copy + checkpoint are soak-host disk — remove
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(staged))
    }

    // st10: the stream-stream attribution join driven over the REAL
    // events corpus — st9's state-size methodology applied to the
    // symmetric-hash JOIN state. Same staging (ts-sorted range-
    // partitioned copy, one file per micro-batch: the arrival shape of a
    // production firehose); the claim under test is twofold: (1) the
    // streamed pair multiset COUNT equals the batch query's at soak
    // scale, and (2) peak join state is bounded by the arrival
    // granularity (the trailing micro-batch's click+purchase rows — the
    // watermark advances once per batch, so eviction lags one file span)
    // plus the 70-minute match horizon, NOT by the lifetime
    // click+purchase count.
    if (wanted("st10")) {
      val staged = s"/tmp/graft_soak_st10_${dir.hashCode & Int.MaxValue}"
      val ev = sources.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .filter(col("event_type").isin("click", "purchase"))
      val nFiles = 64
      ev.repartitionByRange(nFiles, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(s"$staged/events.parquet")
      orderArrival(s"$staged/events.parquet")
      untimed("st10_total_cp_events", ev.count())
      // the busiest 70-minute event-time window (60-min match window +
      // 10-min watermark): 10-min cells, max sliding 7-cell sum
      val cells = ev.groupBy((unix_micros(col("ts")) / 600000000L).as("cell"))
        .count().orderBy(col("cell")).collect().map(_.getLong(1))
      untimed("st10_max_70min_cp",
        if (cells.length < 7) cells.sum
        else cells.sliding(7).map(_.sum).max)
      // the arrival-granularity floor: the largest single staged file
      untimed("st10_max_batch_cp",
        spark.read.parquet(s"$staged/events.parquet")
          .groupBy(input_file_name()).count()
          .agg(max(col("count"))).collect()(0).getLong(0))
      untimed("st10_batch_pairs",
        streaming.Events.attributedPairs(spark, dir).count())
      val st10DelayUs = stagedArrivalDelayUs(staged)
      untimed("st10_derived_delay_us", st10DelayUs)
      val horizonRows = streaming.Events.attributionStateHorizonRows(spark, dir)
      untimed("st10_horizon_rows", horizonRows)
      var peakState = 0L
      var nBatches = 0L
      atDerivedPartitions(horizonRows) { p =>
        untimed("st10_derived_partitions", p)
        time("st10_stream_wall") {
          val schema = spark.read.parquet(s"$staged/events.parquet").schema
          // ONE source, two filtered branches — two independent sources
          // drift onto different files per trigger (nondeterministic
          // mtime tie-breaks) and lose whole files' pairs to the watermark;
          // see the streamingAttributedPairs scaladoc for the measurement
          val src = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$staged/events.parquet")
          val d = streaming.Events.watermarkDelayString(st10DelayUs)
          val joined = streaming.Events.attributionJoin(
            src.filter(col("event_type") === "click")
              .select(col("event_id").as("click_id"), col("user_id"),
                col("ts").as("click_ts"))
              .withWatermark("click_ts", d),
            src.filter(col("event_type") === "purchase")
              .select(col("event_id").as("purchase_id"),
                col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
              .withWatermark("purchase_ts", d),
            streaming.Events.AttributionWindowMinutes)
          val emitted = new java.util.concurrent.atomic.LongAdder
          val q = joined.writeStream.outputMode("append")
            .option("checkpointLocation", s"$staged/ckpt")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              emitted.add(b.count())
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val progressed = q.recentProgress.filter(_.stateOperators.nonEmpty)
          peakState =
            if (progressed.isEmpty) 0L
            else progressed.map(_.stateOperators(0).numRowsTotal).max
          nBatches = q.recentProgress.length.toLong
          emitted.sum()
        }
      }
      untimed("st10_peak_state_rows", peakState)
      untimed("st10_batches", nBatches)
      def rm10(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm10)
        f.delete(); ()
      }
      rm10(new java.io.File(staged))
    }

    // st11: the LEFT-OUTER twin over the same staged arrival shape. Two
    // claims: (1) emitted rows = the batch query's matched rows plus a
    // null verdict for every organic purchase the final watermark can
    // prove (all but the trailing ~delay — the watermark dies with the
    // data on a finite replay, so emitted lands between the provable
    // floor and the batch total); (2) outer state stays in the same
    // arrival-granularity envelope as the inner join's.
    if (wanted("st11")) {
      val staged = s"/tmp/graft_soak_st11_${dir.hashCode & Int.MaxValue}"
      val ev = sources.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .filter(col("event_type").isin("click", "purchase"))
      ev.repartitionByRange(64, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(s"$staged/events.parquet")
      orderArrival(s"$staged/events.parquet")
      val batchRows = streaming.Events.attributionOuter(spark, dir)
      untimed("st11_batch_rows", batchRows.count())
      untimed("st11_batch_organic",
        batchRows.filter(col("click_id").isNull).count())
      val st11DelayUs = stagedArrivalDelayUs(staged)
      // the r12 DRAIN: one sentinel click+purchase file (reserved
      // user_id, invisible by construction — see drainSentinelEvents;
      // an explicit user_id filter would be pushed below the watermark
      // node by Catalyst and neuter the drain) staged as the LAST
      // arrival closes the finite replay's watermark horizon — streamed
      // verdicts below must equal batch rows EXACTLY, not "all but the
      // trailing ~delay" (the r11 caveat this removes)
      locally {
        val stagedDir = new java.io.File(s"$staged/events.parquet")
        def partsNow() = stagedDir.listFiles()
          .filter(_.getName.startsWith("part-"))
        val before = partsNow().map(_.getName).toSet
        val schema0 = spark.read.parquet(s"$staged/events.parquet").schema
        val maxTsUs = ev.agg(max(unix_micros(col("ts"))))
          .collect()(0).getLong(0)
        streaming.Events.drainSentinelEvents(spark, schema0, maxTsUs,
            streaming.Events.AttributionWindowMinutes, st11DelayUs)
          .coalesce(1).write.mode("append").parquet(s"$staged/events.parquet")
        // the staged corpus carries orderArrival's future mtimes, so the
        // fresh drain file is NOT automatically newest — pin it last
        val after = partsNow()
        val lastStaged = after.filter(f => before(f.getName))
          .map(_.lastModified).max
        after.filterNot(f => before(f.getName))
          .foreach(_.setLastModified(lastStaged + 60000L))
        ()
      }
      val horizonRows11 = streaming.Events.attributionStateHorizonRows(spark, dir)
      var peakState = 0L
      var nBatches = 0L
      atDerivedPartitions(horizonRows11) { p =>
        untimed("st11_derived_partitions", p)
        time("st11_outer_stream_wall") {
          val schema = spark.read.parquet(s"$staged/events.parquet").schema
          val src = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$staged/events.parquet")
          val d = streaming.Events.watermarkDelayString(st11DelayUs)
          val joined = streaming.Events.attributionOuterJoin(
            src.filter(col("event_type") === "purchase")
              .select(col("event_id").as("purchase_id"),
                col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
              .withWatermark("purchase_ts", d),
            src.filter(col("event_type") === "click")
              .select(col("event_id").as("click_id"), col("user_id"),
                col("ts").as("click_ts"))
              .withWatermark("click_ts", d),
            streaming.Events.AttributionWindowMinutes)
          val emitted = new java.util.concurrent.atomic.LongAdder
          val q = joined.writeStream.outputMode("append")
            .option("checkpointLocation", s"$staged/ckpt")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              emitted.add(b.count())
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val progressed = q.recentProgress.filter(_.stateOperators.nonEmpty)
          peakState =
            if (progressed.isEmpty) 0L
            else progressed.map(_.stateOperators(0).numRowsTotal).max
          nBatches = q.recentProgress.length.toLong
          emitted.sum()
        }
      }
      untimed("st11_peak_state_rows", peakState)
      untimed("st11_batches", nBatches)
      def rm11(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm11)
        f.delete(); ()
      }
      rm11(new java.io.File(staged))
    }

    // t34 (r13): the curation funnel at soak scale — the composition's
    // wall is judged against the sum of its constituent stages (t1/t9/t2
    // passes + d2-shape PPJoin over the gated subset + CC + d8 decon),
    // and the per-stage survivor counts ride the ledger so the funnel's
    // cut structure at 10×/30×/100× is a recorded fact, not a guess
    locally {
      var stages = Array.empty[(String, Long)]
      time("t34_funnel") {
        val rows = operators.Curation.curationFunnel(spark, dir).collect()
        stages = rows.map(r => r.getString(0) -> r.getLong(1))
        stages.find(_._1 == "7_source_cap").map(_._2).getOrElse(0L)
      }
      stages.foreach { case (s, n) => untimed(s"t34_${s}_docs", n) }
    }

    // s20 (r13): the vector sanity gate at soak scale — one distributive
    // map-side pass + a 1-row fold, so the wall must track the scan and
    // nothing else (the cheapest query in the family, by design)
    locally {
      var clean = 0L
      time("s20_vector_sanity") {
        val r = operators.Similarity.vectorSanityReport(spark, dir)
          .collect()(0)
        clean = r.getAs[Long]("n_clean")
        r.getAs[Long]("n_vectors")
      }
      untimed("s20_clean_vectors", clean)
    }

    // t35 (r13): the token-budget curve at soak scale — one cached t1
    // pass + driver-sized per-score statistics + a conditional aggregate
    // per grid point; the wall must track the corpus pass, not the grid
    // width, and the curve's kept-tokens column at the tightest budget
    // rides the ledger as the cut's recorded fact
    locally {
      var tightest = 0L
      time("t35_budget_curve") {
        val rows = operators.TextAnalysis.tokenBudgetCurve(spark, dir)
          .collect()
        tightest = rows.map(r => r.getAs[Long]("kept_tokens")).min
        rows.length.toLong
      }
      untimed("t35_tightest_kept_tokens", tightest)
    }

    // m20 (r14): the REGISTERED incremental probe shape at soak scale —
    // wall + output volume, plus the planted-twin invariant riding the
    // soak as a correctness pin: every even (corpus) doc's re-keyed twin
    // must retrieve its original at hamming 0, so the hamming-0
    // planted-pair count must EQUAL the corpus-side doc count.
    locally {
      var planted = 0L
      var evens = 0L
      time("m20_planted_probe") {
        val pairs = multimodal.Multimodal.incrementalMediaPlanted(spark, dir)
          .cache()
        val n = pairs.count()
        planted = pairs.filter(
          col("hamming") === 0L &&
            col("batch_id") - lit(multimodal.Multimodal.MediaPlantOffset)
              === col("corpus_id")).count()
        pairs.unpersist()
        n
      }
      if (wanted("m20")) {
        evens = sources.Tables.documentsParallel(spark, dir)
          .filter(col("doc_id") % 2 === 0).count()
        untimed("m20_planted_twins", planted)
        untimed("m20_corpus_docs", evens)
        untimed("m20_twins_complete", if (planted == evens) 1L else 0L)
      }
    }

    // t17cap (r14): the per-source cap's skew story, measured — the r13
    // verdict's finding was that the window form sorts a dominant
    // source's whole extent in ONE task. Reassign sources so one mega
    // source owns HALF the corpus (the realistic web-crawl shape the
    // driver's balanced `source` column never exhibits), then price the
    // same top-10 election both ways on one cached (doc_id, source,
    // quality) frame: the r13 window spelling (running survivor count
    // under the per-source order) vs the shipped bounded TopCapAgg
    // election (state ≤ cap per source per partition, map-side
    // combined). Kept sets must be IDENTICAL — the equality rides the
    // ledger as a pin; the wall gap is the single-partition-sort tax.
    if (wanted("t17cap")) {
      val cap = operators.Curation.CapPerSource
      val skewed = sources.Tables.documentsParallel(spark, dir)
        .select(col("doc_id"))
        .join(operators.TextAnalysis.textStats(spark, dir)
          .select(col("doc_id"), col("quality_score")), "doc_id")
        .withColumn("source",
          when(col("doc_id") % 2 === 0, lit("mega"))
            .otherwise(concat(lit("src_"), col("doc_id") % 20)))
        .withColumn("cand", lit(true))
        .cache()
      untimed("t17cap_rows", skewed.count())
      var keptW: Set[Long] = Set.empty
      var keptB: Set[Long] = Set.empty
      time("t17cap_window") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality_score").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        keptW = skewed
          .withColumn("kept",
            sum(when(col("cand"), 1L).otherwise(0L)).over(w) <= cap)
          .filter(col("kept")).select("doc_id")
          .collect().map(_.getLong(0)).toSet
        keptW.size.toLong
      }
      time("t17cap_bounded") {
        keptB = operators.Curation.keptPerSource(skewed, "cand", cap)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        keptB.size.toLong
      }
      untimed("t17cap_equal", if (keptW == keptB) 1L else 0L)
      skewed.unpersist()
      ()
    }

    println("[soakdiag-json] " + out.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"dir":"$dir",""", ",", "}"))
    spark.stop()
  }
}
