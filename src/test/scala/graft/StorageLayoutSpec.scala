package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout levers for 100 TB: bucketing (pre-shuffled tables make
  * repeated joins/aggregations on the bucket key shuffle-free) and
  * dt-partitioned layouts (partition pruning turns a time filter into a
  * directory listing). Exercised end-to-end against a throwaway warehouse.
  */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect {
      case _: ShuffleExchangeExec => 1
      case a: AdaptiveSparkPlanExec => countShuffles(a.inputPlan)
    }.sum

  test("bucketed tables join without a shuffle on the bucket key") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf that cannot change on a live session. The in-memory
    // catalog forgets tables between JVMs while their files persist, so
    // remove the locations too.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }

    graft.sources.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.sources.Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"))

    // disable auto-broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffles = countShuffles(joined.queryExecution.executedPlan)
      // only the final groupBy may shuffle; the join itself must not
      assert(shuffles <= 1, s"bucketed join still shuffles ($shuffles):\n" +
        joined.queryExecution.executedPlan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("persisted corpus band index: probe is exchange-free on the corpus side, output equals d11") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // fresh bucketed tables in the throwaway warehouse
    Seq("corpus_index_shingles", "corpus_index_bands").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    graft.operators.Dedup.persistCorpusBandIndex(spark, sf, buckets = 8)

    def scansOf(p: SparkPlan, substr: String): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(substr)) => Seq(s)
        case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan, substr)
      }.flatten

    // force the shuffle-join path (a broadcast would trivially pass)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = graft.operators.Dedup
        .incrementalDedupFromIndex(spark, sf, release = false)
      val plan = probe.queryExecution.executedPlan
      assert(scansOf(plan, "corpus_index_bands").nonEmpty, s"bands table not scanned:\n$plan")
      assert(scansOf(plan, "corpus_index_shingles").nonEmpty, "shingle table not scanned")
      // for every sort-merge join, a child subtree that reads an index
      // table must contain NO shuffle — the bucketed layout IS its
      // distribution; only the batch side may exchange
      def joins(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
        case j: SortMergeJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joins(a.inputPlan)
      }.flatten
      val corpusSides = joins(plan).flatMap(j => Seq(j.left, j.right))
        .filter(side => scansOf(side, "corpus_index").nonEmpty)
      assert(corpusSides.nonEmpty, s"no join hangs off the index tables:\n$plan")
      corpusSides.foreach { side =>
        assert(countShuffles(side) == 0,
          s"corpus side of a probe join shuffles:\n$side")
      }
      // identical output to the computed-per-run d11
      val fromIndex = probe.collect().map(_.toSeq).toSet
      val recomputed = graft.operators.Dedup.incrementalDedup(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(fromIndex == recomputed, "index probe diverged from d11")
      assert(fromIndex.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("persisted containment index: probe is exchange-free on the corpus side, output equals d27") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    Seq("containment_index_cdocs", "containment_index_cdf",
        "containment_index_cfull").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    graft.operators.Dedup.persistContainmentIndex(spark, sf, buckets = 8)

    def scansOf(p: SparkPlan, substr: String): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(substr)) => Seq(s)
        case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan, substr)
      }.flatten

    // force the shuffle-join path (a broadcast would trivially pass)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (probe, probeCaches) = graft.operators.Dedup
        .incrementalContainmentFromIndexVerified(spark, sf)
      val plan = probe.queryExecution.executedPlan
      assert(scansOf(plan, "containment_index_cfull").nonEmpty,
        s"cfull table not scanned:\n$plan")
      assert(scansOf(plan, "containment_index_cdocs").nonEmpty,
        "cdocs table not scanned")
      // (the _cdf order-lookup scan sits INSIDE the cached batch-order
      // subtree — an InMemoryRelation's child plan is not part of this
      // operator tree, so it cannot be collect()ed here; the two scans
      // asserted above are the ones the exchange-free claim is about)
      // every sort-merge-join subtree that reads an index table must be
      // exchange-free — the bucketed layout IS its distribution; only
      // the batch side may shuffle
      def joins(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
        case j: SortMergeJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joins(a.inputPlan)
      }.flatten
      val corpusSides = joins(plan).flatMap(j => Seq(j.left, j.right))
        .filter(side => scansOf(side, "containment_index").nonEmpty)
      assert(corpusSides.nonEmpty, s"no join hangs off the index tables:\n$plan")
      corpusSides.foreach { side =>
        assert(countShuffles(side) == 0,
          s"corpus side of a containment probe join shuffles:\n$side")
      }
      val fromIndex = probe.collect().map(_.toSeq).toSet
      val recomputed = graft.operators.Dedup
        .incrementalContainmentDedup(spark, sf).collect().map(_.toSeq).toSet
      assert(fromIndex == recomputed, "index probe diverged from d27")
      assert(fromIndex.nonEmpty)
      probeCaches.foreach(_.unpersist())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("live-index drift audit: the frozen side reads _cfull exchange-free") {
    // the r13 audit's scale claim: pricing what probes pay costs ONE
    // bucketed scan + per-bucket aggregation — `_cfull` is bucketed by
    // `s`, so the per-shingle histogram groupBy needs no exchange; only
    // the final single-row fold may shuffle. (The fresh side re-positions
    // under a re-derived order — a per-doc window, inherently one
    // shuffle — so the cheap-observability claim is about the frozen
    // side, the one a monitoring loop would run continuously.)
    graft.operators.Dedup.persistContainmentIndex(spark, sf,
      prefix = "r13_audit_layout", buckets = 8,
      corpusFilter = col("doc_id") % 2 === 0)
    val full = spark.table("r13_audit_layout_cfull")
    val bound = col("n") -
      ceil(col("n").cast("double") * 0.8 - 1e-9) + 1
    val frozen = graft.operators.Dedup.volumeOfPrefixFlags(
      full.select(col("s"), (col("j") < bound).cast("long").as("p")),
      "frozen_live")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffles = countShuffles(frozen.queryExecution.executedPlan)
      assert(shuffles <= 1,
        s"frozen-side audit shuffles beyond the global fold ($shuffles):\n" +
          frozen.queryExecution.executedPlan)
      assert(frozen.collect()(0).getAs[Long]("candidate_rows") > 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("corpus index retraction: tables rewritten minus ids, probe output = filtered d11, still bucketed") {
    import org.apache.spark.sql.functions.col
    // fresh index under its own prefix so test order cannot matter
    Seq("retract_index_shingles", "retract_index_bands").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    graft.operators.Dedup.persistCorpusBandIndex(spark, sf,
      prefix = "retract_index", buckets = 8)
    val baseline = graft.operators.Dedup
      .incrementalDedupFromIndex(spark, sf, prefix = "retract_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(baseline.nonEmpty)
    // retract two corpus docs that actually participate in matches
    val victims = baseline.map(_._2).toSeq.sorted.take(2)
    graft.operators.Dedup.retractFromCorpusIndex(spark, victims,
      prefix = "retract_index", buckets = 8)
    // index tables no longer hold the ids
    victims.foreach { v =>
      assert(spark.table("retract_index_shingles")
        .filter(col("doc_id") === v).isEmpty, s"shingles still hold $v")
      assert(spark.table("retract_index_bands")
        .filter(col("doc_id") === v).isEmpty, s"bands still hold $v")
    }
    // probe output = baseline minus pairs whose corpus side was retracted
    val after = graft.operators.Dedup
      .incrementalDedupFromIndex(spark, sf, prefix = "retract_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == baseline.filterNot(p => victims.contains(p._2)),
      "probe after retraction diverged from the filtered baseline")
    // the rewritten tables are still bucketed: the probe's corpus sides
    // stay exchange-free under a forced shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.operators.Dedup
        .incrementalDedupFromIndex(spark, sf, prefix = "retract_index",
          release = false)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("retract_index")) => Seq(s)
        case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
      }.flatten
      def joins(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
        case j: SortMergeJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joins(a.inputPlan)
      }.flatten
      val corpusSides = joins(plan).flatMap(j => Seq(j.left, j.right))
        .filter(side => scansOf(side).nonEmpty)
      assert(corpusSides.nonEmpty, s"no join hangs off the rewritten index:\n$plan")
      corpusSides.foreach(side => assert(countShuffles(side) == 0,
        s"rewritten corpus side shuffles:\n$side"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("dt-partitioned layout prunes partitions under a date filter") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.sources.Tables.orders(spark, sf)
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("dt").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("dt") === "1995-03")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.isDefined)
    assert(scan.get.metadata("PartitionFilters").contains("dt"),
      s"no partition filter: ${scan.get.metadata}")
    val nParts = scan.get.relation.location.listFiles(
      scan.get.partitionFilters, Nil).length
    assert(nParts == 1, s"expected 1 pruned partition, scanned $nParts")
  }

  private def dropIndexTables(prefix: String, sufs: Seq[String]): Unit =
    sufs.foreach { suf =>
      val t = s"$prefix$suf"
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      val dir = new java.io.File(s"spark-warehouse/${t.toLowerCase}")
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
  private val CSufs = Seq("_cdocs", "_cdf", "_cfull")
  private def containmentProbe(prefix: String): Set[(Long, Long, Double)] =
    graft.operators.Dedup
      .incrementalContainmentFromIndex(spark, sf, prefix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("containment index append: frozen-order fold, probe equals a fresh rebuild, still bucketed") {
    dropIndexTables("capp_idx", CSufs)
    dropIndexTables("capp_ref", CSufs)
    // reference: a fresh index over the FULL even corpus, and its probe
    graft.operators.Dedup.persistContainmentIndex(spark, sf,
      prefix = "capp_ref", buckets = 8)
    val rebuilt = containmentProbe("capp_ref")
    assert(rebuilt.nonEmpty)
    // split the even corpus at the median PARTICIPATING corpus id, so the
    // appended half provably carries pairs (a vacuous append would let
    // this test pass on an untouched index)
    val corpusIds = rebuilt.map(_._2).toSeq.sorted
    val k = corpusIds(corpusIds.length / 2)
    graft.operators.Dedup.persistContainmentIndex(spark, sf,
      prefix = "capp_idx", buckets = 8,
      corpusFilter = col("doc_id") % 2 === 0 && col("doc_id") < k)
    val before = containmentProbe("capp_idx")
    assert(before != rebuilt, s"no reference pair has corpus_id >= $k")
    graft.operators.Dedup.appendToContainmentIndex(spark, sf,
      appendFilter = col("doc_id") % 2 === 0 && col("doc_id") >= k,
      prefix = "capp_idx", buckets = 8)
    // the frozen-order fold finds exactly the fresh rebuild's pairs, even
    // though the rebuild re-derived df over the full corpus (any ONE
    // consistent total order preserves the exact-verify survivors)
    assert(containmentProbe("capp_idx") == rebuilt,
      "post-append probe diverged from the rebuilt-index probe")
    // re-appending an indexed id is refused, not silently doubled
    val dup = intercept[IllegalArgumentException] {
      graft.operators.Dedup.appendToContainmentIndex(spark, sf,
        appendFilter = col("doc_id") % 2 === 0 && col("doc_id") >= k,
        prefix = "capp_idx", buckets = 8)
    }
    assert(dup.getMessage.contains("already indexed"))
    // the appended table files keep the bucket spec: the probe's corpus
    // sides stay exchange-free under a forced shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (probe, caches) = graft.operators.Dedup
        .incrementalContainmentFromIndexVerified(spark, sf, "capp_idx")
      val plan = probe.queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("capp_idx")) => Seq(s)
        case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
      }.flatten
      def joins(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
        case j: SortMergeJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joins(a.inputPlan)
      }.flatten
      val corpusSides = joins(plan).flatMap(j => Seq(j.left, j.right))
        .filter(side => scansOf(side).nonEmpty)
      assert(corpusSides.nonEmpty, s"no join hangs off the appended index:\n$plan")
      corpusSides.foreach(side => assert(countShuffles(side) == 0,
        s"appended corpus side shuffles:\n$side"))
      caches.foreach(_.unpersist())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("containment index retraction: _cdf stays frozen, probe equals a rebuild without the ids, still bucketed") {
    dropIndexTables("cret_idx", CSufs)
    dropIndexTables("cret_ref", CSufs)
    graft.operators.Dedup.persistContainmentIndex(spark, sf,
      prefix = "cret_idx", buckets = 8)
    val baseline = containmentProbe("cret_idx")
    assert(baseline.nonEmpty)
    val victims = baseline.map(_._2).toSeq.sorted.take(2)
    val cdfBefore = spark.table("cret_idx_cdf").count()
    graft.operators.Dedup.retractFromContainmentIndex(spark, victims,
      prefix = "cret_idx", buckets = 8)
    // corpus tables no longer hold the ids; the order definition is intact
    victims.foreach { v =>
      assert(spark.table("cret_idx_cdocs")
        .filter(col("doc_id") === v).isEmpty, s"cdocs still holds $v")
      assert(spark.table("cret_idx_cfull")
        .filter(col("doc_id") === v).isEmpty, s"cfull still holds $v")
    }
    assert(spark.table("cret_idx_cdf").count() == cdfBefore,
      "_cdf must stay frozen through a retraction")
    val after = containmentProbe("cret_idx")
    // under the frozen order, retraction removes exactly the victims' pairs
    assert(after == baseline.filterNot(p => victims.contains(p._2)),
      "post-retract probe diverged from the filtered baseline")
    // and equals a fresh index built WITHOUT the ids (whose df order
    // differs — same exact-verify survivors)
    graft.operators.Dedup.persistContainmentIndex(spark, sf,
      prefix = "cret_ref", buckets = 8,
      corpusFilter = col("doc_id") % 2 === 0 && !col("doc_id").isin(victims: _*))
    assert(after == containmentProbe("cret_ref"),
      "post-retract probe diverged from the rebuilt-without-ids probe")
    // rewritten tables keep the bucket spec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (probe, caches) = graft.operators.Dedup
        .incrementalContainmentFromIndexVerified(spark, sf, "cret_idx")
      val plan = probe.queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("cret_idx")) => Seq(s)
        case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
      }.flatten
      def joins(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
        case j: SortMergeJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joins(a.inputPlan)
      }.flatten
      val corpusSides = joins(plan).flatMap(j => Seq(j.left, j.right))
        .filter(side => scansOf(side).nonEmpty)
      assert(corpusSides.nonEmpty, s"no join hangs off the rewritten index:\n$plan")
      corpusSides.foreach(side => assert(countShuffles(side) == 0,
        s"rewritten corpus side shuffles:\n$side"))
      caches.foreach(_.unpersist())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("persisted IVF index: the probe's corpus scan is dynamically " +
    "partition-pruned to the probed cells") {
    // the s16 scan-fraction promise made physical: _icell is partitioned
    // by cent_id, the probe side is broadcast, so dynamic partition
    // pruning must restrict the corpus scan to the cells some query
    // ranks in its top nprobe — the other directories are never opened
    graft.operators.Similarity.persistIvfIndex(spark, sf, "layout_ivf_idx")
    val probe = graft.operators.Similarity
      .annIvfFromIndex(spark, sf, "layout_ivf_idx")
    val plan = probe.queryExecution.executedPlan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("layout_ivf_idx_icell")) => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
    }.flatten
    val scans = scansOf(plan)
    assert(scans.nonEmpty, s"no _icell scan in the probe plan:\n$plan")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.toString.contains("dynamicpruning")),
        s"_icell scan carries no dynamic partition pruning filter:\n$s")
    }
    // and the pruning is real: after execution the scan's partition
    // metric must equal EXACTLY the number of distinct cells the query
    // set ranks into its top nprobe — not the table's full directory
    // count
    // collect() (NOT count(), which plans a separate aggregate query)
    // executes THIS queryExecution, populating its scan metrics
    assert(probe.collect().length > 0)
    // AQE replaces the captured initial plan — read the metric off the
    // FINAL adaptive plan's scan, after execution
    def finalScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("layout_ivf_idx_icell")) => Seq(s)
      case a: AdaptiveSparkPlanExec => finalScans(a.executedPlan)
      // materialized stages are leaf nodes in the final adaptive plan —
      // the scan lives inside
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        finalScans(st.plan)
    }.flatten
    val probedCells = graft.operators.Similarity
      .probedCellsOf(spark, sf, "layout_ivf_idx").count()
    val totalCells = spark.table("layout_ivf_idx_icell")
      .select(col("cent_id")).distinct().count()
    val executed = finalScans(probe.queryExecution.executedPlan)
    assert(executed.nonEmpty, "no _icell scan in the final adaptive plan")
    executed.head.metrics.get("numPartitions").map(_.value).foreach { read =>
      assert(read == probedCells.min(totalCells),
        s"scan read $read partition dirs; probed cells = $probedCells, " +
          s"table holds $totalCells")
    }
    graft.operators.Similarity.dropIvfTables(spark, "layout_ivf_idx")
  }

  test("persisted PQ index: the probe's corpus-sized scans read codes " +
    "and buckets, never vectors") {
    // the s18 hot/cold promise made physical: the candidate join reads
    // (vec_id, bucket) and the coarse stage (vec_id, codes) — column
    // pruning keeps the stored full-precision vectors out of every
    // corpus-sized scan of _pcode; vectors are read only by model-sized
    // tails (the dir-side exact rerank of nQ·shortlist rows, and
    // rebuilds)
    graft.operators.Similarity.persistPqIndex(spark, sf, "layout_pq_idx")
    val probe = graft.operators.Similarity
      .annPqFromIndex(spark, sf, "layout_pq_idx")
    val plan = probe.queryExecution.executedPlan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths
          .exists(_.toString.contains("layout_pq_idx_pcode")) => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
    }.flatten
    val scans = scansOf(plan)
    assert(scans.nonEmpty, s"no _pcode scan in the probe plan:\n$plan")
    scans.foreach { s =>
      assert(!s.requiredSchema.fieldNames.contains("embedding"),
        s"a corpus-sized _pcode scan reads the full vectors:\n$s")
    }
    // and the probe still answers off the pruned columns
    assert(probe.collect().length > 0)
    graft.operators.Similarity.dropPqTables(spark, "layout_pq_idx")
  }

  test("persisted IVF-PQ index: ONE corpus-sided scan, partition-pruned " +
    "to the probed cells AND column-pruned off the stored vectors") {
    // the s22 composition's whole point made physical: the `_xcell` scan
    // must carry BOTH pruning axes at once — dynamic partition pruning
    // to the probed cells (the s16 property) and a required schema
    // without `embedding` (the s18 property) — and there must be exactly
    // one such corpus-sided scan in the plan (candidates and codes ride
    // the same rows)
    graft.operators.Similarity.persistIvfPqIndex(spark, sf, "layout_xpq_idx")
    val probe = graft.operators.Similarity
      .annIvfPqFromIndex(spark, sf, "layout_xpq_idx")
    val plan = probe.queryExecution.executedPlan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths
          .exists(_.toString.contains("layout_xpq_idx_xcell")) => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
    }.flatten
    val scans = scansOf(plan)
    assert(scans.size == 1,
      s"expected exactly ONE _xcell scan, found ${scans.size}:\n$plan")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.toString.contains("dynamicpruning")),
        s"_xcell scan carries no dynamic partition pruning filter:\n$s")
      assert(!s.requiredSchema.fieldNames.contains("embedding"),
        s"the _xcell scan reads the stored full vectors:\n$s")
    }
    assert(probe.collect().length > 0)
    // the pruning is real: the executed scan's partition metric equals
    // the distinct probed-cell count (the s16 assertion, on the
    // composed index's own quantizer)
    def finalScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths
          .exists(_.toString.contains("layout_xpq_idx_xcell")) => Seq(s)
      case a: AdaptiveSparkPlanExec => finalScans(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        finalScans(st.plan)
    }.flatten
    val probedCells = graft.operators.Similarity
      .probedCellsOf(spark, sf, "layout_xpq_idx", "_xcent").count()
    val totalCells = spark.table("layout_xpq_idx_xcell")
      .select(col("cent_id")).distinct().count()
    val executed = finalScans(probe.queryExecution.executedPlan)
    assert(executed.nonEmpty, "no _xcell scan in the final adaptive plan")
    executed.head.metrics.get("numPartitions").map(_.value).foreach { read =>
      assert(read == probedCells.min(totalCells),
        s"scan read $read partition dirs; probed cells = $probedCells, " +
          s"table holds $totalCells")
    }
    graft.operators.Similarity.dropIvfPqTables(spark, "layout_xpq_idx")
  }

  test("persisted media band index: the probe joins `_mband` " +
    "exchange-free on the corpus side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    graft.multimodal.Multimodal.persistMediaIndex(spark, sf, "layout_midx",
      buckets = 8)
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths
          .exists(_.toString.contains("layout_midx_mband")) => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
    }.flatten
    // force the shuffle-join path (a broadcast would trivially pass)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = graft.multimodal.Multimodal
        .incrementalMediaFromIndex(spark, sf, "layout_midx")
      val plan = probe.queryExecution.executedPlan
      assert(scansOf(plan).nonEmpty, s"_mband not scanned:\n$plan")
      def joins(p: SparkPlan): Seq[SortMergeJoinExec] = p.collect {
        case j: SortMergeJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joins(a.inputPlan)
      }.flatten
      val corpusSides = joins(plan).flatMap(j => Seq(j.left, j.right))
        .filter(side => scansOf(side).nonEmpty)
      assert(corpusSides.nonEmpty, s"no join hangs off _mband:\n$plan")
      corpusSides.foreach { side =>
        assert(countShuffles(side) == 0,
          s"corpus side of the m18 probe shuffles:\n$side")
      }
      // the bucketed layout answers identically to the fresh twin
      assert(probe.collect().map(_.toSeq).toSet ==
        graft.multimodal.Multimodal.incrementalMediaFresh(spark, sf)
          .collect().map(_.toSeq).toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
