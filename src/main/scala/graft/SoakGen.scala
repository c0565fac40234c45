package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-suite soak-data generator: an sf1-equivalent directory built by
  * replicating EVERY sf0.1 table `factor`× with consistent key offsets,
  * so all 88 registered queries run unmodified at 10× the bench scale.
  *
  * Replication rules (rep = 0 is the identity copy):
  *  - dims `region`/`nation` are fixed vocabularies — copied as-is, like
  *    a real 10× corpus (more facts, same 25 nations).
  *  - every key column gets `+ rep * KeyOffset`, the SAME offset on both
  *    sides of every join, so each replica is a self-consistent star and
  *    replicas never cross-join. `KeyOffset` is divisible by every
  *    modulus the queries select with (% 50 ANN queries, % 20 d8 eval
  *    split, % 2 d11 parity), so per-replica selections mirror rep 0.
  *  - `documents` replicas get a unique tail token (the r3 Soak recipe):
  *    replicas are NEAR-duplicates of their original — the hardest dedup
  *    case — but near-dup group size is capped at [[MaxNearDupGroup]]
  *    (r7): beyond 10× the GROUP COUNT grows with the factor, not the
  *    group size, so true pair output scales linearly like a real crawl's
  *    (the uncapped factor² design exceeds single-box scratch disk at
  *    100× — see the documents replication comment).
  *  - `embeddings` replicas get deterministic per-dimension pseudo-noise
  *    (near — not identical — vectors, so banded/bucketed candidate
  *    machinery does real work).
  *
  * Usage: runMain graft.SoakGen [srcSfDir] [factor] [outDir] [--time-auto]
  * `--time-auto` additionally times the auto-scaling d5/s3/d13/d14
  * variants plus the d12 indexed probe on the generated corpus, and
  * prints the pair-growth diagnostics the soak ledger judges the
  * replica-quadratic operators by. Since r6 the registered queries
  * auto-size from corpus statistics, so these timings coincide with the
  * registered configurations at each scale.
  */
object SoakGen {
  val KeyOffset = 10000000L // divisible by 50, 20, and 2 (see scaladoc)

  /** Near-dup cluster size cap for document replicas — the 10× design's
    * group size, held constant as the factor grows (see the documents
    * replication comment for why).
    */
  val MaxNearDupGroup = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val out = args.lift(2).getOrElse("/root/repo/soakdata/sf1")
    val timeAuto = args.contains("--time-auto")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // nanos-generation events.parquet (INT64 TIMESTAMP(NANOS)) is only
    // readable as a long under this flag; the replica then carries a plain
    // BIGINT (µs-generation sources replicate their timestamp unchanged)
    // and Tables.events normalizes either encoding identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val onlyTime = args.contains("--only-time") // reuse an existing outDir

    val reps = spark.range(factor).select(col("id").as("rep"))
    def off(k: String) = (col(k) + col("rep") * lit(KeyOffset)).as(k)

    // every fact write repartitions explicitly: the replica plan is a
    // broadcast crossJoin over the (often single-row-group) source file,
    // so the write would otherwise inherit ONE partition — and a
    // one-row-group parquet caps every downstream scan at one task,
    // silently serializing the scan stage of all soak measurements
    // (caught in r6: q4 read 1M events single-threaded)
    val outParts = cpus.toInt

    /** Replicate with the named key columns offset, everything else kept. */
    def replicate(table: String, keys: Seq[String],
                  extra: DataFrame => DataFrame = identity): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val cols = base.columns.map(c => if (keys.contains(c)) off(c) else col(c))
      val big = extra(base.crossJoin(reps).select(cols.toIndexedSeq: _*))
      big.repartition(outParts)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[soakgen] $table: ${factor}x written")
    }

    if (!onlyTime) {
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[soakgen] $t: dim copied as-is")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))

    // documents: replicas are NEAR-duplicates of their original (unique
    // tail token), but near-dup GROUP SIZE is capped at MaxNearDupGroup:
    // replica r joins group gid = r / MaxNearDupGroup, and each gid > 0
    // group's text swaps every 6th token for a group marker — ~half its
    // trigram shingles change, so cross-group jaccard lands ≈ 0.33, far
    // below the 0.8 family threshold, while within-group stays ≈ 0.95.
    //
    // WHY the cap (r7): duplication-CLUSTER size is a property of the
    // data, not of the corpus scale — a 100× crawl has ~100× as many
    // dup clusters, not 100-member clusters everywhere. The uncapped
    // design makes every operator's TRUE pair output grow factor²
    // (24.75M verified pairs at 100×), and the pair-verify stages then
    // need pairs × shingle-array bytes of shuffle scratch — ~70 GB for
    // d17 alone, which is an output-size property no algorithm can
    // beat, and it exceeds single-box disk (measured: the r7 first
    // 100× full-suite attempt died disk-full inside d17). With groups
    // capped at the 10× design's size, pair count scales LINEARLY with
    // the factor beyond 10× (group count grows instead), which is the
    // engine-scaling question the soak exists to answer; at factor <= 10
    // this reduces to the old design exactly (one group), keeping the
    // 10× ledger rows comparable.
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(reps)
      .withColumn("gid", (col("rep") / MaxNearDupGroup).cast("int"))
      .select(
        (col("doc_id") + col("rep") * lit(KeyOffset)).as("doc_id"),
        when(col("gid") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "), (t, i) =>
              when(i % 6 === 5,
                concat(lit("g"), col("gid"), lit("p"), i)).otherwise(t)),
            " ")).as("grouped"),
        col("rep"), col("lang"), col("source"))
      .select(
        col("doc_id"),
        when(col("rep") === 0, col("grouped"))
          .otherwise(concat(col("grouped"), lit(" uniq"), col("rep"),
            lit("x"), col("doc_id"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(outParts)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[soakgen] documents: ${factor}x written " +
      s"(near-dup groups of ${math.min(factor, MaxNearDupGroup)})")

    // embeddings: deterministic pseudo-noise per replica dimension
    val eb = spark.read.parquet(s"$src/embeddings.parquet")
    eb.crossJoin(reps)
      .select(
        (col("vec_id") + col("rep") * lit(KeyOffset)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            (pmod(col("rep") * 2654435761L + i * 40503, lit(1000)) - 500)
              .cast("double") / 50000.0).cast("float")).as("embedding"),
        col("label"))
      .repartition(outParts)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[soakgen] embeddings: ${factor}x written (noised replicas)")
    }

    if (timeAuto || onlyTime) {
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"[soakgen] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $rows%10d rows")
      }
      time("d5_auto_banded") {
        graft.operators.Dedup.embeddingNearDupPairs(spark, out).count()
      }
      time("s3_auto_cells") {
        graft.operators.Similarity.annIvfTopK(spark, out).count()
      }
      time("d13_auto_banded") {
        graft.operators.Dedup.incrementalEmbeddingDedup(spark, out,
          bandBits = 0).count()
      }
      time("d14_auto_cells") {
        val e = spark.read.parquet(s"$out/embeddings.parquet")
        val n = e.count()
        val nl = e.select("label").distinct().count()
        graft.operators.Dedup.semanticDedup(spark, out,
          subBits = graft.operators.Similarity.deriveSubBits(n, nl)).count()
      }
      time("d12_indexed_probe") {
        graft.operators.Dedup.incrementalDedupIndexed(spark, out).count()
      }
      // r8: the s-family monitors the verdict flagged as the most
      // plausible super-linear candidates (s13 composes the s1+s2
      // retrieval stacks per run), plus their candidate-count
      // diagnostics — the "judged per-candidate" columns of the ledger
      time("s13_index_quality") {
        graft.operators.Similarity.indexQualityReport(spark, out).count()
      }
      time("s12_silhouette") {
        graft.operators.Similarity.labelSilhouette(spark, out).count()
      }
      time("s10_filtered_ann") {
        graft.operators.Similarity.annFilteredTopK(spark, out).count()
      }
      locally {
        val raw = graft.sources.Tables.embeddings(spark, out)
        val lc = graft.operators.Similarity.lshCandidates(raw).count()
        val ic = graft.operators.Similarity.ivfCandidates(raw, autoCells = true).count()
        println(s"[soakgen] s1/s13 candidate pairs: lsh=$lc ivf=$ic")
      }
      // r6 batch-7 operators: row counts double as the pair-growth
      // diagnostics (replica near-dups make true containment/cluster
      // pairs grow ~factor² per group, like d2/d12 above)
      time("d17_containment") {
        graft.operators.Dedup.containmentPairs(spark, out).count()
      }
      time("d18_quality_surv") {
        graft.operators.Dedup.qualitySurvivors(spark, out).count()
      }
      time("m6_media_clusters") {
        graft.multimodal.Multimodal.mediaDedupClusters(spark, out).count()
      }
      // pair-growth diagnostics for the soak ledger: the replica design
      // makes true near-dup GROUPS widen with the factor, so verified d12
      // pairs (printed as rows above) and d14's within-cell pair
      // evaluations (below) grow ~factor² while the corpus grows ~factor —
      // soak wall-clock for those two is judged per-pair, not per-row
      val eStats = graft.sources.Tables.embeddings(spark, out)
        .agg(count(lit(1)), countDistinct(col("label"))).collect()(0)
      val sb = graft.operators.Similarity.deriveSubBits(
        eStats.getLong(0), eStats.getLong(1))
      val (assigned, _) = graft.operators.Similarity.coarseQuantizer(
        graft.sources.Tables.embeddings(spark, out), sb)
      val cellPairs = assigned.groupBy("cent_id").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0).get(0)
      println(s"[soakgen] d14 within-cell pair evaluations: $cellPairs")
    }
    spark.stop()
  }
}
