package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the dedup family — the driver's testdata tops out at
  * sf0.1, so this main manufactures an sf1-equivalent corpus by
  * replicating `documents` `factor`× (each replica's text gets a unique
  * tail token, making replicas NEAR-duplicates rather than exact ones:
  * the hardest case, because the near-dup pair count grows
  * factor²-per-group while exact-fingerprint dedup is blind to it), then
  * runs d2/d3/d6/d8/d10 end-to-end and prints one timing line each.
  *
  * The similarity mode does the analogue for `embeddings`: 10·factor
  * replicas with deterministic per-dimension pseudo-noise (replicas are
  * near — not identical — vectors, so the banded/bucketed candidate
  * machinery does real work), then runs s2/s3/d5/s4. d5 runs with the
  * at-scale banding (3 bands × 11 bits = 2048 buckets/band) — the
  * log₂(corpus/bucket) tuning its scaladoc prescribes; the 8-bit bands
  * this replaced produced 234M candidates and filled the disk (see the
  * inline note at the call site).
  *
  * Usage: runMain graft.Soak [srcSfDir] [factor] [workDir] [dedup|sim|all]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_soak")
    val mode = args.lift(3).getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[soak] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $rows%10d rows")
    }

    if (mode == "all" || mode == "dedup") {
      val base = spark.read.parquet(s"$src/documents.parquet")
      val n = base.count()
      val big = base
        .crossJoin(spark.range(factor).select(col("id").as("rep")))
        .select(
          (col("doc_id") + col("rep") * lit(10L * n)).as("doc_id"),
          concat(col("text"), lit(" uniq"), col("rep"), lit("x"), col("doc_id"))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      big.write.mode("overwrite").parquet(s"$work/documents.parquet")
      println(s"[soak] corpus: ${n * factor} docs (${factor}x $src) -> $work")
      time("d2_ngram_jaccard") {
        graft.operators.Dedup.ngramJaccardPairs(spark, work).count()
      }
      time("d3_minhash_lsh") {
        graft.operators.Dedup.minhashLshPairs(spark, work).count()
      }
      time("d6_neardup_clusters") {
        graft.operators.Dedup.nearDupClusters(spark, work).count()
      }
      time("d8_decontaminate") {
        graft.operators.Dedup.decontaminate(spark, work).count()
      }
      time("d10_dup_ngram_frac") {
        graft.operators.Dedup.dupNgramFraction(spark, work).count()
      }
    }

    if (mode == "all" || mode == "sim") {
      val eb = spark.read.parquet(s"$src/embeddings.parquet")
      val ne = eb.count()
      val embFactor = factor * 10
      val bigE = eb
        .crossJoin(spark.range(embFactor).select(col("id").as("rep")))
        .select(
          (col("vec_id") + col("rep") * lit(10L * ne)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") +
              (pmod(col("rep") * 2654435761L + i * 40503, lit(1000)) - 500)
                .cast("double") / 50000.0).cast("float")).as("embedding"),
          col("label"))
      bigE.write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      println(s"[soak] vectors: ${ne * embFactor} (${embFactor}x $src)")
      time("s2_ann_lsh_topk") {
        graft.operators.Similarity.annLshTopK(spark, work).count()
      }
      time("s3_ann_ivf_topk") {
        graft.operators.Similarity.annIvfTopK(spark, work).count()
      }
      time("d5_banded_neardup") {
        // at-scale banding: bits-per-band must keep buckets ~100 vectors
        // (the log2(corpus/bucket) rule) — 8-bit bands at 200k vectors
        // meant 780-vector buckets and 234M candidate pairs, whose
        // verify-join spill filled the disk; 11-bit bands (2048 buckets)
        // cut candidates ~60x for the same recall structure
        graft.operators.Dedup.embeddingNearDupPairs(
          spark, work, bands = 3, bandBits = 11).count()
      }
      time("s4_quantize_int8") {
        graft.operators.Similarity.quantizeInt8(spark, work).count()
      }
    }
    spark.stop()
  }
}
