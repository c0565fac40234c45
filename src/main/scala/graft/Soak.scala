package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the dedup family — the driver's testdata tops out at
  * sf0.1, so this main manufactures an sf1-equivalent corpus by
  * replicating `documents` `factor`× (each replica's text gets a unique
  * tail token, making replicas NEAR-duplicates rather than exact ones:
  * the hardest case, because the near-dup pair count grows
  * factor²-per-group while exact-fingerprint dedup is blind to it), then
  * runs d2/d3/d6/d8 end-to-end and prints one timing line each.
  *
  * Usage: runMain graft.Soak [srcSfDir] [factor] [workDir]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse("/tmp/graft_soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[soak] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $rows%10d rows")
    }
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
    spark.stop()
  }
}
