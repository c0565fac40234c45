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
}
