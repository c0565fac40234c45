package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more queries —
  * used to audit pushdown (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen coverage.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // print the real computation, not the localCheckpoint truncation the
    // bench path uses to bound suite-wide memory (see PlanCapture)
    System.setProperty(graft.operators.PlanCapture.Prop, "1")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      // under PlanCapture the queries skip materializeAndRelease's
      // unpersist (the InMemoryRelation barriers are part of the printed
      // plan), so a multi-query Explain session would accumulate every
      // query's caches — clear them between queries to stay bounded
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
