package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; local[4] is plenty
  * for sf0.001 correctness runs).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import graft.operators.{Extended, Relational}
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and matches its declared column set") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("pivot months partition the total quantity") {
    val row = Relational.pivotMonthlyQty(spark, sf).collect()(0)
    val pivotTotal = (0 until 12).map(row.getDouble).sum
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("l_quantity")).collect()(0).getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }

  test("top1 per part: exactly one row per part present in lineitem") {
    import org.apache.spark.sql.functions._
    val top1 = Relational.top1DayPerPart(spark, sf)
    val nParts = graft.sources.Tables.lineitem(spark, sf)
      .select(countDistinct("l_partkey")).collect()(0).getLong(0)
    assert(top1.count() == nParts)
    assert(top1.groupBy("l_partkey").count().filter(col("count") > 1).count() == 0)
  }

  test("returnflag percentages sum to 100 per part") {
    import org.apache.spark.sql.functions._
    val bad = Relational.returnflagPctPerPart(spark, sf)
      .withColumn("total", col("pct_returned") + col("pct_acked") + col("pct_none"))
      .filter(abs(col("total") - 100.0) > 0.05)
    assert(bad.count() == 0)
  }

  test("approx distinct contract holds and exact counts agree with distinctAggs") {
    val rows = Extended.approxDistinctParts(spark, sf).collect()
    rows.foreach(r =>
      assert(r.getBoolean(2), s"${r.getString(0)} HLL estimate out of 5% tolerance"))
    val exact = Extended.distinctAggs(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(exact(r.getString(0)) == r.getLong(1)))
  }

  test("set ops: intersect-except result is a subset of 1995 buyers") {
    import org.apache.spark.sql.functions._
    val res = Extended.setOpsCustkeys(spark, sf)
    val b95 = graft.sources.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995).select("o_custkey").distinct()
    assert(res.join(b95, Seq("o_custkey"), "left_anti").count() == 0)
  }

  test("rollup contains per-nation rows, per-region subtotals, and a grand total") {
    import org.apache.spark.sql.functions._
    val r = Extended.revenueRollup(spark, sf).cache()
    assert(r.filter(col("g_region") === 1 && col("g_nation") === 1).count() == 1)
    assert(r.filter(col("g_region") === 0 && col("g_nation") === 1).count() == 5)
    assert(r.filter(col("g_region") === 0 && col("g_nation") === 0).count() > 5)
    r.unpersist()
  }

  test("window suite: running_spend final value equals customer total") {
    import org.apache.spark.sql.functions._
    val w = Extended.windowSuite(spark, sf)
    val lastRunning = w.groupBy("o_custkey")
      .agg(max(org.apache.spark.sql.functions.struct(col("rn"), col("running_spend")))
        .as("m"), round(sum("price"), 2).as("total"))
      .select(col("o_custkey"), col("m.running_spend").as("final_running"), col("total"))
    val bad = lastRunning.filter(abs(col("final_running") - col("total")) > 0.02)
    assert(bad.count() == 0)
  }
}
