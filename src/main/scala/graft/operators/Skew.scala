package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew-mitigation patterns. A hot grouping key at 100 TB turns one reducer
  * into the straggler; salting splits each key across `nSalts` reducers in
  * a first phase and merges the partials in a second, bounding any single
  * task's input at 1/nSalts of the hot key. AQE's skew-join handling covers
  * joins; salting covers aggregations with algebraic (re-aggregable)
  * functions.
  */
object Skew {

  /** Two-phase salted sum/count aggregation: groupBy(salt, keys) →
    * partial, then groupBy(keys) → merge. Output is exactly the direct
    * groupBy result (sums re-associate; counts add).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     nSalts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df.withColumn("_salt",
      pmod(hash(keyCols :+ monotonically_increasing_id(): _*), lit(nSalts)))
    val partial = salted
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as("salted_sum"),
        sum(col("_pcnt")).cast("long").as("n_rows"))
  }

  /** q18: per-customer order totals via the salted two-phase plan — the
    * oracle is the plain single-phase GROUP BY, proving the decomposition
    * is exact (2dp rounding absorbs double re-association).
    */
  def saltedCustomerRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    saltedSumCount(o, Seq("o_custkey"), "o_totalprice")
      .select(col("o_custkey"),
        round(col("salted_sum"), 2).as("total_spend"), col("n_rows"))
      .orderBy(col("o_custkey"))
  }
}
