package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

import graft.sources.Tables

/** Data profiling — the quality gate a pipeline runs on every new landing
  * batch before trusting it: per-column null counts, distinct counts,
  * numeric ranges. One pass over the table (a single wide aggregate;
  * distinct counts use HLL so the pass stays partial+final at any scale —
  * the profile is diagnostic, ±1% is fine).
  */
object Profile {

  /** Wide one-row profile of a DataFrame: per column — nulls, approx
    * distinct, and min/max for numeric columns.
    */
  def profile(df: DataFrame): DataFrame = {
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(when(c.isNull, lit(1))).cast("long").as(s"${f.name}__nulls"),
        approx_count_distinct(c, 0.01).as(s"${f.name}__distinct"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          round(min(c).cast("double"), 4).as(s"${f.name}__min"),
          round(max(c).cast("double"), 4).as(s"${f.name}__max"))
        case StringType => base :+
          max(length(c)).cast("long").as(s"${f.name}__maxlen")
        case _ => base
      }
    }
    df.agg(aggs.head, aggs.toIndexedSeq.tail: _*)
  }

  /** q24: exact profile of `orders` (exact distinct so the DuckDB oracle
    * matches value-for-value; the approx variant above is the scale path).
    */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.agg(
      count(lit(1)).cast("long").as("n_rows"),
      count(when(col("o_custkey").isNull, lit(1))).cast("long").as("custkey_nulls"),
      countDistinct(col("o_custkey")).cast("long").as("custkey_distinct"),
      countDistinct(col("o_orderstatus")).cast("long").as("status_distinct"),
      round(min(col("o_totalprice")), 4).as("price_min"),
      round(max(col("o_totalprice")), 4).as("price_max"),
      round(avg(col("o_totalprice")), 4).as("price_avg"),
      min(to_date(col("o_orderdate"))).as("first_order_day"),
      max(to_date(col("o_orderdate"))).as("last_order_day"))
  }
}
