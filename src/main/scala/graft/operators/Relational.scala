package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Reference-parity relational operators re-expressed Spark-first over the
  * driver test tables (TESTDATA.md). Each query maps one or more rows of
  * SURVEY.md §2's operator inventory:
  *
  *  - pivotMonthlyQty        → A1 (12-way conditional-SUM pivot,
  *                              `sql/transformation.sql:23-36`)
  *  - shipmentCondCounts     → A2 + J2 + E4 (global conditional COUNTs over a
  *                              join, `sql/transformation.sql:57-67`)
  *  - top1DayPerPart         → A3 + W1 + P4 (group, ROW_NUMBER top-1-per-group,
  *                              `sql/transformation.sql:86-96`)
  *  - eventsMonthlyMetrics   → A6 + E10-E13 + O4 (conditional AVG monthly
  *                              metrics, `tripdata_monthly_metrics.py:63-77`)
  *  - revenueByNation        → J5/J6-style multi-join + group agg
  *  - starPctPerPart         → A4 (percentage-of-group conditional agg,
  *                              `sql/transformation.sql:100-110`)
  *  - bestPerformingPart     → Q1-Q3 CTE chain + O3 top-1
  *                              (`sql/transformation.sql:86-149`)
  *  - watermarkMaxKey        → A7/S3 (incremental-load watermark aggregate)
  *
  * All aggregates over DOUBLE columns are rounded at the end for oracle
  * hash-stability; every multi-row result carries a deterministic ORDER BY.
  */
object Relational {

  /** A1: global 12-way conditional-SUM pivot — one output row, one column per
    * month. The Spark plan is a single partial+final HashAggregate (no
    * shuffle of raw rows — partial aggregation reduces 600k rows to 32
    * partial buffers before the single-row exchange), which is exactly the
    * shape that survives a 100 TB scale-up.
    */
  def pivotMonthlyQty(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = (1 to 12).map { m =>
      sum(when(month(col("l_shipdate")) === m, col("l_quantity")).otherwise(0.0))
        .cast("double").as(f"qty_m$m%02d")
    }
    li.agg(cols.head, cols.tail: _*)
  }

  /** A2: two global conditional COUNTs over an equi-join
    * (COUNT(CASE WHEN…) ≡ count(when(cond, x)) — counts non-nulls).
    * orders is the smaller side at every SF ratio (1:4 vs lineitem) but both
    * are fact tables; we leave the join strategy to AQE rather than forcing a
    * broadcast that would OOM at 100 TB.
    */
  def shipmentCondCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderstatus")
    val lateDays = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(
        count(when(lateDays >= 60, lit(1))).cast("long").as("tt_late_shipments"),
        count(when(col("o_orderstatus") === "O" && lateDays >= 30, lit(1)))
          .cast("long").as("tt_open_late_items"))
  }

  /** W1: most-shipped day per part — groupBy + ROW_NUMBER() top-1-per-group.
    * Unlike the reference (no tiebreak, `sql/transformation.sql:89` —
    * nondeterministic), we pin a deterministic tiebreak (earliest day wins).
    * The two aggregations share the l_partkey shuffle key, so the window
    * reuses the exchange from the groupBy.
    */
  def top1DayPerPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // single shuffle: hash-partition by part key only — that clustering
    // satisfies both the (partkey, day) aggregation and the window's
    // partitionBy(partkey), so Catalyst inserts no second exchange
    val grouped = li
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("ship_day"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("ship_day"))
      .agg(count(lit(1)).as("day_count"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("day_count").desc, col("ship_day").asc)
    grouped
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("ship_day"), col("day_count"))
      .orderBy(col("l_partkey"))
  }

  /** A6: tripdata-style monthly metrics on `events` — conditional AVG where
    * the denominator is ALL rows in the month (the reference's preserved
    * quirk, SURVEY.md A6 ⚠: "sat share of events", not "avg over Saturdays").
    * Spark dayofweek() is 1=Sunday…7=Saturday, same convention as the
    * reference's DAYOFWEEK (E11).
    */
  def eventsMonthlyMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev  = Tables.events(spark, dir)
    val dow = dayofweek(col("ts"))
    def share(d: Int, name: String) =
      round(avg(when(dow === d, 1.0).otherwise(0.0)), 2).as(name)
    def condValue(d: Int, name: String) =
      round(avg(when(dow === d, col("value")).otherwise(0.0)), 2).as(name)
    ev.groupBy(date_format(col("ts"), "yyyy-MM").as("year_month"))
      .agg(
        share(7, "sat_share"), share(1, "sun_share"),
        condValue(7, "sat_mean_value"), condValue(1, "sun_mean_value"),
        count(when(dow === 7, lit(1))).cast("long").as("sat_events"),
        count(when(dow === 1, lit(1))).cast("long").as("sun_events"))
      .orderBy(col("year_month"))
  }

  /** The reference's tripdata query verbatim as a pure DataFrame→DataFrame
    * function (`tripdata_monthly_metrics.py:63-77`; golden output pinned in
    * `/root/reference/default.db`, 36 rows, replicated at
    * `src/test/resources/tripdata_golden.csv`).
    *
    * Faithful quirks, both load-bearing in the golden table:
    *  - the denominator of every avg is ALL trips in the month (SURVEY A6 ⚠),
    *    so "mean_trip_count" is really a day-of-week share;
    *  - the reference ran DAYOFWEEK on ClickHouse, where it is ISO
    *    (1=Monday…7=Sunday) — so the `sat_*` columns (CASE WHEN = 7) are
    *    actually SUNDAY metrics and `sun_*` (= 1) are Monday metrics. The
    *    column names are preserved as written; Spark's `weekday()+1`
    *    reproduces the executed numbering (`dayofweek()` would silently
    *    shift every metric by a day).
    *
    * Input schema: (pickup_date DATE, pickup_datetime TIMESTAMP,
    * dropoff_datetime TIMESTAMP, fare_amount DOUBLE).
    */
  def tripdataMonthlyMetrics(trip: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val isoDow = weekday(col("pickup_date")) + 1 // ClickHouse DAYOFWEEK: 1=Mon…7=Sun
    val durMin = expr(
      "timestampdiff(MINUTE, pickup_datetime, dropoff_datetime)").cast("double")
    def m(d: Int, v: org.apache.spark.sql.Column, name: String) =
      round(avg(when(isoDow === d, v).otherwise(0.0)), 2).as(name)
    trip
      .filter(col("pickup_date").between("2014-01-01", "2016-12-31"))
      .groupBy(date_format(col("pickup_date"), "yyyy-MM").as("year_month"))
      .agg(
        m(7, lit(1.0), "sat_mean_trip_count"),
        m(7, col("fare_amount"), "sat_mean_fare_per_trip"),
        m(7, durMin, "sat_mean_duration_per_trip_in_minutes"),
        m(1, lit(1.0), "sun_mean_trip_count"),
        m(1, col("fare_amount"), "sun_mean_fare_per_trip"),
        m(1, durMin, "sun_mean_duration_per_trip_in_minutes"))
      .orderBy(col("year_month"))
  }

  /** Multi-join aggregation (J5/J6 shape): revenue per nation.
    * nation/region are tiny dims → explicit broadcast() so the plan stays a
    * single shuffle (the groupBy) even at 100 TB; customer↔orders↔lineitem
    * shuffle on their join keys and AQE handles skew.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c  = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** A4: star-rating-style percentage pivot — share of lineitems per
    * returnflag within each part, `SUM(CASE…)::FLOAT / COUNT(*) * 100`
    * (explicit double cast replicates the reference's Postgres INT/INT
    * truncation workaround, E9).
    */
  def returnflagPctPerPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def pct(flag: String, name: String) =
      round(sum(when(col("l_returnflag") === flag, 1.0).otherwise(0.0))
        .cast("double") / count(lit(1)) * 100.0, 2).as(name)
    li.groupBy(col("l_partkey"))
      .agg(
        pct("R", "pct_returned"), pct("A", "pct_acked"), pct("N", "pct_none"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy(col("l_partkey"))
  }

  /** Q-best-product parity (`sql/transformation.sql:86-149`): three CTE-shaped
    * DataFrames — (a) top shipped day per part, (b) returnflag percentages
    * per part, (c) order-priority percentages per part — 3-way LEFT JOIN on
    * part_id with COALESCE defaults, global ORDER BY pct columns DESC,
    * top-1. Catalyst plans the final sort+limit as TakeOrderedAndProject
    * (no global sort — O3).
    */
  def bestPerformingPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val p  = Tables.part(spark, dir).select("p_partkey", "p_name")

    val mostShipped = top1DayPerPart(spark, dir)
      .withColumnRenamed("l_partkey", "ms_partkey")

    def pct(cond: Column, name: String) =
      round(sum(when(cond, 1.0).otherwise(0.0)).cast("double")
        / count(lit(1)) * 100.0, 2).as(name)

    val flagPcts = li.groupBy(col("l_partkey").as("fp_partkey"))
      .agg(
        pct(col("l_returnflag") === "R", "pct_returned"),
        pct(col("l_returnflag") === "N", "pct_clean"),
        count(lit(1)).cast("long").as("tt_items"))

    val prioPcts = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey").as("pp_partkey"))
      .agg(
        pct(col("o_orderpriority") === "1-URGENT", "pct_urgent"),
        pct(col("o_orderpriority") === "5-LOW", "pct_low"))

    p
      .join(mostShipped, col("p_partkey") === col("ms_partkey"), "left")
      .join(flagPcts, col("p_partkey") === col("fp_partkey"), "left")
      .join(prioPcts, col("p_partkey") === col("pp_partkey"), "left")
      .select(
        col("p_partkey"), col("p_name"),
        col("ship_day").as("most_shipped_day"),
        coalesce(col("pct_clean"), lit(0.0)).as("pct_clean"),
        coalesce(col("pct_returned"), lit(0.0)).as("pct_returned"),
        coalesce(col("pct_urgent"), lit(0.0)).as("pct_urgent"),
        coalesce(col("pct_low"), lit(0.0)).as("pct_low"),
        coalesce(col("tt_items"), lit(0L)).cast("long").as("tt_items"))
      .orderBy(
        col("pct_clean").desc, col("pct_urgent").desc,
        col("tt_items").desc, col("p_partkey").asc)
      .limit(1)
  }

  /** A7/S3: the incremental-load watermark aggregate —
    * `COALESCE(MAX(CAST(pk AS INT)), 0)`
    * (`extract_load_transform_data_pipeline.py.py:95-98`).
    */
  def watermarkMaxKey(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.agg(coalesce(max(col("o_orderkey").cast("long")), lit(0L)).as("max_key"))
  }
}
