package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a same-name, same-column-alias DuckDB oracle
  * in `oracleSql` (the driver hash-compares values after sorting columns by
  * name). Non-SQL-expressible operators ship without an oracle and get the
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pivot_monthly_qty"    -> Relational.pivotMonthlyQty _,
    "q2_shipment_cond_counts" -> Relational.shipmentCondCounts _,
    "q3_top1_day_per_part"    -> Relational.top1DayPerPart _,
    "q4_events_monthly"       -> Relational.eventsMonthlyMetrics _,
    "q5_revenue_by_nation"    -> Relational.revenueByNation _,
    "q6_returnflag_pct"       -> Relational.returnflagPctPerPart _,
    "q7_best_part"            -> Relational.bestPerformingPart _,
    "q8_watermark_max"        -> Relational.watermarkMaxKey _,
  )

  /** DuckDB-runnable ANSI SQL twin for each query (same column aliases). */
  def oracleSql: Map[String, String] = Map(
    "q1_pivot_monthly_qty" ->
      (1 to 12).map(m =>
        f"CAST(sum(CASE WHEN month(l_shipdate) = $m THEN l_quantity ELSE 0 END) AS DOUBLE) AS qty_m$m%02d")
        .mkString("SELECT ", ", ", " FROM lineitem"),

    "q2_shipment_cond_counts" -> """
      SELECT
        count(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) >= 60 THEN 1 END) AS tt_late_shipments,
        count(CASE WHEN o_orderstatus = 'O' AND CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) >= 30 THEN 1 END) AS tt_open_late_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    "q3_top1_day_per_part" -> """
      WITH g AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_day, count(*) AS day_count
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT g.*, row_number() OVER (
          PARTITION BY l_partkey ORDER BY day_count DESC, ship_day ASC) AS rn
        FROM g)
      SELECT l_partkey, ship_day, day_count FROM r WHERE rn = 1 ORDER BY l_partkey""",

    "q4_events_monthly" -> """
      SELECT
        strftime(ts, '%Y-%m') AS year_month,
        round(avg(CASE WHEN dayofweek(ts) = 6 THEN 1.0 ELSE 0.0 END), 2) AS sat_share,
        round(avg(CASE WHEN dayofweek(ts) = 0 THEN 1.0 ELSE 0.0 END), 2) AS sun_share,
        round(avg(CASE WHEN dayofweek(ts) = 6 THEN value ELSE 0.0 END), 2) AS sat_mean_value,
        round(avg(CASE WHEN dayofweek(ts) = 0 THEN value ELSE 0.0 END), 2) AS sun_mean_value,
        count(CASE WHEN dayofweek(ts) = 6 THEN 1 END) AS sat_events,
        count(CASE WHEN dayofweek(ts) = 0 THEN 1 END) AS sun_events
      FROM events GROUP BY 1 ORDER BY year_month""",

    "q5_revenue_by_nation" -> """
      SELECT r_name, n_name,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q6_returnflag_pct" -> """
      SELECT l_partkey,
        round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_returned,
        round(CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_acked,
        round(CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_none,
        count(*) AS n_items
      FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""",

    "q7_best_part" -> """
      WITH g AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_day, count(*) AS day_count
        FROM lineitem GROUP BY 1, 2),
      ms AS (
        SELECT l_partkey AS ms_partkey, ship_day FROM (
          SELECT g.*, row_number() OVER (
            PARTITION BY l_partkey ORDER BY day_count DESC, ship_day ASC) AS rn
          FROM g) WHERE rn = 1),
      fp AS (
        SELECT l_partkey AS fp_partkey,
          round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_returned,
          round(CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_clean,
          count(*) AS tt_items
        FROM lineitem GROUP BY 1),
      pp AS (
        SELECT l_partkey AS pp_partkey,
          round(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_urgent,
          round(CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100.0, 2) AS pct_low
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
      SELECT p_partkey, p_name,
        ship_day AS most_shipped_day,
        CAST(COALESCE(pct_clean, 0) AS DOUBLE) AS pct_clean,
        CAST(COALESCE(pct_returned, 0) AS DOUBLE) AS pct_returned,
        CAST(COALESCE(pct_urgent, 0) AS DOUBLE) AS pct_urgent,
        CAST(COALESCE(pct_low, 0) AS DOUBLE) AS pct_low,
        CAST(COALESCE(tt_items, 0) AS BIGINT) AS tt_items
      FROM part
      LEFT JOIN ms ON p_partkey = ms_partkey
      LEFT JOIN fp ON p_partkey = fp_partkey
      LEFT JOIN pp ON p_partkey = pp_partkey
      ORDER BY pct_clean DESC, pct_urgent DESC, tt_items DESC, p_partkey ASC
      LIMIT 1""",

    "q8_watermark_max" -> """
      SELECT CAST(COALESCE(max(CAST(o_orderkey AS BIGINT)), 0) AS BIGINT) AS max_key
      FROM orders""",
  )
}
