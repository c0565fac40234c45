package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Extended, Relational}
import graft.sources.Dims

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
    "q9_holiday_pivot"        -> Extended.holidayPivot _,
    "q10_anti_join"           -> Extended.customersWithoutOrders _,
    "q11_semi_join"           -> Extended.customersWithUrgentOrders _,
    "q12_set_ops"             -> Extended.setOpsCustkeys _,
    "q13_distinct_aggs"       -> Extended.distinctAggs _,
    "q14_revenue_rollup"      -> Extended.revenueRollup _,
    "q15_window_suite"        -> Extended.windowSuite _,
    "q16_scalar_suite"        -> Extended.scalarSuite _,
    "q17_approx_distinct"     -> Extended.approxDistinctParts _,
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

    "q9_holiday_pivot" -> {
      val pivots = (1 to 12).map(m =>
        f"CAST(round(sum(CASE WHEN month_of_the_year_num = $m THEN o_totalprice ELSE 0 END), 2) AS DOUBLE) AS tt_order_hol_$m%02d")
        .mkString(", ")
      s"""WITH ${Dims.dimDatesSqlCte},
      j AS (
        SELECT o_totalprice, month_of_the_year_num
        FROM orders LEFT JOIN dim_dates ON CAST(o_orderdate AS DATE) = calendar_dt
        WHERE year_num = 1998 AND day_of_the_week_num BETWEEN 2 AND 6
          AND working_day = 'false')
      SELECT DATE '2026-01-01' AS ingestion_date, $pivots FROM j"""
    },

    "q10_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
      ORDER BY c_custkey""",

    "q11_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      ORDER BY c_custkey""",

    "q12_set_ops" -> """
      SELECT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
      ) t ORDER BY o_custkey""",

    "q13_distinct_aggs" -> """
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q14_revenue_rollup" -> """
      SELECT r_name, n_name,
        CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS DOUBLE) AS revenue,
        CAST(GROUPING(r_name) AS INT) AS g_region,
        CAST(GROUPING(n_name) AS INT) AS g_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_region, g_nation, r_name, n_name""",

    "q15_window_suite" -> """
      WITH b AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_day,
               round(o_totalprice, 2) AS price
        FROM orders)
      SELECT o_custkey, o_orderkey, order_day, price,
        CAST(row_number() OVER seq AS BIGINT) AS rn,
        CAST(rank() OVER byprice AS BIGINT) AS rnk,
        CAST(dense_rank() OVER byprice AS BIGINT) AS drnk,
        lag(price, 1) OVER seq AS prev_price,
        lead(price, 1) OVER seq AS next_price,
        round(sum(price) OVER (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        round(price / sum(price) OVER (PARTITION BY o_custkey) * 100.0, 2) AS pct_of_cust
      FROM b
      WINDOW
        seq AS (PARTITION BY o_custkey ORDER BY order_day, o_orderkey),
        byprice AS (PARTITION BY o_custkey ORDER BY price DESC, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "q16_scalar_suite" -> """
      SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS order_day,
        CAST(o_orderdate AS DATE) + 15 AS due_day,
        CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INT) AS age_days,
        strftime(o_orderdate, '%Y-%m') AS order_month,
        CAST(year(o_orderdate) AS INT) AS order_year,
        CAST(quarter(o_orderdate) AS INT) AS order_quarter,
        CASE WHEN o_totalprice >= 200000.0 THEN 'high'
             WHEN o_totalprice >= 100000.0 THEN 'mid'
             ELSE 'low' END AS price_band,
        COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
        round(o_totalprice / 7.0, 3) AS weekly_rate
      FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""",
  )
}
