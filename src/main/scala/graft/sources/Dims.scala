package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated dimension tables. The reference *assumes* `if_common.dim_dates`
  * and `if_common.dim_products` exist in Postgres without ever creating them
  * (SURVEY.md §1 ⚠, inferred from `sql/transformation.sql:40-44,91-94,107`).
  * We generate the date dim deterministically with `sequence` + `explode` —
  * a driver-free distributed generation (no collect, no Python-range on the
  * driver), so the same code generates a century of dates on a cluster.
  *
  * Schema parity with the reference's inferred dim_dates:
  *   calendar_dt DATE, year_num INT, month_of_the_year_num INT,
  *   day_of_the_week_num INT (1=Sunday…7=Saturday, Spark/reference E11
  *   convention), working_day STRING 'true'/'false' (the reference's
  *   text-bool quirk E15, preserved).
  */
object Dims {

  val DimStart = "1995-01-01"
  val DimEnd   = "2001-12-31"

  /** Fixed "public holiday" rule, mirrored exactly in the DuckDB oracle SQL:
    * weekends plus Dec 25, Jan 1, Jul 4.
    */
  def dimDates(spark: SparkSession): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(
        lit(java.sql.Date.valueOf(DimStart)),
        lit(java.sql.Date.valueOf(DimEnd)),
        expr("interval 1 day"))).as("calendar_dt"))
    val dow = dayofweek(col("calendar_dt"))
    val holiday =
      (month(col("calendar_dt")) === 12 && dayofmonth(col("calendar_dt")) === 25) ||
      (month(col("calendar_dt")) === 1  && dayofmonth(col("calendar_dt")) === 1)  ||
      (month(col("calendar_dt")) === 7  && dayofmonth(col("calendar_dt")) === 4)
    days.select(
      col("calendar_dt"),
      year(col("calendar_dt")).cast("int").as("year_num"),
      month(col("calendar_dt")).cast("int").as("month_of_the_year_num"),
      dow.cast("int").as("day_of_the_week_num"),
      when(dow === 1 || dow === 7 || holiday, "false").otherwise("true")
        .as("working_day"))
  }

  /** The reference's other assumed dim (`if_common.dim_products`, inferred
    * from `sql/transformation.sql:100-110,121`): product_id 1..25 with
    * synthetic names.
    */
  def dimProducts(spark: SparkSession, n: Int = 25): DataFrame =
    spark.range(1, n + 1).select(
      col("id").cast("int").as("product_id"),
      concat(lit("product_"), col("id")).as("product_name"))

  /** DuckDB CTE producing the identical dim_dates — prepended to oracle SQL
    * that needs the date dim. DuckDB `dayofweek` is 0=Sun..6=Sat, hence +1.
    */
  val dimDatesSqlCte: String = s"""
    dim_dates AS (
      SELECT CAST(d AS DATE) AS calendar_dt,
             year(d) AS year_num,
             month(d) AS month_of_the_year_num,
             dayofweek(d) + 1 AS day_of_the_week_num,
             CASE WHEN dayofweek(d) IN (0, 6)
                    OR (month(d) = 12 AND day(d) = 25)
                    OR (month(d) = 1  AND day(d) = 1)
                    OR (month(d) = 7  AND day(d) = 4)
               THEN 'false' ELSE 'true' END AS working_day
      FROM (SELECT unnest(generate_series(DATE '$DimStart', DATE '$DimEnd', INTERVAL 1 DAY)) AS d))"""
}
