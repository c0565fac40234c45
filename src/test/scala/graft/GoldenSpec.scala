package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's only machine-checkable expected output: the
  * `tripdata_monthly_metrics` golden table (`/root/reference/default.db`,
  * 36 rows, extracted to `src/test/resources/tripdata_golden.csv`).
  * The original NYC tripdata input lives behind a remote ClickHouse the
  * container can't reach, so the tests pin (a) the full output contract
  * against the golden table — schema, grain, formats, value domains — and
  * (b) the metric semantics on a constructed input with hand-computed
  * expectations.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def goldenPath =
    getClass.getResource("/tripdata_golden.csv").getPath

  test("tripdata golden: our query's output contract matches the golden table") {
    val golden = spark.read.option("header", "true").csv(goldenPath)
    // synthetic input exercising the query end to end
    import spark.implicits._
    val trip = Seq(
      ("2014-01-04", "2014-01-04 10:00:00", "2014-01-04 10:30:00", 12.5)
    ).toDF("pickup_date", "pickup_datetime", "dropoff_datetime", "fare_amount")
      .select(to_date($"pickup_date").as("pickup_date"),
        to_timestamp($"pickup_datetime").as("pickup_datetime"),
        to_timestamp($"dropoff_datetime").as("dropoff_datetime"),
        $"fare_amount")
    val out = graft.operators.Relational.tripdataMonthlyMetrics(trip)
    assert(out.columns.toSeq == golden.columns.toSeq,
      s"column contract: ${out.columns.toSeq} vs ${golden.columns.toSeq}")
    // golden contract: 36 monthly rows 2014-01..2016-12, yyyy-MM grain,
    // shares in [0,1]
    assert(golden.count() == 36)
    val ym = golden.select("year_month").collect().map(_.getString(0))
    assert(ym.forall(_.matches("\\d{4}-\\d{2}")))
    assert(ym.min == "2014-01" && ym.max == "2016-12")
    val shares = golden.select(
      $"sat_mean_trip_count".cast("double"), $"sun_mean_trip_count".cast("double"))
      .collect()
    assert(shares.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= 1
      && r.getDouble(1) >= 0 && r.getDouble(1) <= 1))
  }

  test("tripdata semantics: hand-computed metrics on a constructed month") {
    import spark.implicits._
    // 2014-01: 2014-01-05 is a SUNDAY (ISO dow 7 → the 'sat_*' columns),
    // 2014-01-06 is a MONDAY (ISO dow 1 → the 'sun_*' columns),
    // 2014-01-07 is a Tuesday (counted only in the denominator)
    val trip = Seq(
      ("2014-01-05", "2014-01-05 10:00:00", "2014-01-05 10:45:00", 20.0), // Sun, 45 min
      ("2014-01-05", "2014-01-05 12:00:00", "2014-01-05 12:15:00", 10.0), // Sun, 15 min
      ("2014-01-06", "2014-01-06 09:00:00", "2014-01-06 09:30:00", 8.0),  // Mon, 30 min
      ("2014-01-07", "2014-01-07 09:00:00", "2014-01-07 09:10:00", 4.0)   // Tue, 10 min
    ).toDF("pickup_date", "pickup_datetime", "dropoff_datetime", "fare_amount")
      .select(to_date($"pickup_date").as("pickup_date"),
        to_timestamp($"pickup_datetime").as("pickup_datetime"),
        to_timestamp($"dropoff_datetime").as("dropoff_datetime"),
        $"fare_amount")
    val r = graft.operators.Relational.tripdataMonthlyMetrics(trip).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "2014-01")
    assert(row.getDouble(1) == 0.5)   // 2 of 4 trips on ISO day 7
    assert(row.getDouble(2) == 7.5)   // (20+10)/4 — denominator is ALL trips
    assert(row.getDouble(3) == 15.0)  // (45+15)/4
    assert(row.getDouble(4) == 0.25)  // 1 of 4 trips on ISO day 1
    assert(row.getDouble(5) == 2.0)   // 8/4
    assert(row.getDouble(6) == 7.5)   // 30/4
  }

  test("tripdata: rows outside the 2014-2016 window are excluded") {
    import spark.implicits._
    val trip = Seq(
      ("2013-12-31", "2013-12-31 10:00:00", "2013-12-31 10:30:00", 5.0),
      ("2017-01-01", "2017-01-01 10:00:00", "2017-01-01 10:30:00", 5.0),
      ("2015-06-15", "2015-06-15 10:00:00", "2015-06-15 10:30:00", 5.0)
    ).toDF("pickup_date", "pickup_datetime", "dropoff_datetime", "fare_amount")
      .select(to_date($"pickup_date").as("pickup_date"),
        to_timestamp($"pickup_datetime").as("pickup_datetime"),
        to_timestamp($"dropoff_datetime").as("dropoff_datetime"),
        $"fare_amount")
    val r = graft.operators.Relational.tripdataMonthlyMetrics(trip).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("2015-06"))
  }
}
