package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{JdbcStore, PostgresDialect}

/** Live-Postgres integration suite — the JdbcSpec matrix re-bound from
  * embedded Derby to a REAL Postgres server, exercising the renderings
  * that Derby can only assert as strings (`IF NOT EXISTS` DDL,
  * `INSERT .. ON CONFLICT` upsert, Postgres type names, truncate
  * overwrite). Env-gated: every test `assume`s `GRAFT_PG_URL`, so on a
  * server-less box (this sandbox) the suite reports canceled-not-failed
  * and costs nothing. To run it for real:
  *
  * {{{
  *   GRAFT_PG_URL='jdbc:postgresql://host:5432/db' \
  *   GRAFT_PG_USER=user GRAFT_PG_PASSWORD=pass sbt test
  * }}}
  *
  * The Postgres JDBC driver must be on the classpath (it is not vendored
  * here — zero-egress build); the suite cancels with a pointer when the
  * driver class is absent. Each run works in its own `graft_it_<nanos>`
  * table namespace and drops it afterwards, so reruns never collide.
  */
class LivePostgresSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val urlOpt = sys.env.get("GRAFT_PG_URL")
  private val props = JdbcStore.props(
    sys.env.getOrElse("GRAFT_PG_USER", "postgres"),
    sys.env.getOrElse("GRAFT_PG_PASSWORD", ""),
    PostgresDialect.driver)
  private val ns = s"graft_it_${System.nanoTime()}"

  private def withPg(testName: String)(body: String => Unit): Unit =
    test(testName) {
      assume(urlOpt.isDefined,
        "live-Postgres suite is env-gated: set GRAFT_PG_URL to run it")
      assume(
        try { Class.forName(PostgresDialect.driver); true }
        catch { case _: ClassNotFoundException => false },
        s"${PostgresDialect.driver} not on classpath — add the Postgres JDBC jar")
      val url = urlOpt.get
      try body(url)
      finally dropNamespace(url)
    }

  private def dropNamespace(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        val rs = conn.getMetaData.getTables(null, null, s"${ns}_%", Array("TABLE"))
        val tables = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(3)).toList
        tables.foreach(t => st.executeUpdate(s"DROP TABLE IF EXISTS ${PostgresDialect.quote(t)}"))
      } finally st.close()
    } finally conn.close()
  }

  private val stagingSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  withPg("S9: dialect-rendered CREATE TABLE IF NOT EXISTS executes and is idempotent") { url =>
    JdbcStore.ensureTable(url, s"${ns}_ddl", stagingSchema, PostgresDialect, props)
    JdbcStore.ensureTable(url, s"${ns}_ddl", stagingSchema, PostgresDialect, props)
    assert(spark.read.jdbc(url, s"${ns}_ddl", props).count() == 0)
  }

  withPg("MERGE: INSERT .. ON CONFLICT upsert inserts then updates in place") { url =>
    val t = s"${ns}_upsert"
    JdbcStore.ensureTable(url, t, stagingSchema, PostgresDialect, props)
    JdbcStore.upsertRows(url, t, stagingSchema, "id",
      Seq(Seq(1L, "alpha", 1.5), Seq(2L, "beta", 2.5)), PostgresDialect, props)
    JdbcStore.upsertRows(url, t, stagingSchema, "id",
      Seq(Seq(2L, "beta2", 9.0), Seq(3L, "gamma", 3.5)), PostgresDialect, props)
    val back = spark.read.jdbc(url, t, props).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alpha", 1.5), (2L, "beta2", 9.0), (3L, "gamma", 3.5)))
  }

  withPg("S3/S7: watermark read + incremental append is replay-safe on Postgres") { url =>
    import spark.implicits._
    val t = s"${ns}_stage"
    Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("order_id", "amount")
      .write.mode("append").jdbc(url, t, props)
    val w1 = JdbcStore.currentWatermark(spark, url, t, "order_id", props, PostgresDialect)
    assert(w1 == 3L)
    val b2 = Seq((2L, 200.0), (3L, 300.0), (4L, 400.0), (5L, 500.0))
      .toDF("order_id", "amount")
    JdbcStore.appendAbove(b2, url, t, "order_id", w1, props)
    assert(spark.read.jdbc(url, t, props).count() == 5)
    val w2 = JdbcStore.currentWatermark(spark, url, t, "order_id", props, PostgresDialect)
    assert(w2 == 5L)
    JdbcStore.appendAbove(b2, url, t, "order_id", w2, props) // replay: no-op
    assert(spark.read.jdbc(url, t, props).count() == 5)
  }

  withPg("S10: TRUNCATE+INSERT overwrite is idempotent and keeps the table object") { url =>
    import spark.implicits._
    val t = s"${ns}_metrics"
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.25)).toDF("id", "name", "score")
    df.write.mode("overwrite").jdbc(url, t, props)
    JdbcStore.overwriteTruncate(df, url, t, props)
    JdbcStore.overwriteTruncate(df, url, t, props)
    assert(spark.read.jdbc(url, t, props).count() == 2)
  }

  withPg("type matrix: every staging-relevant Spark type round-trips through the rendered DDL") { url =>
    val t = s"${ns}_typed"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("i", IntegerType),
      StructField("s", ShortType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("dec", DecimalType(12, 2)),
      StructField("b", BooleanType), StructField("txt", StringType),
      StructField("dt", DateType), StructField("ts", TimestampType)))
    JdbcStore.ensureTable(url, t, schema, PostgresDialect, props)
    JdbcStore.upsertRows(url, t, schema, "id",
      Seq(Seq(1L, 7, 3.toShort, 1.5f, 2.5, new java.math.BigDecimal("12.34"),
        true, "x", java.sql.Date.valueOf("2024-05-01"),
        java.sql.Timestamp.valueOf("2024-05-01 12:30:00"))),
      PostgresDialect, props)
    // conflicting re-upsert exercises the ON CONFLICT update arm per type
    JdbcStore.upsertRows(url, t, schema, "id",
      Seq(Seq(1L, 8, 4.toShort, 2.5f, 3.5, new java.math.BigDecimal("56.78"),
        false, "y", java.sql.Date.valueOf("2024-06-01"),
        java.sql.Timestamp.valueOf("2024-06-01 01:02:03"))),
      PostgresDialect, props)
    val r = spark.read.jdbc(url, t, props).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Int]("i") == 8 && row.getAs[String]("txt") == "y")
    assert(row.getAs[java.sql.Date]("dt").toString == "2024-06-01")
  }
}
