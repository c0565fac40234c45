package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.JdbcStore

/** Real end-to-end tests of the JDBC staging surface (SURVEY §2.1 S3/S7/
  * S8/S10) against embedded Derby — the same `DataFrameWriter.jdbc` /
  * `read.jdbc` calls that target Postgres/SQLite in production, bound to
  * the in-JVM Derby engine that ships on Spark's classpath.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }
  private val props = JdbcStore.props("", "", "org.apache.derby.jdbc.EmbeddedDriver")

  test("S8/S10: jdbc overwrite sink round-trips and is idempotent") {
    import spark.implicits._
    val url = freshUrl()
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25)).toDF("id", "name", "score")
    df.write.mode("overwrite").jdbc(url, "metrics", props)
    val back = spark.read.jdbc(url, "metrics", props)
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq == Seq(10.5, 20.25))
    // idempotent re-run (truncate-overwrite semantics)
    JdbcStore.overwriteTruncate(df, url, "metrics", props)
    assert(spark.read.jdbc(url, "metrics", props).count() == 2)
  }

  test("S3/S7: watermark read + incremental append against a live database") {
    import spark.implicits._
    val url = freshUrl()
    val b1 = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("order_id", "amount")
    b1.write.mode("append").jdbc(url, "staging_orders", props)

    val w1 = JdbcStore.currentWatermark(spark, url, "staging_orders", "order_id", props)
    assert(w1 == 3L)

    // overlapping batch: only order_id 4 and 5 are above the watermark
    val b2 = Seq((2L, 200.0), (3L, 300.0), (4L, 400.0), (5L, 500.0)).toDF("order_id", "amount")
    JdbcStore.appendAbove(b2, url, "staging_orders", "order_id", w1, props)

    val staged = spark.read.jdbc(url, "staging_orders", props)
    assert(staged.count() == 5)
    assert(staged.select(countDistinct("order_id")).collect()(0).getLong(0) == 5)

    // replay of the same batch: watermark advanced, nothing appended
    val w2 = JdbcStore.currentWatermark(spark, url, "staging_orders", "order_id", props)
    assert(w2 == 5L)
    JdbcStore.appendAbove(b2, url, "staging_orders", "order_id", w2, props)
    assert(spark.read.jdbc(url, "staging_orders", props).count() == 5)
  }

  test("streaming foreachBatch lands the event stream in the database idempotently") {
    val url = freshUrl()
    val q = graft.streaming.Events.streamEventsToJdbc(
      spark, TestSpark.sf, url, props, "events_sink")
    try q.processAllAvailable() finally q.stop()
    val n = graft.sources.Tables.events(spark, TestSpark.sf).count()
    val landed = spark.read.jdbc(url, "events_sink", props)
    assert(landed.count() == n, "every event landed")
    assert(landed.select(countDistinct("event_id")).collect()(0).getLong(0) == n,
      "no duplicates")
    // replaying the whole stream (fresh checkpoint) appends nothing new —
    // the anti-join makes batch redelivery a no-op
    val q2 = graft.streaming.Events.streamEventsToJdbc(
      spark, TestSpark.sf, url, props, "events_sink")
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.jdbc(url, "events_sink", props).count() == n)
  }

  test("dialect seam: Derby renders executable DDL/MERGE (live); Postgres renders the documented forms") {
    import org.apache.spark.sql.types._
    import graft.pipeline.{DerbyDialect, PostgresDialect}
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType)))

    // both dialects spell the watermark subquery identically (pure ANSI)
    assert(DerbyDialect.watermarkSql("t", "id") == PostgresDialect.watermarkSql("t", "id"))

    // Postgres renderings: asserted against the documented spellings
    // (unreachable in-sandbox; the text IS the contract)
    val pgDdl = PostgresDialect.createTableSql("staging_orders", schema)
    assert(pgDdl == """CREATE TABLE IF NOT EXISTS staging_orders ("id" BIGINT NOT NULL, "name" TEXT, "score" DOUBLE PRECISION)""")
    val pgUp = PostgresDialect.upsertSql("staging_orders", schema, "id")
    assert(pgUp.contains("""ON CONFLICT ("id") DO UPDATE SET"""))
    assert(pgUp.contains(""""name" = EXCLUDED."name""""))

    // Derby renderings: EXECUTED against the live embedded engine
    val url = freshUrl()
    JdbcStore.ensureTable(url, "staging_orders", schema, DerbyDialect, props)
    JdbcStore.ensureTable(url, "staging_orders", schema, DerbyDialect, props) // idempotent
    JdbcStore.upsertRows(url, "staging_orders", schema, "id",
      Seq(Seq(1L, "alpha", 1.5), Seq(2L, "beta", 2.5)), DerbyDialect, props)
    // second wave: update key 2, insert key 3
    JdbcStore.upsertRows(url, "staging_orders", schema, "id",
      Seq(Seq(2L, "beta2", 9.0), Seq(3L, "gamma", 3.5)), DerbyDialect, props)
    val back = spark.read.jdbc(url, "staging_orders", props)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == Seq((1L, "alpha", 1.5), (2L, "beta2", 9.0), (3L, "gamma", 3.5)))

    // the dialect-routed watermark runs live on Derby too
    val w = JdbcStore.currentWatermark(spark, url, "staging_orders", "id",
      props, graft.pipeline.DerbyDialect)
    assert(w == 3L)
  }

  test("dialect DDL type matrix: every staging-relevant Spark type renders on both targets") {
    import org.apache.spark.sql.types._
    import graft.pipeline.{DerbyDialect, PostgresDialect}
    // (spark type, postgres spelling, derby spelling) — the documented
    // Postgres forms (erd_table_creations.sql uses INTEGER/DECIMAL/DATE/
    // TIMESTAMP/VARCHAR-ish columns) plus the types the landing schemas
    // carry; a live Postgres is a config change, not code, because the
    // full matrix is pinned here
    val matrix: Seq[(DataType, String, String)] = Seq(
      (ShortType, "SMALLINT", "SMALLINT"),
      (IntegerType, "INTEGER", "INTEGER"),
      (LongType, "BIGINT", "BIGINT"),
      (FloatType, "REAL", "REAL"),
      (DoubleType, "DOUBLE PRECISION", "DOUBLE"),
      (BooleanType, "BOOLEAN", "BOOLEAN"),
      (DateType, "DATE", "DATE"),
      (TimestampType, "TIMESTAMP", "TIMESTAMP"),
      (DecimalType(12, 2), "NUMERIC(12,2)", "DECIMAL(12,2)"),
      (StringType, "TEXT", "VARCHAR(32672)"),
      (BinaryType, "BYTEA", "BLOB"))
    matrix.foreach { case (dt, pg, derby) =>
      assert(PostgresDialect.ddlType(dt) == pg, s"postgres $dt")
      assert(DerbyDialect.ddlType(dt) == derby, s"derby $dt")
    }
    // an unmapped type must fail loudly at render time, not at the server
    intercept[IllegalArgumentException] {
      PostgresDialect.ddlType(ArrayType(LongType))
    }

    // the full-matrix CREATE + MERGE upsert EXECUTES on the live engine,
    // including the temporal/decimal/binary columns the simpler staging
    // test doesn't touch
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("amt", DecimalType(12, 2)), StructField("ok", BooleanType),
      StructField("blob", BinaryType)))
    val url = freshUrl()
    JdbcStore.ensureTable(url, "typed_staging", schema, DerbyDialect, props)
    val day = java.sql.Date.valueOf("2024-03-01")
    val at = java.sql.Timestamp.valueOf("2024-03-01 10:30:00")
    val amt = new java.math.BigDecimal("12345.67")
    JdbcStore.upsertRows(url, "typed_staging", schema, "id",
      Seq(Seq(1L, day, at, amt, true, Array[Byte](1, 2, 3))),
      DerbyDialect, props)
    // upsert the same key: every non-pk column updates in place
    val amt2 = new java.math.BigDecimal("99.50")
    JdbcStore.upsertRows(url, "typed_staging", schema, "id",
      Seq(Seq(1L, day, at, amt2, false, Array[Byte](9, 9))),
      DerbyDialect, props)
    val r = spark.read.jdbc(url, "typed_staging", props).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getDate(1) == day && r(0).getTimestamp(2) == at)
    assert(r(0).getDecimal(3).compareTo(amt2) == 0)
    assert(!r(0).getBoolean(4))
    assert(r(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](9, 9))

    // Postgres upsert rendering for the same schema: the exact documented
    // ON CONFLICT form, with every non-pk column in the update list
    val pgUp = PostgresDialect.upsertSql("typed_staging", schema, "id")
    assert(pgUp ==
      """INSERT INTO typed_staging ("id", "d", "ts", "amt", "ok", "blob") """ +
      """VALUES (?, ?, ?, ?, ?, ?) ON CONFLICT ("id") DO UPDATE SET """ +
      """"d" = EXCLUDED."d", "ts" = EXCLUDED."ts", "amt" = EXCLUDED."amt", """ +
      """"ok" = EXCLUDED."ok", "blob" = EXCLUDED."blob"""")
    assert(PostgresDialect.upsertParamOrder(schema, "id") == (0 until 6))
    // Derby MERGE mentions pk once in ON, non-pk in UPDATE, all in INSERT
    assert(DerbyDialect.upsertParamOrder(schema, "id") ==
      Seq(0) ++ (1 until 6) ++ (0 until 6))
  }

  test("S7: predicate and column pruning push into the JDBC source") {
    import spark.implicits._
    val url = freshUrl()
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "tag", "v").write.mode("overwrite").jdbc(url, "t", props)
    val q = spark.read.jdbc(url, "t", props).filter(col("id") > 1).select("id", "v")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // the filter must reach the JDBC scan node (pushed to the database)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"no pushdown:\n$plan")
  }
}
