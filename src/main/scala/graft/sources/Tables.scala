package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table registry over the driver-provided parquet test data
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Mirrors the reference's ingest surface (SURVEY.md §2.1 S1/S2): the
  * reference reads CSVs into a dict of pandas frames keyed by table name
  * (`extract_load_transform_data_pipeline.py.py:65-80`); here the same
  * role is a `Map[String, DataFrame]` of lazily-planned parquet scans.
  * Parquet carries the schema, so unlike the reference there is no
  * inference step — and Catalyst pushes filters/column pruning into the
  * scan for free.
  */
object Tables {

  /** All driver-generated tables, one parquet file each. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  // Named accessors (the hot tables get explicit helpers).
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as a long via the legacy conf and
    * then truncated ns → µs; and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark lands as TIMESTAMP_NTZ. Branch on
    * the landed type so both generations normalize to the same
    * session-TZ TimestampType µs column — the session TZ is pinned UTC
    * everywhere, so the NTZ → TZ cast preserves the wall-clock instant
    * and DuckDB (which reads either encoding as a naive µs timestamp)
    * stays hash-identical.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** `documents` spread across the session's full parallelism. The fixture
    * is one small parquet file → one input partition, which serializes
    * CPU-heavy text operators onto a single core; at 100 TB the source has
    * thousands of splits and this repartition is a no-op to omit. The
    * shuffle cost here is trivial next to the per-row regex/array work.
    */
  def documentsParallel(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries resolve
    * by bare name — the Spark analog of the reference's three-schema
    * Postgres namespace (SURVEY.md §1).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
