package graft.pipeline

import org.apache.spark.sql.types._

/** SQL dialect seam for the JDBC staging store (SURVEY §2.1 S7-S10): the
  * spellings that differ between the production Postgres target
  * (reference `docker-compose.yml:1-20`, `erd_table_creations.sql:1-27`)
  * and the embedded Derby that JdbcSpec drives live in-sandbox. Load
  * SEMANTICS (watermark, append, truncate-overwrite, upsert) live in
  * [[Pipeline]]/[[JdbcStore]] and never change per target — a dialect
  * only renders SQL text, so the parity test is "both dialects render,
  * Derby's rendering executes live, Postgres's rendering is asserted
  * against the documented forms".
  */
trait SqlDialect {
  def name: String
  def driver: String

  /** ANSI double-quoting keeps case-preserved identifiers portable:
    * Derby folds unquoted identifiers UP, Postgres folds DOWN, and
    * Spark's JDBC writer creates case-preserved quoted columns — quoting
    * is the only spelling that round-trips on both.
    */
  def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** Pushed-down watermark subquery: one remote row, never a table scan
    * (identical ANSI text on both targets — asserted in JdbcSpec).
    */
  def watermarkSql(table: String, pk: String): String =
    s"""(SELECT COALESCE(MAX(CAST(${quote(pk)} AS BIGINT)), 0) AS w FROM $table) t"""

  /** DDL column type for a Spark type (S9 CREATE parity). */
  def ddlType(dt: DataType): String

  /** Whether `CREATE TABLE IF NOT EXISTS` is supported; when false the
    * caller guards on the already-exists SQLState instead.
    */
  def supportsIfNotExists: Boolean

  /** SQLState raised by CREATE TABLE when the table already exists. */
  def tableExistsSqlState: String

  def createTableSql(table: String, schema: StructType): String = {
    val guard = if (supportsIfNotExists) "IF NOT EXISTS " else ""
    schema.fields
      .map(f => s"${quote(f.name)} ${ddlType(f.dataType)}" +
        (if (f.nullable) "" else " NOT NULL"))
      .mkString(s"CREATE TABLE $guard$table (", ", ", ")")
  }

  /** Single-row key-upsert with `?` placeholders — the ON CONFLICT /
    * MERGE spelling, for MERGE-capable sinks where the anti-join rewrite
    * of [[Pipeline.upsert]] would be wasteful. Placeholder positions
    * follow [[upsertParamOrder]].
    */
  def upsertSql(table: String, schema: StructType, pk: String): String

  /** Field index bound to each `?` of [[upsertSql]], in placeholder
    * order — dialects whose statement mentions a column more than once
    * (Derby's MERGE) override this.
    */
  def upsertParamOrder(schema: StructType, pk: String): Seq[Int] =
    schema.indices

  /** A `?` placeholder, cast if the dialect cannot infer its type. */
  protected def placeholder(f: StructField): String = "?"
}

/** Production target (reference stack: Postgres staging + analytics). */
object PostgresDialect extends SqlDialect {
  val name = "postgres"
  val driver = "org.postgresql.Driver"
  val supportsIfNotExists = true
  val tableExistsSqlState = "42P07"

  def ddlType(dt: DataType): String = dt match {
    case ByteType | ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case StringType => "TEXT"
    case BinaryType => "BYTEA"
    case other =>
      throw new IllegalArgumentException(s"no $name DDL type for $other")
  }

  def upsertSql(table: String, schema: StructType, pk: String): String = {
    val cols = schema.fieldNames.toSeq
    val updates = cols.filterNot(_ == pk)
      .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
    s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${schema.fields.map(placeholder).mkString(", ")}) " +
      s"ON CONFLICT (${quote(pk)}) DO UPDATE SET $updates"
  }
}

/** In-sandbox live target: the embedded Derby on Spark's classpath. */
object DerbyDialect extends SqlDialect {
  val name = "derby"
  val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  val supportsIfNotExists = false // guard on X0Y32 instead
  val tableExistsSqlState = "X0Y32"

  def ddlType(dt: DataType): String = dt match {
    case ByteType | ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(32672)" // Derby's max VARCHAR; no TEXT type
    case BinaryType => "BLOB"
    case other =>
      throw new IllegalArgumentException(s"no $name DDL type for $other")
  }

  // Derby rejects untyped `?` inside a VALUES row expression — cast each
  // placeholder to its column type
  override protected def placeholder(f: StructField): String =
    s"CAST(? AS ${ddlType(f.dataType)})"

  /** MERGE (Derby ≥10.11) — the source must be a base table, so the
    * one-row driver is SYSIBM.SYSDUMMY1 and the incoming values are cast
    * parameters; the pk param appears in ON, non-pk in UPDATE, all in
    * INSERT (see [[upsertParamOrder]]).
    */
  def upsertSql(table: String, schema: StructType, pk: String): String = {
    val cols = schema.fieldNames.toSeq
    def ph(c: String) = placeholder(schema(c))
    val updates = cols.filterNot(_ == pk)
      .map(c => s"${quote(c)} = ${ph(c)}").mkString(", ")
    s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 d " +
      s"ON t.${quote(pk)} = ${ph(pk)} " +
      s"WHEN MATCHED THEN UPDATE SET $updates " +
      s"WHEN NOT MATCHED THEN INSERT (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(ph).mkString(", ")})"
  }

  override def upsertParamOrder(schema: StructType, pk: String): Seq[Int] = {
    val pkIdx = schema.fieldIndex(pk)
    val nonPk = schema.indices.filterNot(_ == pkIdx)
    Seq(pkIdx) ++ nonPk ++ schema.indices
  }
}
