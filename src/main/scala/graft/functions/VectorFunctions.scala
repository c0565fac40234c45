package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * higher-order functions (`zip_with` + `aggregate`) so everything stays in
  * Tungsten — no UDF serialization, no driver round-trips.
  *
  * All accumulation is in DOUBLE in strict index order, which matches the
  * DuckDB oracle's explicit `sum(CAST(a[i] AS DOUBLE) * CAST(b[i] AS
  * DOUBLE))` formulation (DuckDB's builtin list_cosine_similarity is
  * float-precision — measured ~1e-7 off — so oracles avoid it).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine of pre-normalized vectors — one fused dot product. Use with
    * [[normalized]] when one side is reused many times (ANN scans): the
    * norm is paid once per vector instead of once per pair.
    */
  def cosinePrenormalized(a: Column, b: Column): Column = dot(a, b)

  /** Unit-normalize an array<float> into array<double>. */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Random-hyperplane LSH bucket id: sign bits of `nBits` deterministic
    * pseudo-random hyperplanes. Hyperplane p, component i is derived from
    * xxhash64(p, i) scaled to [-1, 1] — fully deterministic across runs and
    * engines, no Math.random (Spark-side only; LSH outputs are verified by
    * exact cosine, so no oracle needs to replicate the hash).
    */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int): Column = {
    def component(p: Int, i: Int): Column =
      (xxhash64(lit(p), lit(i)) % 10000L).cast("double") / 10000.0
    val bits = (0 until nBits).map { p =>
      val proj = (0 until dim).map(i =>
        element_at(vec, i + 1).cast("double") * component(p, i))
        .reduce(_ + _)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _).as(s"bucket")
  }
}
