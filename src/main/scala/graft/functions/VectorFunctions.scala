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

  /** Deterministic pseudo-random hyperplanes in [-1,1]^dim (fixed LCG — no
    * Math.random, identical across runs/executors). Used as literal arrays
    * so the projection is a native `array_dot` per plane rather than a
    * dim×planes-term codegen expression.
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Array[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(nBits)(Array.fill(dim)(next()))
  }

  /** SQL fragment for the random-hyperplane LSH bucket of `vecCol` — sign
    * bits of `array_dot` projections (requires
    * [[graft.expressions.VectorExpressions.register]]).
    */
  def hyperplaneBucketSql(vecCol: String, dim: Int, nBits: Int): String = {
    val planes = hyperplanes(dim, nBits)
    planes.zipWithIndex.map { case (p, i) =>
      val arr = p.map(x => f"${x}%.9fD").mkString("array(", ",", ")")
      s"(CASE WHEN array_dot($vecCol, $arr) >= 0.0 THEN ${1L << i}L ELSE 0L END)"
    }.mkString(" + ")
  }

  /** DuckDB twin of [[hyperplaneBucketSql]]: the *same* %.9f literals and
    * the same left-to-right accumulation order, so both engines compute
    * bit-identical sign bits (a sign can only diverge if a projection lands
    * within float-noise of exactly 0, probability ~1e-12 per vector·plane).
    * This is what upgrades the LSH ANN query from rows-only to a full
    * hash-checked oracle.
    */
  def hyperplaneBucketDuckSql(vecCol: String, dim: Int, nBits: Int): String = {
    val planes = hyperplanes(dim, nBits)
    planes.zipWithIndex.map { case (p, i) =>
      val terms = p.zipWithIndex.map { case (x, j) =>
        f"CAST($vecCol[${j + 1}] AS DOUBLE) * (${x}%.9f)"
      }.mkString(" + ")
      s"(CASE WHEN ($terms) >= 0.0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** [[hyperplaneBucketDuckSql]] with the outer bit-sum flattened through
    * a list literal — DuckDB's binder recurses once per `+` chain link,
    * so 63 planes of 64-term projections overflow its 128-frame budget
    * when chained; a list binds flat. The bit weights are disjoint
    * integers (sum order-free) and each inner projection keeps the same
    * left-to-right double accumulation as the chained form, so bucket
    * values are bit-identical to [[hyperplaneBucketDuckSql]].
    */
  def hyperplaneBucketDuckSqlFlat(vecCol: String, dim: Int, nBits: Int): String = {
    val planes = hyperplanes(dim, nBits)
    planes.zipWithIndex.map { case (p, i) =>
      val terms = p.zipWithIndex.map { case (x, j) =>
        f"CAST($vecCol[${j + 1}] AS DOUBLE) * (${x}%.9f)"
      }.mkString(" + ")
      s"(CASE WHEN ($terms) >= 0.0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("CAST(list_sum([", ", ", "]) AS BIGINT)")
  }
}
