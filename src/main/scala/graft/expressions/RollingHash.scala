package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** Polynomial rolling hash (Rabin–Karp) of a string's UTF-8 bytes:
  *
  *   h = Σ bytes(i) · B^(n-1-i)  mod P,  B = 257, P = 2^61 − 1
  *
  * The document-fingerprinting primitive: content-addressed, incremental
  * (`h(a ++ b) = h(a)·B^|b| + h(b) mod P` — the property tests pin this),
  * and cheap enough to run inline in a scan. Implemented as a native
  * codegen'd expression; mulmod uses 128-bit multiply via Math.multiplyHigh
  * so the whole loop stays branch-free primitive arithmetic.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = RollingHash.mulmod(h, RollingHash.Base)
      h = RollingHash.addmod(h, (bytes(i) & 0xff).toLong)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

object RollingHash {
  val Base = 257L
  val Mod = (1L << 61) - 1

  /** (a*b) mod (2^61-1) without overflow: split the 128-bit product into
    * high/low and fold with the Mersenne identity 2^61 ≡ 1 (mod P).
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // product = hi·2^64 + lo = hi·8·2^61 + lo ≡ hi·8 + lo (mod 2^61-1)
    val folded = (hi << 3) + (lo >>> 61) + (lo & Mod)
    val r = (folded >>> 61) + (folded & Mod)
    if (r >= Mod) r - Mod else r
  }

  def addmod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= Mod) s - Mod else s
  }

  /** Entry point referenced from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulmod(h, Base)
      h = addmod(h, (bytes(i) & 0xff).toLong)
      i += 1
    }
    h
  }

  /** B^n mod P — for the incremental-concatenation property. */
  def powmod(n: Long): Long = {
    var result = 1L
    var b = Base
    var e = n
    while (e > 0) {
      if ((e & 1) == 1) result = mulmod(result, b)
      b = mulmod(b, b)
      e >>= 1
    }
    result
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
}
