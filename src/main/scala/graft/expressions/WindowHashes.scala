package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `n`-element window hashes of a token-hash array in ONE pass — the
  * rolling (Rabin–Karp) combination of per-token hashes that replaces
  * d21's per-window string build:
  *
  *   wh(i) = Σ_{j=0}^{n-1} th(i+j) · B^(n-1-j)   mod P
  *
  * with [[RollingHash]]'s B = 257, P = 2^61 − 1, computed via the prefix
  * recurrence `pref(k+1) = pref(k)·B + th(k)` and
  * `wh(i) = pref(i+n) − pref(i)·B^n`, so the whole profile is O(L) longs
  * per document instead of O(L·n) concatenated string bytes — at 100 TB
  * the constant factor between those two is the difference between a
  * shared-span pass that fits its window and one that doesn't. Input
  * shorter than `n` yields an empty array (the "doc has no windows" case
  * d21's `when(size < n)` guard used to spell).
  *
  * Collision contract: equal token windows hash equal by construction;
  * unequal windows collide with the same negligible probability the
  * d10/d8 xxhash64 grouping already rides (P ≈ 2^61) — the oracle twin
  * keeps grouping windows by their joined STRING, which is exactly the
  * equality this hash represents. Codegen'd like [[PcmFrameEnergies]]:
  * one static-call loop, primitive arrays end-to-end.
  */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_hashes requires ARRAY<BIGINT> input and n > 0, got $other/$n")
    }

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      WindowHashes.hashes(input.asInstanceOf[ArrayData].toLongArray(), n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.expressions.WindowHashes.hashes($c.toLongArray(), $n))")

  override protected def withNewChildInternal(c: Expression): WindowHashes =
    copy(child = c)
}

object WindowHashes {
  /** Entry point referenced from generated code. */
  def hashes(th: Array[Long], n: Int): Array[Long] = {
    val L = th.length
    if (L < n) return Array.emptyLongArray
    val out = new Array[Long](L - n + 1)
    val bn = RollingHash.powmod(n.toLong)
    // pref carries pref(k) while negBn·pref(i) subtracts the departing
    // prefix: wh(i) = pref(i+n) + (P − B^n)·pref(i)  (mod P)
    val negBn = RollingHash.Mod - bn
    val pref = new Array[Long](L + 1)
    var k = 0
    while (k < L) {
      pref(k + 1) = RollingHash.addmod(
        RollingHash.mulmod(pref(k), RollingHash.Base),
        java.lang.Long.remainderUnsigned(th(k), RollingHash.Mod))
      k += 1
    }
    var i = 0
    while (i <= L - n) {
      out(i) = RollingHash.addmod(pref(i + n), RollingHash.mulmod(negBn, pref(i)))
      i += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "window_hashes",
      exprs => WindowHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
}
