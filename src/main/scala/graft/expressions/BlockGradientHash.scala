package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 52-bit block-GRADIENT perceptual hash — the 1-D dHash companion to
  * [[BlockMeanHash]]: the payload splits into 53 equal byte blocks and bit
  * j is set iff block j+1's mean exceeds block j's mean. Where the aHash
  * compares each block to the GLOBAL mean, the gradient hash captures the
  * local direction of change, so the two respond to different
  * perturbations — which is exactly why it funds the EXTRA band-key bits
  * when the media corpus outgrows the 52-bit key space
  * ([[graft.operators.Dedup.deriveExtraBandBits]]): near-identical
  * payloads still collide on both hashes, while payloads that merely tie
  * on a few aHash bits are separated by the independent gradient bits.
  *
  * Determinism across engines mirrors BlockMeanHash: the comparison is the
  * exact integer cross-multiplication `sum_{j+1} · len_j > sum_j ·
  * len_{j+1}` (both sides ≤ 255·L², overflow-free for payloads under
  * ~190 MB), no float division anywhere. Payloads shorter than 53 bytes
  * have empty blocks contributing zero bits on both sides.
  *
  * Codegen'd like [[BlockMeanHash]]: one static-call loop, no boxing.
  */
case class BlockGradientHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"block_gradient_hash requires BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BlockGradientHash.hashBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BlockGradientHash.hashBytes($c)")

  override protected def withNewChildInternal(c: Expression): BlockGradientHash =
    copy(child = c)
}

object BlockGradientHash {
  val Bits = 52
  private val Blocks = Bits + 1

  /** Entry point referenced from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val L = bytes.length
    if (L == 0) return 0L
    // block sums over 53 equal blocks (⌊k·L/53⌋ boundaries, the
    // BlockMeanHash convention)
    val sums = new Array[Long](Blocks)
    val lens = new Array[Long](Blocks)
    var k = 0
    while (k < Blocks) {
      val lo = k * L / Blocks
      val hi = (k + 1) * L / Blocks
      var s = 0L
      var i = lo
      while (i < hi) { s += (bytes(i) & 0xff); i += 1 }
      sums(k) = s
      lens(k) = hi - lo
      k += 1
    }
    var h = 0L
    var j = 0
    while (j < Bits) {
      // mean(j+1) > mean(j) ⟺ s_{j+1}·len_j > s_j·len_{j+1}
      if (sums(j + 1) * lens(j) > sums(j) * lens(j + 1)) h |= 1L << j
      j += 1
    }
    h
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "block_gradient_hash", exprs => BlockGradientHash(exprs.head), "scala_udf")
}
