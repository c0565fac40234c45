package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 52-bit block-mean perceptual hash of a binary payload — the 1-D aHash:
  * the payload splits into 52 equal byte blocks, and bit j is set iff
  * block j's mean byte value exceeds the whole payload's mean. Locality
  * is the point: a small edit disturbs one or two blocks, so perceptually
  * near-identical payloads land within a few hamming bits of each other
  * (re-encodes of the same media collide exactly), while the 52-bit width
  * keeps every value exact in a DOUBLE — the repo's portable-hash
  * convention (hash52/SimHash), so the DuckDB twin replays it bit-for-bit
  * and the d9 banding constants (4 bands × 13 bits) apply unchanged.
  *
  * Determinism across engines: the mean comparison is performed as the
  * exact integer cross-multiplication `sum_j · L > totalSum · len_j`
  * (both sides ≤ 255·L², overflow-free for payloads under ~190 MB), so
  * no float division can round differently between Spark and the oracle.
  * Blocks shorter than one byte (payloads under 52 bytes) contribute a
  * zero bit on both sides.
  *
  * Codegen'd like [[RollingHash]]: one static-call loop, no boxing.
  */
case class BlockMeanHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"block_mean_hash requires BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BlockMeanHash.hashBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BlockMeanHash.hashBytes($c)")

  override protected def withNewChildInternal(c: Expression): BlockMeanHash =
    copy(child = c)
}

object BlockMeanHash {
  val Bits = 52

  /** Entry point referenced from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val L = bytes.length
    if (L == 0) return 0L
    var total = 0L
    var i = 0
    while (i < L) { total += (bytes(i) & 0xff); i += 1 }
    var h = 0L
    var j = 0
    while (j < Bits) {
      val lo = j * L / Bits
      val hi = (j + 1) * L / Bits
      var s = 0L
      var k = lo
      while (k < hi) { s += (bytes(k) & 0xff); k += 1 }
      // mean(block) > mean(payload) ⟺ s/len > total/L ⟺ s·L > total·len
      if (s * L > total * (hi - lo)) h |= 1L << j
      j += 1
    }
    h
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "block_mean_hash", exprs => BlockMeanHash(exprs.head), "scala_udf")
}
