package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 52-bit block-CURVATURE perceptual hash — the second-difference
  * companion to [[BlockMeanHash]] (level) and [[BlockGradientHash]]
  * (first difference): the payload splits into 54 equal byte blocks and
  * bit j is set iff the mean STEP from block j+1 to j+2 exceeds the step
  * from block j to j+1 — the local convexity of the byte-mean profile.
  * Level, slope, and curvature respond to different perturbations (a
  * global brightness shift flips aHash bits but neither difference hash;
  * a linear shading ramp flips gradient bits but not curvature bits), so
  * this is the third independent signal that funds m6's band keys past
  * [[graft.multimodal.Multimodal.MediaExtraBitsCap]] — the funding dial
  * the cap's scaladoc named, now implemented
  * ([[graft.multimodal.Multimodal.mediaBandsWide2]]).
  *
  * Determinism across engines mirrors its siblings, one level deeper: the
  * comparison `mean(j+2) − mean(j+1) > mean(j+1) − mean(j)` is cleared of
  * divisions by multiplying through by `len_j·len_{j+1}·len_{j+2} > 0`:
  *
  *   s_{j+2}·len_{j+1}·len_j + s_j·len_{j+2}·len_{j+1}
  *     > 2·s_{j+1}·len_{j+2}·len_j
  *
  * With c = ⌈L/54⌉: each product of one block sum (≤ 255·c) and two
  * block lengths (≤ c each) is ≤ 255·c³, so the two-term LHS sum and the
  * RHS's 2·s·len·len term each reach 2·255·c³ — under Long.MaxValue
  * while c ≤ ⌊((2⁶³−1)/510)^⅓⌋ = 262,486, i.e. payloads up to ~14.17 MB
  * (54·262,486 bytes); call ~13 MB the guaranteed-safe contract
  * (document payloads in this corpus are KB-scale; a production variant
  * for larger media chunks the payload first, which the m3/m12 frame
  * seam already does). Blocks
  * of length zero (L < 54) contribute zero products on both sides, so
  * short payloads degrade to fewer live bits rather than erroring, like
  * the siblings.
  *
  * Codegen'd like the siblings: one static-call loop, no boxing.
  */
case class BlockCurvatureHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"block_curvature_hash requires BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BlockCurvatureHash.hashBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BlockCurvatureHash.hashBytes($c)")

  override protected def withNewChildInternal(c: Expression): BlockCurvatureHash =
    copy(child = c)
}

object BlockCurvatureHash {
  val Bits = 52
  private val Blocks = Bits + 2

  /** Entry point referenced from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val L = bytes.length
    if (L == 0) return 0L
    // block sums over 54 equal blocks (⌊k·L/54⌋ boundaries, the
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
      // mean(j+2) − mean(j+1) > mean(j+1) − mean(j), cleared of divisions
      if (sums(j + 2) * lens(j + 1) * lens(j) +
            sums(j) * lens(j + 2) * lens(j + 1) >
          2L * sums(j + 1) * lens(j + 2) * lens(j)) h |= 1L << j
      j += 1
    }
    h
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "block_curvature_hash", exprs => BlockCurvatureHash(exprs.head), "scala_udf")
}
