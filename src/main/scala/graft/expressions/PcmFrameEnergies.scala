package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-frame energy profile of a PCM-style binary payload — the audio
  * analog of the image family's block-mean hash: the payload is cut into
  * consecutive `frameLen`-byte frames (last frame partial) and each frame
  * reports Σ (sample − 128)², the squared deviation from the unsigned-8-bit
  * DC midpoint. This is the silence-trim / peak-find / loudness-histogram
  * primitive an audio ingest pipeline runs before any codec work, and it is
  * INTEGER arithmetic end-to-end — every value ≤ 128²·frameLen fits a Long
  * with no float rounding, so the DuckDB twin replays it bit-for-bit from
  * the same bytes (m7's contract). On real PCM the bytes are samples; on
  * the stand-in corpus they are the UTF-8 payload — the operator does not
  * care, which is the point of the opaque-binary multimodal model.
  *
  * Codegen'd like [[RollingHash]]: one static-call loop, no boxing; the
  * result array is built primitively and wrapped once.
  */
case class PcmFrameEnergies(child: Expression, frameLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType && frameLen > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pcm_frame_energies requires BINARY input and frameLen > 0, got ${child.dataType}/$frameLen")

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(
      PcmFrameEnergies.energies(input.asInstanceOf[Array[Byte]], frameLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.expressions.PcmFrameEnergies.energies($c, $frameLen))")

  override protected def withNewChildInternal(c: Expression): PcmFrameEnergies =
    copy(child = c)
}

object PcmFrameEnergies {
  /** m7's registered frame length — 256 samples per frame. */
  val FrameLen = 256

  /** Entry point referenced from generated code. */
  def energies(bytes: Array[Byte], frameLen: Int): Array[Long] = {
    val L = bytes.length
    val n = (L + frameLen - 1) / frameLen
    val out = new Array[Long](n)
    var f = 0
    while (f < n) {
      val lo = f * frameLen
      val hi = math.min(lo + frameLen, L)
      var s = 0L
      var i = lo
      while (i < hi) {
        val d = (bytes(i) & 0xff) - 128
        s += d * d
        i += 1
      }
      out(f) = s
      f += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pcm_frame_energies",
      exprs => PcmFrameEnergies(exprs.head, FrameLen), "scala_udf")
}
