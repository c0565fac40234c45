package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Shannon entropy (nats) of a binary payload's byte histogram — the
  * compressibility proxy a multimodal QA pass runs before feature work:
  * near-zero entropy flags constant/padded/black-frame payloads, and
  * entropy near 8 bits flags already-compressed or encrypted blobs that a
  * decode stage should route differently. One 256-counter pass per row —
  * the same integer-histogram shape as [[PcmFrameEnergies]] — with the
  * single float fold at the end over at most 256 terms, so the DuckDB twin
  * replays it to 6dp under the repo's nudge+round convention.
  *
  * Codegen'd like [[RollingHash]]: one static-call loop, no boxing.
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_entropy requires BINARY input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ByteEntropy.entropy(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ByteEntropy.entropy($c)")

  override protected def withNewChildInternal(c: Expression): ByteEntropy =
    copy(child = c)
}

object ByteEntropy {
  /** Entry point referenced from generated code. Returns NATS — callers
    * divide by ln 2 for bits (kept raw here so the expression stays a
    * pure histogram fold; the presentation unit is the operator's call).
    * Empty payloads report 0.
    */
  def entropy(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val counts = new Array[Long](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val nd = n.toDouble
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0) { val p = c / nd; h -= p * math.log(p) }
      b += 1
    }
    h
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_entropy", exprs => ByteEntropy(exprs.head), "scala_udf")
}
