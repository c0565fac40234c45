package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Level-crossing count of a PCM-style binary payload — the number of
  * consecutive-sample pairs that straddle the reference `level`
  * (prev < level XOR cur < level). At level = DC midpoint this is the
  * classic zero-crossing rate, the cheapest spectral proxy in audio
  * curation: speech sits low, fricatives/noise high, so a pass routes or
  * drops payloads on it before any FFT is paid. Threshold form (>= vs <)
  * rather than signed-zero form so a sample exactly AT the level is
  * unambiguous — both engines bind the same side.
  *
  * Codegen'd like [[PcmClipCount]]: one static-call loop over the byte
  * array, no boxing; integer end-to-end, so the DuckDB twin replays the
  * same comparisons from the same bytes and the operator is hash-checked.
  */
case class PcmLevelCrossings(child: Expression, level: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType && level > 0 && level < 256)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pcm_level_crossings requires BINARY input and level in (0, 256), got ${child.dataType}/$level")

  override def nullSafeEval(input: Any): Any =
    PcmLevelCrossings.crossings(input.asInstanceOf[Array[Byte]], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PcmLevelCrossings.crossings($c, $level)")

  override protected def withNewChildInternal(c: Expression): PcmLevelCrossings =
    copy(child = c)
}

object PcmLevelCrossings {
  /** m14's registered reference level. True PCM would use the DC midpoint
    * 128, but the stand-in corpus is UTF-8 text whose bytes live in
    * [32, 122] — midpoint-128 crossings are identically zero there. 100
    * splits that range through the letter block (lowercase ≥ 'd', space,
    * digits and punctuation below), so every downstream rate and verdict
    * is exercised by the fixtures while the operator semantics stay
    * byte-replayable.
    */
  val CrossLevel = 100

  /** Entry point referenced from generated code. */
  def crossings(bytes: Array[Byte], level: Int): Long = {
    if (bytes.length < 2) return 0L
    var n = 0L
    var prevBelow = (bytes(0) & 0xff) < level
    var i = 1
    while (i < bytes.length) {
      val below = (bytes(i) & 0xff) < level
      if (below != prevBelow) n += 1
      prevBelow = below
      i += 1
    }
    n
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pcm_level_crossings",
      exprs => PcmLevelCrossings(exprs.head, CrossLevel), "scala_udf")
}
