package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN — for every left row, the single right row with the same
  * `by` key and the greatest `on` value ≤ the left's `on` value (LEFT
  * OUTER semantics: unmatched left rows keep nulls on the right).
  *
  * Spark's DataFrame API has no as-of join, and composing one from
  * built-ins is quadratic (range join + per-key max + re-join). This is
  * the textbook case for a whole custom operator: a logical node, a
  * planner strategy, and a sort-merge physical exec whose distribution /
  * ordering requirements let Catalyst plan exactly one hash exchange per
  * side, after which the merge is a single linear pass per partition —
  * the same shape a 1000-executor cluster wants at 100 TB (co-partitioned
  * by key, no broadcast, no row explosion).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftBy: Expression, rightBy: Expression,
                        leftOn: Expression, rightOn: Expression,
                        tolerance: Option[Long] = None)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan) =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lBy, rBy, lOn, rOn, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lBy, rBy, lOn, rOn, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftBy: Expression, rightBy: Expression,
                        leftOn: Expression, rightOn: Expression,
                        tolerance: Option[Long] = None)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** SQL metrics — the same observability surface the built-in joins
    * expose in the Spark UI / `metrics` map: matched vs unmatched left
    * rows (the as-of hit rate an alignment pipeline monitors) and the
    * left rows skipped for a null key/on-value.
    */
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "matched left rows"),
    "numUnmatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "unmatched left rows"),
    "numNullKeyRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with null key or on-value"))

  /** Hash-co-partition both sides on the by key… */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftBy)), ClusteredDistribution(Seq(rightBy)))

  /** …and sort each partition by (by, on), so the merge is one pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lByB = BindReferences.bindReference(leftBy, left.output)
    val rByB = BindReferences.bindReference(rightBy, right.output)
    val lOnB = BindReferences.bindReference(leftOn, left.output)
    val rOnB = BindReferences.bindReference(rightOn, right.output)
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftBy.dataType)
      .asInstanceOf[Ordering[Any]]
    val nRight = right.output.size
    val outAttrs = output
    val hasTol = tolerance.isDefined
    val tolV = tolerance.getOrElse(0L)
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val numUnmatchedRows = longMetric("numUnmatchedRows")
    val numNullKeyRows = longMetric("numNullKeyRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)

      var rCur: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var candidate: InternalRow = null
      var candidateKey: Any = null
      var candidateOn: Long = 0L

      lIter.map { l =>
        val lk = lByB.eval(l)
        val lOnV = lOnB.eval(l)
        if (lk == null || lOnV == null) {
          // a null key or null on-value can match nothing: emit unmatched
          // (the sort puts null on-values first, so the cursor state is
          // untouched and later non-null left rows still see every right row)
          numNullKeyRows += 1
          numUnmatchedRows += 1
          numOutputRows += 1
          joiner(joined(l, nullRight))
        } else {
          val lt = lOnV.asInstanceOf[Number].longValue()
          // advance the right cursor while it is still "at or before" (lk, lt);
          // right rows with a null key or null on-value are skipped (never a
          // candidate) rather than crashing the comparison
          var advancing = true
          while (advancing && rCur != null) {
            val rk = rByB.eval(rCur)
            val rOnV = if (rk == null) null else rOnB.eval(rCur)
            if (rk == null || rOnV == null) {
              rCur = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              val c = keyOrdering.compare(rk, lk)
              if (c < 0 || (c == 0 && rOnV.asInstanceOf[Number].longValue() <= lt)) {
                if (c == 0) {
                  candidate = rCur; candidateKey = rk
                  candidateOn = rOnV.asInstanceOf[Number].longValue()
                }
                rCur = if (rIter.hasNext) rIter.next().copy() else null
              } else advancing = false
            }
          }
          // `within` bound: the candidate is the greatest on-value ≤ lt for
          // this key, so if IT falls outside the tolerance no earlier right
          // row can fall inside — unmatched, not "try an older one"
          val matched = candidate != null &&
            keyOrdering.compare(candidateKey, lk) == 0 &&
            (!hasTol || lt - candidateOn <= tolV)
          if (matched) numMatchedRows += 1 else numUnmatchedRows += 1
          numOutputRows += 1
          joiner(joined(l, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan) =
    copy(left = l, right = r)
}

/** DataFrame-level API. */
object AsOfJoin {

  /** `asof(left, right, by, on)`: left outer as-of join. Column arguments
    * must resolve against the respective inputs. `within`, if given,
    * bounds the match: a right row only matches when
    * `leftOn - rightOn <= within`, in the on-key's native units
    * (microseconds for timestamps, days for dates, the value itself for
    * integers) — the DuckDB/kdb ASOF tolerance, and the guard every
    * sensor/trade alignment needs against matching a reading from hours
    * ago.
    */
  def asof(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftBy: Column, rightBy: Column,
           leftOn: Column, rightOn: Column,
           within: Option[Long] = None): DataFrame = {
    GraftSqlShim.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = GraftSqlShim.analyzedPlan(left)
    val rPlan = GraftSqlShim.analyzedPlan(right)
    def resolve(c: Column, plan: LogicalPlan, df: DataFrame): Expression = {
      val name = df.select(c).columns.head
      plan.output.find(a => df.sparkSession.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    }
    val lOn = resolve(leftOn, lPlan, left)
    val rOn = resolve(rightOn, rPlan, right)
    // the merge compares on-values as longs — only integral/temporal types
    // carry that representation; reject anything else at build time instead
    // of a ClassCastException mid-stage
    import org.apache.spark.sql.types._
    def checkOnType(e: Expression, side: String): Unit = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => ()
      case other => throw new IllegalArgumentException(
        s"as-of join: unsupported $side on-key type $other " +
          "(need an integral, date, or timestamp column)")
    }
    checkOnType(lOn, "left")
    checkOnType(rOn, "right")
    within.foreach { t =>
      require(t >= 0, s"as-of join: `within` must be non-negative, got $t")
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      resolve(leftBy, lPlan, left), resolve(rightBy, rPlan, right),
      lOn, rOn, within)
    GraftSqlShim.ofRows(spark, node)
  }
}
