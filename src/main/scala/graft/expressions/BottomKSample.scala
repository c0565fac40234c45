package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic uniform sample per group: keep the k values whose
  * `sortKey` hash is smallest ("bottom-k sketch"). With a uniform hash the
  * order is a uniform random permutation of the value domain, but fully
  * deterministic across runs, partitions, and merge orders — a reservoir
  * sample without RNG, so results are reproducible and mergeable (the
  * classic KMV/bottom-k construction; the same buffer doubles as a
  * distinct-count estimator via k/max-hash).
  *
  * The hash is an explicit child expression rather than a baked-in
  * algorithm, so callers can supply an engine-portable hash (e.g.
  * [[graft.functions.TextFunctions.hash52]]) and the sample becomes
  * bit-identical to a `row_number() OVER (ORDER BY hash)` oracle in any
  * other SQL engine.
  *
  * The custom-aggregate rung of the extension ladder: a
  * TypedImperativeAggregate with a mutable buffer, partial merge, and
  * compact binary serialization.
  */
case class BottomKSample(sortKey: Expression, child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKSample.Buffer] {

  import BottomKSample.Buffer

  override def children: Seq[Expression] = Seq(sortKey, child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    val h = sortKey.eval(input)
    if (v != null && h != null) {
      buf.offer(h.asInstanceOf[Number].longValue(),
        v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = { a.absorb(b); a }

  override def eval(buf: Buffer): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.entries.foreach { case (h, v) => out.writeLong(h); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buffer(k)
    (0 until n).foreach(_ => buf.offer(in.readLong(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(sortKey = c(0), child = c(1))
}

object BottomKSample {

  /** Mutable bottom-k buffer: a bounded max-heap on hash (evict the
    * largest hash when full). Deduplicates by hash so repeated values
    * sample once — set semantics, matching KMV.
    */
  final class Buffer(k: Int) {
    private val heap = new java.util.TreeMap[Long, Long]() // hash → value

    def offer(h: Long, v: Long): Unit = {
      if (!heap.containsKey(h)) {
        heap.put(h, v)
        if (heap.size() > k) heap.remove(heap.lastKey())
      }
    }

    def absorb(other: Buffer): Unit =
      other.entries.foreach { case (h, v) => offer(h, v) }

    def entries: Iterator[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      heap.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
    }

    def size: Int = heap.size()

    /** Values in ascending hash order — a deterministic output order. */
    def sortedValues: Array[Long] = entries.map(_._2).toArray
  }

  /** SQL registration: `bottom_k_sample(sort_hash, value)`. */
  def register(spark: SparkSession, k: Int = 10): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_sample",
      exprs => BottomKSample(exprs(0), exprs(1), k).toAggregateExpression(),
      "scala_udf")
}
