package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, TreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k smallest DISTINCT longs of the group in UNSIGNED order, ascending —
  * the KMV (k-minimum-values) cardinality-sketch state (Bar-Yossef et al.,
  * RANDOM'02). A `TypedImperativeAggregate`, so Spark runs it through
  * ObjectHashAggregate with a MAP-SIDE PARTIAL pass: each task ships one
  * ≤k-element state per group, never its rows — the sketch costs one
  * k·8-byte-per-group shuffle regardless of corpus size (the scale path that
  * `DISTINCT + window rank` can't offer: that shuffles every distinct value).
  *
  * State is a TreeSet under unsigned comparison: `add` dedups, `pollLast`
  * evicts the current maximum once size exceeds k. Update/merge are
  * insertion-ordered-invariant (set semantics), so the result is
  * bit-deterministic across partitionings and merge orders. Null inputs are
  * ignored (standard aggregate contract).
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TreeSet[java.lang.Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TreeSet[java.lang.Long] =
    new TreeSet[java.lang.Long](KMinDistinct.UnsignedCmp)

  private def add(buf: TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0 && buf.add(h)) {
      buf.pollLast(); ()
    }

  override def update(
      buf: TreeSet[java.lang.Long], input: InternalRow): TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: TreeSet[java.lang.Long], b: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KMinDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KMinDistinct =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "kmin_distinct"
}

object KMinDistinct {
  /** Unsigned long order — serializable (ships inside task closures). */
  object UnsignedCmp extends Comparator[java.lang.Long] with Serializable {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }
}
