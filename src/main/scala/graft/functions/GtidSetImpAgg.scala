package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The production form of [[GtidSetAgg]]: same interval-set fold, as a
  * `TypedImperativeAggregate` so the buffer lives as a JVM object for
  * the whole partition and serializes only at the partial/final shuffle
  * boundary. The `Aggregator`+`udaf` form round-trips the buffer
  * through its product encoder on every update — fine for tests, a
  * real per-row tax at scale. Buffer = sorted mutable interval list;
  * fold keeps it normalized (same algebra as [[IntervalSet]], which
  * remains the algebra/offset type and the reference implementation
  * this one is spec-checked against).
  */
case class GtidSetImpAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[Long, Long]] {

  // TreeMap lo -> hi, intervals disjoint and non-adjacent
  override def createAggregationBuffer(): java.util.TreeMap[Long, Long] =
    new java.util.TreeMap[Long, Long]()

  /** Insert [lo0,hi0], coalescing overlapping/adjacent runs. */
  private def addInterval(buf: java.util.TreeMap[Long, Long], lo0: Long, hi0: Long): Unit = {
    var lo = lo0
    var hi = hi0
    val floor = buf.floorEntry(lo)
    if (floor != null && floor.getValue >= lo - 1) {
      if (floor.getValue >= hi) return // already contained
      lo = floor.getKey
      hi = math.max(hi, floor.getValue)
    }
    var next = buf.ceilingEntry(lo)
    while (next != null && next.getKey <= hi + 1) {
      hi = math.max(hi, next.getValue)
      buf.remove(next.getKey)
      next = buf.ceilingEntry(lo)
    }
    buf.put(lo, hi)
  }

  override def update(buf: java.util.TreeMap[Long, Long], input: InternalRow): java.util.TreeMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) { val x = v.asInstanceOf[Long]; addInterval(buf, x, x) }
    buf
  }

  override def merge(b1: java.util.TreeMap[Long, Long], b2: java.util.TreeMap[Long, Long]): java.util.TreeMap[Long, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); addInterval(b1, e.getKey, e.getValue) }
    b1
  }

  override def eval(buf: java.util.TreeMap[Long, Long]): Any = {
    val sb = new StringBuilder
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (sb.nonEmpty) sb.append(':')
      if (e.getKey == e.getValue) sb.append(e.getKey)
      else sb.append(e.getKey).append('-').append(e.getValue)
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: java.util.TreeMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size() * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Long, Long] = {
    val buf = new java.util.TreeMap[Long, Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.put(bb.getLong, bb.getLong)
    buf
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_gtid_set"

  override def withNewMutableAggBufferOffset(newOffset: Int): GtidSetImpAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GtidSetImpAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
