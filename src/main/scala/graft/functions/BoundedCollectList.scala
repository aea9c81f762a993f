package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{Collect, ImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard per-group size bound: stops accumulating
  * once the buffer holds `limit + 1` elements.
  *
  * Why not `collect_list(...)` + `filter(size(members) <= limit)`: the
  * filter runs AFTER aggregation, so a degenerate hot key (a stop-shingle
  * or hot LSH band shared by millions of docs at 100 TB) builds one
  * unbounded in-memory buffer — a single group's list cannot spill —
  * before being discarded. Here the buffer is bounded at `limit + 1`
  * elements per group no matter how many rows the group has: one extra
  * element is kept precisely so the downstream
  * `size(members) <= limit` filter still sees "exceeded the cap" and
  * drops the group, identical to the unbounded formulation's result.
  *
  * Result equivalence with collect_list-then-filter: groups with
  * ≤ limit members collect every element (order differs, but all dedup
  * consumers treat members as a set); groups beyond the cap are dropped
  * by the same filter either way. Partial aggregation still applies —
  * map-side buffers cap individually and `merge` re-caps.
  */
case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends Collect[mutable.ArrayBuffer[Any]] {

  require(limit > 0, "graft_collect_capped: limit must be positive")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= limit && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = "graft_collect_capped"

  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BoundedCollectList {
  /** Registered as `graft_collect_capped` by [[graft.plans.GraftExtensions]]. */
  def column(c: Column, limit: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_collect_capped", c,
      org.apache.spark.sql.functions.lit(limit))
}
