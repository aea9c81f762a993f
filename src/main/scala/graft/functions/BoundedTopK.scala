package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.DataType

/** The k SMALLEST values of a group under the type's total ordering,
  * held in a bounded max-heap — the aggregate that caps a hot key
  * without ever sorting it.
  *
  * Why not `row_number() OVER (PARTITION BY key ORDER BY …) <= k`: a
  * window sorts EVERY row of a partition's key in one task, so one
  * mega-key (a crawl frontier's hottest domain at 100 TB) becomes a
  * single-task sort of the whole key. Here state is a heap of at most
  * `limit` elements per group — update is O(log k) against the heap
  * root, partial aggregation applies (each map task keeps ≤ k per
  * group and `merge` re-caps), and the shuffle carries at most k
  * elements per group per map task instead of the group's rows.
  *
  * Result equivalence with the window formulation: both keep the k
  * smallest under the same total ordering. Determinism therefore
  * requires the ordering to be TOTAL over the data — callers rank by a
  * struct whose fields extend to a unique key (e.g. `(neg_priority,
  * url)` with unique urls); with genuinely duplicated full keys the
  * kept copies are interchangeable, so the result SET is still
  * deterministic.
  *
  * `eval` returns the survivors sorted ascending — stable output for
  * oracles, and "ascending by sort key" is the order a scheduler
  * consumes anyway.
  */
case class BoundedTopK(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends Collect[mutable.PriorityQueue[Any]] {

  require(limit > 0, "graft_topk_agg: limit must be positive")

  // reject non-orderable inputs (maps, …) at ANALYSIS time — without
  // this the interpreted ordering throws deep inside task execution
  // with an opaque trace
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord) // max-heap: root = largest kept

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val value = child.eval(input)
    if (value != null) {
      if (buffer.size < limit) buffer += InternalRow.copyValue(value)
      else if (ord.lt(value, buffer.head)) { // beats the current worst
        buffer.dequeue()
        buffer += InternalRow.copyValue(value)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[Any], other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach { v =>
      if (buffer.size < limit) buffer += v
      else if (ord.lt(v, buffer.head)) { buffer.dequeue(); buffer += v }
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buffer.toArray.sorted(ord))

  override def prettyName: String = "graft_topk_agg"

  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}

object BoundedTopK {
  /** Registered as `graft_topk_agg` by [[graft.plans.GraftExtensions]]. */
  def column(c: org.apache.spark.sql.Column, limit: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_topk_agg", c,
      org.apache.spark.sql.functions.lit(limit))
}
