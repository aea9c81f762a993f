package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE imperative aggregate: fold each shingle
  * hash through k permutations `h_i(x) = (a_i·x + b_i) mod p`, keeping
  * the per-permutation minimum in a single `long[k]` buffer.
  *
  * The declarative alternative — k separate `min(pmod(h*a_i+b_i, p))`
  * aggregate columns — works but costs k aggregate buffers, a ~k×
  * larger generated-code body (multi-second Janino compile at k=64,
  * paid per cold query), and k expression evaluations per row through
  * the aggregate interface. This is the same pattern as
  * [[GtidSetAgg]]: partial aggregation still applies (map-side fold,
  * merge = elementwise min), the shuffle carries k longs per group.
  *
  * The permutation constants and modular arithmetic are bit-identical
  * to the previous formulation (wrap-around 64-bit multiply, then a
  * sign-corrected mod by the Mersenne prime 2^61-1).
  */
case class MinHashSigAgg(
    child: Expression,
    k: Int,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2305843009213693951L // 2^61 - 1
  private val P31 = 2147483647L // 2^31 - 1

  /** Portable mode: permutation `h_j(x) = ((2j+1)·x + j·12345 + 7) mod
    * (2^31-1)` over inputs already reduced mod 2^31-1 — every product
    * stays < 2^62 (no wraparound), so an ANSI engine (the DuckDB
    * oracle) reproduces each signature value bit-for-bit in plain
    * 64-bit arithmetic. Same constants as the declarative witness
    * formulation in [[graft.operators.dedup.MinHashDedup.portablePairs]].
    * Default mode keeps the original wrap-around 2^61-1 constants
    * (bench/production fast path fed by xxhash64).
    */
  private val as: Array[Long] =
    if (portable) Array.tabulate(k)(i => 2L * i + 1L)
    else Array.tabulate(k)(i => 2L * (1103515245L * (i + 1) + 12345L) + 1L)
  private val bs: Array[Long] =
    if (portable) Array.tabulate(k)(i => i * 12345L + 7L)
    else Array.tabulate(k)(i => 1103515245L * (i + 7919) + 104729L)
  private val mod: Long = if (portable) P31 else P

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val x = h * as(i) + bs(i) // wrap-around in default mode only
        val m = x % mod
        val p = if (m < 0) m + mod else m
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  /** Registered as `graft_minhash_sig` by [[graft.plans.GraftExtensions]]. */
  def column(h: Column, k: Int, portable: Boolean = false): Column =
    org.apache.spark.sql.functions.call_function("graft_minhash_sig", h,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(portable))
}
