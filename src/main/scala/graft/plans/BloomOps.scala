package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Sharded-sketch support for [[graft.operators.CrawlFrontier]] (and any
  * other stored membership index): the scale-safe alternative to merging
  * every Bloom row into ONE driver-side byte array embedded as a plan
  * literal. A billions-of-URLs frontier needs a multi-gigabyte sketch —
  * past ~2.3 B expected items a single JVM byte array cannot even hold
  * it, and well before that shipping it to every task as a literal is
  * prohibitive. Keyed per shard, each sketch stays
  * `expectedItems / nShards` sized, merging is a distributed
  * per-shard aggregate, and probing is a keyed join — no driver copy
  * anywhere.
  */
object BloomOps {
  private[plans] def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  private[plans] def write(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}

/** Per-task cache of deserialized sketches keyed by shard id — the
  * piece that makes a per-ROW sketch column viable: after a
  * shard-keyed shuffle a task sees few distinct shards, so each
  * sketch's bytes are materialized and deserialized ONCE per task
  * instead of per row. Serializable holder with transient state: the
  * plan ships the (empty) holder, each task's deserialized copy fills
  * its own map. A shard whose sketch column was null (join miss —
  * nothing indexed there) caches a non-BloomFilter marker so the miss
  * is remembered too.
  */
final class BloomProbeCache extends Serializable {
  @transient private lazy val m =
    new java.util.concurrent.ConcurrentHashMap[Int, AnyRef]()
  def get(shard: Int): AnyRef = m.get(shard)
  def put(shard: Int, bytes: Array[Byte]): AnyRef = {
    val v: AnyRef = if (bytes == null) java.lang.Boolean.FALSE else BloomOps.read(bytes)
    m.put(shard, v)
    v
  }
}

/** `graft_bloom_merge(array<binary>) → binary` — merge serialized Bloom
  * sketches (same m/k: the caller pins `expectedItems`, so
  * `mergeInPlace` is exact). Null elements are skipped; an empty or
  * all-null array yields null. Evaluated once per GROUP (it consumes a
  * `collect_list` over the handful of per-append sketch rows of one
  * shard), so the per-call deserialization cost is off any per-row
  * path.
  */
case class BloomSketchMerge(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_merge expects array<binary>, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var merged: BloomFilter = null
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val bf = BloomOps.read(arr.getBinary(i))
        if (merged == null) merged = bf else merged.mergeInPlace(bf)
      }
      i += 1
    }
    if (merged == null) null else BloomOps.write(merged)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bloom_probe(shard, sketch, hash) → boolean` — membership
  * probe against a PER-ROW sketch column (the per-shard sketch a keyed
  * join attached), which Spark's own `might_contain` refuses: it
  * demands a constant sketch precisely because deserializing per row
  * would be quadratic. This expression makes the join form viable by
  * deserializing each shard's sketch ONCE per task: the sketch child
  * is evaluated LAZILY — its (large) bytes are only materialized on a
  * shard-cache miss, in both the interpreted and the GENERATED path
  * (the sketch child's code is emitted inside the cache-miss branch,
  * so the probe stays inside whole-stage codegen without paying the
  * bytes-copy per row).
  *
  * Null semantics: null shard or null hash → null; a null sketch for a
  * cached-or-probed shard (the join missed: nothing indexed there) →
  * null as well — callers `coalesce(..., false)` for anti-join parity,
  * exactly as with `might_contain`.
  */
case class BloomShardProbe(shard: Expression, bloom: Expression, hash: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(shard, bloom, hash)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    (shard.dataType, bloom.dataType, hash.dataType) match {
      case (IntegerType, BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, b, h) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_probe expects (int, binary, bigint), got " +
          s"(${s.simpleString(10)}, ${b.simpleString(10)}, ${h.simpleString(10)})")
    }

  private val cache = new BloomProbeCache

  override def eval(input: InternalRow): Any = {
    val s = shard.eval(input)
    if (s == null) return null
    val h = hash.eval(input)
    if (h == null) return null
    val key = s.asInstanceOf[Int]
    var bf = cache.get(key)
    if (bf == null) {
      val bytes = bloom.eval(input)
      bf = cache.put(key,
        if (bytes == null) null else bytes.asInstanceOf[Array[Byte]])
    }
    bf match {
      case f: BloomFilter =>
        java.lang.Boolean.valueOf(f.mightContainLong(h.asInstanceOf[Long]))
      case _ => null // marker: this shard has no sketch
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shardGen = shard.genCode(ctx)
    val hashGen = hash.genCode(ctx)
    val bloomGen = bloom.genCode(ctx)
    val cacheRef = ctx.addReferenceObj("bloomProbeCache", cache,
      classOf[BloomProbeCache].getName)
    val bfClass = classOf[BloomFilter].getName
    val bfVar = ctx.freshName("bf")
    ev.copy(code = code"""
      ${shardGen.code}
      boolean ${ev.isNull} = true;
      boolean ${ev.value} = false;
      if (!${shardGen.isNull}) {
        ${hashGen.code}
        if (!${hashGen.isNull}) {
          Object $bfVar = $cacheRef.get(${shardGen.value});
          if ($bfVar == null) {
            // cache miss: ONLY here do the sketch bytes materialize
            ${bloomGen.code}
            $bfVar = $cacheRef.put(${shardGen.value},
              ${bloomGen.isNull} ? null : ${bloomGen.value});
          }
          if ($bfVar instanceof $bfClass) {
            ${ev.value} = (($bfClass) $bfVar).mightContainLong(${hashGen.value});
            ${ev.isNull} = false;
          }
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(shard = newChildren(0), bloom = newChildren(1), hash = newChildren(2))
}
