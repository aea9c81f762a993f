package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-and-hash: the distinct word n-gram shingles of the
  * normalized text, emitted directly as their 64-bit hashes
  * (`xxhash64(shingle)` with Spark's default seed 42 — bit-identical to
  * `xxhash64(graft_shingles(text, n)[i])`, pinned by DedupSpec).
  *
  * Why: every dedup candidate generator explodes shingles only to hash
  * them on the next line — materializing each shingle as a UTF8String
  * through the explode's UnsafeRow writer just to reduce it to 8 bytes.
  * This expression does the reduction inside the scan stage, so the
  * explode moves longs, not strings. Distinctness is on the hash (a
  * 64-bit collision merging two shingles is the same negligible event
  * the bucket join already tolerates).
  */
object ShingleHashUtil {
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val words = s.split("\\s+")
    val start = if (words.length > 0 && words(0).isEmpty) 1 else 0 // leading whitespace
    val m = words.length - start
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = start
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Fused shingle-and-PORTABLE-hash: the distinct word n-gram shingles
  * emitted directly as their md5 top-60-bit hashes — bit-identical to
  * `graft_md5_60(graft_shingles(text, n)[i])` (DedupSpec pins the
  * equivalence), same rationale as [[ShingleHashUtil]]: the portable
  * minhash signature pipeline exploded every shingle as a UTF8String
  * through the UnsafeRow writer only to reduce it to a long on the
  * next projection. Distinctness stays on the STRING (exactly the
  * graft_shingles set), so an md5-60 collision between two distinct
  * shingles still emits both values.
  */
object ShingleMd5Util {
  def shingleMd5s(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val words = s.split("\\s+")
    val start = if (words.length > 0 && words(0).isEmpty) 1 else 0 // leading whitespace
    val m = words.length - start
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = start
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = Md5Util.top60(UTF8String.fromString(it.next()))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShingleMd5s(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_md5_60 needs (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_md5_60"

  override def nullSafeEval(t: Any): Any =
    ShingleMd5Util.shingleMd5s(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleMd5Util.shingleMd5s($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes needs (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(t: Any): Any =
    ShingleHashUtil.shingleHashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHashUtil.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
