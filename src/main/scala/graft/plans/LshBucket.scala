package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All `nBits` sign-projection bits of one LSH table in a single fused
  * pass — the native form of the per-bit
  * `aggregate(zip_with(vec, plane, _*_), 0.0, _+_)` HOF stack, which
  * evaluates INTERPRETED and allocates two dim-sized arrays per bit
  * per row (nBits × tables folds/row: 64 interpreted folds at the
  * knnGraph defaults). Bit-identical to the composable form — plane
  * weights come from the same md5 derivation
  * ([[graft.operators.sim.SimilaritySearch.portablePlane]] replays it)
  * and the projection folds left-to-right in double, so every bucket
  * id still reproduces in the DuckDB oracles. Null-array and
  * null-element inputs follow the declarative composition: a null
  * element nulls every projection (`when(null >= 0)` → otherwise) and
  * a null array nulls each bit term, so both produce bucket 0, never
  * NULL.
  *
  * Plane matrices are cached per (table, nBits, dim) — md5 runs once
  * per shape per JVM, not per row.
  */
object LshBucketUtil {
  private val planes =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planesFor(table: Int, nBits: Int, dim: Int): Array[Array[Double]] =
    planes.computeIfAbsent((table, nBits, dim), { _ =>
      Array.tabulate(nBits)(b =>
        graft.operators.sim.SimilaritySearch.portablePlane(table, b, dim))
    })

  def bucket(arr: ArrayData, table: Int, nBits: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    var d = 0
    while (d < n) { if (arr.isNullAt(d)) return 0L; d += 1 }
    val ps = planesFor(table, nBits, n)
    var out = 0L
    var b = 0
    while (b < nBits) {
      val plane = ps(b)
      var acc = 0.0
      d = 0
      while (d < n) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += x * plane(d)
        d += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class LshBucket(child: Expression, table: Int, nBits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket needs array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_bucket"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // a NULL array produces bucket 0 (matching the declarative per-bit
  // when/otherwise composition), so the result itself is never null
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucketUtil.bucket(v.asInstanceOf[ArrayData], table, nBits, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.plans.LshBucketUtil.bucket(${c.value}, $table, $nBits, $isFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
