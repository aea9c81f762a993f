package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` / `array<double>` columns, with full whole-stage
  * codegen (`doGenCode`).
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), ...)`
  * — materializes an intermediate array per row and evaluates lambda
  * closures per element; this expression is a single fused loop over
  * the two `ArrayData` buffers, which keeps the similarity-search hot
  * path (SURVEY.md §8) inside one codegen stage with the surrounding
  * join/filter.
  *
  * Semantics are EXACTLY the sequential left-to-right double
  * accumulation of [[graft.functions.VectorFunctions.cosine]]:
  * `dot/(sqrt(na)*sqrt(nb))` — bit-identical results, so the DuckDB
  * oracles and the HOF implementation agree with it.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      // tinyint support = the int8-quantized search path: cosine is
      // scale-invariant, so searching over quantized vectors needs no
      // dequantization at all — the byte array IS the operand
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine needs two array<float|double|tinyint> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getterName(e: Expression): String = elemType(e) match {
    case FloatType => "getFloat"
    case ByteType  => "getByte"
    case _         => "getDouble"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(v: ArrayData, e: Expression, i: Int): Double = elemType(e) match {
      case FloatType => v.getFloat(i).toDouble
      case ByteType  => v.getByte(i).toDouble
      case _         => v.getDouble(i)
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, left, i)
      val yv = get(y, right, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // cosine(0, x) := 0 by convention — without this arm a zero vector
    // (real corpora: padding/null embeddings) yields 0/0 = NaN, and
    // Spark SQL's NaN-is-greatest comparison semantics then push it
    // PAST every similarity threshold and to rank 1 of every top-k
    // (caught by the embeddings fuzz; IEEE engines drop NaN instead)
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getterName(left)
    val rGet = getterName(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.$lGet($i);
         |  double $yv = (double) $b.$rGet($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
