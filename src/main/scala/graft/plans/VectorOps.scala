package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector transforms over `array<float|double>` embedding
  * columns, each a single fused per-row loop with whole-stage codegen.
  *
  * Why not higher-order functions: `transform(v, x -> x / norm)` with
  * `norm = sqrt(aggregate(...))` re-evaluates the norm SUBTREE per
  * element after Catalyst inlines the alias into the lambda — an O(d²)
  * hot path (the measured shingling trap, see WordShingles) — and HOFs
  * are CodegenFallback, breaking the surrounding codegen stage. A native
  * expression computes each pass once, stays in the stage, and allocates
  * only the output buffer.
  */
trait VectorUnaryOp extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs one array<float|double> argument, got ${other.simpleString}")
  }
  protected def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def getter: String = if (childIsFloat) "getFloat" else "getDouble"
}

/** `graft_l2norm(v)` — L2-normalize to `array<double>`: two sequential
  * passes (sum of squares, then divide). A zero vector normalizes to
  * zeros, not NaNs, so downstream cosine stays total.
  */
case class L2Normalize(child: Expression) extends VectorUnaryOp {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_l2norm"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val f = childIsFloat
    var ss = 0.0
    var i = 0
    while (i < n) { val x = if (f) v.getFloat(i).toDouble else v.getDouble(i); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = if (norm == 0.0) 0.0 else x / norm
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ss = ctx.freshName("ss"); val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $v.$getter($i);
         |  $ss += $x * $x;
         |}
         |double $nrm = java.lang.Math.sqrt($ss);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $v.$getter($i);
         |  $out[$i] = $nrm == 0.0 ? 0.0 : $x / $nrm;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_quantize_i8(v)` — symmetric int8 quantization:
  * `struct(scale double, q array<tinyint>)` with
  * `scale = 127 / max(|x|)` (0 for a zero vector) and
  * `q_i = clamp(round(x_i * scale), -127, 127)`, rounding half away
  * from zero — the ANSI/DuckDB `round()` convention, NOT Java's
  * `Math.round` (which rounds -2.5 up to -2), so engine oracles agree.
  * Dequantize as `q_i / scale`. 4× smaller than float32 through any
  * shuffle or ANN index; max dequantization error is `0.5/scale`.
  */
case class QuantizeInt8(child: Expression) extends VectorUnaryOp {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_quantize_i8"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val f = childIsFloat
    var m = 0.0
    var i = 0
    while (i < n) { val x = if (f) v.getFloat(i).toDouble else v.getDouble(i); val a = math.abs(x); if (a > m) m = a; i += 1 }
    val scale = if (m == 0.0) 0.0 else 127.0 / m
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
      val r = math.signum(x) * math.floor(math.abs(x) * scale + 0.5)
      q(i) = math.max(-127.0, math.min(127.0, r)).toByte
      i += 1
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val sc = ctx.freshName("sc")
      val q = ctx.freshName("q"); val x = ctx.freshName("x")
      val a = ctx.freshName("a"); val r = ctx.freshName("r")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs((double) $v.$getter($i));
         |  if ($a > $m) $m = $a;
         |}
         |double $sc = $m == 0.0 ? 0.0 : 127.0 / $m;
         |byte[] $q = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $v.$getter($i);
         |  double $r = java.lang.Math.signum($x) * java.lang.Math.floor(java.lang.Math.abs($x) * $sc + 0.5);
         |  $q[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $r));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $sc, new org.apache.spark.sql.catalyst.util.GenericArrayData($q) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
