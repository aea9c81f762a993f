package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels (the hot loops behind
  * [[graft.operators.sim.ProductQuantizer]]).
  *
  * Why not higher-order functions: the exact-integer distance needs
  * DECIMAL(38,0) squares (a single (a−b)² can pass 2^63 at the edge of
  * the micros domain), and decimal arithmetic inside `zip_with` /
  * `aggregate` lambdas runs on interpreted BigDecimal — measured 113 s
  * at the 50× probe. These expressions run the same math as TWO LONGS
  * (a manual 128-bit accumulator: `Math.multiplyHigh` for the square's
  * high word, carry-propagated unsigned adds), which is exact for
  * |component micros| < 2^59 — i.e. |x| ≲ 5.7·10^11, the same
  * magnitude ceiling DECIMAL(38,0) itself imposes — and emits one
  * Decimal per ROW instead of per element.
  *
  * All three kernels quantize inline with `Math.floor(x·10^6)` —
  * bit-identical to the SQL `floor(cast(x as double) * 1e6)` the
  * oracles replay.
  */
object PqUtil {

  @inline private def micro(x: Double): Long = Math.floor(x * 1e6).toLong

  private def microsOf(v: ArrayData, isFloat: Boolean): Array[Long] = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = micro(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    out
  }

  /** 128-bit Σ(a−b)² over [from, until) of two micro arrays; result in
    * (hi, lo) packed into a 2-long array (hi non-negative).
    */
  private def d2Acc(a: Array[Long], b: Array[Long], from: Int, until: Int): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var i = from
    while (i < until) {
      val d = a(i) - b(i)
      val phi = Math.multiplyHigh(d, d)
      val plo = d * d
      val nlo = lo + plo
      // carry of the unsigned 64-bit add
      hi += phi + (((lo & plo) | ((lo | plo) & ~nlo)) >>> 63)
      lo = nlo
      i += 1
    }
    (hi, lo)
  }

  @inline private def less(h1: Long, l1: Long, h2: Long, l2: Long): Boolean =
    h1 < h2 || (h1 == h2 && java.lang.Long.compareUnsigned(l1, l2) < 0)

  private def toDecimal(hi: Long, lo: Long): Decimal = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(BigDecimal(bi), 38, 0)
  }

  /** Nearest-codeword ids per subspace, tie-break lowest cid — the
    * [[graft.operators.sim.ProductQuantizer.codesCol]] contract.
    */
  def assign(vec: ArrayData, isFloat: Boolean, cbs: Array[Array[Array[Long]]]): ArrayData = {
    val mv = microsOf(vec, isFloat)
    val m = cbs.length
    val sd = cbs(0)(0).length
    require(mv.length == m * sd,
      s"graft_pq_assign: vector dim ${mv.length} != codebook dim ${m * sd}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = cbs(s)
      var bestHi = Long.MaxValue; var bestLo = -1L; var bestCid = 0
      var c = 0
      while (c < book.length) {
        // d2 of mv[s*sd, s*sd+sd) vs book(c)[0, sd)
        var hi = 0L; var lo = 0L
        val cw = book(c)
        var i = 0
        while (i < sd) {
          val d = mv(s * sd + i) - cw(i)
          val phi = Math.multiplyHigh(d, d)
          val plo = d * d
          val nlo = lo + plo
          hi += phi + (((lo & plo) | ((lo | plo) & ~nlo)) >>> 63)
          lo = nlo
          i += 1
        }
        if (less(hi, lo, bestHi, bestLo)) { bestHi = hi; bestLo = lo; bestCid = c }
        c += 1
      }
      out(s) = bestCid
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: Σ over subspaces of d2(q_sub, codeword(codes[sub])).
    * Codes paired with the WRONG codebook fail with a descriptive
    * error, not a raw ArrayIndexOutOfBounds (review catch).
    */
  def adc(codes: ArrayData, qvec: ArrayData, isFloat: Boolean,
          cbs: Array[Array[Array[Long]]]): Decimal = {
    val qm = microsOf(qvec, isFloat)
    val m = cbs.length
    val sd = cbs(0)(0).length
    require(codes.numElements() == m,
      s"graft_pq_adc: codes length ${codes.numElements()} != codebook subspaces $m")
    var hi = 0L; var lo = 0L
    var s = 0
    while (s < m) {
      val cid = codes.getInt(s)
      require(cid >= 0 && cid < cbs(s).length,
        s"graft_pq_adc: code id $cid out of range [0, ${cbs(s).length}) in subspace $s")
      val cw = cbs(s)(cid)
      var i = 0
      while (i < sd) {
        val d = qm(s * sd + i) - cw(i)
        val phi = Math.multiplyHigh(d, d)
        val plo = d * d
        val nlo = lo + plo
        hi += phi + (((lo & plo) | ((lo | plo) & ~nlo)) >>> 63)
        lo = nlo
        i += 1
      }
      s += 1
    }
    toDecimal(hi, lo)
  }

  /** Exact micro-L2 between two raw vectors (the PQ refine stage).
    * Dimension mismatch FAILS instead of silently truncating — a
    * ragged vector scoring only its shared prefix would win top-k
    * slots with an artificially small distance (review catch).
    */
  def microL2(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Decimal = {
    val am = microsOf(a, aFloat)
    val bm = microsOf(b, bFloat)
    require(am.length == bm.length,
      s"graft_micro_l2: vector dims differ (${am.length} vs ${bm.length})")
    val (hi, lo) = d2Acc(am, bm, 0, am.length)
    toDecimal(hi, lo)
  }
}

/** Codebook holder with VALUE-based equality. The raw
  * `Array[Array[Array[Long]]]` as a case-class field compares by
  * reference, so two structurally identical PqAssign/PqAdc expressions
  * were never `semanticEquals` — Catalyst canonicalization,
  * common-subexpression elimination, and exchange reuse all silently
  * missed (review catch). Deep equality restores them.
  */
final class CodebookRef(val cbs: Array[Array[Array[Long]]]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case other: CodebookRef =>
      java.util.Arrays.deepEquals(cbs.asInstanceOf[Array[AnyRef]],
        other.cbs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override val hashCode: Int =
    java.util.Arrays.deepHashCode(cbs.asInstanceOf[Array[AnyRef]])
  // keep plan strings compact: a codebook is m·ks·subDim cells
  override def toString: String =
    s"codebook(m=${cbs.length},ks=${if (cbs.isEmpty) 0 else cbs(0).length})"
}

private[plans] object PqTypes {
  def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType
}

/** `graft_pq_assign(vec)` with a bound codebook — array<int> codes. */
case class PqAssign(child: Expression, book: CodebookRef)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqTypes.vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_assign"

  override def nullSafeEval(input: Any): Any =
    PqUtil.assign(input.asInstanceOf[ArrayData], PqTypes.isFloat(child.dataType), book.cbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCbs", book.cbs, "long[][][]")
    val f = PqTypes.isFloat(child.dataType)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PqUtil.assign($v, $f, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

/** `graft_pq_adc(codes, qvec)` with a bound codebook — DECIMAL(38,0). */
case class PqAdc(left: Expression, right: Expression, book: CodebookRef)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), rt) if PqTypes.vecOk(rt) => TypeCheckResult.TypeCheckSuccess
    case (lt, rt) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<int>, array<float|double>), got (${lt.simpleString}, ${rt.simpleString})")
  }

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, qvec: Any): Any =
    PqUtil.adc(codes.asInstanceOf[ArrayData], qvec.asInstanceOf[ArrayData],
      PqTypes.isFloat(right.dataType), book.cbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCbs", book.cbs, "long[][][]")
    val f = PqTypes.isFloat(right.dataType)
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.plans.PqUtil.adc($c, $q, $f, $cbRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** `graft_micro_l2(a, b)` — exact Σ(⌊a·10^6⌋−⌊b·10^6⌋)² as
  * DECIMAL(38,0); the PQ refine distance and the exact-search
  * baseline the ANN specs rank against.
  */
case class MicroL2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqTypes.vecOk(left.dataType) && PqTypes.vecOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double> arguments")

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "graft_micro_l2"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqUtil.microL2(a.asInstanceOf[ArrayData], PqTypes.isFloat(left.dataType),
      b.asInstanceOf[ArrayData], PqTypes.isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = PqTypes.isFloat(left.dataType)
    val rf = PqTypes.isFloat(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.PqUtil.microL2($a, $lf, $b, $rf);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MicroL2 =
    copy(left = newLeft, right = newRight)
}
