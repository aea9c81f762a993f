package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval/codegen helper (static-callable from Janino). */
object ParagraphUtil {
  /** Fixed `n`-word blocks of the lowercased, whitespace-normalized
    * words of `text` — the semantics of `transform(sequence(0,
    * ceil(size(words)/n)-1), i => concat_ws(" ", slice(words, i*n+1,
    * n)))` over `split(normText, " ")`, in one linear pass. The HOF
    * form re-evaluates the split subtree per paragraph (interpreted
    * lambdas), making long documents quadratic; measured 33 s → 5 s at
    * the 50× ScaleProbe corpus when this expression replaced it.
    *
    * Whitespace-only/empty text yields one empty paragraph — exactly
    * what `split('', ' ') = ['']` produces in the SQL formulation both
    * engines share.
    */
  def paragraphs(text: UTF8String, n: Int): ArrayData = windows(text, n, n)

  /** Generalized word windows: width `n`, step `stride`. `stride == n`
    * is disjoint paragraph blocking; `stride < n` yields overlapping
    * context windows (the train-prep chunking that keeps `n - stride`
    * words of context across window boundaries). Window count for
    * `m > 0` words is `1 + ceil(max(0, m - n) / stride)` — the last
    * window may be short, and no window starts at or past `m`.
    */
  def windows(text: UTF8String, n: Int, stride: Int): ArrayData = {
    val words = ShingleUtil.normWords(text) // shared parity contract
    val m = words.length
    if (m == 0) return new GenericArrayData(Array[Any](UTF8String.fromString("")))
    val nWin = 1 + (math.max(0, m - n) + stride - 1) / stride
    val out = new Array[Any](nWin)
    val sb = new java.lang.StringBuilder(64)
    var p = 0
    while (p < nWin) {
      sb.setLength(0)
      var k = p * stride
      val end = math.min(k + n, m)
      while (k < end) {
        if (k > p * stride) sb.append(' ')
        sb.append(words(k))
        k += 1
      }
      out(p) = UTF8String.fromString(sb.toString)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for paragraph blocking (sub-document
  * dedup's hot inner loop) — same design rationale as [[WordShingles]]:
  * the composable HOF formulation interprets its lambda and re-splits
  * the text once per paragraph; this is one linear pass inside
  * whole-stage codegen.
  */
case class ParagraphBlocks(child: Expression, n: Int, stride: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1 && stride >= 1 && stride <= n)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_paragraphs/graft_word_windows need (string, n>=1, 1<=stride<=n), " +
        s"got ${child.dataType.simpleString}, n=$n, stride=$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String =
    if (stride == n) "graft_paragraphs" else "graft_word_windows"

  override def nullSafeEval(t: Any): Any =
    ParagraphUtil.windows(t.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ParagraphUtil.windows($c, $n, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
