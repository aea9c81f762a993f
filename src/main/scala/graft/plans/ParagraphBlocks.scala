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
  def paragraphs(text: UTF8String, n: Int): ArrayData = {
    val words = ShingleUtil.normWords(text) // shared parity contract
    val m = words.length
    if (m == 0) return new GenericArrayData(Array[Any](UTF8String.fromString("")))
    val nParas = (m + n - 1) / n
    val out = new Array[Any](nParas)
    val sb = new java.lang.StringBuilder(64)
    var p = 0
    while (p < nParas) {
      sb.setLength(0)
      var k = p * n
      val end = math.min(k + n, m)
      while (k < end) {
        if (k > p * n) sb.append(' ')
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
case class ParagraphBlocks(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_paragraphs needs (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_paragraphs"

  override def nullSafeEval(t: Any): Any =
    ParagraphUtil.paragraphs(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ParagraphUtil.paragraphs($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
