package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC payload digest: `sha1:` + RFC 4648 Base32 of the SHA-1 — the
  * exact spelling WARC-Payload-Digest headers carry in public crawl
  * corpora (160 bits → 32 Base32 characters, no padding). Used to key
  * `revisit` records: a response whose payload digest matches a prior
  * crawl's is stored as a payload-free revisit instead of a duplicate
  * copy of the bytes.
  */
object WarcDigestUtil {
  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 Base32, unpadded. SHA-1's 160 bits divide 5 exactly, so
    * no padding case arises for the digest path.
    */
  def base32(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder((bytes.length * 8 + 4) / 5)
    var buf = 0L
    var nBits = 0
    var i = 0
    while (i < bytes.length) {
      buf = (buf << 8) | (bytes(i) & 0xffL)
      nBits += 8
      while (nBits >= 5) {
        nBits -= 5
        sb.append(Alphabet(((buf >> nBits) & 0x1f).toInt))
      }
      i += 1
    }
    if (nBits > 0) sb.append(Alphabet(((buf << (5 - nBits)) & 0x1f).toInt))
    sb.toString
  }

  def digest(payload: Array[Byte]): UTF8String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    UTF8String.fromString("sha1:" + base32(md.digest(payload)))
  }
}

/** `graft_warc_digest(payload)` — WARC-Payload-Digest of a binary
  * column, inside whole-stage codegen.
  */
case class WarcPayloadDigest(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_warc_digest"
  override def nullSafeEval(input: Any): Any =
    WarcDigestUtil.digest(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WarcDigestUtil.digest($c)")
  override protected def withNewChildInternal(newChild: Expression): WarcPayloadDigest =
    copy(child = newChild)
}
