package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Whole 64-bit SimHash signature in ONE pass over the document string —
 * the [[MinhashSignature]] treatment applied to the SimHash pipeline's
 * verifiable (md5) mode, which exploded every whitespace token, projected
 * 16 hex-digit values per token and ran 64 sum() aggregates over the
 * ~1M-row token frame.
 *
 * Byte-identical contract with the row formulation (spec-asserted):
 * tokens are the non-empty pieces of `split(input, "\\s+")` (callers
 * pass `lower(trim(text))`); per token the first 16 hex digits of
 * `md5(token)` vote — bit b of the signature is voted by bit (b%4) of
 * digit b/4, vote = bit*2−1 summed over tokens; signature bit b is set
 * iff its vote sum ≥ 0. NULL when the input has no tokens (the row form
 * had no rows for such documents).
 *
 * One call per DOCUMENT (CodegenFallback is irrelevant next to the md5
 * work); MD5 runs once per token on the UTF-8 bytes — identical to
 * Spark's `md5()` of the token.
 */
case class SimhashSignature(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash_signature"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
    }

  @transient private lazy val splitter = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    var any = false
    // split(s, "\\s+") semantics: Java regex split with limit -1 keeps
    // trailing empties (they are filtered like the row form's length>0)
    val toks = splitter.split(s, -1)
    var ti = 0
    while (ti < toks.length) {
      val tok = toks(ti)
      if (tok.nonEmpty) {
        any = true
        md.reset()
        val dig = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 64) {
          val d = b / 4
          val nibble = ((dig(d / 2) >>> (4 * (1 - (d % 2)))) & 0xF)
          votes(b) += ((nibble >> (b % 4)) & 1) * 2 - 1
          b += 1
        }
      }
      ti += 1
    }
    if (!any) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)
}
