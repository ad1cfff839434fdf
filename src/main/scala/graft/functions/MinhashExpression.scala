package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Whole-signature MinHash in ONE pass over the document string.
 *
 * The row-generator formulation (explode every k-char shingle → 64
 * `min()` aggregate expressions) materializes ~2000 rows per document
 * and pushes 64 hash-aggregate buffer updates through the aggregate for
 * EVERY shingle row — measured ~2.5 s of the sf0.1 minhash pipeline's
 * ~3.7 s total, dominating banding and verification. This expression
 * computes the identical signature per document inside a single
 * projection: no generated rows, no aggregate, no exchange at all on
 * the signature path (the "functions, not UDFs" ladder, rung (b):
 * a native Catalyst expression).
 *
 * Byte-identical contract with the row formulation it replaces (the
 * parity is spec-asserted):
 *
 *   sig_j = min over char positions p of
 *           floorMod(a_j * floorMod(xxhash64(substr(norm, p+1, k)), P) + b_j, P)
 *
 * where `substr` uses SQL CHARACTER semantics (the UTF-8 byte window is
 * walked per codepoint, exactly like `UTF8String.substringSQL`) and
 * `xxhash64` is Spark's XXH64 with its default seed 42 over the window's
 * bytes. Inputs shorter than k characters yield NULL (the row form had
 * no posting rows for them — callers filter either way). One call per
 * DOCUMENT makes the interpreted-eval boundary (CodegenFallback)
 * irrelevant: the inner loop is plain Java over a byte array.
 *
 * Reference for the operator family: minhash banding as in
 * `jasminegraph`'s duplicate-detection pipeline scope (SURVEY.md §2,
 * LLM-pipeline extensions).
 */
case class MinhashSignature(child: Expression, k: Int,
                            as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val numChars = s.numChars()
    if (numChars < k) return null
    val bytes = s.getBytes
    // byte offset of every char start (+ end sentinel) — the k-char
    // window [p, p+k) then hashes bytes[offs(p) until offs(p+k))
    val offs = new Array[Int](numChars + 1)
    var ci = 0
    var bi = 0
    while (ci < numChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(numChars) = bytes.length
    val numHashes = as.length
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var pos = 0
    val last = numChars - k
    while (pos <= last) {
      val start = offs(pos)
      val len = offs(pos + k) - start
      val h0 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, len, 42L)
      val h = java.lang.Math.floorMod(h0, p)
      var j = 0
      while (j < numHashes) {
        val v = java.lang.Math.floorMod(as(j) * h + bs(j), p)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      pos += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
