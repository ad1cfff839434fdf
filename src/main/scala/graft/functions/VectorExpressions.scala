package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the embedding hot loops (k-NN scoring,
 * IVF assignment, beam-search scoring, cosine near-dup verification —
 * the reference's FAISS surface, `src/vectorstore/FaissIndex.h:20-53`).
 *
 * The previous implementations were `aggregate(zip_with(...))`
 * higher-order functions: null-safe and UDF-free, but higher-order
 * functions are evaluated INTERPRETED — a lambda call per array element
 * per row, outside whole-stage codegen. These expressions generate a
 * tight Java loop over the `ArrayData` instead (`doGenCode`), which is
 * what a 1000-dim dot product over 10⁸ pairs needs.
 *
 * Semantics are BIT-IDENTICAL to the HOF forms they replace (the DuckDB
 * oracles replay those): per element the product/square is computed in
 * the ELEMENT type (float×float multiplies in float — `zip_with`'s
 * lambda typing) and accumulated in double (`aggregate`'s 0.0 seed);
 * mixed float/double inputs promote per element. Null semantics match
 * `zip_with`'s length padding: null input → null, mismatched lengths →
 * null, any null element → null.
 */
private[graft] sealed trait VectorFold { self: BinaryExpression =>

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left), elemOf(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  protected def leftElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType = right.dataType.asInstanceOf[ArrayType].elementType
  protected def anyContainsNull: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  /** Per-element contribution in interpreted mode. */
  protected def combine(a: ArrayData, b: ArrayData, i: Int): Double

  /** Java source for the per-element contribution; `ax`/`bx` are the
    * raw getFloat/getDouble accesses in the element's own type. */
  protected def combineCode(ax: String, bx: String): String

  private def getter(arr: String, t: DataType, i: String): String = t match {
    case FloatType => s"$arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  protected final def foldEval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += combine(a, b, i)
      i += 1
    }
    acc
  }

  protected final def foldCodeGen(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (anyContainsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ${combineCode(getter(a, leftElem, i), getter(b, rightElem, i))};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σᵢ aᵢ·bᵢ — the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold as a
  * codegen'd loop. `ArrayDot(a, a)` is the squared L2 norm (bit-identical
  * to the `transform(a, x => x*x)` fold: same float multiply, same
  * double accumulation). */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorFold {

  override def prettyName: String = "graft_array_dot"

  private lazy val bothFloat = leftElem == FloatType && rightElem == FloatType

  override protected def combine(a: ArrayData, b: ArrayData, i: Int): Double =
    if (bothFloat) (a.getFloat(i) * b.getFloat(i)).toDouble
    else {
      val x = if (leftElem == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightElem == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      x * y
    }

  override protected def combineCode(ax: String, bx: String): String =
    if (bothFloat) s"(double)($ax * $bx)" else s"((double)$ax) * ((double)$bx)"

  override def eval(input: InternalRow): Any = foldEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    foldCodeGen(ctx, ev)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ (aᵢ−bᵢ)² — the squared-difference fold behind L2 distance,
  * matching `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`
  * (subtract and square in the element type, accumulate in double). */
case class ArraySqDiff(left: Expression, right: Expression)
    extends BinaryExpression with VectorFold {

  override def prettyName: String = "graft_array_sqdiff"

  private lazy val bothFloat = leftElem == FloatType && rightElem == FloatType

  override protected def combine(a: ArrayData, b: ArrayData, i: Int): Double =
    if (bothFloat) {
      val d = a.getFloat(i) - b.getFloat(i)
      (d * d).toDouble
    } else {
      val x = if (leftElem == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightElem == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      d * d
    }

  override protected def combineCode(ax: String, bx: String): String =
    if (bothFloat) s"(double)(($ax - $bx) * ($ax - $bx))"
    else s"(((double)$ax) - ((double)$bx)) * (((double)$ax) - ((double)$bx))"

  override def eval(input: InternalRow): Any = foldEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    foldCodeGen(ctx, ev)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArraySqDiff =
    copy(left = newLeft, right = newRight)
}
