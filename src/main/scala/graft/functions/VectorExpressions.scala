package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/**
 * argmax-cosine centroid assignment as ONE projection — the row-shape
 * fix for broadcast k-means/IVF assignment. The column formulation
 * (corpus ⋈ broadcast(centroids) → per-id window) MATERIALIZES n·k rows
 * through a sort: 82 BILLION rows for 20M vectors at k = 4096 (the r11
 * autoBuckets probe). Here the k×dim matrix rides the expression as a
 * plan constant and each corpus row runs a generated triple-nested
 * loop — n rows stay n rows, arithmetic cost is the same n·k·dim flops
 * the assignment inherently needs.
 *
 * Value parity with the window formulation (what the DuckDB oracles
 * replay) is EXACT: sim = dot/(‖v‖·‖c‖) with dot and both norms folded
 * left-to-right (the ArrayDot element-type rules — float inputs square
 * in float, everything accumulates in double; centroid norms are
 * precomputed with the same fold), and the argmax applies
 * `java.lang.Double.compare` descending with first-wins ties — exactly
 * the window's (sim DESC, cid ASC) order including its NaN-sorts-first
 * rule. Divergence exists only for malformed rows the callers filter:
 * a null element or all-dims-mismatched vector yields NULL here where
 * the window picked an arbitrary-but-deterministic cid off null sims.
 *
 * Returns the 0-based INDEX into `centroids`; callers map index → cid
 * (ordering centroids by cid makes ties replay the cid-ASC rule).
 */
case class NearestCentroid(child: Expression,
                           centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "need at least one centroid")

  override def prettyName: String = "graft_nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  /** ‖c‖ per centroid, the same left-to-right double fold l2norm uses. */
  private lazy val cnorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private def isFloat: Boolean = elemType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    val x = new Array[Double](d)
    var vn = 0.0
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      if (isFloat) {
        val f = a.getFloat(i)
        x(i) = f.toDouble
        vn += (f * f).toDouble // square in float, accumulate in double
      } else {
        val e = a.getDouble(i)
        x(i) = e
        vn += e * e
      }
      i += 1
    }
    vn = math.sqrt(vn)
    var best = -1
    var bestSim = 0.0
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      if (c.length == d) {
        var dot = 0.0
        var k = 0
        while (k < d) { dot += x(k) * c(k); k += 1 }
        val sim = dot / (vn * cnorms(j))
        if (best < 0 || java.lang.Double.compare(sim, bestSim) > 0) {
          best = j; bestSim = sim
        }
      }
      j += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val vn = ctx.freshName("vn")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val bad = ctx.freshName("bad")
      val load =
        if (isFloat)
          s"""float f = $a.getFloat($i);
             |      $x[$i] = (double) f;
             |      $vn += (double)(f * f);""".stripMargin
        else
          s"""double e = $a.getDouble($i);
             |      $x[$i] = e;
             |      $vn += e * e;""".stripMargin
      s"""
         |final int $d = $a.numElements();
         |final double[] $x = new double[$d];
         |double $vn = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $d; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  $load
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  $vn = java.lang.Math.sqrt($vn);
         |  int $best = -1;
         |  double $bestSim = 0.0;
         |  for (int $j = 0; $j < $cRef.length; $j++) {
         |    final double[] $c = $cRef[$j];
         |    if ($c.length == $d) {
         |      double $dot = 0.0;
         |      for (int $k = 0; $k < $d; $k++) $dot += $x[$k] * $c[$k];
         |      final double $sim = $dot / ($vn * $nRef[$j]);
         |      if ($best < 0 || java.lang.Double.compare($sim, $bestSim) > 0) {
         |        $best = $j; $bestSim = $sim;
         |      }
         |    }
         |  }
         |  if ($best < 0) ${ev.isNull} = true; else ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
