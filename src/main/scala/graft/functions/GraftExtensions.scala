package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}
import org.apache.spark.sql.graftshim.ColumnBridge

/**
 * SQL-surface registration for graft's native expressions, so
 * `spark.sql("SELECT graft_vec_dot(a, b) ...")` works alongside the
 * Column API ([[graft.functions.vecDot]]).
 *
 * Two paths:
 *  - session build time: `spark.sql.extensions=graft.functions.GraftExtensions`
 *    (or `.withExtensions(new GraftExtensions)`), the standard
 *    `SparkSessionExtensions.injectFunction` route;
 *  - runtime, on any existing session: [[GraftFunctions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[ArrayDot].getName, null, name, usage, ""),
        builder))
    }
}

object GraftFunctions {

  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")
    exprs
  }

  /** (name, usage, builder) for every SQL-exposed graft expression.
    * Cosine/L2-distance are deliberately absent: they are plain SQL
    * compositions of these (`dot / (norm * norm)`), and registering a
    * division forces a choice of ANSI eval mode the user should own. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_vec_dot", "graft_vec_dot(a, b) - dot product of two float/double arrays",
      (exprs: Seq[Expression]) => {
        val Seq(a, b) = arity("graft_vec_dot", 2)(exprs); ArrayDot(a, b)
      }),
    ("graft_vec_sqdiff", "graft_vec_sqdiff(a, b) - sum of squared element differences",
      (exprs: Seq[Expression]) => {
        val Seq(a, b) = arity("graft_vec_sqdiff", 2)(exprs); ArraySqDiff(a, b)
      }),
    ("graft_vec_norm", "graft_vec_norm(a) - L2 norm of a float/double array",
      (exprs: Seq[Expression]) => {
        val Seq(a) = arity("graft_vec_norm", 1)(exprs); Sqrt(ArrayDot(a, a))
      }))

  /** Register all graft SQL functions on an existing session (temp
    * functions, session-scoped, idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
