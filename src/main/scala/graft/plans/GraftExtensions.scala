package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

import graft.functions.VecDot

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works and the
  * functions are usable from any SQL surface (views, `selectExpr`,
  * thrift). Install with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * The reference has no SQL surface at all (SURVEY §3 — every entry point
  * is an eager Python method); this is part of the Spark-first re-design:
  * the same capability exposed both as a fluent Scala API (GTable) and as
  * SQL over temp views.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.registrations

  override def apply(ext: SparkSessionExtensions): Unit =
    registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[VecDot].getCanonicalName, null, name, usage, "")

  private type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val registrations: Seq[Registration] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double array columns (codegen'd)"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children(0), children(1))
      }),
    (FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a float/double array column"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "vec_norm takes exactly 1 argument")
        Sqrt(VecDot(children(0), children(0)))
      }),
    (FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float/double array columns"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_cosine takes exactly 2 arguments")
        org.apache.spark.sql.catalyst.expressions.Divide(
          VecDot(children(0), children(1)),
          org.apache.spark.sql.catalyst.expressions.Multiply(
            Sqrt(VecDot(children(0), children(0))),
            Sqrt(VecDot(children(1), children(1)))))
      }))

  /** Register the same functions into an already-running session (for
    * sessions built without `withExtensions`, e.g. notebooks / tests). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
