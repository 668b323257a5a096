package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Sqrt}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import graft.functions.{InterleaveBits, NormalizeWords, ShingleHashSet, SimHash64, TextNormalize, VecDot}

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
      }),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(words) - 64-bit SimHash fingerprint of an array<string> column (codegen'd)"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash64 takes exactly 1 argument")
        SimHash64(children(0))
      }),
    (FunctionIdentifier("shingle_hash_set"),
      info("shingle_hash_set", "shingle_hash_set(words, n) - distinct hashes of the n-word shingles of an array<string> column (codegen'd)"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hash_set takes exactly 2 arguments")
        children(1) match {
          case Literal(n: Int, IntegerType) => ShingleHashSet(children(0), n)
          case other => throw new IllegalArgumentException(
            s"shingle_hash_set: n must be an integer literal, got $other")
        }
      }),
    (FunctionIdentifier("normalize_words"),
      info("normalize_words", "normalize_words(text[, sorted_set]) - search-normalized word array " +
        "(stopwords, plural singularization, acronyms, significant endings; codegen'd). " +
        "sorted_set=true returns the sorted distinct content-word set"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "normalize_words takes 1 or 2 arguments")
        val sortedSet = children.lift(1) match {
          case None => false
          case Some(Literal(b: Boolean, BooleanType)) => b
          case Some(other) => throw new IllegalArgumentException(
            s"normalize_words: sorted_set must be a boolean literal, got $other")
        }
        NormalizeWords(children(0), TextNormalize.stopwords, sortedSet)
      }),
    (FunctionIdentifier("interleave_bits"),
      info("interleave_bits", "interleave_bits(coords, bits) - Morton/z-order key of an " +
        "array<int> coordinate column, `bits` low bits per dimension (codegen'd); " +
        "the write-time clustering key behind Layout.writeZOrdered"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "interleave_bits takes exactly 2 arguments")
        children(1) match {
          case Literal(b: Int, IntegerType) => InterleaveBits(children(0), b)
          case other => throw new IllegalArgumentException(
            s"interleave_bits: bits must be an integer literal, got $other")
        }
      }))

  /** Register the same functions into an already-running session (for
    * sessions built without `withExtensions`, e.g. notebooks / tests). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
