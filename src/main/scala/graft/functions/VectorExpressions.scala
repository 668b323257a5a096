package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._

/** Native Catalyst expression for vector dot products.
  *
  * The `functions.zip_with(a, b, _*_)` + `aggregate` composition evaluates
  * a lambda per element and materializes an intermediate array per ROW —
  * measured ~20× slower on the all-pairs cosine workload. This expression
  * generates a tight primitive loop over `ArrayData` inside whole-stage
  * codegen (`doGenCode`), with an interpreted `nullSafeEval` fallback of
  * the same shape.
  *
  * Accumulation is sequential left-to-right in double precision — the same
  * order/precision as the SQL-expressible formulation, so oracle parity is
  * bit-exact. Array elements are assumed non-null (embedding vectors).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (elemType(left) == FloatType) s"$a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemType(right) == FloatType) s"$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$getA * (double)$getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index of the nearest centroid for a float/double vector column —
  * squared-L2, or max-dot-product when `cosine` is set (centroids are
  * expected unit-norm then: argmax dot(v, c) over unit c is cosine
  * assignment without needing to normalize the data vectors). The
  * centroid matrix rides along as a codegen reference object — a
  * literal-tree formulation (nCentroids × dims literals) made Janino
  * recompile multi-thousand-constant classes per plan, which dominated
  * IVF index builds. Ties break to the lower index. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]],
    cosine: Boolean = false)
    extends UnaryExpression {

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double> input, got $other")
    }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    (isFloat, cosine) match {
      case (true, false) => VectorUtil.nearestCentroidF(v, centroids)
      case (false, false) => VectorUtil.nearestCentroidD(v, centroids)
      case (true, true) => VectorUtil.nearestCentroidCosF(v, centroids)
      case (false, true) => VectorUtil.nearestCentroidCosD(v, centroids)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val fn = (if (cosine) "nearestCentroidCos" else "nearestCentroid") +
      (if (isFloat) "F" else "D")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.$fn($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorUtil {
  def nearestCentroidF(v: ArrayData, centroids: Array[Array[Double]]): Int =
    nearest(centroids, v.toFloatArray().map(_.toDouble))

  def nearestCentroidD(v: ArrayData, centroids: Array[Array[Double]]): Int =
    nearest(centroids, v.toDoubleArray())

  private def nearest(centroids: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      val n = math.min(ct.length, x.length)
      var d = 0.0
      var i = 0
      while (i < n) { val t = x(i) - ct(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestCentroidCosF(v: ArrayData, centroids: Array[Array[Double]]): Int =
    nearestCos(centroids, v.toFloatArray().map(_.toDouble))

  def nearestCentroidCosD(v: ArrayData, centroids: Array[Array[Double]]): Int =
    nearestCos(centroids, v.toDoubleArray())

  /** argmax dot(x, cᵢ) — cosine assignment given unit-norm centroids
    * (the row vector's own norm is a constant factor per row). */
  private def nearestCos(centroids: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      val n = math.min(ct.length, x.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * ct(i); i += 1 }
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }
}

object VectorExpressions {
  /** Dot product of two float/double array columns (codegen'd). */
  def vec_dot(a: Column, b: Column): Column =
    ColumnInterop.column(VecDot(ColumnInterop.expression(a), ColumnInterop.expression(b)))

  /** L2 norm. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Index of the nearest centroid (squared L2) — see [[NearestCentroid]]. */
  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnInterop.column(NearestCentroid(ColumnInterop.expression(v), centroids))

  /** Cosine (max-dot) centroid assignment; centroids must be unit-norm. */
  def nearest_centroid_cos(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnInterop.column(NearestCentroid(ColumnInterop.expression(v), centroids,
      cosine = true))
}
