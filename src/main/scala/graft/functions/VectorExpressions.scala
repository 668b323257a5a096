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

/** Indices of the `m` nearest centroids by cosine (max dot product over
  * unit-norm centroids), best first. Multi-assignment is what makes
  * cluster-scoped near-dup search (SemDeDup shape) recall-safe: a pair
  * straddling a Voronoi boundary still shares a cluster as long as each
  * point carries its top-m cells. Ties break to the lower index, so the
  * output is deterministic. Same reference-object codegen pattern as
  * [[NearestCentroid]]. */
case class TopCentroids(child: Expression, centroids: Array[Array[Double]],
    m: Int) extends UnaryExpression {

  override def prettyName: String = "top_centroids_cos"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
    if (isFloat) VectorUtil.topCentroidsCosF(v, centroids, m)
    else VectorUtil.topCentroidsCosD(v, centroids, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val fn = if (isFloat) "topCentroidsCosF" else "topCentroidsCosD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.$fn($c, $ref, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L2-normalize a float/double vector to unit norm (array<double> out).
  * A zero vector normalizes to itself (all zeros), not NaNs — the
  * training-pipeline-friendly convention. Codegen: one static-helper
  * call inside whole-stage codegen (NearestCentroid pattern — no Janino
  * giant-literal recompiles, no interpreted HOF lambda per element). */
case class VecL2Normalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vec_l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

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
    if (isFloat) VectorUtil.l2NormalizeF(v) else VectorUtil.l2NormalizeD(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "l2NormalizeF" else "l2NormalizeD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** max(|xᵢ|) of a float/double vector — the symmetric-quantization range
  * statistic. 0.0 for an empty vector. */
case class VecMaxAbs(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vec_max_abs"
  override def dataType: DataType = DoubleType

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
    if (isFloat) VectorUtil.maxAbsF(v) else VectorUtil.maxAbsD(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "maxAbsF" else "maxAbsD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization: `clamp(floor(xᵢ·scale), −128, 127)` per
  * element (array<byte> out). `floor` (not round-half-X) keeps the
  * mapping bit-identical across engines — IEEE multiply + floor have one
  * correct answer; round ties don't. Pair with
  * [[VectorExpressions.vec_quantize_scale]] (= 127/maxAbs) and persist
  * the scale for dequantization. */
case class VecQuantizeInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vec_quantize_int8"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (vOk && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<float|double>, double), got " +
          s"${left.dataType} / ${right.dataType}")
  }

  private def isFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val s = r.asInstanceOf[Double]
    if (isFloat) VectorUtil.quantizeInt8F(v, s) else VectorUtil.quantizeInt8D(v, s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "quantizeInt8F" else "quantizeInt8D"
    defineCodeGen(ctx, ev, (v, s) => s"graft.functions.VectorUtil.$fn($v, $s)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: split the vector into `codebooks.length`
  * contiguous subspaces and emit each subvector's nearest (squared-L2)
  * codeword index — `array<int>`, one code per subspace. The codebook
  * tensor `[subspace][code][subdim]` rides along as a codegen reference
  * object (same rationale as [[NearestCentroid]]: literal trees at this
  * size send Janino into multi-thousand-constant recompiles). Encoding is
  * map-side and linear — the 100 TB property: the corpus compresses
  * m·log2(codes) bits per vector in one scan, no shuffle. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
    if (isFloat) VectorUtil.pqEncodeF(v, codebooks)
    else VectorUtil.pqEncodeD(v, codebooks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val fn = if (isFloat) "pqEncodeF" else "pqEncodeD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.$fn($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score for a PQ code column: Σₛ lut(s)(codeₛ),
  * where the lookup table holds the query subvector's dot product with
  * every codeword — computed ONCE driver-side per query, so scoring a row
  * is m array lookups and adds instead of a dims-length float loop. This
  * is the PQ payoff: approximate inner product against compressed codes
  * at ~m/dims of the flops, full scan stays map-side. */
/** Batch companion of [[PqAdcScore]]: one code row → the ADC score per
  * query in a LUT stack (reference object, KBs per query). Keeps the
  * batch PQ serve inside whole-stage codegen — one encoded-corpus scan
  * scores the entire workload. */
case class PqAdcScoreMulti(child: Expression,
    luts: Array[Array[Array[Double]]]) extends UnaryExpression {

  override def prettyName: String = "pq_adc_score_multi"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<int> codes, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    VectorUtil.pqAdcMulti(input.asInstanceOf[ArrayData], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luts", luts, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.pqAdcMulti($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqAdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<int> codes, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    VectorUtil.pqAdc(input.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lut", lut, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorUtil.pqAdc($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def pqEncodeF(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData =
    pqEncode(v.toFloatArray().map(_.toDouble), cb)

  def pqEncodeD(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData =
    pqEncode(v.toDoubleArray(), cb)

  private def pqEncode(x: Array[Double], cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var off = 0
    var s = 0
    while (s < m) {
      val codes = cb(s)
      val subDim = if (codes.isEmpty) 0 else codes(0).length
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < codes.length) {
        val c = codes(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val xi = if (off + i < x.length) x(off + i) else 0.0
          val t = xi - c(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      off += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC scores of one PQ code row against a STACK of query
    * LUTs (`luts(q)` = query q's [[pqAdc]] table) — the batch serve
    * kernel: one pass over the encoded corpus scores every query in
    * the workload. Returns `double[]`, index-aligned with `luts`. */
  def pqAdcMulti(codes: ArrayData,
      luts: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Double](luts.length)
    var q = 0
    while (q < luts.length) {
      out(q) = pqAdc(codes, luts(q))
      q += 1
    }
    new GenericArrayData(out)
  }

  def pqAdc(codes: ArrayData, lut: Array[Array[Double]]): Double = {
    val m = math.min(codes.numElements(), lut.length)
    var sum = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      // codes and LUT must come from the same PqIndex; a code beyond the
      // LUT's codebook size means mismatched artifacts — fail with the
      // contract, not an ArrayIndexOutOfBoundsException from the scan
      if (c < 0 || c >= lut(s).length)
        throw new IllegalArgumentException(
          s"pq code $c out of range for LUT subspace $s (size ${lut(s).length}); " +
            "codes and LUT must be built from the same PqIndex")
      sum += lut(s)(c)
      s += 1
    }
    sum
  }

  def l2NormalizeF(v: ArrayData): ArrayData =
    l2Normalize(v.toFloatArray().map(_.toDouble))

  def l2NormalizeD(v: ArrayData): ArrayData =
    l2Normalize(v.toDoubleArray())

  private def l2Normalize(x: Array[Double]): ArrayData = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    val nrm = math.sqrt(s)
    if (nrm != 0.0) {
      i = 0
      while (i < x.length) { x(i) = x(i) / nrm; i += 1 }
    }
    new GenericArrayData(x)
  }

  def maxAbsF(v: ArrayData): Double = maxAbs(v.toFloatArray().map(_.toDouble))
  def maxAbsD(v: ArrayData): Double = maxAbs(v.toDoubleArray())

  private def maxAbs(x: Array[Double]): Double = {
    var m = 0.0
    var i = 0
    while (i < x.length) { val a = math.abs(x(i)); if (a > m) m = a; i += 1 }
    m
  }

  def quantizeInt8F(v: ArrayData, scale: Double): ArrayData =
    quantizeInt8(v.toFloatArray().map(_.toDouble), scale)

  def quantizeInt8D(v: ArrayData, scale: Double): ArrayData =
    quantizeInt8(v.toDoubleArray(), scale)

  private def quantizeInt8(x: Array[Double], scale: Double): ArrayData = {
    val out = new Array[Byte](x.length)
    var i = 0
    while (i < x.length) {
      val q = math.floor(x(i) * scale)
      out(i) = math.max(-128.0, math.min(127.0, q)).toByte
      i += 1
    }
    new GenericArrayData(out)
  }

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

  def topCentroidsCosF(v: ArrayData, centroids: Array[Array[Double]], m: Int): ArrayData =
    topCos(centroids, v.toFloatArray().map(_.toDouble), m)

  def topCentroidsCosD(v: ArrayData, centroids: Array[Array[Double]], m: Int): ArrayData =
    topCos(centroids, v.toDoubleArray(), m)

  /** Top-m centroid indices by dot product, best first; ties to the lower
    * index. m selection passes over k scores — m is 2–4 and k is the
    * centroid count, so O(m·k) beats building a heap. */
  private def topCos(centroids: Array[Array[Double]], x: Array[Double], m: Int): ArrayData = {
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = centroids(c)
      val n = math.min(ct.length, x.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * ct(i); i += 1 }
      scores(c) = s
      c += 1
    }
    val take = math.min(m, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var best = -1
      var bestS = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!used(c) && scores(c) > bestS) { bestS = scores(c); best = c }
        c += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
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

  /** Top-m centroid ids by cosine, best first (array<int>); centroids
    * must be unit-norm. See [[TopCentroids]]. */
  def top_centroids_cos(v: Column, centroids: Array[Array[Double]], m: Int): Column =
    ColumnInterop.column(TopCentroids(ColumnInterop.expression(v), centroids, m))

  /** Unit-norm (L2) vector, array<double>; zero vectors pass through. */
  def vec_l2_normalize(v: Column): Column =
    ColumnInterop.column(VecL2Normalize(ColumnInterop.expression(v)))

  /** max(|xᵢ|) — the symmetric-quantization range statistic. */
  def vec_max_abs(v: Column): Column =
    ColumnInterop.column(VecMaxAbs(ColumnInterop.expression(v)))

  /** Scale factor for symmetric int8 quantization (127/maxAbs; 0 for a
    * zero vector). Persist alongside the quantized vector. */
  def vec_quantize_scale(v: Column): Column = {
    val ma = vec_max_abs(v)
    org.apache.spark.sql.functions.when(ma === 0.0, 0.0)
      .otherwise(org.apache.spark.sql.functions.lit(127.0) / ma)
  }

  /** Symmetric int8 quantization with an explicit per-row scale column
    * (array<byte>); see [[VecQuantizeInt8]]. */
  def vec_quantize_int8(v: Column, scale: Column): Column =
    ColumnInterop.column(VecQuantizeInt8(
      ColumnInterop.expression(v), ColumnInterop.expression(scale)))

  /** Convenience: quantize with the vector's own 127/maxAbs scale. */
  def vec_quantize_int8(v: Column): Column =
    vec_quantize_int8(v, vec_quantize_scale(v))

  /** Product-quantization codes (`array<int>`, one per subspace) — see
    * [[PqEncode]]. `codebooks(s)(j)` is subspace s's j-th codeword. */
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnInterop.column(PqEncode(ColumnInterop.expression(v), codebooks))

  /** ADC inner-product score of a PQ code column against a query lookup
    * table `lut(s)(j) = dot(query_s, codeword_{s,j})` — see [[PqAdcScore]]. */
  def pq_adc_score(codes: Column, lut: Array[Array[Double]]): Column =
    ColumnInterop.column(PqAdcScore(ColumnInterop.expression(codes), lut))

  /** Per-query ADC scores against a stack of query LUTs (`double[]`,
    * index-aligned with `luts`) — see [[PqAdcScoreMulti]]. */
  def pq_adc_score_multi(codes: Column,
      luts: Array[Array[Array[Double]]]): Column =
    ColumnInterop.column(PqAdcScoreMulti(ColumnInterop.expression(codes), luts))
}
