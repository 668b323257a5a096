package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._

/** Static interleave kernel shared by interpreted eval and codegen (same
  * reference-free pattern as [[VectorUtil]]). */
object BitUtil {

  /** Morton/Z-value: interleave the low `bits` bits of each element of
    * `vals` (dimension c of value bit b lands at output bit `b*d + c`,
    * so dimension 0 owns the least-significant lane). The kernel itself
    * enforces the contract — `d * bits ≤ 63`, non-null coordinates in
    * [0, 2^bits) — because the SQL surface (`interleave_bits`) reaches
    * it directly: silent wrap-around or null-as-zero would produce a
    * plausible but WRONG sort key, the worst failure mode for a
    * clustering primitive. [[graft.operators.Layout.zValue]] clamps
    * before calling, so the library path never pays an exception. */
  def interleave(vals: ArrayData, bits: Int): Long = {
    val d = vals.numElements()
    // product as Long: an enormous array from the SQL surface could
    // overflow d*bits negative in Int and slip past the guard, producing
    // a silently wrong z-value via mod-64 shifts — the exact failure
    // mode the guard exists to prevent
    if (d.toLong * bits > 63)
      throw new IllegalArgumentException(
        s"interleave_bits: $d dims x $bits bits overflows a long")
    val hi = (1 << bits) - 1
    var z = 0L
    var b = 0
    var c = 0
    while (c < d) {
      if (vals.isNullAt(c))
        throw new IllegalArgumentException(
          s"interleave_bits: null coordinate at dim $c")
      val v = vals.getInt(c)
      if (v < 0 || v > hi)
        throw new IllegalArgumentException(
          s"interleave_bits: coordinate $v at dim $c outside [0, ${hi + 1})")
      c += 1
    }
    while (b < bits) {
      c = 0
      while (c < d) {
        z |= ((vals.getInt(c) >>> b) & 1L) << (b * d + c)
        c += 1
      }
      b += 1
    }
    z
  }
}

/** Z-order (Morton) key over an array of bucketized int coordinates —
  * the multi-dimensional clustering key behind z-ordered data layout
  * (cf. the classic Morton curve and its use for parquet data skipping
  * in open lakehouse formats). Taking ONE array child keeps this a
  * [[UnaryExpression]] so `nullSafeCodeGen` applies: `array(x, y, ...)`
  * is itself codegen'd, and the kernel is a tight static-call loop
  * inside whole-stage codegen — the [[VecDot]] house pattern. */
case class InterleaveBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def prettyName: String = "interleave_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<int> input, got $other")
    }

  // overflow/null/range violations throw from the kernel itself, so the
  // interpreted and codegen paths behave identically
  override def nullSafeEval(input: Any): Any =
    BitUtil.interleave(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitUtil.interleave($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dictionary-rank coordinate for low-cardinality string z-dims: an O(1)
  * hash lookup per row against a reference-object HashMap — a `typedlit`
  * map would be a LINEAR ArrayBasedMapData scan (up to dictMax string
  * comparisons per row) inside the one full-table map pass the layout
  * write performs. Same reference-object codegen pattern as
  * [[NearestCentroid]]. Returns null for strings absent from the
  * dictionary (callers coalesce to bucket 0). */
case class StringDictCoord(child: Expression,
    dict: java.util.HashMap[String, Integer]) extends UnaryExpression {

  override def prettyName: String = "string_dict_coord"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string input, got $other")
    }

  override def nullSafeEval(input: Any): Any = dict.get(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dict", dict, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("rank")
      s"""
         |java.lang.Integer $r = (java.lang.Integer) $ref.get($c.toString());
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LayoutExpressions {

  /** Z-order key of pre-bucketized int coordinate columns (dimension 0 =
    * least-significant bit lane). Callers clamp coordinates to
    * [0, 2^bits) — see [[graft.operators.Layout.zValue]]. */
  def interleave_bits(coords: Seq[Column], bits: Int): Column = {
    require(coords.nonEmpty, "interleave_bits needs at least one coordinate")
    require(coords.size * bits <= 63,
      s"${coords.size} dims x $bits bits overflows a long")
    ColumnInterop.column(InterleaveBits(
      ColumnInterop.expression(org.apache.spark.sql.functions.array(coords: _*)),
      bits))
  }

  /** Dictionary-rank coordinate (see [[StringDictCoord]]); null for
    * strings absent from the dictionary. */
  def string_dict_coord(c: Column, dict: java.util.HashMap[String, Integer]): Column =
    ColumnInterop.column(StringDictCoord(ColumnInterop.expression(c), dict))
}
