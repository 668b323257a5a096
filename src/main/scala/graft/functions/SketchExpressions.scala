package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Deserialization helper behind [[CmsEstimate]]: the sketch bytes arrive
  * as a per-row binary column (in practice the SAME broadcast one-row
  * aggregate repeated, but unsafe-row `getBinary` copies per access, so
  * reference identity cannot be relied on). A per-thread last-sketch
  * cache keyed by content turns the steady state into one
  * `Arrays.equals` per row instead of one deserialization — equality on
  * a matching sketch is a vectorized linear scan of KBs, deserialization
  * is that plus allocation and parsing. Thread-local because codegen
  * calls this from many task threads concurrently. */
object CmsOps {
  private val last = new ThreadLocal[(Array[Byte], CountMinSketch)]

  def sketch(bytes: Array[Byte]): CountMinSketch = {
    val cached = last.get()
    // content-only comparison against a DEFENSIVE COPY of the key: a
    // reference-identity shortcut (or storing the caller's array) would
    // serve a stale sketch if any codegen path reuses a buffer in place —
    // Arrays.equals(buf, buf) is trivially true however the contents
    // changed. The clone costs one KB-copy per cache MISS only.
    if (cached != null && java.util.Arrays.equals(cached._1, bytes))
      cached._2
    else {
      val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      last.set((bytes.clone(), s))
      s
    }
  }

  /** Estimate a STRING item's count — `toString`, not raw bytes, to match
    * `CountMinSketch.estimateCount(String)` exactly (the hash family the
    * driver-side serve used before this became a plan-side expression). */
  def estimateString(bytes: Array[Byte], v: UTF8String): Long =
    sketch(bytes).estimateCount(v.toString)
}

/** `cms_estimate(sketch, value)`: evaluate a serialized
  * `org.apache.spark.util.sketch.CountMinSketch` (the `count_min_sketch`
  * aggregate's wire format) against a string item INSIDE the plan — the
  * serve half that lets a CMS frequency lookup stay lazy and distributed
  * instead of collecting the sketch to the driver. Codegen emits a
  * static call into [[CmsOps]] (thread-cached deserialization); the
  * interpreted fallback is the same call. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary, string), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(sk: Any, v: Any): Any =
    CmsOps.estimateString(sk.asInstanceOf[Array[Byte]],
      v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, v) =>
      s"${ev.value} = graft.functions.CmsOps.estimateString($sk, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {
  def cms_estimate(sketch: Column, value: Column): Column =
    ColumnInterop.column(CmsEstimate(
      ColumnInterop.expression(sketch), ColumnInterop.expression(value)))
}
