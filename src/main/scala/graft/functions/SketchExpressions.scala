package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Deserialization helper behind [[CmsEstimate]]'s NON-foldable path:
  * the sketch bytes arrive as a per-row binary column (in practice the
  * SAME broadcast one-row aggregate repeated, but unsafe-row `getBinary`
  * copies per access, so reference identity cannot be relied on). A
  * per-thread last-sketch cache keyed by content turns the steady state
  * into one `Arrays.equals` per row instead of one deserialization.
  * Honest cost model: that equality check (like the `getBinary` copy
  * that precedes it) is a linear scan of the FULL serialized sketch —
  * ~1.1 MB at [[graft.operators.Sketch.cmsEstimates]]'s default
  * `eps = 0.0001` (width 20000 × depth 7 × 8 B), not KBs — so this path
  * is for the few-rows shape (a candidate list against an in-plan
  * aggregate, `cmsEstimates`). Probing a LARGE column hands the sketch
  * as a constant and takes [[CmsEstimate]]'s foldable path, which
  * deserializes once per expression instance and touches no sketch
  * bytes per row. Thread-local because codegen calls this from many
  * task threads concurrently. */
object CmsOps {
  private val last = new ThreadLocal[(Array[Byte], CountMinSketch)]

  def sketch(bytes: Array[Byte]): CountMinSketch = {
    val cached = last.get()
    // content-only comparison against a DEFENSIVE COPY of the key: a
    // reference-identity shortcut (or storing the caller's array) would
    // serve a stale sketch if any codegen path reuses a buffer in place —
    // Arrays.equals(buf, buf) is trivially true however the contents
    // changed. The clone costs one grid-sized copy (~1.1 MB at default
    // eps) per cache MISS only.
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

  /** Constant-sketch fast path: when the sketch side FOLDS (a literal,
    * the probe-a-big-column shape), deserialize it once per expression
    * instance — the per-row path costs a full scan of the serialized
    * sketch per row (the unsafe-row binary copy plus CmsOps' content
    * equality, ~1.1 MB each at default sizing), which is fine for a
    * candidate list and wrong for a million-row probe. Transient lazy:
    * re-evaluated from the serialized literal on each executor. */
  @transient private lazy val foldedSketch: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(sk: Any, v: Any): Any =
    if (left.foldable)
      foldedSketch.estimateCount(v.asInstanceOf[UTF8String].toString)
    else
      CmsOps.estimateString(sk.asInstanceOf[Array[Byte]],
        v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (left.foldable) {
      // nullSafeCodeGen still evaluates/null-checks both children; the
      // value code just never touches the per-row bytes
      val skRef = ctx.addReferenceObj("cmsSketch", foldedSketch,
        classOf[CountMinSketch].getName)
      nullSafeCodeGen(ctx, ev, (_, v) =>
        s"${ev.value} = $skRef.estimateCount($v.toString());")
    } else
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

  /** Probe a column of ANY size against a driver-held serialized sketch
    * (a persisted artifact, a collected one-row aggregate): the bytes
    * become a literal, so [[CmsEstimate]] takes its foldable
    * once-per-instance path — no per-row sketch-byte traffic, unlike a
    * sketch COLUMN, whose row values each carry the full serialized
    * grid. */
  def cms_estimate(sketchBytes: Array[Byte], value: Column): Column =
    cms_estimate(org.apache.spark.sql.functions.lit(sketchBytes), value)
}
