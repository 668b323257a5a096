package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators — the Spark shape for the reference's
  * arbitrary per-group summary callables (`groupby_with_summaries`
  * taking `list[rows] → scalar` fns, littletable.py:3546-3580). Built-in
  * `functions._` aggregates cover the reference's own examples; these
  * Aggregators are the extension point for summaries the built-ins can't
  * express, with map-side partial aggregation preserved (unlike a
  * collect_list + UDF, which ships every row to one reducer).
  */
object Aggregators {

  /** Weighted mean: Σ(v·w)/Σ(w). Null-safe (null v or w skips the row). */
  class WeightedMean extends Aggregator[(java.lang.Double, java.lang.Double), (Double, Double), java.lang.Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (java.lang.Double, java.lang.Double)): (Double, Double) =
      if (a._1 == null || a._2 == null) b else (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): java.lang.Double =
      if (r._2 == 0.0) null else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Geometric mean over positive values: exp(mean(ln v)). Non-positive /
    * null values are skipped (the reference's summary fns see raw rows
    * and apply their own filtering; this mirrors that tolerance). */
  class GeometricMean extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
      if (a == null || a <= 0.0) b else (b._1 + math.log(a), b._2 + 1)
    override def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Long)): java.lang.Double =
      if (r._2 == 0L) null else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Misra-Gries heavy-hitters summary with `k` counters: a bounded map
    * `item → estimate` where every item with true count > N/(k+1) is
    * guaranteed present and every estimate satisfies
    * `true − N/(k+1) ≤ estimate ≤ true` (N = stream length). The merge
    * follows Agarwal et al., "Mergeable Summaries" (PODS 2012): pointwise
    * sum, then subtract the (k+1)-th largest count and drop non-positives
    * — the error bound is preserved under ANY merge tree, which is what
    * makes the sketch partition-layout-safe on a cluster: the buffer is
    * O(k) regardless of distinct-item count, map-side combined, and the
    * shuffle moves k counters, never the value set (the exact top-k
    * alternative shuffles every distinct item). */
  class MisraGries(k: Int)
      extends Aggregator[String, scala.collection.mutable.Map[String, Long], Map[String, Long]] {
    import scala.collection.mutable
    require(k > 0, "MisraGries needs k > 0 counters")
    // mutable buffer: ScalaAggregator keeps the live object between
    // reduce calls (serialization happens only at shuffle/spill), so the
    // per-row hot path updates in place instead of rebuilding a
    // persistent map per input row
    override def zero: mutable.Map[String, Long] = mutable.Map.empty
    override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
      if (a != null) b.get(a) match {
        case Some(c) => b(a) = c + 1
        case None if b.size < k => b(a) = 1L
        // full and unseen: decrement every counter, drop zeros (the
        // incoming item's own +1 cancels against the global −1)
        case None =>
          b.mapValuesInPlace((_, c) => c - 1)
          b.filterInPlace((_, c) => c > 0)
      }
      b
    }
    override def merge(b1: mutable.Map[String, Long],
        b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b2.foreach { case (t, c) => b1(t) = b1.getOrElse(t, 0L) + c }
      if (b1.size > k) {
        // subtract the (k+1)-th largest count from everything; at most k
        // counts can strictly exceed it, so the result fits k counters
        val cut = b1.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        b1.mapValuesInPlace((_, c) => c - cut)
        b1.filterInPlace((_, c) => c > 0)
      }
      b1
    }
    override def finish(r: mutable.Map[String, Long]): Map[String, Long] = r.toMap
    override def bufferEncoder: Encoder[scala.collection.mutable.Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: weighted_mean(v, w). */
  def weighted_mean(v: Column, w: Column): Column =
    udaf(new WeightedMean, Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE))
      .apply(v, w)

  /** Column form: geometric_mean(v). */
  def geometric_mean(v: Column): Column =
    udaf(new GeometricMean, Encoders.DOUBLE).apply(v)

  /** Column form: heavy_hitters(v, k) → map<string,bigint> of Misra-Gries
    * candidates and their (under-)estimates. */
  def heavy_hitters(v: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(v)
}
