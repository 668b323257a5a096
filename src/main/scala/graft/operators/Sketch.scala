package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations (beyond the reference — the estimators a
  * 100 TB pipeline reaches for when the exact answer is a shuffle-heavy
  * luxury: per-group cardinalities for corpus reports, frequency
  * estimates for heavy-hitter analysis).
  *
  * Scale shape: both sketches aggregate with map-side partial combine —
  * the shuffle moves fixed-size sketch buffers (HLL registers / CMS
  * grids), never value sets. That is the whole point: exact
  * count-distinct shuffles every distinct value; the HLL buffer is KBs
  * per group regardless of cardinality.
  */
object Sketch {

  /** Per-group approximate distinct count (HyperLogLog++,
    * `approx_count_distinct`). `rsd` is the target relative standard
    * deviation (Spark default 0.05). */
  def approxDistinct(df: DataFrame, groupKeys: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupKeys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_nd"))

  /** Accuracy-gated distinct report: per group, the EXACT distinct count
    * plus a flag that the HLL estimate landed within `tol` relative
    * error. Both aggregates share one shuffle (two aggregation buffers,
    * one pass). Downstream keeps the exact value; the flag exists so a
    * correctness gate can pin the estimator — rows only hash-match an
    * exact-only oracle if every estimate was in tolerance.
    *
    * This is the verification-grade shape (it still pays the exact
    * count); production reporting at scale calls [[approxDistinct]]
    * alone. */
  def distinctReport(df: DataFrame, groupKeys: Seq[String], valueCol: String,
      rsd: Double = 0.05, tol: Double = 0.15): DataFrame =
    df.groupBy(groupKeys.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("exact_nd"),
        approx_count_distinct(col(valueCol), rsd).as("__approx"))
      .withColumn("within_tol",
        abs(col("__approx") - col("exact_nd")).cast("double") <=
          lit(tol) * col("exact_nd"))
      .drop("__approx")

  /** Misra-Gries heavy hitters over `valueCol`: one row per candidate
    * `(item, est_count)`, where every value with true frequency > N/(k+1)
    * is guaranteed a row and `true − N/(k+1) ≤ est_count ≤ true`. The
    * whole aggregation moves O(k) state per partition (map-side combined,
    * merge-safe per Agarwal et al. 2012) — the sketch answers "what
    * dominates this 100 TB column" without shuffling its distinct values.
    * Estimates depend on merge order within the guarantee band, so treat
    * `est_count` as a bound, not a statistic — downstream exact counts
    * for the candidate set are one semi-join away. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.agg(graft.functions.Aggregators.heavy_hitters(col(valueCol), k).as("__hh"))
      .select(explode(col("__hh")).as(Seq("item", "est_count")))

  /** Count-min-sketch frequency estimates for a candidate set of values:
    * builds ONE CMS over `valueCol` (eps/confidence size the grid), then
    * reports the estimate next to each candidate. The sketch is a single
    * fixed-size aggregation buffer (map-side combined), collected once —
    * KBs on the driver; candidates are a tiny literal table. Estimates
    * only ever OVER-count (CMS guarantee): `est ≥ true`, and
    * `est ≤ true + eps·N` with probability `confidence`. */
  def cmsEstimates(df: DataFrame, valueCol: String,
      candidates: Seq[String], eps: Double = 0.0001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    candidates.map(v => (v, cms.estimateCount(v)))
      .toDF(valueCol, "est_count")
  }
}
