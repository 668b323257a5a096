package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) —
  * BASELINE.json north-star operator, beyond the reference.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — one scan, one TakeOrdered;
  *     the correctness baseline at any scale where a full scan is
  *     affordable;
  *   - [[lshTopK]]: random-hyperplane LSH — deterministic hyperplanes
  *     derived from splitmix64, bucket the table once (cacheable /
  *     writable), probe only matching buckets at query time. The 100 TB
  *     path: candidate set shrinks ~2^bits fold per table scan avoided.
  */
object Similarity {

  import graft.functions.VectorExpressions.{vec_dot, vec_norm}

  /** Codegen'd dot product (see [[graft.functions.VecDot]]). */
  private def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Exact cosine top-k against a literal query vector: one scan +
    * TakeOrdered, dot product in whole-stage codegen. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val v = col(vecCol)
    df.select(col(idCol),
        (dot(v, q) / (vec_norm(v) * lit(qNorm))).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * splitmix64 → uniform in [-1, 1). No RNG state, reproducible anywhere. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-random-projection bucket id (`bits`-bit code) for each row. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, bits: Int = 12): DataFrame = {
    val v = col(vecCol)
    val code = (0 until bits).map { p =>
      val plane = array((0 until dims).map(d => lit(planeComponent(p, d))): _*)
      when(dot(v, plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    df.withColumn("bucket", code)
  }

  /** LSH-accelerated approximate top-k: probe buckets within `probeDist`
    * Hamming distance of the query's bucket, exact-rank the candidates. */
  def lshTopK(bucketed: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 12, probeDist: Int = 1): DataFrame = {
    val qCode = (0 until bits).map { p =>
      val d = (0 until query.length).map(i => query(i) * planeComponent(p, i)).sum
      if (d >= 0) 1L << p else 0L
    }.reduce(_ | _)
    val cands = bucketed.filter(
      bit_count(col("bucket").bitwiseXOR(lit(qCode))) <= probeDist)
    bruteForceTopK(cands, idCol, vecCol, query, k)
  }
}
