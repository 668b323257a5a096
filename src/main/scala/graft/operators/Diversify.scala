package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Result diversification — MMR, maximal marginal relevance (Carbonell
  * & Goldstein, SIGIR 1998): greedily re-rank a retriever's candidate
  * list so each pick balances relevance against redundancy with what is
  * already picked,
  *
  *   pick_i = argmax_c  λ·rel(c) − (1−λ)·max_{s∈picked} cos(c, s)
  *
  * — the standard answer to "the top-k are ten near-copies of the same
  * document", which a training-data pipeline hits whenever it samples
  * exemplars from an un-deduplicated neighborhood and a search UI hits
  * on every query. The third stage of the retrieval stack: retrieve
  * ([[Search]]/[[Similarity]]) → fuse ([[Fusion]]) → diversify (here) →
  * measure ([[RankEval]]).
  *
  * Scale shape: MMR is inherently sequential PER QUERY (pick i depends
  * on picks 1..i−1), so it runs AFTER retrieval on the top-N-bounded
  * candidate frame — request-scale, never corpus-scale. The plan
  * repartitions by query id and sorts within partitions, and each
  * bounded per-query group runs the O(k·N) greedy loop inside one task
  * (the [[Multimodal]] iterator-per-partition idiom; with N ≈ 10²
  * candidates and k ≤ N the loop is microseconds). Nothing here ever
  * sees the corpus: a 100 TB deployment's cost lives in the retriever
  * that produced the candidates.
  *
  * Float discipline: the greedy argmax compares λ·rel − (1−λ)·maxSim
  * doubles. Every term is computed the way the proven cosine gates
  * compute it (sequential dot, cos = dot/(‖a‖·‖b‖)), max over the
  * picked set is order-insensitive, and ties break (score desc, rel
  * desc, id asc) — so an engine reproducing the same cosines reproduces
  * the same picks, and the DuckDB oracle pins the whole greedy
  * trajectory, not just the first pick.
  */
object Diversify {

  /** Greedy MMR re-rank, grouped by query. `candidates` carries
    * (queryIdCol, idCol, relCol, vecCol) — one retriever's (or a
    * fusion's) top-N per query with the relevance score and the
    * document vector for the redundancy term. Returns (queryIdCol,
    * idCol, mmr_rank) with rank 1..min(k, N) per query, ordered by
    * (query, rank). `lambda` ∈ [0,1]: 1 = pure relevance (identity
    * re-rank), 0 = pure diversity. Null vectors are rejected loudly —
    * a null redundancy term would silently skew every later pick. */
  def mmrRerank(candidates: DataFrame, queryIdCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int,
      lambda: Double = 0.5): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val spark = candidates.sparkSession
    val outSchema = StructType(Seq(
      candidates.schema(queryIdCol),
      candidates.schema(idCol),
      StructField("mmr_rank", IntegerType, nullable = false)))
    // project to exactly the greedy loop's inputs; the sort puts each
    // group's rows in (rel desc, id asc) order so the in-task argmax's
    // keep-first-strict-max scan IS the documented tie-break
    val proj = candidates.select(
        col(queryIdCol), col(idCol),
        col(relCol).cast("double").as("__rel"),
        col(vecCol).cast("array<double>").as("__v"))
      .repartition(col(queryIdCol))
      .sortWithinPartitions(col(queryIdCol), col("__rel").desc, col(idCol).asc)
    val lam = lambda
    val kk = k
    val rdd = proj.rdd.mapPartitions { rows =>
      new Iterator[Seq[Row]] {
        private val buf = rows.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): Seq[Row] = {
          val qid = buf.head.get(0)
          val group = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (buf.hasNext && buf.head.get(0) == qid) group += buf.next()
          mmrGroup(group.toIndexedSeq, lam, kk)
        }
      }.flatten
    }
    spark.createDataFrame(rdd, outSchema)
      .orderBy(col(queryIdCol), col("mmr_rank"))
  }

  /** One query's greedy loop over its (rel desc, id asc)-sorted
    * candidates. O(k·N) cosines, N = group size — request-scale. */
  private def mmrGroup(group: IndexedSeq[Row], lambda: Double,
      k: Int): Seq[Row] = {
    val n = group.length
    val vecs = Array.tabulate(n) { i =>
      val s = group(i).getSeq[Double](3)
      require(s != null, s"null $i-th candidate vector in MMR group")
      s.toArray
    }
    val norms = vecs.map(v => math.sqrt(dotSeq(v, v)))
    val rels = Array.tabulate(n)(i => group(i).getDouble(2))
    val picked = new Array[Int](math.min(k, n))
    val used = new Array[Boolean](n)
    // running max-similarity-to-picked per candidate: updating it once
    // per pick keeps the loop O(k·N) instead of O(k²·N)
    val maxSim = Array.fill(n)(0.0)
    var step = 0
    while (step < picked.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!used(i)) {
          // step 0 has no picked set: pure relevance (penalty 0)
          val score = lambda * rels(i) - (1.0 - lambda) * maxSim(i)
          // strictly-greater keeps the FIRST max in (rel desc, id asc)
          // order = tie-break (score desc, rel desc, id asc)
          if (score > bestScore) { best = i; bestScore = score }
        }
        i += 1
      }
      picked(step) = best
      used(best) = true
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val c = dotSeq(vecs(best), vecs(j)) / (norms(best) * norms(j))
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      step += 1
    }
    (0 until picked.length).map { r =>
      val g = group(picked(r))
      Row(g.get(0), g.get(1), r + 1)
    }
  }

  /** Sequential dot — the same accumulation order as
    * [[graft.functions.VecDot]] and DuckDB's list_dot_product, so the
    * greedy trajectory is reproducible across engines. */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
