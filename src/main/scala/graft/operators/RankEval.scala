package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the measurement half of the retrieval
  * stack: given a ranking (any retriever's or [[Fusion]]'s output) and a
  * relevance set (qrels), compute the standard IR metrics at cutoff k:
  *
  *   - recall@k  — fraction of the relevant set retrieved in the top-k;
  *   - MRR@k     — reciprocal rank of the first relevant hit (0 if none);
  *   - nDCG@k    — graded, position-discounted gain against the ideal
  *                 ordering (Järvelin & Kekäläinen 2002):
  *                 DCG = Σ (2^grade − 1) / log2(position + 1);
  *   - MAP@k     — average precision at k, binary relevance (any qrels
  *                 entry counts): Σ_hits precision@rank_of_hit, divided
  *                 by min(k, |relevant|) — the TREC normalizer, so a
  *                 perfect top-k scores 1.0 even when |relevant| > k.
  *
  * Scale shape: the ranking is top-N-bounded by construction; the qrels
  * join is id-keyed on that bounded frame, the hit-index window for
  * AP holds at most k rows (per query), the ideal-DCG ordering is a
  * TakeOrdered-k over qrels followed by a k-row window (the searchBm25
  * idiom), and every total rides the plan as a broadcast one-row
  * cross-join — no driver-side pipeline actions, one job per evaluate
  * call (plus [[evaluate]]'s bounded LIMIT-1 non-emptiness probe).
  * Metrics are rounded to 4 decimals (the aggregate-rounding oracle
  * discipline); grades must be positive (the ideal DCG of a non-empty
  * qrels set is then nonzero by construction).
  */
object RankEval {

  /** Evaluate one ranking against one relevance set. `ranking` carries
    * (idCol, rankCol) with rank 1-based; `qrels` carries idCol and, for
    * graded nDCG, `gradeCol` (binary relevance = 1.0 when absent).
    * Returns one row: (system, n_relevant, recall_at_k, mrr_at_k,
    * ndcg_at_k, map_at_k). Qrels must be non-empty — ENFORCED by a
    * bounded LIMIT-1 probe, not just documented: metrics against
    * nothing are meaningless (an empty set degenerates to NaN recall),
    * so this throws the loud argument error instead of emitting a
    * NaN/null row. */
  def evaluate(ranking: DataFrame, qrels: DataFrame, idCol: String,
      rankCol: String, k: Int, gradeCol: Option[String] = None,
      system: String = "system"): DataFrame = {
    require(k > 0, "k must be positive")
    require(!qrels.isEmpty,
      "qrels must be non-empty — retrieval metrics against an empty " +
        "relevance set are meaningless (recall degenerates to 0/0)")
    val grade = gradeCol.map(col).getOrElse(lit(1.0))
    val q = qrels.select(col(idCol), grade.cast("double").as("__g"))
    val topk = ranking.filter(col(rankCol) <= k)
      .select(col(idCol), col(rankCol).cast("double").as("__r"))
    // hits: the ranking is top-N-bounded, so this join is bounded too;
    // the AP hit-index window's single partition holds at most k rows
    val hitW = Window.orderBy(col("__r").asc)
    val hitAgg = topk.join(q, Seq(idCol))
      .withColumn("__hidx", row_number().over(hitW).cast("double"))
      .agg(
        sum((pow(lit(2.0), col("__g")) - lit(1.0)) / log2(col("__r") + lit(1.0)))
          .as("__dcg"),
        count(lit(1)).as("__nhit"),
        min(col("__r")).as("__minr"),
        sum(col("__hidx") / col("__r")).as("__apsum"))
    // ideal DCG: TakeOrdered-k over qrels, then a k-row window — the
    // window's single partition holds exactly k rows, never the qrels
    val idealW = Window.orderBy(col("__g").desc, col(idCol).asc)
    val idealAgg = q.orderBy(col("__g").desc, col(idCol).asc).limit(k)
      .withColumn("__i", row_number().over(idealW).cast("double"))
      .agg(sum((pow(lit(2.0), col("__g")) - lit(1.0)) / log2(col("__i") + lit(1.0)))
        .as("__idcg"))
    val totals = q.agg(count(lit(1)).as("n_relevant"))
    hitAgg.crossJoin(broadcast(idealAgg)).crossJoin(broadcast(totals))
      .select(
        lit(system).as("system"),
        col("n_relevant"),
        round(col("__nhit").cast("double") / col("n_relevant"), 4)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__minr"), lit(0.0)), 4).as("mrr_at_k"),
        round(coalesce(col("__dcg") / col("__idcg"), lit(0.0)), 4)
          .as("ndcg_at_k"),
        round(coalesce(col("__apsum"), lit(0.0))
          / least(lit(k.toDouble), col("n_relevant").cast("double")), 4)
          .as("map_at_k"))
  }

  /** [[evaluate]] over a WORKLOAD: ranking and qrels both carry
    * `queryCol`, and every metric computes per query in one plan —
    * aggregates keyed by query, the ideal-DCG window PARTITIONED BY
    * query (never global), per-query joins that AQE broadcasts when
    * the workload is small. The batch-retrieval
    * ([[Search.searchBm25Batch]]) companion: retrieve the workload in
    * one job, score it in the next. Queries with relevant documents
    * but no retrieved hits still emit a row (zero metrics) — driven
    * from the qrels side, so an empty ranking cannot silently shrink
    * the report (and a fully-empty qrels frame yields an honest empty
    * report, never NaN rows — the per-query analogue of [[evaluate]]'s
    * non-empty requirement). Returns one row per query:
    * (queryCol, n_relevant, recall_at_k, mrr_at_k, ndcg_at_k,
    * map_at_k). */
  def evaluateByQuery(ranking: DataFrame, qrels: DataFrame,
      queryCol: String, idCol: String, rankCol: String, k: Int,
      gradeCol: Option[String] = None): DataFrame = {
    require(k > 0, "k must be positive")
    val grade = gradeCol.map(col).getOrElse(lit(1.0))
    val q = qrels.select(col(queryCol), col(idCol),
      grade.cast("double").as("__g"))
    val topk = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol), col(rankCol).cast("double").as("__r"))
    val hitW = Window.partitionBy(col(queryCol)).orderBy(col("__r").asc)
    val hitAgg = topk.join(q, Seq(queryCol, idCol))
      .withColumn("__hidx", row_number().over(hitW).cast("double"))
      .groupBy(col(queryCol))
      .agg(
        sum((pow(lit(2.0), col("__g")) - lit(1.0)) / log2(col("__r") + lit(1.0)))
          .as("__dcg"),
        count(lit(1)).as("__nhit"),
        min(col("__r")).as("__minr"),
        sum(col("__hidx") / col("__r")).as("__apsum"))
    val idealW = Window.partitionBy(col(queryCol))
      .orderBy(col("__g").desc, col(idCol).asc)
    val idealAgg = q.withColumn("__i", row_number().over(idealW).cast("double"))
      .filter(col("__i") <= k)
      .groupBy(col(queryCol))
      .agg(sum((pow(lit(2.0), col("__g")) - lit(1.0)) / log2(col("__i") + lit(1.0)))
        .as("__idcg"))
    val totals = q.groupBy(col(queryCol)).agg(count(lit(1)).as("n_relevant"))
    totals.join(idealAgg, Seq(queryCol))
      .join(hitAgg, Seq(queryCol), "left")
      .select(
        col(queryCol),
        col("n_relevant"),
        round(coalesce(col("__nhit").cast("double"), lit(0.0))
          / col("n_relevant"), 4).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__minr"), lit(0.0)), 4).as("mrr_at_k"),
        round(coalesce(col("__dcg") / col("__idcg"), lit(0.0)), 4)
          .as("ndcg_at_k"),
        round(coalesce(col("__apsum"), lit(0.0))
          / least(lit(k.toDouble), col("n_relevant").cast("double")), 4)
          .as("map_at_k"))
      .orderBy(col(queryCol))
  }

  /** HARD-NEGATIVE MINING over a batch ranking — the training-pair
    * assembly step batch retrieval exists for ([[graft.operators
    * .Search.searchBm25Batch]]'s scaladoc use case): per query, the `n`
    * highest-ranked documents NOT in that query's positives. These are
    * the hardest negatives by construction — documents the retriever
    * itself confuses with the positives — the standard pair source for
    * training embedding/reranker models (dense-retrieval practice,
    * e.g. Karpukhin et al. 2020's BM25 negatives).
    *
    * `ranking` carries (queryCol, idCol, rankCol) with rank 1-based and
    * top-k-bounded by construction; `positives` carries (queryCol,
    * idCol) — qrels, or the mined-against positive pairs. The anti-join
    * is keyed per (query, id) on the bounded frame and the re-rank
    * window partitions BY QUERY over ≤ k surviving rows — request-scale
    * end to end, whatever the corpus size behind the ranking. Returns
    * (queryCol, idCol, neg_rank) with neg_rank ≤ n, ordered by
    * (query, neg_rank); a query whose entire top-k is positive yields
    * fewer (or no) rows rather than reaching past the ranking. */
  def hardNegatives(ranking: DataFrame, positives: DataFrame,
      queryCol: String, idCol: String, rankCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rankCol).asc)
    ranking
      .join(positives.select(col(queryCol), col(idCol)),
        Seq(queryCol, idCol), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= n)
      .select(col(queryCol), col(idCol), col("neg_rank"))
      .orderBy(col(queryCol), col("neg_rank"))
  }
}
