package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level lexical statistics (beyond the reference — the vocabulary
  * and term-weighting passes every large-scale text pipeline runs before
  * tokenizer training, quality filtering, or retrieval indexing).
  *
  * Scale shape: everything here is explode → hash-aggregate. The explode
  * never re-shuffles raw text — only (token) or (id, token) pairs move —
  * and every aggregate keeps map-side partial combine, so the shuffle
  * volume is bounded by the distinct-token (vocab) or doc×distinct-term
  * (tf) granularity, not by corpus bytes. Top-k is TakeOrdered (no global
  * sort). The only scalar (corpus doc count) travels as a broadcast
  * one-row join — no driver collect of data values.
  */
object Lexicon {

  /** (token, n_occurrences, n_docs) for the `k` most frequent whitespace
    * tokens, ties broken by token. `n_docs` counts documents containing
    * the token — both tallies in ONE aggregate over the exploded pairs
    * (count + count(distinct id) share a shuffle via partial aggregation).
    */
  def vocab(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val pairs = graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol).as("__id"),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("__id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }

  /** Per-(doc, term) frequencies with corpus document frequency and
    * smoothed TF-IDF (the sklearn convention:
    * `tf · (ln((N+1)/(df+1)) + 1)` — never zero, never negative).
    * Output: (id, token, tf, df, tfidf).
    *
    * Two aggregates over one exploded pair set: tf by (id, token), then
    * df by token from the tf frame (already distinct per doc — no
    * count-distinct shuffle). N arrives via a broadcast one-row join. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = pairs.groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    tf.join(dfreq, "token")
      .join(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("__n") + 1).cast("double") /
          (col("df") + 1).cast("double")) + 1.0))
      .select(col("id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** The `k` highest-TF-IDF terms per document (ties by token) — the
    * cheap per-doc keyword/topic signature. One ranking window over the
    * tfIdf frame, partitioned by doc: shuffles (id, token, tf, df)
    * tuples once, never a global sort. */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("token"))
    tfIdf(df, idCol, textCol)
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
  }
}
