package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Benchmark decontamination for training corpora (beyond the reference —
  * BASELINE.json north-star territory): find and drop training documents
  * that share word n-grams with an evaluation/benchmark set, the standard
  * test-set-leakage guard (GPT-3 appendix C / PaLM-style 13-gram overlap;
  * the n is a parameter — use 3 for tiny synthetic docs, ~13 for real
  * corpora).
  *
  * Scale shape: the benchmark side is DISTINCT n-gram hashes of the eval
  * set — KB–MB scale even for large benchmark suites — and is broadcast,
  * so the corpus is scanned ONCE map-side (shingle hashing is the
  * codegen'd [[graft.functions.TextHashExpressions.shingle_hash_set]],
  * no explode shuffle of the corpus against itself); the only shuffle is
  * the per-doc overlap count. Set `broadcastBench = false` for an
  * unusually large benchmark side to fall back to a shuffle join.
  */
object Contamination {

  private def shingleHashes(text: Column, n: Int): Column = {
    import graft.functions.TextHashExpressions.shingle_hash_set
    shingle_hash_set(TextAnalysis.words(text), n)
  }

  /** Per-document count of DISTINCT n-grams shared with the benchmark:
    * `(idCol, n_shared)`, only contaminated docs (n_shared ≥ 1). */
  def sharedNgrams(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      broadcastBench: Boolean = true): DataFrame = {
    val benchSh = bench
      .select(explode(shingleHashes(col(benchTextCol), n)).as("shk"))
      .distinct()
    val benchSide = if (broadcastBench) broadcast(benchSh) else benchSh
    corpus
      .select(col(idCol), explode(shingleHashes(col(textCol), n)).as("shk"))
      .join(benchSide, "shk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Corpus minus every document sharing ≥ `minShared` n-grams with the
    * benchmark (anti-join on the flagged ids — one extra shuffle). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      minShared: Long = 1, broadcastBench: Boolean = true): DataFrame = {
    val flagged = sharedNgrams(corpus, idCol, textCol, bench, benchTextCol,
        n, broadcastBench)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
