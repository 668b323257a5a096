package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * sort). The only scalar (corpus doc count) is a distributed count whose
  * single long lands on the driver and enters the plan as a literal — a
  * zero-column scan job, deliberately NOT a one-row broadcast join (that
  * shape plans as a BroadcastNestedLoopJoin and trips the plan audit).
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

  /** First-iteration BPE merge statistics: corpus-wide counts of adjacent
    * CHARACTER pairs inside words — the quantity byte-pair-encoding
    * tokenizer training maximizes at every merge step (Sennrich et al.
    * 2016; GPT-2/SentencePiece-BPE inherit it). The `k` highest-count
    * pairs, ties broken by (lhs, rhs), are the first merge candidates.
    *
    * Scale shape: the classic vocab-level weighting trick — the corpus
    * collapses to `(distinct word, frequency)` in ONE hash aggregate
    * (map-side combine; shuffle volume = vocab size, not corpus bytes),
    * and the character explode runs over the VOCAB weighted by frequency.
    * A 100 TB corpus with a 10M-word vocab explodes ~10M short rows, not
    * 10^13 tokens. Top-k is TakeOrdered. */
  def bpePairStats(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val words = graft.core.Partitions.ensureParallelism(df)
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("__freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("__freq"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => struct(col("w").substr(i, lit(1)).as("lhs"),
          col("w").substr(i + 1, lit(1)).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("__freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("lhs"), col("rhs"))
      .limit(k)
  }

  /** FULL iterative BPE tokenizer TRAINING (Sennrich et al. 2016) — the
    * completion of [[bpePairStats]]'s single round: `merges` rounds of
    * (count adjacent pairs over the frequency-weighted vocab → take the
    * most frequent pair, ties by (lhs, rhs) → merge every occurrence,
    * greedy left-to-right). Returns the learned merge table
    * `(step, lhs, rhs, n_occurrences)` — the artifact a BPE tokenizer
    * ships; counts are taken BEFORE applying that round's merge, the
    * reference convention.
    *
    * The merge application trick: words are kept DELIMITER-PREFIXED
    * (`\u0001·a·\u0001·b…` — U+0001 before each token for "abc"), which turns "merge token pair
    * (x, y) everywhere, greedy left-to-right" into a plain non-regex
    * `replace(t, d·x·d·y → d·x·y)` — identical semantics in any engine
    * (non-overlapping left-to-right is exactly BPE's greedy scan), no
    * per-position loops. A corpus containing the delimiter character is
    * rejected (it would corrupt token boundaries).
    *
    * Scale shape: the corpus collapses to the (word, freq) vocab ONCE
    * (shuffle = vocab size, not corpus bytes); every round then runs
    * entirely over the persisted VOCAB — one map-side pair explode, one
    * hash aggregate, a driver-side top-1 (one row), one map-side
    * replace. Round cost is vocab-linear; the driver holds only the
    * winning pair. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int,
      delim: String = "\u0001"): DataFrame = {
    require(merges >= 1 && merges <= 64, "merges must be in [1, 64]")
    require(delim.length == 1, "delim must be a single character")
    val spark = df.sparkSession
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = graft.core.Partitions.ensureParallelism(df)
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    var vocab = words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)",
        java.util.regex.Matcher.quoteReplacement(delim) + "$1").as("t"),
        col("freq"))
      .persist(mem)
    require(vocab.filter(col("t").contains(delim + delim)).isEmpty,
      s"corpus contains the delimiter character (codepoint " +
        s"${delim.codePointAt(0)}) — pass a delim absent from the data")
    val dq = java.util.regex.Pattern.quote(delim)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val toks = split(col("t"), dq)
      val pairs = vocab
        .select(col("freq"), slice(toks, lit(2), size(toks) - 1).as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), size(col("a")) - 1),
          (x, y) => struct(x.as("lhs"), y.as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val (l, r, n) = (pairs(0).getString(0), pairs(0).getString(1),
          pairs(0).getLong(2))
        learned += ((step, l, r, n))
        val next = vocab.withColumn("t",
          replace(col("t"), lit(delim + l + delim + r), lit(delim + l + r)))
          .persist(mem)
        next.count() // materialize before dropping the parent cache
        vocab.unpersist()
        vocab = next
        step += 1
      }
    }
    vocab.unpersist()
    learned.toSeq.toDF("step", "lhs", "rhs", "n_occurrences")
  }

  /** Apply a LEARNED BPE merge list — the inference half of
    * [[bpeTrain]]: encode every document with the merges (in training
    * order, each greedy left-to-right via the same delimiter-replace
    * construction) and report its token count before and after.
    * `n_tokens_bpe / n_tokens_raw` is the compression the tokenizer
    * buys; the per-doc counts are what a token-budget planner consumes.
    *
    * Scale shape: ONE codegen'd map pass — the merge chain folds into a
    * single nested-replace expression over each word (merge list is
    * driver-side and KB-sized, exactly what [[bpeTrain]] returns), the
    * per-word token count is a length difference, and the per-doc sum
    * is an `aggregate` over the word array. No shuffle, no explode, no
    * UDF. */
  def bpeApply(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], delim: String = "\u0001"): DataFrame = {
    require(delim.length == 1, "delim must be a single character")
    val qr = java.util.regex.Matcher.quoteReplacement(delim) + "$1"
    def encode(w: Column): Column =
      merges.foldLeft(regexp_replace(w, "(.)", qr)) { case (acc, (l, r)) =>
        replace(acc, lit(delim + l + delim + r), lit(delim + l + r))
      }
    def wordTokens(w: Column): Column = {
      val enc = encode(w)
      length(enc) - length(replace(enc, lit(delim), lit("")))
    }
    val ws = coalesce(filter(TextAnalysis.words(col(textCol)), w => w =!= ""),
      array().cast("array<string>"))
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_tokens_raw"),
        aggregate(col("__ws"), lit(0),
          (acc, w) => acc + wordTokens(w)).cast("long").as("n_tokens_bpe"))
  }

  /** Per-(doc, term) frequencies with corpus document frequency and
    * smoothed TF-IDF (the sklearn convention:
    * `tf · (ln((N+1)/(df+1)) + 1)` — never zero, never negative).
    * Output: (id, token, tf, df, tfidf).
    *
    * Two aggregates over one exploded pair set: tf by (id, token), then
    * df by token from the tf frame (already distinct per doc — no
    * count-distinct shuffle). The tf frame feeds BOTH join branches, so
    * it is pinned (MEMORY_AND_DISK; dropped by ContextCleaner when the
    * result is unreachable) — the corpus is exploded and aggregated
    * exactly once by construction, instead of hoping exchange reuse
    * dedupes two planned copies of the subtree. tf is the aggregated
    * doc×distinct-term frame — far smaller than corpus text, and the
    * thing actually read twice. df stays a hash AGGREGATE (map-side
    * partial combine), not a `count over (partition by token)` window —
    * a window would pull every tf row of a stopword-grade token onto one
    * task, which is exactly the skew this shape avoids at 100 TB. N is
    * counted up front (a zero-column scan) and folded in as a literal. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count() // distributed count; one long to the driver
    val pairs = graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = pairs.groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("tfidf",
        col("tf") * (log(lit((n + 1).toDouble) /
          (col("df") + 1).cast("double")) + 1.0))
      .select(col("id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** The `k` highest-TF-IDF terms per document — the cheap per-doc
    * keyword/topic signature. One ranking window over the tfIdf frame,
    * partitioned by doc: shuffles (id, token, tf, df) tuples once, never
    * a global sort.
    *
    * Ordering: tfidf desc, then tf desc / df asc / token — the integer
    * tie-breaks make equal-score terms rank identically in any engine.
    * (Terms with DISTINCT (tf, df) whose scores differ by ~1 ulp could
    * still cross-rank across libm implementations of log; the driver
    * gate compares the integer columns only, and this ordering plus the
    * smoothed-idf formula has been stable across Spark/DuckDB at all
    * tested SFs.) */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("tf").desc, col("df").asc, col("token"))
    tfIdf(df, idCol, textCol)
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
  }
}
