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
    * Scale shape — the real-tokenizer contract (30k–100k merges): the
    * corpus collapses to the `(distinct word, frequency)` vocab in ONE
    * distributed hash aggregate (map-side combine; shuffle volume =
    * vocab size, not corpus bytes), and the `vocabCap` most frequent
    * words land on the driver — the same bounded-artifact contract as
    * the IVF centroid table or the PQ codebook: the distinct-word vocab
    * of even a 100 TB corpus is driver-holdable at the cap, and BPE
    * over the frequency-weighted word dict IS the classic algorithm
    * (Sennrich trains on exactly this dict). The merge loop then runs
    * DRIVER-LOCAL with incremental pair-count maintenance and a
    * lazy-deletion max-heap — ZERO Spark jobs per round, so round cost
    * no longer scales with merge count (the previous shape paid 2
    * distributed jobs per merge and capped at 64). Words cut by
    * `vocabCap` are excluded from training statistics — the standard
    * vocab-truncation trade of production tokenizers; the cut is
    * deterministic (freq desc, word asc).
    *
    * A corpus containing `delim` is rejected (checked distributed, over
    * the FULL corpus, not just the capped vocab): the delimiter is the
    * token-boundary marker of [[bpeApply]]'s replace-chain encoding,
    * and data containing it would corrupt inference. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int,
      delim: String = "\u0001", vocabCap: Int = 1000000): DataFrame = {
    require(merges >= 1 && merges <= 100000, "merges must be in [1, 100000]")
    val spark = df.sparkSession
    import spark.implicits._
    bpeMergeLoop(collectVocab(df, textCol, delim, vocabCap), merges)._1
      .toDF("step", "lhs", "rhs", "n_occurrences")
  }

  /** Codepoint-order string comparison — identical to binary UTF-8
    * comparison (UTF-8 is order-preserving over codepoints), which is
    * what BOTH Spark's string ordering (UTF8String) and DuckDB's ORDER
    * BY use. Java's `String.compareTo` is UTF-16 code-UNIT order, which
    * DISAGREES when one side starts a supplementary character (surrogate
    * lead 0xD800+) and the other holds a BMP char in 0xE000–0xFFFF —
    * driver-side tie-breaks must use THIS, or merge selection / token
    * ranking silently diverges from the oracle on emoji-bearing corpora. */
  private[operators] def cmpUtf8(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The shared single-scan vocab collection of [[bpeTrain]] /
    * [[bpeVocab]]: ONE corpus read feeding one hash aggregate (map-side
    * combine; shuffle volume = vocab size, not corpus bytes); the
    * delimiter-collision check runs against the aggregated DISTINCT-word
    * frame (every corpus word appears there, so coverage is full-corpus)
    * on the same cached aggregate instead of a second corpus scan; only
    * the bounded top-cap vocab reaches the driver. */
  private def collectVocab(df: DataFrame, textCol: String, delim: String,
      vocabCap: Int): Array[(String, Long)] = {
    require(delim.length == 1, "delim must be a single character")
    require(vocabCap >= 1, "vocabCap must be positive")
    val vocab = graft.core.Partitions.ensureParallelism(df)
      .select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      require(vocab.filter(col("w").contains(delim)).isEmpty,
        s"corpus contains the delimiter character (codepoint " +
          s"${delim.codePointAt(0)}) — pass a delim absent from the data")
      vocab.orderBy(col("freq").desc, col("w"))
        .limit(vocabCap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
    } finally vocab.unpersist()
  }

  /** Driver-local BPE merge loop over a frequency-weighted vocab:
    * incremental pair-count maintenance (each round touches only the
    * words that contain the merged pair) + a lazy-deletion max-heap
    * keyed (count, lhs, rhs) — stale snapshots are discarded on pop —
    * so a round costs O(touched words + pops), independent of the merge
    * index. Greedy left-to-right non-overlapping merge inside each
    * word: `aaaa` + (a,a) → `[aa, aa]`, never the overlapping middle
    * pair — one pass eliminates every (lhs, rhs) adjacency in a word,
    * so the merged pair's count always drains to zero. */
  private def bpeMergeLoop(vocab: Array[(String, Long)], merges: Int)
      : (Seq[(Int, String, String, Long)], Array[Array[String]]) = {
    import scala.collection.mutable
    // split by CODEPOINT, not UTF-16 unit: w.map(_.toString) would break
    // a supplementary char (e.g. an emoji) into lone surrogates and
    // learn merges bpeApply's codepoint-regex encoding can never fire
    def codepoints(w: String): Array[String] = {
      val buf = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        buf += w.substring(i, i + n)
        i += n
      }
      buf.toArray
    }
    val syms = vocab.map { case (w, _) => codepoints(w) }
    val freqs = vocab.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          // smaller lhs wins among equal counts — in CODEPOINT (binary
          // UTF-8) order, the collation Spark and DuckDB sort strings
          // by; String.compareTo would mis-rank supplementary chars
          val l = cmpUtf8(b._2, a._2)
          if (l != 0) l else cmpUtf8(b._3, a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long): Unit = {
      val n = pairCount.getOrElse(p, 0L) + delta
      if (n <= 0L) pairCount.remove(p)
      else {
        pairCount(p) = n
        heap.enqueue((n, p._1, p._2))
      }
    }
    def pairsIn(a: Array[String]): Iterator[(String, String)] =
      if (a.length < 2) Iterator.empty
      else (0 until a.length - 1).iterator.map(j => (a(j), a(j + 1)))
    for (i <- syms.indices) {
      pairsIn(syms(i)).foreach { p =>
        bump(p, freqs(i))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
    }
    val learned = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      var best: Option[(Long, String, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        // live iff the snapshot count is still the current count
        if (pairCount.get((e._2, e._3)).contains(e._1)) best = Some(e)
      }
      best match {
        case None => exhausted = true
        case Some((n, l, r)) =>
          learned += ((step, l, r, n)) // count BEFORE applying the merge
          val p = (l, r)
          val touched = pairWords.getOrElse(p, mutable.HashSet.empty).toArray
          for (i <- touched) {
            val old = syms(i)
            val buf = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < old.length) {
              if (j < old.length - 1 && old(j) == l && old(j + 1) == r) {
                buf += (l + r); j += 2
              } else { buf += old(j); j += 1 }
            }
            val nw = buf.toArray
            // multiset delta of adjacent pairs, weighted by word freq
            pairsIn(old).foreach(bump(_, -freqs(i)))
            pairsIn(nw).foreach(bump(_, freqs(i)))
            val oldSet = pairsIn(old).toSet
            val newSet = pairsIn(nw).toSet
            (oldSet -- newSet).foreach(q => pairWords.get(q).foreach(_ -= i))
            (newSet -- oldSet).foreach(q =>
              pairWords.getOrElseUpdate(q, mutable.HashSet.empty) += i)
            syms(i) = nw
          }
          pairWords.remove(p)
          step += 1
      }
    }
    // syms now holds every vocab word's FINAL post-merge symbol array —
    // returned so bpeVocab can tally the vocabulary without re-applying
    // the merges
    (learned.toSeq, syms)
  }

  /** PERSISTED BPE merge artifact — the train/serve split every other
    * index in this engine already has (BM25 postings, LSH buckets, IVF
    * centroids): train at most once per (table, merges, vocabCap) per
    * warehouse, save the learned merge table, and hand the apply path
    * the KB-sized merge list. A matching saved artifact short-circuits
    * training entirely — the serving cost of [[bpeApply]] is then one
    * codegen'd map pass with zero training jobs. Mismatched parameters
    * (or a missing/empty meta table) retrain and overwrite.
    *
    * Source-data changes are NOT detected (same contract as
    * `bm25IndexFor` / `lshIndexFor`): the table name identifies a
    * build, and the serve path also skips the delimiter-collision scan
    * the trainer ran on the ORIGINAL corpus. When the corpus can change
    * under a stable path, fold a source fingerprint (e.g. file mtime)
    * into `table` — q_bpe_apply does exactly this. */
  def bpeMergesFor(df: DataFrame, textCol: String, table: String,
      merges: Int, delim: String = "\u0001",
      vocabCap: Int = 1000000): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val metaT = s"${table}_meta"
    val matches = spark.catalog.tableExists(table) &&
      spark.catalog.tableExists(metaT) && {
        val m = spark.table(metaT)
        m.columns.sameElements(Array("requested_merges", "vocab_cap")) && {
          // limit(1).collect, not head(): an EMPTY meta table (a crash
          // between replaceTable and the meta write) must retrain, not
          // throw NoSuchElementException on every subsequent serve
          val h = m.limit(1).collect().headOption
          h.exists(r => r.getInt(0) == merges && r.getInt(1) == vocabCap)
        }
      }
    if (!matches) {
      // a fresh session doesn't know tables whose warehouse location
      // survived a previous JVM — clear both catalog entry AND location,
      // or saveAsTable throws LOCATION_ALREADY_EXISTS
      graft.sources.Sources.replaceTable(spark, table)
      graft.sources.Sources.replaceTable(spark, metaT)
      bpeTrain(df, textCol, merges, delim, vocabCap)
        .write.mode("overwrite").saveAsTable(table)
      Seq((merges, vocabCap)).toDF("requested_merges", "vocab_cap")
        .write.mode("overwrite").saveAsTable(metaT)
    }
    spark.table(table).orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** The delimiter-wrapped replace-chain word encoder shared by
    * [[bpeApply]] and [[bpeTokenize]]: every codepoint becomes
    * `d+cp+d`, then each merge (l, r) rewrites the exact token
    * adjacency `d+l+dd+r+d` → `d+l+r+d` greedily left-to-right. See
    * [[bpeApply]] for why the token-WRAPPED form (not a single
    * separator) is required for token-exact matching. */
  private def encodeWord(w: Column, merges: Seq[(String, String)],
      delim: String): Column = {
    val dq = java.util.regex.Matcher.quoteReplacement(delim)
    val qr = dq + "$1" + dq
    merges.foldLeft(regexp_replace(w, "(.)", qr)) { case (acc, (l, r)) =>
      replace(acc, lit(delim + l + delim + delim + r + delim),
        lit(delim + l + r + delim))
    }
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
    * UDF.
    *
    * Encoding construction: each token is WRAPPED in the delimiter
    * (`d+tok+d`, so a token boundary is the 2-char `dd` and a string
    * end is a single `d`), and merging (l, r) is
    * `replace(d+l+dd+r+d, d+l+r+d)` — the wrapper makes the match
    * token-EXACT and greedy left-to-right. The naive single-delimiter
    * form (`replace(d+l+d+r, ...)`) is subtly WRONG: it also fires when
    * `r` is a strict PREFIX of the following token — merging (an, a) in
    * `[b, an, an, a]` would corrupt the middle `an` into `anan` — which
    * diverges from token-level BPE. Token count = delimiter count / 2. */
  def bpeApply(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], delim: String = "\u0001"): DataFrame = {
    require(delim.length == 1, "delim must be a single character")
    // each merge adds one nested replace to a single Catalyst expression
    // tree, and Column-node conversion/analysis recurse over it — a
    // 400-deep chain overflows a default-stack JVM (measured in
    // LexiconSpec's forked JVM). 128 keeps 3× margin; deeper lists
    // belong on the rank-loop codegen path, whose per-word cost is
    // independent of merge count
    require(merges.size <= 128,
      s"bpeApply folds ${merges.size} merges into one nested-replace " +
        "expression (stack-bounded at 128); use bpeApplyDeep for " +
        "vocabulary-scale merge lists")
    def wordTokens(w: Column): Column = {
      val enc = encodeWord(w, merges, delim)
      ((length(enc) - length(replace(enc, lit(delim), lit("")))) / 2)
        .cast("long")
    }
    val ws = coalesce(filter(TextAnalysis.words(col(textCol)), w => w =!= ""),
      array().cast("array<string>"))
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_tokens_raw"),
        aggregate(col("__ws"), lit(0L),
          (acc, w) => acc + wordTokens(w)).cast("long").as("n_tokens_bpe"))
  }

  /** BPE inference at REAL-TOKENIZER merge depth — the uncapped
    * counterpart of [[bpeApply]] (same output schema: per-doc raw and
    * post-merge token counts): encoding runs in the codegen'd
    * [[graft.functions.BpeEncodeWords]] expression, whose rank-based
    * greedy loop (the GPT-2/HuggingFace inference algorithm) costs
    * O(word-symbols²) per word INDEPENDENT of merge-list size — a
    * 30k–100k-merge tokenizer is one reference object riding into
    * codegen, not 100k expression nodes. The replace-chain path stays
    * the oracle-friendly choice for KB-scale lists; this is the serving
    * path when the list is vocabulary-sized.
    *
    * Same contract as the expression: merge lists must be
    * TRAINING-PRODUCED (rank order = training order); see
    * [[graft.functions.BpeUtil.encodeWord]]. */
  def bpeApplyDeep(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import graft.functions.BpeExpressions.bpe_encode_words
    val ws = coalesce(filter(TextAnalysis.words(col(textCol)), w => w =!= ""),
      array().cast("array<string>"))
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_tokens_raw"),
        size(flatten(bpe_encode_words(col("__ws"), merges))).cast("long")
          .as("n_tokens_bpe"))
  }

  /** BPE ENCODE with the actual token stream — [[bpeApply]] reports only
    * counts; this emits, per document, the full in-order subword token
    * sequence (joined by `delim` — equivalent information to the array,
    * but hash-stable across engines) AND the DECODE of that stream
    * (per-word token concatenation, words re-joined by single spaces).
    * BPE is concatenative, so `decode(encode(w)) == w` exactly — the
    * invertibility law every tokenizer roundtrip test pins; the
    * q_bpe_roundtrip oracle asserts `decoded` against the raw
    * whitespace-split words computed independently, so a lossy encoder
    * (dropped codepoint, corrupted merge) is a hash mismatch, not a
    * silent token-count coincidence.
    *
    * Scale shape: identical to [[bpeApply]] — one codegen'd map pass,
    * no shuffle, no explode, no UDF; the merge chain folds into a
    * nested-replace expression, tokens fall out of one `split` per
    * word, and decode is `array_join` twice. */
  def bpeTokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], delim: String = "\u0001"): DataFrame = {
    require(delim.length == 1, "delim must be a single character")
    require(merges.size <= 128,
      s"bpeTokenize folds ${merges.size} merges into one nested-replace " +
        "expression (stack-bounded at 128, as bpeApply); deep token " +
        "streams come from graft.functions.BpeEncodeWords directly")
    val ws = coalesce(filter(TextAnalysis.words(col(textCol)), w => w =!= ""),
      array().cast("array<string>"))
    // per word: encode → split on delim → drop the empty boundary cells
    def wordToks(w: Column): Column =
      filter(split(encodeWord(w, merges, delim),
        java.util.regex.Pattern.quote(delim)), t => t =!= "")
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        transform(col("__ws"), w => wordToks(w)).as("__tt"))
      .select(col(idCol),
        size(flatten(col("__tt"))).cast("long").as("n_tokens_bpe"),
        array_join(flatten(col("__tt")), delim).as("tokens_joined"),
        array_join(transform(col("__tt"), a => array_join(a, "")), " ")
          .as("decoded"))
  }

  /** [[bpeTokenize]] at REAL-TOKENIZER merge depth — the token-STREAM
    * counterpart of [[bpeApplyDeep]] (same output schema as
    * [[bpeTokenize]]: per-doc count, delim-joined token stream, and the
    * independent decode): encoding runs in the codegen'd rank-loop
    * [[graft.functions.BpeEncodeWords]], so a vocabulary-scale merge
    * list (1k–100k) is one reference object riding into codegen — the
    * replace-chain's 128-merge stack bound does not apply. Same
    * invertibility law: BPE is concatenative, `decoded` reconstructs
    * the whitespace-normalized input exactly. One codegen'd map pass,
    * no shuffle, no explode, no UDF. */
  def bpeTokenizeDeep(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], delim: String = "\u0001"): DataFrame = {
    require(delim.length == 1, "delim must be a single character")
    import graft.functions.BpeExpressions.bpe_encode_words
    val ws = coalesce(filter(TextAnalysis.words(col(textCol)), w => w =!= ""),
      array().cast("array<string>"))
    df.select(col(idCol), ws.as("__ws"))
      .select(col(idCol), bpe_encode_words(col("__ws"), merges).as("__tt"))
      .select(col(idCol),
        size(flatten(col("__tt"))).cast("long").as("n_tokens_bpe"),
        array_join(flatten(col("__tt")), delim).as("tokens_joined"),
        array_join(transform(col("__tt"), a => array_join(a, "")), " ")
          .as("decoded"))
  }

  /** The FINAL VOCABULARY after BPE training — the second artifact a
    * tokenizer ships (alongside [[bpeTrain]]'s merge list): every
    * distinct subword symbol left when all requested merges have been
    * applied to the training vocab, with its corpus occurrence count
    * (word-frequency-weighted). Rank order (count desc, token asc) is
    * what vocab files are sorted by; `token_id` is that rank, 0-based —
    * stable, deterministic token ids.
    *
    * Scale shape: same ONE corpus-wide word-frequency aggregate as
    * [[bpeTrain]] (shuffle volume = vocab size, not corpus bytes), then
    * the driver-local merge loop re-runs over the bounded top-cap vocab
    * and the final symbol multiset — KB-scale — is parallelized back
    * out. */
  def bpeVocab(df: DataFrame, textCol: String, merges: Int,
      delim: String = "\u0001", vocabCap: Int = 1000000): DataFrame = {
    require(merges >= 1 && merges <= 100000, "merges must be in [1, 100000]")
    val spark = df.sparkSession
    import spark.implicits._
    val vocabRows = collectVocab(df, textCol, delim, vocabCap)
    // the merge loop already holds every word's FINAL symbol array —
    // tally those, weighted by word frequency
    val (_, finalSyms) = bpeMergeLoop(vocabRows, merges)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < vocabRows.length) {
      val f = vocabRows(i)._2
      finalSyms(i).foreach(t => counts(t) = counts.getOrElse(t, 0L) + f)
      i += 1
    }
    // rank in codepoint (binary UTF-8) token order on count ties — the
    // collation the DuckDB oracle's ORDER BY uses
    val ranked = counts.toSeq.sortWith { case ((ta, na), (tb, nb)) =>
      if (na != nb) na > nb else cmpUtf8(ta, tb) < 0
    }
    ranked.zipWithIndex.map { case ((t, n), i) => (i.toLong, t, n) }
      .toDF("token_id", "token", "n_occurrences")
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
