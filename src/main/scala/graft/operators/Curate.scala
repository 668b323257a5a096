package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GTable

/** Corpus curation funnel (beyond the reference — the standard shape of
  * a production training-data filter chain): an ordered list of named
  * keep-predicates applied conjunctively, yielding the filtered corpus
  * AND a per-stage survivor report.
  *
  * Scale shape: the report is ONE aggregate over the source — stage i's
  * survivor count is `count(WHERE p₁ ∧ … ∧ pᵢ)`, all computed in a
  * single pass as conditional counts (no per-stage scans, no driver
  * loop; the one-row aggregate reshapes to rows inside the plan via
  * explode). The filtered corpus is a plain conjunctive filter —
  * Catalyst pushes it into the scan. */
object Curate {

  final case class Stage(name: String, keep: Column)

  /** The filtered corpus: all stage predicates, pushed down as one
    * conjunction. */
  def filtered(t: GTable, stages: Seq[Stage]): GTable = {
    require(stages.nonEmpty, "need at least one stage")
    t.copy(df = t.df.filter(stages.map(_.keep).reduce(_ && _)))
  }

  /** Shared funnel-count machinery: the cumulative conjunctive
    * predicates (stage i = stages 1..i ANDed) and the one-pass
    * conditional-count aggregates (`n_0` = input, `n_i` = survivors of
    * stage i). [[report]] runs them as their own aggregate;
    * [[filteredObserved]] rides them on the main pass via `observe` —
    * ONE construction so the two can never diverge. */
  private def funnelCounts(stages: Seq[Stage]): (Seq[Column], Seq[Column]) = {
    require(stages.nonEmpty, "need at least one stage")
    val cumulative = stages.scanLeft(lit(true))((acc, s) => acc && s.keep).tail
    val aggs = count(lit(1)).cast("long").as("n_0") +:
      cumulative.zipWithIndex.map { case (pred, i) =>
        count(when(pred, 1)).cast("long").as(s"n_${i + 1}")
      }
    (cumulative, aggs)
  }

  /** Per-stage survivor report: rows (stage, name, survivors), stage 0
    * being the unfiltered input. One aggregate pass. */
  def report(t: GTable, stages: Seq[Stage]): DataFrame = {
    val (_, aggs) = funnelCounts(stages)
    val one = t.df.agg(aggs.head, aggs.tail: _*)
    val stageStructs = struct(lit(0).as("stage"), lit("input").as("name"),
      col("n_0").as("survivors")) +:
      stages.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("stage"), lit(s.name).as("name"),
          col(s"n_${i + 1}").as("survivors"))
      }
    one.select(explode(array(stageStructs: _*)).as("s"))
      .select(col("s.stage"), col("s.name"), col("s.survivors"))
  }

  /** The funnel with a FREE per-stage report: returns the survivors
    * frame plus a registered `Observation` whose per-stage counts
    * (`n_0` = input, `n_i` = survivors of stages 1..i) materialize as a
    * side effect of whatever SINGLE action runs the frame — the write,
    * the count, the downstream job. [[report]] answers "what did the
    * funnel do" with its own aggregate scan; this is the production
    * shape, where the telemetry rides the main pass map-side and costs
    * zero extra scans of a 100 TB corpus. Read `observation.get` (or
    * `getAsJava`) AFTER the action completes; per Spark's Observation
    * contract the metrics reflect the FIRST action that materializes
    * the observed frame. */
  def filteredObserved(t: GTable, stages: Seq[Stage],
      name: String = "curation_funnel"): (GTable, org.apache.spark.sql.Observation) = {
    val (cumulative, aggs) = funnelCounts(stages)
    val obs = org.apache.spark.sql.Observation(name)
    val observed = t.df.observe(obs, aggs.head, aggs.tail: _*)
    (t.copy(df = observed.filter(cumulative.last)), obs)
  }

  /** Corpus balancing: keep at most `k` rows per group, chosen by
    * `order` (make it a total order for determinism — tie-break on a
    * unique id). The standard per-domain / per-source cap that stops a
    * single crawl domain from dominating a training mix.
    *
    * Scale shape: one shuffle on the group key + a bounded per-group
    * sort; no global sort, no driver state. Skewed groups (one domain =
    * half the corpus) are the realistic hazard — the window still ranks
    * that group on one task, so for pathological skew pre-prune with
    * [[quantileBand]]-style filters or raise shuffle partitions; AQE
    * splits the rest. */
  def capPerGroup(t: GTable, keys: Seq[String], order: Seq[Column],
      k: Int): GTable = {
    require(keys.nonEmpty && order.nonEmpty && k > 0,
      "capPerGroup needs keys, an ordering, and k > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    t.copy(df = t.df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn"))
  }

  /** Gopher-style quality rules (Rae et al. 2021, §A1.1 table A1) as
    * per-document boolean flags plus the conjunctive `keep`: word-count
    * band, mean-word-length band, symbol-to-word ratio, alphabetic-word
    * fraction, and minimum stopword hits. Pure `functions._` column
    * compositions — one codegen'd map pass, no shuffle; pair with
    * [[filtered]]/[[report]] to run them as a funnel stage.
    *
    * Rule set (defaults are the published Gopher thresholds, scaled knobs
    * exposed because real corpora tune them):
    *   - `ok_words`:     minWords ≤ word count ≤ maxWords
    *   - `ok_mwl`:       mwlLo ≤ mean word length ≤ mwlHi
    *   - `ok_symbols`:   symbol chars ('#', '…', "..." sequences) / words ≤ maxSymbolRatio
    *   - `ok_alpha`:     fraction of words containing ≥1 letter ≥ minAlphaFrac
    *   - `ok_stopwords`: ≥ minStopwords hits from the stopword list
    *   - `keep`:         all of the above */
  def gopherRules(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      mwlLo: Double = 3.0, mwlHi: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with")): DataFrame = {
    import graft.functions.TextAnalysis
    val text = col(textCol)
    val nw = TextAnalysis.tokenCount(text).cast("long")
    val nwSafe = greatest(nw, lit(1L)).cast("double")
    val mwl = TextAnalysis.meanWordLen(text)
    val symbols = (length(text) -
      length(regexp_replace(text, "#|…|\\.\\.\\.", ""))).cast("double")
    val alphaWords = size(filter(TextAnalysis.words(text),
      w => w.rlike("[A-Za-z]"))).cast("double")
    val stopHits = stopwords.map(TextAnalysis.wordOccurrences(text, _))
      .reduce(_ + _)
    df.withColumn("n_words", nw)
      .withColumn("ok_words", nw.between(minWords, maxWords))
      .withColumn("ok_mwl", mwl.between(mwlLo, mwlHi))
      .withColumn("ok_symbols", symbols / nwSafe <= maxSymbolRatio)
      .withColumn("ok_alpha", alphaWords / nwSafe >= minAlphaFrac)
      .withColumn("ok_stopwords", stopHits >= minStopwords)
      .withColumn("keep",
        col("ok_words") && col("ok_mwl") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))
  }

  /** Keep rows whose `metric` lies inside the [lo, hi] quantile band —
    * the usual outlier trim (drop the shortest/longest p% of documents).
    *
    * `exact = true` uses Spark's exact interpolated `percentile` (one
    * extra pass; per-partition value→count maps, fine for bounded-
    * cardinality metrics like lengths/scores). `exact = false` uses
    * `approx_percentile` (bounded-memory KLL-style sketch) — the path
    * for unbounded-cardinality metrics at 100 TB. The two thresholds
    * come back as ONE broadcast-joined row, so the corpus filter is a
    * single distributed pass — no driver collect of data values. */
  def quantileBand(t: GTable, metric: Column, lo: Double, hi: Double,
      exact: Boolean = true, accuracy: Int = 10000): GTable = {
    require(0.0 <= lo && lo <= hi && hi <= 1.0, "need 0 <= lo <= hi <= 1")
    val qs = array(lit(lo), lit(hi))
    val bandAgg =
      if (exact) percentile(metric, qs)
      else approx_percentile(metric, qs, lit(accuracy))
    val band = t.df.agg(bandAgg.as("__band"))
      .select(col("__band").getItem(0).as("__q_lo"),
        col("__band").getItem(1).as("__q_hi"))
    t.copy(df = t.df
      .join(broadcast(band))
      .filter(metric >= col("__q_lo") && metric <= col("__q_hi"))
      .drop("__q_lo", "__q_hi"))
  }

  /** Model-based quality scoring (fastText / linear-probe classifier
    * INFERENCE): `logit = w·x + b` over an embedding column. The weight
    * vector comes from a model trained offline (the production pattern —
    * training happens once on labeled data; what runs at corpus scale is
    * inference), so this is the 100 TB half of classifier filtering:
    * pure map-side codegen'd arithmetic ([[graft.functions
    * .VectorExpressions.vec_dot]] promotes floats to double and sums
    * sequentially — bit-identical to any engine's cast-then-fold), no
    * shuffle, no state, straight onto the scan. */
  def classifierScore(df: DataFrame, vecCol: String,
      weights: Array[Double], bias: Double,
      outCol: String = "quality_logit"): DataFrame = {
    require(weights.nonEmpty, "need a non-empty weight vector")
    import graft.functions.VectorExpressions
    df.withColumn(outCol,
      VectorExpressions.vec_dot(col(vecCol), typedlit(weights.toSeq)) +
        lit(bias))
  }

  /** Keep rows the classifier accepts at `minProb`: sigmoid(logit) ≥ p
    * ⇔ logit ≥ ln(p/(1−p)), so the probability threshold folds into ONE
    * comparison against a driver-side constant — the filter stays a
    * pushable map-side predicate with no transcendental per row. */
  def classifierFilter(df: DataFrame, vecCol: String,
      weights: Array[Double], bias: Double, minProb: Double): DataFrame = {
    require(minProb > 0 && minProb < 1, "minProb must be in (0,1)")
    import graft.functions.VectorExpressions
    val cut = math.log(minProb / (1.0 - minProb))
    df.filter(VectorExpressions.vec_dot(col(vecCol),
      typedlit(weights.toSeq)) + lit(bias) >= lit(cut))
  }

  /** Perplexity-proxy fluency scoring (the CCNet/RefinedWeb "LM filter"
    * stage, with the LM trained IN-ENGINE): a hashed-BIGRAM language
    * model over md5-prefix buckets — `P(y|x) = (C₂(x,y)+1)/(C₁(x)+V)`
    * with add-1 smoothing over the `V = 16^hexDigits` bucket vocabulary,
    * trained on `train` and scored over `score` (pass the same frame to
    * self-score). Gibberish/boilerplate-shredded text pairs rare bucket
    * transitions and scores low; fluent text rides the corpus's common
    * transitions; thresholding the per-bigram average is the classic
    * perplexity filter (perplexity = exp(−avg logprob)).
    *
    * Determinism contract: per-bigram weights are floor-quantized to
    * integer MICRO-NATS before the per-doc sum, so the reduction is
    * exact integer arithmetic (the [[dsirScores]] idiom). Output:
    * `(idCol, n_bigrams, logprob_micro)`; docs with fewer than two
    * non-empty tokens have no bigrams and are omitted.
    *
    * Scale shape: bigram formation is pure MAP-SIDE array arithmetic
    * (slice + zip_with on the token array — no positional window, no
    * per-doc shuffle); the model is two hash aggregates capped at V²/V
    * rows (≤65k at the default, persisted — KB-scale), C₁ derived FROM
    * C₂ so training scans the corpus once; scoring left-broadcast-joins
    * both count tables (unseen bigrams fall back to the smoothed floor)
    * and ends in ONE groupBy(doc). */
  def lmScores(score: DataFrame, train: DataFrame, idCol: String,
      textCol: String, hexDigits: Int = 2): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 4, "hexDigits must be in [1,4]")
    import graft.functions.TextAnalysis
    val v = math.pow(16.0, hexDigits)
    def bigrams(df: DataFrame, keep: Seq[Column]): DataFrame = {
      val ws = filter(TextAnalysis.words(col(textCol)), w => w =!= "")
      val bs = transform(ws,
        w => substring(md5(w.cast("binary")), 1, hexDigits))
      graft.core.Partitions.ensureParallelism(df)
        .select(keep :+ bs.as("__bs"): _*)
        .filter(size(col("__bs")) >= 2)
        .select(keep :+ explode(zip_with(
          slice(col("__bs"), lit(1), size(col("__bs")) - 1),
          slice(col("__bs"), lit(2), size(col("__bs")) - 1),
          (a, b) => struct(a.as("x"), b.as("y")))).as("__bg"): _*)
        .select(keep :+ col("__bg.x").as("__x") :+ col("__bg.y").as("__y"): _*)
    }
    val c2 = bigrams(train, Seq.empty)
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c1 = c2.groupBy(col("__x")).agg(sum(col("__c2")).as("__c1"))
    // the broadcast hint is only safe while the model tables are
    // KB-scale: C₂ is bounded by V² = 16^(2·hexDigits) rows (65k at the
    // default 2). At hexDigits 3–4 that bound reaches 16M–4B, so the
    // hint comes off and Spark's threshold/AQE decides the join side
    def hinted(m: DataFrame): DataFrame = if (hexDigits <= 2) broadcast(m) else m
    bigrams(score, Seq(col(idCol)))
      .join(hinted(c2), Seq("__x", "__y"), "left")
      .join(hinted(c1), Seq("__x"), "left")
      .withColumn("__w", floor(lit(1e6) * log(
        (coalesce(col("__c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__c1"), lit(0L)).cast("double") + lit(v)))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__w")).as("logprob_micro"))
  }

  /** Per-group TOP-FRACTION quality filter (the FineWeb-style relative
    * cut: "keep the best 20% of each domain", normalizing quality
    * across groups a single global threshold would mis-serve): keeps
    * exactly `ceil(fraction × n_g)` rows per group, best `scoreCol`
    * first, ties broken by ascending `idCol` — row-for-row identical to
    * `row_number() OVER (PARTITION BY group ORDER BY score DESC, id) <=
    * ceil(f·n)`, but NEVER computed that way.
    *
    * Scale shape: a per-group row_number window shuffles every row of a
    * group to one task — with a handful of domains that is THE skewed
    * window this module avoids everywhere. Instead: (1) ONE combiner-
    * friendly hash aggregate to a (group, score) histogram; (2) the
    * rank arithmetic — rows strictly above each score value, the
    * group's admit quota — as a window over the HISTOGRAM (aggregate-
    * sized: score cardinality, not row count); (3) an equi-join back
    * admits every row of fully-admitted score values outright, and
    * (4) only rows AT the one straddling threshold value per group pay
    * a tie-break window, partitioned by (group, score) — the tie set,
    * not the group. Degenerate only if a whole group shares one score
    * (use a higher-resolution score).
    *
    * Rows with a NULL score are EXCLUDED — from the output and from the
    * `n_g` the quota is computed over (an unscored row has no rank; a
    * null-tolerant caller should impute first). */
  def topFractionPerGroup(df0: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    require(groupCols.nonEmpty, "group columns required")
    import org.apache.spark.sql.expressions.Window
    val df = df0.filter(col(scoreCol).isNotNull)
    val g = groupCols.map(col)
    val hist = df.groupBy(g :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("__c"))
    val wAbove = Window.partitionBy(g: _*).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(g: _*)
    val marked = hist
      .withColumn("__above", coalesce(sum(col("__c")).over(wAbove), lit(0L)))
      .withColumn("__k",
        ceil(lit(fraction) * sum(col("__c")).over(wAll)).cast("long"))
      .select(g ++ Seq(col(scoreCol), col("__above"), col("__c"),
        col("__k")): _*)
    val joined = df.join(marked, groupCols :+ scoreCol)
    val out = df.columns.map(col)
    val full = joined.filter(col("__above") + col("__c") <= col("__k"))
      .select(out: _*)
    val wTie = Window.partitionBy(g :+ col(scoreCol): _*)
      .orderBy(col(idCol))
    val partial = joined
      .filter(col("__above") < col("__k") &&
        col("__k") < col("__above") + col("__c"))
      .withColumn("__r", row_number().over(wTie))
      .filter(col("__r") <= col("__k") - col("__above"))
      .select(out: _*)
    full.unionByName(partial)
  }

  /** Per-group TOKEN-BUDGET selection — the mixing-side completion of
    * [[topFractionPerGroup]] (count cut) and [[selectByBudget]] (global
    * token cut): give EACH group (domain, language, source) the same
    * token budget and admit its documents best-score-first while the
    * group's EXCLUSIVE running token total starts inside the budget
    * (the concat-and-cut semantics — only the boundary doc straddles).
    * Row-for-row equal to the per-group ordered window cumsum law, but
    * NEVER computed as that skewed per-group window.
    *
    * Scale shape (the [[topFractionPerGroup]] histogram idiom, with
    * token sums instead of row counts): ONE hash aggregate to a
    * (group, score) histogram carrying per-cell token sums; the
    * exclusive cell prefix as a window over the HISTOGRAM; the join
    * back admits whole cells that fit the budget outright; and only
    * docs in the ONE straddling cell per group pay an intra-cell
    * cumsum window, partitioned by (group, score) — the cell, not the
    * group. Degenerate only if a whole group shares one score.
    *
    * Rows with a NULL score are EXCLUDED (an unscored row has no rank —
    * same contract as [[topFractionPerGroup]]). */
  def budgetPerGroup(df0: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groupCols.nonEmpty, "group columns required")
    import org.apache.spark.sql.expressions.Window
    val df = df0.filter(col(scoreCol).isNotNull)
    val g = groupCols.map(col)
    val tok = coalesce(col(tokenCol).cast("long"), lit(0L))
    val hist = df.groupBy(g :+ col(scoreCol): _*)
      .agg(sum(tok).as("__ctok"))
    val wCell = Window.partitionBy(g: _*).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = hist
      .withColumn("__before", coalesce(sum(col("__ctok")).over(wCell), lit(0L)))
      .select(g ++ Seq(col(scoreCol), col("__before"), col("__ctok")): _*)
    val joined = df.join(marked, groupCols :+ scoreCol)
    val out = df.columns.map(col)
    // strictly-inside cells short-circuit; a cell ENDING exactly at the
    // budget goes through the windowed path too — a trailing zero-token
    // doc there sits AT offset == budget and must be excluded by the
    // strict `< budget` law the windowed filter applies
    val full = joined
      .filter(col("__before") + col("__ctok") < budget)
      .select(out: _*)
    val wIn = Window.partitionBy(g :+ col(scoreCol): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val straddle = joined
      .filter(col("__before") < budget &&
        lit(budget) <= col("__before") + col("__ctok"))
      .withColumn("__wb", coalesce(sum(tok).over(wIn), lit(0L)))
      .filter(col("__before") + col("__wb") < budget)
      .select(out: _*)
    full.unionByName(straddle)
  }

  /** Quality-ranked TOKEN-BUDGET selection (the "take the best N tokens"
    * cut that ends a scored curation funnel — FineWeb-Edu's classifier
    * cut, DSIR's resampled subset, any fixed-compute pretraining mix):
    * rank the corpus by `keys` (best first; tie-break with a unique
    * trailing key so the order is total), then admit every document
    * whose EXCLUSIVE running token offset in that order is `< budget` —
    * the concat-and-cut semantics of sequence packing, so exactly the
    * documents that START inside the budget are kept and only the
    * boundary document may straddle it. Appends `offsetName` (the
    * offset) so the caller can trim or account the straddler.
    *
    * Scale shape: the corpus-wide ordered cumsum is
    * [[graft.core.Ordinals.runningTotal]] — the value-keyed two-level
    * prefix sum (leading-key-aligned buckets + a bucket-partitioned
    * window), never a single-partition window; the budget filter is a
    * plain predicate on the result. Selection depends only on values,
    * never on physical layout. */
  def selectByBudget(df: DataFrame, keys: Seq[graft.core.SortKey],
      tokenCol: String, budget: Long,
      offsetName: String = "tok_before"): DataFrame = {
    require(budget > 0, "budget must be positive")
    graft.core.Ordinals.runningTotal(df, keys, tokenCol, offsetName)
      .filter(col(offsetName) < budget)
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed bag-of-words is under
    * the TARGET distribution than under the RAW distribution — the
    * standard cheap proxy for "select pretraining data that looks like
    * the high-quality target". Words hash to `16^hexDigits` buckets via
    * an md5-hex prefix (engine-portable, layout-free); per-bucket
    * log-likelihood-ratio weights use add-1 smoothing.
    *
    * Determinism contract: weights are quantized to integer MICRO-NATS
    * with `floor` (`floor(1e6·(ln pₜ − ln p_r))`), so the per-document
    * reduction is EXACT integer arithmetic — no double summation order
    * anywhere, the same floor-not-round choice as int8 quantization
    * (round-half ties are engine-specific; floor of the binary value is
    * not). Output: `(idCol, n_tokens, score_micro)`; resample by
    * thresholding or rank-sampling `score_micro` (integer compares,
    * engine-exact).
    *
    * Scale shape: the two bucket histograms are hash aggregates over
    * exploded words (map-side combine; ≤ 16^hexDigits rows each,
    * persisted — KB-scale), their totals fold in as literals, and the
    * weight table broadcast-joins to the exploded raw corpus followed by
    * one groupBy(doc). The corpus is scanned twice (histogram + score),
    * the target once; nothing corpus-sized is cached or collected. */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, hexDigits: Int = 2): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 4, "hexDigits must be in [1,4]")
    import graft.functions.TextAnalysis
    val nBuckets = math.pow(16.0, hexDigits)
    def pairs(df: DataFrame, keep: Seq[Column]): DataFrame =
      graft.core.Partitions.ensureParallelism(df)
        .select(keep :+ explode(TextAnalysis.words(col(textCol))).as("__w"): _*)
        .filter(col("__w") =!= "")
        .withColumn("__bkt",
          substring(md5(col("__w").cast("binary")), 1, hexDigits))
    val rp = pairs(raw, Seq(col(idCol)))
    val histR = rp.groupBy(col("__bkt")).agg(count(lit(1)).as("__cr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val histT = pairs(target, Seq.empty)
      .groupBy(col("__bkt")).agg(count(lit(1)).as("__ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tR = histR.agg(sum(col("__cr"))).head()
    val tT = histT.agg(sum(col("__ct"))).head()
    require(!tR.isNullAt(0) && !tT.isNullAt(0),
      "dsirScores needs non-empty raw AND target corpora")
    // identical expression structure on both engines: ln of the smoothed
    // in-bucket fraction, differenced, scaled, floored — see the oracle
    val weights = histT.join(histR, Seq("__bkt"), "full")
      .select(col("__bkt"),
        floor(lit(1e6) *
          (log((coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
            lit(tT.getLong(0) + nBuckets)) -
           log((coalesce(col("__cr"), lit(0L)) + 1).cast("double") /
            lit(tR.getLong(0) + nBuckets)))).as("__w_micro"))
    rp.join(broadcast(weights), "__bkt")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__w_micro")).as("score_micro"))
  }
}
