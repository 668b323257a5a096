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

  // ------------------------------------------------------------------
  // Fuzzy (near-duplicate) decontamination
  // ------------------------------------------------------------------

  /** Per-(corpus doc, benchmark doc) EXACT n-gram Jaccard for pairs
    * sharing at least one shingle — the cross-table analog of the dedup
    * inverted-index join. Returns `(idCol, bench_id, jaccard)` rows with
    * `jaccard >= minJaccard`. A raw shared-n-gram count (above) treats a
    * doc quoting one benchmark sentence the same as a paraphrased copy;
    * Jaccard normalizes by both docs' shingle sets, which is what
    * catches REWRITTEN benchmark items.
    *
    * Scale shape: benchmark shingles (id, size, hash) broadcast; the
    * corpus explodes once map-side and the per-pair intersection count
    * is the single shuffle. Both sizes ride the rows, so no extra join.
    * For a benchmark too large to broadcast, set `broadcastBench=false`
    * (shuffle join) — or band with MinHash first via the Dedup
    * machinery. */
  def fuzzyContaminationPairs(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 3, minJaccard: Double = 0.8,
      broadcastBench: Boolean = true): DataFrame = {
    // one Jaccard-join implementation: build the bench index in-plan and
    // delegate to the FromIndex path (the hint survives the projection;
    // EliminateResolvedHint propagates it up to the join)
    val bIdx0 = shingleIndexFrame(bench, benchIdCol, benchTextCol, n)
    val bIdx = if (broadcastBench) broadcast(bIdx0) else bIdx0
    fuzzyContaminationPairsFromIndex(corpus, idCol, textCol, bIdx,
      n, minJaccard)
  }

  /** Corpus minus every document whose n-gram Jaccard with ANY benchmark
    * document reaches `minJaccard` — the near-duplicate leakage guard
    * layered on top of [[decontaminate]]'s exact-overlap guard. */
  def decontaminateFuzzy(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3, minJaccard: Double = 0.8,
      broadcastBench: Boolean = true): DataFrame = {
    val flagged = fuzzyContaminationPairs(corpus, idCol, textCol,
        bench, benchIdCol, benchTextCol, n, minJaccard, broadcastBench)
      .select(col(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------------
  // Persisted shingle index (the repeated-check / streaming-serve shape)
  // ------------------------------------------------------------------

  /** Metadata key stamped on the `shk` column by [[shingleIndexFrame]]:
    * the shingle width the hashes were computed with. Hash spaces of
    * different widths are disjoint, so a width mismatch between build
    * and serve would SILENTLY produce zero candidates (everything
    * admitted) — the FromIndex joins fail loudly on it instead. */
  private val ShingleNKey = "graft_shingle_n"

  /** The exploded shingle index of a document set: one `(id, n_sh, shk)`
    * row per (document, distinct n-gram hash) — the join-side view every
    * exact-Jaccard check needs. Public so it can be built ONCE and
    * persisted when the same reference set is checked repeatedly (a
    * benchmark suite under a daily decontamination run, a corpus under a
    * streaming near-dup ingest). The `shk` column carries the shingle
    * width as column metadata (it survives the parquet round-trip), so
    * serve-side joins can validate it. */
  def shingleIndexFrame(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(ShingleNKey, n.toLong).build()
    df.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("__sh"))
      .select(col("id"), size(col("__sh")).as("n_sh"),
        explode(col("__sh")).as("shk"))
      // stamp in a SEPARATE projection: an alias directly on a
      // generator goes through the Generate aliasing path, which drops
      // explicit metadata
      .select(col("id"), col("n_sh"), col("shk").as("shk", meta))
  }

  /** [[fuzzyContaminationPairs]] against a PREBUILT `(id, n_sh, shk)`
    * index (same output for the same reference set). The index side is
    * NOT broadcast by default — this is the path for a reference set too
    * large to rebuild or ship per check: a shingle-bucketed persisted
    * index joins with at most an exchange of the (small) incoming side
    * into its bucket layout, and the big side never moves. If the index
    * carries a shingle-width stamp ([[shingleIndexFrame]] writes one), a
    * mismatch with `n` throws — disjoint hash spaces would otherwise
    * silently admit every near-duplicate. */
  def fuzzyContaminationPairsFromIndex(corpus: DataFrame, idCol: String,
      textCol: String, benchIndex: DataFrame,
      n: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val m = benchIndex.schema("shk").metadata
    if (m.contains(ShingleNKey))
      require(m.getLong(ShingleNKey) == n.toLong,
        s"shingle-width mismatch: index built with n=${m.getLong(ShingleNKey)}, " +
          s"serve called with n=$n — the hash spaces are disjoint")
    val cSh = corpus
      .select(col(idCol), shingleHashes(col(textCol), n).as("__sh"))
      .select(col(idCol), size(col("__sh")).as("__na"),
        explode(col("__sh")).as("shk"))
    val bSh = benchIndex.select(col("id").as("__bid"),
      col("n_sh").as("__nb"), col("shk"))
    cSh.join(bSh, "shk")
      .groupBy(col(idCol), col("__bid"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("__i"))
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col(idCol), col("__bid").as("bench_id"), col("jaccard"))
  }

  /** [[decontaminateFuzzy]] against a prebuilt `(id, n_sh, shk)` index. */
  def decontaminateFuzzyFromIndex(corpus: DataFrame, idCol: String,
      textCol: String, benchIndex: DataFrame,
      n: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val flagged = fuzzyContaminationPairsFromIndex(corpus, idCol, textCol,
        benchIndex, n, minJaccard)
      .select(col(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Load the persisted shingle index for `docs`, building and saving it
    * first if this session's warehouse doesn't hold a matching one (the
    * [[graft.operators.Search.bm25IndexFor]] build-once contract). The
    * index is bucketed+sorted on `shk`, so every subsequent Jaccard
    * check joins it WITHOUT an index-side exchange — the incoming side
    * shuffles into the bucket layout (or broadcasts, for a micro-batch);
    * the N-scale index is scanned in place. A `_meta` sibling pins
    * (n, buckets); parameter drift rebuilds.
    *
    * SINGLE-WRITER assumption: the check-then-build sequence is not
    * atomic — two jobs sharing a warehouse can race the rebuild (last
    * writer wins; readers of the loser's handle may see the winner's
    * identical rebuild). Safe because rebuilds are idempotent for a
    * fixed (docs, n, buckets); concurrent builds over DIFFERENT corpora
    * into the same table name are a caller configuration error. */
  def shingleIndexFor(docs: DataFrame, idCol: String, textCol: String,
      table: String, n: Int = 3, buckets: Int = 32,
      fingerprint: String = ""): DataFrame = {
    val spark = docs.sparkSession
    val matches = spark.catalog.tableExists(table) &&
      spark.catalog.tableExists(s"${table}_meta") &&
      // headOption: a committed-but-empty meta table (interrupted
      // write) must read as a mismatch and rebuild, not throw
      spark.table(s"${table}_meta").limit(1).collect().headOption.exists(
        m => m.getInt(0) == n && m.getInt(1) == buckets) && {
        // an index from before the width stamp existed (or whose stamp
        // disagrees) rebuilds — serving it would defeat the FromIndex
        // joins' mismatch guard; a same-named foreign table with no
        // `shk` column at all is likewise a mismatch, not an error
        val schema = spark.table(table).schema
        schema.exists(_.name == "shk") && {
          val sm = schema("shk").metadata
          sm.contains(ShingleNKey) && sm.getLong(ShingleNKey) == n.toLong
        }
      } && (fingerprint.isEmpty ||
        graft.sources.Sources.readFingerprint(spark, table)
          .contains(fingerprint))
    if (!matches) {
      // a rebuilt artifact is a fresh identity: stale tombstones from a
      // previous corpus generation would mask valid ids of the new one
      graft.sources.Sources.replaceTable(spark, s"${table}_deleted")
      graft.sources.Sources.writeBucketed(
        graft.core.GTable(shingleIndexFrame(docs, idCol, textCol, n)),
        table, Seq("shk"), buckets)
      graft.sources.Sources.replaceTable(spark, s"${table}_meta")
      import spark.implicits._
      Seq((n, buckets)).toDF("n", "buckets")
        .write.mode("overwrite").format("parquet")
        .options(graft.sources.Sources.stagedWriteOptions(spark, s"${table}_meta"))
        .saveAsTable(s"${table}_meta")
      // stamped LAST: a build that dies mid-way reads as a mismatch
      if (fingerprint.nonEmpty)
        graft.sources.Sources.writeFingerprint(spark, table, fingerprint)
    }
    // takedown masking ([[graft.operators.Tombstones]]): every serve of
    // the index — and through it every FromIndex Jaccard check and the
    // streaming near-dedup sinks — stops suppressing near-dups of a
    // deleted corpus document the moment its delete commits. Identity
    // when no tombstones exist.
    graft.operators.Tombstones.mask(spark, table, spark.table(table))
  }

  /** DELETE corpus documents from a persisted shingle index — the
    * takedown path for the near-dup serving family
    * ([[graft.operators.Tombstones]]): `ids` is a one-column frame of
    * the corpus ids to forget (any column name; stored as the index's
    * `id`). One small tombstone commit; the bucketed index files are
    * untouched. From the next [[shingleIndexFor]] load, near-dups of
    * the deleted documents are ADMITTED rather than suppressed — a
    * revoked/erased corpus document must stop shaping admission
    * decisions, the same "geometry forgets" semantic as the ANN
    * retrains. Physical erasure rides
    * [[graft.streaming.Streaming.compactNearDedupIndex]]'s cadence.
    * Re-deletes are no-ops. */
  def deleteDocs(spark: org.apache.spark.sql.SparkSession,
      table: String, ids: DataFrame): Unit = {
    val renamed = ids.select(col(ids.columns.head).as("id"))
      .dropDuplicates("id")
    val fresh = graft.operators.Tombstones.read(spark, table)
      .map(t => renamed.join(
        broadcast(t.select(col("id")).dropDuplicates("id")),
        Seq("id"), "left_anti"))
      .getOrElse(renamed)
    graft.operators.Tombstones.append(spark, table, fresh)
  }

  // ------------------------------------------------------------------
  // Bloom-prefiltered exact decontamination (the 100 TB shape)
  // ------------------------------------------------------------------

  /** Serialized bloom filter (`org.apache.spark.util.sketch` wire format)
    * over the benchmark's DISTINCT n-gram hashes. Even a large benchmark
    * suite (10⁷ n-grams at fpp 3%) serializes to ~9 MB — small enough to
    * embed as a literal in every task, unlike the exploded hash set. */
  def benchNgramBloom(bench: DataFrame, benchTextCol: String, n: Int = 13,
      expectedItems: Long = 1L << 20, fpp: Double = 0.03): Array[Byte] = {
    val bf = bench
      .select(explode(shingleHashes(col(benchTextCol), n)).as("shk"))
      .distinct()
      .stat.bloomFilter("shk", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bloom, hash)` as a codegen'd Catalyst predicate —
    * Spark's own runtime-row-filter expression, fed a prebuilt sketch. */
  private def mightContain(bloom: Array[Byte], v: Column): Column = {
    import org.apache.spark.sql.graftinterop.ColumnInterop
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    ColumnInterop.column(BloomFilterMightContain(
      ColumnInterop.expression(lit(bloom)), ColumnInterop.expression(v)))
  }

  /** TRUE iff any of the document's n-gram hashes might be in the bloom —
    * a map-side, zero-shuffle candidate test (superset of the truly
    * contaminated docs, never a miss: blooms have no false negatives). */
  def bloomCandidate(textCol: Column, bloom: Array[Byte], n: Int = 13): Column =
    exists(shingleHashes(textCol, n), x => mightContain(bloom, x))

  /** Bloom-prefiltered EXACT decontamination — output is identical to
    * [[decontaminate]] (the bloom only prunes; survivors of the prefilter
    * are confirmed by the exact shared-n-gram join), but the expensive
    * explode-and-join runs over the candidate docs ONLY.
    *
    * Scale shape: at 100 TB the corpus-side explode of [[decontaminate]]
    * is the dominant cost (every doc × every n-gram through a shuffle).
    * Here the corpus is scanned once with a codegen'd bloom probe — no
    * explode, no shuffle — and only the candidate sliver (contamination
    * rate + fpp) pays the exact-verification join. The bloom build itself
    * is one pass over the (small) benchmark side. */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      minShared: Long = 1, expectedItems: Long = 1L << 20,
      fpp: Double = 0.03): DataFrame = {
    val bloom = benchNgramBloom(bench, benchTextCol, n, expectedItems, fpp)
    val candidates = corpus.filter(bloomCandidate(col(textCol), bloom, n))
    val flagged = sharedNgrams(candidates, idCol, textCol, bench,
        benchTextCol, n, broadcastBench = true)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
