package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines (BASELINE.json
  * north star; beyond the reference's `unique`, littletable.py:3773-3795).
  *
  * Scale design:
  *   - exact dedup: one shuffle on the fingerprint;
  *   - MinHash+LSH / SimHash: candidate generation is banding (equal-band
  *     join), never an all-pairs product — the only O(n²) work is within a
  *     bucket, which banding keeps tiny;
  *   - n-gram Jaccard: pairs restricted to docs sharing ≥1 shingle
  *     (inverted-index join) — exact, for verification of the approximate
  *     paths at modest scale;
  *   - embedding cosine: blocked all-pairs for exactness at test scale,
  *     LSH-bucketed variant (random hyperplanes) as the 100 TB path.
  *
  * All hash mixing is deterministic (no Math.random / session seeds), so
  * results are reproducible across runs and engines.
  */
object Dedup {

  /** Exact dedup on a fingerprint, keeping the first row per key in
    * `order` — distributed-deterministic (per-key row_number). */
  def exact(df: DataFrame, key: Column, order: Seq[Column], keyName: String = "fp"): DataFrame =
    df.withColumn(keyName, key)
      .withColumn("__rn", row_number().over(Window.partitionBy(col(keyName)).orderBy(order: _*)))
      .filter(col("__rn") === 1).drop("__rn")

  /** INCREMENTAL ingest dedup: drop every `incoming` row whose
    * normalized content already exists in the `existing` corpus — the
    * daily-crawl gate that keeps re-crawls and mirrors out of a corpus
    * that was already deduplicated (exact tier; chain the MinHash/LSH
    * machinery below for the near-dup tier). Normalization is
    * lower+trim+whitespace-collapse so trivial re-serializations still
    * match; set `normalize = false` for byte-exact keys.
    *
    * Scale shape: the existing corpus collapses to DISTINCT fixed-width
    * md5 keys map-side (partial aggregation — the 100 TB corpus never
    * moves, only its key set), then one LEFT ANTI equi-join keyed on the
    * digest; AQE broadcasts the smaller side (a day's crawl vs the
    * corpus, or the key set when it fits) and skew-splits otherwise.
    * Incoming row identity, order, and columns pass through untouched. */
  def dedupAgainst(incoming: DataFrame, existing: DataFrame,
      textCol: String, normalize: Boolean = true): DataFrame = {
    val seen = existing.select(contentKey(col(textCol), normalize).as("__fp"))
      .distinct()
    incoming.withColumn("__fp", contentKey(col(textCol), normalize))
      .join(seen, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** The fixed-width content digest the ingest gates key on: md5 of the
    * lower/trim/whitespace-collapsed text (or the raw bytes with
    * `normalize = false`). Shared by [[dedupAgainst]] and the streaming
    * flavor so batch backfill and live ingest agree on identity. */
  def contentKey(c: Column, normalize: Boolean = true): Column =
    md5((if (normalize) regexp_replace(lower(trim(c)), "\\s+", " ")
      else c).cast("binary"))

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Driver-side splitmix64 step (Steele et al., "Fast Splittable PRNGs",
    * OOPSLA'14) — used only to derive the permutation constants. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signatures: `numHashes` independent bijective mixes
    * (splitmix64 finalizer, per-permutation seed) of the full 64-bit
    * shingle hash, min per doc. NOT a bounded-coefficient affine family:
    * `(a·h+b) mod p` with small a is near-monotonic over the input
    * range, which collapses every permutation's min onto the same
    * globally-small hashes and silently destroys the Jaccard estimate —
    * the sf0.1 recall gate caught exactly that (0/64 signature agreement
    * at Jaccard 0.99). The mixing runs in a static JVM helper where
    * 64-bit wraparound is well-defined (ANSI mode governs SQL
    * arithmetic, not helper code).
    *
    * Entirely map-side, one narrow codegen'd projection — no explode, no
    * dedup shuffle, no groupBy (see TextHashExpressions: shingle hashing
    * and the permutation-mins run as tight JVM loops; the
    * interpreted-lambda HOF formulation was ~50 µs/element). Docs with no
    * shingles are dropped (as before, when they had no exploded rows). */
  def minhashSignature(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64): DataFrame = {
    val seeds = Array.tabulate(numHashes)(i => splitmix64(i.toLong))
    import graft.functions.TextHashExpressions.{minhash_signature, shingle_hash_set}
    graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol), TextAnalysis.words(col(textCol)).as("__ws"))
      .select(col(idCol), shingle_hash_set(col("__ws"), shingleN).as("__shks"))
      .filter(size(col("__shks")) > 0)
      .select(col(idCol), minhash_signature(col("__shks"), seeds).as("sig"))
  }

  /** LSH band-collision candidate pairs only (no Jaccard estimate): the
    * cheapest candidate generator, for callers that verify candidates
    * some other way (e.g. the recall gate's exact-pair semi-join, or a
    * downstream exact intersection). One banding explode + one equi-join. */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // signature build is map-side codegen — recompute per use rather
    // than pinning a session-lifetime cache with no release handle
    val sig = minhashSignature(df, idCol, textCol, shingleN, numHashes)
    minhashCandidatesFromSig(sig, idCol, numHashes, bands)
  }

  /** Banding candidate join over an ALREADY-BUILT signature frame
    * (`id`, `sig: array<long>[numHashes]`) — shared by
    * [[minhashCandidates]] and [[minhashLSH]] so callers that also need
    * the signatures build them exactly once. */
  private def minhashCandidatesFromSig(sig: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val banded = sig.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // alias self-join → single Exchange + ReusedExchange
    banded.alias("a").join(banded.alias("b"), Seq("band", "bucket"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** LSH candidate pairs: split the signature into `bands`, bucket-join on
    * (band index, band hash), emit distinct candidate pairs with the
    * signature-estimated Jaccard. Banding keeps the join key-equal — the
    * classic shuffle-friendly near-dup plan (Leskovec et al., MMDS ch.3). */
  def minhashLSH(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // ONE signature build feeds both banding and the Jaccard estimate —
    // and because the candidate frame and both estimate sides are the
    // same subtree, Spark plans one Exchange + ReusedExchanges
    val sig = minhashSignature(df, idCol, textCol, shingleN, numHashes)
    val cands = minhashCandidatesFromSig(sig, idCol, numHashes, bands)
    // estimate Jaccard from full signatures
    val sa = sig.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val sb = sig.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes.toDouble))
      .select("id_a", "id_b", "est_jaccard")
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word tokens: per-bit majority of token hashes
    * (duplicates counted; ties → 0). Entirely map-side, one codegen'd
    * expression per row — no explode/groupBy shuffle (see
    * [[graft.functions.SimHash64]]). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextHashExpressions.simhash64
    graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol), simhash64(TextAnalysis.words(col(textCol))).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidates
    * via chunk banding: the 64-bit hash splits into 64/chunkBits chunks,
    * and any pair within distance nChunks−1 shares ≥1 exact chunk by
    * pigeonhole. chunkBits trades recall radius against candidate
    * volume: 16-bit chunks (4 bands) guarantee dist ≤ 3 with tiny
    * buckets — the 100 TB default; 8-bit chunks (8 bands) reach dist ≤ 7
    * at ~2^8-sized value space per band, acceptable at moderate scale or
    * after a coarser pre-filter. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3,
      chunkBits: Int = 16): DataFrame = {
    require(Set(8, 16, 32).contains(chunkBits), "chunkBits must be 8, 16 or 32")
    val nChunks = 64 / chunkBits
    // banding guarantees candidate recall only for distance <= nChunks-1
    // (pigeonhole); a larger maxDist would silently miss pairs
    require(maxDist >= 0 && maxDist <= nChunks - 1,
      s"$nChunks x $chunkBits-bit chunk banding supports maxDist <= ${nChunks - 1}")
    // simhash is one narrow codegen'd projection — recompute per use
    // rather than pinning a cache with no release handle
    val sh = simhash(df, idCol, textCol)
    val mask = (1L << chunkBits) - 1
    val chunked = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until nChunks).map(i =>
        shiftrightunsigned(col("simhash"), i * chunkBits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    // alias self-join → single Exchange + ReusedExchange (see
    // jaccardPairsFromIndex); the per-row distance filter runs BEFORE
    // the pair dedup so the distinct's shuffle only carries survivors
    chunked.alias("a").join(chunked.alias("b"), Seq("chunk", "ck"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  // ------------------------------------------------------------------
  // Exact n-gram Jaccard (verification-grade)
  // ------------------------------------------------------------------

  /** Exploded per-doc distinct shingle-hash index (id, set size, hash) —
    * shared by the pair and removal operators. Built map-side
    * ([[graft.functions.ShingleHashSet]], codegen'd — no dedup shuffle,
    * no shingle strings), with each exploded row carrying its doc's set
    * size so the Jaccard denominator needs no separate sizes aggregation
    * or re-joins. */
  private def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    import graft.functions.TextHashExpressions.shingle_hash_set
    graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol).as("id"), TextAnalysis.words(col(textCol)).as("__ws"))
      .select(col("id"), shingle_hash_set(col("__ws"), n).as("shks"))
      .select(col("id"), size(col("shks")).as("n_sh"), explode(col("shks")).as("shk"))
  }

  private def jaccardPairsFromIndex(shSet: DataFrame, minJaccard: Double): DataFrame =
    // alias-style self-join (rename AFTER the join): both sides are the
    // IDENTICAL subtree, so Spark plans one Exchange + ReusedExchange —
    // the index is scanned, hashed and shuffled once, not twice
    shSet.alias("a").join(shSet.alias("b"), "shk")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id"), col("b.id"), col("a.n_sh"), col("b.n_sh"))
      .agg(count(lit(1)).as("inter"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("inter").cast("double") /
          (col("a.n_sh") + col("b.n_sh") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** Exact word-n-gram Jaccard over pairs sharing at least one shingle
    * (inverted-index self-join — no cartesian product). Two shuffles:
    * the self-join on the shingle hash and the per-pair intersection
    * count. The index is recomputed for each join side rather than
    * cached: the build is one narrow codegen'd projection, and pinning
    * the exploded index (larger than the corpus) in executor storage is
    * the wrong default at scale. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame =
    jaccardPairsFromIndex(shingleIndex(df, idCol, textCol, n), minJaccard)

  /** Exact n-gram Jaccard with PREFIX FILTERING (PPJoin-style, Xiao et
    * al., WWW'08) — identical output to [[ngramJaccardPairs]], built for
    * scale:
    *
    *   - each doc's shingle-hash set is sorted canonically (by hash) and
    *     only its first `|S| − ⌈t·|S|⌉ + 1` shingles join: two sets with
    *     Jaccard ≥ t MUST share a shingle within both prefixes
    *     (pigeonhole on the overlap bound `|A∩B| ≥ t·max(|A|,|B|)`), so
    *     candidate generation is exact;
    *   - a length filter (`t·|A| ≤ |B| ≤ |A|/t`) prunes cross-size pairs
    *     in the same join;
    *   - survivors verify by full-index intersection count.
    *
    * At t=0.8 the joining index shrinks to ~20% of the full explode and
    * the candidate-pair volume drops ~quadratically — this is the path
    * that keeps an exact threshold join feasible when the full
    * inverted-index self-join would dominate the job. One extra shuffle
    * vs the naive plan; wins whenever candidates ≪ all-sharing-pairs. */
  def ngramJaccardPairsPrefix(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0, "minJaccard must be in (0, 1]")
    import graft.functions.TextHashExpressions.shingle_hash_set
    val t = minJaccard
    val sets = graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol).as("id"), TextAnalysis.words(col(textCol)).as("__ws"))
      .select(col("id"), sort_array(shingle_hash_set(col("__ws"), n)).as("sorted"))
      .select(col("id"), size(col("sorted")).as("n_sh"), col("sorted"))
      .filter(col("n_sh") > 0)
    // ceil over DOUBLE arithmetic can round t·|S| up one ulp when the
    // real product is an exact integer (e.g. t=0.9, |S|=10k), silently
    // shortening the prefix / tightening the length filter and dropping
    // a pair whose Jaccard is exactly t. Nudge below the real value
    // before ceil — sizes are integers, so 1e-9 can never admit an
    // illegal pair, only restore the exact-boundary ones.
    val prefixLen =
      (col("n_sh") - ceil(col("n_sh") * t - lit(1e-9)) + 1).cast("int")
    val prefix = sets.select(col("id"), col("n_sh"),
      explode(slice(col("sorted"), lit(1), prefixLen)).as("shk"))
    // alias self-join → single Exchange + ReusedExchange
    val cands = prefix.alias("a").join(prefix.alias("b"), "shk")
      .filter(col("a.id") < col("b.id") &&
        // length filter: j >= t forces t·na <= nb (and symmetrically);
        // direct epsilon-guarded comparison, no ceil needed for a prune
        col("b.n_sh") >= col("a.n_sh") * t - lit(1e-9) &&
        col("a.n_sh") >= col("b.n_sh") * t - lit(1e-9))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    // Exact verification over CANDIDATE DOCS ONLY: semi-prune the full
    // index to ids that appear in any candidate pair, alias-self-join on
    // the shingle (one Exchange + ReusedExchange, like
    // jaccardPairsFromIndex), then keep candidate pairs. The full-corpus
    // tokenize/hash thus runs once (the prefix pass); the verification
    // recomputes it only for the (tiny) candidate subset.
    val candIds = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id"))).distinct()
    val idxC = sets.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), col("n_sh"), explode(col("sorted")).as("shk"))
    idxC.alias("a").join(idxC.alias("b"), "shk")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id"), col("b.id"), col("a.n_sh"), col("b.n_sh"))
      .agg(count(lit(1)).as("inter"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("inter").cast("double") /
          (col("a.n_sh") + col("b.n_sh") - col("inter")).cast("double")).as("jaccard"))
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .filter(col("jaccard") >= t)
  }

  /** End-to-end near-duplicate REMOVAL with the **anchor policy**: a doc
    * is dropped iff it pairs (at >= minJaccard) with ANY lower-id doc —
    * kept docs are exactly those with no lower-id near-duplicate, so a
    * duplicate chain 1~2~3 (with 1≁3) keeps only doc 1. This is NOT the
    * sequential greedy sweep (which would re-keep 3 after dropping 2):
    * the anchor policy is order-deterministic and one-pass-parallel,
    * while sequential greedy is inherently iterative. One anti-join over
    * the candidate pairs; the drop set is materialized eagerly
    * (localCheckpoint) so the shingle-index cache can be released before
    * returning. */
  def removeNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      prefixFilter: Option[Boolean] = None): DataFrame = {
    // Auto-select the pair plan by threshold (override with Some(_)):
    // prefix filtering pays when the prefix is short — measured crossover
    // ~t=0.75 on the documents corpus (t=0.9: 2× faster; t=0.5: slower,
    // the prefix is half the set and the extra shuffle dominates). The
    // gap widens with scale: candidate volume is ~quadratic in the
    // joining index size.
    val usePrefix = prefixFilter.getOrElse(minJaccard >= 0.75)
    val pairs =
      if (usePrefix) ngramJaccardPairsPrefix(df, idCol, textCol, n, minJaccard)
      else jaccardPairsFromIndex(shingleIndex(df, idCol, textCol, n), minJaccard)
    // materialize the (tiny) drop set eagerly so no lineage over the
    // candidate join survives into the caller's plan
    val drop = pairs.select(col("id_b").as(idCol)).distinct()
      .localCheckpoint(true)
    df.join(drop, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------------
  // Connected-component duplicate clustering
  // ------------------------------------------------------------------

  /** Connected components over an undirected pair graph (`id_a`, `id_b`):
    * returns (`id`, `comp`) with `comp` = the smallest id reachable from
    * `id`. Iterative distributed min-label propagation: each round joins
    * the symmetrized edge list against current labels, takes the min
    * neighbor label per vertex, and stops when no label changed — the
    * standard MapReduce-style CC (cf. Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14; plain propagation
    * converges in graph-diameter rounds, which for near-dup clusters is
    * small). Each round is two equi-join shuffles over the EDGE list
    * only — never the corpus — and the label frame is eagerly
    * checkpointed so lineage stays flat across iterations.
    *
    * High-diameter safety: from the third round on, each round ALSO
    * pointer-jumps the label one hop (`next := next(next)`, the classic
    * path-doubling step), so a duplicate CHAIN of diameter D — templated
    * boilerplate crawl text is the realistic producer — converges in
    * O(log D) rounds instead of D. Shallow graphs (the common near-dup
    * case, diameter ≤ 3) converge before jumping starts and pay nothing.
    * Jumping preserves the invariant that a vertex's label is the id of
    * a smaller same-component vertex, so the fixed point is unchanged:
    * every vertex labeled with its component's minimum id.
    *
    * Ids must be non-null and orderable (numeric or string).
    *
    * Fault tolerance: by default each round pins its frame with
    * `localCheckpoint` — blocks live on executors, which is the fast
    * local-mode choice but means a lost executor mid-iteration kills the
    * job with no recovery (and the operator chains O(log D) rounds,
    * maximizing exposure). On a real cluster pass `checkpointDir` (an
    * HDFS/object-store path): rounds then use reliable `checkpoint()`,
    * so any executor can be lost and the iteration replays from durable
    * storage instead of dying.
    *
    * Reliable-checkpoint lifecycle: files go under a UNIQUE
    * `<checkpointDir>/cc-<uuid>/round-N` per run, and each round's
    * directory is deleted as soon as the next round has materialized —
    * storage held is ~2 rounds, not maxIter. The FINAL round's directory
    * backs the returned frame and stays until the caller is done with
    * the result (delete the `cc-<uuid>` root afterwards, or run with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`). Note
    * `SparkContext.setCheckpointDir` is context-global: this operator
    * restores any previously-set dir on exit — including exception
    * exits (non-convergence, mid-loop job failure) — but if none was
    * set it remains pointed at the run's last round directory on
    * success. Because the dir is context-global, do NOT run this
    * operator concurrently with other reliable-checkpoint users on the
    * same SparkContext: their files would land in round directories
    * this run later deletes. On an exception exit the run's entire
    * `cc-<uuid>` root is best-effort deleted (nothing from a failed run
    * is referenced). */
  /** Per-stage walls of the most recent [[connectedComponents]] run in
    * this JVM: `edgePinSec` = candidate-pair generation + edge-list
    * checkpoint (one action), `initSec` = label init, `roundsSec` = the
    * propagation loop. Diagnostic telemetry for scale harnesses — the
    * round-10 cc variance hunt attributed a 1.33× run-to-run spread to
    * the edge stage; this keeps that attribution pinned per run instead
    * of re-instrumenting at the next regression. */
  final case class CcStages(edgePinSec: Double, initSec: Double,
      roundsSec: Double, nRounds: Int) {
    def totalSec: Double = edgePinSec + initSec + roundsSec
  }
  @volatile private var lastCcStagesVar: Option[CcStages] = None
  def lastCcStages: Option[CcStages] = lastCcStagesVar

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val prevCkptDir = sc.getCheckpointDir
    val runRoot = checkpointDir.map(d => s"$d/cc-${java.util.UUID.randomUUID()}")
    var roundId = 0
    def setRoundDir(): Unit =
      runRoot.foreach(r => sc.setCheckpointDir(s"$r/round-$roundId"))
    // the localCheckpoint fallback needs the same per-round reclamation
    // the reliable-checkpoint path gets from dropRound's dir deletion:
    // Dataset.unpersist() is a no-op for checkpoint storage, so release
    // goes through CheckpointInterop on the recorded pins of that round
    val roundPins = scala.collection.mutable.Map.empty[Int, List[DataFrame]]
    def dropRound(id: Int): Unit = {
      runRoot.foreach { r =>
        val p = new org.apache.hadoop.fs.Path(s"$r/round-$id")
        val fs = p.getFileSystem(sc.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      roundPins.remove(id).foreach(_.foreach(
        org.apache.spark.sql.graftinterop.CheckpointInterop
          .unpersistLocalCheckpoint(_)))
    }
    setRoundDir()
    def pin(df: DataFrame): DataFrame =
      if (runRoot.isDefined) df.checkpoint(eager = true)
      else {
        val out = df.localCheckpoint(true)
        roundPins(roundId) = out :: roundPins.getOrElse(roundId, Nil)
        out
      }
    try {
      // Materialize the edge list ONCE: `pairs` is typically the whole
      // candidate-generation pipeline (shingle index self-join), and every
      // propagation round joins against it — without this checkpoint each
      // round would re-run that pipeline from the scan up.
      // Stage walls (edge pin = candidate-pair generation + checkpoint
      // write, evaluated in one action; init; propagation rounds) are
      // recorded on every run — nanoTime bookkeeping is free — and
      // published via [[lastCcStages]] so harnesses (ScaleSmoke) can pin
      // which stage a wall-time regression lives in from the log alone.
      val tEdge0 = System.nanoTime()
      val sym = pin(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
      val edgePinSec = (System.nanoTime() - tEdge0) / 1e9
      val tInit0 = System.nanoTime()
      var labels = pin(sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")))
      val initSec = (System.nanoTime() - tInit0) / 1e9
      var roundsSec = 0.0
      var it = 0
      var converged = false
      // opt-in per-round wall log (-Dgraft.cc.timing=1 or
      // GRAFT_CC_TIMING=1 — the env form survives sbt's forked run JVM):
      // the evidence that separates a shuffle-retry/straggler round (one
      // round's wall spikes) from uniform pressure like GC (every round
      // inflates) when a run's total diverges from its siblings
      val ccTiming = sys.props.contains("graft.cc.timing") ||
        sys.env.contains("GRAFT_CC_TIMING")
      while (!converged && it < maxIter) {
        val tRound = System.nanoTime()
        roundId += 1
        setRoundDir()
        val nbrMin = sym.join(labels, sym("dst") === labels("id"))
          .groupBy(col("src")).agg(min(col("comp")).as("nbr"))
        // one materialization per round: old + proposed label side by side,
        // so the convergence count is a cheap scan of the checkpoint
        val prop = pin(labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id"), col("comp"),
            least(col("comp"), coalesce(col("nbr"), col("comp"))).as("next")))
        val step =
          if (it < 2) prop
          else {
            // path doubling: labels are vertex ids, so chase one hop
            // through this round's own label table (checkpointed above —
            // the self-join reads the materialization, not the lineage)
            val ptr = prop.select(col("id").as("pid"), col("next").as("pnext"))
            pin(prop.join(ptr, prop("next") === ptr("pid"), "left")
              .select(prop("id"), prop("comp"),
                least(prop("next"), coalesce(col("pnext"), prop("next"))).as("next")))
          }
        converged = step.filter(col("next") < col("comp")).limit(1).count() == 0L
        labels = step.select(col("id"), col("next").as("comp"))
        // the PREVIOUS iteration's checkpoint is fully consumed once this
        // round materialized — reclaim it (round 0 holds `sym`, which every
        // round joins against; it is reclaimed after the loop)
        if (roundId >= 2) dropRound(roundId - 1)
        it += 1
        roundsSec += (System.nanoTime() - tRound) / 1e9
        if (ccTiming)
          System.err.println(
            f"[cc-timing] round=$it wall=${(System.nanoTime() - tRound) / 1e9}%.2fs converged=$converged")
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds " +
        "(pathological chain diameter — raise maxIter)")
      lastCcStagesVar = Some(CcStages(edgePinSec, initSec, roundsSec, it))
      if (ccTiming)
        System.err.println(
          f"[cc-timing] stages edge_pin=$edgePinSec%.2fs init=$initSec%.2fs " +
            f"rounds_total=$roundsSec%.2fs n_rounds=$it")
      // the result frame reads only the final round's materialization —
      // the edge list and init labels (round 0) are no longer referenced
      if (roundId >= 1) dropRound(0)
      labels
    } catch {
      case t: Throwable =>
        // nothing from a failed run is referenced — best-effort reclaim
        // of the whole run root so round dirs don't leak
        runRoot.foreach { r =>
          try {
              val p = new org.apache.hadoop.fs.Path(r)
              val fs = p.getFileSystem(sc.hadoopConfiguration)
              if (fs.exists(p)) fs.delete(p, true)
          } catch { case _: Throwable => () }
        }
        // ... and the localCheckpoint fallback's pins likewise: dropRound
        // never ran for the still-recorded rounds, and leaving them to
        // ContextCleaner re-opens the copies-per-failed-attempt leak on
        // a harness that retries after failures
        roundPins.values.flatten.foreach { df =>
          try org.apache.spark.sql.graftinterop.CheckpointInterop
            .unpersistLocalCheckpoint(df)
          catch { case _: Throwable => () }
        }
        roundPins.clear()
        throw t
    } finally {
      // context-global state must not outlive the call on ANY exit path
      prevCkptDir.foreach(sc.setCheckpointDir)
    }
  }

  /** Near-duplicate CLUSTER assignment: every doc gets `cluster_id` = the
    * smallest doc id in its connected component of the near-dup pair
    * graph (singletons cluster with themselves). Unlike the one-pass
    * anchor policy of [[removeNearDuplicates]] — which keeps any doc
    * with no lower-id direct pair, so a chain 1~2~3 (1≁3) keeps 1 AND
    * 3 — the cluster policy groups whole chains (keep-one-per-cluster
    * keeps only doc 1), matching the dedup stage of large corpus
    * pipelines where transitive duplicates collapse together. */
  def clusterNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5,
      prefixFilter: Option[Boolean] = None, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val usePrefix = prefixFilter.getOrElse(minJaccard >= 0.75)
    val pairs =
      if (usePrefix) ngramJaccardPairsPrefix(df, idCol, textCol, n, minJaccard)
      else jaccardPairsFromIndex(shingleIndex(df, idCol, textCol, n), minJaccard)
    val comps = connectedComponents(pairs.select("id_a", "id_b"), maxIter, checkpointDir)
    df.join(comps, df(idCol) === comps("id"), "left")
      .select(df.columns.map(df(_)) :+
        coalesce(col("comp"), df(idCol)).as("cluster_id"): _*)
  }

  /** Near-dup removal keeping the BEST representative per cluster (not
    * the lowest-id anchor): clusters via [[clusterNearDuplicates]], then
    * one keep per `cluster_id` chosen by `best` (e.g. highest quality
    * score, longest doc) — make it a total order by tie-breaking on the
    * id, or the pick is nondeterministic. This is the production policy
    * when duplicates differ in quality (boilerplate-stripped vs raw
    * crawls of the same page).
    *
    * Scale shape: adds ONE ranking window partitioned by cluster_id on
    * top of the clustering — a shuffle on cluster_id with per-group
    * top-1, no global sort. Cluster sizes are small by construction
    * (they are near-dup sets), so no skew hazard. */
  def dedupClustersKeepBest(
      df: DataFrame, idCol: String, textCol: String,
      best: Seq[org.apache.spark.sql.Column],
      n: Int = 3, minJaccard: Double = 0.5,
      prefixFilter: Option[Boolean] = None, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    require(best.nonEmpty, "need a 'best' ordering")
    import org.apache.spark.sql.expressions.Window
    val clustered = clusterNearDuplicates(
      df, idCol, textCol, n, minJaccard, prefixFilter, maxIter, checkpointDir)
    val w = Window.partitionBy(col("cluster_id")).orderBy(best: _*)
    clustered
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "cluster_id")
  }

  // ------------------------------------------------------------------
  // Embedding-cosine near-dup
  // ------------------------------------------------------------------

  /** Exact cosine near-dup pairs above a threshold. All-pairs within the
    * table — verification-grade; use [[Similarity.lshBuckets]] banding for
    * the 100 TB path. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val withNorm = graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol), col(vecCol))
      .withColumn("norm", vec_norm(col(vecCol)))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("norm").as("norm_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("norm").as("norm_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", vec_dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** SEMANTIC near-dup candidate pairs, SemDeDup-shaped (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): spherical k-means over the embeddings,
    * then exact cosine only WITHIN a cell — candidate volume is
    * sum-of-squared-cell-sizes, never corpus all-pairs, which is what
    * makes embedding dedup feasible at 100 TB. Each vector carries its
    * top-`probes` cells ([[graft.functions.TopCentroids]], codegen'd
    * map-side assignment), so a pair straddling a Voronoi boundary still
    * shares a cell — single-assignment is where naive SemDeDup quietly
    * loses recall. A pair sharing several cells computes bit-identical
    * cosines in each, so the final `distinct` collapses it to one row.
    *
    * Clustering is deterministic ([[Similarity.ivfIndex]]: hash-ordered
    * init, fixed iterations), so the candidate set is reproducible run
    * to run — required for the oracle gate. Cosine uses the same
    * [[graft.functions.VectorExpressions.vec_dot]] arithmetic as
    * [[embeddingCosinePairs]], so candidate and exact scores agree
    * bit-for-bit at the threshold boundary. */
  def semanticPairs(df0: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCentroids: Int = 16, probes: Int = 2,
      iters: Int = 3): DataFrame = {
    import graft.functions.VectorExpressions.{top_centroids_cos, vec_dot, vec_norm}
    require(probes >= 1 && probes <= nCentroids, "need 1 <= probes <= nCentroids")
    val df = df0.filter(col(vecCol).isNotNull)
    val centroids = Similarity.ivfIndex(df, idCol, vecCol, nCentroids, iters).centroids
    // ensureParallelism on the ASSIGNMENT pass only (k-means above keeps
    // its measured single-split economics): top-k-centroid scoring is
    // probes×centroids dot products per row, and an unsplittable
    // one-partition scan serializes it on one core — measured as a
    // 0.86 s single-task stage at the bench SF, twice (both join sides).
    val cells = graft.core.Partitions.ensureParallelism(df)
      .select(col(idCol), col(vecCol), vec_norm(col(vecCol)).as("__n"),
        explode(top_centroids_cos(col(vecCol), centroids, probes)).as("__cell"))
    val a = cells.select(col("__cell"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = cells.select(col("__cell"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__cell")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        vec_dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }

  /** Semantic near-dup REMOVAL: drop every vector with a semantic pair
    * to a lower id (the same one-pass anchor policy as
    * [[removeNearDuplicates]] — order-deterministic, one anti-join).
    * The drop set is tiny (ids only) and eagerly materialized so the
    * clustering pipeline doesn't survive into the caller's lineage. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCentroids: Int = 16, probes: Int = 2,
      iters: Int = 3): DataFrame = {
    val drop = semanticPairs(df, idCol, vecCol, threshold, nCentroids, probes, iters)
      .select(col("id_b").as(idCol)).distinct()
      .localCheckpoint(true)
    df.join(drop, Seq(idCol), "left_anti")
  }
}
