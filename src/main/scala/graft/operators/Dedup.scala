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

  /** MinHash signatures: `numHashes` universal-hash permutations
    * `(aᵢ·h + bᵢ) mod p` over the 32-bit shingle hash, min per doc — one
    * explode + one groupBy, no per-hash passes. Constants bounded to 2^30
    * so `a·h + b` stays within a signed long: Spark 4 runs ANSI mode and
    * traps arithmetic overflow, so the mixing must genuinely not overflow
    * rather than relying on wraparound. */
  def minhashSignature(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64): DataFrame = {
    val P = (1L << 61) - 1 // Mersenne prime
    val sh = df
      .select(col(idCol), explode(TextAnalysis.shingles(col(textCol), shingleN)).as("shingle"))
      .distinct()
      .withColumn("h32", xxhash64(col("shingle")).bitwiseAND(lit(0xFFFFFFFFL)))
    val mins: Seq[Column] = (0 until numHashes).map { i =>
      val a = (splitmix64(2L * i) & 0x3FFFFFFFL) | 1L
      val b = splitmix64(2L * i + 1) & 0x3FFFFFFFL
      min(pmod(lit(a) * col("h32") + lit(b), lit(P))).as(s"mh_$i")
    }
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: split the signature into `bands`, bucket-join on
    * (band index, band hash), emit distinct candidate pairs with the
    * signature-estimated Jaccard. Banding keeps the join key-equal — the
    * classic shuffle-friendly near-dup plan (Leskovec et al., MMDS ch.3). */
  def minhashLSH(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(df, idCol, textCol, shingleN, numHashes).cache()
    val banded = sig.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    val cands = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
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

  /** 64-bit SimHash over word tokens: per-bit majority of token hashes.
    * Computed columnar: explode tokens, per-doc sum of each bit's ±1,
    * reassemble the fingerprint. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(TextAnalysis.words(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when((shiftright(col("h"), i) % 2) =!= 0, 1).otherwise(-1)).as(s"b_$i")
    }
    toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i => when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidates
    * via 4×16-bit chunk banding (any pair within distance 3 shares ≥1
    * exact chunk by pigeonhole). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol).cache()
    val chunked = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    val a = chunked.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("chunk"), col("ck"))
    val b = chunked.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("chunk"), col("ck"))
    a.join(b, Seq("chunk", "ck")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------------------------
  // Exact n-gram Jaccard (verification-grade)
  // ------------------------------------------------------------------

  /** Exact word-n-gram Jaccard over pairs sharing at least one shingle
    * (inverted-index join — no cartesian product). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(TextAnalysis.shingles(col(textCol), n)).as("shingle"))
      .distinct().cache()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    // Hash the shingle once so the fat string isn't the shuffle/join key.
    val shk = sh.select(col("id"), xxhash64(col("shingle")).as("shk"))
    val inter = shk.select(col("id").as("id_a"), col("shk"))
      .join(shk.select(col("id").as("id_b"), col("shk")), "shk")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
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
    val withNorm = df.select(col(idCol), col(vecCol))
      .withColumn("norm", vec_norm(col(vecCol)))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("norm").as("norm_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("norm").as("norm_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", vec_dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
  }
}
