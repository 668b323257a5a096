package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines
  * (beyond the reference — BASELINE.json north-star territory).
  *
  * Everything here keys off `md5(salt || key)` — a hash both Spark and
  * any ANSI engine compute bit-identically (unlike xxhash64/rand, which
  * are engine- or partition-layout-specific), so split assignments are
  * reproducible across engines, reruns, repartitions and backfills.
  * Comparisons happen on the lowercase-hex STRING (lexicographic ==
  * numeric for fixed-width hex), so no hex→int conversion is needed on
  * either side.
  *
  * Scale shape: [[hashSplit]] is pure map-side (no shuffle, no state —
  * a 100 TB corpus splits in one pass); [[stratifiedSample]] is one
  * shuffle on the strata keys + a per-stratum sort, the exact-n flavor;
  * at extreme per-stratum cardinality prefer the rate-based
  * [[hashSplit]] with per-stratum fractions (map-side) and accept ±3σ
  * counts.
  */
object Split {

  /** First 8 hex chars of md5(salt || key) — a uniform draw over 16^8
    * values, engine-portable. */
  def hashHex(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 8)

  /** 8-hex-digit threshold for a cumulative fraction: keys whose
    * [[hashHex]] sorts below `thresholdHex(f)` form an f-fraction. */
  private[graft] def thresholdHex(cum: Double): String =
    f"${math.min((cum * 4294967296L).toLong, 0xFFFFFFFFL)}%08x"

  /** Assign each row to a named split with the given fractions (e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`), deterministic
    * in `salt` and the KEY — pass a group key (URL host, document
    * cluster id, …) rather than the row id when leakage across splits
    * must be impossible: equal keys always land in the same split.
    * Fractions must sum to 1 (±1e-9); the last split takes the
    * remainder, so hash-range rounding (≤ 2⁻³²) never drops a row. */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
      salt: String = "graft", outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = hashHex(key, salt)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = splits.init.zip(cums).foldRight(lit(splits.last._1)) {
      case (((name, _), cum), acc) =>
        when(h < lit(thresholdHex(cum)), lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, assign)
  }

  /** Keep a deterministic `frac` sample: the hash-range filter flavor of
    * [[hashSplit]] (map-side, engine-portable, leakage-safe under the
    * same key discipline). */
  def hashSample(df: DataFrame, key: Column, frac: Double,
      salt: String = "graft"): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    df.filter(hashHex(key, salt) < lit(thresholdHex(frac)))
  }

  /** EXACTLY `nPerStratum` rows per stratum (fewer if the stratum is
    * smaller), chosen deterministically: rows rank by (md5 hash, key)
    * within their stratum — a seeded shuffle order with a total
    * tiebreak, so the pick is stable under any partitioning. One
    * shuffle on the strata; each stratum sorts within its partition. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], key: Column,
      nPerStratum: Int, salt: String = "graft"): DataFrame = {
    require(strata.nonEmpty, "need at least one stratum column")
    require(nPerStratum > 0, "nPerStratum must be positive")
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(strata.map(col): _*)
          .orderBy(hashHex(key, salt), key)))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement, k of n (Efraimidis &
    * Spirakis 2006, "A-Res"): each row draws a deterministic uniform
    * `u ∈ (0,1)` from md5(salt‖key), scores `ln(u)/w`, and the k LARGEST
    * scores win — provably the same distribution as drawing k rows one
    * at a time with probability ∝ weight, but embarrassingly parallel.
    * This is the standard resampling step downstream of an importance
    * score ([[graft.operators.Curate.dsirScores]] micro-nats, quality
    * classifier logits → `exp`-ed weights): heavy-weight rows are
    * sampled preferentially yet every positive-weight row retains
    * nonzero probability, unlike a top-k cutoff.
    *
    * Determinism contract: `u = (toInt(md5₈) + 0.5)/2³²` — never 0 or 1,
    * identical on any engine; the double `ln(u)/w` is used only to ORDER
    * (house rule: floats order, integers are compared), with `key` as
    * the total tie-break. Rows with `weight ≤ 0` or null are excluded
    * (zero-weight rows can never win a ∝-weight draw).
    *
    * Scale shape: the score is pure map-side arithmetic on top of the
    * scan; top-k is TakeOrderedAndProject (per-partition heaps + one
    * k-row driver merge — NO global sort, NO full shuffle); the rank
    * window runs AFTER `.limit(k)`, so its single partition holds
    * exactly k rows, never the corpus. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "graft", rankCol: String = "sample_rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(hashHex(key, salt), 16, 10).cast("long").cast("double") +
      0.5) / lit(4294967296.0)
    val top = df.filter(weight.isNotNull && weight.cast("double") > 0)
      .withColumn("__wkey", log(u) / weight.cast("double"))
      .orderBy(col("__wkey").desc, key.asc)
      .limit(k)
    val w = Window.orderBy(col("__wkey").desc, key.asc)
    top.withColumn(rankCol, row_number().over(w)).drop("__wkey")
  }

  /** Balanced training-shard assignment: rows rank corpus-wide by
    * (`sizeCol` desc, `idCol` asc) and shard `(rank − 1) mod nShards` —
    * longest-first round-robin, the streaming cousin of LPT scheduling
    * (each of the `nShards` bins receives one row per size-sorted round,
    * so per-shard size sums differ by at most one round's spread). The
    * assignment is a pure function of row VALUES — stable across reruns,
    * engines, and physical layout — which is what makes shards
    * resumable/addressable in a training job.
    *
    * The global rank is [[graft.core.Ordinals.withOrdinal]]'s value-keyed
    * two-level prefix — NO single-partition window at any corpus size.
    * `(sizeCol, idCol)` must be a total order (idCol unique, both
    * non-null). */
  def shardBySize(df: DataFrame, idCol: String, sizeCol: String,
      nShards: Int, outCol: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    graft.core.Ordinals.withOrdinal(df,
        Seq(graft.core.SortKey(col(sizeCol), asc = false),
          graft.core.SortKey(col(idCol))), "__ord")
      .withColumn(outCol, ((col("__ord") - 1) % nShards).cast("int"))
      .drop("__ord")
  }
}
