package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GTable

/** Corpus mixing for training-data assembly (beyond the reference —
  * BASELINE.json north-star territory): combine N sources into one
  * stream realizing requested mixture WEIGHTS at a requested SIZE,
  * deterministic under a seed, with oversampling (epochs > 1) when a
  * high-weight source is small.
  *
  * Scale shape: one `count()` per source (metadata-cheap on parquet),
  * then a single map-side pass per source — replication is
  * `explode(sequence(...))`, the fractional remainder a CONTENT-HASHED
  * Bernoulli filter (`xxhash64(seed, row) → [0,1)`), so selection
  * depends only on row values + seed, never on partition layout; no
  * shuffle at all until the caller repartitions/shuffles the mixed
  * stream (recommended: a final `shuffle(seed)` or `repartition` so
  * sources interleave rather than concatenate).
  */
object Mix {

  /** Mix `sources` (table, weight) to ~`targetRows` total rows with the
    * given mixture proportions. Weights are normalized; a `sourceCol`
    * column tags provenance. Per-source rate = targetRows·wᵢ/nᵢ; rates
    * above 1 replicate whole epochs + a Bernoulli remainder — standard
    * multi-epoch upsampling of small high-value corpora. Deterministic
    * UNCONDITIONALLY under a seed: the remainder coin is a content hash
    * of the row (per-source-salted xxhash64), so a repartitioned or
    * differently-split source still selects the same rows (identical
    * duplicate rows share one coin — fine for a sampling remainder). */
  def weightedMix(sources: Seq[(GTable, Double)], targetRows: Long,
      seed: Long = 42L, sourceCol: String = "source"): GTable = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._2 > 0), "weights must be positive")
    require(targetRows > 0, "targetRows must be positive")
    val wSum = sources.map(_._2).sum
    mixImpl(sources, wSum, targetRows, seed, sourceCol)
  }

  /** TEMPERATURE mixing (T5/PaLM-style multinomial reweighting): source
    * i's mixture weight is `nᵢ^alpha` — `alpha = 1` reproduces
    * proportional-to-size sampling, `alpha → 0` the uniform mixture, and
    * the usual `alpha ∈ (0, 1)` upweights small high-value corpora
    * relative to their size without hand-tuning per-source weights.
    * Selection semantics (epochs + content-hashed Bernoulli remainder,
    * determinism under a seed) are [[weightedMix]]'s.
    *
    * Returns the mixed table plus the driver-side per-source plan
    * `(name, rows, weight, rate)` so callers can log/verify the realized
    * mixture against intent. */
  def temperatureMix(sources: Seq[GTable], alpha: Double, targetRows: Long,
      seed: Long = 42L, sourceCol: String = "source",
      knownCounts: Option[Seq[Long]] = None)
      : (GTable, Seq[(String, Long, Double, Double)]) = {
    require(sources.nonEmpty, "need at least one source")
    require(alpha > 0, "alpha must be positive (1 = proportional sampling)")
    require(targetRows > 0, "targetRows must be positive")
    require(knownCounts.forall(_.size == sources.size),
      "knownCounts must align 1:1 with sources")
    val counts = knownCounts.getOrElse(sources.map(_.df.count()))
    val weighted = sources.zip(counts.map(n => math.pow(n.toDouble, alpha)))
    val wSum = weighted.map(_._2).sum
    val plan = sources.zip(counts).zip(weighted.map(_._2)).zipWithIndex.map {
      case (((t, n), w), i) =>
        val name = if (t.name.isEmpty) s"source_$i" else t.name
        (name, n, w, targetRows * (w / wSum) / n)
    }
    (mixImpl(weighted, wSum, targetRows, seed, sourceCol, Some(counts)), plan)
  }

  /** Shared mixing core; `knownCounts` avoids re-counting sources whose
    * sizes the caller already materialized (temperatureMix needs them to
    * form the weights). */
  private def mixImpl(sources: Seq[(GTable, Double)], wSum: Double,
      targetRows: Long, seed: Long, sourceCol: String,
      knownCounts: Option[Seq[Long]] = None): GTable = {
    val parts: Seq[DataFrame] = sources.zipWithIndex.map { case ((t, w), i) =>
      val n = knownCounts.map(_(i)).getOrElse(t.df.count())
      require(n > 0, s"source $i (${t.name}) is empty")
      val rate = targetRows * (w / wSum) / n
      val epochs = math.floor(rate).toLong
      val frac = rate - epochs
      val tagged = t.df.withColumn(sourceCol, lit(t.name match {
        case "" => s"source_$i"
        case nm => nm
      }))
      // whole epochs: exact replication; remainder: seeded Bernoulli.
      // Epoch id keeps replicated rows distinct for downstream shuffles.
      val whole =
        if (epochs == 0) None
        else Some(tagged.withColumn("__epoch",
          explode(sequence(lit(0L), lit(epochs - 1)))))
      val rem =
        if (frac == 0.0) None
        else {
          // content-derived uniform in [0,1): hash every column of the
          // row with a per-source seed salt — partition-layout-free
          // (ADVICE r2), same shape ivfIndex uses for assignment
          val coin = pmod(xxhash64(lit(seed + i) +: t.df.columns.map(col): _*),
            lit(1L << 52)).cast("double") / lit((1L << 52).toDouble)
          Some(tagged.filter(coin < frac).withColumn("__epoch", lit(epochs)))
        }
      (whole, rem) match {
        case (Some(a), Some(b)) => a.unionByName(b)
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None) => tagged.limit(0).withColumn("__epoch", lit(0L))
      }
    }
    // heterogeneous sources null-fill missing columns — reuse
    // GTable.union's bag-union semantics rather than re-implementing them
    val mixed = parts.map(GTable(_)).reduce(_ union _)
    GTable(mixed.df.drop("__epoch"), "mixed")
  }
}
