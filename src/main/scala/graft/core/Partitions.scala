package graft.core

import org.apache.spark.sql.DataFrame

/** Partition-layout guards for heavy map-side pipelines. */
object Partitions {

  /** Ensure an input frame has at least `defaultParallelism` partitions
    * before CPU-heavy per-row work (tokenize / shingle-hash / vector
    * math).
    *
    * Why: a single small parquet file with one row group is unsplittable,
    * so a local scan arrives as ONE partition and everything downstream
    * of it — until the first shuffle — serializes on one core. On a real
    * cluster the input has far more partitions than cores and this guard
    * is the identity; it exists so the same operator code saturates a
    * local[32] box AND a 1000-executor cluster without the caller
    * thinking about file layout.
    *
    * The round-robin repartition shuffles the raw input once; callers
    * only use it where downstream per-row cost dominates that shuffle
    * (dedup signatures, search index builds, vector scans).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    // Streaming frames can't be probed (`.rdd` throws AnalysisException)
    // and don't need to be: a streaming stateful op repartitions at its
    // own shuffle, and micro-batch sources size their splits per trigger.
    if (df.isStreaming) return df
    // Probing costs one physical-planning pass (no job runs); that price
    // is paid only on the batch operators that opted in because their
    // downstream per-row CPU work dwarfs it.
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
