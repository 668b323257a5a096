package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Batch ANN serves (one plan for a query workload) must return exactly
  * the per-query loop's results — candidate selection is shared code
  * (probeCells / queryCode / adcLut), so ids and ranks must match per
  * query, not just recall. */
class BatchAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  /** The 3-query workload every batch gate uses: vec_id 0-2, qid = vec_id+1. */
  private lazy val queries: DataFrame = emb.filter(col("vec_id") <= 2)
    .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))

  private lazy val qvecs: Seq[(Int, Seq[Double])] =
    emb.filter(col("vec_id") <= 2).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt + 1, r.getSeq[Float](1).map(_.toDouble)))
      .toSeq

  private def tuples(batch: DataFrame): Seq[(Int, Long, Int)] =
    batch.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(3))).toSeq.sorted

  private def loopTuples(perQuery: (Int, Seq[Double]) => DataFrame): Seq[(Int, Long, Int)] =
    qvecs.flatMap { case (qid, qv) =>
      perQuery(qid, qv).collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), i + 1) }
    }.sorted

  test("ivfTopKBatch == per-query ivfTopK loop (ids and ranks)") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 2)
    val batch = tuples(Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
      queries, "qid", "embedding", k = 10, nProbe = 4))
    val loop = loopTuples((_, qv) =>
      Similarity.ivfTopK(idx, "vec_id", "embedding", qv, 10, nProbe = 4))
    assert(batch.nonEmpty && batch == loop)
  }

  test("lshTopKMultiBatch == per-query lshTopKMulti loop") {
    val bucketed = Similarity.lshBucketsMulti(emb, "vec_id", "embedding",
      dims = 64, bits = 8, tables = 2).cache()
    val batch = tuples(Similarity.lshTopKMultiBatch(bucketed, "vec_id",
      "embedding", queries, "qid", "embedding", k = 10, bits = 8,
      probeDist = 2, tables = 2, dims = 64))
    val loop = loopTuples((_, qv) =>
      Similarity.lshTopKMulti(bucketed, "vec_id", "embedding", qv, 10,
        bits = 8, probeDist = 2, tables = 2, dims = 64))
    assert(batch.nonEmpty && batch == loop)
    bucketed.unpersist()
  }

  test("lshTopKServedBatch == per-query lshTopKServed loop, from the " +
      "persisted bucket-partitioned layout") {
    val table = "batch_ann_lsh_served"
    Similarity.saveLshIndex(emb, "embedding", dims = 64, table,
      bits = 8, tables = 2)
    val batch = tuples(Similarity.lshTopKServedBatch(spark, table,
      "vec_id", "embedding", queries, "qid", "embedding", k = 10,
      probeDist = 2))
    val loop = loopTuples((_, qv) =>
      Similarity.lshTopKServed(spark, table, "vec_id", "embedding", qv, 10,
        probeDist = 2))
    assert(batch.nonEmpty && batch == loop)
  }

  test("pqTopKBatch == per-query pqTopK loop (shared ADC candidate order)") {
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 8, nCodes = 16, iters = 2, sampleN = 512)
    val batch = tuples(Similarity.pqTopKBatch(idx, "vec_id", "embedding",
      queries, "qid", "embedding", k = 10, candidates = 200))
    val loop = loopTuples((_, qv) =>
      Similarity.pqTopK(idx, "vec_id", "embedding", qv, 10, candidates = 200))
    assert(batch.nonEmpty && batch == loop)
  }

  test("served IVF batch prunes at the source: the union-of-probed-cells " +
      "IN filter reaches the cluster-partitioned scan as a partition " +
      "filter, and the served batch equals the in-memory batch") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 2)
    val table = "batch_ann_ivf_served"
    Similarity.saveIvfIndex(idx, table)
    val loaded = Similarity.loadIvfIndex(spark, table)
    val batchServed = Similarity.ivfTopKBatch(loaded, "vec_id", "embedding",
      queries, "qid", "embedding", k = 10, nProbe = 4)
    // the scan must carry partition filters (directory pruning), not
    // read all cells and filter in the executor
    val plan = batchServed.queryExecution.executedPlan.toString
    assert(!plan.contains("PartitionFilters: []"),
      s"expected cluster partition filters on the served batch scan:\n$plan")
    assert(tuples(batchServed) ==
      tuples(Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
        queries, "qid", "embedding", k = 10, nProbe = 4)),
      "served batch must equal the in-memory batch (deterministic build)")
  }

  test("batch candidate scoping: an IVF batch row only scores against " +
      "queries that probed its cell (no cross product), and every " +
      "query's own vector ranks first") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 2)
    val batch = Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
      queries, "qid", "embedding", k = 5, nProbe = 4).collect()
    // rank-1 per query is the query vector itself (cosine 1 with itself
    // is in the probed cells by construction: its own cell is nearest)
    val top1 = batch.filter(_.getInt(3) == 1)
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(top1 == Map(1 -> 0L, 2 -> 1L, 3 -> 2L))
  }
}
