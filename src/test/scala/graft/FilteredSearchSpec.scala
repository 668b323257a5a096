package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Filtered vector search: pre-filter exactness, predicate pushdown to
  * the parquet source, and the filtered IVF serve path (predicate
  * composed inside the probed-cell scan, metadata carried by the
  * index). */
class FilteredSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private lazy val qvec: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("filtered brute force == brute force over the filtered corpus") {
    val filtered = Similarity.bruteForceTopKFiltered(emb, "vec_id",
      "embedding", col("label") < 5, qvec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val manual = Similarity.bruteForceTopK(emb.filter(col("label") < 5),
      "vec_id", "embedding", qvec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(filtered.toSeq == manual.toSeq)
    // exactness within the filtered corpus: nothing outside the
    // predicate leaks in
    val labels = emb.join(
      Similarity.bruteForceTopKFiltered(emb, "vec_id", "embedding",
        col("label") < 5, qvec, 10).select("vec_id"),
      Seq("vec_id"), "left_semi").select("label").collect().map(_.getInt(0))
    assert(labels.forall(_ < 5))
  }

  test("the metadata predicate reaches the parquet scan (PushedFilters)") {
    // a private copy of the table: another suite caching the shared
    // path would swap an InMemoryTableScan into this plan and hide the
    // FileSourceScanExec the assertion inspects
    val priv = s"/tmp/graft-filtered-pushdown-${System.nanoTime()}"
    emb.write.parquet(priv)
    val plan = Similarity.bruteForceTopKFiltered(spark.read.parquet(priv),
      "vec_id", "embedding",
      col("label") < 5, qvec, 10).queryExecution.executedPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters")
      .exists(_.contains("LessThan(label,5)"))))
  }

  test("filtered IVF == brute force over (probed cells ∩ predicate)") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val ann = Similarity.ivfTopKFiltered(idx, "vec_id", "embedding",
      col("label") < 5, qvec, 10, nProbe = 8) // all cells → exact filtered
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val manual = Similarity.bruteForceTopKFiltered(emb, "vec_id",
      "embedding", col("label") < 5, qvec, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ann.toSeq == manual.toSeq)
  }

  test("filtered IVF with a narrow probe returns only predicate survivors") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val out = Similarity.ivfTopKFiltered(idx, "vec_id", "embedding",
      col("label") === 3, qvec, 20, nProbe = 2)
    val labels = emb.join(out.select("vec_id"), Seq("vec_id"), "left_semi")
      .select("label").collect().map(_.getInt(0))
    assert(labels.nonEmpty && labels.forall(_ == 3))
  }
}
