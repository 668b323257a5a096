package graft

import org.apache.spark.sql.functions._
import graft.core.GTable
import graft.sources.Sources

/** Scale-path joins: bucketed co-location (no Exchange) and skew salting
  * (same result as the plain join). */
class ScaleJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Sources.writeBucketed(GTable(li, "li"), "li_bkt", Seq("l_orderkey"), 8)
    Sources.writeBucketed(GTable(ord, "ord"), "ord_bkt", Seq("o_orderkey"), 8)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val dir = "/root/testdata/sf0.001"
    val li = GTable(spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity"), "lineitem")
    val ord = GTable(spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice"), "orders")
    val plain = li.join(ord, "l_orderkey" -> "o_orderkey").df
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = li.joinSalted(ord, 8, "l_orderkey" -> "o_orderkey").df
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
    // salted output schema matches the plain join's (salt columns dropped)
    assert(li.joinSalted(ord, 8, "l_orderkey" -> "o_orderkey").df.columns.toSeq ==
      li.join(ord, "l_orderkey" -> "o_orderkey").df.columns.toSeq)
  }

  test("dedup index self-joins plan ONE exchange + ReusedExchange beyond broadcast size") {
    // at local SF the index broadcasts (no shuffle at all — better);
    // past the broadcast threshold the alias-style self-join must share
    // a single shuffle of the index between both sides
    import graft.operators.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      for ((name, df) <- Seq(
          "ngram" -> Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5),
          "simhash" -> Dedup.simhashPairs(docs, "doc_id", "text", 3),
          "minhash" -> Dedup.minhashCandidates(docs, "doc_id", "text"))) {
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("ReusedExchange"),
          s"$name self-join must reuse the index exchange:\n${plan.take(600)}")
      }
    }
  }

  test("IVF assigned table written partitionBy(cluster): probes prune partitions") {
    // the Similarity scaladoc's 100 TB claim, asserted: with the index
    // stored cluster-partitioned, an nProbe filter reads ONLY the probed
    // clusters' files (partition pruning at the source)
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_store").toString
    idx.assigned.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    val stored = spark.read.parquet(dir)
    val probed = stored.filter(col("cluster").isin(0, 1, 2))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"probe filter must reach partition pruning:\n${plan.take(800)}")
    // execute, then read the scan's own metrics — the file count the
    // scan ACTUALLY touched (inputFiles ignores partition filters)
    val got = probed.collect()
    def numFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    val all = stored; all.collect()
    assert(numFiles(probed) < numFiles(all),
      s"pruning must skip files: probed=${numFiles(probed)} all=${numFiles(all)}")
    // and the pruned read returns exactly the probed clusters' rows
    val want = idx.assigned.filter(col("cluster").isin(0, 1, 2)).count()
    assert(got.length.toLong == want)
  }
}
