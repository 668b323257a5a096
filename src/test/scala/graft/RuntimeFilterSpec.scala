package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins Spark's RUNTIME bloom-filter join pruning
  * (`InjectRuntimeFilter` → `BloomFilterMightContain` on the probe
  * side) on this engine's canonical join shape — the row-level
  * complement to dynamic partition pruning. At 100 TB the selective
  * dim-side of a fact join is often too big to broadcast; the runtime
  * bloom built from the filtered build side then prunes fact rows at
  * the scan/shuffle boundary instead of shipping them to the join. The
  * production size thresholds (creation ≤ 10 MB build, application
  * ≥ 10 GB scan) govern WHEN it fires; this spec lowers them to prove
  * the engine's plans are eligible and the rewrite is semantically
  * transparent — a silent `runtime.bloomFilter.enabled=false`
  * regression (or a plan shape the rule cannot match) fails here. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def hasBloomProbe(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))
  }

  test("a selective non-broadcast fact join gets a runtime bloom probe " +
      "on the fact side, and the rewrite changes no rows") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    def joined = lineitem
      .join(orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("rev"))
    val (filtered, plain) = withConf(
      // force the non-broadcast regime a 100 TB dim lands in
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // production application threshold is 10 GB; sf0.01 is MBs
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val withFilter = joined
      assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true",
        "runtime bloom filtering must stay enabled — it is the " +
          "non-broadcast scale path's row-level prune")
      assert(hasBloomProbe(withFilter),
        "no BloomFilterMightContain on the fact side — runtime filter " +
          "was not injected into the canonical join shape")
      val rows = withFilter.orderBy(col("o_orderdate")).collect()
      val plainRows = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val p = joined
        assert(!hasBloomProbe(p))
        p.orderBy(col("o_orderdate")).collect()
      }
      (rows, plainRows)
    }
    // dates and counts exactly; the double sum with a RELATIVE tolerance
    // — two physical plans order partial aggregation differently, and
    // round(sum,2) can land either side of a .005 boundary
    assert(filtered.length == plain.length,
      s"runtime bloom rewrite changed the row count: " +
        s"${filtered.length} vs ${plain.length}")
    filtered.zip(plain).foreach { case (a, b) =>
      assert(a.get(0) == b.get(0) && a.getLong(1) == b.getLong(1),
        s"runtime bloom rewrite changed a group: $a vs $b")
      val (ra, rb) = (a.getDouble(2), b.getDouble(2))
      assert(math.abs(ra - rb) <= 1e-9 * math.max(math.abs(ra), math.abs(rb)) + 0.011,
        s"runtime bloom rewrite moved a revenue sum beyond rounding " +
          s"tolerance: $ra vs $rb for ${a.get(0)}")
    }
    assert(filtered.nonEmpty)
  }

  test("the broadcast regime does not need (and does not get) a bloom " +
      "probe: the small filtered dim broadcasts and prunes at the join") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    // same lowered application threshold as the positive test — under
    // the 10 GB default NO sf0.01 plan could get a probe, and the
    // negative assertion would pass vacuously
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val joined = lineitem
        .join(broadcast(orders.filter(col("o_orderpriority") === "1-URGENT")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate")).agg(count(lit(1)).as("n"))
      assert(!hasBloomProbe(joined),
        "bloom probe injected under an explicit broadcast — wasted work")
      assert(joined.limit(1).collect().nonEmpty)
    }
  }
}
