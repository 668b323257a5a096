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
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
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
}
