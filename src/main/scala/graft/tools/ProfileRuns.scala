package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GTable, Ordinals, SortKey}

/** Scratch profiler for the groupbyRuns stages (dev tool). */
object ProfileRuns {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    li.count() // warm
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s  -> $r")
    }
    val keys = Seq(SortKey(col("l_orderkey")), SortKey(col("l_linenumber")),
      SortKey(col("l_returnflag")))
    time("sort only") {
      li.repartitionByRange(keys.map(_.order): _*)
        .sortWithinPartitions(keys.map(_.order): _*).count()
    }
    time("withOrdinal") { Ordinals.withOrdinal(li, keys).count() }
    time("withRunId") { Ordinals.withRunId(li, keys, "l_returnflag").count() }
    time("full q_groupby_runs") {
      graft.Queries.all("q_groupby_runs")(spark, dir).count()
    }
    spark.stop()
  }
}
