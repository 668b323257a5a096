package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: prints `explain("formatted")` for selected queries so scan
  * pushdown (PushedFilters/ReadSchema), join strategies (broadcast vs
  * SMJ), and WholeStageCodegen spans can be inspected.
  *
  * Usage: runMain graft.tools.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q_join3_revenue", "q_where_comparators",
        "q_orderby_limit", "q_dedup_embedding", "q_search_scored",
        "q_join_asof", "q_join_range", "q_join_salted", "q_sim_ivf",
        "q_pivot_3level", "q_dedup_minhash", "q_sim_lsh")
    // the shipped harness session (state backend + join preferences), so
    // dumped plans match what Bench/Verify actually plan
    val spark = graft.GraftSession.rocksDbState(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.Queries.all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
