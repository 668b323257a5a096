package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc steady-state timer for individual gates (see OPERATORS.md
  * round-8 adjudication):
  * `runMain graft.tools.ProfLine q_line_dedup q_span_dedup`. */
object ProfLine {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_line_dedup")
    graft.Queries.all("q1_agg")(spark, dir).count() // warm the session
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.Queries.all(name)(spark, dir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, n=$n")
    }
    spark.stop()
  }
}
