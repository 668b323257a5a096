package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc per-query profiler: times named gate queries (2 rounds, same
  * count() action as Bench) against a chosen SF dir. Usage:
  *   runMain graft.tools.ProfDedup <sfDir> <q1,q2,...>
  */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_dedup_exact", "q_fingerprint", "q_dedup_minhash",
        "q_dedup_ngram", "q_dedup_remove"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (round <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROF r$round $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
