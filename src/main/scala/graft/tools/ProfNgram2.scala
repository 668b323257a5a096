package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Stage-by-stage cost breakdown of the exact n-gram Jaccard pipeline,
  * with per-stage executor run/GC time from a SparkListener. */
object ProfNgram2 {
  @volatile var stages = List.empty[(Int, String, Long, Long, Long, Int)]

  def time(name: String)(f: => Long): Unit = {
    (1 to 3).foreach { i =>
      stages = Nil
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      val run = stages.map(_._3).sum / 1e3
      val gc = stages.map(_._4).sum / 1e3
      val cpu = stages.map(_._5).sum / 1e6
      val tasks = stages.map(_._6).sum
      println(f"$name%-24s rep$i wall=$wall%6.3f run=$run%7.1f gc=$gc%6.1f cpu=$cpu%7.1f tasks=$tasks%4d stages=${stages.size}%3d rows=$n")
      if (i == 3) stages.sortBy(-_._3).take(4).foreach { case (id, sname, r, g, c, t) =>
        println(f"    stage$id run=${r / 1e3}%7.2f gc=${g / 1e3}%6.2f cpu=${c / 1e6}%7.2f tasks=$t%3d  $sname")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages = (si.stageId, si.name.takeWhile(_ != '\n').take(60),
          m.executorRunTime, m.jvmGCTime, m.executorCpuTime, si.numTasks) :: stages
      }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    import graft.functions.TextHashExpressions.shingle_hash_set
    def index: DataFrame = docs
      .select(col("doc_id").as("id"), TextAnalysis.words(col("text")).as("__ws"))
      .select(col("id"), shingle_hash_set(col("__ws"), 3).as("shks"))
      .select(col("id"), size(col("shks")).as("n_sh"), explode(col("shks")).as("shk"))

    time("index explode") { index.count() }
    time("join+groupBy") {
      val i = index
      i.alias("a").join(i.alias("b"), "shk").filter(col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id"), col("a.n_sh"), col("b.n_sh"))
        .agg(count(lit(1)).as("inter")).count()
    }
    time("full ngramJaccardPairs") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    spark.stop()
  }
}
