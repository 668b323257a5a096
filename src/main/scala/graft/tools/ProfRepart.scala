package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfRepart {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = (1 to 4).foreach { i =>
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-26s rep$i ${(System.nanoTime()-t0)/1e9}%6.3f s rows=$n")
    }
    time("ngram single-part") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count() }
    val docs32 = docs.repartition(32)
    time("ngram repart32") {
      graft.operators.Dedup.ngramJaccardPairs(docs32, "doc_id", "text", 3, 0.5).count() }
    time("minhashCands single") {
      graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text").count() }
    time("minhashCands repart32") {
      graft.operators.Dedup.minhashCandidates(docs32, "doc_id", "text").count() }
    spark.stop()
  }
}
