package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // real data rounds: count iterations on the sf0.1 near-dup pair graph
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val t0 = System.nanoTime()
    val cc = graft.operators.Dedup.clusterNearDuplicates(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
    val nClusters = cc.select("cluster_id").distinct().count()
    println(f"real-graph cluster time=${(System.nanoTime()-t0)/1e9}%.2f clusters=$nClusters")
    // synthetic chain: 0-1-2-...-199 (diameter 200)
    val chain = (0 until 199).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val t1 = System.nanoTime()
    val comp = graft.operators.Dedup.connectedComponents(chain, maxIter = 250)
    val mins = comp.agg(min("comp"), max("comp"), countDistinct("comp")).head()
    println(f"chain-200 time=${(System.nanoTime()-t1)/1e9}%.2f minmaxdistinct=$mins")
    spark.stop()
  }
}
