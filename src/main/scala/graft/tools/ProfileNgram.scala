package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Scratch profiler for the ngram-Jaccard stages (dev tool). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s  -> $r")
    }
    docs.count() // warm

    // Variant A: string shingles (transform+concat_ws), hash outside
    def stringShingles = docs.select(col("doc_id"),
      explode(TextAnalysis.shingles(col("text"), 3)).as("sh"))
    time("A string-shingle explode") { stringShingles.count() }
    time("A string-shingle hash explode") {
      stringShingles.select(col("doc_id"), xxhash64(col("sh"))).count() }

    // Variant B: word-hash shingles via element_at multi-arg xxhash64
    val ws = col("__ws")
    def wordHashSet = docs
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("__ws"))
      .select(col("doc_id"), array_distinct(
        when(size(ws) < 3, array().cast("array<bigint>"))
          .otherwise(transform(sequence(lit(0), size(ws) - 3),
            i => xxhash64(element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))))
        .as("shks"))
    time("B wordhash set build") { wordHashSet.count() }
    time("B wordhash explode") {
      wordHashSet.select(col("doc_id"), explode(col("shks"))).count() }

    // Variant C: string shingles inside transform, distinct map-side
    def stringHashSet = docs
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("__ws"))
      .select(col("doc_id"), array_distinct(
        when(size(ws) < 3, array().cast("array<bigint>"))
          .otherwise(transform(sequence(lit(0), size(ws) - 3),
            i => xxhash64(concat_ws(" ", slice(ws, i + 1, lit(3)))))))
        .as("shks"))
    time("C stringhash set build") { stringHashSet.count() }

    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("full ngramJaccardPairs again") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    spark.stop()
  }
}
