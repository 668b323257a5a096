package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Late-interaction (MaxSim) retrieval: the sliceTokens adapter's
  * shape, degeneration to single-vector cosine at tokens=1, the
  * best-token-wins semantics single-vector cosine cannot express, and
  * batch == per-query loop. */
class MaxSimSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  private lazy val qvec: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble)

  test("sliceTokens: tokens rows per id, 1-based tok, dim/tokens wide") {
    val toks = Similarity.sliceTokens(emb, "vec_id", "embedding", 64, 4)
    val one = toks.filter(col("vec_id") === 0).orderBy("tok").collect()
    assert(one.length == 4)
    assert(one.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4))
    assert(one.forall(_.getSeq[Double](2).length == 16))
    // slice 2 of doc 0 is elements 16..31 of the original vector
    assert(one(1).getSeq[Double](2) == qvec.slice(16, 32))
    assert(toks.count() == emb.count() * 4)
  }

  test("tokens=1 degenerates to single-vector cosine (same ranking, same score)") {
    val toks = Similarity.sliceTokens(emb, "vec_id", "embedding", 64, 1)
    val ms = Similarity.maxSimTopK(toks, "vec_id", "tok_vec", Seq(qvec), 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ms.toSeq == bf.toSeq)
  }

  test("each query token matches its best doc token independently") {
    // doc X holds the two query tokens in SWAPPED slots; single-vector
    // cosine of the concatenation is 0, but MaxSim must score 2.0
    // (each query token finds its twin among the doc's tokens)
    val docs = Seq(
      (1L, 1, Seq(0.0, 1.0)), (1L, 2, Seq(1.0, 0.0)), // X: swapped twins
      (2L, 1, Seq(1.0, 0.0)), (2L, 2, Seq(0.0, 1.0)), // Y: aligned twins
      (3L, 1, Seq(0.0, -1.0)), (3L, 2, Seq(-1.0, 0.0)) // Z: anti-aligned
    ).toDF("vec_id", "tok", "tok_vec")
    val q = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val out = Similarity.maxSimTopK(docs, "vec_id", "tok_vec", q, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 == 2.0 && out(1)._2 == 2.0 && out(2)._2 == 0.0)
  }

  test("maxSimTopKBatch == per-query maxSimTopK loop (ids, ranks, scores)") {
    val toks = Similarity.sliceTokens(emb, "vec_id", "embedding", 64, 4)
    val queries = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val batch = Similarity.maxSimTopKBatch(toks, "vec_id", "tok_vec",
      queries, "qid", "embedding", dim = 64, tokens = 4, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    val loop = emb.filter(col("vec_id") <= 2)
      .select("vec_id", "embedding").collect().toSeq
      .flatMap { qr =>
        val qid = qr.getLong(0).toInt + 1
        val qv = qr.getSeq[Float](1).map(_.toDouble)
        val qtoks = (0 until 4).map(i => qv.slice(i * 16, (i + 1) * 16))
        Similarity.maxSimTopK(toks, "vec_id", "tok_vec", qtoks, 10)
          .collect().zipWithIndex
          .map { case (r, i) => (qid, r.getLong(0), r.getDouble(1), i + 1) }
      }.sorted
    assert(batch == loop)
  }

  test("invalid token split is rejected") {
    intercept[IllegalArgumentException] {
      Similarity.sliceTokens(emb, "vec_id", "embedding", 64, 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.maxSimTopK(emb, "vec_id", "embedding", Seq.empty, 5)
    }
  }
}
