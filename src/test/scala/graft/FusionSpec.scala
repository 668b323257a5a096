package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Fusion

/** Rank-fusion properties on hand-computable rankings. RRF and Borda
  * scores here are exact small-integer functions, so assertions compare
  * fused ORDER (and agreement counts), never raw doubles. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(pairs: (Long, Int)*): DataFrame =
    pairs.toSeq.toDF("id", "rank")

  private def fusedIds(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq

  test("rrf: agreement beats a single first place") {
    // doc 10 is rank 2 in BOTH lists: 2/62 = 0.03226; doc 1 and doc 2
    // are each a lone rank 1: 1/61 = 0.01639. Agreement wins.
    val a = ranking(1L -> 1, 10L -> 2, 3L -> 3)
    val b = ranking(2L -> 1, 10L -> 2, 4L -> 3)
    val fused = Fusion.rrf(Seq(a, b), "id", "rank", topK = 10)
    assert(fusedIds(fused) == Seq(10L, 1L, 2L, 3L, 4L))
    val nLists = fused.select("id", "n_lists").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nLists(10L) == 2L && nLists(1L) == 1L && nLists(4L) == 1L)
    // rrf_rank is 1-based and dense over the fused output
    assert(fused.select("rrf_rank").collect().map(_.getInt(0)).toSeq
      == (1 to 5))
  }

  test("rrf: identical contributions tie-break by id, topK honored") {
    // docs 5 and 7 both appear only at rank 2 of one list — equal
    // fused score, id order decides; topK=2 cuts after them... (doc 1
    // and 2 at rank 1 outrank both).
    val a = ranking(1L -> 1, 5L -> 2)
    val b = ranking(2L -> 1, 7L -> 2)
    val all = Fusion.rrf(Seq(a, b), "id", "rank", topK = 10)
    assert(fusedIds(all) == Seq(1L, 2L, 5L, 7L))
    assert(fusedIds(Fusion.rrf(Seq(a, b), "id", "rank", topK = 2))
      == Seq(1L, 2L))
  }

  test("rrf: three lists compose; k0 shifts weight toward agreement") {
    val a = ranking(1L -> 1, 9L -> 2)
    val b = ranking(9L -> 1, 2L -> 2)
    val c = ranking(3L -> 1, 9L -> 3)
    // 9 appears in all three lists — must rank first at the default k0
    val fused = Fusion.rrf(Seq(a, b, c), "id", "rank", topK = 10)
    assert(fusedIds(fused).head == 9L)
    assert(fused.filter(col("id") === 9L).select("n_lists")
      .head().getLong(0) == 3L)
    // k0 = 0: raw reciprocal ranks — doc 9's 1/2 + 1 + 1/3 still
    // beats each lone rank-1's 1.0
    assert(fusedIds(Fusion.rrf(Seq(a, b, c), "id", "rank", topK = 1,
      k0 = 0)) == Seq(9L))
  }

  test("borda: weights bias the fused order") {
    // Lists disagree on 1 vs 2; equal weights tie (id breaks), but
    // weighting list a 3x must put its winner first even against the
    // other list's rank-1.
    val a = ranking(1L -> 1, 2L -> 2)
    val b = ranking(2L -> 1, 1L -> 2)
    val even = Fusion.borda(Seq(a -> 1.0, b -> 1.0), "id", "rank", 10)
    assert(fusedIds(even) == Seq(1L, 2L)) // symmetric scores, id tie
    val biased = Fusion.borda(Seq(a -> 3.0, b -> 1.0), "id", "rank", 10)
    assert(fusedIds(biased) == Seq(1L, 2L))
    val biasedB = Fusion.borda(Seq(a -> 1.0, b -> 3.0), "id", "rank", 10)
    assert(fusedIds(biasedB) == Seq(2L, 1L))
  }

  test("borda: linear decay keeps tail ranks live, absence scores zero") {
    // doc 50 at the tail of a 3-long list still beats a doc absent from
    // every list (which simply never appears in the output).
    val a = ranking(1L -> 1, 2L -> 2, 50L -> 3)
    val fused = Fusion.borda(Seq(a -> 1.0), "id", "rank", 10)
    assert(fusedIds(fused) == Seq(1L, 2L, 50L))
    assert(fused.select("borda_rank").collect().map(_.getInt(0)).toSeq
      == Seq(1, 2, 3))
  }

  test("rrfByQuery: per-query fusion equals running rrf per query; " +
      "queries never cross-contaminate") {
    val a = Seq((10, 1L, 1), (10, 9L, 2), (20, 2L, 1), (20, 9L, 2))
      .toDF("qid", "id", "rank")
    val b = Seq((10, 9L, 1), (10, 3L, 2), (20, 4L, 1))
      .toDF("qid", "id", "rank")
    val batch = Fusion.rrfByQuery(Seq(a, b), "qid", "id", "rank", topK = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    for (qid <- Seq(10, 20)) {
      val single = Fusion.rrf(
        Seq(a.filter(col("qid") === qid).drop("qid"),
          b.filter(col("qid") === qid).drop("qid")),
        "id", "rank", topK = 10)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(batch.filter(_._1 == qid).toSeq == single.toSeq,
        s"per-query fusion diverged for q$qid")
    }
    // doc 9 appears in both of q10's lists but only one of q20's
    val nl = batch.collect { case (q, 9L, n, _) => q -> n }.toMap
    assert(nl(10) == 2L && nl(20) == 1L, "agreement counts leaked across queries")
  }

  test("bruteForceTopKBatch: one corpus scan equals the single-query " +
      "path per query (cosine and order)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qvecs = emb.filter(col("vec_id") <= 1)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val batch = graft.operators.Similarity.bruteForceTopKBatch(
        emb, "vec_id", "embedding", qvecs, "qid", "embedding", k = 10)
      .select("qid", "vec_id", "cosine").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    for (vid <- Seq(0L, 1L)) {
      val q = emb.filter(col("vec_id") === vid)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val single = graft.operators.Similarity.bruteForceTopK(
          emb, "vec_id", "embedding", q, 10)
        .collect().map(r => ((vid + 1).toInt, r.getLong(0), r.getDouble(1)))
      assert(batch.filter(_._1 == vid + 1).toSeq == single.toSeq,
        s"batch ANN diverged from the single-query path for query $vid")
    }
  }

  test("argument validation fails loudly") {
    val a = ranking(1L -> 1)
    intercept[IllegalArgumentException](
      Fusion.rrf(Nil, "id", "rank", 5))
    intercept[IllegalArgumentException](
      Fusion.rrf(Seq(a), "id", "rank", 0))
    intercept[IllegalArgumentException](
      Fusion.rrf(Seq(a), "id", "rank", 5, k0 = -1))
    intercept[IllegalArgumentException](
      Fusion.borda(Seq(a -> 0.0), "id", "rank", 5))
  }
}
