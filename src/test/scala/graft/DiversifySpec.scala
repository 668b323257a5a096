package graft

import org.apache.spark.sql.functions._

import graft.operators.Diversify

/** MMR diversification: the greedy trajectory (relevance first, then
  * relevance-minus-redundancy), per-query scoping, truncation, and the
  * loud-failure contracts. Vectors are hand-picked so every expected
  * pick is forced by a wide margin — no float-tie luck. */
class DiversifySpec extends SparkSpec {

  import spark.implicits._

  /** Candidates for one query: a (rel 0.9) and b (rel 0.89) are
    * near-duplicates (cos ≈ 1), c (rel 0.5) is orthogonal to both.
    * Pure relevance ranks a, b, c; MMR at λ=0.5 must rank a, then SKIP
    * the near-duplicate b in favor of c (0.5·0.5 − 0.5·0 = 0.25 beats
    * 0.5·0.89 − 0.5·~1 ≈ −0.055), then take b last. */
  private def oneQuery(qid: Int) = Seq(
    (qid, s"a$qid", 0.90, Seq(1.0, 0.0, 0.0)),
    (qid, s"b$qid", 0.89, Seq(0.999, 0.04471017781221601, 0.0)),
    (qid, s"c$qid", 0.50, Seq(0.0, 1.0, 0.0)))

  private def df(rows: Seq[(Int, String, Double, Seq[Double])]) =
    rows.toDF("qid", "id", "rel", "vec")

  test("lambda=1 is the identity re-rank (pure relevance)") {
    val out = Diversify.mmrRerank(df(oneQuery(1)), "qid", "id", "rel", "vec",
      k = 3, lambda = 1.0).collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a1", 1), ("b1", 2), ("c1", 3)))
  }

  test("diversity demotes the near-duplicate of the first pick") {
    val out = Diversify.mmrRerank(df(oneQuery(1)), "qid", "id", "rel", "vec",
      k = 3, lambda = 0.5).collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a1", 1), ("c1", 2), ("b1", 3)))
  }

  test("groups are scoped per query (no cross-query redundancy)") {
    val out = Diversify.mmrRerank(df(oneQuery(1) ++ oneQuery(2)), "qid",
      "id", "rel", "vec", k = 2, lambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq((1, "a1", 1), (1, "c1", 2),
      (2, "a2", 1), (2, "c2", 2)))
  }

  test("k beyond the group size truncates to the group") {
    val out = Diversify.mmrRerank(df(oneQuery(7)), "qid", "id", "rel", "vec",
      k = 50, lambda = 0.5)
    assert(out.count() == 3)
    assert(out.agg(max("mmr_rank")).head.getInt(0) == 3)
  }

  test("ties break (score desc, rel desc, id asc)") {
    // two orthogonal candidates with IDENTICAL rel and no redundancy:
    // every step's scores tie, so order must fall back to id asc
    val rows = Seq(
      (1, "z", 0.7, Seq(1.0, 0.0)),
      (1, "y", 0.7, Seq(0.0, 1.0)))
    val out = Diversify.mmrRerank(df(rows), "qid", "id", "rel", "vec",
      k = 2, lambda = 0.5).collect().map(r => (r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(("y", 1), ("z", 2)))
  }

  test("null candidate vector fails loudly") {
    val rows = df(oneQuery(1))
      .withColumn("vec", when(col("id") === "b1", lit(null)).otherwise(col("vec")))
    val e = intercept[org.apache.spark.SparkException] {
      Diversify.mmrRerank(rows, "qid", "id", "rel", "vec", k = 3).collect()
    }
    assert(e.getMessage.contains("null") || e.getCause != null)
  }

  test("invalid lambda and k are rejected") {
    intercept[IllegalArgumentException] {
      Diversify.mmrRerank(df(oneQuery(1)), "qid", "id", "rel", "vec",
        k = 0)
    }
    intercept[IllegalArgumentException] {
      Diversify.mmrRerank(df(oneQuery(1)), "qid", "id", "rel", "vec",
        k = 2, lambda = 1.5)
    }
  }
}
