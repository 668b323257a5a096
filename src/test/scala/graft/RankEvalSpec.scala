package graft

import org.apache.spark.sql.Row
import graft.operators.RankEval

/** IR-metric goldens hand-computed on tiny fixtures (round-4 values):
  * recall@k, MRR@k, graded nDCG@k (Järvelin-Kekäläinen 2^g−1 gain). */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private val qrelsGraded =
    Seq((1L, 2.0), (2L, 1.0), (3L, 1.0)).toDF("id", "grade")

  private def one(df: org.apache.spark.sql.DataFrame): Row = {
    val rows = df.collect()
    assert(rows.length == 1)
    rows.head
  }

  test("graded metrics: hits at ranks 1 and 3 of k=3") {
    // dcg = 3/log2(2) + 1/log2(4) = 3.5
    // idcg = 3 + 1/log2(3) + 0.5 = 4.13093 -> ndcg 0.8473
    val ranking = Seq((1L, 1), (5L, 2), (2L, 3)).toDF("id", "rank")
    val r = one(RankEval.evaluate(ranking, qrelsGraded, "id", "rank", 3,
      Some("grade"), "sysA"))
    assert(r.getString(0) == "sysA")
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.6667) // recall 2/3
    assert(r.getDouble(3) == 1.0)    // first hit at rank 1
    assert(r.getDouble(4) == 0.8473)
    // AP = (1/1 + 2/3) / min(3, 3) = 5/9
    assert(r.getDouble(5) == 0.5556)
  }

  test("no relevant retrieved: all three metrics zero, not null/NaN") {
    val ranking = Seq((5L, 1), (6L, 2)).toDF("id", "rank")
    val r = one(RankEval.evaluate(ranking, qrelsGraded, "id", "rank", 3))
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
      r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("binary relevance default; ranks beyond k are ignored") {
    val qrels = Seq(1L, 2L).toDF("id")
    // rank 4 hit (id 1) lies beyond k=3: recall counts only id 2
    val ranking = Seq((2L, 1), (7L, 2), (8L, 3), (1L, 4)).toDF("id", "rank")
    val r = one(RankEval.evaluate(ranking, qrels, "id", "rank", 3))
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 1.0)
    // dcg = 1/log2(2) = 1; idcg = 1 + 1/log2(3) = 1.63093 -> 0.6131
    assert(r.getDouble(4) == 0.6131)
    // AP = (1/1) / min(3, 2) = 0.5 — the rank-4 hit is beyond k
    assert(r.getDouble(5) == 0.5)
  }

  test("perfect ranking scores 1.0 across the board") {
    // ideal order is grade desc then id: 1(g2), 2(g1), 3(g1)
    val ranking = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val r = one(RankEval.evaluate(ranking, qrelsGraded, "id", "rank", 3,
      Some("grade")))
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("k must be positive") {
    intercept[IllegalArgumentException](
      RankEval.evaluate(qrelsGraded, qrelsGraded, "id", "grade", 0))
  }

  test("empty qrels fails loudly (the documented contract), never a " +
      "NaN/null metrics row") {
    val ranking = Seq((1L, 1)).toDF("id", "rank")
    val empty = qrelsGraded.filter("id < 0")
    val e = intercept[IllegalArgumentException](
      RankEval.evaluate(ranking, empty, "id", "rank", 3))
    assert(e.getMessage.contains("non-empty"))
  }

  test("evaluateByQuery: per-query metrics in one plan; a zero-hit " +
      "query still emits its row (qrels-driven, zero metrics)") {
    // q10 = the sysA golden above; q20 retrieves nothing relevant
    val ranking = Seq((10, 1L, 1), (10, 5L, 2), (10, 2L, 3),
      (20, 8L, 1), (20, 9L, 2)).toDF("qid", "id", "rank")
    val qrels = Seq((10, 1L, 2.0), (10, 2L, 1.0), (10, 3L, 1.0),
      (20, 4L, 1.0)).toDF("qid", "id", "grade")
    val rows = RankEval.evaluateByQuery(ranking, qrels, "qid", "id",
      "rank", 3, Some("grade")).collect()
    assert(rows.length == 2)
    val q10 = rows.find(_.getInt(0) == 10).get
    assert(q10.getLong(1) == 3L && q10.getDouble(2) == 0.6667 &&
      q10.getDouble(3) == 1.0 && q10.getDouble(4) == 0.8473 &&
      q10.getDouble(5) == 0.5556,
      s"q10 metrics drifted from the single-query golden: $q10")
    val q20 = rows.find(_.getInt(0) == 20).get
    assert(q20.getLong(1) == 1L && q20.getDouble(2) == 0.0 &&
      q20.getDouble(3) == 0.0 && q20.getDouble(4) == 0.0 &&
      q20.getDouble(5) == 0.0,
      s"zero-hit query must report zero metrics, not vanish: $q20")
  }

  test("hardNegatives: positives drop per (query, id), survivors " +
      "re-rank densely per query, all-positive top-k yields no rows") {
    // q1: ranks 1,3 positive -> negatives are ranks 2,4 re-ranked 1,2
    // q2: everything positive -> no negative rows
    val ranking = Seq((1, 10L, 1), (1, 11L, 2), (1, 12L, 3), (1, 13L, 4),
      (2, 20L, 1), (2, 21L, 2)).toDF("qid", "id", "rank")
    val positives = Seq((1, 10L), (1, 12L), (2, 20L), (2, 21L),
      (9, 11L)) // a FOREIGN query's positive must not mask q1's id 11
      .toDF("qid", "id")
    val rows = RankEval.hardNegatives(ranking, positives, "qid", "id",
      "rank", n = 10).collect().map(r => (r.getInt(0), r.getLong(1),
      r.getInt(2))).toSeq
    assert(rows == Seq((1, 11L, 1), (1, 13L, 2)))
    // n truncates below the surviving count
    val one = RankEval.hardNegatives(ranking, positives, "qid", "id",
      "rank", n = 1).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(one.toSeq == Seq((1, 11L)))
  }
}
