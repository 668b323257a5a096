package graft

import graft.operators.Lexicon

/** Corpus-level lexical statistics: vocabulary, TF-IDF, per-doc terms. */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date"),
    (4L, "   ")).toDF("doc_id", "text")

  test("vocab: occurrence + doc counts, ordered by count desc then token") {
    val v = Lexicon.vocab(docs, "doc_id", "text", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(v == Seq(
      ("apple", 3L, 2L), ("cherry", 3L, 2L),
      ("banana", 2L, 2L), ("date", 1L, 1L)))
  }

  test("vocab: top-k truncates after the tie-broken ordering") {
    val v = Lexicon.vocab(docs, "doc_id", "text", 2).collect()
      .map(_.getString(0)).toSeq
    assert(v == Seq("apple", "cherry"))
  }

  test("tfIdf: tf and df exact; idf follows the smoothed sklearn formula") {
    val rows = Lexicon.tfIdf(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val n = 4.0
    def w(df: Long) = math.log((n + 1) / (df + 1.0)) + 1.0
    assert(rows((1L, "apple")) == ((2L, 2L, 2 * w(2))))
    assert(rows((3L, "cherry")) == ((2L, 2L, 2 * w(2))))
    assert(rows((3L, "date")) == ((1L, 1L, 1 * w(1))))
    // whitespace-only doc contributes no pairs
    assert(!rows.keySet.exists(_._1 == 4L))
  }

  test("topTermsPerDoc: rank by tfidf desc with token tie-break, k cap") {
    val top = Lexicon.topTermsPerDoc(docs, "doc_id", "text", 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: apple tf=2 wins; doc 2: tie tf=1,df=2 both → token order
    assert(top(1L) == "apple")
    assert(top(2L) == "banana")
    assert(top(3L) == "cherry")
  }
}
