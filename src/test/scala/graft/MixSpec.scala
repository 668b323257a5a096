package graft

import org.apache.spark.sql.functions._
import graft.core.GTable
import graft.operators.Mix

/** Weighted corpus mixing: proportions, determinism, oversampling. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(name: String, n: Int) =
    GTable((0 until n).map(i => (s"$name-$i", name)).toDF("text", "origin"), name)

  test("mixture proportions realized within sampling tolerance") {
    val big = corpus("web", 10000)
    val small = corpus("books", 2000)
    val mixed = Mix.weightedMix(Seq(big -> 0.7, small -> 0.3), targetRows = 5000)
    val counts = mixed.df.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // web: rate = 3500/10000 (Bernoulli) → ±3σ ≈ ±170; books: rate =
    // 1500/2000 → ±3σ ≈ ±50
    assert(math.abs(counts("web") - 3500L) < 200, s"web=${counts("web")}")
    assert(math.abs(counts("books") - 1500L) < 100, s"books=${counts("books")}")
  }

  test("seeded mixing is deterministic; different seeds differ") {
    val a = corpus("a", 3000); val b = corpus("b", 3000)
    def run(seed: Long) = Mix.weightedMix(Seq(a -> 0.5, b -> 0.5), 2000, seed)
      .df.orderBy("source", "text").collect().map(_.getString(0)).toSeq
    assert(run(1L) == run(1L))
    assert(run(1L) != run(2L))
  }

  test("oversampling: a small high-weight source replicates whole epochs") {
    val tiny = corpus("gold", 100)
    val big = corpus("web", 10000)
    // gold weight 0.5 of 5000 target = 2500 rows from 100 docs → 25 epochs
    val mixed = Mix.weightedMix(Seq(tiny -> 0.5, big -> 0.5), targetRows = 5000)
    val goldRows = mixed.df.filter(col("source") === "gold").count()
    assert(math.abs(goldRows - 2500L) < 40, s"gold=$goldRows")
    // every gold doc appears 25±1 times (exact epochs + Bernoulli remainder)
    val perDoc = mixed.df.filter(col("source") === "gold")
      .groupBy("text").count().collect().map(_.getLong(1))
    assert(perDoc.length == 100)
    assert(perDoc.forall(c => c == 25L || c == 26L), s"epochs off: ${perDoc.distinct.mkString(",")}")
  }

  test("temperatureMix: alpha=1 is proportional; alpha<1 upweights the " +
      "small corpus; plan rates match realized counts") {
    val big = corpus("web", 8000)
    val small = corpus("books", 1000)
    // alpha = 1: weights n_i → every source sampled at the SAME rate
    val (_, planProp) = Mix.temperatureMix(Seq(big, small), alpha = 1.0,
      targetRows = 4500)
    val rates1 = planProp.map { case (name, _, _, rate) => name -> rate }.toMap
    assert(math.abs(rates1("web") - rates1("books")) < 1e-12,
      s"alpha=1 must be proportional: $rates1")
    // alpha = 0.5: the small corpus's rate rises relative to the big one
    // by sqrt(n_big/n_small)
    val (mixed, plan) = Mix.temperatureMix(Seq(big, small), alpha = 0.5,
      targetRows = 4500)
    val rates = plan.map { case (name, _, _, rate) => name -> rate }.toMap
    assert(math.abs(rates("books") / rates("web")
      - math.sqrt(8000.0 / 1000.0)) < 1e-9, s"rates=$rates")
    // realized counts track the plan's expectation within sampling noise
    val counts = mixed.df.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    plan.foreach { case (name, n, _, rate) =>
      assert(math.abs(counts(name) - rate * n) < 3 * math.sqrt(n.toDouble) + 1,
        s"$name realized=${counts(name)} expected=${rate * n}")
    }
  }

  test("remainder selection is partition-layout independent (ADVICE r2)") {
    // pure-Bernoulli mix (rate 0.5 → no whole epochs): the same source
    // repartitioned/coalesced must select EXACTLY the same rows — the
    // coin is a content hash, not a per-partition rand stream
    val base = corpus("web", 4000)
    def selected(t: GTable) =
      Mix.weightedMix(Seq(t -> 1.0), targetRows = 2000)
        .df.select("text").collect().map(_.getString(0)).sorted.toSeq
    val plain = selected(base)
    val repart = selected(GTable(base.df.repartition(7), "web"))
    val single = selected(GTable(base.df.coalesce(1), "web"))
    assert(plain.nonEmpty && plain == repart && plain == single)
  }

  test("heterogeneous schemas null-fill; source names tag provenance") {
    val a = GTable(Seq(("x", 1)).toDF("text", "extra_a"), "src_a")
    val b = GTable(Seq(("y", true)).toDF("text", "extra_b"), "src_b")
    val mixed = Mix.weightedMix(Seq(a -> 0.5, b -> 0.5), targetRows = 2)
    assert(mixed.columns.toSet == Set("text", "extra_a", "extra_b", "source"))
    val rows = mixed.df.collect()
    assert(rows.forall(r => Set("src_a", "src_b")(r.getAs[String]("source"))))
  }
}
