package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** Sketch estimators: HLL distinct reports and CMS frequency bounds. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  lazy val vals = (1 to 5000).map(i => (if (i % 2 == 0) "even" else "odd", s"v${i % 700}"))
    .toDF("grp", "v").cache()

  test("distinctReport: exact counts right, HLL within tolerance, deterministic") {
    val r1 = Sketch.distinctReport(vals, Seq("grp"), "v")
      .orderBy("grp").collect()
    assert(r1.map(_.getString(0)).toSeq == Seq("even", "odd"))
    assert(r1.map(_.getLong(1)).toSeq == Seq(350L, 350L)) // 700 residues split by parity
    assert(r1.forall(_.getBoolean(2)), "HLL estimate outside 15% tolerance")
    // determinism: HLL is hash-based, no randomness — repartitioning
    // must not move the estimate (register max-merge is order-free)
    val r2 = Sketch.distinctReport(vals.repartition(13), Seq("grp"), "v")
      .orderBy("grp").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("MisraGries class: classic decrement + mergeable-summaries merge") {
    val mg = new graft.functions.Aggregators.MisraGries(2)
    // stream a a b c with k=2: c evicts nothing it can keep — after the
    // decrement-all step the summary holds a alone
    val afterC = Seq("a", "a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    assert(afterC == Map("a" -> 1L), s"got $afterC")
    // merge overflow: pointwise sum {a:3,b:2} ++ {c:2} with k=2 subtracts
    // the 3rd-largest (2) and keeps only a
    val merged = mg.merge(
      scala.collection.mutable.Map("a" -> 3L, "b" -> 2L),
      scala.collection.mutable.Map("c" -> 2L))
    assert(merged == scala.collection.mutable.Map("a" -> 1L), s"got $merged")
  }

  test("heavyHitters: guarantee holds on a skewed stream at any partitioning") {
    // 4000 of "hot", 1000 of "warm", 5000 spread across 500 cold items
    val stream = Seq.fill(4000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 5000).map(i => s"cold${i % 500}")
    val n = stream.length.toLong
    val k = 9
    for (parts <- Seq(1, 7)) {
      val df = stream.toDF("v").repartition(parts)
      val got = Sketch.heavyHitters(df, "v", k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"more than $k counters: $got")
      val exact = stream.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
      // every item above N/(k+1) must be present, with the MG bounds
      exact.filter(_._2 * (k + 1) > n).foreach { case (v, c) =>
        assert(got.contains(v), s"heavy item $v missing at parts=$parts")
        assert(got(v) <= c, s"$v over-counted: ${got(v)} > $c")
        assert(got(v) * (k + 1) >= c * (k + 1) - n,
          s"$v under guarantee band: ${got(v)} vs exact $c")
      }
      // no fabricated counts for the cold tail either
      got.foreach { case (v, est) => assert(est <= exact(v)) }
    }
  }

  test("cmsEstimates: never under-counts, over-counts within eps·N") {
    val df = (1 to 10000).map(i => s"k${i % 37}").toDF("v").cache()
    val exact = df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.cmsEstimates(df, "v", exact.keys.toSeq.sorted, eps = 0.001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS under-counted $k")
      assert(est(k) <= n + math.ceil(0.001 * 10000).toLong + 1, s"CMS over-bound on $k")
    }
  }
}
