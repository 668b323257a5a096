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
