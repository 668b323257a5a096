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

  test("sketch rollup: layout-invariant, deterministic, every rollup " +
      "path within the rse band of exact; rows conserve exactly") {
    // 911 distinct values — enough to promote the sketches OUT of
    // sparse mode, the regime where the documented non-guarantees show
    // (cross-path register drift, HIP vs composite estimator)
    val docs = (1 to 4000).map { i =>
      (s"s${i % 4}", s"l${i % 3}", (i % 911).toLong)
    }.toDF("source", "lang", "v")
    val fine = Sketch.buildDistinctSketches(
      docs.withColumn("shard", col("v") % 5), Seq("source", "lang", "shard"), "v")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val oneHop = collect(Sketch.rollupDistinct(fine, Seq("source")))
    val twoHop = collect(Sketch.rollupDistinct(
      Sketch.rollupSketches(fine, Seq("source", "lang")), Seq("source")))
    // exact per-source truth
    val truth = docs.groupBy("source")
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("n"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // every path: rows conserve EXACTLY, estimates within the band
    for (path <- Seq(oneHop, twoHop); ((s0, est, n), (s1, nd, nTrue)) <- path.zip(truth)) {
      assert(s0 == s1)
      assert(n == nTrue, s"row conservation broke: $s0 $n vs $nTrue")
      assert(math.abs(est - nd).toDouble <= 0.10 * nd, s"$s0: est=$est exact=$nd")
    }
    // DETERMINISM: the same cube rolled up twice gives identical rows
    assert(collect(Sketch.rollupDistinct(fine, Seq("source"))) == oneHop)
    // a repartitioned BUILD stays within the band too (bit-stability
    // across physical layouts is NOT promised: set→HLL promotion points
    // depend on partial-merge order, nudging registers within the band)
    val fine2 = Sketch.buildDistinctSketches(
      docs.repartition(17).withColumn("shard", col("v") % 5),
      Seq("source", "lang", "shard"), "v")
    for (((s0, est, n), (s1, nd, nTrue)) <-
        collect(Sketch.rollupDistinct(fine2, Seq("source"))).zip(truth)) {
      assert(s0 == s1 && n == nTrue)
      assert(math.abs(est - nd).toDouble <= 0.10 * nd, s"$s0: est=$est exact=$nd")
    }
    // global rollup and a lone whole-table sketch agree within the band
    // (not bit-exactly — HIP vs composite, the documented non-guarantee)
    val global = Sketch.rollupDistinct(fine, Seq.empty).head().getLong(0)
    val directAll = docs.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12)))).head().getLong(0)
    val exact = docs.select(countDistinct(col("v"))).head().getLong(0)
    assert(math.abs(global - exact).toDouble <= 0.10 * exact,
      s"global=$global exact=$exact")
    assert(math.abs(directAll - exact).toDouble <= 0.10 * exact)
  }

  test("cube upsert + compaction: appended delta rows merge at serve, " +
      "the compaction collapses to one row per group with rows " +
      "conserved, and a mid-compaction upsert survives the promote") {
    import graft.sources.Sources
    val table = "sketch_cube_maint"
    Seq(table, s"${table}__next", s"${table}__next_basis")
      .foreach(Sources.replaceTable(spark, _))
    val rows = (1 to 3000)
      .map(i => (s"g${i % 3}", s"v${i % 911}")).toDF("grp", "v")
    val base = rows.filter(xxhash64(col("v")) % 5 =!= 0)
    val delta = rows.filter(xxhash64(col("v")) % 5 === 0)
    Sketch.buildDistinctSketches(base, Seq("grp"), "v")
      .write.format("parquet")
      .options(Sources.stagedWriteOptions(spark, table)).saveAsTable(table)
    Sketch.upsertDistinctSketches(delta, Seq("grp"), "v", table)
    // appended, not merged in place: >1 row per group pre-compaction
    assert(spark.table(table).groupBy("grp").count()
      .filter(col("count") > 1).count() > 0,
      "premise: the upsert appends finest-group rows")
    val exact = rows.groupBy("grp")
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    def check(tag: String): Unit = {
      val got = Sketch.rollupDistinct(spark.table(table), Seq("grp"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      exact.foreach { case (g, (nd, n)) =>
        val (est, gotN) = got(g)
        assert(gotN == n, s"$tag: rows not conserved for $g")
        assert(math.abs(est - nd) <= 0.15 * nd,
          s"$tag: estimate $est outside 15% of $nd for $g")
      }
    }
    check("served over base+delta rows")
    // compaction with a mid-rewrite upsert: the catch-up must copy it
    Sketch.buildNextSketchCube(spark, table,
      Sketch.rollupSketches(_, Seq("grp")))
    val late = Seq(("g0", "late_v_1"), ("g1", "late_v_2")).toDF("grp", "v")
    Sketch.upsertDistinctSketches(late, Seq("grp"), "v", table)
    Sketch.promoteSketchCube(spark, table)
    val n2 = Sketch.rollupDistinct(spark.table(table), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(n2("g0") == exact("g0")._2 + 1 && n2("g1") == exact("g1")._2 + 1,
      "mid-compaction upsert vanished at the promote")
    assert(!spark.catalog.tableExists(s"${table}__next_basis"),
      "basis debris after a clean promote")
    // a second, quiet compaction collapses to one row per group
    Sketch.compactDistinctCube(spark, table, Seq("grp"))
    assert(spark.table(table).groupBy("grp").count()
      .filter(col("count") > 1).isEmpty,
      "compaction left multiple rows per finest group")
    val n3 = Sketch.rollupDistinct(spark.table(table), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(n3 == n2, "compaction changed the conserved row counts")
  }

  test("cube takedown: rebuildExcluding rebuilds over corpus-minus-" +
      "tombstones (rows conserve exactly, estimates in band), leaves no " +
      "tombstone debris, and a mid-rebuild upsert survives the promote") {
    import graft.sources.Sources
    val table = "sketch_cube_del"
    Seq(table, s"${table}__next", s"${table}__next_basis")
      .foreach(Sources.replaceTable(spark, _))
    val rows = (1 to 3000)
      .map(i => (i.toLong, s"g${i % 3}", s"v${i % 911}"))
      .toDF("doc_id", "grp", "v")
    Sketch.buildDistinctSketches(rows, Seq("grp"), "v")
      .write.format("parquet")
      .options(Sources.stagedWriteOptions(spark, table)).saveAsTable(table)
    val dead = rows.filter(col("doc_id") % 7 === 3).select(col("doc_id"))
    val reduced = rows.filter(col("doc_id") % 7 =!= 3)
    Sketch.rebuildDistinctExcluding(rows, Seq("grp"), "v", dead, table)
    val exact = reduced.groupBy("grp")
      .agg(countDistinct(col("v")).as("nd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = Sketch.rollupDistinct(spark.table(table), Seq("grp"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (g, (nd, n)) =>
      val (est, gotN) = got(g)
      assert(gotN == n,
        s"rows not conserved over the REDUCED corpus for $g: $gotN vs $n")
      assert(math.abs(est - nd) <= 0.15 * nd,
        s"estimate $est outside 15% of the reduced corpus's $nd for $g")
    }
    // physical erasure in one step: no tombstone sibling, no basis debris
    assert(!spark.catalog.tableExists(s"${table}_deleted"))
    assert(!spark.catalog.tableExists(s"${table}__next_basis"))
    // the staged discipline composes with a concurrent upsert, exactly
    // as in compaction: a delta landing mid-rebuild is copied verbatim
    val dead2 = rows.filter(col("doc_id") % 7 === 5).select(col("doc_id"))
    Sketch.buildNextSketchCube(spark, table,
      _ => Sketch.buildDistinctSketches(
        rows.filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 7 =!= 5),
        Seq("grp"), "v"))
    val late = Seq(("g0", "late_v_1")).toDF("grp", "v")
    Sketch.upsertDistinctSketches(late, Seq("grp"), "v", table)
    Sketch.promoteSketchCube(spark, table)
    val n2 = Sketch.rollupDistinct(spark.table(table), Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val reduced2n = rows.filter(col("doc_id") % 7 =!= 3 &&
      col("doc_id") % 7 =!= 5).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n2("g0") == reduced2n("g0") + 1,
      "mid-rebuild upsert vanished at the takedown promote")
    assert(n2("g1") == reduced2n("g1"), "second exclusion lost rows")

    // the KLL twin: rank guarantee over the reduced corpus
    val ktable = "kll_cube_del"
    Seq(ktable, s"${ktable}__next", s"${ktable}__next_basis")
      .foreach(Sources.replaceTable(spark, _))
    val krows = (1 to 4000).map(i => (i.toLong, s"g${i % 2}", (i % 997).toLong))
      .toDF("doc_id", "grp", "x")
    Sketch.buildQuantileSketches(krows, Seq("grp"), "x")
      .write.format("parquet")
      .options(Sources.stagedWriteOptions(spark, ktable)).saveAsTable(ktable)
    val kdead = krows.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val kreduced = krows.filter(col("doc_id") % 5 =!= 0)
    Sketch.rebuildQuantileExcluding(krows, Seq("grp"), "x", kdead, ktable)
    val served = Sketch.rollupQuantiles(spark.table(ktable), Seq("grp"),
      Seq(0.5)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kreduced.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().foreach { r =>
        val (g, n) = (r.getString(0), r.getLong(1))
        val rank = kreduced.filter(col("grp") === g &&
          col("x") <= served(g)).count()
        assert(math.abs(rank - 0.5 * n) <= math.max(0.05 * n, 1.0),
          s"KLL rank off target over the reduced corpus for $g")
      }
  }

  test("KLL cube upsert + compaction: rank guarantee survives the " +
      "append-then-merge loop") {
    import graft.sources.Sources
    val table = "kll_cube_maint"
    Seq(table, s"${table}__next", s"${table}__next_basis")
      .foreach(Sources.replaceTable(spark, _))
    val rows = (1 to 4000).map(i => (s"g${i % 2}", (i % 997).toLong))
      .toDF("grp", "x")
    val base = rows.filter(col("x") % 4 =!= 0)
    val delta = rows.filter(col("x") % 4 === 0)
    Sketch.buildQuantileSketches(base, Seq("grp"), "x")
      .write.format("parquet")
      .options(Sources.stagedWriteOptions(spark, table)).saveAsTable(table)
    Sketch.upsertQuantileSketches(delta, Seq("grp"), "x", table)
    Sketch.compactQuantileCube(spark, table, Seq("grp"))
    assert(spark.table(table).count() == 2,
      "KLL compaction left multiple rows per group")
    val served = Sketch.rollupQuantiles(spark.table(table), Seq("grp"),
      Seq(0.5)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy("grp").agg(count(lit(1)).as("n"),
        expr("percentile(x, 0.5)").as("p50"))
      .collect().foreach { r =>
        val (g, n, p50) = (r.getString(0), r.getLong(1), r.getDouble(2))
        val rank = rows.filter(col("grp") === g &&
          col("x") <= served(g)).count()
        assert(math.abs(rank - 0.5 * n) <= math.max(0.05 * n, 1.0),
          s"KLL rank drifted after the maintenance loop for $g")
      }
  }

  test("KLL quantile rollup: rank guarantee on every path, rows conserve") {
    val docs = (1 to 4000).map { i =>
      (s"s${i % 4}", s"l${i % 3}", ((i * 7919) % 911).toLong)
    }.toDF("source", "lang", "v")
    val fine = Sketch.buildQuantileSketches(
      docs.withColumn("shard", col("v") % 5), Seq("source", "lang", "shard"), "v")
    def rankCheck(served: org.apache.spark.sql.DataFrame): Unit = {
      val rows = docs.join(broadcast(served), "source")
        .groupBy(col("source"), col("n_rows"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") <= col("q_50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("v") <= col("q_90"), 1L).otherwise(0L)).as("r90"))
        .collect()
      assert(rows.length == 4)
      rows.foreach { r =>
        val (nRows, n) = (r.getLong(1), r.getLong(2))
        assert(nRows == n, s"${r.getString(0)}: cube rows $nRows vs $n")
        assert(math.abs(r.getLong(3).toDouble / n - 0.5) <= 0.05,
          s"${r.getString(0)}: p50 rank ${r.getLong(3)}/$n")
        assert(math.abs(r.getLong(4).toDouble / n - 0.9) <= 0.05,
          s"${r.getString(0)}: p90 rank ${r.getLong(4)}/$n")
      }
    }
    // one-hop serve and two-hop serve (through a (source, lang) sketch
    // tier) both honor the rank guarantee — merge preserves it
    rankCheck(Sketch.rollupQuantiles(fine, Seq("source"), Seq(0.5, 0.9)))
    rankCheck(Sketch.rollupQuantiles(
      Sketch.rollupQuantileSketches(fine, Seq("source", "lang")),
      Seq("source"), Seq(0.5, 0.9)))
  }

  test("KLL serve: an all-NULL group serves NULL quantiles, not a crash") {
    val docs = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("b", None), ("b", None) // entirely-NULL value column → empty sketch
    ).toDF("source", "v")
    val fine = Sketch.buildQuantileSketches(docs, Seq("source"), "v")
    val served = Sketch.rollupQuantiles(fine, Seq("source"), Seq(0.5))
      .orderBy("source").collect()
    assert(served.length == 2)
    assert(!served(0).isNullAt(1) && served(0).getLong(2) == 3L)
    assert(served(1).isNullAt(1), "empty sketch must serve NULL")
    assert(served(1).getLong(2) == 0L)
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

  test("cmsEstimates: never under-counts, over-counts within eps·N; " +
      "LAZY — no job runs before the caller's first action") {
    val df = (1 to 10000).map(i => s"k${i % 37}").toDF("v").cache()
    val exact = df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val estDf =
      try {
        val d = Sketch.cmsEstimates(df, "v", exact.keys.toSeq.sorted, eps = 0.001)
        Thread.sleep(300) // listener bus is async; any job from the call
                          // above would have completed (blocking) already
        assert(jobs == 0, s"cmsEstimates ran $jobs job(s) before any action")
        d
      } finally spark.sparkContext.removeSparkListener(listener)
    val est = estDf
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS under-counted $k")
      assert(est(k) <= n + math.ceil(0.001 * 10000).toLong + 1, s"CMS over-bound on $k")
    }
  }

  test("cms_estimate foldable path: a driver-held sketch probed over a " +
      "full column agrees bit-for-bit with the per-row column path and " +
      "is null on null items") {
    import graft.functions.SketchExpressions
    val df = (1 to 10000).map(i => s"k${i % 37}").toDF("v").cache()
    val bytes = df
      .agg(count_min_sketch(col("v"), lit(0.001), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    // same serialized sketch through both paths: foldable literal
    // (once-per-instance deserialize) vs per-row binary COLUMN from a
    // broadcast one-row frame (CmsOps content-keyed cache) — identical
    // estimates, every row
    val skFrame = df.agg(
      count_min_sketch(col("v"), lit(0.001), lit(0.99), lit(42)).as("__sk"))
    val both = df
      .crossJoin(broadcast(skFrame))
      .select(col("v"),
        SketchExpressions.cms_estimate(bytes, col("v")).as("via_lit"),
        SketchExpressions.cms_estimate(col("__sk"), col("v")).as("via_col"))
      .collect()
    assert(both.length == 10000)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"foldable vs column path disagree on ${r.getString(0)}")
      assert(r.getLong(1) >= 10000 / 37) // never under-counts
    }
    val onNull = df.limit(1)
      .select(SketchExpressions
        .cms_estimate(bytes, lit(null).cast("string"))).head()
    assert(onNull.isNullAt(0), "null item must estimate to null")
  }
}
