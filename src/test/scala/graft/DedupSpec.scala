package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.functions.TextAnalysis

/** Dedup family: exact, MinHash-LSH vs exact Jaccard, SimHash. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 20 base docs from a small vocabulary + controlled near-duplicates
  val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa")
  def doc(seed: Int, len: Int): String =
    (0 until len).map(i => vocab(((seed * 31 + i * 7) % 97) % vocab.size)).mkString(" ")

  lazy val docs = {
    val base = (0 until 20).map(i => (i.toLong, doc(i, 40)))
    val exactDup = Seq((100L, doc(3, 40)))                    // copy of doc 3
    val nearDup = Seq((101L, doc(5, 40) + " omega"))          // doc 5 + 1 word
    (base ++ exactDup ++ nearDup).toDF("doc_id", "text").cache()
  }

  test("exact dedup keeps lowest id per fingerprint") {
    val out = Dedup.exact(docs, TextAnalysis.fingerprint(col("text")), Seq(col("doc_id").asc))
    assert(out.count() == 21) // 22 docs, one exact dup removed
    assert(!out.select("doc_id").collect().map(_.getLong(0)).contains(100L))
  }

  test("exact ngram Jaccard finds the planted near-dup pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 100L)), "exact duplicate pair")
    assert(pairs.contains((5L, 101L)), "near duplicate pair")
  }

  test("removeNearDuplicates: anchor policy collapses duplicate chains") {
    // 10~11 and 11~12 are near-dups, 10≁12 (chain). Anchor policy keeps
    // only 10: both 11 and 12 have a lower-id near-duplicate. (A
    // sequential greedy sweep would re-keep 12 — documented deviation.)
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (3 to 14).map(i => s"w$i").mkString(" ")   // J(a,b)=8/12 ≈ 0.67
    val c = (5 to 16).map(i => s"w$i").mkString(" ")   // J(b,c)≈0.67, J(a,c)=6/14≈0.43<0.55
    val chain = Seq((10L, a), (11L, b), (12L, c), (20L, "totally different words here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(chain, "doc_id", "text", 3, 0.55)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L), (11L, 12L)), s"chain premise: $pairs")
    val kept = Dedup.removeNearDuplicates(chain, "doc_id", "text", 3, 0.55)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L))
  }

  test("connectedComponents: min-label propagation over chains and islands") {
    // chain 1-2-3-4-5 (diameter 4, exercises iteration), island 10-11,
    // isolated edge endpoints only — no corpus rows involved
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: high-diameter chain converges within default maxIter (path doubling)") {
    // A 64-diameter path needs 63 plain-propagation rounds — over the
    // default maxIter=25. The pointer-jumping rounds collapse it in
    // O(log D); this test FAILS (non-convergence) if doubling regresses.
    val chain = (0 until 63).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain) // default maxIter = 25
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == 64 && comps.forall(_._2 == 0L))
  }

  test("connectedComponents: reliable-checkpoint path yields identical clusters") {
    // same graph through df.checkpoint() against a checkpoint dir (the
    // cluster-mode option — survives executor loss, unlike localCheckpoint)
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
        .toDF("id_a", "id_b")
      val reliable = Dedup.connectedComponents(edges, checkpointDir = Some(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val local = Dedup.connectedComponents(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(reliable == local)
      assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
        10L -> 10L, 11L -> 10L))
      // storage lifecycle: only the FINAL round's checkpoint survives the
      // run — stale rounds (and the round-0 edge list) are reclaimed
      val roundDirs = new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.startsWith("cc-"))
        .flatMap(_.listFiles().toSeq.filter(_.getName.startsWith("round-")))
      assert(roundDirs.size == 1, s"expected 1 surviving round dir, got $roundDirs")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("clusterNearDuplicates: whole chain collapses to one cluster (vs anchor)") {
    // same 10~11~12 chain as the anchor test: cluster policy assigns all
    // three to cluster 10 (anchor keeps 10 AND 12 — transitive closure
    // is the difference); singleton 20 clusters with itself
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (3 to 14).map(i => s"w$i").mkString(" ")
    val c = (5 to 16).map(i => s"w$i").mkString(" ")
    val chain = Seq((10L, a), (11L, b), (12L, c), (20L, "totally different words here"))
      .toDF("doc_id", "text")
    val out = Dedup.clusterNearDuplicates(chain, "doc_id", "text", 3, 0.55)
      .select("doc_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("dedupClustersKeepBest: the BEST doc per cluster survives, not the anchor") {
    import org.apache.spark.sql.functions.{col, length}
    // same 10~11~12 chain; doc 11 is made the longest, so the quality
    // policy keeps 11 where the anchor policy would keep 10
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (3 to 14).map(i => s"w$i").mkString(" ") + " extraextraextra"
    val c = (5 to 16).map(i => s"w$i").mkString(" ")
    val chain = Seq((10L, a), (11L, b), (12L, c), (20L, "totally different words here"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupClustersKeepBest(chain, "doc_id", "text",
        best = Seq(length(col("text")).desc, col("doc_id")), n = 3, minJaccard = 0.55)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 20L), s"got $kept")
  }

  test("prefix-filtered exact Jaccard == naive exact (PPJoin pruning loses nothing)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.5, 0.8, 0.9)) {
      def canon(dfp: org.apache.spark.sql.DataFrame) = dfp.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e12) / 1e12)).toSet
      val naive = canon(Dedup.ngramJaccardPairs(real, "doc_id", "text", 3, t))
      val prefix = canon(Dedup.ngramJaccardPairsPrefix(real, "doc_id", "text", 3, t))
      assert(prefix == naive, s"t=$t: prefix ${prefix.size} vs naive ${naive.size}; " +
        s"missing=${(naive -- prefix).take(3)} extra=${(prefix -- naive).take(3)}")
    }
    // synthetic chain fixture too (different size distribution)
    val naiveChain = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefixChain = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixChain == naiveChain)
  }

  test("prefix filter keeps a pair whose Jaccard is EXACTLY t (ceil ulp, ADVICE r2)") {
    // t = 9/11, |A|=77, B ⊂ A with |B|=63 → J = 63/77 = 9/11 = t
    // exactly. In doubles 77*(9/11) = 63.00000000000001, so an
    // unguarded ceil(n_sh*t) gives 64: the length filter demanded
    // |B| ≥ 64 and silently dropped this legal boundary pair (and the
    // prefix shrank by one). Verified trigger: math.ceil(77*(9.0/11))
    // == 64 on JVM doubles.
    val t911 = 9.0 / 11.0
    assert(math.ceil(77 * t911) == 64.0, "premise: double product rounds up")
    val a = (0 until 77).map(i => s"w$i").mkString(" ")
    val b = (0 until 63).map(i => s"w$i").mkString(" ")
    val pairDf = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    def got(f: => org.apache.spark.sql.DataFrame) =
      f.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got(Dedup.ngramJaccardPairs(pairDf, "doc_id", "text", 1, t911)) ==
      Set((1L, 2L)), "naive baseline")
    assert(got(Dedup.ngramJaccardPairsPrefix(pairDf, "doc_id", "text", 1, t911)) ==
      Set((1L, 2L)), "prefix path must keep the exact-boundary pair")
  }

  test("MinHash-LSH: candidate recall = 1 and unbiased Jaccard estimates") {
    // candidate recall: every exact pair at j >= 0.5 band-collides
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.keySet.subsetOf(cands), s"missing ${exact.keySet -- cands}")
    // estimator accuracy: est within ~3σ of the true Jaccard
    // (σ = sqrt(j(1−j)/64) ≤ 0.0625 — this is what the old bounded-
    // coefficient hash family silently broke: its estimates collapsed
    // toward all-agree/none-agree instead of tracking j)
    val est = Dedup.minhashLSH(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    exact.foreach { case (pair, j) =>
      assert(est.contains(pair) && math.abs(est(pair) - j) < 0.2,
        s"pair $pair true=$j est=${est.get(pair)}")
    }
    // exact duplicate → identical signatures → est exactly 1.0
    assert(est((3L, 100L)) == 1.0)
  }

  test("SimHash: identical docs at hamming 0, near-dups within 3") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((3L, 100L)).contains(0), "exact dup → hamming 0")
    assert(pairs.contains((5L, 101L)), "near dup within hamming 3")
  }

  test("embedding cosine pairs: planted duplicate vector found") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("LSH ANN returns the brute-force scores for the ids it reports") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bucketed = Similarity.lshBuckets(emb, "vec_id", "embedding", dims = 64, bits = 12)
    val lsh = Similarity.lshTopK(bucketed, "vec_id", "embedding", qvec, 20,
      bits = 12, probeDist = 2).collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(lsh.nonEmpty)
    assert(lsh.head._1 == 0L, "query vector itself must rank first")
    lsh.foreach { case (id, cos) => assert(math.abs(brute(id) - cos) < 1e-12) }
  }

  test("IVF ANN: deterministic index, query's own cluster probed, scores exact") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 16, iters = 2)
    val idx2 = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 16, iters = 2)
    assert(idx.centroids.map(_.toSeq).toSeq == idx2.centroids.map(_.toSeq).toSeq,
      "index build must be deterministic")
    val ivf = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20, nProbe = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    assert(ivf.head._1 == 0L, "query vector itself must rank first")
    ivf.foreach { case (id, cos) => assert(math.abs(brute(id) - cos) < 1e-12) }
  }

  test("IVF ANN: persisted index serves the same top-k as the in-memory one") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 16, iters = 2)
    val table = "ivf_spec_roundtrip"
    Similarity.saveIvfIndex(idx, table)
    val loaded = Similarity.loadIvfIndex(spark, table)
    assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq,
      "centroids survive the table round-trip exactly")
    def top(i: Similarity.IvfIndex) =
      Similarity.ivfTopK(i, "vec_id", "embedding", qvec, 20, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(loaded) == top(idx), "served top-k == in-memory top-k")
    // the probe filter must prune partitions at the source
    val probePlan = loaded.assigned.filter(col("cluster").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("PartitionFilters: []"),
      s"expected partition filters on the cluster-partitioned scan:\n$probePlan")
  }

  /** (path → (size, mtime)) snapshot of a table's parquet data files —
    * the base-file-immutability proxy the upsert tests assert on. */
  private def tableDataFiles(table: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val loc = java.nio.file.Paths.get(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location)
    scala.util.Using.resource(java.nio.file.Files.walk(loc))(
      _.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap)
  }

  test("IVF upsert: delta appended under frozen centroids — base files " +
      "byte-identical, assignments == frozen-centroid recompute") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val table = "ivf_spec_upsert"
    graft.sources.Sources.replaceTable(spark, table)
    graft.sources.Sources.replaceTable(spark, s"${table}_centroids")
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(base, "vec_id", "embedding", nCentroids = 16, iters = 2),
      table)
    // snapshot the partitioned store's data files before the upsert
    def files(): Map[String, (Long, Long)] = tableDataFiles(table)
    val before = files()
    assert(before.nonEmpty)
    Similarity.upsertIvfIndex(delta, "vec_id", "embedding", table)
    val after = files()
    // no full rebuild: every pre-upsert file survives byte-identical;
    // the delta lands as NEW files only
    before.foreach { case (f, meta) =>
      assert(after.get(f).contains(meta), s"upsert rewrote a base file: $f")
    }
    assert(after.size > before.size, "upsert appended no new files")
    val idx = Similarity.loadIvfIndex(spark, table)
    assert(idx.assigned.count() ==
      base.filter(col("embedding").isNotNull).count() +
        delta.filter(col("embedding").isNotNull).count(),
      "row accounting after the append")
    // every stored assignment — base AND delta — must equal a recompute
    // against the frozen centroid set the artifact serves with
    val mismatches = idx.assigned.filter(col("cluster") =!=
      graft.functions.VectorExpressions
        .nearest_centroid_cos(col("embedding"), idx.centroids)).count()
    assert(mismatches == 0, s"$mismatches stored assignments disagree " +
      "with the frozen centroids")
  }

  test("IVF compaction: retrains over corpus ∪ deltas, preserves rows, " +
      "self-consistent fresh generation with the recall contract intact") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val table = "ivf_spec_compact"
    graft.sources.Sources.replaceTable(spark, table)
    graft.sources.Sources.replaceTable(spark, s"${table}_centroids")
    // iters = 3 everywhere: the q_sim_ivf family's parameterization,
    // whose nProbe=12/16 recall contract this test re-asserts
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", nCentroids = 16, iters = 3), table)
    Similarity.upsertIvfIndex(emb.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", table)
    // geometry is derived from the artifact (16 centroids), not passed
    val compacted = Similarity.compactIvfIndex(spark, table,
      "vec_id", "embedding", iters = 3)
    assert(compacted.centroids.length == 16)
    assert(compacted.assigned.count() == emb.count(), "compaction lost rows")
    // the retrain saw corpus ∪ deltas: centroids must match a direct
    // build over the full corpus (same deterministic init; aggregation
    // order can wiggle the means in the last float digits)
    val direct = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 3)
    compacted.centroids.zip(direct.centroids).foreach { case (c, d) =>
      c.zip(d).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    // fresh generation is self-consistent with ITS centroids
    val mismatches = compacted.assigned.filter(col("cluster") =!=
      graft.functions.VectorExpressions
        .nearest_centroid_cos(col("embedding"), compacted.centroids)).count()
    assert(mismatches == 0)
    // and the recall contract holds on the compacted generation
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val exact5 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 5)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.ivfTopK(compacted, "vec_id", "embedding", qvec, 20,
      nProbe = 12).collect().map(_.getLong(0)).toSet
    assert(exact5.subsetOf(ann), s"recall lost after compaction: " +
      s"missing ${exact5 -- ann}")
    // the promote moved the staged partitioned table over the live name:
    // cluster must still be a catalog partition column (probe pruning
    // keys on it) and no staged generation may be left behind
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.partitionColumnNames == Seq("cluster"),
      s"promotion dropped the partition spec: ${meta.partitionColumnNames}")
    assert(!spark.catalog.tableExists(s"${table}__next") &&
      !spark.catalog.tableExists(s"${table}__next_centroids"),
      "staged generation tables left behind after promotion")
  }

  test("serve-during-compaction: the live generation answers unchanged " +
      "through the staged build; only the promote flips content") {
    // deterministic (no racing threads): the build/promote split makes
    // the "live keeps serving through the rebuild" claim a sequence of
    // plain assertions — old content after the staged build completes,
    // new content only after the metadata swap
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val table = "ivf_spec_livegen"
    Seq(table, s"${table}_centroids").foreach(
      graft.sources.Sources.replaceTable(spark, _))
    // live generation: centroids trained on 80%, the rest upserted with
    // frozen assignments — so a retrain over current content MUST move
    // the centroids, making old-vs-new observable
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", nCentroids = 16, iters = 3), table)
    Similarity.upsertIvfIndex(emb.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", table)
    def centroidRows() = spark.table(s"${table}_centroids")
      .orderBy(col("cluster")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    def assignments() = spark.table(table)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val (oldCentroids, oldAssign) = (centroidRows(), assignments())
    Similarity.buildNextIvfGeneration(spark, table, "vec_id", "embedding",
      iters = 3)
    // the staged generation is fully built — and the LIVE tables still
    // serve the old generation, byte-for-byte
    assert(spark.catalog.tableExists(s"${table}__next"))
    assert(centroidRows() == oldCentroids,
      "staged build touched the live centroids")
    assert(assignments() == oldAssign,
      "staged build touched the live assignments")
    val promoted = Similarity.promoteIvfGeneration(spark, table)
    // now — and only now — the retrained generation serves: centroids
    // equal a direct full-corpus build's (deterministic k-means), rows
    // self-consistent with them
    val direct = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 3)
    promoted.centroids.zip(direct.centroids).foreach { case (c, d) =>
      c.zip(d).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    assert(centroidRows() != oldCentroids,
      "promote served the old generation — the swap did nothing")
    val mismatches = spark.table(table).filter(col("cluster") =!=
      graft.functions.VectorExpressions.nearest_centroid_cos(
        col("embedding"), promoted.centroids)).count()
    assert(mismatches == 0,
      s"$mismatches promoted assignments disagree with the new centroids")
    assert(!spark.catalog.tableExists(s"${table}__next"))
    // promoting again without a staged build fails fast
    intercept[IllegalArgumentException] {
      Similarity.promoteIvfGeneration(spark, table)
    }
  }

  test("compaction failure safety: a build that dies mid-retrain leaves " +
      "the live generation serving and no staged debris") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val table = "ivf_spec_failsafe"
    Seq(table, s"${table}_centroids").foreach(
      graft.sources.Sources.replaceTable(spark, _))
    Similarity.saveIvfIndex(Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 1), table)
    val rowsBefore = Similarity.loadIvfIndex(spark, table).assigned.count()
    // a build the caller got wrong (unresolvable vector column) dies
    // inside the retrain, BEFORE any promote — under the old
    // drop-then-rewrite shape this was the data-loss window
    intercept[Exception] {
      Similarity.compactIvfIndex(spark, table, "vec_id", "no_such_col",
        iters = 1)
    }
    val after = Similarity.loadIvfIndex(spark, table)
    assert(after.assigned.count() == rowsBefore,
      "failed compaction touched the live generation")
    assert(after.centroids.length == 8)
    assert(!spark.catalog.tableExists(s"${table}__next") &&
      !spark.catalog.tableExists(s"${table}__next_centroids"),
      "failed compaction left staged debris")
  }

  test("LSH upsert: appended layout is content-identical to a full " +
      "rebuild — deterministic hyperplanes leave nothing to drift") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val (ups, reb) = ("lsh_spec_upsert", "lsh_spec_rebuild")
    Seq(ups, reb).foreach { t =>
      (0 until 3).foreach(i =>
        graft.sources.Sources.replaceTable(spark, s"${t}_t$i"))
      graft.sources.Sources.replaceTable(spark, s"${t}_meta")
    }
    Similarity.saveLshIndex(emb.filter(col("vec_id") % 5 =!= 0),
      "embedding", dims = 64, ups, bits = 8, tables = 3)
    Similarity.upsertLshIndex(emb.filter(col("vec_id") % 5 === 0),
      "embedding", ups)
    Similarity.saveLshIndex(emb, "embedding", dims = 64, reb,
      bits = 8, tables = 3)
    // per-table content equality: same (vec_id, bucket) assignment set
    (0 until 3).foreach { t =>
      def pairs(tbl: String) = spark.table(s"${tbl}_t$t")
        .select(col("vec_id"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(ups) == pairs(reb),
        s"table $t: upserted layout diverges from the rebuild")
    }
    // and the served ranking is identical
    def top(tbl: String) = Similarity.lshTopKServed(spark, tbl, "vec_id",
      "embedding", qvec, 20, probeDist = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(ups) == top(reb))
    // file compaction heals the upsert's per-bucket file accumulation
    // without rehashing: fewer data files, identical content + ranking,
    // bucket partitioning preserved through the promote
    val filesBefore = (0 until 3).map(t => tableDataFiles(s"${ups}_t$t").size)
    Similarity.compactLshIndex(spark, ups)
    (0 until 3).foreach { t =>
      val n = tableDataFiles(s"${ups}_t$t").size
      assert(n < filesBefore(t),
        s"table $t: compaction did not reduce files (${filesBefore(t)} -> $n)")
      def pairs(tbl: String) = spark.table(s"${tbl}_t$t")
        .select(col("vec_id"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(ups) == pairs(reb),
        s"table $t: compaction changed the layout content")
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${ups}_t$t"))
      assert(meta.partitionColumnNames == Seq("bucket"),
        s"table $t: promotion dropped the partition spec")
      assert(!spark.catalog.tableExists(s"${ups}_t${t}__next"),
        s"table $t: staged generation left behind")
    }
    assert(top(ups) == top(reb), "compaction changed the served ranking")
  }

  test("PQ upsert + compaction: delta encoded with frozen codebooks, " +
      "no corpus re-encode; compaction retrains and re-encodes") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val table = "pq_spec_upsert"
    graft.sources.Sources.replaceTable(spark, table)
    graft.sources.Sources.replaceTable(spark, s"${table}_codebooks")
    Similarity.savePqIndex(
      Similarity.pqIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", dims = 64, m = 16, nCodes = 32, iters = 4),
      table)
    val baseBooks = Similarity.loadPqIndex(spark, table).codebooks
    // snapshot data files: the upsert must append, never rewrite
    def files(): Map[String, (Long, Long)] = tableDataFiles(table)
    val before = files()
    assert(before.nonEmpty)
    Similarity.upsertPqIndex(emb.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", table)
    val after = files()
    before.foreach { case (f, meta) =>
      assert(after.get(f).contains(meta), s"upsert rewrote a base file: $f")
    }
    assert(after.size > before.size, "upsert appended no new files")
    val upserted = Similarity.loadPqIndex(spark, table)
    assert(upserted.encoded.count() == emb.count())
    // every stored code — base AND delta — equals a frozen-codebook
    // recompute (codebooks unchanged by the append)
    assert(upserted.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      baseBooks.map(_.map(_.toSeq).toSeq).toSeq)
    import graft.functions.VectorExpressions.{vec_l2_normalize, pq_encode}
    val mismatches = upserted.encoded.filter(col("pq_code") =!=
      pq_encode(vec_l2_normalize(col("embedding")), baseBooks)).count()
    assert(mismatches == 0, s"$mismatches stored codes disagree with the " +
      "frozen codebooks")
    // compaction retrains over corpus ∪ deltas == a direct full build
    // geometry (m=16, nCodes=32, dims=m×subDim=64) derives from the
    // artifact's codebook tensor, not from caller arguments
    val compacted = Similarity.compactPqIndex(spark, table,
      "vec_id", "embedding", iters = 4)
    val direct = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 16, nCodes = 32, iters = 4)
    assert(compacted.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      direct.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "compaction's retrain must equal a direct full-corpus build")
    assert(compacted.encoded.count() == emb.count(), "compaction lost rows")
  }

  test("PQ ANN: deterministic codebooks, codes in range, rerank recall") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 16, nCodes = 32, iters = 4)
    val idx2 = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 16, nCodes = 32, iters = 4)
    assert(idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx2.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "codebook training must be deterministic")
    assert(idx.codebooks.length == 16)
    assert(idx.codebooks.forall(_.forall(_.length == 4)), "64/16 = 4-dim subspaces")
    val codes = idx.encoded.select("pq_code").limit(50).collect()
      .map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 16 && c.forall(j => j >= 0 && j < 32)))
    // rerank recall: exact top-5 must survive ADC candidate generation
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 5)
      .collect().map(_.getLong(0)).toSet
    val pq = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 100).collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(pq.head._1 == 0L, "query vector itself must rank first")
    assert(brute.subsetOf(pq.map(_._1).toSet),
      s"exact top-5 $brute not within PQ top-20 ${pq.map(_._1).toSeq}")
    // reranked scores are exact cosines, not ADC approximations
    val bruteAll = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pq.foreach { case (id, cos) => assert(math.abs(bruteAll(id) - cos) < 1e-12) }
  }

  test("LSH ANN: persisted layout serves the same top-k as the in-memory filter") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val table = "lsh_spec_roundtrip"
    Similarity.saveLshIndex(emb, "embedding", dims = 64, table,
      bits = 8, tables = 3)
    val served = Similarity.lshTopKServed(spark, table, "vec_id", "embedding",
      qvec, 20, probeDist = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bucketed = Similarity.lshBucketsMulti(emb, "vec_id", "embedding",
      dims = 64, bits = 8, tables = 3)
    val inMem = Similarity.lshTopKMulti(bucketed, "vec_id", "embedding", qvec, 20,
      bits = 8, probeDist = 4, tables = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == inMem, "enumerated IN probes == Hamming filter semantics")
    // the probe set must prune partitions at the source
    val plan = spark.table(s"${table}_t0").filter(col("bucket").isin(0L, 1L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("PartitionFilters: []"),
      s"expected partition filters on the bucket-partitioned scan:\n$plan")
  }

  test("LSH serving economics: selective probes read a small corpus " +
      "fraction; widening the radius trades scan for recall") {
    // The regime the persisted layout exists for (OPERATORS.md documents
    // that at bench SF the near-uniform corpus makes wide probes cover
    // most buckets): SELECTIVE probes must scan far less than the corpus.
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val table = "lsh_spec_economics"
    Similarity.saveLshIndex(emb, "embedding", dims = 64, table,
      bits = 8, tables = 3)
    // candidate rows actually read per probe radius = the scan the
    // partition filter lets through, before rerank
    def scanned(probeDist: Int): Long =
      Similarity.lshServedCandidates(spark, table, "vec_id", "embedding",
        qvec, probeDist).count()
    val exactBucket = scanned(0)   // 3 probes of 256 buckets per table
    val radius1 = scanned(1)       // 27 probes
    assert(exactBucket < n / 10,
      s"probeDist=0 scanned $exactBucket of $n — not selective")
    assert(radius1 <= n && exactBucket <= radius1,
      "scan grows monotonically with probe radius")
    // radius-0 candidates still contain the query itself (its own bucket)
    val top = Similarity.lshTopKServed(spark, table, "vec_id", "embedding",
      qvec, 1, probeDist = 0).collect()
    assert(top.head.getLong(0) == 0L, "query's own bucket must serve it back")
  }

  test("PQ ANN: persisted index serves the same top-k as the in-memory one") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qvec = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 16, nCodes = 32, iters = 4)
    val table = "pq_spec_roundtrip"
    Similarity.savePqIndex(idx, table)
    val loaded = Similarity.loadPqIndex(spark, table)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks survive the table round-trip exactly")
    def top(i: Similarity.PqIndex) =
      Similarity.pqTopK(i, "vec_id", "embedding", qvec, 20, candidates = 100)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(loaded) == top(idx), "served top-k == in-memory top-k")
  }

  // Planted cluster structure: 4 well-separated directions in 8 dims,
  // 10 vectors each with small deterministic jitter — within-cluster
  // cosine ~0.99, across ~0. The regime SemDeDup assumes.
  lazy val plantedEmb = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.05f * (((c * 10 + i) * 7 % 5) - 2))
      v(c * 2) = 10f
      ((c * 10 + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("semanticPairs: sound subset of exact pairs, full recall on clustered data") {
    val exact = Dedup.embeddingCosinePairs(plantedEmb, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").cache()
    val cands = Dedup.semanticPairs(plantedEmb, "vec_id", "embedding", 0.9,
      nCentroids = 4, probes = 2).select("id_a", "id_b").cache()
    // soundness: cluster-scoped pairs are real pairs (same arithmetic)
    assert(cands.join(exact, Seq("id_a", "id_b"), "left_anti").count() == 0)
    // on data WITH cluster structure the trade costs nothing: recall = 1
    val nExact = exact.count()
    assert(nExact > 100, s"planted clusters should be pair-dense, got $nExact")
    assert(exact.join(cands, Seq("id_a", "id_b"), "left_semi").count() == nExact)
  }

  test("semanticPairs clears the 0.9 gate floor on the near-uniform corpus") {
    // the q_dedup_semantic parameters at the gate SF — this is the test
    // that keeps the gate's recall floor honest (measured 0.95 here)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").cache()
    val cands = Dedup.semanticPairs(emb, "vec_id", "embedding", 0.35,
      nCentroids = 8, probes = 3).select("id_a", "id_b")
    val nExact = exact.count()
    val hit = exact.join(cands, Seq("id_a", "id_b"), "left_semi").count()
    assert(hit >= math.ceil(nExact * 0.9).toLong,
      s"semantic recall $hit/$nExact under the 0.9 gate floor")
  }

  test("semanticDedup drops exactly the higher-id side of semantic pairs") {
    val out = Dedup.semanticDedup(plantedEmb, "vec_id", "embedding", 0.9,
      nCentroids = 4, probes = 2)
    val dropped = Dedup.semanticPairs(plantedEmb, "vec_id", "embedding", 0.9,
      nCentroids = 4, probes = 2)
      .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(dropped).isEmpty)
    assert(kept.size + dropped.size == 40)
  }
}
