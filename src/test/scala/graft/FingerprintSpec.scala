package graft

import org.apache.spark.sql.functions._
import graft.operators.{Search, Similarity}
import graft.sources.Sources

/** Library-level source-staleness detection for the build-once
  * `*IndexFor` helpers (round 12): a stored artifact whose stamped
  * source fingerprint differs from the request rebuilds instead of
  * silently serving stale data — previously the protection lived only
  * in the gate harness's mtime-keyed names. */
class FingerprintSpec extends SparkSpec {

  test("pathFingerprint: metadata-only, changes with content length / " +
      "mtime, stable for an untouched path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fp-")
    val f = dir.resolve("src.parquet")
    java.nio.file.Files.write(f, "one".getBytes)
    val fp1 = Sources.pathFingerprint(spark, f.toString)
    assert(fp1 == Sources.pathFingerprint(spark, f.toString),
      "fingerprint must be stable for an untouched file")
    java.nio.file.Files.write(f, "regenerated".getBytes)
    assert(Sources.pathFingerprint(spark, f.toString) != fp1,
      "a regenerated file must change the fingerprint")
    // directory form folds the children
    val dfp1 = Sources.pathFingerprint(spark, dir.toString)
    java.nio.file.Files.write(dir.resolve("part-2"), "x".getBytes)
    assert(Sources.pathFingerprint(spark, dir.toString) != dfp1,
      "a new child must change a directory fingerprint")
  }

  test("bm25IndexFor: same fingerprint reuses the artifact, a changed " +
      "fingerprint rebuilds over the new corpus, empty keeps the " +
      "name-identifies-a-build contract") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val c1 = docs.filter(col("doc_id") % 2 === 0)
    val table = "bm25_spec_fp"
    Seq(table, s"${table}_stats", s"${table}_fp").foreach(
      Sources.replaceTable(spark, _))
    val i1 = Search.bm25IndexFor(c1, "doc_id", "text", table,
      fingerprint = "gen1")
    assert(i1.nDocs == c1.count())
    // same fingerprint + a different frame: build-once, artifact serves
    val i2 = Search.bm25IndexFor(docs, "doc_id", "text", table,
      fingerprint = "gen1")
    assert(i2.nDocs == c1.count(), "matching fingerprint must reuse")
    // the regenerated-source shape: new fingerprint → rebuild in place
    val i3 = Search.bm25IndexFor(docs, "doc_id", "text", table,
      fingerprint = "gen2")
    assert(i3.nDocs == docs.count(),
      "changed fingerprint must rebuild over the new corpus")
    // empty fingerprint: legacy contract — whatever is stored serves
    val i4 = Search.bm25IndexFor(c1, "doc_id", "text", table)
    assert(i4.nDocs == docs.count())
    // a parameter mismatch still rebuilds even under a matching
    // fingerprint (the structural checks compose, not replace)
    val i5 = Search.bm25IndexFor(c1, "doc_id", "text", table, buckets = 8,
      fingerprint = "gen2")
    assert(i5.nDocs == c1.count())
  }

  test("ivfIndexFor / lshIndexFor / pqIndexFor / shingleIndexFor honor " +
      "the fingerprint") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val half = emb.filter(col("vec_id") % 2 === 0)
    val halfN = half.filter(col("embedding").isNotNull).count()
    val fullN = emb.filter(col("embedding").isNotNull).count()

    val ivf = "ivf_spec_fp"
    Seq(ivf, s"${ivf}_centroids", s"${ivf}_fp", s"${ivf}_folded").foreach(
      Sources.replaceTable(spark, _))
    assert(Similarity.ivfIndexFor(half, "vec_id", "embedding", ivf,
      nCentroids = 8, iters = 1, fingerprint = "g1")
      .assigned.count() == halfN)
    assert(Similarity.ivfIndexFor(emb, "vec_id", "embedding", ivf,
      nCentroids = 8, iters = 1, fingerprint = "g1")
      .assigned.count() == halfN, "matching fingerprint must reuse")
    assert(Similarity.ivfIndexFor(emb, "vec_id", "embedding", ivf,
      nCentroids = 8, iters = 1, fingerprint = "g2")
      .assigned.count() == fullN, "changed fingerprint must rebuild")

    val lsh = "lsh_spec_fp"
    (0 until 2).foreach(i => Sources.replaceTable(spark, s"${lsh}_t$i"))
    Seq(s"${lsh}_meta", s"${lsh}_fp").foreach(Sources.replaceTable(spark, _))
    Similarity.lshIndexFor(half, "embedding", dims = 64, lsh,
      bits = 6, tables = 2, fingerprint = "g1")
    val lshRows1 = spark.table(s"${lsh}_t0").count()
    Similarity.lshIndexFor(emb, "embedding", dims = 64, lsh,
      bits = 6, tables = 2, fingerprint = "g1")
    assert(spark.table(s"${lsh}_t0").count() == lshRows1,
      "matching fingerprint must reuse")
    Similarity.lshIndexFor(emb, "embedding", dims = 64, lsh,
      bits = 6, tables = 2, fingerprint = "g2")
    assert(spark.table(s"${lsh}_t0").count() > lshRows1,
      "changed fingerprint must rebuild")

    val pq = "pq_spec_fp"
    Seq(pq, s"${pq}_codebooks", s"${pq}_fp").foreach(
      Sources.replaceTable(spark, _))
    assert(Similarity.pqIndexFor(half, "vec_id", "embedding", dims = 64,
      pq, m = 8, nCodes = 16, iters = 2, fingerprint = "g1")
      .encoded.count() == halfN)
    assert(Similarity.pqIndexFor(emb, "vec_id", "embedding", dims = 64,
      pq, m = 8, nCodes = 16, iters = 2, fingerprint = "g1")
      .encoded.count() == halfN, "matching fingerprint must reuse")
    assert(Similarity.pqIndexFor(emb, "vec_id", "embedding", dims = 64,
      pq, m = 8, nCodes = 16, iters = 2, fingerprint = "g2")
      .encoded.count() == fullN, "changed fingerprint must rebuild")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dHalf = docs.filter(col("doc_id") % 2 === 0)
    val sh = "shingle_spec_fp"
    Seq(sh, s"${sh}_meta", s"${sh}_fp").foreach(Sources.replaceTable(spark, _))
    import graft.operators.Contamination
    val n1 = Contamination.shingleIndexFor(dHalf, "doc_id", "text", sh,
      n = 3, fingerprint = "g1").count()
    assert(Contamination.shingleIndexFor(docs, "doc_id", "text", sh,
      n = 3, fingerprint = "g1").count() == n1,
      "matching fingerprint must reuse")
    assert(Contamination.shingleIndexFor(docs, "doc_id", "text", sh,
      n = 3, fingerprint = "g2").count() > n1,
      "changed fingerprint must rebuild")
  }

  test("stamp TTL dials: the general latency dial silences a latency-" +
      "tolerant cache's listings; the COMPLIANCE caches (fingerprints) " +
      "keep re-checking until their own dial is set explicitly") {
    val table = "fp_ttl_spec"
    Sources.replaceTable(spark, table)
    Sources.replaceTable(spark, s"${table}_fp")
    Sources.writeFingerprint(spark, table, "gen1")
    // default (both dials 0): every lookup pays exactly its stamp listing
    val n0 = Sources.stampListings.get()
    assert(Sources.readFingerprint(spark, table) == Some("gen1"))
    assert(Sources.stampListings.get() > n0,
      "a TTL-0 lookup skipped the stamp check")
    // the GENERAL latency dial silences a latency-tolerant stamped
    // cache within its window ...
    val general = scala.collection.concurrent
      .TrieMap.empty[String, (String, Long, Int)]
    def lookupGeneral(): Int =
      Sources.stamped(spark, general, "k", s"${table}_fp")(42)
    spark.conf.set("spark.graft.stampCheckTtlMs", "60000")
    try {
      assert(lookupGeneral() == 42) // primes the window
      val g1 = Sources.stampListings.get()
      assert(lookupGeneral() == 42 && lookupGeneral() == 42)
      assert(Sources.stampListings.get() == g1,
        "a general-dial lookup inside the TTL window paid a listing")
      // ... but the COMPLIANCE fingerprint cache is carved out: setting
      // the latency dial must NOT widen the stale-artifact-reuse
      // window, so it still re-stamps every call
      assert(Sources.readFingerprint(spark, table) == Some("gen1"))
      val c1 = Sources.stampListings.get()
      assert(Sources.readFingerprint(spark, table) == Some("gen1"))
      assert(Sources.stampListings.get() > c1,
        "the general latency dial silenced a COMPLIANCE cache's " +
          "stamp checks — the carve-out regressed")
      // the compliance window is its OWN explicit opt-in
      spark.conf.set("spark.graft.stampCheckTtlMs.compliance", "60000")
      assert(Sources.readFingerprint(spark, table) == Some("gen1"))
      val c2 = Sources.stampListings.get()
      assert(Sources.readFingerprint(spark, table) == Some("gen1"))
      assert(Sources.readFingerprint(spark, table) == Some("gen1"))
      assert(Sources.stampListings.get() == c2,
        "a lookup inside the explicit compliance window paid a listing")
      // read-your-own-writes holds inside any window: the writer
      // re-primes its own session's entry
      Sources.writeFingerprint(spark, table, "gen2")
      assert(Sources.readFingerprint(spark, table) == Some("gen2"),
        "writeFingerprint must re-prime its own session's entry")
    } finally {
      spark.conf.unset("spark.graft.stampCheckTtlMs")
      spark.conf.unset("spark.graft.stampCheckTtlMs.compliance")
    }
    // back at TTL 0: the next lookup re-lists (exact next-call coherence)
    val n2 = Sources.stampListings.get()
    assert(Sources.readFingerprint(spark, table) == Some("gen2"))
    assert(Sources.stampListings.get() > n2)
  }
}
