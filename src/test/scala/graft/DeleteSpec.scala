package graft

import org.apache.spark.sql.functions._
import graft.operators.{Search, Similarity, Tombstones}
import graft.sources.Sources

/** The TAKEDOWN tier ([[graft.operators.Tombstones]]): tombstone-masked
  * deletion from every serving-artifact family, exact BM25 constant
  * correction, and PHYSICAL erasure at the compaction cadence — pinned
  * by reading the raw parquet files back, not just the serve path. */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val deadDocs = docs.filter(col("doc_id") % 7 === 3)
  private lazy val liveDocs = docs.filter(col("doc_id") % 7 =!= 3)
  private lazy val deadVecs = emb.filter(col("vec_id") % 7 === 3)
  private lazy val liveVecs = emb.filter(col("vec_id") % 7 =!= 3)

  private def resetBm25(table: String): Unit =
    Seq(table, s"${table}_stats", s"${table}_deleted", s"${table}__next",
      s"${table}__next_basis").foreach(Sources.replaceTable(spark, _))

  /** Raw file-level read of a table's current data files — what a
    * regulator sees, bypassing every catalog-level mask. */
  private def rawRows(table: String) =
    spark.read.parquet(Sources.tableDataFiles(spark, table): _*)

  test("BM25: masked serve is content-identical to an index built " +
      "without the deleted documents — postings AND corpus constants") {
    val table = "del_bm25_mask"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")))
    val served = Search.loadBm25Index(spark, table)
    val direct = Search.buildBm25Index(liveDocs, "doc_id", "text")
    assert(served.nDocs == direct.nDocs,
      s"n_docs: served ${served.nDocs} vs direct ${direct.nDocs}")
    assert(served.totalLen == direct.totalLen,
      s"total_len: served ${served.totalLen} vs direct ${direct.totalLen}")
    assert(served.avgLen == direct.avgLen, "avg_len must re-derive exactly")
    assert(served.postings.exceptAll(direct.postings).isEmpty &&
      direct.postings.exceptAll(served.postings).isEmpty,
      "masked postings differ from a build without the deleted docs")
  }

  test("BM25: deleting a zero-token document still decrements n_docs " +
      "(doclen captured as 0), and re-deleting is a no-op") {
    val table = "del_bm25_zero"
    resetBm25(table)
    val tiny = Seq((1L, "alpha beta"), (2L, ""), (3L, "gamma"))
      .toDF("doc_id", "text")
    Search.saveBm25Index(Search.buildBm25Index(tiny, "doc_id", "text"),
      table, buckets = 2)
    val dead = Seq(1L, 2L).toDF("doc_id")
    Search.deleteBm25Docs(spark, table, dead)
    val once = Search.loadBm25Index(spark, table)
    assert(once.nDocs == 1 && once.totalLen == 1,
      s"expected (1 doc, 1 token) live, got (${once.nDocs}, ${once.totalLen})")
    // re-delete: tombstone set and constants unchanged
    Search.deleteBm25Docs(spark, table, dead)
    val twice = Search.loadBm25Index(spark, table)
    assert(twice.nDocs == 1 && twice.totalLen == 1,
      "re-deleting the same ids skewed the constants")
    assert(spark.table(s"${table}_deleted").count() == 2,
      "re-delete appended duplicate tombstone rows")
  }

  /** Synthesize one complete streaming-admitted BM25 segment (the
    * bm25IngestSink layout: postings/, then the 1-row stats/ marker). */
  private def writeBm25Segment(segDir: String, batch: Int,
      slice: org.apache.spark.sql.DataFrame): Unit = {
    val d = Search.buildBm25Index(slice, "doc_id", "text")
    d.postings.write.mode("overwrite").parquet(s"$segDir/batch=$batch/postings")
    Seq((d.nDocs, d.totalLen)).toDF("n_docs", "total_len")
      .write.mode("overwrite").parquet(s"$segDir/batch=$batch/stats")
  }

  test("BM25: a takedown of a SEGMENT-RESIDENT doc issued with segDir " +
      "captures its exact doclen — served constants are bit-exact " +
      "before any fold or reclaim; a base-only capture is not") {
    val table = "del_bm25_seg"
    resetBm25(table)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val streamed = docs.filter(col("doc_id") % 5 === 0)
    Search.saveBm25Index(Search.buildBm25Index(base, "doc_id", "text"),
      table, buckets = 4)
    val segDir = java.nio.file.Files
      .createTempDirectory("del_bm25_seg").toString
    writeBm25Segment(segDir, 0, streamed)
    // the takedown set straddles base and segment residency; segDir
    // makes the capture scan base ∪ complete segments
    Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")),
      segDir = segDir)
    val served = Search.loadBm25IndexWithSegments(spark, table, segDir)
    val direct = Search.buildBm25Index(liveDocs, "doc_id", "text")
    assert(served.nDocs == direct.nDocs,
      s"n_docs: served ${served.nDocs} vs direct ${direct.nDocs}")
    assert(served.totalLen == direct.totalLen,
      s"total_len: served ${served.totalLen} vs direct ${direct.totalLen} " +
        "— the segment-resident doclen capture missed")
    assert(served.avgLen == direct.avgLen, "avg_len must re-derive exactly")
    assert(served.postings.exceptAll(direct.postings).isEmpty &&
      direct.postings.exceptAll(served.postings).isEmpty,
      "masked base ∪ segment postings differ from a build without the dead")
    // fold afterwards: the segment's stats (incl. the dead doc's len)
    // merge into the base, the tombstone's exact correction still holds
    Search.foldBm25Segments(spark, table, segDir)
    val folded = Search.loadBm25Index(spark, table)
    assert(folded.nDocs == direct.nDocs && folded.totalLen == direct.totalLen,
      s"post-fold constants: (${folded.nDocs}, ${folded.totalLen}) vs " +
        s"direct (${direct.nDocs}, ${direct.totalLen})")
    // CONTRAST — the non-vacuousness pin: the same takedown issued
    // WITHOUT segDir captures segment-resident docs at doclen 0, so
    // n_docs corrects but total_len stays over-counted (the documented
    // residual this parameter exists to close)
    val table2 = "del_bm25_seg0"
    resetBm25(table2)
    Search.saveBm25Index(Search.buildBm25Index(base, "doc_id", "text"),
      table2, buckets = 4)
    val segDir2 = java.nio.file.Files
      .createTempDirectory("del_bm25_seg0").toString
    writeBm25Segment(segDir2, 0, streamed)
    Search.deleteBm25Docs(spark, table2, deadDocs.select(col("doc_id")))
    val residual = Search.loadBm25IndexWithSegments(spark, table2, segDir2)
    val segDeadLen = streamed.filter(col("doc_id") % 7 === 3)
      .select(graft.functions.TextAnalysis.words(col("text")).as("__ws"))
      .select(size(filter(col("__ws"), w => w =!= lit(""))).cast("long").as("l"))
      .agg(coalesce(sum(col("l")), lit(0L))).head().getLong(0)
    assert(segDeadLen > 0, "premise: segment-resident dead docs have tokens")
    assert(residual.nDocs == direct.nDocs,
      "n_docs corrects regardless of residency")
    assert(residual.totalLen == direct.totalLen + segDeadLen,
      s"expected the base-only capture to leave total_len over-counted " +
        s"by exactly $segDeadLen (got ${residual.totalLen} vs exact " +
        s"${direct.totalLen})")
  }

  test("cross-session coherence: a BM25 takedown committed in session " +
      "A corrects the constants session B serves — without restart") {
    val table = "del_bm25_xsession"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    val sessionB = spark.newSession()
    // prime BOTH sessions' constants caches with pre-delete values
    val beforeB = Search.loadBm25Index(sessionB, table)
    Search.loadBm25Index(spark, table)
    val direct = Search.buildBm25Index(liveDocs, "doc_id", "text")
    assert(beforeB.nDocs != direct.nDocs,
      "premise: pre-delete constants differ from the post-delete truth")
    // the takedown commits in A...
    Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")))
    // ...and B's next serve call picks it up: the tombstone sibling's
    // generation stamp changed, so B's cached aggregate re-keys
    val afterB = Search.loadBm25Index(sessionB, table)
    assert(afterB.nDocs == direct.nDocs && afterB.totalLen == direct.totalLen,
      s"session B served stale constants after A's delete: " +
        s"(${afterB.nDocs}, ${afterB.totalLen}) vs direct " +
        s"(${direct.nDocs}, ${direct.totalLen})")
    // and a mutation through the STATS table (upsert in A) re-keys too
    val fresh = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    Search.upsertBm25Index(fresh, "doc_id", "text", table)
    val direct2 = Search.buildBm25Index(liveDocs.unionByName(fresh),
      "doc_id", "text")
    val afterUpsertB = Search.loadBm25Index(sessionB, table)
    assert(afterUpsertB.nDocs == direct2.nDocs &&
      afterUpsertB.totalLen == direct2.totalLen,
      "session B served stale constants after A's upsert")
  }

  test("compliance TTL carve-out: a takedown committed in session A is " +
      "masked on session B's NEXT serve even when the latency TTL is " +
      "set — the general dial cannot widen takedown visibility") {
    val table = "del_bm25_ttl"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    val sessionB = spark.newSession()
    spark.conf.set("spark.graft.stampCheckTtlMs", "60000")
    sessionB.conf.set("spark.graft.stampCheckTtlMs", "60000")
    try {
      // prime B's constants caches inside its TTL window
      val beforeB = Search.loadBm25Index(sessionB, table)
      val direct = Search.buildBm25Index(liveDocs, "doc_id", "text")
      assert(beforeB.nDocs != direct.nDocs,
        "premise: pre-delete constants differ from post-delete truth")
      Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")))
      // B's NEXT serve must be masked: the tombstone aggregate is a
      // COMPLIANCE cache and ignores the general latency dial
      val afterB = Search.loadBm25Index(sessionB, table)
      assert(afterB.nDocs == direct.nDocs &&
        afterB.totalLen == direct.totalLen,
        s"session B served unmasked constants inside its latency TTL " +
          s"window: (${afterB.nDocs}, ${afterB.totalLen}) vs direct " +
          s"(${direct.nDocs}, ${direct.totalLen})")
      assert(afterB.postings
        .join(broadcast(deadDocs.select(col("doc_id"))), Seq("doc_id"),
          "left_semi").isEmpty,
        "deleted docs still served to session B inside its TTL window")
    } finally {
      spark.conf.unset("spark.graft.stampCheckTtlMs")
      sessionB.conf.unset("spark.graft.stampCheckTtlMs")
    }
  }

  test("read-your-own-writes under a nonzero latency TTL: a session's " +
      "own upsert invalidates its cached constants at commit, so it " +
      "serves the merged stats immediately") {
    val table = "del_bm25_ryow"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    spark.conf.set("spark.graft.stampCheckTtlMs", "60000")
    try {
      val before = Search.loadBm25Index(spark, table) // primes the window
      val fresh = docs.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      Search.upsertBm25Index(fresh, "doc_id", "text", table)
      val direct = Search.buildBm25Index(docs.unionByName(
        fresh.select(col("doc_id"), col("text"))), "doc_id", "text")
      assert(before.nDocs != direct.nDocs, "premise: the upsert grows n_docs")
      val after = Search.loadBm25Index(spark, table)
      assert(after.nDocs == direct.nDocs && after.totalLen == direct.totalLen,
        s"the upserting session served its own PRE-upsert constants " +
          s"inside the TTL window: (${after.nDocs}, ${after.totalLen}) " +
          s"vs direct (${direct.nDocs}, ${direct.totalLen})")
    } finally spark.conf.unset("spark.graft.stampCheckTtlMs")
  }

  test("BM25 reclaim: compaction physically erases the deleted docs, " +
      "corrects stats exactly once, and retires the tombstones") {
    val table = "del_bm25_reclaim"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")))
    Search.compactBm25Index(spark, table)
    // physical: the raw files carry none of the deleted ids
    assert(rawRows(table)
      .join(broadcast(deadDocs.select(col("doc_id"))), Seq("doc_id"),
        "left_semi").isEmpty,
      "deleted ids still present in the compacted generation's files")
    // tombstones consumed; serve path is mask-free
    assert(!spark.catalog.tableExists(s"${table}_deleted"),
      "consumed tombstones were not retired at the promote")
    // stats corrected exactly once
    val served = Search.loadBm25Index(spark, table)
    val direct = Search.buildBm25Index(liveDocs, "doc_id", "text")
    assert(served.nDocs == direct.nDocs && served.totalLen == direct.totalLen,
      s"stats after reclaim: (${served.nDocs}, ${served.totalLen}) vs " +
        s"direct (${direct.nDocs}, ${direct.totalLen})")
  }

  test("BM25 reclaim: a promote that crashed after its swap resumes — " +
      "token guard blocks a second stats subtraction, tombstones retire") {
    val table = "del_bm25_resume"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")))
    Search.buildNextBm25Layout(spark, table)
    // snapshot the basis rows and the tombstone FILES (exact paths and
    // bytes — the resume's retire diffs the basis's consumed paths
    // against the sibling's current files, so the recreated crash state
    // must carry the ORIGINAL paths), run the promote to completion,
    // then recreate the crashed-after-swap state: stats subtracted +
    // postings swapped, but basis and tombstones linger
    val basisRows = spark.table(s"${table}__next_basis").collect().toSeq
    val basisSchema = spark.table(s"${table}__next_basis").schema
    val fs = new org.apache.hadoop.fs.Path("/tmp/graft-warehouse")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_deleted"))
        .location)
    val tombFiles = Sources.tableDataFiles(spark, s"${table}_deleted")
      .map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val in = fs.open(p)
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, true)
        (p, bytes.toByteArray)
      }
    Search.promoteBm25Layout(spark, table)
    val healthy = Search.loadBm25Index(spark, table)
    // restore the tombstone dir byte-for-byte at the original paths and
    // re-register the table there (the crash left both intact)
    tombFiles.foreach { case (p, bytes) =>
      val out = fs.create(p, true)
      out.write(bytes); out.close()
    }
    spark.sql(s"CREATE TABLE ${table}_deleted (doc_id BIGINT, " +
      s"doclen BIGINT) USING parquet LOCATION '$tombLoc'")
    spark.createDataFrame(basisRows.asJava, basisSchema)
      .write.format("parquet")
      .options(Sources.stagedWriteOptions(spark, s"${table}__next_basis"))
      .saveAsTable(s"${table}__next_basis")
    // the resume: staged table gone, basis present
    Search.promoteBm25Layout(spark, table)
    val resumed = Search.loadBm25Index(spark, table)
    assert(resumed.nDocs == healthy.nDocs &&
      resumed.totalLen == healthy.totalLen,
      "promote resume re-subtracted the consumed tombstones' stats")
    assert(!spark.catalog.tableExists(s"${table}_deleted"),
      "promote resume did not retire the lingering tombstones")
    assert(!spark.catalog.tableExists(s"${table}__next_basis"),
      "promote resume did not drop the basis")
  }

  test("BM25: reclaim and concurrent-upsert catch-up compose — a delta " +
      "admitted mid-rebuild survives the same promote that erases the " +
      "tombstoned docs, with stats exact for both") {
    val table = "del_bm25_combo"
    resetBm25(table)
    Search.saveBm25Index(Search.buildBm25Index(docs, "doc_id", "text"),
      table, buckets = 4)
    Search.deleteBm25Docs(spark, table, deadDocs.select(col("doc_id")))
    Search.buildNextBm25Layout(spark, table)  // snapshots the tombstones
    // the lost-delta window: fresh docs admitted AFTER the snapshot
    val fresh = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    Search.upsertBm25Index(fresh, "doc_id", "text", table)
    Search.promoteBm25Layout(spark, table)
    val served = Search.loadBm25Index(spark, table)
    val direct = Search.buildBm25Index(liveDocs.unionByName(fresh),
      "doc_id", "text")
    assert(served.nDocs == direct.nDocs && served.totalLen == direct.totalLen,
      s"combo stats: served (${served.nDocs}, ${served.totalLen}) vs " +
        s"direct (${direct.nDocs}, ${direct.totalLen})")
    assert(served.postings.exceptAll(direct.postings).isEmpty &&
      direct.postings.exceptAll(served.postings).isEmpty,
      "promoted content differs from a direct build over " +
        "(corpus - deleted) + delta")
    assert(rawRows(table)
      .join(broadcast(deadDocs.select(col("doc_id"))), Seq("doc_id"),
        "left_semi").isEmpty,
      "deleted ids survived the combined promote's files")
    assert(!spark.catalog.tableExists(s"${table}_deleted"))
  }

  private def resetIvf(table: String): Unit =
    Seq(table, s"${table}_centroids", s"${table}_folded",
      s"${table}_deleted", s"${table}__next", s"${table}__next_centroids",
      s"${table}__next_basis").foreach(Sources.replaceTable(spark, _))

  test("IVF reclaim: the retrain equals a direct build over the " +
      "remaining corpus (geometry forgets), files are erased, " +
      "tombstones retire") {
    val table = "del_ivf_reclaim"
    resetIvf(table)
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, iters = 2), table)
    Similarity.deleteVectors(spark, table, deadVecs.select(col("vec_id")))
    // masked serve first: deleted ids invisible pre-compaction
    assert(Similarity.loadIvfIndex(spark, table).assigned
      .filter(col("vec_id") % 7 === 3).isEmpty,
      "tombstoned ids still served before compaction")
    Similarity.compactIvfIndex(spark, table, "vec_id", "embedding",
      iters = 2)
    assert(rawRows(table).filter(col("vec_id") % 7 === 3).isEmpty,
      "deleted ids still present in the compacted generation's files")
    assert(!spark.catalog.tableExists(s"${table}_deleted"),
      "consumed tombstones were not retired at the promote")
    // deterministic k-means: retrained centroids == a direct build over
    // exactly the remaining vectors
    val direct = Similarity.ivfIndex(liveVecs, "vec_id", "embedding",
      nCentroids = 16, iters = 2)
    val promoted = Similarity.loadIvfIndex(spark, table)
    assert(promoted.centroids.map(_.toSeq).toSeq ==
      direct.centroids.map(_.toSeq).toSeq,
      "retrained centroids differ from a direct build without the deleted")
    assert(promoted.assigned.count() ==
      liveVecs.filter(col("embedding").isNotNull).count())
  }

  test("cross-session coherence: an IVF reclaim's retrain in session A " +
      "re-keys session B's cached centroids — no stale-geometry probing") {
    val table = "del_ivf_xsession"
    resetIvf(table)
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(emb, "vec_id", "embedding",
        nCentroids = 8, iters = 2), table)
    val sessionB = spark.newSession()
    // prime B's centroid cache with the pre-reclaim geometry
    val beforeB = Similarity.loadIvfIndex(sessionB, table)
      .centroids.map(_.toSeq).toSeq
    // takedown in A, in two commits: after the first, B serves through
    // the sibling (and caches its listing); the second APPENDS a file —
    // B must pick the appended ids up too (the stamp-tracked refresh in
    // Tombstones.read), not serve the cached one-file listing
    Similarity.deleteVectors(spark, table,
      deadVecs.filter(col("vec_id") % 2 === 0).select(col("vec_id")))
    assert(Similarity.loadIvfIndex(sessionB, table).assigned
      .filter(col("vec_id") % 7 === 3 && col("vec_id") % 2 === 0).isEmpty,
      "B missed A's first delete commit")
    Similarity.deleteVectors(spark, table,
      deadVecs.filter(col("vec_id") % 2 =!= 0).select(col("vec_id")))
    assert(Similarity.loadIvfIndex(sessionB, table).assigned
      .filter(col("vec_id") % 7 === 3).isEmpty,
      "B's cached tombstone listing missed A's APPENDED delete commit")
    // reclaim in A: the retrain forgets the deleted vectors
    Similarity.compactIvfIndex(spark, table, "vec_id", "embedding",
      iters = 2)
    val direct = Similarity.ivfIndex(liveVecs, "vec_id", "embedding",
      nCentroids = 8, iters = 2).centroids.map(_.toSeq).toSeq
    assert(beforeB != direct,
      "premise: the reclaim must actually move the geometry")
    // B's next serve call re-collects: the centroids sibling's
    // generation stamp changed at A's promote
    val afterB = Similarity.loadIvfIndex(sessionB, table)
      .centroids.map(_.toSeq).toSeq
    assert(afterB == direct,
      "session B probed with stale centroids after A's retrain+promote")
  }

  test("IVF: a delete issued mid-build stays residual through the " +
      "promote — still masked, reclaimed next cadence") {
    val table = "del_ivf_midbuild"
    resetIvf(table)
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, iters = 2), table)
    Similarity.buildNextIvfGeneration(spark, table, "vec_id", "embedding",
      iters = 2)
    // the takedown lands AFTER the staged build snapshot its tombstones
    Similarity.deleteVectors(spark, table, deadVecs.select(col("vec_id")))
    Similarity.promoteIvfGeneration(spark, table)
    // the promoted files still CONTAIN the ids (snapshot missed them)...
    assert(!rawRows(table).filter(col("vec_id") % 7 === 3).isEmpty,
      "premise: mid-build deletes are not in the promoted rewrite")
    // ...but the residual tombstones keep masking them at serve
    assert(spark.catalog.tableExists(s"${table}_deleted"),
      "mid-build tombstones were wrongly consumed by the promote")
    assert(Similarity.loadIvfIndex(spark, table).assigned
      .filter(col("vec_id") % 7 === 3).isEmpty,
      "mid-build deletes leaked into the promoted serve")
    // the NEXT cadence reclaims them
    Similarity.compactIvfIndex(spark, table, "vec_id", "embedding",
      iters = 2)
    assert(rawRows(table).filter(col("vec_id") % 7 === 3).isEmpty,
      "second cadence failed to reclaim the residual tombstones")
    assert(!spark.catalog.tableExists(s"${table}_deleted"))
  }

  test("IVF: a tombstoned id resident only in a streaming segment is " +
      "masked by the segment-aware serve") {
    val table = "del_ivf_seg"
    resetIvf(table)
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(liveVecs, "vec_id", "embedding",
        nCentroids = 16, iters = 2), table)
    val segDir = java.nio.file.Files
      .createTempDirectory("del_ivf_seg").toString
    deadVecs.filter(col("embedding").isNotNull)
      .withColumn("cluster", lit(0))
      .write.partitionBy("cluster").parquet(s"$segDir/batch=7")
    val beforeDelete =
      Similarity.loadIvfIndexWithSegments(spark, table, segDir)
    assert(!beforeDelete.assigned.filter(col("vec_id") % 7 === 3).isEmpty,
      "premise: segment rows serve before the delete")
    Similarity.deleteVectors(spark, table, deadVecs.select(col("vec_id")))
    val afterDelete =
      Similarity.loadIvfIndexWithSegments(spark, table, segDir)
    assert(afterDelete.assigned.filter(col("vec_id") % 7 === 3).isEmpty,
      "segment-resident rows leaked past the tombstone mask")
  }

  test("LSH: delete masks every projection's candidates; compaction " +
      "rewrites each projection equal to a direct build over the rest") {
    val table = "del_lsh"
    (Seq(s"${table}_meta", s"${table}_folded", s"${table}_deleted",
      s"${table}__next_basis") ++
      (0 until 2).flatMap(t => Seq(s"${table}_t$t", s"${table}_t${t}__next")))
      .foreach(Sources.replaceTable(spark, _))
    Similarity.saveLshIndex(emb, "embedding", dims = 64, table,
      bits = 6, tables = 2)
    Similarity.deleteVectors(spark, table, deadVecs.select(col("vec_id")))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    assert(Similarity.lshServedCandidates(spark, table, "vec_id",
      "embedding", qvec, probeDist = 6)
      .filter(col("vec_id") % 7 === 3).isEmpty,
      "tombstoned ids survived the candidate mask")
    Similarity.compactLshIndex(spark, table)
    assert(!spark.catalog.tableExists(s"${table}_deleted"))
    val rebuilt = "del_lsh_rebuild"
    (Seq(s"${rebuilt}_meta") ++ (0 until 2).map(t => s"${rebuilt}_t$t"))
      .foreach(Sources.replaceTable(spark, _))
    Similarity.saveLshIndex(liveVecs, "embedding", dims = 64, rebuilt,
      bits = 6, tables = 2)
    for (t <- 0 until 2) {
      val got = spark.table(s"${table}_t$t").select("vec_id", "bucket")
      val want = spark.table(s"${rebuilt}_t$t").select("vec_id", "bucket")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"projection t$t after reclaim differs from a direct build")
    }
  }

  test("PQ reclaim: codebooks retrain without the deleted vectors and " +
      "every stored code matches a new-codebook recompute; files erased") {
    val table = "del_pq"
    Seq(table, s"${table}_codebooks", s"${table}_folded",
      s"${table}_deleted", s"${table}__next", s"${table}__next_codebooks",
      s"${table}__next_basis").foreach(Sources.replaceTable(spark, _))
    Similarity.savePqIndex(
      Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
        m = 8, nCodes = 16, iters = 2, sampleN = 256), table)
    Similarity.deleteVectors(spark, table, deadVecs.select(col("vec_id")))
    assert(Similarity.loadPqIndex(spark, table).encoded
      .filter(col("vec_id") % 7 === 3).isEmpty,
      "tombstoned ids still served before compaction")
    Similarity.compactPqIndex(spark, table, "vec_id", "embedding",
      iters = 2, sampleN = 256)
    assert(rawRows(table).filter(col("vec_id") % 7 === 3).isEmpty,
      "deleted ids still present in the compacted generation's files")
    assert(!spark.catalog.tableExists(s"${table}_deleted"))
    val direct = Similarity.pqIndex(liveVecs, "vec_id", "embedding",
      dims = 64, m = 8, nCodes = 16, iters = 2, sampleN = 256)
    val promoted = Similarity.loadPqIndex(spark, table)
    assert(promoted.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      direct.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "retrained codebooks differ from a direct build without the deleted")
    import graft.functions.VectorExpressions.{vec_l2_normalize, pq_encode}
    assert(promoted.encoded.filter(col("pq_code") =!=
      pq_encode(vec_l2_normalize(col("embedding")), promoted.codebooks))
      .isEmpty,
      "stored codes do not match the retrained codebooks")
  }

  test("near-dup index: a deleted corpus doc stops suppressing its " +
      "near-dups at once; compaction erases its shingles and retires " +
      "the tombstone") {
    import graft.operators.Contamination
    val table = "del_shingle"
    Seq(table, s"${table}_meta", s"${table}_deleted", s"${table}__next",
      s"${table}__next_meta").foreach(Sources.replaceTable(spark, _))
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (20L, "one two three four five six")).toDF("doc_id", "text")
    // incoming doc near-dups corpus doc 10 (one token changed)
    val incoming = Seq((99L, "alpha beta gamma delta zeta"))
      .toDF("doc_id", "text")
    Contamination.shingleIndexFor(corpus, "doc_id", "text", table, n = 3,
      buckets = 2)
    def survivors(): Seq[Long] = {
      val idx = Contamination.shingleIndexFor(corpus, "doc_id", "text",
        table, n = 3, buckets = 2)
      Contamination.decontaminateFuzzyFromIndex(incoming, "doc_id",
        "text", idx, n = 3, minJaccard = 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    }
    assert(survivors().isEmpty,
      "premise: the incoming near-dup is suppressed pre-delete")
    Contamination.deleteDocs(spark, table, Seq(10L).toDF("doc_id"))
    assert(survivors() == Seq(99L),
      "a deleted corpus doc kept suppressing its near-dups")
    // reclaim: the rebuild excludes the deleted doc's shingles and
    // retires the consumed tombstone
    graft.streaming.Streaming.compactNearDedupIndex(corpus,
      "/nonexistent_admitted_dir", "doc_id", "text", table, n = 3,
      buckets = 2)
    assert(rawRows(table).filter(col("id") === 10L).isEmpty,
      "deleted doc's shingles still present after compaction")
    assert(!spark.catalog.tableExists(s"${table}_deleted"),
      "consumed tombstone was not retired after compaction")
    assert(survivors() == Seq(99L),
      "post-reclaim serve regressed the admission decision")
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
