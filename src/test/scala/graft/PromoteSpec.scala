package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** The generation-swap primitive behind every artifact compaction
  * ([[graft.sources.Sources.promoteTable]]): crash-ordering of the
  * rename regime (kill between each step, recover by re-running the
  * promote), the object-store `SET LOCATION` regime, and the scheme
  * dispatch between them. */
class PromoteSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new org.apache.hadoop.fs.Path("/tmp/graft-warehouse")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  /** A tiny partitioned generation tagged by `tag` — partitioned so
    * every test also exercises the RECOVER PARTITIONS half of the
    * promote (the in-memory catalog keeps write-time partition
    * locations across renames). */
  private def writeGen(table: String, tag: String,
      options: Map[String, String] = Map.empty): Unit = {
    Sources.replaceTable(spark, table)
    Seq((1, tag, "a"), (2, tag, "b"), (3, tag, "a"))
      .toDF("id", "gen", "part")
      .write.mode("overwrite").format("parquet").options(options)
      .partitionBy("part").saveAsTable(table)
  }
  private def gens(table: String): Set[String] =
    spark.table(table).select("gen").distinct().collect()
      .map(_.getString(0)).toSet
  private def exists(n: String) = spark.catalog.tableExists(n)
  private def partCols(n: String) = spark.sessionState.catalog
    .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(n))
    .partitionColumnNames
  private def location(n: String) = new org.apache.hadoop.fs.Path(
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(n)).location)

  test("promote: staged replaces live, partition spec survives, no debris") {
    val (live, staged) = ("pr_basic", "pr_basic__next")
    writeGen(live, "old"); writeGen(staged, "new")
    Sources.promoteTable(spark, staged, live)
    assert(gens(live) == Set("new"))
    assert(spark.table(live).count() == 3, "RECOVER PARTITIONS missed rows")
    assert(partCols(live) == Seq("part"), "promotion dropped the partition spec")
    assert(!exists(staged) && !exists(s"${live}__retired"), "debris left behind")
  }

  test("kill after live set aside: re-running the promote completes the " +
      "swap (the staged generation is one rerun away, never lost)") {
    val (live, staged) = ("pr_kill2", "pr_kill2__next")
    writeGen(live, "old"); writeGen(staged, "new")
    // crash simulation: step 2 done (live renamed aside), steps 3-4 never ran
    spark.sql(s"ALTER TABLE `$live` RENAME TO `${live}__retired`")
    assert(!exists(live) && exists(s"${live}__retired") && exists(staged))
    Sources.promoteTable(spark, staged, live)
    assert(gens(live) == Set("new") && spark.table(live).count() == 3)
    assert(partCols(live) == Seq("part"))
    assert(!exists(staged) && !exists(s"${live}__retired"))
  }

  test("kill after staged swapped in (RECOVER + retire pending): rerun " +
      "re-lists partitions and drops the retired generation") {
    val (live, staged) = ("pr_kill3", "pr_kill3__next")
    writeGen(live, "old"); writeGen(staged, "new")
    // crash simulation: steps 2-3 done, RECOVER and the retired drop never ran
    spark.sql(s"ALTER TABLE `$live` RENAME TO `${live}__retired`")
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$live`")
    // the live entry still carries the STAGED write's partition
    // locations — the resume must heal exactly this
    Sources.promoteTable(spark, staged, live)
    assert(gens(live) == Set("new") && spark.table(live).count() == 3)
    assert(!exists(s"${live}__retired"), "retired generation not dropped")
  }

  test("rollback: staged and live both missing, retired present — the " +
      "promote restores the retired generation under the live name") {
    val live = "pr_rollback"
    writeGen(live, "old")
    spark.sql(s"ALTER TABLE `$live` RENAME TO `${live}__retired`")
    Sources.promoteTable(spark, s"${live}__next", live)
    assert(gens(live) == Set("old") && spark.table(live).count() == 3)
    assert(!exists(s"${live}__retired"))
  }

  test("nothing to promote or resume fails fast") {
    intercept[IllegalArgumentException] {
      Sources.promoteTable(spark, "pr_void__next", "pr_void")
    }
  }

  test("scheme dispatch: object-store schemes take the SET LOCATION " +
      "path, rename-cheap schemes take the catalog rename") {
    for (s <- Seq("s3a", "s3", "s3n", "gs", "wasbs", "abfss", "oss"))
      assert(Sources.renameIsCopy(s), s"$s must dispatch to SET LOCATION")
    for (s <- Seq("file", "hdfs", "viewfs"))
      assert(!Sources.renameIsCopy(s), s"$s must dispatch to rename")
    assert(Sources.warehouseScheme(spark) == "file")
    assert(Sources.stagedWriteOptions(spark, "pr_any").isEmpty,
      "rename regime must keep managed default locations")
  }

  test("location-swap promote: live adopts the staged data in place " +
      "(zero movement), old generation retired, marker guards the dir") {
    val (live, staged) = ("pr_swap", "pr_swap__next")
    val stagedPath = s"/tmp/graft-warehouse/${staged}__g0"
    try {
      writeGen(live, "old")
      val oldLoc = location(live)
      assert(fs.exists(oldLoc))
      // staged built EXTERNAL at a generation-unique path — the
      // stagedWriteOptions shape for the object-store regime
      writeGen(staged, "new", options = Map("path" -> stagedPath))
      Sources.promoteTableByLocationSwap(spark, staged, live)
      assert(gens(live) == Set("new") && spark.table(live).count() == 3)
      assert(partCols(live) == Seq("part"))
      assert(location(live) == hp(s"file:$stagedPath"),
        s"live must adopt the staged location, got ${location(live)}")
      assert(!exists(staged), "staged entry must be dropped")
      assert(fs.exists(hp(stagedPath)), "external drop must keep the data")
      assert(!fs.exists(oldLoc), "old generation not retired")
      assert(fs.exists(hp(s"$stagedPath/${Sources.ServingMarker}")))
      // the adopted dir is the DEFAULT location of a same-named table:
      // replaceTable must refuse to delete it out from under `live`
      intercept[IllegalStateException] {
        Sources.replaceTable(spark, s"${staged}__g0")
      }
      assert(gens(live) == Set("new"), "guard failed to protect the data")
    } finally {
      fs.delete(hp(s"$stagedPath/${Sources.ServingMarker}"), false)
      Sources.replaceTable(spark, live)
      Sources.replaceTable(spark, staged)
      fs.delete(hp(stagedPath), true)
    }
  }

  test("location-swap with a MANAGED staged table: the re-pointed entry " +
      "drop retires the old generation") {
    val (live, staged) = ("pr_swapm", "pr_swapm__next")
    try {
      writeGen(live, "old")
      val oldLoc = location(live)
      writeGen(staged, "new") // managed, default warehouse location
      val stagedLoc = location(staged)
      Sources.promoteTableByLocationSwap(spark, staged, live)
      assert(gens(live) == Set("new") && spark.table(live).count() == 3)
      assert(location(live) == stagedLoc)
      assert(!exists(staged) && !fs.exists(oldLoc))
      assert(fs.exists(hp(s"$stagedLoc/${Sources.ServingMarker}")))
      // rebuilding under the staged name would write into the adopted
      // serving dir — the guard fails fast instead of corrupting it
      intercept[IllegalStateException] { Sources.replaceTable(spark, staged) }
    } finally {
      val loc = location(live)
      fs.delete(hp(s"$loc/${Sources.ServingMarker}"), false)
      Sources.replaceTable(spark, live)
      fs.delete(hp("/tmp/graft-warehouse/pr_swapm__next"), true)
    }
  }

  test("location-swap kill after the live flip: rerun completes " +
      "retirement; the new generation served through the whole window") {
    val (live, staged) = ("pr_swapk", "pr_swapk__next")
    val stagedPath = s"/tmp/graft-warehouse/${staged}__g0"
    try {
      writeGen(live, "old")
      writeGen(staged, "new", options = Map("path" -> stagedPath))
      // crash simulation: the flip committed, retirement never ran
      spark.sql(s"ALTER TABLE `$live` SET LOCATION '$stagedPath'")
      spark.sql(s"ALTER TABLE `$live` RECOVER PARTITIONS")
      assert(gens(live) == Set("new"), "flip must already serve the new gen")
      Sources.promoteTableByLocationSwap(spark, staged, live)
      assert(gens(live) == Set("new") && !exists(staged))
      assert(fs.exists(hp(s"$stagedPath/${Sources.ServingMarker}")))
    } finally {
      fs.delete(hp(s"$stagedPath/${Sources.ServingMarker}"), false)
      Sources.replaceTable(spark, live)
      Sources.replaceTable(spark, staged)
      fs.delete(hp(stagedPath), true)
      fs.delete(hp("/tmp/graft-warehouse/pr_swapk"), true)
    }
  }

  test("location-swap promote on a real bucketed serving artifact: the " +
      "BM25 ranking and bucket spec ride through the SET LOCATION flip") {
    import graft.operators.Search
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (live, staged) = ("pr_swap_bm25", "pr_swap_bm25__next")
    val stagedPath = s"/tmp/graft-warehouse/${staged}__g0"
    try {
      Seq(live, s"${live}_stats", staged).foreach(
        Sources.replaceTable(spark, _))
      // live generation over 80% of the corpus
      Search.saveBm25Index(Search.buildBm25Index(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text"), live)
      // staged full-corpus generation, EXTERNAL at a unique path (the
      // object-store build shape), same pinned bucket spec
      val full = Search.buildBm25Index(docs, "doc_id", "text")
      full.postings.write.mode("overwrite").format("parquet")
        .option("path", stagedPath)
        .bucketBy(32, "word").sortBy("word").saveAsTable(staged)
      Sources.promoteTableByLocationSwap(spark, staged, live)
      // serve THROUGH the swap: stats rewritten separately (as
      // compactBm25Index does not touch them, write them here to the
      // full corpus so ranking math matches the rebuild)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(live))
      assert(meta.bucketSpec.exists(b =>
        b.numBuckets == 32 && b.bucketColumnNames == Seq("word")),
        s"swap dropped the bucket spec: ${meta.bucketSpec}")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("doclen"), col("word"), col("tf"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getLong(3))).toSet
      assert(rows(spark.table(live)) == rows(full.postings),
        "swapped generation's postings diverge from the staged build")
      val served = Search.Bm25Index.withStats(spark.table(live),
        full.nDocs, full.totalLen, avg = Some(full.avgLen))
      def top(idx: Search.Bm25Index) =
        Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 10)
          .select(col("doc_id"), col("bm25_rank"))
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(top(served) == top(full),
        "served ranking diverged through the location swap")
    } finally {
      fs.delete(hp(s"$stagedPath/${Sources.ServingMarker}"), false)
      Seq(live, s"${live}_stats", staged).foreach(
        Sources.replaceTable(spark, _))
      fs.delete(hp(stagedPath), true)
    }
  }

  test("vacuumGenerations: deletes orphaned staged/retired debris, " +
      "spares live tables, marker-guarded dirs, and catalog entries") {
    val live = "pr_vac"
    writeGen(live, "live")
    // debris shapes a promote crash can leave:
    val orphanNext = hp(s"/tmp/graft-warehouse/${live}__next__g0")
    val orphanRetired = hp(s"/tmp/graft-warehouse/${live}__retired")
    fs.mkdirs(orphanNext); fs.mkdirs(orphanRetired)
    // a marker-guarded dir (adopted serving location) must survive
    val adopted = hp(s"/tmp/graft-warehouse/${live}__next__g1")
    fs.mkdirs(adopted)
    fs.create(hp(s"$adopted/${Sources.ServingMarker}"), true).close()
    // a REGISTERED staged table (mid-maintenance) must survive
    writeGen(s"${live}__next", "staged")
    val deleted = Sources.vacuumGenerations(spark, live)
    assert(deleted.toSet.map((s: String) => hp(s).getName) ==
      Set(s"${live}__next__g0", s"${live}__retired"),
      s"vacuum deleted the wrong set: $deleted")
    assert(!fs.exists(orphanNext) && !fs.exists(orphanRetired))
    assert(fs.exists(adopted), "vacuum deleted a marker-guarded dir")
    assert(exists(s"${live}__next") && gens(s"${live}__next") == Set("staged"),
      "vacuum touched a registered staged table")
    assert(gens(live) == Set("live"), "vacuum touched the live table")
    // cleanup
    fs.delete(hp(s"$adopted/${Sources.ServingMarker}"), false)
    fs.delete(adopted, true)
    Sources.replaceTable(spark, live)
    Sources.replaceTable(spark, s"${live}__next")
  }

  test("two-table promote resume: a crash between the centroids promote " +
      "and the table promote is healed by re-running promoteIvfGeneration") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val table = "pr_twostep"
    Seq(table, s"${table}_centroids", s"${table}_folded").foreach(
      Sources.replaceTable(spark, _))
    Similarity.saveIvfIndex(
      Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", nCentroids = 8, iters = 2), table)
    Similarity.buildNextIvfGeneration(spark, table, "vec_id", "embedding",
      iters = 2)
    // crash simulation: the centroids promote committed, the main-table
    // promote never ran — the half-promoted window
    Sources.promoteTable(spark, s"${table}__next_centroids",
      s"${table}_centroids")
    assert(!exists(s"${table}__next_centroids") && exists(s"${table}__next"))
    val promoted = Similarity.promoteIvfGeneration(spark, table)
    // nothing was upserted, so the retrained generation covers the base
    // corpus — the resume claim is about the swap, not the content
    val direct = Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
      "vec_id", "embedding", nCentroids = 8, iters = 2)
    assert(promoted.assigned.count() == direct.assigned.count())
    promoted.centroids.zip(direct.centroids).foreach { case (c, d) =>
      c.zip(d).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    assert(!exists(s"${table}__next") && !exists(s"${table}__next_centroids"),
      "staged debris left after the resumed promote")
  }

  test("location-swap bootstrap with no live generation falls back to " +
      "the rename promote") {
    val (live, staged) = ("pr_swapb", "pr_swapb__next")
    Sources.replaceTable(spark, live)
    writeGen(staged, "new")
    Sources.promoteTableByLocationSwap(spark, staged, live)
    assert(gens(live) == Set("new") && spark.table(live).count() == 3)
    assert(partCols(live) == Seq("part") && !exists(staged))
    Sources.replaceTable(spark, live)
  }
}
