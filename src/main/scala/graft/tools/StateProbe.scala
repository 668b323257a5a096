package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming STATE-SIZE probe for the RocksDB state backend: run the
  * watermarked dedup (the state-heaviest streaming tier — state = one
  * row per distinct key inside the watermark horizon) over the events
  * corpus at two multipliers and report, per multiplier, the state
  * store's row count and byte sizes from `StreamingQueryProgress`. The
  * design claim under test: state ROWS grow linearly with distinct keys
  * (by construction) while the bytes/row stays flat — i.e. the store's
  * footprint is a predictable `keys × horizon × bytes/key` budget a
  * 100 TB/day deployment can size disks for, not an executor-heap wall
  * (the default HDFSBackedStateStoreProvider keeps every row on-heap;
  * RocksDB holds them in native memtables + local-disk SSTs with a
  * bounded block cache).
  *
  * The watermark horizon is set WIDER than the corpus's event-time span
  * so nothing expires: the probe measures the worst-case bound, state =
  * ALL distinct keys. Key cardinality scales with the multiplier by
  * user_id-shifting each copy (copies share no keys). Micro-batching is
  * forced through a file source with maxFilesPerTrigger, so the numbers
  * come from a genuine multi-batch run (commit/changelog per batch),
  * not one giant batch.
  *
  * Usage: runMain graft.tools.StateProbe [sfDir] [k1,k2,...]
  */
object StateProbe {

  /** DURABLE state bytes = the checkpoint's state/ subtree on disk
    * (changelog + snapshot files — what a recovery replays). The walk
    * stream is closed via Using — each one holds a directory fd. */
  private[tools] def dirBytes(root: java.nio.file.Path): Long =
    if (java.nio.file.Files.exists(root))
      scala.util.Using.resource(java.nio.file.Files.walk(root))(
        _.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum())
    else 0L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4))
    val spark = graft.GraftSession.rocksDbState(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.sources.EventTime.normalizeTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .select("user_id", "event_type", "ts")
    val maxUid = events.agg(max("user_id")).head().getLong(0) + 1

    def scaled(k: Int): DataFrame =
      (0 until k).map(i => events
        .withColumn("user_id", col("user_id") + lit(i.toLong * maxUid)))
        .reduce(_ unionByName _)

    val dir = "/tmp/graft_state_probe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    val lines = ks.map { k =>
      val path = s"$dir/k=$k"
      scaled(k).repartition(8).write.mode("overwrite").parquet(path)
      val expectedKeys = spark.read.parquet(path)
        .select("user_id", "event_type").distinct().count()
      val stream = spark.readStream
        .schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", "2") // 8 files → 4 data batches
        .parquet(path)
      // horizon wider than the event-time span: nothing expires, state
      // bounds at ALL distinct keys — the worst case being sized for
      val deduped = graft.streaming.Streaming.dedupStream(
        stream, Seq("user_id", "event_type"), "ts", "3650 days")
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-sp-$k-")
      val t0 = System.nanoTime()
      val q = deduped.writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.reverse
        .find(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
        .getOrElse(sys.error(s"no stateful progress at $k×"))
      val so = prog.stateOperators.head
      // DURABLE state bytes = the checkpoint's state/ subtree on disk
      // (changelog + snapshot files — what a recovery replays). The
      // per-batch rocksdb byte counters reset each trigger and read ~0
      // at this scale (state fits the memtable); the checkpoint is the
      // cumulative, restart-surviving measure. memoryUsedBytes under
      // RocksDB = the NATIVE budget (memtables + block cache) —
      // expected ~FLAT across multipliers: that flatness IS the
      // bounded-memory claim (rows spill to disk, heap does not grow).
      val stateBytes = dirBytes(ckpt.resolve("state"))
      val line =
        f"""{"probe":"state_size","k":$k,"distinct_keys":$expectedKeys,""" +
        f""""state_rows":${so.numRowsTotal},""" +
        f""""native_memory_bytes":${so.memoryUsedBytes},""" +
        f""""checkpoint_state_bytes":$stateBytes,""" +
        f""""state_bytes_per_row":${
          if (so.numRowsTotal > 0) stateBytes / so.numRowsTotal else -1L},""" +
        f""""wall_sec":$wall%.2f}"""
      println(line)
      require(so.numRowsTotal == expectedKeys,
        s"state rows ${so.numRowsTotal} != distinct keys $expectedKeys " +
          s"at $k× — horizon or dedup keys wrong")
      line
    }
    require(lines.nonEmpty)
    spark.stop()
  }
}
