package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.storage.StorageLevel

/** Ordered-table discipline for a distributed engine.
  *
  * The reference is an ordered in-memory list, so `rank`/`head`/`tail`/
  * slices are trivial (littletable.py:2248-2257, 3816-3830). On Spark a
  * global `row_number()` window collapses the whole table into ONE
  * partition — fine at 60k rows, fatal at 100 TB. This helper assigns a
  * consecutive 1-based ordinal with no single-partition exchange:
  * range-partition by the sort keys, sort within partitions, then add
  * per-partition offsets computed from partition counts (the classic
  * two-pass zipWithIndex — one tiny job to count, one to emit).
  *
  * The sort keys MUST be a total order (include a unique tiebreaker) for
  * the ordinal to be deterministic.
  *
  * Every helper here runs TWO jobs over the sorted frame (the classic
  * zipWithIndex shape: one tiny stats pass, one emit pass). Between the
  * two jobs the physical layout must not move — if the sort's shuffle
  * output were recomputed (evicted shuffle files, stage retry, executor
  * loss) with different range boundaries, pass-2 rows could land in a
  * different partition than the offsets computed in pass 1, silently
  * corrupting the ordinal. [[pinned]] therefore persists the sorted rows
  * (MEMORY_AND_DISK: memory-evicted blocks fall to disk, never
  * recompute), so both jobs — and any later re-evaluation of the result
  * frame — read the exact bytes and layout pass 1 saw. The cache is
  * dropped automatically by Spark's ContextCleaner once the result frame
  * is unreachable; its footprint is the helper's (usually narrow)
  * input projection, not the full table.
  */
object Ordinals {

  /** Sort and pin: the single materialization both passes read. */
  private def pinned(df: DataFrame, sortKeys: Seq[Column]): (RDD[Row], DataFrame) = {
    // orderBy (not explicit repartitionByRange + sortWithinPartitions):
    // physically identical when a sort is needed, but when the caller's
    // frame is ALREADY range-partitioned and sorted on these keys (every
    // GTable path: rank/slice/batched follow orderby) EnsureRequirements
    // + RemoveRedundantSorts collapse it to a no-op instead of paying a
    // second exchange + sort.
    val sorted =
      if (sortKeys.isEmpty) df
      else df.orderBy(sortKeys: _*)
    (sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK), sorted)
  }

  def withOrdinal(df: DataFrame, sortKeys: Seq[Column], name: String = "__ord"): DataFrame = {
    val spark = df.sparkSession
    val (rdd, sorted) = pinned(df, sortKeys)
    // zipWithIndex is itself two jobs (count + emit) over the pinned rows.
    val out = rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(out, sorted.schema.add(StructField(name, LongType, nullable = false)))
  }

  /** EXCLUSIVE running total of `valueCol` over the established order:
    * each row gets the sum of all PRIOR rows' values (0 for the first).
    * Same two-pass shape as [[withOrdinal]] — range-partition sort, one
    * tiny job for per-partition sums, driver prefix, one emit pass — so
    * a corpus-wide cumulative sum (e.g. the token offset for sequence
    * packing) needs no single-partition window. Sort keys must totally
    * order the rows; `valueCol` must be integral (int/long). */
  def withRunningTotal(df: DataFrame, sortKeys: Seq[Column], valueCol: String,
      name: String = "__cum"): DataFrame = {
    require(sortKeys.nonEmpty, "running totals are order-defined")
    val spark = df.sparkSession
    val (rdd, sorted) = pinned(df, sortKeys)
    val idx = sorted.schema.fieldIndex(valueCol)
    def valueOf(r: Row): Long = r.get(idx) match {
      case null => 0L
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$valueCol must be integral, got ${other.getClass.getSimpleName}")
    }
    // Pass 1: one partial sum per partition (tiny).
    val sums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(r => s += valueOf(r)); Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // Pass 2: emit exclusive running totals (reads the pinned cache).
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bOffsets.value(pid)
      it.map { r =>
        val v = valueOf(r)
        val row = Row.fromSeq(r.toSeq :+ running)
        running += v
        row
      }
    }
    spark.createDataFrame(out, sorted.schema.add(StructField(name, LongType, nullable = false)))
  }

  /** Consecutive 1-based run id over the established order: a new id
    * starts whenever `keyCol` differs from the previous row's value.
    * Same two-pass shape as [[withOrdinal]]: range-partition sort, one
    * tiny job collecting per-partition (firstKey, lastKey, runCount),
    * driver-side offset stitch (merging runs that span a partition
    * boundary), one emit pass. No single-partition exchange, no window.
    * Key equality is value equality of the column (null == null). */
  def withRunId(df: DataFrame, sortKeys: Seq[Column], keyCol: String,
      name: String = "__run"): DataFrame = {
    require(sortKeys.nonEmpty, "run ids are order-defined")
    val spark = df.sparkSession
    val (rdd, sorted) = pinned(df, sortKeys)
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    // Pass 1: per-partition run stats (tiny — one tuple per partition).
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: Any = null; var last: Any = null
      var runs = 0L; var nonEmpty = false
      it.foreach { r =>
        val k = r.get(keyIdx)
        if (!nonEmpty) { first = k; runs = 1; nonEmpty = true }
        else if (k != last) runs += 1
        last = k
      }
      Iterator.single((pid, nonEmpty, first, last, runs))
    }.collect().sortBy(_._1)
    // Driver-side stitch: global run-id offset per partition.
    val offsets = new Array[Long](stats.length)
    var globalRuns = 0L
    var prevLast: Any = null; var prevNonEmpty = false
    stats.foreach { case (pid, nonEmpty, first, last, runs) =>
      if (nonEmpty) {
        val merged = prevNonEmpty && first == prevLast
        offsets(pid) = if (merged) globalRuns - 1 else globalRuns
        globalRuns = offsets(pid) + runs
        prevLast = last; prevNonEmpty = true
      }
    }
    // Pass 2: emit with the stitched run id (reads the pinned cache).
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var localRun = 0L; var last: Any = null; var started = false
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started) { localRun = 1; started = true }
        else if (k != last) localRun += 1
        last = k
        Row.fromSeq(r.toSeq :+ (bOffsets.value(pid) + localRun))
      }
    }
    spark.createDataFrame(out, sorted.schema.add(StructField(name, LongType, nullable = false)))
  }
}
