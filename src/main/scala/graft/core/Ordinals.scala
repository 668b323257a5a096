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
  * The ordinal/run-id helpers run TWO jobs over the sorted frame (the classic
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

  /** EXCLUSIVE running total of `valueCol` in `idCol` order: each row
    * gets the sum of all rows with a strictly smaller key (0 for the
    * smallest). `idCol` must be unique and non-null — the total order
    * that defines the sum.
    *
    * Unlike the ordinal helpers above, this one is a PURE Catalyst plan
    * — a value-keyed two-level prefix sum with no RDD zip, no persist,
    * no broadcast variable, no dependence on physical partitioning:
    *
    *  1. one tiny aggregate for min/max of the key (defines bucket
    *     boundaries — boundaries affect only balance, never values);
    *  2. rows map to order-aligned buckets via `width_bucket` (equal
    *     keys share a bucket; bucket id is monotone in the key);
    *  3. one tiny aggregate for per-bucket sums, exclusive-prefixed on
    *     the driver into a literal map (≤ `buckets`+2 entries);
    *  4. per-row offset = bucket prefix (map lookup) + intra-bucket
    *     exclusive window sum, partitioned by bucket.
    *
    * No single-partition exchange: the only window is partitioned by
    * bucket, and each bucket holds ~1/`buckets` of the rows. At cluster
    * scale pick `buckets` so a bucket fits an executor's window buffer
    * (the default scales with `spark.sql.shuffle.partitions`). */
  def keyedRunningTotal(df: DataFrame, idCol: String, valueCol: String,
      name: String = "__cum", buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val nBuckets =
      if (buckets > 0) buckets
      else math.max(64, df.sparkSession.sessionState.conf.numShufflePartitions * 16)
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$valueCol must be integral (byte/short/int/long), got $other — " +
          "a fractional type would silently truncate per-row before summing")
    }
    val v = coalesce(col(valueCol).cast(LongType), lit(0L))

    // Order-preserving (weakly monotone) double proxy for the key. For
    // strings: the 7 bytes after the corpus-wide common prefix, read as
    // an unsigned big-endian integer (7 bytes < 2^56 — no signed-64
    // overflow in `conv` under ANSI) — strings sharing the min/max's
    // common prefix compare by their suffixes, so the proxy is monotone;
    // proxy ties just share a bucket (intra-bucket window orders by the
    // full key).
    val keyType = df.schema(idCol).dataType
    val stats = keyType match {
      case StringType =>
        val r = df.agg(min(col(idCol)), max(col(idCol)),
          count(when(col(idCol).isNull, 1))).head()
        require(r.getLong(2) == 0, s"$idCol must be non-null")
        if (r.isNullAt(0)) None
        else {
          val (mnB, mxB) =
            (r.getString(0).getBytes("UTF-8"), r.getString(1).getBytes("UTF-8"))
          val cp = mnB.zip(mxB).takeWhile { case (a, b) => a == b }.length
          def proxyOf(b: Array[Byte]): Double =
            BigInt(1, b.drop(cp).take(7).padTo(7, 0.toByte)).toDouble
          val proxyExpr = conv(rpad(hex(substring(encode(col(idCol), "UTF-8"),
            cp + 1, 7)), 14, "0"), 16, 10).cast(DoubleType)
          Some((proxyExpr, proxyOf(mnB), proxyOf(mxB)))
        }
      case dt =>
        val p = dt match {
          case DateType => unix_date(col(idCol)).cast(DoubleType)
          case TimestampType => col(idCol).cast(DoubleType)
          case _: NumericType => col(idCol).cast(DoubleType)
          case other => throw new IllegalArgumentException(
            s"$idCol: unsupported key type $other")
        }
        val r = df.agg(min(p), max(p), count(when(col(idCol).isNull, 1))).head()
        require(r.getLong(2) == 0, s"$idCol must be non-null")
        if (r.isNullAt(0)) None else Some((p, r.getDouble(0), r.getDouble(1)))
    }
    stats match {
      case None => // empty input: nothing to sum
        df.withColumn(name, lit(0L))
      case Some((proxyExpr, mn, mx)) =>
        val bucket =
          if (mx > mn) width_bucket(proxyExpr, lit(mn), lit(mx), lit(nBuckets))
          else lit(1L) // single distinct proxy → one bucket
        val data = df.withColumn("__bkt", bucket)
        // Per-bucket sums → driver-side exclusive prefix → literal map.
        val perBucket = data.groupBy(col("__bkt")).agg(sum(v).as("__bsum"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val prefixMap: Map[Long, Long] = perBucket.map(_._1)
          .zip(perBucket.map(_._2).scanLeft(0L)(_ + _)).toMap
        val wIn = Window.partitionBy(col("__bkt")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        data
          .withColumn(name,
            element_at(typedlit(prefixMap), col("__bkt")) +
              coalesce(sum(v).over(wIn), lit(0L)))
          .drop("__bkt")
    }
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
