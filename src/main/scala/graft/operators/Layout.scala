package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.LayoutExpressions.interleave_bits

/** Multi-dimensional data layout for write-time clustering — the piece of
  * a 100 TB pipeline that makes SUBSEQUENT reads cheap. Sorting a table
  * by one key gives perfect parquet min/max skipping on that key and
  * none on any other; interleaving the bits of several keys (the Morton /
  * Z-order curve, the layout behind `OPTIMIZE ZORDER BY` in open
  * lakehouse formats) gives every interleaved dimension partial locality,
  * so a filter on ANY of them prunes most files at the scan.
  *
  * Scale shape: one tiny min/max aggregate (driver-side, KBs) to fix the
  * coordinate frame, one codegen'd map pass computing the z-key
  * ([[graft.functions.InterleaveBits]]), one range-repartition on the
  * key (a single shuffle — the sort you were already paying for a
  * one-dimensional layout), and a plain parquet write. Nothing here is
  * per-row driver work, and file count is explicit so 100 TB lands as
  * bounded-size files, not a small-files incident.
  *
  * Honest pruning granularity: with plain parquet, Spark's scan prunes
  * ROW GROUPS per file from the same footer min/max this layout
  * tightens (file-LEVEL pruning needs a stats-aware table format's
  * catalog). [[fileRangeStats]]/[[overlapFraction]] measure the stat
  * tightness itself, which is what either pruning level consumes.
  *
  * The reference engine has no layout story (littletable is an in-memory
  * list, littletable.py:568-604 just appends); this is beyond-reference
  * infrastructure for the training-data pipeline tier. */
object Layout {

  /** Z-order key over `zCols`: each column is affinely bucketized to
    * [0, 2^bits) against its OWN min/max (ONE tiny aggregate for all
    * columns — the driver-side-stats idiom of `Ordinals.keyedRunningTotal`),
    * then the buckets are bit-interleaved into one long. Nulls sort
    * first (bucket 0). Numeric/date/timestamp columns map directly.
    * STRING columns get RANK-BASED coordinates: up to `dictMax` distinct
    * values are collected once (the literal-map idiom of
    * `Ordinals.keyedRunningTotal`) and spread UNIFORMLY over the bucket
    * space — an affine byte proxy wastes nearly all its resolution on
    * lexicographic clumps ("src1","src10".."src19" span 2.5% of the key
    * space; measured 13/16 files touched by a point query vs 4/16 with
    * ranks). Above `dictMax` the order-preserving 7-bytes-after-common-
    * prefix proxy of core/Ordinals.scala:98-121 is the fallback: weakly
    * monotone, proxy ties share a bucket — costs locality, never
    * correctness. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int = 16,
      dictMax: Int = 4096): Column = {
    require(zCols.nonEmpty, "zValue needs at least one column")
    require(zCols.size * bits <= 63,
      s"${zCols.size} dims x $bits bits overflows a long")
    import org.apache.spark.sql.types._
    // pass 0 (driver-side, KBs): raw min/max per column — strings need
    // their bounds BEFORE the proxy expression exists (common prefix)
    val rawAggs = zCols.flatMap { c =>
      df.schema(c).dataType match {
        case StringType => Seq(min(col(c)), max(col(c)))
        case DateType => Seq(min(unix_date(col(c)).cast(DoubleType)),
          max(unix_date(col(c)).cast(DoubleType)))
        case TimestampType => Seq(min(col(c).cast(DoubleType)),
          max(col(c).cast(DoubleType)))
        case _: NumericType => Seq(min(col(c).cast(DoubleType)),
          max(col(c).cast(DoubleType)))
        case other => throw new IllegalArgumentException(
          s"zValue($c): unsupported type $other")
      }
    }
    val stats = df.agg(rawAggs.head, rawAggs.tail: _*).head()
    val hi = (1 << bits) - 1
    def affine(p: Column, mn: Double, mx: Double): Column = {
      val range = if (mx > mn) mx - mn else 1.0
      val scaled = ((coalesce(p, lit(mn)) - mn) / range * hi)
      least(greatest(scaled.cast(IntegerType), lit(0)), lit(hi))
    }
    val coords = zCols.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i)) lit(0) // all-null/empty column: one bucket
      else df.schema(c).dataType match {
        case StringType =>
          val top = df.select(col(c)).na.drop().distinct()
            .orderBy(col(c)).limit(dictMax + 1)
            .collect().map(_.getString(0))
          if (top.length <= dictMax) {
            val step = hi.toDouble / math.max(1, top.length - 1)
            val dict: Map[String, Int] = top.zipWithIndex
              .map { case (v, r) => v -> math.round(r * step).toInt }.toMap
            coalesce(element_at(typedlit(dict), col(c)), lit(0))
          } else {
            val (mnB, mxB) = (stats.getString(2 * i).getBytes("UTF-8"),
              stats.getString(2 * i + 1).getBytes("UTF-8"))
            val cp = mnB.zip(mxB).takeWhile { case (a, b) => a == b }.length
            def proxyOf(b: Array[Byte]): Double =
              BigInt(1, b.drop(cp).take(7).padTo(7, 0.toByte)).toDouble
            val proxy = conv(rpad(hex(substring(encode(col(c), "UTF-8"),
              cp + 1, 7)), 14, "0"), 16, 10).cast(DoubleType)
            affine(proxy, proxyOf(mnB), proxyOf(mxB))
          }
        case DateType =>
          affine(unix_date(col(c)).cast(DoubleType),
            stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
        case _ =>
          affine(col(c).cast(DoubleType),
            stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
      }
    }
    interleave_bits(coords, bits)
  }

  /** Write `df` as `nFiles` parquet files clustered along the z-curve of
    * `zCols`: range-repartition on the z-key (one shuffle), sort within
    * each partition, drop the key, write. Every zCol then has tight
    * per-file min/max ranges, so point/band filters on any of them prune
    * files at the scan. */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
      nFiles: Int = 32, bits: Int = 16): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    df.withColumn("__z", zValue(df, zCols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file [min, max] ranges of `cols` for a parquet directory — the
    * skip-stat view a scan's file pruning sees. One aggregate over the
    * data grouped by file name (test/diagnostic scale; a real catalog
    * reads footers, but the ranges are identical). */
  def fileRangeStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggExprs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Fraction of files whose [min, max] range on `c` overlaps [lo, hi] —
    * i.e. the fraction of the table a band filter must actually read.
    * 1.0 means the layout skips nothing for this predicate. */
  def overlapFraction(stats: DataFrame, c: String, lo: Double, hi: Double): Double = {
    val r = stats.agg(
      sum(when(col(s"${c}_min").cast("double") <= hi &&
        col(s"${c}_max").cast("double") >= lo, 1L).otherwise(0L)),
      count(lit(1))).head()
    if (r.getLong(1) == 0L) 1.0 else r.getLong(0).toDouble / r.getLong(1)
  }

  /** Compact a parquet directory to ~`targetRowsPerFile` rows per file —
    * the small-files remedy (a 100 TB table accreted by thousands of
    * micro-batch/task writes reads at metadata speed, not data speed).
    * One count (metadata-cheap on parquet), one round-robin or
    * range-repartition, one write: pass `sortCols` to KEEP a clustered
    * layout through the rewrite (compaction that destroys z-order/sort
    * locality trades one read problem for another). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetRowsPerFile: Long, sortCols: Seq[String] = Nil): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    require(new org.apache.hadoop.fs.Path(inDir).toUri !=
      new org.apache.hadoop.fs.Path(outDir).toUri,
      "compact cannot overwrite its own input while reading it")
    val df = spark.read.parquet(inDir)
    val nFiles = math.max(1L, math.ceil(
      df.count().toDouble / targetRowsPerFile).toLong).toInt
    val laid =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    laid.write.mode("overwrite").parquet(outDir)
  }
}
