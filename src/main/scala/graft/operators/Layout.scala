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
  * The reference engine has no layout story (littletable is an in-memory
  * list, littletable.py:568-604 just appends); this is beyond-reference
  * infrastructure for the training-data pipeline tier. */
object Layout {

  /** Z-order key over `zCols`: each column is affinely bucketized to
    * [0, 2^bits) against its OWN min/max (one tiny aggregate — same
    * driver-side-stats idiom as `Ordinals.keyedRunningTotal`), then the
    * buckets are bit-interleaved into one long. Nulls sort first (bucket
    * 0). Works for any numeric/date/timestamp column; strings would need
    * a collation-aware proxy and are rejected. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int = 16): Column = {
    require(zCols.nonEmpty, "zValue needs at least one column")
    require(zCols.size * bits <= 63,
      s"${zCols.size} dims x $bits bits overflows a long")
    import org.apache.spark.sql.types._
    val proxies = zCols.map { c =>
      df.schema(c).dataType match {
        case DateType => unix_date(col(c)).cast(DoubleType)
        case TimestampType => col(c).cast(DoubleType)
        case _: NumericType => col(c).cast(DoubleType)
        case other => throw new IllegalArgumentException(
          s"zValue($c): unsupported type $other")
      }
    }
    val aggExprs = proxies.flatMap(p => Seq(min(p), max(p)))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val hi = (1 << bits) - 1
    val coords = proxies.zipWithIndex.map { case (p, i) =>
      if (stats.isNullAt(2 * i)) lit(0) // all-null column: one bucket
      else {
        val mn = stats.getDouble(2 * i)
        val mx = stats.getDouble(2 * i + 1)
        val range = if (mx > mn) mx - mn else 1.0
        val scaled = ((coalesce(p, lit(mn)) - mn) / range * hi)
        least(greatest(scaled.cast(IntegerType), lit(0)), lit(hi))
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
}
