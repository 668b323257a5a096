package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

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
  */
object Ordinals {

  def withOrdinal(df: DataFrame, sortKeys: Seq[Column], name: String = "__ord"): DataFrame = {
    val spark = df.sparkSession
    val sorted =
      if (sortKeys.isEmpty) df
      else df.repartitionByRange(sortKeys: _*).sortWithinPartitions(sortKeys: _*)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, sorted.schema.add(StructField(name, LongType, nullable = false)))
  }
}
