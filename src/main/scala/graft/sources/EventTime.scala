package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time normalization.
  *
  * The reference's import layer is polymorphic over source encodings
  * (littletable.py:761-927 `_MultiIterator`; per-column `transforms`,
  * littletable.py:2763-2808). Parquet writers are equally free in how
  * they encode a timestamp column: TIMESTAMP(NANOS) (which Spark only
  * reads as long under `spark.sql.legacy.parquet.nanosAsLong`),
  * timestamp[us] without timezone (Spark `TIMESTAMP_NTZ`), or
  * instant-adjusted timestamp (Spark `TIMESTAMP`). A loader that
  * hard-codes one encoding breaks the moment the upstream writer
  * changes — so every events read goes through [[normalizeTs]], which
  * branches on the *observed* column type and lands on a single
  * canonical µs-precision `TimestampType` column.
  */
object EventTime {

  /** Normalize an event-time column to µs-precision `TimestampType`.
    *
    *  - `LongType`: nanoseconds since epoch (TIMESTAMP(NANOS) read
    *    under `nanosAsLong`); integral `div 1000` → µs — no double
    *    round-trip, ns-since-epoch exceeds double's 53-bit mantissa.
    *  - `TimestampNTZType`: wall-clock without zone; `cast` to
    *    `TimestampType` is value-preserving under this build's pinned
    *    UTC session timezone (build.sbt `-Dspark.sql.session.timeZone=UTC`).
    *  - `TimestampType`: already canonical; pass through.
    *
    * Works on both batch and streaming DataFrames — the branch is on
    * the analyzed schema, not the data.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"column `$colName` has unsupported event-time type $other; " +
            "expected long-nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
}
