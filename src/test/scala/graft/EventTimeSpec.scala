package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.sources.EventTime

/** Encoding-robustness pin for the events loader: the upstream testdata
  * writer has already changed `ts` encoding once (TIMESTAMP(NANOS) →
  * timestamp[us]/TIMESTAMP_NTZ); this spec fixes the contract that
  * [[EventTime.normalizeTs]] lands every legal encoding on identical
  * µs-precision TimestampType values, so the next change is a green-test
  * no-op instead of a 12-gate outage. */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  // micro-precision instants (UTC) — sub-millisecond digits included so a
  // precision-losing path can't pass by accident
  private val microsUtc = Seq(
    1704103200123456L, // 2024-01-01 10:00:00.123456
    1704103260000001L, // 2024-01-01 10:01:00.000001
    1704106799999999L) // 2024-01-01 10:59:59.999999

  private def base = java.nio.file.Files
    .createTempDirectory("graft_event_time").toString

  test("normalizeTs: long-nanos, TIMESTAMP_NTZ, and TIMESTAMP fixtures " +
      "all yield identical micro-precision TimestampType values") {
    val dir = base
    // 1) long nanos — exactly what TIMESTAMP(NANOS) parquet looks like
    //    post-read under spark.sql.legacy.parquet.nanosAsLong
    microsUtc.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("event_id", "ts").write.parquet(s"$dir/nanos/events.parquet")
    // 2) timestamp[us] without zone → Spark TIMESTAMP_NTZ (the encoding
    //    the current testdata writer produces)
    microsUtc.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast("long"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/ntz/events.parquet")
    // 3) instant-adjusted TIMESTAMP — already canonical
    microsUtc.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast("long"),
        timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$dir/tz/events.parquet")

    def load(sub: String): Map[Long, Long] = {
      val df = EventTime.normalizeTs(
        spark.read.parquet(s"$dir/$sub/events.parquet"))
      assert(df.schema("ts").dataType == TimestampType,
        s"$sub must normalize to TimestampType")
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    val expected = microsUtc.zipWithIndex
      .map { case (us, i) => i.toLong -> us }.toMap
    assert(load("nanos") == expected, "long-nanos path lost precision")
    assert(load("ntz") == expected,
      "TIMESTAMP_NTZ path shifted values (session TZ must be UTC)")
    assert(load("tz") == expected, "TIMESTAMP pass-through changed values")
  }

  test("normalizeTs: unsupported column type fails loudly, not silently") {
    val df = Seq(("2024-01-01", 1L)).toDF("ts", "event_id")
    val e = intercept[IllegalArgumentException](EventTime.normalizeTs(df))
    assert(e.getMessage.contains("unsupported event-time type"))
  }
}
