package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  /** File-source streams need a directory; stage the single events file
    * into a temp dir once. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("file-source stream: tumbling agg matches batch aggregation") {
    val stream = EventStream.readEvents(spark, eventsDir)
    assert(stream.isStreaming)
    val q = EventStream.toMemorySink(
      EventStream.tumblingAgg(stream), "tumbling_test", complete = true)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_test")
      .select(sum("event_count")).head().getLong(0)
    val batch = Tables.events(spark, sf).count()
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState first-seen matches the batch twin") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.firstSeenByUser(stream)
      .writeStream.format("memory").queryName("first_seen_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("first_seen_test")
      .select("user_id", "event_type", "first_event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
  }

  test("session windows produce bounded per-user sessions") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.toMemorySink(
      EventStream.sessionAgg(stream), "session_test", complete = true)
      .start()
    try q.processAllAvailable() finally q.stop()
    val sessions = spark.table("session_test")
    val total = sessions.select(sum("event_count")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // session bounds ordered, no zero-length user ids lost
    assert(sessions.filter(col("session_end") < col("session_start"))
      .count() == 0)
  }
}
