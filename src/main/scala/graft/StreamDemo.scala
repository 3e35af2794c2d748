package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Live demo/driver for the streaming module: starts a file-source
  * stream, drains the first file, then drops a second file into the
  * watched directory to show incremental batch processing.
  *
  * Usage: runMain graft.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")

    val watched = Files.createTempDirectory("events_stream_demo")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      watched.resolve("batch1.parquet"))

    val stream = EventStream.readEvents(spark, watched.toString)
    val q = EventStream
      .toMemorySink(EventStream.tumblingAgg(stream), "demo_tumbling",
        complete = true)
      .start()
    q.processAllAvailable()
    val afterOne = spark.table("demo_tumbling")
      .agg(sum("event_count")).head().getLong(0)
    println(s"[stream-demo] events after file 1: $afterOne")

    // Incremental arrival: same rows again in a new file → counts double.
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      watched.resolve("batch2.parquet"))
    q.processAllAvailable()
    val afterTwo = spark.table("demo_tumbling")
      .agg(sum("event_count")).head().getLong(0)
    println(s"[stream-demo] events after file 2: $afterTwo")
    q.stop()

    val sessions = EventStream
      .toMemorySink(EventStream.sessionAgg(
        EventStream.readEvents(spark, watched.toString)), "demo_sessions",
        complete = true)
      .start()
    sessions.processAllAvailable()
    val sessCount = spark.table("demo_sessions").count()
    val sessEvents = spark.table("demo_sessions")
      .agg(sum("event_count")).head().getLong(0)
    println(s"[stream-demo] sessions=$sessCount covering $sessEvents events")
    sessions.stop()

    assert(afterTwo == 2 * afterOne, "incremental file not processed")
    assert(sessEvents == afterTwo, "session coverage mismatch")
    println("[stream-demo] OK")
    spark.stop()
  }
}
