package graft.ingest

import java.nio.file.{Files, Paths}
import graft.Sessions

/** Drives the orchestrator-style ingestion cycle (SURVEY §3.1 stage 1):
  * discover dated files → skip-unchanged check → stamp + load → mark
  * processed → append-export watermark. Run twice over the same dir to
  * see the skip logic; drop a new dated file to see incremental pickup.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("ingest_demo")
    Seq("2024-06-01_transactions.csv", "2024-06-02_transactions.csv",
      "All Lists_06_01_2024_x.csv").foreach { n =>
      Files.writeString(dir.resolve(n), "v\n1\n2\n")
    }
    val store = new Ingest.StateStore(s"$dir/state.json")

    def cycle(label: String): Unit = {
      val files = Ingest.discover(dir.toString)
      val changed = store.changed(files.map(_.path))
      println(s"[ingest] $label: discovered=${files.size} " +
        s"latest=${Ingest.latestOnly(files).view.mapValues(_.date).toMap} " +
        s"changed=$changed")
      if (changed) {
        files.foreach { f =>
          val df = Ingest.withLoadMetadata(
            spark.read.option("header", "true").csv(f.path),
            f.date, isSeed = f.kind == "lists", f.path)
          println(s"[ingest]   loaded ${f.path.split('/').last}: " +
            s"${df.count()} rows, snapshot=${f.date}")
        }
        store.markProcessed(files.map(_.path))
      } else println("[ingest]   skipped (no files changed)")
    }

    cycle("seed run")
    cycle("rerun unchanged")
    Files.writeString(dir.resolve("2024-06-03_transactions.csv"),
      "v\n9\n")
    cycle("after new daily file")

    val all = Seq("2024-06-01", "2024-06-02", "2024-06-03").toDF("snap")
    val (slice, w) = Ingest.appendExport(all, "snap", Some("2024-06-01"))
    println(s"[ingest] append-export: ${slice.count()} new rows, " +
      s"watermark=$w")
    spark.stop()
  }
}
