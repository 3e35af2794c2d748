package graft

import java.nio.file.{Files, Paths}
import graft.ingest.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDirWith(names: String*): String = {
    val d = Files.createTempDirectory("ingest_spec")
    names.foreach(n => Files.writeString(d.resolve(n), "x"))
    d.toString
  }

  test("discover parses both filename conventions, sorts chronologically") {
    val dir = tmpDirWith(
      "2024-06-02_transactions.xlsx", "2024-05-01_transactions.xlsx",
      "All Lists_05_15_2024_export.xlsx", "README.txt")
    val found = Ingest.discover(dir)
    assert(found.map(_.date) == Seq("2024-05-01", "2024-05-15",
      "2024-06-02"))
    assert(found.map(_.kind) == Seq("transactions", "lists",
      "transactions"))
    val latest = Ingest.latestOnly(found)
    assert(latest("transactions").date == "2024-06-02")
    assert(latest("lists").date == "2024-05-15")
  }

  test("discover on missing dir is empty") {
    assert(Ingest.discover("/no/such/dir").isEmpty)
  }

  test("withLoadMetadata stamps the DLT metadata columns") {
    val df = Ingest.withLoadMetadata(Seq(1, 2).toDF("v"), "2024-06-01",
      isSeed = true, sourceFile = "f.xlsx")
    assert(df.columns.toSet ==
      Set("v", "load_date", "snapshot_date", "is_seed", "source_file"))
    val r = df.head()
    assert(r.getAs[String]("snapshot_date") == "2024-06-01")
    assert(r.getAs[Boolean]("is_seed"))
  }

  test("appendExport slices strictly past the watermark and advances it") {
    val df = Seq("2024-01-01", "2024-02-01", "2024-03-01").toDF("d")
    val (slice1, w1) = Ingest.appendExport(df, "d", Some("2024-01-01"))
    assert(slice1.count() == 2)
    assert(w1.contains("2024-03-01"))
    val (slice2, w2) = Ingest.appendExport(df, "d", w1)
    assert(slice2.count() == 0)
    assert(w2.contains("2024-03-01"), "empty slice keeps prior watermark")
  }

  test("StateStore: changed on new file, stable after markProcessed, changed on touch") {
    val dir = tmpDirWith("a.xlsx")
    val f = s"$dir/a.xlsx"
    val store = new Ingest.StateStore(s"$dir/state/processed.json")
    assert(store.changed(Seq(f)))
    store.markProcessed(Seq(f))
    assert(!store.changed(Seq(f)))
    Files.setLastModifiedTime(Paths.get(f),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    assert(store.changed(Seq(f)))
  }
}
