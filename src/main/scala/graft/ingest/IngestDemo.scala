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

    // S1 in-engine: drop a real multi-sheet XLSX landing (built here as
    // raw OOXML parts — the same shape QuickBooks exports), discover it
    // by the lists convention, and decode every sheet via sources.Xlsx.
    writeDemoXlsx(dir.resolve("All Lists_06_04_2024.xlsx"))
    val xlsxFiles = Ingest.discover(dir.toString)
      .filter(_.path.endsWith(".xlsx"))
    xlsxFiles.foreach { f =>
      graft.sources.Xlsx.readAll(spark, f.path).foreach {
        case (sheet, df) =>
          val stamped = Ingest.withLoadMetadata(
            graft.functions.Fns.standardizeColumns(df),
            f.date, isSeed = true, f.path)
          println(s"[ingest] xlsx sheet '$sheet': ${stamped.count()} rows, " +
            s"cols=${stamped.columns.take(4).mkString(",")},…")
      }
    }

    val all = Seq("2024-06-01", "2024-06-02", "2024-06-03").toDF("snap")
    val (slice, w) = Ingest.appendExport(all, "snap", Some("2024-06-01"))
    println(s"[ingest] append-export: ${slice.count()} new rows, " +
      s"watermark=$w")
    spark.stop()
  }

  /** Minimal two-sheet OOXML workbook (Customer + Item) written as raw
    * zip parts — demo input only; the engine-side decode is
    * [[graft.sources.Xlsx]]. */
  private def writeDemoXlsx(path: java.nio.file.Path): Unit = {
    val sheet = (name: String, rows: String) =>
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$rows</sheetData></worksheet>""".stripMargin
    def is(t: String) = s"""<c t="inlineStr"><is><t>$t</t></is></c>"""
    def num(v: String) = s"""<c><v>$v</v></c>"""
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Customer" sheetId="1" r:id="rId1"/>
          |<sheet name="Item" sheetId="2" r:id="rId2"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" -> sheet("Customer",
        s"<row>${is("Customer Name")}${is("Main Email")}${is("Balance Total")}</row>" +
          s"<row>${is("Acme Anchors")}${is("sales@acme.example")}${num("1250.75")}</row>" +
          s"<row>${is("Inline Industries")}${is("ops@inline.example")}${num("42")}</row>"),
      "xl/worksheets/sheet2.xml" -> sheet("Item",
        s"<row>${is("Item")}${is("Price")}</row>" +
          s"<row>${is("AM6-6")}${num("3.5")}</row>"))
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
