package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** One-off r20 profiling harness for the corpus pipeline's phase
  * walls: runs seed → incremental → skip against a temp warehouse
  * (the Bench corpus arm's exact shape) and prints per-stage walls —
  * StateStore-landing, per-model commit timings (Catalog.timings),
  * and the wall of each pipeline section — so optimization targets the
  * measured term, not the guessed one (guide §1). */
object CorpusProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val dataDir = java.nio.file.Files.createTempDirectory("graft_cprof")
    val staged = dataDir.resolve("staged_batch_003")
    val live = dataDir.resolve("batches/batch_003")
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text", "lang", "source")
    (0 to 2).foreach { k =>
      val target = if (k == 2) staged.toString
                   else s"$dataDir/batches/batch_00${k + 1}"
      docs.filter(s"pmod(doc_id, 3) = $k")
        .write.mode("overwrite").parquet(target)
    }
    val wh = java.nio.file.Files.createTempDirectory("graft_cprof_wh")
    def phase(name: String)(body: => graft.corpus.CorpusPipeline.Report)
        : Unit = {
      val t0 = System.nanoTime()
      val rep = body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $wall%.2f s (models ${rep.models}, " +
        f"skipped ${rep.modelsSkipped.size}, export ${rep.exportRewritten})")
      rep.stageWalls.foreach { case (st, s) =>
        println(f"   $st%-14s $s%7.2f s") }
    }
    phase("seed") {
      graft.corpus.CorpusPipeline.run(spark, "seed", dataDir.toString,
        wh.toString)
    }
    java.nio.file.Files.move(staged, live)
    phase("incremental") {
      graft.corpus.CorpusPipeline.run(spark, "incremental",
        dataDir.toString, wh.toString)
    }
    phase("skip") {
      graft.corpus.CorpusPipeline.run(spark, "incremental",
        dataDir.toString, wh.toString)
    }
    graft.queries.Q.deleteRecursively(dataDir)
    graft.queries.Q.deleteRecursively(wh)
    spark.stop()
  }
}
