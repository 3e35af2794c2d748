package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.llm.{Dedup, TextAnalysis => TA}

/** One-off diagnostic for the minhash_lsh 100× shuffle/spill step (r16
  * VERDICT task #3): the committed SCALE row reads shuffle bytes
  * 646 MB → 3.6 GB over 30× → 100× (step ≈ 5.6× for 3.33× data) with
  * 344 MB spill, attributed only as "a plan-shape/spill step in the
  * verify joins". This runs the EXACT family plan at one scale,
  * prints a per-stage table (shuffle read/write, spill, tasks, the
  * stage's callsite name) and the FINAL adaptive executed plan, so the
  * stepping exchange can be named instead of guessed. Run at 30 and
  * 100 and diff the two outputs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.MinhashDiag 100"
  */
object MinhashDiag {

  private final class StageTable extends SparkListener {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Int)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null)
          rows += ((si.stageId, si.name.takeWhile(_ != '\n'),
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.diskBytesSpilled, si.numTasks))
      }
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(30)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val amp = java.nio.file.Files.createTempDirectory(s"graft_diag_${k}x")
    try {
      ScaleBench.amplifyDocs(spark, sfDir, k, amp.toString)
      val docs = spark.read.parquet(s"$amp/documents.parquet")
      val st = new StageTable
      spark.sparkContext.addSparkListener(st)
      val t0 = System.nanoTime()
      // exact mirror of ScaleBench.minhashLsh
      val shingled = TA.shingleRows(docs,
        col("doc_id"), col("text"), 3).distinct()
      val bands = Dedup.minhashBands(shingled, bands = 4, rowsPerBand = 2)
      val candidates = Dedup.lshCandidates(bands, maxBucketSize = 64)
      val verified = Dedup.jaccardVerify(candidates, shingled)
        .filter(col("jaccard") >= 0.8)
      val n = verified.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus BEFORE reading the stage table —
      // a fixed sleep silently dropped late-completing stages (r17
      // ADVICE); the graftinternal forwarder reaches the private[spark]
      // waitUntilEmpty.
      org.apache.spark.sql.graftinternal.ListenerBusDrain
        .waitUntilEmpty(spark, 30000L)
      spark.sparkContext.removeSparkListener(st)
      println(f"\n[diag] k=$k  $sec%.1f s  $n pairs")
      println(f"${"stage"}%5s ${"tasks"}%5s ${"shufR MB"}%9s " +
        f"${"shufW MB"}%9s ${"spill MB"}%9s  name")
      st.rows.sortBy(_._1).foreach { case (id, nm, r, w, sp, tk) =>
        println(f"$id%5d $tk%5d ${r / 1048576.0}%9.1f " +
          f"${w / 1048576.0}%9.1f ${sp / 1048576.0}%9.1f  $nm")
      }
      println("\n==== final adaptive plan ====")
      println(verified.queryExecution.executedPlan.toString)
    } finally graft.queries.Q.deleteRecursively(amp)
    spark.stop()
  }
}
