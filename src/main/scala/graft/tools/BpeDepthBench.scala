package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.llm.TextAnalysis

/** Round-depth scaling check for [[TextAnalysis.bpeTrainApply]]:
  * wall-times the full train+apply at increasing merge depths on the
  * documents table. Per-round cost must stay ~flat — the point of the
  * per-round `localCheckpoint` (without it, plan depth compounds and
  * analysis/codegen time grows superlinearly with rounds, which is what
  * makes real tokenizer depths — hundreds of merges — unreachable).
  *
  * Usage: sbt "runMain graft.tools.BpeDepthBench [sfDir] [rounds...]"
  * (defaults: sf0.01, rounds 2 4 8 16).
  */
object BpeDepthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rounds =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(2, 4, 8, 16)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan
    rounds.foreach { r =>
      val t0 = System.nanoTime()
      TextAnalysis.bpeTrainApply(docs, col("doc_id"), col("text"), r)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-depth] rounds=$r%-3d wall=$wall%6.1f s " +
        f"per-round=${wall / r}%5.2f s")
    }
    spark.stop()
  }
}
