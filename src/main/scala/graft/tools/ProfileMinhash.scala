package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.llm.{Dedup, TextAnalysis => TA}

/** Stage-by-stage timing of the MinHash/LSH/Jaccard pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, d)
    time("warmup count")(docs.count())
    val shingled = TA.shingleRows(docs, col("doc_id"), col("text"), 3)
      .distinct().cache()
    time("shingle+distinct+cache")(shingled.count())
    val bands = Dedup.minhashBands(shingled, 4, 2).cache()
    time("minhash bands")(bands.count())
    val candidates = Dedup.lshCandidates(bands).cache()
    time("lsh candidates")(candidates.count())
    val verified = Dedup.jaccardVerify(candidates, shingled)
      .filter(col("jaccard") >= 0.8)
    time("jaccard verify")(verified.count())
    spark.stop()
  }
}
