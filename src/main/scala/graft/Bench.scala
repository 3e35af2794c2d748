package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer reads, shuffle machinery)
    // so the first measured query doesn't absorb JVM init.
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        // Queries that cache intermediates must not tax later queries'
        // storage memory (observed run-to-run variance otherwise).
        spark.catalog.clearCache()
        name -> t
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
