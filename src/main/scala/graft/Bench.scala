package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, parquet footer reads, shuffle machinery)
    // so the first measured query doesn't absorb JVM init.
    SparkEntry.entry(spark).count()
    // Optional args (local iteration only; the driver passes none):
    // query names to time instead of the full registry.
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args.toSet) else None
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        // Queries that cache intermediates must not tax later queries'
        // storage memory (observed run-to-run variance otherwise).
        spark.catalog.clearCache()
        name -> t
    }
    val total = results.map(_._2).sum
    // Locale.ROOT: a comma decimal separator would corrupt the JSON.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    // Stop Spark BEFORE printing so no executor-shutdown log line can land
    // after the JSON, and keep "metric"/"value" as the LAST keys: the
    // driver's tail capture keeps the END of stdout, so even if the
    // per-query map outgrows the window the headline total stays visible
    // (BENCH_r02's total was truncated away with the old key order).
    spark.stop()
    println(s"""{"sf":"$sfDir","queries":$qs,"unit":"sec","metric":"total","value":${sec(total)}}""")
  }
}
