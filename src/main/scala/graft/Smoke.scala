package graft

/** t1-style smoke: run the flagship entry on sf0.001 and assert rows > 0,
  * mirroring the driver's smoke check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
