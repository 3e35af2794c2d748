package graft.tools

import graft.{Sessions, SparkEntry}

/** Dump the FINALIZED `.explain("formatted")` plan of named registry
  * queries to files — the r20 optimization-round evidence artifact
  * (`plans/r20/<query>_<suffix>.txt`). collect() first so the adaptive
  * plan is final (the PlanAudit discipline: count()/write wrap a new
  * QueryExecution and leave this one non-final).
  *
  * Usage: runMain graft.tools.PlanDump <dataDir> <outDir> <suffix> <q>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <dataDir> <outDir> <suffix> <query>...")
    val d = args(0)
    val out = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSet
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(out)
    SparkEntry.registry.filter(q => names.contains(q.name)).foreach { q =>
      val text = try {
        val df = q.build(spark, d)
        df.collect()
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
        finally graft.queries.Q.cleanupScratch()
      val f = out.resolve(s"${q.name}_$suffix.txt")
      java.nio.file.Files.write(f,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $f")
    }
    spark.stop()
  }
}
