package graft.queries

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame

/** In-query materialize-and-read-back: the registered-query twin of the
  * model DAG's parquet materialization (`Catalog.saveTable`).
  *
  * When one detail frame feeds 3-5 aggregate consumers in a single plan,
  * the choices are: (a) recompute per consumer (exchange reuse dedups
  * only IDENTICAL subplans — different downstream projections defeat
  * it), (b) `.persist()` (measured 1.6× SLOWER here: the columnar cache
  * build costs more than it saves at this row width — see
  * CompanyProductQueries), or (c) write the frame to parquet once and
  * re-read it per consumer, which is exactly what the production DAG
  * does between models. (c) wins: the write is one pass, re-reads are
  * cheap column-pruned scans, and the plan downstream of the scan is
  * the same one the materialized model would get.
  *
  * Local-mode twin: `java.io.tmpdir` here; on a cluster this would be a
  * scratch prefix on the distributed FS (the pattern, not the path, is
  * the point). Each call gets a unique directory (safe under parallel
  * test suites) deleted on JVM exit.
  */
object Mat {

  def temp(df: DataFrame, name: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-mat-$name-")
    df.write.mode("overwrite").parquet(dir.toString)
    deleteOnExit(dir)
    df.sparkSession.read.parquet(dir.toString)
  }

  private def deleteOnExit(dir: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
}
