package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-join/agg SKEW AUDIT — the measurement that decides whether a
  * key needs [[SaltedJoin]] salting or AQE skew handling before you
  * pay for either. One map-side-combined groupBy builds per-key
  * counts (the only full pass); the top-k heaviest keys come back via
  * `orderBy.limit` = TakeOrderedAndProject (per-partition heaps, no
  * global sort materialization); the corpus total rides along as a
  * 1-row broadcast. Each reported key carries its integer
  * parts-per-million share (`cnt·1e6 div n` — integer `div`, floor ==
  * trunc on positives in every engine) and an `is_heavy` flag from
  * the cross-multiplied predicate `cnt·den ≥ n·num` (num/den = the
  * skew threshold, e.g. 1/1000 flags keys above 0.1% of rows — the
  * same discipline as AQE's skewed-partition factor). Deterministic
  * under count ties: the (cnt DESC, key ASC) order is total.
  */
object SkewAudit {

  def topKeys(df: DataFrame, key: Column, k: Int,
              heavyNum: Int, heavyDen: Int): DataFrame = {
    val counts = df.groupBy(key.as("key"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val tot = counts.agg(sum(col("cnt")).cast("long").as("n_total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("cnt * 1000000 div n_total"))
      .withColumn("is_heavy",
        col("cnt") * heavyDen >= col("n_total") * heavyNum)
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
  }
}
