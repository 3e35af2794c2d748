package graft.operators

import org.apache.spark.sql.DataFrame

/** STATS-TRUNCATING eager local checkpoint for ITERATIVE operators —
  * the fix for a planning pathology ScaleBench surfaced at 30×
  * amplified input (r14).
  *
  * Spark 4's `Dataset.localCheckpoint` no longer gives the checkpointed
  * leaf fresh default statistics: `LogicalRDD.fromDataset` REWRITES the
  * parent plan's estimated stats onto the leaf
  * (`ExistingRDD.scala rewriteStatsAndConstraints` — done so small
  * checkpointed frames stay broadcastable). For a one-shot checkpoint
  * that is strictly better. For an ITERATIVE loop it compounds: the
  * round body references the previous round's leaf several times
  * through self-joins, `SizeInBytesOnlyStatsPlanVisitor.visitJoin`
  * MULTIPLIES child sizes, and the carried estimate's BIT-LENGTH grows
  * geometrically round over round (×~8/round for the connected-
  * components hook + double-jump body: 2 leaf references in `hooked`,
  * squared twice by the jumps). By round ~10 the `sizeInBytes` BigInt
  * has millions of digits and the driver spends MINUTES inside
  * `BigInteger.multiplyToomCook3` per planning pass — observed as a
  * >25-minute stall of `dd_cluster_canonical`'s composition at 30×
  * input, identical under AQE and non-AQE planning (jstack pinned both;
  * at 1×–10× the loop converges in few rounds and the cost hides in
  * the noise, which is why only amplified-input measurement caught it).
  *
  * [[truncated]] materializes through `localCheckpoint(true)` exactly
  * as before, then rebuilds the frame over the SAME materialized RDD
  * through the public `createDataFrame(RDD[Row], schema)` API — the new
  * leaf carries constant-size default stats, restoring flat per-round
  * planning at ANY iteration depth. Cost: one external-row conversion
  * per downstream read of the leaf — a map over the (narrow) iteration
  * state, negligible next to the round's shuffle. Trade-off: the leaf
  * loses its carried size estimate, so a TINY checkpointed frame is no
  * longer auto-broadcast — irrelevant inside these loops, whose round
  * joins are label-table-sized by construction; one-shot checkpoints
  * outside loops should keep plain `localCheckpoint`.
  */
object Ckpt {

  /** Eager local checkpoint with default (non-compounding) leaf stats.
    * Use for every per-round checkpoint inside an iterative loop. */
  def truncated(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    df.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
