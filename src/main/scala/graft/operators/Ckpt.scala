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
  * as before, then rebuilds the frame over the SAME materialized RDD —
  * in INTERNAL row form, via the narrow
  * [[org.apache.spark.sql.graftinternal.InternalDf]] accessor — so the
  * new `LogicalRDD` leaf carries constant-size default stats, restoring
  * flat per-round planning at ANY iteration depth with ZERO per-row
  * conversion cost. (The first r14 form rebuilt through the public
  * `createDataFrame(RDD[Row], schema)`, which deserializes to external
  * rows and re-encodes on every downstream read. Measured on the
  * identical 3-query subset harness: the internal-RDD form returns
  * t_bpe_apply_merges to plain-localCheckpoint speed — 4.56 s vs the
  * external form's 5.27 s and plain's 4.61 s at sf0.1; the BPE loops'
  * per-round state is corpus-sized so the conversion is the one cost
  * that scales with data — while keeping the stats-truncation win
  * (plain checkpoint: dd_cc_incremental 9.9 s vs ~5-6 s truncated).
  * A same-session ScaleBench control showed the two truncated forms
  * indistinguishable on the CC families at 30× — 10.7 vs 11.5 s,
  * inside the session band — so the internal form strictly dominates:
  * same planning behavior, no O(rows) conversion tax.)
  *
  * Trade-off kept from the first form: the leaf loses its carried size
  * estimate, so a TINY checkpointed frame is no longer auto-broadcast —
  * irrelevant inside these loops, whose round joins are
  * label-table-sized by construction; one-shot checkpoints outside
  * loops should keep plain `localCheckpoint` (the carried stats are
  * what make small checkpointed frames broadcastable there).
  */
object Ckpt {

  /** Eager local checkpoint with default (non-compounding) leaf stats.
    * Use for every per-round checkpoint inside an iterative loop. */
  def truncated(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    org.apache.spark.sql.graftinternal.InternalDf(
      df.sparkSession, ck.queryExecution.toRdd, ck.schema)
  }

  /** DISK-BACKED iteration checkpointer — the reliable sibling of
    * [[truncated]] for iteration state that must not live in executor
    * memory (r16 VERDICT stretch #9: BPE's 100× per-round symbol table
    * is ~GBs that `localCheckpoint` pins in the block store, which on
    * `local[32]` concentrates every round's state in ONE heap — the
    * measured ladder: 8g spills at 30× and OOMs at 100×, 16g
    * heap-OOMs at 100×, only 32g completes).
    *
    * Each call writes the round's frame to `baseDir/r<n>` as parquet
    * and returns the scan of it: lineage is truncated at a disk-backed
    * leaf with fresh size-based stats (the same non-compounding
    * property [[truncated]] exists for), and the heap holds NOTHING
    * between rounds. A parquet round-trip is deliberately chosen over
    * `Dataset.checkpoint(reliable = true)`: RDD reliable checkpointing
    * computes the round TWICE (the eager action, then the re-run that
    * writes the checkpoint files — Spark's own scaladoc warns of it),
    * while write + read-back computes once; on a cluster `baseDir` on
    * shared storage also survives executor loss, which localCheckpoint
    * blocks do not. Files accumulate for the run's lifetime because
    * LATER consumers may still reference EARLIER rounds' leaves (BPE
    * train's merge frames do); the CALLER owns `baseDir` and deletes it
    * after materializing the final result.
    *
    * One schema caveat: the parquet read-back widens every field to
    * NULLABLE (a property of the scan, not of the data) — irrelevant
    * to iteration state, but don't hang schema-equality assertions off
    * a durable-checkpointed frame.
    *
    * This is not the in-plan materialization the r03/r07 bans cover:
    * each loop round is a separately-executed plan by construction
    * (the checkpoint IS the round boundary), the between-plans case
    * where disk round-trips are legitimate. At sf scale [[truncated]]
    * stays the default (no write amplification, measured fastest);
    * use this when iteration state × rounds threatens executor memory.
    *
    * ONE LOOP, ONE THREAD, ONE INSTANCE: the returned closure numbers
    * rounds with an unsynchronized mutable counter, so each iterative
    * loop must take its OWN `durable(dir)` with its own `baseDir` —
    * sharing an instance across two loops, or calling it from
    * concurrently-materialized models (ModelDag's `par` waves), would
    * interleave round numbering and overwrite live round dirs
    * (r17 ADVICE). The driver-side loops it serves (BPE, CC) are
    * sequential by nature; concurrency belongs between loops, not
    * inside one. */
  def durable(baseDir: String): DataFrame => DataFrame = {
    val round = new java.util.concurrent.atomic.AtomicInteger(0)
    val owner = new java.util.concurrent.atomic.AtomicReference[Thread](null)
    df => {
      // Enforce the one-loop/one-thread contract above (r19; the r18
      // ADVICE noted it was documented but unenforced): concurrent
      // callers — e.g. two ModelDag `par`-wave models sharing an
      // instance — would interleave round numbering and overwrite live
      // round dirs. Fail fast instead. CAS claims ownership atomically
      // (r19 ADVICE: plain vars let two concurrent FIRST calls both see
      // null and both proceed undetected).
      val t = Thread.currentThread()
      val won = owner.compareAndSet(null, t)
      if (!won) require(owner.get() eq t,
        s"Ckpt.durable($baseDir) serves ONE sequential loop: created " +
          s"on thread '${owner.get().getName}' but called from " +
          s"'${t.getName}' — give each loop its own durable(dir)")
      val p = s"$baseDir/r${round.incrementAndGet()}"
      df.write.mode("overwrite").parquet(p)
      df.sparkSession.read.parquet(p)
    }
  }
}
