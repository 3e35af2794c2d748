package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) DATA LAYOUT — multi-dimensional clustering for
  * min/max pruning, the table-layout half of the 100 TB story. A table
  * range-clustered on a single key prunes perfectly on that key and not
  * at all on any other; interleaving the bits of two keys gives a space-
  * filling curve whose contiguous ranges are near-square tiles, so
  * row-group/file min-max stats prune well on BOTH dimensions (the trade:
  * neither prunes as tightly as its own dedicated sort — a slab query on
  * one of two 6-bit dims touches 4 of 16 buckets instead of 1, but the
  * other dim drops from 16 to 4; see ZOrderSpec for the exact numbers).
  * Same idea as the OPTIMIZE ZORDER of lakehouse table formats, built
  * here from pure integer Column arithmetic.
  *
  * Everything is shift/and/or on BIGINT — codegen'd, scan-shaped, and
  * exactly replayable in the DuckDB oracle (`f_zorder_key`), which is why
  * the key math avoids engine-specific bit intrinsics.
  */
object ZOrder {

  /** Spread the low 8 bits of a non-negative long across 16 bits
    * (bit i → bit 2i) with the classic three-step magic-mask sequence. */
  def spread8(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(255L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 4)).bitwiseAND(lit(0x0F0FL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333L))
    x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Morton key of two 8-bit dimensions: a's bits at even
    * positions, b's at odd. Monotone per dimension; a contiguous key
    * range is a near-square (a, b) tile. */
  def zKey8(a: Column, b: Column): Column =
    spread8(a).bitwiseOR(shiftleft(spread8(b), 1))

  /** Re-layout `df` along the Morton curve of (a, b): range-partition
    * into `numRanges` output slices and sort inside each, so every
    * written file/row-group owns a contiguous curve segment — a tight
    * (a, b) bounding box for the scanner's min/max stats. One range
    * shuffle (AQE-balanced sampling), local sort, no global sort; at
    * 100 TB this is the periodic layout-maintenance job, not a per-query
    * cost. Dimensions are quantized to their low 8 bits by [[zKey8]] —
    * quantize/bucket wider domains before calling (coarse tiles are what
    * pruning stats need; full-width keys would only deepen the sort). */
  def clusterBy(df: DataFrame, a: Column, b: Column,
                numRanges: Int): DataFrame =
    df.withColumn("_z_key", zKey8(a, b))
      .repartitionByRange(numRanges, col("_z_key"))
      .sortWithinPartitions("_z_key")
      .drop("_z_key")
}
