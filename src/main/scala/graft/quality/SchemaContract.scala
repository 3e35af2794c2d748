package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** SCHEMA CONTRACT with EVOLUTION rules — the middle of the dbt
  * `on_schema_change` spectrum between
  * [[graft.operators.MergeUpsert.assertSameSchema]] ('fail': any
  * drift aborts) and silently syncing whatever arrives: a producer may
  * ADD columns (consumers that project by name don't care) and may
  * WIDEN a column's type along a lossless chain (byte→short→int→long,
  * float→double) — but REMOVING a contracted column, NARROWING, or an
  * incompatible type change is a violation, because each one breaks
  * some downstream reader (the round-10 `events.ts` drift was exactly
  * an uncontracted incompatible change).
  *
  * [[check]] is pure metadata (no scan). [[align]] enforces the
  * contract on a batch: violations throw with the full list; a
  * conforming batch is projected to exactly the contracted columns,
  * in contract order, with widened columns cast to the contract type —
  * so every downstream consumer sees ONE schema no matter which
  * producer version wrote the batch. */
object SchemaContract {

  final case class Violation(column: String, kind: String, detail: String)

  /** Lossless widening chains: integral by size, float→double. */
  private[quality] def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

  /** Violations of `contract` by `actual` (extra actual columns are
    * allowed evolution, not violations). */
  def check(contract: StructType, actual: StructType): Seq[Violation] = {
    val act = actual.fields.map(f => f.name -> f.dataType).toMap
    contract.fields.toSeq.flatMap { f =>
      act.get(f.name) match {
        case None =>
          Some(Violation(f.name, "removed",
            s"contracted ${f.dataType.sql} column missing"))
        case Some(t) if !widens(t, f.dataType) &&
            !widens(f.dataType, t) =>
          Some(Violation(f.name, "incompatible",
            s"${f.dataType.sql} -> ${t.sql}"))
        case Some(t) if widens(t, f.dataType) =>
          None // same type or producer still narrower: fine
        case Some(t) =>
          // producer widened beyond the contract: the contract's
          // declared type can no longer hold the data losslessly
          Some(Violation(f.name, "narrowing",
            s"contract ${f.dataType.sql} cannot hold producer ${t.sql}"))
      }
    }
  }

  /** Enforce the contract on a batch: throw (listing every violation)
    * or return the batch projected to the contracted columns in
    * contract order, types cast to the contract. */
  def align(df: DataFrame, contract: StructType): DataFrame = {
    val violations = check(contract, df.schema)
    require(violations.isEmpty,
      "schema contract violations: " + violations.map(v =>
        s"${v.column}[${v.kind}: ${v.detail}]").mkString(", "))
    df.select(contract.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }
}
