package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** COLUMN-LEVEL LINEAGE from a DataFrame's analyzed plan — for every
  * output column, the set of SOURCE columns (`table.column`) it was
  * computed from. This is the governance/catalog feature a lakehouse
  * pipeline needs (impact analysis: "which marts break if this raw
  * column changes type" — precisely the blast-radius question the
  * round-10 `events.ts` drift raised) computed from the plan itself,
  * so it can never drift from the code the way hand-maintained lineage
  * docs do.
  *
  * Mechanics: one bottom-up pass mapping each attribute's `ExprId` to
  * its source-column set. Nodes that DEFINE attributes (Project /
  * Aggregate / Window / Generate / Expand) map each named expression to
  * the union of its referenced attributes' sources; Union merges
  * positionally; every other node passes its children's maps through
  * (Filter/Join/Sort change rows, not column derivation). The result
  * is conservative data-flow lineage: a column depends on everything
  * its expression references (control-flow deps — filter predicates —
  * are out of scope, as in every production lineage tool's default
  * mode). Driver-side plan walking only; nothing is executed. */
object Lineage {

  private type Src = Map[ExprId, Set[String]]

  private def relationName(lr: LogicalRelation): String =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map { p =>
          p.getName.stripSuffix(".parquet")
        }.getOrElse("relation")
      case _ => "relation"
    }

  private def fromNamed(exprs: Seq[NamedExpression], child: Src): Src =
    exprs.map {
      case a: Alias =>
        a.exprId -> a.child.references.toSeq
          .flatMap(r => child.getOrElse(r.exprId, Set.empty[String])).toSet
      case att: Attribute =>
        att.exprId -> child.getOrElse(att.exprId, Set.empty[String])
      case ne =>
        ne.exprId -> ne.references.toSeq
          .flatMap(r => child.getOrElse(r.exprId, Set.empty[String])).toSet
    }.toMap

  private def walk(plan: LogicalPlan): Src = plan match {
    case lr: LogicalRelation =>
      val t = relationName(lr)
      lr.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
    case l: LocalRelation =>
      l.output.map(a => a.exprId -> Set(s"local.${a.name}")).toMap
    case p: Project =>
      val c = walk(p.child)
      c ++ fromNamed(p.projectList, c)
    case a: Aggregate =>
      val c = walk(a.child)
      c ++ fromNamed(a.aggregateExpressions, c)
    case w: Window =>
      val c = walk(w.child)
      c ++ fromNamed(w.windowExpressions, c)
    case g: Generate =>
      val c = walk(g.child)
      val genSrc = g.generator.references.toSeq
        .flatMap(r => c.getOrElse(r.exprId, Set.empty[String])).toSet
      c ++ g.generatorOutput.map(a => a.exprId -> genSrc).toMap
    case e: Expand =>
      val c = walk(e.child)
      // each output position unions the sources of that position
      // across all projection arms
      c ++ e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections.flatMap(row => row(i).references.toSeq
          .flatMap(r => c.getOrElse(r.exprId, Set.empty[String]))).toSet
      }.toMap
    case u: Union =>
      val children = u.children.map(walk)
      val merged = children.reduce(_ ++ _)
      merged ++ u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(children).flatMap { case (ch, m) =>
          m.getOrElse(ch.output(i).exprId, Set.empty[String])
        }.toSet
      }.toMap
    case other =>
      other.children.map(walk)
        .foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
  }

  /** Output column name → source `table.column` set. */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val src = walk(plan)
    plan.output.map(a =>
      a.name -> src.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  /** Lineage report for a registered query — `table.column` sources per
    * output column, one line each, sorted. */
  def report(df: DataFrame): String =
    columnLineage(df).toSeq.sortBy(_._1).map { case (out, srcs) =>
      f"$out%-28s <- ${srcs.toSeq.sorted.mkString(", ")}"
    }.mkString("\n")

  /** CLI: `runMain graft.tools.Lineage <sfDir> <queryName>` prints the
    * column lineage of one registered query. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = args.lift(1).getOrElse("q1_pricing_summary")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println(s"== $name")
    println(report(df))
  }
}
