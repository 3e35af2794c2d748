package graft.tools

import graft.{Sessions, SparkEntry}

/** Physical-plan audit over every registered query: flags missing
  * broadcast opportunities, full-column scans, and codegen gaps.
  * Heuristics, not gates — output is for the engineer to eyeball.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).headOption
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry
      .filter(q => only.forall(_ == q.name))
      .foreach { q =>
        val plan = try {
          val df = q.build(spark, d)
          // collect() runs df's OWN QueryExecution (count()/write wrap a
          // new one and leave this adaptive plan non-final, which hides
          // the codegen stage markers). sf0.001 outputs are small.
          df.collect()
          df.queryExecution.executedPlan.toString
        } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
          finally graft.queries.Q.cleanupScratch()
        val lines = plan.linesIterator.toSeq
        def count(p: String) = lines.count(_.contains(p))
        val flags = Seq(
          if (count("SortMergeJoin") > 0)
            Some(s"sortMergeJoin=${count("SortMergeJoin")}") else None,
          if (count("BroadcastHashJoin") > 0)
            Some(s"broadcast=${count("BroadcastHashJoin")}") else None,
          if (count("Exchange") > 0)
            Some(s"exchanges=${count("Exchange")}") else None,
          if (count("PushedFilters: [") > count("PushedFilters: []"))
            Some("pushedFilters") else None,
          // codegen stages print as "*(n) Op" in plan toString. A final
          // plan AQE collapsed through empty-relation propagation (a
          // zero-row intermediate at this SF's data draw — e.g. a
          // near-dup query whose candidate pairs are empty at sf0.01)
          // legitimately has no codegen stages: nothing runs. Flag it
          // as emptyCollapsed instead of NO-CODEGEN — but ONLY when no
          // heavy operator survives in the final plan: a plan with one
          // empty side-branch and a genuinely codegen-less main
          // pipeline must keep the NO-CODEGEN flag (both are printed)
          // or a real regression would hide behind the empty branch.
          if (plan.contains("WholeStageCodegen") || plan.contains("*("))
            None
          else if (count("EmptyRelation") > 0) {
            // Heavy ops are sought in the FINAL (executed) section only
            // — the Initial Plan section always carries the full
            // pre-collapse pipeline — and an `EmptyRelation ...` line
            // that NAMES the collapsed subtree's operators doesn't
            // count: only an operator line that actually survives.
            val finalLines = (if (plan.contains("== Initial Plan =="))
              plan.substring(0, plan.indexOf("== Initial Plan =="))
            else plan).linesIterator.toSeq
            // Anchor the match to the OPERATOR token (first letter run
            // after the tree-prefix characters), not contains() over
            // the whole line — an output attribute list mentioning
            // e.g. `join_key#12` must not false-flag (r15 ADVICE).
            def opToken(l: String): String =
              l.dropWhile(c => " :+-|*()0123456789".indexOf(c) >= 0)
                .takeWhile(_.isLetter)
            val heavySurvives = Seq("Join", "HashAggregate",
              "SortAggregate", "ObjectHashAggregate", "Window",
              "Generate", "Expand", "CartesianProduct").exists(op =>
                finalLines.exists(l => {
                  val t = opToken(l)
                  t.contains(op) && t != "EmptyRelation"
                }))
            if (heavySurvives) Some("emptyCollapsed NO-CODEGEN")
            else Some("emptyCollapsed")
          }
          else Some("NO-CODEGEN")).flatten
        println(f"${q.name}%-28s ${flags.mkString(" ")}")
        if (only.isDefined) println(plan)
      }
    spark.stop()
  }
}
