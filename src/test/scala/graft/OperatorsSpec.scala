package graft

import org.apache.spark.sql.functions._
import graft.operators.MergeUpsert

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: incoming wins on key collision, both sides' strays survive") {
    val existing = Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("k", "v")
    val incoming = Seq((2, "new2"), (4, "new4")).toDF("k", "v")
    val got = MergeUpsert.upsert(existing, incoming, Seq("k"))
      .orderBy("k").as[(Int, String)].collect()
    assert(got.toSeq == Seq((1, "old1"), (2, "new2"), (3, "old3"),
      (4, "new4")))
  }

  test("incrementalNewRows: strictly newer than target watermark") {
    val target = Seq(("2024-01-01"), ("2024-01-05")).toDF("d")
      .select($"d".cast("date"))
    val incoming = Seq("2024-01-05", "2024-01-06", "2024-01-07").toDF("d")
      .select($"d".cast("date"))
    val got = MergeUpsert.incrementalNewRows(target, "d", incoming)
      .orderBy("d").collect().map(_.getDate(0).toString)
    assert(got.toSeq == Seq("2024-01-06", "2024-01-07"))
  }

  test("assertSameSchema fails on drift, passes on match") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((2, "y")).toDF("k", "v")
    MergeUpsert.assertSameSchema(a, b)
    val c = Seq((1, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      MergeUpsert.assertSameSchema(a, c)
    }
  }
}
