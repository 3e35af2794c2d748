package graft

import org.apache.spark.sql.functions._
import graft.operators.{MergeUpsert, SaltedJoin}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join and salted aggregate match their unsalted twins") {
    import org.apache.spark.sql.functions._
    // 90% of fact rows carry one hot key
    val fact = (1L to 10000L)
      .map(i => (i, if (i % 10 == 0) s"k${i % 50}" else "HOT", i * 1.5))
      .toDF("row_id", "k", "v")
    val dim = (Seq("HOT") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "dv")
    val plain = fact.join(dim, Seq("k")).select("row_id", "k", "dv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val salted = SaltedJoin
      .saltedEquiJoin(fact, dim, "k", salts = 8, saltBy = col("row_id"))
      .select("row_id", "k", "dv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(salted == plain)
    val plainAgg = fact.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedAgg = SaltedJoin
      .saltedSumByKey(fact, "k", col("v"), salts = 8,
        saltBy = col("row_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedAgg.keySet == plainAgg.keySet)
    saltedAgg.foreach { case (k, v) =>
      assert(math.abs(v - plainAgg(k)) < 1e-6, k)
    }
  }

  test("salted join: left outer preserves unmatched fact rows exactly once") {
    val fact = Seq((1L, "HOT"), (2L, "HOT"), (3L, "orphan"))
      .toDF("row_id", "k")
    val dim = Seq(("HOT", "d0")).toDF("k", "dv")
    val got = SaltedJoin
      .saltedEquiJoin(fact, dim, "k", salts = 4, saltBy = col("row_id"),
        joinType = "left")
      .select("row_id", "k", "dv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, "HOT", "d0"), (2L, "HOT", "d0"),
      (3L, "orphan", null)))
  }

  test("salted join rejects dim-preserving join types") {
    val fact = Seq((1L, "a")).toDF("row_id", "k")
    val dim = Seq(("a", "d")).toDF("k", "dv")
    for (jt <- Seq("right", "full", "full_outer", "right_outer")) {
      val e = intercept[IllegalArgumentException] {
        SaltedJoin.saltedEquiJoin(fact, dim, "k", salts = 4,
          saltBy = col("row_id"), joinType = jt)
      }
      assert(e.getMessage.contains("fact-preserving"), jt)
    }
  }

  test("partitioned table write: month filter lands in PartitionFilters") {
    val root = java.nio.file.Files.createTempDirectory("cat_part").toString
    val cat = new graft.ref.Catalog(spark, root)
    val df = Seq(
      (1L, "2024-01", 10.0), (2L, "2024-01", 20.0), (3L, "2024-02", 30.0))
      .toDF("id", "order_month", "amount")
    cat.saveTablePartitioned("mart", "part_demo", df, Seq("order_month"))
    val read = spark.read.parquet(s"$root/mart/part_demo")
      .filter(col("order_month") === "2024-01")
    assert(read.count() == 2)
    val scan = read.queryExecution.executedPlan.toString
    val pf = scan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.contains("order_month"),
      s"expected partition pruning on order_month, plan line: $pf")
    // the partition dir layout is the hive convention
    assert(new java.io.File(s"$root/mart/part_demo/order_month=2024-02")
      .exists())
  }

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
