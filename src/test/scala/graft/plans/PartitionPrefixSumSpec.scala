package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The r15 PartitionPrefixSum operator must be value-equivalent to the
  * window formulation it replaced inside [[graft.ops.Stats.rangeCum]]:
  * `sum(c).over(Window.partitionBy(spark_partition_id(), groups)
  * .orderBy(ord))` — including RANGE-frame tie sharing, null addends,
  * decimal accumulation, and the empty-groups (global) case.
  */
class PartitionPrefixSumSpec extends AnyFunSuite with SparkTestBase {

  private def compare(
      df: org.apache.spark.sql.DataFrame,
      groups: Seq[String], ord: String, c: String): Unit = {
    val ranged = df.repartitionByRange((groups :+ ord).map(col): _*)
    val got = PartitionPrefixSum
      .withLocalCum(ranged, groups, ord, c, lastName = Some("cl"))
      .withColumnRenamed("lcum", "got")
    val w = Window
      .partitionBy((Seq("pid") ++ groups).map(col): _*)
      .orderBy(ord)
    val want = got
      .withColumn("want", sum(col(c)).over(w))
    val bad = want.filter(
      !(col("got") <=> col("want"))).count()
    assert(bad == 0, s"prefix sums diverge from the window formulation on $bad rows")
    // the r16 cell-last marker: exactly one true row per (pid, groups)
    // cell, and its running sum equals the cell's plain aggregate sum
    // (rangeCum's per-slice subtotal contract)
    val cells = got.groupBy(("pid" +: groups).map(col): _*)
      .agg(
        sum(when(col("cl"), 1).otherwise(0)).as("n_last"),
        max(when(col("cl"), col("got"))).as("last_cum"),
        sum(col(c)).as("cell_sum"))
    val badCells = cells.filter(
      col("n_last") =!= 1 || !(col("last_cum") <=> col("cell_sum"))).count()
    assert(badCells == 0,
      s"cell-last marker diverges from the per-cell aggregate on $badCells cells")
  }

  test("long counts, multi-group, with ties sharing a RANGE-frame value") {
    val df = spark
      .createDataFrame(Seq(
        ("a", 1.0, 3L), ("a", 1.0, 4L), ("a", 2.0, 1L), ("b", 1.0, 2L),
        ("b", 5.0, 7L), ("b", 5.0, 1L), ("c", -1.0, 2L)))
      .toDF("g", "v", "c")
    compare(df, Seq("g"), "v", "c")
  }

  test("empty groups (global axis) and null addends match window semantics") {
    val rows = Seq[(Double, java.lang.Long)](
      (1.0, null), (1.0, null), (2.0, 5L), (3.0, null), (4.0, 2L))
    val df = spark.createDataFrame(rows).toDF("v", "c")
    compare(df, Seq(), "v", "c")
  }

  test("decimal addends accumulate exactly at precision 38") {
    val df = spark
      .createDataFrame(Seq(
        ("a", 1.0, "12345678901234.567890"), ("a", 2.0, "0.000001"),
        ("a", 2.0, "99999999999999.999999"), ("b", 9.0, "-7.25")))
      .toDF("g", "v", "cs")
      .withColumn("c", col("cs").cast("decimal(38,6)"))
      .drop("cs")
    compare(df, Seq("g"), "v", "c")
  }

  test("larger randomized histogram equals the window formulation") {
    val df = spark.range(20000).selectExpr(
      "concat('g', id % 7) AS g",
      "cast(pmod(xxhash64(id), 500) as double) AS v",
      "pmod(xxhash64(id, 1), 9) AS c")
    compare(df, Seq("g"), "v", "c")
  }
}
