package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestBase, Tables}

/** Scale-technique demonstrations that the oracle gate can't express:
  * bucketed co-located joins (no exchange), salting equivalence, and
  * sketch-aggregate accuracy.
  */
class ScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val li = Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_quantity")
    val or = Tables.orders(spark, Sf0001).select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.option("path", s"$wh/b_lineitem").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    or.write.option("path", s"$wh/b_orders").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    // force a non-broadcast join so the bucketed layout is what avoids
    // the shuffle (broadcast would mask it — and disable bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE b_lineitem")
    spark.sql("DROP TABLE b_orders")
  }

  test("salted two-phase aggregation is bit-identical to the direct agg") {
    val direct = Reference.skewAgg(spark, Sf0001).as[(String, Long, Double)].collect().toSeq
    val salted = Skew.saltedTotals(spark, Sf0001).as[(String, Long, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("approx_count_distinct lands within 5% of exact") {
    val li    = Tables.lineitem(spark, Sf0001)
    val exact = li.select(count_distinct(col("l_orderkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.01)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
