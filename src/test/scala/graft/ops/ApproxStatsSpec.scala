package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestBase, Tables}

/** The sketch-based profile (Relational.approxStats) is deliberately not a
  * catalog entry — sketch internals differ across engines by design, so it
  * has no DuckDB oracle (its oracle-checked exact twin is
  * `stats_percentiles`). Its correctness contract lives here: the HLL++
  * distinct counts and approximate percentiles must stay within tight
  * error bounds of the exact answers, and the sketches must be
  * partitioning-independent (merge order must not matter — the property
  * that makes them safe on a 1000-executor cluster).
  */
class ApproxStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("HLL distinct counts within 5% of exact; percentiles within 2%") {
    val approx = Relational.approxStats(spark, Sf0001)
      .as[(Long, Long, Double, Double)].head()
    val exact = Tables.lineitem(spark, Sf0001)
      .agg(
        count_distinct(col("l_orderkey")),
        count_distinct(col("l_partkey")),
        expr("percentile(l_extendedprice, 0.5)"),
        expr("percentile(l_extendedprice, 0.95)"))
      .as[(Long, Long, Double, Double)].head()
    def relErr(a: Double, e: Double) = math.abs(a - e) / e
    assert(relErr(approx._1.toDouble, exact._1.toDouble) < 0.05,
      s"approx_orders ${approx._1} vs exact ${exact._1}")
    assert(relErr(approx._2.toDouble, exact._2.toDouble) < 0.05,
      s"approx_parts ${approx._2} vs exact ${exact._2}")
    assert(relErr(approx._3, exact._3) < 0.02, s"p50 ${approx._3} vs exact ${exact._3}")
    assert(relErr(approx._4, exact._4) < 0.02, s"p95 ${approx._4} vs exact ${exact._4}")
  }

  test("sketch results are independent of the input partitioning") {
    val base = Relational.approxStats(spark, Sf0001)
      .as[(Long, Long, Double, Double)].head()
    val repart = Tables.lineitem(spark, Sf0001)
      .repartition(13, col("l_suppkey"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02),
        approx_count_distinct(col("l_partkey"), 0.02),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)))
      .as[(Long, Long, Double, Double)].head()
    assert(base._1 == repart._1 && base._2 == repart._2,
      s"HLL counts changed under repartitioning: $base vs $repart")
  }
}
