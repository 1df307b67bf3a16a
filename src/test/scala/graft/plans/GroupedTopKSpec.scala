package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.Relational

/** The custom whole-operator top-k: result parity with the window-function
  * formulation, the promised plan shape (shuffle but NO sort), and edge
  * cases the oracle gate can't reach.
  */
class GroupedTopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bit-identical to the window row_number formulation") {
    val fast = Relational.windowTopkFast(spark, Sf0001)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val win = Relational.windowTopkOrders(spark, Sf0001)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(fast == win)
  }

  test("physical plan shuffles on the key but never sorts") {
    val plan = Relational.windowTopkFast(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK "), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), s"custom top-k should not sort:\n$plan")
  }

  test("k larger than every group returns whole groups, ranked") {
    val df = Seq((1L, 10.0), (1L, 30.0), (2L, 20.0)).toDF("k", "v")
    val out = GroupedTopK.topK(df, Seq("k"), Seq("v" -> false), k = 5)
      .as[(Long, Double, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq((1L, 30.0, 1L), (1L, 10.0, 2L), (2L, 20.0, 1L)))
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(GroupedTopK.topK(df, Seq("k"), Seq("v" -> true), k = 3).count() == 0)
  }
}
