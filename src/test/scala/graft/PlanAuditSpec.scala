package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net over plan quality: the physical properties that make
  * these queries scale must survive refactors — filters reaching the
  * parquet scan, dimension joins broadcasting, global top-k compiling to
  * TakeOrderedAndProject rather than a full sort.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString

  test("q1_pricing pushes the shipdate filter into the scan") {
    assert(plan("q1_pricing").contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q5_nation_revenue broadcasts its dimension joins") {
    assert(plan("q5_nation_revenue").contains("BroadcastHashJoin"))
  }

  test("topk_global is TakeOrderedAndProject, not sort+limit") {
    val p = plan("topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("join_broadcast keeps the explicit broadcast hint") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("wc has a single shuffle (partial+final agg)") {
    val p = plan("wc")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p)
  }
}
