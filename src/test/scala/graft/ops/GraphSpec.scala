package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Properties of the PageRank loop the row-level oracle can't state:
  * mass conservation, centrality ordering on a known topology, and
  * partitioning independence of the quantized iteration.
  */
class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pagerank: rank mass is conserved across iterations") {
    // Σ ranks stays 1 up to the per-node grid quantization (each of the
    // n node ranks is on the decimal(38,12) grid, so the total drifts by
    // at most n·5e-13 per iteration)
    val ranks = Graph.pagerankNearDup(spark, Sf0001)
      .select("rank").as[Double].collect()
    assert(ranks.nonEmpty, "near-dup graph should be non-empty on the fixture")
    val tol = ranks.length * 5e-13 * Graph.PrIterations
    assert(math.abs(ranks.sum - 1.0) <= tol + 1e-12,
      s"rank mass ${ranks.sum} drifted from 1.0 beyond quantization tolerance $tol")
    assert(ranks.forall(_ > 0), "every node must keep positive rank")
  }

  test("pagerank: the hub of a star graph outranks every leaf") {
    val star = (1L to 8L).map(l => (0L, l)).toDF("da", "db")
    val ranks = Graph.pagerank(star).as[(Long, Double)].collect().toMap
    assert(ranks.size == 9)
    val hub = ranks(0L)
    (1L to 8L).foreach(l => assert(hub > ranks(l), s"hub $hub not above leaf ${ranks(l)}"))
    // leaves are symmetric — the quantized iteration must give them
    // IDENTICAL ranks, not merely close ones
    assert((1L to 8L).map(ranks).distinct.size == 1, "symmetric leaves diverged")
  }

  test("pagerank: deterministic across shuffle-partition counts") {
    val a = Graph.pagerankNearDup(spark, Sf0001)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    withSQLConf("spark.sql.shuffle.partitions" -> "13") {
      val b = Graph.pagerankNearDup(spark, Sf0001)
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      assert(a == b)
    }
  }
}
