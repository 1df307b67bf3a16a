package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

/** The shared-seam memoization contract (round 13): the heavy subtrees
  * the dedup/graph/pipeline families share — shingle table, band
  * signatures, verified minhash pairs, CC cluster labels, quality
  * scores — must materialize ONCE per (application, sf-dir) and be
  * scanned by every consumer. A refactor that silently drops a cache
  * hit (e.g. by calling an `*Of(docs)` fixture builder on the catalog
  * path) re-inflates the catalog by one full pipeline re-run per
  * consumer — the regression this spec exists to catch, since every
  * consumer still returns CORRECT rows and no oracle check would fire.
  */
class MemoizationSpec extends AnyFunSuite with SparkTestBase {

  /** RDD ids of every checkpoint scan in the frame's analyzed plan. */
  private def scanIds(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }.toSet

  test("repeated catalog invocations scan one materialization, not fresh builds") {
    for (q <- Seq("dedup_minhash", "dedup_ngram", "dedup_containment",
                  "dedup_clusters", "pipeline_clean_corpus")) {
      val a = scanIds(SparkEntry.queries(q)(spark, Sf0001))
      val b = scanIds(SparkEntry.queries(q)(spark, Sf0001))
      assert(a.nonEmpty, s"$q plans no checkpoint scan at all")
      assert(a == b,
        s"$q re-materialized its memoized inputs on a second invocation: $a vs $b")
    }
  }

  test("near-dup pair consumers share the SAME minhash materialization") {
    // clusters (via its cached CC result's lineage), pagerank, ppr and
    // the pipeline all consume minhashShared — their builds run eagerly,
    // so equality is asserted on the shared helper itself plus the two
    // lazy consumers' plans
    val shared = scanIds(ops.Dedup.minhashShared(spark, Sf0001))
    assert(shared.size == 1)
    val pipeline = scanIds(SparkEntry.queries("pipeline_clean_corpus")(spark, Sf0001))
    assert(shared.subsetOf(pipeline),
      s"pipeline_clean_corpus does not scan the shared minhash pairs: $shared vs $pipeline")
  }

  test("quality consumers share the memoized score table") {
    val shared = scanIds(ops.TextAnalysis.qualityShared(spark, Sf0001))
    assert(shared.size == 1)
    for (q <- Seq("curate_pref_pairs", "pipeline_clean_corpus")) {
      val ids = scanIds(SparkEntry.queries(q)(spark, Sf0001))
      assert(shared.subsetOf(ids),
        s"$q rebuilds quality instead of scanning the memoized table")
    }
  }

  test("cached builds keep lint-clean plans: equi-joins only, no cartesian") {
    // the memoized builds execute eagerly at first use, so the per-query
    // plan lints never see their joins — audit the raw build trees
    // directly so the all-pairs fence stays airtight over the seam
    for ((name, df) <- ops.Dedup.buildPlansForAudit(spark, Sf0001)) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"build $name plans a CartesianProduct:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"build $name plans a BroadcastNestedLoopJoin:\n$p")
    }
  }

  test("curate_token_budget deliberately does NOT consume the memoized quality") {
    // the rangeCum pid-alignment fence: exchange reuse does not dedupe
    // duplicated LogicalRDD scans, so rangeCum callers must keep raw
    // subtrees (see Curation.tokenBudget). If this query ever scans the
    // shared quality checkpoint, its two range exchanges stop deduping.
    val shared = scanIds(ops.TextAnalysis.qualityShared(spark, Sf0001))
    val ids    = scanIds(SparkEntry.queries("curate_token_budget")(spark, Sf0001))
    assert(shared.intersect(ids).isEmpty,
      "curate_token_budget consumes the memoized quality checkpoint — " +
        "rangeCum's pid alignment requires the raw subtree")
  }
}
