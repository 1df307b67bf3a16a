package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing catalog itself. */
class CatalogSpec extends AnyFunSuite with SparkTestBase {

  test("no silent key collisions across catalog modules") {
    val modules: Seq[(String, Iterable[String])] = Seq(
      "reference"  -> ops.Reference.queries.keys,
      "relational" -> ops.Relational.queries.keys,
      "events"     -> ops.Events.queries.keys,
      "dedup"      -> ops.Dedup.queries.keys,
      "similarity" -> ops.Similarity.queries.keys,
      "text"       -> ops.TextAnalysis.queries.keys,
      "mr"         -> ops.MRCompat.queries.keys,
      "multimodal" -> multimodal.Multimodal.queries.keys,
      "typed"      -> ops.TypedAgg.queries.keys,
      "skew"       -> ops.Skew.queries.keys,
      "pipeline"   -> ops.Pipeline.queries.keys,
      "curation"   -> ops.Curation.queries.keys,
      "storage"    -> ops.Storage.queries.keys,
      "stats"      -> ops.Stats.queries.keys,
      "graph"      -> ops.Graph.queries.keys,
      "sketches"   -> ops.Sketches.queries.keys)
    val all = modules.flatMap(_._2).toSeq
    assert(all.size == all.distinct.size,
      s"duplicate query names: ${all.diff(all.distinct).distinct.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every query has oracle SQL (full-strength correctness gate)") {
    // sketch-based profiles (Relational.approxStats) stay OUT of the
    // catalog — their internals legitimately differ across engines; each
    // is spec-bound against an oracle-checked exact twin instead
    // (ApproxStatsSpec vs stats_percentiles)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"rows-only (weak) checks for: ${missing.mkString(", ")}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle without query: ${orphaned.mkString(", ")}")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
