package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestBase, Tables}

/** Correctness contract for the count-min / space-saving heavy-hitter
  * sketches (catalog-external, like `Relational.approxStats` — sketch
  * internals have no DuckDB twin, so the bounds are pinned here against
  * the exact token counts instead).
  */
class SketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def exactCounts: Map[String, Long] =
    graft.text.Tokenize.tokens(Tables.documents(spark, Sf0001))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap

  test("CMS estimates never under-count and respect the epsilon*N band") {
    val exact = exactCounts
    val n = exact.values.sum
    val cms = new Sketches.CountMinSketch(Sketches.HhDepth, Sketches.HhWidth)
    val toks = Tables.documents(spark, Sf0001)
      .select(explode(graft.text.Tokenize.tokenCol(col("text"))).as("t"))
      .filter(col("t") =!= "").as[String]
    val sk = toks.select(cms.toColumn.name("sk")).as[Array[Long]].head()
    // CMS guarantee: est >= exact always; est <= exact + (e/width)*N
    // with prob 1 - e^-depth per key. Check every key and allow ZERO
    // band violations at fixture scale (expected violations ~ V*e^-4)
    val eps = math.E / Sketches.HhWidth
    exact.foreach { case (t, c) =>
      val est = cms.estimate(sk, t)
      assert(est >= c, s"CMS under-counted '$t': $est < $c")
      assert(est <= c + math.ceil(eps * n).toLong,
        s"CMS over-counted '$t' beyond the eps*N band: $est vs $c (N=$n)")
    }
  }

  test("sketched heavy hitters reproduce the exact top-k on the fixture") {
    val exactTop = exactCounts.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10)
    val got = Sketches.docTokenHeavyHitters(spark, Sf0001, 10)
      .as[(String, Long)].collect().toSeq
    assert(got.map(_._1) == exactTop.map(_._1),
      s"sketched top-10 ${got.map(_._1)} != exact ${exactTop.map(_._1)}")
    // estimates are upper bounds of the matching exact counts
    val ex = exactCounts
    got.foreach { case (t, est) => assert(est >= ex(t), s"'$t' $est < ${ex(t)}") }
  }

  test("the sketch is bit-identical across input partitionings") {
    val cms = new Sketches.CountMinSketch(Sketches.HhDepth, Sketches.HhWidth)
    def skAt(parts: Int): Array[Long] = {
      val toks = Tables.documents(spark, Sf0001)
        .repartition(parts)
        .select(explode(graft.text.Tokenize.tokenCol(col("text"))).as("t"))
        .filter(col("t") =!= "").as[String]
      toks.select(cms.toColumn.name("sk")).as[Array[Long]].head()
    }
    assert(java.util.Arrays.equals(skAt(3), skAt(17)),
      "element-wise merge must be partitioning-independent")
  }

  test("space-saving keeps every key above the per-partition frequency floor") {
    // one partition, 1000 'hot' + 999 distinct cold keys, m = 64: the
    // floor n_p/m ≈ 31 — 'hot' must survive any eviction schedule
    val toks = (Seq.fill(1000)("hot") ++ (1 to 999).map(i => s"cold$i"))
    val ds = spark.createDataset(scala.util.Random.shuffle(toks)).repartition(1)
    val kept = Sketches.spaceSavingCandidates(ds, 64).collect().toSet
    assert(kept.contains("hot"), "hot key evicted despite frequency above n/m")
    assert(kept.size <= 64, s"candidate set exceeded m: ${kept.size}")
  }

  test("sketch_heavy_hitters: exact-rescored top-k == the all-exact twin, across partitionings") {
    import org.apache.spark.sql.functions._
    // the oracle-checkable catalog query: candidate generation varies
    // with partition layout, but the exact-rescored top-k must not
    val exact = graft.Tables.documents(spark, Sf0001)
      .select(explode(graft.text.Tokenize.tokenCol(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("t")).limit(Sketches.HhK)
      .select(col("t").as("token"), col("cnt"))
      .collect().toSeq
    val got = Sketches.heavyHittersExact(spark, Sf0001).collect().toSeq
    assert(got == exact)
    withSQLConf("spark.sql.shuffle.partitions" -> "13") {
      assert(Sketches.heavyHittersExact(spark, Sf0001).collect().toSeq == exact)
    }
  }

  test("sketch_quantiles: bracketed selection == brute-force exact nearest-rank, across layouts") {
    import org.apache.spark.sql.functions._
    // brute-force exact nearest-rank quantiles, computed independently of
    // the bracket machinery (driver-side full sort per type)
    val rows = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val exact = rows.groupBy(_._1).flatMap { case (t, xs) =>
      val sorted = xs.map(_._2).sorted
      Sketches.QTargets.map { p =>
        val r = (p * sorted.length + 99) / 100 // ceil(p*n/100), 1-based
        (t, p, sorted(r - 1))
      }
    }.toSet
    def got: Set[(String, Int, Double)] =
      Sketches.quantilesEvents(spark, Sf0001)
        .as[(String, Int, Double)].collect().toSet
    assert(got == exact, s"bracketed != brute: ${got.diff(exact)}")
    // the sketch's brackets move with layout; the exact selection must not
    withSQLConf("spark.sql.shuffle.partitions" -> "13") {
      assert(got == exact)
    }
  }

  test("sketch_hll_distinct: estimate within the HLL error envelope, layout-independent") {
    val out = Sketches.hllDistinct(spark, Sf0001)
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // 1.04/sqrt(512) ~ 4.6% standard error; allow ~3 sigma (linear
    // counting, active when empty registers remain at low cardinality,
    // is tighter still)
    for ((t, exact, vZero, est) <- out) {
      assert(vZero >= 0 && vZero <= Sketches.HllM)
      val rel = math.abs(est - exact) / exact.toDouble
      assert(rel <= 0.15, f"$t: est $est%.1f vs exact $exact (rel err $rel%.3f)")
    }
    info(out.map { case (t, e, _, h) => f"$t: exact $e est $h%.1f" }.mkString("; "))
    // register build is duplicate-insensitive and partitioning-independent
    val again = Sketches.hllDistinct(spark, Sf0001)
      .repartition(7).as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq == out.sortBy(_._1).toSeq)
  }

  test("sketch_bloom: zero false negatives by construction, fp near the design point") {
    val Seq((probes, members, hits, falsePos, fpRate)) = Sketches.bloomAudit(spark, Sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(probes > 0 && members > 0 && members < probes,
      s"fixture must probe members AND non-members (probes=$probes members=$members)")
    // no false negatives: hits = member hits + false positives, and
    // every one of the `members` true members must be a member hit
    assert(hits - falsePos == members,
      s"false negative: only ${hits - falsePos} of $members members hit")
    // design point: k=3, 16 bits/member -> fp ~ (1 - e^(-3/16))^3 ~ 0.5%;
    // allow a generous band on the small fixture probe set
    assert(fpRate <= 0.05, s"fp rate $fpRate far above the 0.5% design point")
  }

  test("sketch_quantiles: bracket covers the target rank on an adversarial duplicate-heavy column") {
    import org.apache.spark.sql.functions._
    // 90% of mass on one value (the p50/p90 answer IS the hot value, and
    // the below-count must exclude none of its duplicates), plus a long
    // unique tail — exercises the lo == answer duplicate edge
    val vals = Seq.fill(9000)(42.0) ++ (1 to 1000).map(i => 100.0 + i)
    val df = spark.createDataset(vals).toDF("value")
      .withColumn("event_type", lit("hot"))
      .repartition(7)
    val out = Sketches.quantilesBracketed(df)
      .as[(String, Int, Double)].collect()
      .map { case (t, p, v) => ((t, p), v) }.toMap
    val sorted = vals.sorted
    Sketches.QTargets.foreach { p =>
      val r = (p * sorted.length + 99) / 100
      assert(out(("hot", p)) == sorted(r - 1),
        s"p$p: ${out(("hot", p))} != ${sorted(r - 1)}")
    }
  }
}
