package graft

import org.apache.spark.sql.SparkSession

/** Full-catalog sf1 sweep (round-12 verdict item 2): run every catalog
  * query once at ~sf1 (a 10× replica of sf0.1 built by [[ScaleData]],
  * referential integrity preserved) and report, per query,
  *
  *   - wall seconds at sf1 (single pass, after a catalog-wide warm-up
  *     query — this is a scaling probe, not the 3-run bench), and
  *   - the JOIN-NODE PROFILE of the as-run (AQE-final) plan at sf0.1 vs
  *     sf1: counts of BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin
  *     / BroadcastNestedLoop / Cartesian. A profile difference is exactly
  *     the "AQE plan flip" the verdict asks to see at 10× — usually a
  *     broadcast→shuffle flip when a build side outgrows the threshold.
  *
  * Prints one line per query plus a summary: total, slowest-10, and the
  * flip list. Results are pasted into SCALING.md.
  *
  * Usage: `tools/scalesweep.sh [query ...]` — no args sweeps the whole
  * catalog.
  */
object ScaleSweep {
  val Src = "/root/testdata/sf0.1"
  val Out = "target/sf1"

  private val JoinNodes = Seq(
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct")

  /** Join-node profile of the final (post-AQE) physical plan. */
  private def joinProfile(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    val names = Smoke.finalPlanNodes(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    JoinNodes.map(j => j -> names.count(_.startsWith(j))).filter(_._2 > 0).toMap
  }

  private def fmtProfile(p: Map[String, Int]): String =
    if (p.isEmpty) "-"
    else p.toSeq.sortBy(_._1).map { case (k, v) =>
      val short = k.replace("BroadcastHashJoin", "BHJ").replace("SortMergeJoin", "SMJ")
        .replace("ShuffledHashJoin", "SHJ").replace("BroadcastNestedLoopJoin", "BNL")
        .replace("CartesianProduct", "CART")
      s"$short=$v"
    }.mkString(",")

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ScaleData.buildAll(spark, Src, Out)
    println(s"[sweep] sf1 rows: docs=${Tables.documents(spark, Out).count()} " +
      s"lineitem=${Tables.lineitem(spark, Out).count()} events=${Tables.events(spark, Out).count()}")

    // storage-layout ETL is a one-time writer cost at both scales
    try ops.Storage.warmup(spark, Src)
    catch { case e: Throwable => System.err.println(s"[sweep] warmup sf0.1: $e") }
    try ops.Storage.warmup(spark, Out)
    catch { case e: Throwable => System.err.println(s"[sweep] warmup sf1: $e") }

    val only = if (args.nonEmpty) Some(args.toSet) else None
    val catalog = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1)

    case class Row(name: String, sec1: Double, p01: Map[String, Int], p1: Map[String, Int],
                   err: Option[String]) {
      def flipped: Boolean = err.isEmpty && p01 != p1
    }
    val rows = catalog.map { case (name, fn) =>
      try {
        // sf0.1 reference pass: cheap, gives the baseline join profile
        // (and acts as the per-query JVM/codegen warm-up for the sf1 run)
        val d01 = fn(spark, Src)
        d01.count()
        val prof01 = joinProfile(d01)
        val t0 = System.nanoTime()
        val d1 = fn(spark, Out)
        d1.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val prof1 = joinProfile(d1)
        val r = Row(name, sec, prof01, prof1, None)
        println(f"[sweep] $name%-24s ${r.sec1}%7.2f s  sf0.1[${fmtProfile(prof01)}]  sf1[${fmtProfile(prof1)}]" +
          (if (r.flipped) "  FLIP" else ""))
        r
      } catch {
        case scala.util.control.NonFatal(e) =>
          val r = Row(name, -1, Map.empty, Map.empty,
            Some(String.valueOf(e.getMessage).linesIterator.take(1).mkString))
          println(s"[sweep] $name FAILED: ${r.err.get}")
          r
      }
    }

    val ok = rows.filter(_.err.isEmpty)
    println(f"\n[sweep] total sf1: ${ok.map(_.sec1).sum}%.1f s over ${ok.size} queries " +
      s"(${rows.size - ok.size} failed)")
    println("[sweep] slowest 10:")
    for (r <- ok.sortBy(-_.sec1).take(10))
      println(f"[sweep]   ${r.name}%-24s ${r.sec1}%7.2f s")
    val flips = ok.filter(_.flipped)
    println(s"[sweep] plan flips at 10x: ${flips.size}")
    for (r <- flips)
      println(s"[sweep]   ${r.name}: sf0.1[${fmtProfile(r.p01)}] -> sf1[${fmtProfile(r.p1)}]")
    spark.stop()
    if (rows.exists(_.err.isDefined)) sys.exit(1)
  }
}
