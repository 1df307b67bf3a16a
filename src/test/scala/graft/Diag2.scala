package graft

import org.apache.spark.sql.SparkSession

/** Harness diagnostic #2 (round 14): bm25 repeat degradation in a FRESH
  * session, with two fixed-work probes between repeats —
  *   - jvmLoop: single-thread pure-JVM arithmetic (no Spark) — moves only
  *     if the HOST slows (CPU steal, thermal, scheduler);
  *   - rangeAgg: spark.range(2e9).sum() across 32 tasks — moves if
  *     SPARK-INTERNAL per-run overhead accumulates (cleaner churn,
  *     codegen cache, tracker state) or the host slows.
  * If bm25 degrades while BOTH probes stay flat, the state is specific to
  * the query's own path (broadcasts, custom exec, AQE interactions).
  * Also prints /proc/stat cpu steal deltas — nonzero steal = noisy host.
  */
object Diag2 {
  private def jvmLoop(): Double = {
    val t0 = System.nanoTime()
    var x = 1.0; var i = 0
    while (i < 300000000) { x = x * 1.0000001 + 1e-9; i += 1 }
    if (x == 42.0) println("")
    (System.nanoTime() - t0) / 1e9
  }

  private def cpuStat(): (Long, Long) =
    // Linux-only probe: degrade to (1, 0) = 0% steal elsewhere rather
    // than crash the whole diagnostic on a missing /proc.
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get("/proc/stat"))) (1L, 0L)
    else scala.util.Using.resource(scala.io.Source.fromFile("/proc/stat")) { src =>
      val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      // (total, steal) — steal is field 8 (0-indexed 7)
      (f.sum, if (f.length > 7) f(7) else 0L)
    }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("target/sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rangeAgg(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000000L).selectExpr("sum(id * 2 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    var (lastTot, lastSteal) = cpuStat()
    for (i <- 1 to reps) {
      val jl = jvmLoop()
      val ra = rangeAgg()
      val t0 = System.nanoTime()
      SparkEntry.queries("text_bm25")(spark, dir).count()
      val q = (System.nanoTime() - t0) / 1e9
      val (tot, steal) = cpuStat()
      val stealPct = 100.0 * (steal - lastSteal) / math.max(1, tot - lastTot)
      lastTot = tot; lastSteal = steal
      println(f"[diag2] #$i%2d bm25 ${q}%7.2f s   jvmLoop ${jl}%5.2f s   rangeAgg ${ra}%5.2f s   steal ${stealPct}%4.1f%%")
      System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
