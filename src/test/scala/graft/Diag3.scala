package graft

import org.apache.spark.sql.SparkSession

/** Harness diagnostic #3 (round 14): age the session like the sweep does
  * (N full catalog passes at the target dir), then repeat text_bm25 with
  * fixed-work probes AND JIT code-heap occupancy. Hypothesis under test:
  * the 240 MB default ReservedCodeCacheSize fills after hundreds of
  * distinct generated-code classes; the JVM then deoptimizes/flushes and
  * the big codegen'd merge loops (bm25's sorted-key sum) run cold or
  * interpreted — query-specific degradation in LONG sessions, invisible
  * solo, unrelated to heap/GC/storage (all ruled out by Diag/Diag2).
  */
object Diag3 {
  private def jvmLoop(): Double = {
    val t0 = System.nanoTime()
    var x = 1.0; var i = 0
    while (i < 300000000) { x = x * 1.0000001 + 1e-9; i += 1 }
    if (x == 42.0) println("")
    (System.nanoTime() - t0) / 1e9
  }

  private def codeHeaps(): String = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map { p =>
        val u = p.getUsage
        f"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=${u.getUsed / 1e6}%.0f/${u.getMax / 1e6}%.0fMB"
      }.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir  = args.headOption.getOrElse("target/sf1")
    val ages = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(4)
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
    def bm25(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("text_bm25")(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    println(s"[diag3] start: ${codeHeaps()}")
    val w0 = bm25()
    println(f"[diag3] bm25 fresh ${w0}%7.2f s   ${codeHeaps()}")

    for (a <- 1 to ages) {
      val t0 = System.nanoTime()
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        try fn(spark, dir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[diag3] $name failed: ${e.getMessage}") }
      }
      println(f"[diag3] catalog pass #$a ${(System.nanoTime() - t0) / 1e9}%7.1f s   ${codeHeaps()}")
      for (i <- 1 to reps) {
        val jl = jvmLoop(); val ra = rangeAgg(); val q = bm25()
        println(f"[diag3] pass#$a bm25#$i ${q}%7.2f s  jvmLoop ${jl}%5.2f  rangeAgg ${ra}%5.2f  ${codeHeaps()}")
        System.gc(); Thread.sleep(200)
      }
    }
    spark.stop()
  }
}
