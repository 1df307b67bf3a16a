package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs the whole catalog on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * A small warm-up (count + one broadcast-join query) runs before the
  * timed loop so first-query numbers measure the plan, not JVM/codegen
  * bootstrap. Queries run in sorted name order for run-to-run
  * comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries.get("join_broadcast").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }

    // a failed query reports -1 (visible sentinel) and is excluded from
    // the total — a broken catalog must not read as a fast one
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
