package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan of the
  * named catalog queries (all of them with no args). Used to audit that
  * filters reach the parquet scan (PushedFilters), dimension joins
  * broadcast, and codegen spans stay wide.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  *
  * SPARK_GRAFT_EXEC=1 additionally EXECUTES each query and prints the
  * post-execution adaptive plan — the only place AQE's runtime stage
  * reuse (ReusedQueryStage / shared shuffle stages) is visible; the
  * static formatted plan always shows repeated subtrees un-reused.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val exec  = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    // shared engine config; default to the bench's core count so dumped
    // plans are the shapes the bench times (r15 verdict item 3)
    val spark = Sessions.local(Sessions.envCpus(), logLevel = "ERROR")
    names.foreach { n =>
      println(s"===== $n")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        df.count()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
