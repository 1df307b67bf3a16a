package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic (guide §1: measure first): decompose each
  * catalog query's wall time into plan-construction, Catalyst
  * planning (analyze+optimize+physical), and execution, plus the job /
  * stage / task counts the execution schedules. The per-query constant
  * costs (driver-side planning, per-job scheduling) are invisible in
  * BENCH_FULL.json but bound the whole-catalog total at bench scale, so
  * this tells us whether a slow query needs a better PLAN or fewer
  * ACTIONS. Test scope: one-shot instrument, not part of the library jar.
  *
  * Usage: Test/runMain graft.ProfileCatalog [sfDir] [query ...]
  */
object ProfileCatalog {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(Sessions.envCpus(), logLevel = "ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    })

    // warmup (codegen/JIT bootstrap, storage twins)
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries.get("join_broadcast").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    try ops.Storage.warmup(spark, sfDir)
    catch { case _: Throwable => () }

    println("query\tbuild_s\tplan_s\texec_s\tjobs\tstages\ttasks")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // A catalog fn may itself run jobs (memoized cache builds,
      // checkpoint rounds): those land in build_s on first touch.
      val t0  = System.nanoTime()
      val df  = fn(spark, sfDir)
      val t1  = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+physical
      val t2 = System.nanoTime()
      jobs = 0; stages = 0; tasks = 0
      df.count()
      val t3 = System.nanoTime()
      Thread.sleep(60) // listener bus is async; small settle for counters
      println(f"$n\t${(t1 - t0) / 1e9}%.3f\t${(t2 - t1) / 1e9}%.3f\t${(t3 - t2) / 1e9}%.3f\t$jobs\t$stages\t$tasks")
    }
    spark.stop()
  }
}
