package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Per-stage wall/task-time profiler for catalog queries — the tool that
  * found the round-7 "AQE coalesced the expansion stage to ONE task" bug
  * in text_bm25 (a stage whose taskTime ≈ wall while sibling stages fan
  * out is the signature). Usage:
  *
  *   sbt "runMain graft.StageProbe <query> [sfDir]"
  *
  * Runs the query twice (codegen/JIT warm), then prints the top stages
  * of the LAST run by wall time with their task counts. A heavy stage
  * with tasks=1 under local[32] is a serialization bug, not a small
  * query.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse(sys.error("usage: StageProbe <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32", logLevel = "ERROR")
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime))
      }
    })
    val fn = SparkEntry.queries(name)
    def run(): Long = {
      val out = fn(spark, sfDir)
      (if (out.columns.contains("is_dup")) out.filter(col("is_dup")) else out).count()
    }
    run() // warm
    stages.clear()
    val t0 = System.nanoTime()
    run()
    println(f"[probe] $name total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._3).take(10).foreach { case (id, nt, wall, task) =>
      val flag = if (nt == 1 && wall > 500) "  <-- ONE TASK" else ""
      println(f"[probe] stage $id%4d tasks=$nt%3d wall=${wall}ms taskTime=${task}ms$flag")
    }
    spark.stop()
  }
}
