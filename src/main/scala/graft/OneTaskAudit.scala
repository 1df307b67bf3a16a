package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Catalog-wide hunt for the round-13 bug class: a stage AQE coalesced
  * to ONE task that then burns serious CPU (the byte-size coalescer is
  * blind to expensive expressions — the fuzzy Levenshtein verify ran
  * 9.5e9 DP cells on one thread at sf1, see SCALING.md round 13).
  *
  * Runs each catalog query at the given SF dir and reports every stage
  * with numTasks == 1 whose executor run time exceeds the threshold —
  * a single-task stage that heavy under local[32] is a serialization
  * cliff that only widens with the corpus, not a small query. Final
  * 1-row aggregations and collect-limit stages stay under the threshold
  * by construction, so the report is near-zero-noise.
  *
  * Usage: `OneTaskAudit <sfDir> [thresholdMs] [query ...]`
  * (tools/onetask.sh wraps the classpath).
  */
object OneTaskAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val thresholdMs = args.lift(1).map(_.toLong).getOrElse(2000L)
    val only = args.drop(2).toSet
    val spark = Sessions.local("32", logLevel = "ERROR")

    val oneTask = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.numTasks == 1 && si.taskMetrics.executorRunTime > thresholdMs)
          oneTask.add((si.stageId, si.taskMetrics.executorRunTime))
      }
    })

    try ops.Storage.warmup(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[onetask] warmup: $e") }

    import scala.jdk.CollectionConverters._
    var flagged = 0
    val catalog = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.isEmpty || only(n) }
      .sortBy(_._1)
    for ((name, fn) <- catalog) {
      oneTask.clear()
      try {
        val out = fn(spark, sfDir)
        (if (out.columns.contains("is_dup")) out.filter(col("is_dup")) else out).count()
        // listener events are async (the bus drain API is private);
        // stage-completed events for an already-returned action arrive
        // within milliseconds — a short sleep is enough for an audit
        Thread.sleep(500)
        val hits = oneTask.asScala.toSeq.sortBy(-_._2)
        if (hits.nonEmpty) {
          flagged += 1
          println(s"[onetask] $name: " +
            hits.map { case (id, ms) => s"stage $id ${ms}ms/1task" }.mkString(", "))
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[onetask] $name FAILED: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString}")
      }
    }
    println(s"[onetask] ${catalog.size} queries checked at $sfDir, $flagged flagged (threshold ${thresholdMs}ms)")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
