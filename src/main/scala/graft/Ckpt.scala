package graft

import org.apache.spark.sql.DataFrame

/** Materialization seam for iterative and multi-consumer intermediates
  * (connected-components labels, pagerank edges, BPE generations, shared
  * shingle tables).
  *
  * Default mode is `localCheckpoint(eager = true)`: blocks live on
  * executors only, which is the fastest way to truncate lineage at
  * `local[32]` — but on a real cluster an executor loss destroys blocks
  * whose lineage no longer exists, killing the job. Setting
  * `spark.graft.checkpoint.reliable=true` switches every iterative op to
  * reliable `checkpoint()` under the SparkContext checkpoint dir (set
  * one on a shared filesystem for a multi-executor cluster; a local temp
  * dir is auto-provisioned otherwise so the mode is testable on
  * local[*]). The logical result is identical — both surface as a
  * LogicalRDD scan — so downstream plan shapes do not change; only the
  * storage substrate does.
  *
  * Reliable-mode hygiene: checkpoint files are reclaimed by Spark when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, otherwise
  * they live until the checkpoint dir is deleted. [[graft.ops.Dedup
  * .freeCheckpoint]] (which unpersists superseded localCheckpoint
  * generations mid-loop) degrades to a harmless no-op on reliable
  * checkpoints — their RDDs hold no block-manager storage.
  */
object Ckpt {
  /** Session conf key: "true" → reliable `checkpoint()` instead of
    * `localCheckpoint()`.
    */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  def apply(df: DataFrame): DataFrame = {
    val spark    = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-ckpt-").toString)
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }
}
