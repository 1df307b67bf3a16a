package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{MapReduceJob, MRApps, KV, MRApp}

/** Behavioral parity with the reference's probe tests (`play.sh`):
  * crash recovery (crash.so, play.sh:268-315), parallel execution
  * (mtiming/rtiming, play.sh:131-183), and exactly-once effects
  * (jobcount, play.sh:185-208) — re-expressed against Spark's task-retry
  * and scheduling machinery.
  */
class BehavioralSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "f1" -> "apple banana apple",
    "f2" -> "banana cherry",
    "f3" -> "cherry apple date",
    "f4" -> "date egg fig")

  test("crash injection: first task attempt dies, job still yields exact output") {
    BehavioralSpec.crashes.set(0)
    val crashingWc: MRApp = new MRApp {
      val name = "crashing-wc"
      def map(filename: String, contents: String): Seq[KV] = {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0 &&
          BehavioralSpec.crashes.getAndIncrement() == 0) {
          throw new RuntimeException("injected crash (crash.go analogue)")
        }
        MRApps.WordCount.map(filename, contents)
      }
      def reduce(key: String, values: Seq[String]): Seq[String] =
        MRApps.WordCount.reduce(key, values)
    }
    val expected = MapReduceJob
      .run(spark, docs.toDF("filename", "contents"), MRApps.WordCount)
      .as[(String, String)].collect().sorted.toSeq
    val got = MapReduceJob
      .run(spark, docs.toDF("filename", "contents").repartition(4), crashingWc)
      .as[(String, String)].collect().sorted.toSeq
    assert(BehavioralSpec.crashes.get() >= 1, "crash was never injected")
    assert(got == expected, "output after recovery differs from clean run")
  }

  test("crash injection in reduce: first attempt dies, job still yields exact output") {
    // crash.go injects failure inside BOTH Map and Reduce
    // (`example/mrapps/crash/crash.go:38,50`); this is the reduce-side half
    BehavioralSpec.reduceCrashes.set(0)
    val crashingWc: MRApp = new MRApp {
      val name = "reduce-crashing-wc"
      def map(filename: String, contents: String): Seq[KV] =
        MRApps.WordCount.map(filename, contents)
      def reduce(key: String, values: Seq[String]): Seq[String] = {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 &&
          BehavioralSpec.reduceCrashes.getAndIncrement() == 0) {
          throw new RuntimeException("injected reduce crash (crash.go:50 analogue)")
        }
        MRApps.WordCount.reduce(key, values)
      }
    }
    val expected = MapReduceJob
      .run(spark, docs.toDF("filename", "contents"), MRApps.WordCount)
      .as[(String, String)].collect().sorted.toSeq
    val got = MapReduceJob
      .run(spark, docs.toDF("filename", "contents").repartition(4), crashingWc)
      .as[(String, String)].collect().sorted.toSeq
    assert(BehavioralSpec.reduceCrashes.get() >= 1, "reduce crash was never injected")
    assert(got == expected, "output after reduce-side recovery differs from clean run")
  }

  test("crash injection on the secondary-sort path: streaming reduce retries to exact output") {
    // the RDD path (`MapReduceJob.runSecondarySort`) has its own shuffle +
    // streaming-reduce machinery; pin its retry behavior under failure too
    BehavioralSpec.ssCrashes.set(0)
    val crashingWc: MRApp = new MRApp {
      val name = "ss-crashing-wc"
      def map(filename: String, contents: String): Seq[KV] =
        MRApps.WordCount.map(filename, contents)
      def reduce(key: String, values: Seq[String]): Seq[String] =
        MRApps.WordCount.reduce(key, values)
      override def reduceStream(key: String, values: Iterator[String]): Iterator[String] = {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 &&
          BehavioralSpec.ssCrashes.getAndIncrement() == 0) {
          throw new RuntimeException("injected streaming-reduce crash")
        }
        MRApps.WordCount.reduceStream(key, values)
      }
    }
    val expected = MapReduceJob
      .runSecondarySort(spark, docs.toDF("filename", "contents"), MRApps.WordCount, 4)
      .as[(String, String)].collect().sorted.toSeq
    val got = MapReduceJob
      .runSecondarySort(spark, docs.toDF("filename", "contents"), crashingWc, 4)
      .as[(String, String)].collect().sorted.toSeq
    assert(BehavioralSpec.ssCrashes.get() >= 1, "secondary-sort crash was never injected")
    assert(got == expected, "secondary-sort output after recovery differs from clean run")
  }

  test("no partial committed output after a failing job (early_exit analogue)") {
    // play.sh:210-265 asserts no output is visible before it is final; the
    // Spark analogue is commit-protocol atomicity — a job whose final-stage
    // task fails permanently must leave zero committed files
    val out = java.nio.file.Files.createTempDirectory("graft-atomicity").toFile
    out.delete()
    val failing = spark.range(100).toDF("id")
      .repartition(4)
      .filter((_: org.apache.spark.sql.Row) =>
        throw new RuntimeException("injected permanent failure before commit"))
    intercept[Exception] {
      failing.write.mode("overwrite").parquet(out.getAbsolutePath)
    }
    val committed = Option(out.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") || f.getName == "_SUCCESS")
    assert(committed.isEmpty,
      s"failed job left committed output: ${committed.map(_.getName).mkString(", ")}")
  }

  test("map tasks run in parallel (mtiming analogue)") {
    BehavioralSpec.concurrent.set(0)
    BehavioralSpec.maxConcurrent.set(0)
    spark.sparkContext
      .parallelize(1 to 8, 8)
      .map { i =>
        val cur = BehavioralSpec.concurrent.incrementAndGet()
        BehavioralSpec.maxConcurrent.updateAndGet(m => math.max(m, cur))
        Thread.sleep(150)
        BehavioralSpec.concurrent.decrementAndGet()
        i
      }
      .count()
    assert(BehavioralSpec.maxConcurrent.get() >= 2,
      s"max concurrency ${BehavioralSpec.maxConcurrent.get()} — tasks did not overlap")
  }

  test("exactly-once effects absent failures (jobcount analogue)") {
    BehavioralSpec.mapInvocations.set(0)
    val countingWc: MRApp = new MRApp {
      val name = "counting-wc"
      def map(filename: String, contents: String): Seq[KV] = {
        BehavioralSpec.mapInvocations.incrementAndGet()
        MRApps.WordCount.map(filename, contents)
      }
      def reduce(key: String, values: Seq[String]): Seq[String] =
        MRApps.WordCount.reduce(key, values)
    }
    MapReduceJob.run(spark, docs.toDF("filename", "contents"), countingWc).count()
    assert(BehavioralSpec.mapInvocations.get() == docs.size,
      s"map ran ${BehavioralSpec.mapInvocations.get()} times for ${docs.size} inputs")
  }
}

/** Static state shared with executor threads (same JVM in local mode). */
object BehavioralSpec {
  val crashes        = new AtomicInteger(0)
  val reduceCrashes  = new AtomicInteger(0)
  val ssCrashes      = new AtomicInteger(0)
  val concurrent     = new AtomicInteger(0)
  val maxConcurrent  = new AtomicInteger(0)
  val mapInvocations = new AtomicInteger(0)
}
