package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Skewed-ingest probe (round-12 verdict item 6): a Gutenberg-shaped
  * directory — one ~600 KB file plus many tiny ones — is exactly the
  * reference's 1-file-=-1-task hazard
  * (`internal/coordinator/coordinator.go:124-133`: the map task list IS
  * the file list, so one giant file serializes the whole map phase behind
  * a straggler while N-1 workers idle on KB-sized tasks).
  *
  * Spark's scan layer dissolves both halves of the hazard, and this spec
  * pins each:
  *
  *  - SPLIT the giant: the line scan is splittable, so
  *    `spark.sql.files.maxPartitionBytes` cuts the 600 KB file into ~10
  *    parallel tasks — no straggler.
  *  - PACK the tiny: file-partition packing (openCostInBytes) coalesces
  *    the 40 KB-sized files into a handful of tasks instead of 40
  *    scheduler round-trips (at 100 TB with millions of small objects,
  *    per-file tasks are a scheduler/listing DoS).
  *
  * The whole-file scan (F1) is unsplittable by definition — there the
  * packing half still applies, and downstream balance comes from the
  * map→shuffle explode (MapReduceJob's flatMap emits per-token rows that
  * hash-shuffle regardless of which task read the big file).
  *
  * The measured max/mean task-byte ratios printed by this spec are the
  * SCALING.md "skewed ingest" row.
  */
class SkewIngestSpec extends AnyFunSuite with SparkTestBase {

  /** One ~600 KB file + 40 ~1.5 KB files of deterministic word text. */
  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-")
    dir.toFile.deleteOnExit()
    // ~500-word ALPHABETIC vocabulary (the tokenizer splits on
    // non-letters, so digits in a word would collapse the whole corpus
    // to one key) — real reduce-side key cardinality
    def word(n: Int): String = "w" + n.toString.map(c => ('a' + (c - '0')).toChar)
    def line(seed: Int): String =
      (0 until 8).map(i => word((seed * 31 + i * 7) % 499)).mkString(" ")
    val big = new java.io.PrintWriter(s"$dir/big.txt")
    try (0 until 12000).foreach(i => big.println(line(i)))   // ~600 KB
    finally big.close()
    for (f <- 0 until 40) {
      val w = new java.io.PrintWriter(s"$dir/small_$f.txt")
      try (0 until 30).foreach(i => w.println(line(f * 1000 + i))) // ~1.5 KB
      finally w.close()
    }
    dir.toString
  }

  test("line scan splits the giant file: no single-task straggler") {
    withSQLConf(
      "spark.sql.files.maxPartitionBytes" -> (64 * 1024).toString,
      "spark.sql.files.openCostInBytes"   -> (4 * 1024).toString) {
      val df = TextSources.lines(spark, s"$skewDir/*.txt")
      val perPartition = df.rdd
        .mapPartitions(it => Iterator(it.map(_.getString(0).length + 1L).sum))
        .collect()
      val nonEmpty = perPartition.filter(_ > 0)
      // the 600 KB file must span ~10 64 KB splits: the reference would
      // run it as ONE task; here no task owns more than ~an eighth of it
      assert(nonEmpty.length >= 8,
        s"big file did not split: ${nonEmpty.length} non-empty scan tasks")
      val ratio = nonEmpty.max.toDouble / (nonEmpty.sum.toDouble / nonEmpty.length)
      assert(ratio <= 4.0,
        s"task byte skew $ratio (bytes/task: ${nonEmpty.mkString(",")})")
      info(f"line scan: ${nonEmpty.length} tasks, max/mean bytes ratio $ratio%.2f " +
        f"(reference 1-file-1-task ratio would be ~41/1.46 ≈ 28)")
    }
  }

  test("tiny files pack: far fewer tasks than files") {
    withSQLConf(
      "spark.sql.files.maxPartitionBytes" -> (128 * 1024).toString,
      "spark.sql.files.openCostInBytes"   -> (4 * 1024).toString) {
      val df = TextSources.wholeFiles(spark, s"$skewDir/small_*.txt")
      val n  = df.rdd.getNumPartitions
      // the reference schedules 40 map tasks for 40 files; packing must
      // coalesce them into a handful (≤ ceil(40·(1.5K+4K open cost)/128K)+slack)
      assert(n <= 8, s"40 tiny files scheduled as $n tasks — packing regressed")
      assert(df.count() == 40)
      info(s"whole-file scan: 40 files packed into $n tasks (reference: 40 tasks)")
    }
  }

  test("wordcount over the skewed dir balances at the shuffle regardless of scan skew") {
    // F1 whole-file scan cannot split big.txt — the map task that owns it
    // is the straggler the reference cannot avoid. The flatMap→shuffle
    // explode rebalances BEFORE the expensive per-key work: assert the
    // reduce-side keys spread across shuffle partitions (AQE coalescing
    // off — on the KB-sized fixture it would legitimately merge the tiny
    // reduce output into one partition, hiding the spread under test).
    withSQLConf("spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val docs = TextSources.wholeFiles(spark, s"$skewDir/*.txt")
      val out  = graft.mr.MapReduceJob.runSecondarySortNative(
        spark, docs, graft.mr.MRApps.WordCount)
      val reduceRows = out.rdd
        .mapPartitions(it => Iterator(it.size.toLong)).collect().filter(_ > 0)
      assert(reduceRows.length > 1,
        s"reduce side ran in ${reduceRows.length} task(s) — shuffle did not spread the keys")
      val ratio = reduceRows.max.toDouble / (reduceRows.sum.toDouble / reduceRows.length)
      assert(ratio <= 2.0, s"reduce-side key skew $ratio (${reduceRows.mkString(",")})")
      info(s"reduce side: ${reduceRows.length} tasks, keys/task ${reduceRows.mkString(",")}")
      // correctness spot check: counts must cover every file's tokens
      val total = out.agg(sum(col("value").cast("long"))).collect()(0).getLong(0)
      val expected = 12000L * 8 + 40L * 30 * 8
      assert(total == expected, s"token total $total != $expected")
    }
  }
}
