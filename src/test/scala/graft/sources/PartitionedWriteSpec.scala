package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestBase, Tables}

/** Partitioned layout + partition pruning: the mechanism that turns a
  * 100 TB corpus scan into a read of one directory. A lang-partitioned
  * write must (a) round-trip the data and (b) prune non-matching
  * partitions at the scan (PartitionFilters, not a post-filter).
  */
class PartitionedWriteSpec extends AnyFunSuite with SparkTestBase {

  test("partitionBy write prunes at the scan on read") {
    val dir  = Files.createTempDirectory("graft-part").toString + "/docs"
    val docs = Tables.documents(spark, Sf0001)
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val back  = spark.read.parquet(dir)
    val one   = back.filter(col("lang") === "de")
    val plan  = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)

    val wantN = docs.filter(col("lang") === "de").count()
    assert(one.count() == wantN && wantN > 0)

    // full round-trip: every row survives the partitioned layout
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = back.select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
