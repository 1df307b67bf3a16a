package graft

import org.scalatest.funsuite.AnyFunSuite

/** The [[Ckpt]] materialization seam: reliable-checkpoint mode must be a
  * pure storage-substrate swap — identical results, same LogicalRDD scan
  * surface — so the iterative ops (connected components, pagerank, BPE)
  * can run executor-loss-safe on a cluster by flipping one conf.
  */
class CkptSpec extends AnyFunSuite with SparkTestBase {

  private def withReliable[A](f: => A): A = {
    spark.conf.set(Ckpt.ReliableKey, "true")
    try f
    finally spark.conf.unset(Ckpt.ReliableKey)
  }

  test("reliable mode: same rows as local mode for an iterative op") {
    val local = ops.Dedup.clusters(spark, Sf0001).collect().toSet
    val rel   = withReliable(ops.Dedup.clusters(spark, Sf0001).collect().toSet)
    assert(rel == local)
    assert(spark.sparkContext.getCheckpointDir.isDefined,
      "reliable mode must provision a checkpoint dir")
  }

  test("reliable mode: checkpoint surfaces as the same scan shape") {
    import org.apache.spark.sql.functions._
    val df = spark.range(100).toDF("id").withColumn("v", col("id") * 2)
    val l  = Ckpt(df)
    val r  = withReliable(Ckpt(df))
    assert(r.collect().toSeq == l.collect().toSeq)
    // both modes truncate lineage to an RDD scan leaf: downstream plan
    // shapes (audited in PlanAuditSpec) cannot differ between modes
    def leaf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.optimizedPlan.collectLeaves().map(_.nodeName).toList
    assert(leaf(l) == leaf(r), s"${leaf(l)} vs ${leaf(r)}")
  }

  test("reliable checkpoint files actually exist under the checkpoint dir") {
    withReliable {
      Ckpt(spark.range(10).toDF("id")).count()
      val dir = new java.io.File(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
      def files(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(files)
      assert(files(dir).exists(_.getName.startsWith("part-")),
        s"no checkpoint part files under $dir")
    }
  }
}
