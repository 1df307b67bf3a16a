package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Differential tests for the generic MR engine: both execution paths vs.
  * a sequential oracle — the reference's own verification trick
  * (`example/mrsequential/mrsequential.go:62-87`, the global sort +
  * adjacent-group loop, ported below).
  */
class MapReduceJobSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Port of the mrsequential loop: map all, global sort, group adjacent
    * equal keys, reduce each group. Defines canonical output.
    */
  private def sequentialOracle(app: MRApp, docs: Seq[(String, String)]): Seq[KV] = {
    val inter = docs
      .flatMap { case (f, c) => app.map(f, c) }
      .sortBy(kv => (kv.key, kv.value))
    val out = Seq.newBuilder[KV]
    var i = 0
    while (i < inter.size) {
      var j = i
      while (j < inter.size && inter(j).key == inter(i).key) j += 1
      val vs = inter.slice(i, j).map(_.value)
      app.reduce(inter(i).key, vs).foreach(v => out += KV(inter(i).key, v))
      i = j
    }
    out.result()
  }

  private val docs = Seq(
    "doc-a" -> "the cat sat on the mat",
    "doc-b" -> "the dog, the dog! barked 42 times",
    "doc-c" -> "cat dog cat — encore",
    "doc-d" -> "")

  private def runAll(app: MRApp): (Seq[KV], Seq[KV], Seq[KV]) = {
    val df = docs.toDF("filename", "contents")
    def norm(out: org.apache.spark.sql.DataFrame): Seq[KV] = out
      .as[(String, String)].collect().map(t => KV(t._1, t._2)).sortBy(k => (k.key, k.value)).toSeq
    (norm(MapReduceJob.run(spark, df, app)),
      norm(MapReduceJob.runSecondarySort(spark, df, app, numPartitions = 3)),
      norm(MapReduceJob.runSecondarySortNative(spark, df, app)))
  }

  for (app <- MRApps.all.values) {
    test(s"${app.name}: all three paths match the sequential oracle") {
      val expected  = sequentialOracle(app, docs).sortBy(k => (k.key, k.value))
      val (a, b, c) = runAll(app)
      assert(a == expected, s"flatMapGroups path diverged for ${app.name}")
      assert(b == expected, s"secondary-sort path diverged for ${app.name}")
      assert(c == expected, s"native secondary-sort path diverged for ${app.name}")
    }
  }

  test("native secondary-sort plans the shuffle+sort inside the SQL engine") {
    // the point of SortedGroupReduceExec: EnsureRequirements must insert a
    // hash Exchange on key and a Tungsten SortExec on (key, value) UNDER
    // the custom exec — and no RDD-boundary scan in between
    val df = docs.toDF("filename", "contents")
    val qe = MapReduceJob
      .runSecondarySortNative(spark, df, MRApps.Indexer).queryExecution
    // string-level audit: AQE's initialPlan (where EnsureRequirements has
    // run) is what toString renders, but isn't reachable via collect()
    // through the AdaptiveSparkPlanExec wrapper
    val plan = qe.executedPlan.toString
    assert(plan.contains("SortedGroupReduce"), plan)
    assert("Sort \\[key#\\d+ ASC NULLS FIRST, value#\\d+ ASC NULLS FIRST"
      .r.findFirstIn(plan).nonEmpty, s"no (key, value) SortExec:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(key"),
      s"no SQL Exchange on key:\n$plan")
    // and the reduce must sit DIRECTLY on the sort — no RDD boundary
    assert("SortedGroupReduce [^\\n]*\\n\\s*\\+- Sort "
      .r.findFirstIn(plan).nonEmpty, plan)
    // regression: a column-less consumer must not let ColumnPruning
    // empty the child under the reduce (the node's references declare
    // both columns consumed through the app closure) — count() planned
    // an empty Project below the exec and keyAttr had nothing to bind to
    assert(MapReduceJob.runSecondarySortNative(spark, df, MRApps.Indexer)
      .count() > 0)
  }

  test("wc over reference Gutenberg input matches oracle") {
    val dir = new java.io.File("/root/reference/example/input")
    assume(dir.isDirectory, "reference inputs not present")
    val files = dir.listFiles().filter(_.getName.endsWith(".txt")).sortBy(_.getName).take(3)
    val gdocs = files.toSeq.map(f =>
      f.getName -> new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val df  = gdocs.toDF("filename", "contents")
    val got = MapReduceJob.run(spark, df, MRApps.WordCount)
      .as[(String, String)].collect().sortBy(identity).toSeq
    val expected = sequentialOracle(MRApps.WordCount, gdocs)
      .map(kv => (kv.key, kv.value)).sortBy(identity)
    assert(got == expected)
  }

  test("property: wc counts sum to token count (seeded random corpora)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    for (_ <- 1 to 5) {
      val d = (1 to 4).map(i =>
        s"f$i" -> Seq.fill(rnd.nextInt(50))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val total = d.map(x => MRApps.tokenize(x._2).size).sum
      val counted = MapReduceJob.run(spark, d.toDF("filename", "contents"), MRApps.WordCount)
        .as[(String, String)].collect().map(_._2.toLong).sum
      assert(counted == total)
    }
  }
}
