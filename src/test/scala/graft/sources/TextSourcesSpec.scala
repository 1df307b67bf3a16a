package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.mr.{MapReduceJob, MRApps}

/** End-to-end through the reference's I/O surface: whole-file scan →
  * MR wc → KV text sink → read back — the `play.sh` golden-compare shape
  * (`sort mr-out* | cmp` vs the sequential oracle).
  */
class TextSourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("whole-file scan preserves file granularity and content") {
    val dir = Files.createTempDirectory("graft-src").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "hello world\nsecond line")
    Files.writeString(java.nio.file.Paths.get(dir, "b.txt"), "solo")
    val rows = TextSources.wholeFiles(spark, s"$dir/*.txt")
      .as[(String, String)].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows(0)._1.endsWith("a.txt") && rows(0)._2 == "hello world\nsecond line")
    assert(rows(1)._1.endsWith("b.txt") && rows(1)._2 == "solo")
  }

  test("whole-file scan decodes URI escapes and relativizes cwd paths") {
    val dir = Files.createTempDirectory("graft-enc").toString
    Files.writeString(java.nio.file.Paths.get(dir, "with space.txt"), "x")
    val name = TextSources.wholeFiles(spark, s"$dir/*.txt")
      .as[(String, String)].collect().head._1
    // the raw input_file_name() would be file:/...with%20space.txt — the
    // reference keys on the plain path (document ids in the indexer)
    assert(name == s"$dir/with space.txt", name)
  }

  test("KV sink maps a null value to the empty string (reference's no-null model)") {
    val sink = Files.createTempDirectory("graft-nullkv").toString + "/kv"
    TextSources.writeKV(
      Seq(("k1", Option("v1")), ("k2", None)).toDF("key", "value"), sink)
    val back = TextSources.readKV(spark, sink)
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq("k1" -> "v1", "k2" -> ""), back.toString)
  }

  test("line scan strips trailing newline, one row per line") {
    val dir = Files.createTempDirectory("graft-lines").toString
    Files.writeString(java.nio.file.Paths.get(dir, "x.txt"), "l1\nl2\n\nl4\n")
    val lines = TextSources.lines(spark, dir).as[String].collect().sorted.toSeq
    assert(lines == Seq("", "l1", "l2", "l4"))
  }

  test("wc over whole-file scan, through the KV sink, matches the golden format") {
    val ref = new java.io.File("/root/reference/example/input")
    assume(ref.isDirectory)
    val glob = ref.getAbsolutePath + "/pg-being_ernest.txt"
    val docs = TextSources.wholeFiles(spark, glob)
    val out  = MapReduceJob.run(spark, docs, MRApps.WordCount)
    val sink = Files.createTempDirectory("graft-out").toString + "/wc"
    TextSources.writeKV(out, sink)

    val back = TextSources.readKV(spark, sink)
      .as[(String, String)].collect().sortBy(identity).toSeq
    val direct = out.as[(String, String)].collect().sortBy(identity).toSeq
    assert(back == direct, "sink round-trip changed the data")
    assert(back.nonEmpty && back.forall { case (k, v) => k.nonEmpty && v.forall(_.isDigit) })
  }
}
