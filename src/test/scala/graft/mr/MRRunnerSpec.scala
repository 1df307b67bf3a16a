package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.sources.TextSources

/** End-to-end CLI submission flow (`play.sh`'s golden path: run the app
  * over a file glob, read the text output back, diff against an
  * independent computation) — the catalog-external validation of the
  * whole `MRRunner` surface: registry lookup, glob input, secondary-sort
  * execution, `"key value"` text output layout.
  */
class MRRunnerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def writeFixture(): (String, String) = {
    val in  = java.nio.file.Files.createTempDirectory("mrrunner-in-")
    val out = java.nio.file.Files.createTempDirectory("mrrunner-out-").resolve("wc")
    java.nio.file.Files.writeString(in.resolve("pg-a.txt"),
      "the cat sat on the mat\nthe mat sat still\n")
    java.nio.file.Files.writeString(in.resolve("pg-b.txt"),
      "a dog, a dog! and 42 cats\n")
    java.nio.file.Files.writeString(in.resolve("notes.md"), "never read me")
    (in.toString, out.toString)
  }

  test("wc over a text glob: output layout and content match the relational twin") {
    val (in, out) = writeFixture()
    MRRunner.run(spark, "wc", s"$in/pg-*.txt", out, nreduce = 3)

    // output is the reference's canonical format: text part files of
    // "<key> <value>" lines (example/mrsequential/mrsequential.go:84)
    val partFiles = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    assert(partFiles.nonEmpty, s"no part files under $out")

    val got = TextSources.readKV(spark, out)
      .as[(String, String)].collect().map { case (k, v) => k -> v.toLong }.toMap

    // relational twin: same tokenizer, same count, straight DataFrame agg
    val docs = Seq(
      (1L, "the cat sat on the mat\nthe mat sat still\n"),
      (2L, "a dog, a dog! and 42 cats\n")).toDF("doc_id", "text")
    val want = graft.text.Tokenize.tokens(docs)
      .groupBy("token").count()
      .as[(String, Long)].collect().toMap

    assert(got == want, s"got=$got want=$want")
    // letters-only tokenization (the Go FieldsFunc parity): "42" is
    // never a token, punctuation never leaks into keys
    assert(got("the") == 3 && got("mat") == 2 && got("dog") == 2)
    assert(!got.contains("42") && !got.contains("dog,"))
    // the .md file was outside the glob — its tokens must be absent
    assert(!got.contains("never"))
  }

  test("main validates its arguments before any session work") {
    intercept[IllegalArgumentException](MRRunner.main(Array("wc", "only-two")))
    val e = intercept[IllegalArgumentException](
      MRRunner.main(Array("no-such-app", "in", "out")))
    assert(e.getMessage.contains("no-such-app") && e.getMessage.contains("wc"))
    intercept[IllegalArgumentException](
      MRRunner.run(spark, "no-such-app", "in", "out", 2))
  }
}
