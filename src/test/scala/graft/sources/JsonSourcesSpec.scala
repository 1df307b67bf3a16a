package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** JSONL round-trip: every value class that JSON escaping must carry —
  * embedded newlines (the line-splittability hazard), quotes/backslashes,
  * non-BMP unicode, control chars, empty strings vs nulls — survives
  * write+read bit-for-bit under an explicit schema.
  */
class JsonSourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("jsonl round-trip is lossless on adversarial strings") {
    val rows = Seq(
      (1L, "plain ascii", Option("en")),
      (2L, "embedded\nnewline and\r\ncrlf", Option("en")),
      (3L, "quotes \" and backslash \\ and tab\t", Option("de")),
      (4L, "unicode: café 中文 😀 عربى", Option("zh")),
      (5L, "control chars \u0001\u0002\u001f", Option("en")),
      (6L, "", Option("en")),
      (7L, "null lang below", None),
      (8L, "{\"looks\":\"like json\"}", Option("en")))
    val df  = rows.toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec-").toString
    JsonSources.writeJsonl(df, dir)
    val back = JsonSources.readJsonl(spark, dir, df.schema)
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(back == rows.sortBy(_._1))
  }

  test("streaming jsonl ingestion converges to the batch summary") {
    // the production landing-directory path: documents written as a
    // multi-file JSONL drop, picked up one file per micro-batch, folded
    // into the same integrity summary the batch round-trip computes
    val docs = graft.Tables.documents(spark, Sf0001)
    val dir  = java.nio.file.Files.createTempDirectory("graft-jsonl-stream-").toString
    JsonSources.writeJsonl(docs.repartition(4), dir)
    val src = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1") // force several micro-batches
      .json(dir)
    val q = graft.streaming.CorpusStream.ingestProfile(src)
      .writeStream.format("memory").queryName("ingest_profile")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val got  = spark.table("ingest_profile").collect().map(r => key(r) -> r.toSeq.drop(2)).toMap
    val want = graft.ops.Storage.corpusSummary(docs).collect().map(r => key(r) -> r.toSeq.drop(2)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("jsonl files are one-object-per-line and the write is re-runnable") {
    val df  = Seq((1L, "two\nlines"), (2L, "one line")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec-").toString
    // uncompressed so the spec can read the physical lines directly
    JsonSources.writeJsonl(df, dir, codec = "none")
    JsonSources.writeJsonl(df, dir, codec = "none") // overwrite, not append
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    // 2 rows -> exactly 2 physical lines even though one text has a \n
    assert(lines.count(_.nonEmpty) == 2, lines.mkString("|"))
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }
}
