package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Escaped-CSV round trip: the escape layer must carry every value class
  * CSV is traditionally bad at — embedded newlines (the
  * line-splittability hazard), the `\n`-vs-literal-backslash-n ambiguity,
  * trailing backslashes, quotes/commas, null-vs-empty — losslessly, while
  * keeping one record per physical line so byte-range splits stay valid.
  */
class CsvSourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val adversarial = Seq(
    (1L, "plain ascii", Option("en")),
    (2L, "embedded\nnewline and\r\ncrlf and bare\rcr", Option("en")),
    (3L, "quotes \" and commas , and 'single'", Option("de")),
    (4L, "literal backslash-n: \\n is NOT a newline", Option("en")),
    (5L, "backslash \\ and double \\\\ and trailing \\", Option("en")),
    (6L, "\\N looks like the null sentinel", Option("en")),
    (7L, "unicode: café 中文 😀 عربى", Option("zh")),
    (8L, "", Option("en")), // empty string must NOT come back as null
    (9L, "null lang on this row", None),
    (10L, "\n", Option("en")), // newline-only value
    (11L, "\\", Option("en")), // single-backslash value
    // backslash × quote-layer interplay: escapeCol inserts backslashes
    // and Spark CSV's own default escape char is ALSO backslash — these
    // rows pin the quoted-field escape symmetry end-to-end
    (12L, "a\\\"b", Option("en")),   // backslash immediately before a quote
    (13L, "a\\,b", Option("en")),    // backslash immediately before a comma
    (14L, "\\\"", Option("en")),     // the two-char value backslash+quote
    (15L, "\\\"\\n\"\\", Option("en")), // quote/backslash/escape-pair soup
    (16L, "\",\\\",\"", Option("en"))) // quoted-comma sandwich

  test("escaped csv round-trip is lossless on adversarial strings") {
    val df  = adversarial.toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-spec-").toString
    CsvSources.writeCsv(df, dir)
    val back = CsvSources.readCsv(spark, dir, df.schema)
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(back == adversarial.sortBy(_._1))
  }

  test("escape/unescape columns invert each other on arbitrary strings") {
    // pure column-level inversion, independent of the CSV layer — catches
    // a broken escape even where CSV quoting would have masked it
    val vals = adversarial.map(_._2) ++ Seq("\\\\n", "\\\r", "a\\nb\nc\\")
    val df   = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = df
      .select(col("id"), CsvSources.unescapeCol(CsvSources.escapeCol(col("v"))).as("v"))
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == vals, got.zip(vals).filter(p => p._1 != p._2).toString)
  }

  test("csv files are one-record-per-line (byte-range splits stay valid)") {
    val df  = Seq((1L, "two\nlines"), (2L, "one line")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-spec-").toString
    CsvSources.writeCsv(df, dir, codec = "none")
    CsvSources.writeCsv(df, dir, codec = "none") // overwrite, not append
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    // 2 data rows + one header per non-empty file, despite the embedded \n
    val headers = lines.count(_ == "doc_id,text")
    assert(headers == files.count(f => f.length() > 0) && headers >= 1, lines.mkString("|"))
    assert(lines.count(l => l.nonEmpty && l != "doc_id,text") == 2, lines.mkString("|"))
  }

  test("timestamp columns round-trip at full microsecond precision") {
    // Spark's default CSV timestampFormat is millisecond — without the
    // sink's explicit microsecond format this would silently truncate
    val ts = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456")),
      (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.000001")),
      (3L, java.sql.Timestamp.valueOf("2026-03-01 00:00:00")))
    val df  = ts.toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-ts-").toString
    CsvSources.writeCsv(df, dir)
    val back = CsvSources.readCsv(spark, dir, df.schema)
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._1).toSeq
    assert(back == ts)
  }

  test("corpus_csv summary on real documents matches the direct-parquet summary") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val got  = graft.ops.Storage.csvRoundtrip(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    val want = graft.ops.Storage.corpusSummary(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
