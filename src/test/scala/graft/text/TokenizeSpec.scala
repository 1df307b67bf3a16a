package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.mr.MRApps

/** Tokenizer parity: the Spark-side `\p{L}` split must agree with the
  * Scala-side splitter used by the MR apps, and both must match Go
  * `strings.FieldsFunc(s, !unicode.IsLetter)` semantics (SURVEY.md §7.3
  * risk 1): no empty tokens, unicode letters kept, digits/punct split.
  */
class TokenizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sparkTokens(texts: Seq[String]): Seq[Seq[String]] =
    texts
      .zipWithIndex
      .toDF("text", "i")
      .select(col("i"), filter(Tokenize.tokenCol(col("text")), _ =!= "").as("ts"))
      .as[(Int, Seq[String])]
      .collect()
      .sortBy(_._1)
      .map(_._2)
      .toSeq

  test("empty tokens dropped at boundaries and runs") {
    assert(MRApps.tokenize("  hello,,world  ") == Seq("hello", "world"))
    assert(MRApps.tokenize("") == Seq.empty)
    assert(MRApps.tokenize("123 456") == Seq.empty)
  }

  test("unicode letters are kept (Go unicode.IsLetter parity)") {
    assert(MRApps.tokenize("café naïve 中文 Größe") == Seq("café", "naïve", "中文", "Größe"))
  }

  test("spark split agrees with scala split on fixtures") {
    val samples = Seq(
      "the quick brown fox",
      "don't split-words, ever!",
      "été déjà 北京 x1y2z",
      "  leading and trailing  ",
      "")
    assert(sparkTokens(samples) == samples.map(MRApps.tokenize))
  }

  test("property: spark and scala tokenizers agree on seeded random docs") {
    val rnd   = new scala.util.Random(42)
    val chars = "abz ,.19éß中\tXY-"
    val docs = Seq.fill(200)(
      (0 until rnd.nextInt(40)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    assert(sparkTokens(docs) == docs.map(MRApps.tokenize))
  }
}
