package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The cross-engine hash/shingle primitives: range, JVM/Spark agreement,
  * and the sliding-window property of shingles.
  */
class TextHashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("hash60 spark-side equals the JVM replica") {
    val inputs = Seq("", "a", "hello world", "é中ß", "0:some shingle")
    val sparkSide = inputs.toDF("s")
      .select(TextHash.hash60(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(sparkSide == inputs.map(TextHash.hash60Jvm))
    assert(sparkSide.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("property: shingles equal the sliding window on seeded random arrays") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "bb", "ccc", "dd")
    for (_ <- 1 to 50; n <- 2 to 4) {
      val toks = Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val got = Seq(toks).toDF("toks")
        .select(TextHash.shingles(col("toks"), n).as("sh"))
        .as[Seq[String]].head()
      val want = if (toks.size < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
      assert(got == want, s"n=$n toks=$toks")
    }
  }

  test("salt column spreads rows across all buckets") {
    val salts = graft.Tables.events(spark, Sf0001)
      .select(graft.ops.Skew.saltCol(col("event_id")).as("s"))
      .distinct().as[Int].collect().toSet
    assert(salts == (0 until graft.ops.Skew.SaltBuckets).toSet,
      s"salt buckets not fully used: $salts")
  }
}
