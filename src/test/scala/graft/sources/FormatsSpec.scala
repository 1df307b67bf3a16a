package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestBase, Tables}

/** Source/sink format coverage beyond text: parquet, CSV, and JSON
  * round-trips preserve the catalog's data (the reference's `FsClient`
  * registry analogue is Spark's DataSource API — SURVEY.md §2.3 "File
  * formats / connectors").
  */
class FormatsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val nation = Tables.nation(spark, Sf0001)

  private def roundtrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/out"
    nation.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    val a = nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = back
      .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
      .orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b, s"$fmt round-trip changed the data")
  }

  test("parquet round-trip")(roundtrip("parquet"))
  test("csv round-trip")(roundtrip("csv"))
  test("json round-trip")(roundtrip("json"))
  test("orc round-trip")(roundtrip("orc"))
}
