package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the driver tables as temp views (plus the graft
  * native functions) so the whole engine is usable from plain
  * `spark.sql(...)` — the catalog queries' DataFrame plans and ad-hoc SQL
  * compose over the same relations.
  */
object Catalog {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every driver table under its name for the given scale dir,
    * and the native function registry. Idempotent.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    functions.VectorFunctions.register(spark)
    plans.GroupedTopK.register(spark)
  }

  /** Convenience: SQL against the registered views. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
