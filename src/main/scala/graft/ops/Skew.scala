package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation operators. The reference's constant-key pattern
  * (`example/mrapps/jobcount/jobcount.go:25-35`) funnels every record to
  * one reducer; Catalyst's partial aggregation already absorbs that for
  * algebraic aggs, but when the per-key state itself is heavy (e.g.
  * collect-style aggs) the standard fix is salting: spread each hot key
  * over `salt` sub-keys, aggregate, then merge the partials.
  *
  * `saltedTotals` demonstrates the two-phase shape with a deterministic
  * salt (hash of a unique column — never `rand()`, which would break
  * retry-determinism and the oracle), producing results identical to the
  * direct agg. AQE's skew-join splitting covers the join-side analogue
  * (`spark.sql.adaptive.skewJoin`, enabled in Bench/Verify sessions).
  */
object Skew {

  val SaltBuckets = 16

  /** Deterministic salt from a unique id column. */
  def saltCol(unique: Column): Column = pmod(hash(unique), lit(SaltBuckets))

  /** Two-phase salted aggregation over the deliberately-skewed
    * constant-key events pattern; exact decimal arithmetic makes phase
    * order invisible in the result (bit-identical to `skew_agg`).
    */
  def saltedTotals(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .withColumn("salt", saltCol(col("event_id")))
      .groupBy("salt")
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(38,6)")).as("pv"))
      .groupBy(lit("all").as("k"))
      .agg(
        sum("pn").as("n"),
        sum("pv").cast("double").as("total"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted" -> (saltedTotals _)
  )

  /** Same oracle as `skew_agg` — salting must be invisible in results. */
  val oracle: Map[String, String] = Map(
    "skew_salted" ->
      "SELECT 'all' AS k, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total FROM events GROUP BY 1"
  )
}
