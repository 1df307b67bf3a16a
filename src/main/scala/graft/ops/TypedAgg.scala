package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.Tables

/** Typed `Dataset[T]` + `Aggregator[IN, BUF, OUT]` surface — the idiomatic
  * Spark analogue of the reference's `ReduceFunc` for *algebraic*
  * aggregations (SURVEY.md §2.1 F7): unlike `flatMapGroups`, an Aggregator
  * gets partial aggregation (map-side combine) for free, which is the
  * difference between shuffling all rows and shuffling one buffer per
  * partition per key at 100 TB.
  */
object TypedAgg {

  /** One lineitem row as seen by the typed query. */
  case class Li(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  /** Exact decimal sum of a double field: BigDecimal buffer, double out.
    * Merge order never affects the result (decimal arithmetic), so the
    * answer is partition-independent — same contract as the relational
    * catalog's decimal-sum discipline.
    */
  class DecimalSum(f: Li => Double) extends Aggregator[Li, java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: Li): java.math.BigDecimal =
      // quantize to scale 6 exactly like the oracle's CAST(x AS DECIMAL(38,6))
      // — summing unrounded values would diverge for >6-decimal inputs
      b.add(java.math.BigDecimal.valueOf(f(a)).setScale(6, java.math.RoundingMode.HALF_UP))
    override def merge(x: java.math.BigDecimal, y: java.math.BigDecimal): java.math.BigDecimal =
      x.add(y)
    override def finish(b: java.math.BigDecimal): Double = b.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed twin of the q1 core: per-flag exact sums through Aggregators. */
  def typedPricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, dir)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[Li]
      .groupByKey(_.l_returnflag)
      .agg(
        new DecimalSum(_.l_quantity).toColumn.name("sum_qty"),
        new DecimalSum(_.l_extendedprice).toColumn.name("sum_price"))
      .toDF("l_returnflag", "sum_qty", "sum_price")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_agg" -> (typedPricing _)
  )

  val oracle: Map[String, String] = Map(
    "typed_agg" ->
      """SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
         FROM lineitem GROUP BY 1"""
  )
}
