package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Guards the sf1 sweep's data builder: a replica corpus with broken
  * referential integrity would silently shrink every join in the sweep
  * and make the 10× timings meaningless.
  */
class ScaleDataSpec extends AnyFunSuite with SparkTestBase {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scale2x-")
    dir.toFile.deleteOnExit()
    ScaleData.buildAll(spark, Sf0001, dir.toString, reps = 2)
    dir.toString
  }

  test("2x replica: exact row counts, fixed dims verbatim") {
    for ((t, mult) <- Seq("customer" -> 2L, "supplier" -> 2L, "part" -> 2L,
        "orders" -> 2L, "lineitem" -> 2L, "events" -> 2L, "embeddings" -> 2L,
        "region" -> 1L, "nation" -> 1L)) {
      val src = Tables(spark, Sf0001, t).count()
      val got = Tables(spark, out, t).count()
      assert(got == src * mult, s"$t: $got != $src x $mult")
    }
    // documents: reps-1 spliced replicas join source docs 1:1, so 2x
    assert(Tables.documents(spark, out).count() ==
      Tables.documents(spark, Sf0001).count() * 2)
  }

  test("2x replica: referential integrity — zero orphan foreign keys") {
    def orphans(fact: String, fk: String, dim: String, pk: String): Long =
      Tables(spark, out, fact).select(col(fk).as("k"))
        .join(Tables(spark, out, dim).select(col(pk).as("k")), Seq("k"), "left_anti")
        .count()
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") == 0)
    // events.user_id is drawn from the customer key space (the streaming
    // enrichment joins user_id = c_custkey); replicas must point at their
    // own replica's customers, not leak into another replica's key range
    assert(orphans("events", "user_id", "customer", "c_custkey") == 0)
  }

  test("2x replica: events.user_id stays within its own replica's customer range") {
    val custS = Tables.customer(spark, Sf0001)
      .agg(max(col("c_custkey"))).collect()(0).getLong(0) + 1L
    val crossReplica = Tables.events(spark, out)
      .join(Tables.events(spark, Sf0001).select(col("event_id")), Seq("event_id"), "left_anti")
      .filter(col("user_id") < custS) // a replica-1 event pointing at replica-0 customers
      .count()
    assert(crossReplica == 0, s"$crossReplica replica-1 events reference replica-0 customers")
  }

  test("2x replica: join fan-out scales exactly linearly, keys stay unique") {
    // replica-r facts must join replica-r dims ONLY: the joined row count
    // doubles exactly, and primary keys stay unique after offsetting
    def joined(dir: String): Long =
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
    assert(joined(out) == joined(Sf0001) * 2)
    for ((t, k) <- Seq("orders" -> "o_orderkey", "customer" -> "c_custkey",
        "part" -> "p_partkey", "documents" -> "doc_id", "embeddings" -> "vec_id")) {
      val tbl = Tables(spark, out, t)
      assert(tbl.select(k).distinct().count() == tbl.count(), s"$t.$k not unique")
    }
  }
}
