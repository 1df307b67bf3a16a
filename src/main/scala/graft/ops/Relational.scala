package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator grid (SURVEY.md §2.3): the categories the reference
  * lacks entirely — joins of every flavor, window functions, cube/rollup,
  * set ops, top-k, scalar function families — declared as first-class
  * catalog queries over the TPC-H-ish tables.
  *
  * Scale discipline (the 100 TB design goal):
  *  - dimension joins (`region`, `nation`) get explicit `broadcast()` hints;
  *    fact-fact joins shuffle on their keys and rely on AQE for runtime
  *    re-planning and skew splitting.
  *  - filters are applied before joins so Catalyst pushes them into the
  *    parquet scan (`PushedFilters` in explain).
  *  - double sums go through `decimal(38,6)`: exact, order-independent
  *    arithmetic — the result doesn't depend on partitioning, which is what
  *    makes the answer stable from local[32] to a 1000-executor cluster
  *    (and what makes the DuckDB hash-compare well-defined).
  *  - window frames are totally ordered (unique tiebreak columns) so
  *    running aggregates are deterministic under any partitioning.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a double column, converted to
    * double through an explicit BIGINT image. The decimal(38,6) sum is
    * exact on the 1e-6 grid, but a direct decimal→double cast diverges
    * between engines by 1 ULP once the scaled image passes 2^53 (first
    * seen at sf1: q1_pricing's sum_charge ≈ 5.1e10 → image 2^55.5 —
    * DuckDB converts scaled-int-then-divide, the JVM rounds the exact
    * value). Both engines now round the SAME bigint image and perform
    * the SAME final power-of-ten divide, so the result is bit-identical
    * at every scale. Envelope: |sum| < 2^63/1e6 ≈ 9.2e12 — ~180× the
    * sf1 mass; past that, shrink the grid a decade per decade of scale.
    * The envelope is ENFORCED, not advisory: a non-ANSI decimal→long
    * cast past 2^63 wraps silently, so [[guardLongImage]] raises inside
    * the value path instead (the LSH dimension-drift discipline).
    */
  private def dsum(c: Column): Column =
    guardLongImage(
      (sum(c.cast("decimal(38,6)")) * lit(1000000)).cast("decimal(38,0)"),
      "dsum(1e-6 grid)")
      .cast("double") / lit(1e6)

  /** Loud envelope guard shared by every explicit-BIGINT-image
    * conversion (dsum here, qsum in [[Stats]]): returns `img` as a long
    * when it fits int64, raises otherwise. Lives inside the value path
    * so column pruning cannot eliminate it, and runs on post-aggregation
    * rows only (one comparison per output group — off the hot path).
    */
  private[ops] def guardLongImage(img: Column, what: String): Column =
    // NULL passes through (an aggregated-over-nothing group, e.g. the
    // unmatched side of an outer join, is a legitimate NULL sum — caught
    // at sf1 by join_outer, invisible at sf0.01); only a NON-null image
    // outside int64 raises.
    when(img.isNull, lit(null).cast("long"))
      .when(abs(img) <= lit(Long.MaxValue), img.cast("long"))
      .otherwise(raise_error(format_string(
        s"$what: bigint image %s exceeds the 2^63 exactness envelope — " +
          "shrink the quantization grid one decade per decade of scale",
        img.cast("string"))))
  private val DSUM =
    "(CAST(CAST(sum(CAST(%s AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0)"

  // ---------------------------------------------------------------- aggs

  /** TPC-H Q1-style pricing summary: wide scan, partial+final hash agg. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6 shape (revenue-change forecast): a scan-bound
    * filter-everything-then-sum — every predicate must reach the parquet
    * reader, the aggregation is a single scalar. Dates shifted to the
    * synthetic fixture's 1995-2001 range.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** The two nations q7_volume trades between. */
  val Q7NationA = "NATION_1"
  val Q7NationB = "NATION_2"

  /** TPC-H Q7 shape (volume shipping): the deepest join tree in the
    * catalog — lineitem x orders x customer x supplier x nation x nation.
    * The nation sides are pre-filtered to the two trading partners and
    * broadcast; the fact-side joins are left to Catalyst/AQE (customer
    * and supplier broadcast automatically at fixture scale; at 100 TB
    * AQE picks shuffled hash joins keyed on the order/supplier keys).
    */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq(Q7NationA, Q7NationB)
    val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(
        col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
  }

  /** TPC-H Q10 shape (returned-item reporting): who returned the most
    * revenue last quarter. Fact-fact join shuffles on the order key; the
    * nation dimension broadcasts; top-20 is a TakeOrderedAndProject (no
    * global sort materializes). The quarter filter reaches the orders scan.
    */
  def q10Returned(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.customer(s, dir)
      .join(ord, col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13 shape (customer order distribution): a left outer join
    * folded through TWO aggregations — orders-per-customer, then
    * customers-per-order-count. The second agg's input is one row per
    * customer, so it is tiny no matter how large orders is; the only real
    * shuffle is the first one, keyed on the customer key.
    */
  def q13OrderDist(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q14 shape (promotion effect): conditional aggregation over a
    * part-dimension join — the CASE routes each row's revenue into the
    * promo bucket or not, and the answer is one global ratio. Both sums
    * go through decimal, so the final double division is deterministic.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
        dsum(rev)).as("promo_revenue"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    * OR-of-ANDs condition spanning both join sides. Catalyst cannot
    * derive per-side filters from a cross-side disjunction on its own, so
    * the implied envelopes are stated explicitly — the brand/size union
    * reaches the part scan and the quantity envelope reaches the lineitem
    * scan (pinned in PlanAuditSpec), which is what keeps the pre-join
    * input narrow at scale; the exact disjunction then filters the joined
    * rows.
    */
  def q19Disjunct(s: SparkSession, dir: String): DataFrame = {
    val band1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 15)
    val band2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 25)
    val band3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 35)
    val partSide = Tables.part(s, dir).filter(
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
    Tables.lineitem(s, dir)
      .filter(col("l_quantity").between(1, 35))
      .join(broadcast(partSide), col("l_partkey") === col("p_partkey"))
      .filter(band1 || band2 || band3)
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4-style correlated EXISTS: orders of one quarter with at
    * least one line shipped more than 60 days after the order date.
    * Written as genuine correlated-EXISTS SQL over the registered views —
    * Catalyst decorrelates it to a left-semi hash join on the order key
    * (pinned in PlanAuditSpec: LeftSemi, never a nested loop), so the
    * EXISTS probe is one shuffle-bounded pass at any scale.
    */
  def q4LateOrders(s: SparkSession, dir: String): DataFrame =
    graft.Catalog.sql(s, dir,
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""")

  /** TPC-H Q17-style correlated scalar aggregate: revenue lost to
    * small-quantity lines of one brand, where "small" is 20% of that
    * part's own average quantity. Catalyst decorrelates the per-part
    * average into a grouped aggregate joined back on l_partkey (pinned:
    * no nested loop). The correlated average runs through the decimal-sum
    * discipline so group membership is partition-order independent.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame =
    graft.Catalog.sql(s, dir,
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#23'
           AND l_quantity < (
             SELECT CAST(0.2 AS DOUBLE) *
               (CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*))
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""")

  /** TPC-H Q8-style market share: one nation's share of supplier revenue
    * among one region's customers, per year. Two independent dimension
    * paths hang off the fact spine — customer→nation→region filters the
    * rows, supplier→nation labels them — and the share is a conditional
    * aggregate, so the whole two-branch snowflake is one pass over
    * lineitem with broadcast dimensions.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val r = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("c_rk") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_5", vol).otherwise(lit(0.0))) / dsum(vol))
        .as("mkt_share"))
  }

  /** TPC-H Q9-style product profit (adapted: the reference schema has no
    * partsupp, so supply cost is `p_retailprice · quantity`): profit per
    * supplier nation per year over a part-name filter. The name filter
    * prunes part before its broadcast; profit math runs through the
    * decimal sum.
    */
  def q9Profit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("%red%"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")).as("sum_profit"))

  /** TPC-H Q12-style (adapted: no l_shipmode — the two-bucket CASE
    * aggregation runs on order priority instead): per return flag, how
    * many of one year's lines belong to urgent/high-priority orders.
    */
  def q12Priority(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(hi, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(hi, 0).otherwise(1)).cast("long").as("low_line_count"))
  }

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    * max. The max is a 1-row aggregate of the tiny per-supplier revenue
    * table, joined back as an equi-join on the exact decimal-derived
    * revenue — no second scan of lineitem, no window.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    Tables.supplier(s, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx), col("total_rev") === col("max_rev"))
      .select("s_suppkey", "s_name", "total_rev")
  }

  /** TPC-H Q16-style supplier diversity (adapted: supplier↔part pairs come
    * from lineitem instead of partsupp): distinct suppliers per surviving
    * (brand, size) after a NOT-IN supplier blacklist — a null-safe anti
    * join, then a two-phase distinct aggregate.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 9, 17, 25, 33, 41, 49).map(lit(_))
    val bad = Tables.supplier(s, dir)
      .filter(col("s_name").like("%77%"))
      .select(col("s_suppkey").as("bad_sk"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#4" && col("p_size").isin(sizes: _*))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("bad_sk"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q21-style waiting orders (adapted: lateness = shipped >90 days
    * after the order date): suppliers of one nation who were the ONLY
    * late supplier on a finished multi-supplier order. Correlated EXISTS
    * + NOT EXISTS over the same fact table — Catalyst decorrelates both
    * into semi/anti hash joins on the order key.
    */
  def q21Waiting(s: SparkSession, dir: String): DataFrame =
    graft.Catalog.sql(s, dir,
      """SELECT s_name, count(*) AS numwait
         FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
           AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 100""")

  /** TPC-H Q22-style dormant high-balance customers (adapted: "no orders
    * at all" never happens in the fixtures, so dormancy = no orders in
    * the trailing years): nation-grouped count and balance of
    * above-average-balance customers with no recent orders. Scalar
    * subquery + correlated NOT EXISTS → broadcast + anti join.
    */
  def q22Dormant(s: SparkSession, dir: String): DataFrame =
    graft.Catalog.sql(s, dir,
      """SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
         FROM customer
         WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
           AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                                   / count(*)
                            FROM customer
                            WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '1999-01-01')
         GROUP BY c_nationkey""")

  /** TPC-H Q2-style minimum-cost supplier (adapted: no partsupp, so the
    * correlated minimum runs on supplier account balance over the
    * suppliers that actually shipped the part, and region scoping rides
    * the nation dimension): for each size-15 part, its cheapest European
    * supplier. The correlated scalar min decorrelates into a grouped
    * aggregate joined back on the part key.
    */
  def q2MinCost(s: SparkSession, dir: String): DataFrame =
    graft.Catalog.sql(s, dir,
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
         FROM part, lineitem, supplier, nation, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'EUROPE' AND p_size = 15
           AND s_acctbal = (SELECT min(s2.s_acctbal)
                            FROM lineitem l2, supplier s2, nation n2, region r2
                            WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
                              AND s2.s_nationkey = n2.n_nationkey
                              AND n2.n_regionkey = r2.r_regionkey
                              AND r2.r_name = 'EUROPE')
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""")

  /** TPC-H Q20-style promotion candidates (adapted: the absent
    * partsupp.availqty correlation becomes a recent-concentration test —
    * suppliers whose 1997 shipments of one part family exceed a fraction
    * of their own all-time shipments of it). Three subquery layers:
    * IN-subquery (semi join) over a grouped HAVING whose threshold is a
    * correlated scalar aggregate — all decorrelated by Catalyst into
    * hash joins (pinned).
    */
  def q20Promotion(s: SparkSession, dir: String): DataFrame =
    graft.Catalog.sql(s, dir,
      """SELECT s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE s_suppkey IN (
           SELECT l.l_suppkey
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_name LIKE 'blue%'
             AND l.l_shipdate >= TIMESTAMP '1997-01-01'
             AND l.l_shipdate <  TIMESTAMP '1998-01-01'
           GROUP BY l.l_suppkey
           HAVING CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) >
             0.22 * (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                     FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
                     WHERE p2.p_name LIKE 'blue%' AND l2.l_suppkey = l.l_suppkey))""")

  /** TPC-H Q11-style important suppliers (adapted: revenue share instead
    * of partsupp stock value): suppliers whose revenue exceeds a fixed
    * fraction of the corpus total — the HAVING-over-global-scalar shape.
    * Both aggregates share one lineitem pass each; the threshold is a
    * 1-row broadcast and membership is decided on exact decimal sums.
    */
  def q11Important(s: SparkSession, dir: String): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val rev = Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(dsum(vol).as("supp_rev"))
    val thr = Tables.lineitem(s, dir).agg((dsum(vol) * lit(0.001)).as("threshold"))
    rev
      .crossJoin(broadcast(thr))
      .filter(col("supp_rev") > col("threshold"))
      .select("l_suppkey", "supp_rev")
  }

  /** Minimum summed quantity for an order to count as "large" in q18. */
  val Q18MinQty = 300.0

  /** TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    * aggregation used as a semi-join filter, then re-aggregation of the
    * surviving orders. The `big` set is a tiny fraction of orders (top ~1%
    * by quantity), so the semi-join broadcasts it; the HAVING compare runs
    * on the exact decimal sum, so membership is partition-order
    * independent — the property that keeps the row set stable at scale.
    */
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("big_qty"))
      .filter(col("big_qty") > Q18MinQty)
      .select(col("l_orderkey").as("big_orderkey"))
    Tables.orders(s, dir)
      .join(broadcast(big), col("o_orderkey") === col("big_orderkey"), "left_semi")
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  /** Sketch summaries: HyperLogLog++ distinct counts and KLL-style
    * approximate percentiles — the sub-linear-memory answers a 100 TB
    * exploratory scan actually uses (an exact count_distinct shuffles
    * every distinct key; the HLL sketch is a few KB per partition and
    * merges order-independently). Deliberately NOT a catalog entry: the
    * two engines' sketch internals differ by design, so there is no DuckDB
    * oracle — `ApproxStatsSpec` bounds its error against the exact twin
    * (`Stats.percentilesExact`, which IS oracle-checked) and asserts
    * partitioning-independence instead.
    */
  def approxStats(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_price"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_price"))

  /** min/max/count per group — order-independent extremes. */
  def aggMinMax(s: SparkSession, dir: String): DataFrame =
    Tables
      .supplier(s, dir)
      .groupBy("s_nationkey")
      .agg(
        min(col("s_acctbal")).as("min_bal"),
        max(col("s_acctbal")).as("max_bal"),
        count(lit(1)).as("n_suppliers"))

  /** Exact count-distinct per group (expands to a two-phase agg). */
  def distinctOrdersPerFlag(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count_distinct(col("l_orderkey")).as("n_orders"),
        count_distinct(col("l_suppkey")).as("n_supps"))

  // --------------------------------------------------------------- joins

  /** TPC-H Q3-style: two shuffle joins + agg + global top-k by revenue.
    * Ties broken by orderkey so the row set is deterministic.
    */
  def q3TopkRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: five-way join; region/nation broadcast, facts shuffle. */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val li     = Tables.lineitem(s, dir)
    val ord = Tables
      .orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    // the fact-fact joins are hinted shuffle_hash: all three tables grow
    // with the data, so no side is broadcastable at scale — and without
    // the hint the static planner broadcast the column-pruned LINEITEM
    // whenever the testdata's size estimate dipped under the 10 MB
    // threshold (the r3→r4 bench swing: building a fact-table hashed
    // relation serially on the driver). Dimensions (nation/region) stay
    // explicit broadcasts.
    Tables
      .customer(s, dir)
      .join(ord.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"))
      .join(li.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Broadcast-hash join against the `part` dimension. */
  def joinBroadcastParts(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))

  /** Left-semi join: customers that have at least one order (EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))

  /** Left-anti join: customers with no 1996 orders (NOT EXISTS). The
    * year filter makes the result non-degenerate — every fixture customer
    * has at least one order overall.
    */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    val ord96 = Tables
      .orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables
      .customer(s, dir)
      .join(ord96, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Left-outer join preserving customers with zero orders. */
  def joinOuter(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))

  /** Equi + band (range) join: lineitems whose quantity falls in a window
    * around the part's size. The equi key carries the shuffle; the range
    * predicate is evaluated post-match — at scale this is the standard
    * shape (never a pure cross-range join when an equi key exists).
    */
  def joinRange(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .join(
        broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey") &&
          col("l_quantity") >= col("p_size") - lit(5.0) &&
          col("l_quantity") <= col("p_size") + lit(5.0))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_in_band"))

  // ------------------------------------------------------------- windows

  /** Ranking window: top-3 orders per customer by totalprice. */
  def windowTopkOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables
      .orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  /** Same query through the custom whole-operator plan
    * ([[graft.plans.GroupedTopK]]): shuffle on the key but NO sort — a
    * bounded per-key heap ranks inside the operator. Shares window_topk's
    * oracle; the two must agree bit-for-bit.
    */
  def windowTopkFast(s: SparkSession, dir: String): DataFrame =
    graft.plans.GroupedTopK
      .topK(
        Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
        keys = Seq("o_custkey"),
        order = Seq("o_totalprice" -> false, "o_orderkey" -> true),
        k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")

  /** Running (cumulative) sum per supplier over a total order — decimal
    * accumulation so the running values are exact and order-stable.
    */
  def windowRunningQty(s: SparkSession, dir: String): DataFrame = {
    // l_partkey disambiguates duplicate (orderkey, linenumber) pairs in
    // the synthetic data — without it the order is not total and the
    // running sum is nondeterministic on the tied rows
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .lineitem(s, dir)
      .withColumn("running_qty", sum(col("l_quantity").cast("decimal(38,6)")).over(w).cast("double"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
  }

  /** RANGE-frame window (vs the ROWS frames above): peers are defined by
    * value distance, not row position.
    */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_orderpriority")
      .orderBy("o_totalprice")
      .rangeBetween(-10000L, 0L)
    Tables
      .orders(s, dir)
      .withColumn("n_within_10k",
        count(lit(1)).over(w).cast("long"))
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "n_within_10k")
  }

  /** Ranking-function family: rank/dense_rank/percent_rank/cume_dist over
    * a peers-by-value window (ties share ranks — deterministic regardless
    * of intra-peer order) and ntile over a provably TOTAL order (tile
    * boundaries depend on exact row order, so c_custkey disambiguates).
    * percent_rank and cume_dist are single IEEE divisions of exact
    * integers — bit-identical cross-engine.
    */
  def windowRanks(s: SparkSession, dir: String): DataFrame = {
    val byBal = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    val total = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    Tables
      .customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("rnk", rank().over(byBal).cast("long"))
      .withColumn("drnk", dense_rank().over(byBal).cast("long"))
      .withColumn("prank", percent_rank().over(byBal))
      .withColumn("cdist", cume_dist().over(byBal))
      .withColumn("tile", ntile(4).over(total).cast("long"))
  }

  // ------------------------------------------------- cube/rollup/sets

  def cubeFlagStatus(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  def rollupPriorityStatus(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  /** Distinct custkeys that ordered in 1996 vs in 1997 — set algebra. */
  private def custkeysOfYear(s: SparkSession, dir: String, year: Int): DataFrame =
    custkeysBagOfYear(s, dir, year).distinct()

  def setUnion(s: SparkSession, dir: String): DataFrame =
    custkeysOfYear(s, dir, 1996).union(custkeysOfYear(s, dir, 1997)).distinct()

  def setIntersect(s: SparkSession, dir: String): DataFrame =
    custkeysOfYear(s, dir, 1996).intersect(custkeysOfYear(s, dir, 1997))

  def setExcept(s: SparkSession, dir: String): DataFrame =
    custkeysOfYear(s, dir, 1996).except(custkeysOfYear(s, dir, 1997))

  /** Bag (multiset) variant of the year slice — no distinct, one row per
    * order — for the ALL set operations, which preserve multiplicity.
    */
  private def custkeysBagOfYear(s: SparkSession, dir: String, year: Int): DataFrame =
    Tables
      .orders(s, dir)
      .filter(col("o_orderdate") >= lit(f"$year-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit(f"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey").as("custkey"))

  def setExceptAll(s: SparkSession, dir: String): DataFrame =
    custkeysBagOfYear(s, dir, 1996).exceptAll(custkeysBagOfYear(s, dir, 1997))

  def setIntersectAll(s: SparkSession, dir: String): DataFrame =
    custkeysBagOfYear(s, dir, 1996).intersectAll(custkeysBagOfYear(s, dir, 1997))

  /** Global top-k with deterministic tiebreak — TakeOrderedAndProject, no
    * full sort of the input.
    */
  def topkGlobal(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(25)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  // ----------------------------------------------------- function families

  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "a", "@").as("subbed"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        instr(col("p_name"), "e").cast("long").as("first_e"),
        reverse(col("p_name")).as("rev"))

  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables
      .orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (dayofweek(col("o_orderdate")) - lit(1)).cast("long").as("dow"))

  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        abs(col("l_extendedprice") - lit(50000.0)).as("abs_dev"),
        floor(col("l_quantity") / lit(7.0)).cast("long").as("floored"),
        ceil(col("l_quantity") / lit(7.0)).cast("long").as("ceiled"),
        sqrt(col("l_extendedprice")).as("root"),
        pmod(col("l_orderkey"), lit(97L)).as("key_mod"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"))

  /** Full-outer join with null-side accounting. */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "full_outer")
      .agg(
        count(when(col("c_custkey").isNotNull && col("o_orderkey").isNotNull, 1)).as("n_matched"),
        count(when(col("o_orderkey").isNull, 1)).as("n_cust_only"),
        count(when(col("c_custkey").isNull, 1)).as("n_order_only"))

  /** Cross join (dimension x dimension — the only safe cross-join shape). */
  def crossJoinDims(s: SparkSession, dir: String): DataFrame =
    Tables
      .region(s, dir)
      .crossJoin(Tables.nation(s, dir))
      .select("r_name", "n_name")

  /** UNION ALL keeps duplicates (vs the distinct set ops above). */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    val f      = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    urgent
      .select("o_orderstatus")
      .unionAll(f.select("o_orderstatus"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
  }

  /** Explicit grouping sets (beyond cube/rollup). */
  def groupingSetsNation(s: SparkSession, dir: String): DataFrame =
    Tables
      .nation(s, dir)
      .groupingSets(Seq(Seq(col("n_regionkey")), Seq.empty), col("n_regionkey"))
      .agg(count(lit(1)).as("n"))

  /** Discrete median (lower of the two middle elements) per group via
    * ranking — deterministic, unlike interpolated percentiles whose
    * floating-point interpolation differs across engines.
    */
  def medianDisc(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    Tables
      .orders(s, dir)
      .withColumn("rnk", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      .filter(expr("rnk = (cnt + 1) div 2")) // lower middle (1-based); div = integer division
      .select(col("o_orderpriority"), col("o_totalprice").as("median_price"))
  }

  /** Array-function family over the tokenized documents. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"),
        filter(graft.text.Tokenize.tokenCol(col("text")), _ =!= "").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        array_join(slice(col("toks"), 1, 3), " ").as("first3"),
        array_join(reverse(col("toks")), " ").as("reversed"),
        array_contains(col("toks"), "spark").as("has_spark"),
        array_position(col("toks"), "the").cast("long").as("first_the"),
        array_join(array_sort(array_distinct(col("toks"))), " ").as("deduped"))

  /** Scalar subquery: orders above the global average price (Catalyst
    * rewrites the subquery to a broadcast of one row).
    */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val avgPrice = Tables
      .orders(s, dir)
      .agg((sum(col("o_totalprice").cast("decimal(38,6)")).cast("double") / count(lit(1))).as("ap"))
    Tables
      .orders(s, dir)
      .crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("ap"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_above_avg"))
  }

  /** Equi-width histogram (explicit bucket arithmetic — DuckDB has no
    * width_bucket, so both engines share the same formula).
    */
  def histDocLen(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        when(col("n_chars") < 0, 0L)
          .when(col("n_chars") >= 600, 13L)
          .otherwise(floor(col("n_chars") / lit(50.0)).cast("long") + 1)
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))

  /** Deterministic 5% sample via the shared md5 hash — reproducible across
    * runs, engines, and partitionings (never `TABLESAMPLE`/`rand()`, which
    * are not). The standard trick for stable dev subsets of a 100 TB
    * table.
    */
  def sampleHash(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(
        graft.functions.TextHash.hash60(
          concat_ws(":", col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
            col("l_partkey").cast("string"))) % 100 < 5)
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("sum_qty"))

  /** NULL-handling function family over the outer join's null side. */
  def nullFuncs(s: SparkSession, dir: String): DataFrame = {
    val ord96 = Tables
      .orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables
      .customer(s, dir)
      .join(ord96, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(max(col("o_totalprice")).as("max96"))
      .select(
        col("c_custkey"),
        coalesce(col("max96"), lit(0.0)).as("max_or_zero"),
        col("max96").isNull.as("inactive_96"),
        nullif(coalesce(col("max96"), lit(0.0)), lit(0.0)).as("nullif_zero"))
  }

  /** CASE WHEN bucketing + conditional aggregation. */
  def caseBuckets(s: SparkSession, dir: String): DataFrame =
    Tables
      .customer(s, dir)
      .select(
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high")
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))

  /** Referential-integrity audit — orphan foreign keys per relationship
    * across the whole star schema, the first data-quality report run on
    * any ingested warehouse. One row per FK edge: fact rows, orphans
    * (fk value with no matching pk row), orphan fraction.
    *
    * Scale shape: each fact table is scanned ONCE — its FK edges resolve
    * as successive left joins against pk-key-only projections in a single
    * pass (lineitem checks orders/part/supplier in one scan), with
    * null-ness counted in one aggregation; no per-edge rescan, no anti
    * joins. Pk projections are single-column; the planner broadcasts the
    * small ones and AQE the rest. The stack() unpivot runs on a ONE-ROW
    * frame.
    */
  def refIntegrity(s: SparkSession, dir: String): DataFrame = {
    def keyOf(df: DataFrame, k: String, flag: String): DataFrame =
      df.select(col(k), lit(1).as(flag))
    def frac(o: Column, n: Column) = o.cast("double") / n.cast("double")
    val li = Tables.lineitem(s, dir)
      .join(keyOf(Tables.orders(s, dir), "o_orderkey", "f_o")
        .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left")
      .join(keyOf(Tables.part(s, dir), "p_partkey", "f_p")
        .withColumnRenamed("p_partkey", "l_partkey"), Seq("l_partkey"), "left")
      .join(keyOf(Tables.supplier(s, dir), "s_suppkey", "f_s")
        .withColumnRenamed("s_suppkey", "l_suppkey"), Seq("l_suppkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("f_o").isNull, 1)).as("o_orph"),
        count(when(col("f_p").isNull, 1)).as("p_orph"),
        count(when(col("f_s").isNull, 1)).as("s_orph"))
      .selectExpr(
        """stack(3,
             'lineitem->orders',   n, o_orph,
             'lineitem->part',     n, p_orph,
             'lineitem->supplier', n, s_orph) AS (relationship, fk_rows, orphans)""")
    def one(name: String, fk: DataFrame, fkCol: String, pk: DataFrame, pkCol: String) =
      fk.join(keyOf(pk, pkCol, "f").withColumnRenamed(pkCol, fkCol), Seq(fkCol), "left")
        .agg(count(lit(1)).as("fk_rows"), count(when(col("f").isNull, 1)).as("orphans"))
        .select(lit(name).as("relationship"), col("fk_rows"), col("orphans"))
    li
      .unionByName(one("orders->customer",
        Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey"))
      .unionByName(one("customer->nation",
        Tables.customer(s, dir), "c_nationkey", Tables.nation(s, dir), "n_nationkey"))
      .unionByName(one("supplier->nation",
        Tables.supplier(s, dir), "s_nationkey", Tables.nation(s, dir), "n_nationkey"))
      .unionByName(one("nation->region",
        Tables.nation(s, dir), "n_regionkey", Tables.region(s, dir), "r_regionkey"))
      .select(col("relationship"), col("fk_rows"), col("orphans"),
        frac(col("orphans"), col("fk_rows")).as("orphan_frac"))
  }

  /** Fixture arrival boundary for [[ordersIncrementalJoin]] (mid-range of
    * both tables' date spans, so all four old/new quadrants are
    * populated).
    */
  val IncrJoinCut = "1998-01-01"

  /** Incremental JOIN-view maintenance — the join counterpart of
    * `events_incr_hourly`'s aggregate maintenance. A materialized
    * revenue-per-priority view was built from the OLD halves of orders
    * and lineitem; a batch later, new orders (by order date) and new
    * lineitems (by ship date) have both arrived. The view update applies
    * the delta algebra `J(A+ΔA, B+ΔB) = A⋈B + ΔA⋈B + A⋈ΔB + ΔA⋈ΔB`:
    * three delta joins, each with at least one DELTA-sized input, merged
    * into the materialized partials — the full history pair never
    * re-joins.
    *
    * Why it matters at 100 TB: the naive refresh re-joins two
    * corpus-sized tables every batch; here the dominant term (old ⋈ Δ)
    * keys a corpus-sized side against a batch-sized side — AQE broadcasts
    * the delta side when it fits, and the bloom/bucket layouts in
    * `ops/Storage` prune the old side's scan to matching keys. Partials
    * stay on the decimal(38,6) grid until the final merge, so the
    * incremental result is BIT-EQUAL to the full recompute — which is
    * exactly what the oracle runs (one plain join + rollup): the
    * incrementalization must be semantically invisible.
    */
  def ordersIncrementalJoin(s: SparkSession, dir: String): DataFrame = {
    val cut = lit(IncrJoinCut).cast("timestamp")
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
    def half(df: DataFrame, c: String, old: Boolean) =
      df.filter(if (old) col(c) < cut else col(c) >= cut).drop(c)
    def j(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,6)")).as("sv"))
    val materialized = j(half(ord, "o_orderdate", old = true),  half(li, "l_shipdate", old = true))
    val dA           = j(half(ord, "o_orderdate", old = false), half(li, "l_shipdate", old = true))
    val dB           = j(half(ord, "o_orderdate", old = true),  half(li, "l_shipdate", old = false))
    val dAB          = j(half(ord, "o_orderdate", old = false), half(li, "l_shipdate", old = false))
    materialized.unionAll(dA).unionAll(dB).unionAll(dAB)
      .groupBy("o_orderpriority")
      .agg(
        sum(col("n")).as("n_items"),
        sum(col("sv")).cast("double").as("revenue"))
  }

  /** Quintile cut percentiles for [[rfm]] (nearest-rank). */
  private val RfmCuts = Seq(20, 40, 60, 80)

  /** RFM customer segmentation — recency / frequency / monetary quintile
    * scores, the classic warehouse cohort primitive. The textbook
    * formulation is three `ntile(5)` windows, i.e. three single-partition
    * whole-table sorts — exactly the shape this catalog bans. Instead
    * each metric's four quintile boundaries come from a cumulative
    * histogram over the per-customer aggregate via [[Stats.rangeCum]]
    * (range-partitioned prefix sums — no task ever sorts the whole
    * metric), and the 4-value cut rows broadcast back onto the customers
    * for a pure projection score. Ties score identically (same value ⇒
    * same quintile) — deterministic where ntile's tie-split is
    * partition-order-dependent.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        max(to_date(col("o_orderdate"))).as("r"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast("decimal(38,6)")).cast("double").as("m"))
    // All three quintile-cut histograms ride ONE rangeCum, tagged by
    // metric (PERF guide §2.4: three identical range-partition pipelines
    // — three sampling passes, three range exchanges, three window
    // stages — collapse to one; r15 measured orders_rfm at 33 jobs,
    // dominated by exactly this triplication). Values are lifted onto a
    // common double axis first: r as days-since-epoch (small integers —
    // exact), f a count (exact), m already double. Both the rank
    // arithmetic (exact longs, untouched) and the score comparisons
    // (v > cut on the SAME lifted axis; datediff is strictly monotone
    // and injective on dates) are bit-identical to the per-metric form.
    val metricVal: Map[String, Column] = Map(
      "r" -> datediff(col("r"), lit("1970-01-01")).cast("double"),
      "f" -> col("f").cast("double"),
      "m" -> col("m"))
    val hist = Seq("r", "f", "m")
      .map(mc => cust.groupBy(metricVal(mc).as("v"))
        .agg(count(lit(1)).as("c")).withColumn("g", lit(mc)))
      .reduce(_ unionByName _)
    val cum = Stats.rangeCum(hist, Seq("g"), "v", "c")
    def hit(p: Int) =
      expr(s"cum - c < ($p * tot + 99) div 100 AND cum >= ($p * tot + 99) div 100")
    // one row per metric → pivot the 4 cut values into a single 12-col row
    val cutRow = cum.groupBy("g")
      .agg(
        RfmCuts.map(p => min(when(hit(p), col("v"))).as(s"c$p")).head,
        RfmCuts.map(p => min(when(hit(p), col("v"))).as(s"c$p")).tail: _*)
      .groupBy()
      .agg(
        (for { mc <- Seq("r", "f", "m"); p <- RfmCuts }
          yield min(when(col("g") === mc, col(s"c$p"))).as(s"${mc}_c$p")).head,
        (for { mc <- Seq("r", "f", "m"); p <- RfmCuts }
          yield min(when(col("g") === mc, col(s"c$p"))).as(s"${mc}_c$p")).tail: _*)
    def score(m: String) =
      RfmCuts.map(p => (metricVal(m) > col(s"${m}_c$p")).cast("long")).reduce(_ + _) + lit(1L)
    cust
      .crossJoin(broadcast(cutRow))
      .select(
        col("c_custkey"),
        score("r").as("r_score"),
        score("f").as("f_score"),
        score("m").as("m_score"),
        (score("r") * 100L + score("f") * 10L + score("m")).as("rfm_code"))
  }

  /** ABC (Pareto) revenue classification of parts — the classic
    * inventory-analysis cut: parts covering the first 80% of cumulative
    * revenue are class A, the next 15% B, the tail C. The textbook plan
    * sorts the whole part table by revenue in one task; here the
    * descending cumulative revenue comes from [[Stats.rangeCum]]
    * (range-partitioned prefix sums, ord = −revenue), so no task ever
    * holds more than its range slice. Class boundaries compare exact
    * decimals cross-multiplied by small integers ((cum−own)·5 < tot·4
    * for the 80% line) — no doubles near the thresholds, and revenue
    * ties share a cumulative value (RANGE frame semantics in both
    * engines), so tied parts always land in one class.
    */
  def abc(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,6)")).as("own"))
      .withColumn("v", negate(col("own")))
    // rangeCum runs on the DISTINCT-revenue histogram — exactly
    // (g, v, c), the pid-alignment discipline (the part key can't ride
    // the ord struct here: revenue ties must SHARE a cumulative value,
    // RANGE-frame semantics, and a unique ordering prefix would split
    // them). The per-part rows equi-join back on the revenue value —
    // tie-inclusive cum is identical by construction.
    val hv = rev.groupBy(col("v"))
      .agg(sum(col("own")).as("c"))
      .withColumn("g", lit(0))
    val cumv = Stats.rangeCum(hv, Seq("g"), "v", "c")
      .select(col("v"), col("cum"), col("tot"))
    // cum/tot direct decimal→double casts diverge between engines by 1 ULP
    // once the 1e-6-scaled image passes 2^53 (the dsum divergence,
    // resurfacing through the cumulative sum at sf1): route every
    // decimal→double here through the shared bigint image. cum_share
    // divides the two images directly — cum/tot == img(cum)/img(tot), the
    // common 1e6 scale cancels — so it is ONE IEEE division of two
    // exactly-rounded values, bit-identical in both engines at any scale
    // inside the enforced 2^63 envelope.
    def img(c: Column, what: String): Column =
      guardLongImage((c * lit(1000000)).cast("decimal(38,0)"), s"abc $what")
        .cast("double")
    rev.join(cumv, "v")
      .select(
        col("l_partkey").as("p_partkey"),
        (img(col("own"), "revenue") / lit(1e6)).as("revenue"),
        (img(col("cum"), "cum") / img(col("tot"), "tot")).as("cum_share"),
        when((col("cum") - col("own")) * 5 < col("tot") * 4, "A")
          .when((col("cum") - col("own")) * 20 < col("tot") * 19, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Result cap for [[marketBasket]] (total order: lift desc, pair id). */
  val BasketTopK = 25

  /** Market-basket association rules over same-order part pairs:
    * support, directional confidences, and lift for the top pairs — the
    * classic co-occurrence analytic. Pair generation is the within-order
    * self-join of the DISTINCT (order, part) basket table: Σ items² per
    * order with order width bounded by the schema (~7 lines), so pair
    * volume is linear in the fact table, never corpus². Lift multiplies
    * exact counts before its ONE division (n_ab·N / n_a·n_b), so the
    * ranking key is a single IEEE op; ties break by pair id. Only the
    * 1-row order-count aggregate broadcasts; the cap compiles to
    * TakeOrderedAndProject.
    */
  def marketBasket(s: SparkSession, dir: String): DataFrame = {
    // r16 (guide §2.4 — two operations keyed the same way share one
    // exchange): hash on ok BEFORE the distinct. HashPartitioning(ok)
    // satisfies the distinct's ClusteredDistribution(ok, pk) AND the
    // within-order self-join's ok clustering, so ONE exchange of the
    // fact projection serves the dedup, both join sides, and the
    // order-count aggregate — the old shape paid a (ok, pk) exchange
    // for the distinct and re-exchanged both join inputs on ok. Order
    // width is schema-bounded (~7 lines), so ok-only partitioning
    // cannot skew.
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(col("ok"))
      .distinct()
    val totO = baskets.select(countDistinct(col("ok")).as("n_orders"))
    val pairs = baskets.select(col("ok"), col("pk").as("pa"))
      .join(baskets.select(col("ok"), col("pk").as("pb")), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_ab"))
    val items = baskets.groupBy(col("pk")).agg(count(lit(1)).as("n_i"))
    pairs
      .join(items.select(col("pk").as("pa"), col("n_i").as("n_a")), "pa")
      .join(items.select(col("pk").as("pb"), col("n_i").as("n_b")), "pb")
      .crossJoin(broadcast(totO))
      .select(
        col("pa"), col("pb"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_orders").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_ab"),
        (col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_ba"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(desc("lift"), asc("pa"), asc("pb"))
      .limit(BasketTopK)
  }

  /** Monthly cohort retention matrix: customers are grouped by the month
    * of their FIRST order (the cohort), and each later month's row says
    * how many of that cohort ordered again `month_offset` months on —
    * the standard retention triangle every growth dashboard draws.
    *
    * Scale shape: one custkey aggregation for first-order month, one
    * fact-sized equi-join back on custkey (both sides hash-partitioned
    * on the same key), a distinct + count onto the tiny (cohort, offset)
    * grid, and a BROADCAST join of the per-cohort sizes (≤ #months
    * rows) for the retention denominator. Months map to integers
    * (year·12 + month−1) so the offset is pure integer arithmetic —
    * no interval semantics to disagree across engines.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("ck"),
      (year(col("o_orderdate")) * 12 + (month(col("o_orderdate")) - 1)).as("m"))
    val first = o.groupBy("ck").agg(min(col("m")).as("m0"))
    val active = o.join(first, "ck")
      .select(col("ck"), col("m0"), (col("m") - col("m0")).as("month_offset"))
      .distinct()
      .groupBy("m0", "month_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = active.filter(col("month_offset") === 0)
      .select(col("m0"), col("n_active").as("cohort_size"))
    active
      .join(broadcast(sizes), "m0")
      .select(
        expr("make_date(m0 div 12, m0 % 12 + 1, 1)").as("cohort_month"),
        col("month_offset").cast("long").as("month_offset"),
        col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  // ---------------------------------------------------------------- maps

  val queries: Map[String, Q] = Map(
    "orders_cohort"       -> (cohortRetention _),
    "orders_basket"       -> (marketBasket _),
    "orders_abc"          -> (abc _),
    "orders_rfm"          -> (rfm _),
    "audit_ref_integrity" -> (refIntegrity _),
    "orders_incr_join"    -> (ordersIncrementalJoin _),
    "q1_pricing"         -> (q1Pricing _),
    "distinct_agg"       -> (distinctOrdersPerFlag _),
    "agg_minmax"         -> (aggMinMax _),
    "q3_topk_revenue"    -> (q3TopkRevenue _),
    "q5_nation_revenue"  -> (q5NationRevenue _),
    "q6_forecast"        -> (q6Forecast _),
    "q7_volume"          -> (q7Volume _),
    "q10_returned"       -> (q10Returned _),
    "q13_order_dist"     -> (q13OrderDist _),
    "q14_promo"          -> (q14Promo _),
    "q18_big_orders"     -> (q18BigOrders _),
    "q19_disjunct"       -> (q19Disjunct _),
    "q4_late_orders"     -> (q4LateOrders _),
    "q17_small_qty"      -> (q17SmallQty _),
    "q8_market_share"    -> (q8MarketShare _),
    "q9_profit"          -> (q9Profit _),
    "q12_priority"       -> (q12Priority _),
    "q15_top_supplier"   -> (q15TopSupplier _),
    "q16_supplier_cnt"   -> (q16SupplierCnt _),
    "q21_waiting"        -> (q21Waiting _),
    "q22_dormant"        -> (q22Dormant _),
    "q2_min_cost"        -> (q2MinCost _),
    "q11_important"      -> (q11Important _),
    "q20_promotion"      -> (q20Promotion _),
    "join_broadcast"     -> (joinBroadcastParts _),
    "join_semi"          -> (joinSemi _),
    "join_anti"          -> (joinAnti _),
    "join_outer"         -> (joinOuter _),
    "join_range"         -> (joinRange _),
    "window_topk"        -> (windowTopkOrders _),
    "window_topk_fast"   -> (windowTopkFast _),
    "window_running"     -> (windowRunningQty _),
    "window_ranks"       -> (windowRanks _),
    "window_range_frame" -> (windowRangeFrame _),
    "cube_agg"           -> (cubeFlagStatus _),
    "rollup_agg"         -> (rollupPriorityStatus _),
    "set_union"          -> (setUnion _),
    "set_intersect"      -> (setIntersect _),
    "set_except"         -> (setExcept _),
    "set_except_all"     -> (setExceptAll _),
    "set_intersect_all"  -> (setIntersectAll _),
    "topk_global"        -> (topkGlobal _),
    "join_full_outer"    -> (joinFullOuter _),
    "cross_join"         -> (crossJoinDims _),
    "union_all"          -> (unionAll _),
    "grouping_sets"      -> (groupingSetsNation _),
    "string_funcs"       -> (stringFuncs _),
    "date_funcs"         -> (dateFuncs _),
    "math_funcs"         -> (mathFuncs _),
    "case_buckets"       -> (caseBuckets _),
    "median_disc"        -> (medianDisc _),
    "hist_doc_len"       -> (histDocLen _),
    "sample_hash"        -> (sampleHash _),
    "null_funcs"         -> (nullFuncs _),
    "array_funcs"        -> (arrayFuncs _),
    "scalar_subquery"    -> (scalarSubquery _)
  )

  private def ds(c: String) = DSUM.format(c)

  /** Shared by window_topk and window_topk_fast — the two formulations
    * must agree bit-for-bit, so they verify against one oracle text.
    */
  private val windowTopkOracle =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
       SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
       FROM orders) WHERE rn <= 3"""

  val oracle: Map[String, String] = Map(
    "orders_cohort" ->
      """WITH o AS (SELECT o_custkey AS ck,
             year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS m FROM orders),
         f AS (SELECT ck, min(m) AS m0 FROM o GROUP BY 1),
         a AS (SELECT DISTINCT o.ck, m0, m - m0 AS month_offset FROM o JOIN f USING (ck)),
         c AS (SELECT m0, month_offset, count(*) AS n_active FROM a GROUP BY 1, 2),
         s AS (SELECT m0, n_active AS cohort_size FROM c WHERE month_offset = 0)
         SELECT make_date(CAST(m0 // 12 AS INT), CAST(m0 % 12 + 1 AS INT), 1) AS cohort_month,
           CAST(month_offset AS BIGINT) AS month_offset,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
         FROM c JOIN s USING (m0)""",
    "orders_basket" ->
      s"""WITH baskets AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         t AS (SELECT count(DISTINCT ok) AS n_orders FROM baskets),
         pairs AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_ab
                   FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.pk < b.pk
                   GROUP BY 1, 2),
         items AS (SELECT pk, count(*) AS n_i FROM baskets GROUP BY 1)
         SELECT pa, pb, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
           CAST(n_ab AS DOUBLE) / CAST(x.n_i AS DOUBLE) AS conf_ab,
           CAST(n_ab AS DOUBLE) / CAST(y.n_i AS DOUBLE) AS conf_ba,
           CAST(n_ab * n_orders AS DOUBLE) / CAST(x.n_i * y.n_i AS DOUBLE) AS lift
         FROM pairs JOIN items x ON x.pk = pa JOIN items y ON y.pk = pb, t
         ORDER BY lift DESC, pa ASC, pb ASC LIMIT $BasketTopK""",
    "orders_abc" ->
      """WITH rev AS (
           SELECT l_partkey, sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS c
           FROM lineitem GROUP BY 1),
         t AS (SELECT sum(c) AS tot FROM rev),
         cm AS (SELECT l_partkey, c, sum(c) OVER (ORDER BY c DESC) AS cum FROM rev)
         SELECT l_partkey AS p_partkey,
           CAST(CAST(c * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0 AS revenue,
           CAST(CAST(cum * 1000000 AS BIGINT) AS DOUBLE)
             / CAST(CAST(tot * 1000000 AS BIGINT) AS DOUBLE) AS cum_share,
           CASE WHEN (cum - c) * 5 < tot * 4 THEN 'A'
                WHEN (cum - c) * 20 < tot * 19 THEN 'B'
                ELSE 'C' END AS abc_class
         FROM cm, t""",
    "orders_rfm" -> {
      def cutsSql(src: String, ord: String) = {
        val picks = RfmCuts
          .map(p => s"max(CASE WHEN rk = ($p*tot+99)//100 THEN v END) AS ${ord}_c$p")
          .mkString(", ")
        s"$src AS (SELECT $picks FROM (SELECT $ord AS v, row_number() OVER (ORDER BY $ord) AS rk FROM cust), n)"
      }
      def scoreSql(m: String) =
        RfmCuts.map(p => s"(CASE WHEN $m > ${m}_c$p THEN 1 ELSE 0 END)").mkString("1 + ", " + ", "")
      s"""WITH cust AS (
           SELECT o_custkey AS ck, max(CAST(o_orderdate AS DATE)) AS r, count(*) AS f,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS m
           FROM orders GROUP BY 1),
         n AS (SELECT count(*) AS tot FROM cust),
         ${cutsSql("rc", "r")},
         ${cutsSql("fc", "f")},
         ${cutsSql("mc", "m")}
         SELECT ck AS c_custkey,
           CAST(${scoreSql("r")} AS BIGINT) AS r_score,
           CAST(${scoreSql("f")} AS BIGINT) AS f_score,
           CAST(${scoreSql("m")} AS BIGINT) AS m_score,
           CAST((${scoreSql("r")}) * 100 + (${scoreSql("f")}) * 10 + (${scoreSql("m")})
             AS BIGINT) AS rfm_code
         FROM cust, rc, fc, mc"""
    },
    // full recompute: one plain join + rollup. The Spark side reaches the
    // same rows through the materialized-view delta algebra — the
    // incrementalization must be semantically invisible.
    "orders_incr_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1""",
    "audit_ref_integrity" ->
      """WITH li AS (
           SELECT count(*) AS n,
             count(*) FILTER (WHERE o.o_orderkey IS NULL) AS o_orph,
             count(*) FILTER (WHERE p.p_partkey IS NULL) AS p_orph,
             count(*) FILTER (WHERE s.s_suppkey IS NULL) AS s_orph
           FROM lineitem l
           LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
           LEFT JOIN part p ON l.l_partkey = p.p_partkey
           LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         u AS (
           SELECT 'lineitem->orders' AS relationship, n AS fk_rows, o_orph AS orphans FROM li
           UNION ALL SELECT 'lineitem->part', n, p_orph FROM li
           UNION ALL SELECT 'lineitem->supplier', n, s_orph FROM li
           UNION ALL SELECT 'orders->customer', count(*),
             count(*) FILTER (WHERE c.c_custkey IS NULL)
             FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           UNION ALL SELECT 'customer->nation', count(*),
             count(*) FILTER (WHERE n2.n_nationkey IS NULL)
             FROM customer c LEFT JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
           UNION ALL SELECT 'supplier->nation', count(*),
             count(*) FILTER (WHERE n2.n_nationkey IS NULL)
             FROM supplier s LEFT JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
           UNION ALL SELECT 'nation->region', count(*),
             count(*) FILTER (WHERE r.r_regionkey IS NULL)
             FROM nation n2 LEFT JOIN region r ON n2.n_regionkey = r.r_regionkey)
         SELECT relationship, CAST(fk_rows AS BIGINT) AS fk_rows,
           CAST(orphans AS BIGINT) AS orphans,
           CAST(orphans AS DOUBLE) / CAST(fk_rows AS DOUBLE) AS orphan_frac
         FROM u""",
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${ds("l_quantity")} AS sum_qty,
         ${ds("l_extendedprice")} AS sum_base_price,
         ${ds("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         ${ds("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         ${ds("l_quantity")} / count(*) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02' GROUP BY 1, 2""",
    "q6_forecast" ->
      s"""SELECT ${ds("l_extendedprice * l_discount")} AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q7_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         ${ds("l_extendedprice * (1.0 - l_discount)")} AS volume
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name IN ('$Q7NationA', '$Q7NationB')
           AND n2.n_name IN ('$Q7NationA', '$Q7NationB')
           AND n1.n_name <> n2.n_name
         GROUP BY 1, 2, 3""",
    "q10_returned" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         ${ds("l_extendedprice * (1.0 - l_discount)")} AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_returnflag = 'R'
         GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    "q13_order_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1)
         GROUP BY 1""",
    "q14_promo" ->
      s"""SELECT 100.0 *
         ${ds("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         ${ds("l_extendedprice * (1.0 - l_discount)")} AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",
    "q18_big_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         ${ds("l_quantity")} AS sum_qty
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem GROUP BY 1
           HAVING ${ds("l_quantity")} > $Q18MinQty)
         GROUP BY 1, 2, 3, 4, 5 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q19_disjunct" ->
      s"""SELECT ${ds("l_extendedprice * (1.0 - l_discount)")} AS revenue, count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 35)""",
    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""",
    "q17_small_qty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#23'
           AND l_quantity < (
             SELECT CAST(0.2 AS DOUBLE) *
               (CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*))
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ${ds("CASE WHEN n2.n_name = 'NATION_5' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
             / ${ds("l_extendedprice * (1.0 - l_discount)")} AS mkt_share
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'AMERICA' GROUP BY 1""",
    "q9_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ${ds("l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity")} AS sum_profit
         FROM lineitem JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%' GROUP BY 1, 2""",
    "q12_priority" ->
      """SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1""",
    "q15_top_supplier" ->
      s"""WITH rev AS (
           SELECT l_suppkey, ${ds("l_extendedprice * (1.0 - l_discount)")} AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, total_rev
         FROM supplier JOIN rev ON s_suppkey = l_suppkey
         JOIN (SELECT max(total_rev) AS mr FROM rev) ON total_rev = mr""",
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#4' AND p_size IN (1, 9, 17, 25, 33, 41, 49)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
         GROUP BY 1, 2""",
    "q21_waiting" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
           AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 100""",
    "q22_dormant" ->
      """SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
         FROM customer
         WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
           AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                                   / count(*)
                            FROM customer
                            WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '1999-01-01')
         GROUP BY c_nationkey""",
    "q2_min_cost" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
         FROM part, lineitem, supplier, nation, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'EUROPE' AND p_size = 15
           AND s_acctbal = (SELECT min(s2.s_acctbal)
                            FROM lineitem l2, supplier s2, nation n2, region r2
                            WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
                              AND s2.s_nationkey = n2.n_nationkey
                              AND n2.n_regionkey = r2.r_regionkey
                              AND r2.r_name = 'EUROPE')
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "q20_promotion" ->
      """SELECT s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE s_suppkey IN (
           SELECT l.l_suppkey
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_name LIKE 'blue%'
             AND l.l_shipdate >= TIMESTAMP '1997-01-01'
             AND l.l_shipdate <  TIMESTAMP '1998-01-01'
           GROUP BY l.l_suppkey
           HAVING CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) >
             0.22 * (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                     FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey
                     WHERE p2.p_name LIKE 'blue%' AND l2.l_suppkey = l.l_suppkey))""",
    "q11_important" ->
      s"""WITH rev AS (
           SELECT l_suppkey, ${ds("l_extendedprice * (1.0 - l_discount)")} AS supp_rev
           FROM lineitem GROUP BY 1)
         SELECT l_suppkey, supp_rev FROM rev
         WHERE supp_rev > (SELECT ${ds("l_extendedprice * (1.0 - l_discount)")} * 0.001
                           FROM lineitem)""",
    "agg_minmax" ->
      "SELECT s_nationkey, min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal, count(*) AS n_suppliers FROM supplier GROUP BY 1",
    "distinct_agg" ->
      "SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders, count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY 1",
    "q3_topk_revenue" ->
      s"""SELECT l_orderkey, o_orderdate, ${ds("l_extendedprice * (1.0 - l_discount)")} AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q5_nation_revenue" ->
      s"""SELECT n_name, ${ds("l_extendedprice * (1.0 - l_discount)")} AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1""",
    "join_broadcast" ->
      s"SELECT p_brand, count(*) AS n_items, ${ds("l_quantity")} AS sum_qty FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1",
    "join_semi" ->
      "SELECT c_mktsegment, count(*) AS n_customers FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1",
    "join_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
         GROUP BY 1""",
    "join_outer" ->
      s"SELECT c_custkey, count(o_orderkey) AS n_orders, ${ds("o_totalprice")} AS total_spent FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1",
    "join_range" ->
      "SELECT p_brand, count(*) AS n_in_band FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity >= p_size - 5.0 AND l_quantity <= p_size + 5.0 GROUP BY 1",
    "window_topk" -> windowTopkOracle,
    "window_topk_fast" -> windowTopkOracle,
    "window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) OVER (
           PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem""",
    "window_ranks" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(rank() OVER w AS BIGINT) AS rnk,
         CAST(dense_rank() OVER w AS BIGINT) AS drnk,
         percent_rank() OVER w AS prank,
         cume_dist() OVER w AS cdist,
         CAST(ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS BIGINT) AS tile
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)""",
    "window_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
         count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
         FROM orders""",
    "cube_agg" ->
      s"SELECT l_returnflag, l_linestatus, count(*) AS n, ${ds("l_quantity")} AS sum_qty FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
    "rollup_agg" ->
      s"SELECT o_orderpriority, o_orderstatus, count(*) AS n, ${ds("o_totalprice")} AS total FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)",
    "set_union" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         UNION
         SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""",
    "set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""",
    "set_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""",
    "set_except_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""",
    "set_intersect_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         INTERSECT ALL
         SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""",
    "topk_global" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25",
    "join_full_outer" ->
      """SELECT count(*) FILTER (WHERE c_custkey IS NOT NULL AND o_orderkey IS NOT NULL) AS n_matched,
         count(*) FILTER (WHERE o_orderkey IS NULL) AS n_cust_only,
         count(*) FILTER (WHERE c_custkey IS NULL) AS n_order_only
         FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey""",
    "cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "union_all" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
           SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'F') GROUP BY 1""",
    "grouping_sets" ->
      "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY GROUPING SETS ((n_regionkey), ())",
    "string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, substring(p_name, 1, 5) AS prefix,
         length(p_name) AS name_len, concat_ws('-', p_brand, p_type) AS brand_type,
         regexp_replace(p_name, 'a', '@', 'g') AS subbed,
         lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
         strpos(p_name, 'e') AS first_e, reverse(p_name) AS rev FROM part""",
    "date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mon,
         dayofmonth(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
         date_trunc('month', o_orderdate) AS month_start,
         dayofweek(o_orderdate) AS dow FROM orders""",
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber, abs(l_extendedprice - 50000.0) AS abs_dev,
         CAST(floor(l_quantity / 7.0) AS BIGINT) AS floored,
         CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceiled,
         sqrt(l_extendedprice) AS root,
         l_orderkey % 97 AS key_mod,
         greatest(l_tax, l_discount) AS gr,
         l_quantity * l_quantity AS qty_sq FROM lineitem""",
    "case_buckets" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket,
         count(*) AS n FROM customer GROUP BY 1""",
    "sample_hash" ->
      s"""SELECT count(*) AS n_sampled,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE ${graft.functions.TextHash.duckHash60Of(
        "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR)")} % 100 < 5""",
    "null_funcs" ->
      """SELECT c_custkey,
         coalesce(max96, 0.0) AS max_or_zero,
         max96 IS NULL AS inactive_96,
         nullif(coalesce(max96, 0.0), 0.0) AS nullif_zero
         FROM (SELECT c_custkey, max(o_totalprice) AS max96
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey
                 AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
               GROUP BY 1)""",
    "hist_doc_len" ->
      """SELECT CASE WHEN n_chars < 0 THEN 0
                    WHEN n_chars >= 600 THEN 13
                    ELSE CAST(floor(n_chars / 50.0) AS BIGINT) + 1 END AS bucket,
         count(*) AS n FROM documents GROUP BY 1""",
    "median_disc" ->
      """SELECT o_orderpriority, o_totalprice AS median_price FROM (
           SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rnk,
             count(*) OVER (PARTITION BY o_orderpriority) AS cnt
           FROM orders)
         WHERE rnk = (cnt + 1) // 2""",
    "array_funcs" ->
      """SELECT doc_id, len(l) AS n_toks,
         array_to_string(l[1:3], ' ') AS first3,
         array_to_string(list_reverse(l), ' ') AS reversed,
         list_contains(l, 'spark') AS has_spark,
         CAST(coalesce(list_position(l, 'the'), 0) AS BIGINT) AS first_the,
         array_to_string(list_sort(list_distinct(l)), ' ') AS deduped
         FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '') l
               FROM documents)""",
    "scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_above_avg FROM orders
         WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) FROM orders)
         GROUP BY 1"""
  )
}
