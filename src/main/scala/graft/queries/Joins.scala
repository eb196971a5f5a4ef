package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Outer-join and nested-aggregation surface (the TPC-H shapes the
  * reference never needed but a complete engine must cover): left
  * outer with null-group counting, correlated-min elimination via a
  * derived aggregate join, aggregate-of-aggregate, and HAVING.
  *
  * Scale notes: x01's outer join shuffles both sides on the key once
  * and feeds the two stacked aggregations without re-shuffling more
  * than the group columns; x02/x03 rewrite correlated subqueries as
  * derived-table joins — the form Catalyst plans as hash joins instead
  * of per-row subquery execution.
  */
object Joins extends QueryModule {

  /** x01 — TPC-H Q13 shape: customers x their order counts, including
    * zero-order customers (left outer), then the count-of-counts
    * distribution. */
  private def x01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d).select($"c_custkey")
    val ord = Tables.orders(s, d)
      .filter(!$"o_orderpriority".startsWith("1-"))
      .select($"o_custkey", $"o_orderkey")
    cust.join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }
  private val x01Sql =
    """SELECT c_count, count(*) AS custdist FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1-%'
         GROUP BY c_custkey)
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** x02 — TPC-H Q2 shape: rows equal to their group's minimum
    * (correlated scalar subquery rewritten as a derived-aggregate
    * equi-join): the cheapest lineitem per part. */
  private def x02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val minPrice = li.groupBy($"l_partkey".as("mp_partkey"))
      .agg(min($"l_extendedprice").as("min_price"))
    li.join(minPrice,
        $"l_partkey" === $"mp_partkey" && $"l_extendedprice" === $"min_price")
      .groupBy($"l_partkey")
      .agg(round(min($"l_extendedprice"), 2).as("cheapest"),
        count(lit(1)).as("n_at_min"))
      .orderBy($"l_partkey")
  }
  private val x02Sql =
    """SELECT l_partkey, round(min(l_extendedprice), 2) AS cheapest,
         count(*) AS n_at_min
       FROM lineitem l
       WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem
                                WHERE l_partkey = l.l_partkey)
       GROUP BY l_partkey ORDER BY l_partkey"""

  /** x03 — TPC-H Q15 shape: aggregate of an aggregate — suppliers whose
    * revenue equals the maximum supplier revenue. */
  private def x03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("total_rev"))
    val maxRev = rev.agg(max($"total_rev").as("max_rev"))
    rev.join(broadcast(maxRev), $"total_rev" === $"max_rev")
      .select($"l_suppkey", $"total_rev")
      .orderBy($"l_suppkey")
  }
  private val x03Sql =
    """WITH rev AS (
         SELECT l_suppkey,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_rev
         FROM lineitem GROUP BY l_suppkey)
       SELECT l_suppkey, total_rev FROM rev
       WHERE total_rev = (SELECT max(total_rev) FROM rev)
       ORDER BY l_suppkey"""

  /** x04 — TPC-H Q18 shape: HAVING on an aggregate (big-quantity
    * orders), then enrichment join back to the detail. */
  private def x04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 25) // HAVING
    big.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("price"),
        $"sum_qty")
      .orderBy($"o_orderkey")
  }
  private val x04Sql =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price, sum_qty
       FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 25) b
       JOIN orders ON l_orderkey = o_orderkey
       ORDER BY o_orderkey"""

  /** x05 — right and full outer in one flow: nations with suppliers vs
    * nations with customers, reconciled. */
  private def x05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val suppN = Tables.supplier(s, d).groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_supp"))
    val custN = Tables.customer(s, d).groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
    suppN.join(custN, $"s_nationkey" === $"c_nationkey", "full_outer")
      .select(
        coalesce($"s_nationkey", $"c_nationkey").as("nationkey"),
        coalesce($"n_supp", lit(0L)).as("n_supp"),
        coalesce($"n_cust", lit(0L)).as("n_cust"))
      .orderBy($"nationkey")
  }
  private val x05Sql =
    """SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
         coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
       FROM (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
       FULL OUTER JOIN (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
         ON s_nationkey = c_nationkey
       ORDER BY nationkey"""

  /** x06 — TPC-H Q17 shape: rows below a fraction of their group's
    * average (correlated AVG subquery as a broadcast derived join). */
  private def x06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val avgQty = li.groupBy($"l_partkey".as("ap_partkey"))
      .agg((avg($"l_quantity") * 0.5).as("half_avg"))
    li.join(broadcast(avgQty), $"l_partkey" === $"ap_partkey")
      .filter($"l_quantity" < $"half_avg")
      .agg(round(sum($"l_extendedprice") / 7.0, 4).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }
  private val x06Sql =
    """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
         count(*) AS n_rows
       FROM lineitem l
       WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                           WHERE l_partkey = l.l_partkey)"""

  /** x07 — date/time arithmetic surface (absent from the reference,
    * standard for the engine): month truncation, day differences,
    * extraction, interval shifting. */
  private def x07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
    val ord = Tables.orders(s, d).select($"o_orderkey", $"o_orderdate")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("order_month", date_trunc("month", $"o_orderdate").cast("date"))
      .withColumn("ship_delay_days",
        datediff($"l_shipdate".cast("date"), $"o_orderdate".cast("date")))
      .groupBy($"order_month")
      .agg(count(lit(1)).as("n_lines"),
        round(avg($"ship_delay_days"), 4).as("avg_delay"),
        max($"ship_delay_days").cast("long").as("max_delay"),
        min(dayofweek($"o_orderdate")).cast("long").as("min_dow"))
      .orderBy($"order_month")
  }
  private val x07Sql =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
         count(*) AS n_lines,
         round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4) AS avg_delay,
         max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_delay,
         min(dayofweek(o_orderdate) + 1) AS min_dow
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1 ORDER BY order_month"""

  /** x08 — salted skew join (ScaleOps.saltedJoin as a driver query):
    * lineitem salted 8 ways on a hash of l_orderkey, part replicated
    * 8x, joined on partkey. The oracle is the PLAIN equi-join SQL —
    * the driver gate itself proves salting is result-invariant, not
    * just the spec. At 100 TB this is the hot-key escape hatch when
    * AQE skew splitting can't save a pathological probe side. */
  private def x08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_partkey".as("key"), $"l_quantity", $"l_orderkey")
    val pt = Tables.part(s, d).select($"p_partkey".as("key"), $"p_brand")
    graft.ops.ScaleOps.saltedJoin(li, pt, "key", "l_orderkey", 8)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"p_brand")
  }
  private val x08Sql =
    """SELECT p_brand, count(*) AS n_lines,
         round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand ORDER BY p_brand"""

  /** x09 — bucketed co-located join (ScaleOps.writeBucketedAt as a
    * driver query): orders and customer both written bucketed+sorted
    * 8 ways on custkey to a scratch dir, re-read and joined — the join
    * itself plans with NO Exchange on either side (BucketingSpec
    * asserts that); the oracle is the plain join SQL over the original
    * parquet, proving the bucketed round-trip is lossless. This is the
    * amortize-the-shuffle pattern for repeated big-big joins. */
  private def x09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = graft.util.Scratch.dir("x09")
    graft.ops.ScaleOps.writeBucketedAt(
      Tables.orders(s, d).select($"o_custkey", $"o_totalprice"),
      "graft_x09_orders", "o_custkey", 8, s"$scratch/orders")
    graft.ops.ScaleOps.writeBucketedAt(
      Tables.customer(s, d).select($"c_custkey", $"c_mktsegment"),
      "graft_x09_customer", "c_custkey", 8, s"$scratch/customer")
    s.table("graft_x09_orders")
      .join(s.table("graft_x09_customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"c_mktsegment")
  }
  private val x09Sql =
    """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** x10 — bloom-pruned semi-join (ScaleOps.bloomPrunedJoin as a driver
    * query): a Bloom filter over the urgent orders' keys pre-filters
    * lineitem map-side before the join shuffle — Spark's runtime-filter
    * mechanism as an explicit operator. The oracle is the PLAIN
    * join+filter SQL: blooms have no false negatives, so the gate
    * itself proves pruning is result-invariant. At 100 TB this turns a
    * full-fact shuffle into a shuffle of only the ~20% of lines whose
    * order plausibly matches. */
  private def x10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_returnflag", $"l_extendedprice")
    val urgent = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    graft.ops.ScaleOps.bloomPrunedJoin(li, urgent, "l_orderkey", "o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice"), 2).as("revenue"))
      .orderBy($"l_returnflag")
  }
  private val x10Sql =
    """SELECT l_returnflag, count(*) AS n_lines,
         round(sum(l_extendedprice), 2) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderpriority = '1-URGENT'
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** x11 — DYNAMIC PARTITION PRUNING (runtime partition elimination):
    * the fact table written PARTITIONED BY order-year to scratch, then
    * joined to a tiny dimension whose filter ("recent" = 1997+) only
    * becomes a partition predicate at RUNTIME — Spark plans a
    * dynamicpruning subquery that reuses the dimension's broadcast to
    * skip entire fact partitions at the scan (PlanAuditSpec asserts the
    * plan carries it). THE partition-layout payoff at 100 TB: a
    * date-partitioned warehouse fact never scans years a query's
    * dimension filter excludes, without the filter ever being written
    * against the fact. Oracle = the same join over the original
    * unpartitioned parquet.
    */
  private def x11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scratch = graft.util.Scratch.dir("x11_orders")
    Tables.orders(s, d)
      .withColumn("yr", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("yr").parquet(scratch)
    val fact = s.read.parquet(scratch)
    val dim = Tables.orders(s, d)
      .select(year($"o_orderdate").as("yr")).distinct()
      .withColumn("era", when($"yr" >= 1997, "recent").otherwise("past"))
    fact.join(broadcast(dim).filter($"era" === "recent"), "yr")
      .groupBy($"yr")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .select($"yr".cast("int").as("yr"), $"n_orders",
        ($"cents" / 100.0).as("revenue"))
      .orderBy($"yr")
  }
  private val x11Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
       FROM orders WHERE year(o_orderdate) >= 1997
       GROUP BY 1 ORDER BY yr"""

  val queries: Map[String, QueryFn] = Map(
    "x11_dynamic_pruning" -> x11 _,
    "x01_outer_distribution" -> x01 _,
    "x10_bloom_prejoin" -> x10 _,
    "x08_salted_join" -> x08 _,
    "x09_bucketed_join" -> x09 _,
    "x06_avg_subquery" -> x06 _,
    "x07_date_arithmetic" -> x07 _,
    "x02_correlated_min" -> x02 _,
    "x03_agg_of_agg" -> x03 _,
    "x04_having_detail" -> x04 _,
    "x05_full_outer_reconcile" -> x05 _,
  )

  val oracle: Map[String, String] = Map(
    "x11_dynamic_pruning" -> x11Sql,
    "x01_outer_distribution" -> x01Sql,
    "x10_bloom_prejoin" -> x10Sql,
    "x08_salted_join" -> x08Sql,
    "x09_bucketed_join" -> x09Sql,
    "x06_avg_subquery" -> x06Sql,
    "x07_date_arithmetic" -> x07Sql,
    "x02_correlated_min" -> x02Sql,
    "x03_agg_of_agg" -> x03Sql,
    "x04_having_detail" -> x04Sql,
    "x05_full_outer_reconcile" -> x05Sql,
  )
}
