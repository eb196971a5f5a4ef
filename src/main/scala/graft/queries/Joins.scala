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

  /** x12 — Z-ORDER clustering (ScaleOps.zorderKey2 as a driver query):
    * the fact table keyed by the Morton interleave of (partkey, suppkey)
    * and bucketed into 64 equi-width z-ranges — each bucket's min/max
    * over BOTH dimensions shows the rectangle that bucket would pin as
    * file-level stats under `ScaleOps.zorderWrite` (ZorderSpec measures
    * the actual file-skipping win on a written layout: a probe on either
    * dimension overlaps few z-clustered files vs all files of a
    * single-column sort). The oracle recomputes the bit interleave with
    * DuckDB's integer ops, certifying the morton arithmetic bit-for-bit.
    * Equi-WIDTH (z >> 26), not equi-height (ntile), keeps the bucket id
    * a pure map-side expression — no global sort, no sampled ranges —
    * so the layout decision scales embarrassingly at 100 TB. */
  private def x12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    // normalize each dim to the full 16-bit range by its observed max
    // (integer arithmetic — deterministic at any SF; min-max skipping
    // needs only ORDER, so the lossy rescale is free fidelity-wise);
    // the 2-row stats side rides along as a broadcast
    val mx = li.agg(max($"l_partkey").as("maxp"), max($"l_suppkey").as("maxs"))
    li.crossJoin(broadcast(mx))
      .withColumn("z", graft.ops.ScaleOps.zorderKey2(
        expr("(l_partkey * 65535) div maxp"), expr("(l_suppkey * 65535) div maxs")))
      .groupBy(shiftright($"z", 26).as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min($"l_partkey").as("min_part"), max($"l_partkey").as("max_part"),
        min($"l_suppkey").as("min_supp"), max($"l_suppkey").as("max_supp"),
        round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"zbucket")
  }
  private val x12Sql =
    """WITH mx AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs
                   FROM lineitem),
       b AS (
         SELECT (l_partkey * 65535) // maxp AS dx,
                (l_suppkey * 65535) // maxs AS dy,
                l_partkey, l_suppkey, l_quantity
         FROM lineitem, mx),
       s1 AS (SELECT *, ((dx | (dx << 8)) & 16711935) AS xa,
                        ((dy | (dy << 8)) & 16711935) AS ya FROM b),
       s2 AS (SELECT *, ((xa | (xa << 4)) & 252645135) AS xb,
                        ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
       s3 AS (SELECT *, ((xb | (xb << 2)) & 858993459) AS xc,
                        ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
       s4 AS (SELECT *, ((xc | (xc << 1)) & 1431655765) AS xd,
                        ((yc | (yc << 1)) & 1431655765) AS yd FROM s3),
       z AS (SELECT l_partkey, l_suppkey, l_quantity,
               (xd | (yd << 1)) AS z FROM s4)
       SELECT z >> 26 AS zbucket, count(*) AS n_rows,
         min(l_partkey) AS min_part, max(l_partkey) AS max_part,
         min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
         round(sum(l_quantity), 2) AS sum_qty
       FROM z GROUP BY 1 ORDER BY zbucket"""

  /** x13 — TIME ZONE semantics: the same UTC event stream rolled up by
    * LOCAL calendar date in three zones (UTC, a half-hour-offset zone,
    * a negative-offset zone) — the grouping every geo-distributed
    * dashboard needs and the one naive date_trunc silently gets wrong.
    * The conversion is IANA-rule arithmetic on both engines
    * (from_utc_timestamp vs timezone(zone, timezone('UTC', ts))), and
    * the inner timezone('UTC', ...) pins the oracle's interpretation
    * of the naive timestamps regardless of the DuckDB session zone.
    * Map-side expression; one (zone, date) aggregate shuffle. */
  private def x13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .withColumn("zone", explode(array(
        lit("UTC"), lit("Asia/Kolkata"), lit("America/New_York"))))
      .withColumn("local_date", to_date(from_utc_timestamp($"ts", $"zone")))
      .groupBy($"zone", $"local_date")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"zone", $"local_date")
  }
  private val x13Sql =
    """SELECT zone,
         CAST(timezone(zone, timezone('UTC', ts)) AS DATE) AS local_date,
         count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events,
         (VALUES ('UTC'), ('Asia/Kolkata'), ('America/New_York')) z(zone)
       GROUP BY 1, 2 ORDER BY zone, local_date"""

  /** x14 — SALTED TWO-PHASE AGGREGATION: the skew remedy for
    * AGGREGATION keys, which AQE cannot split (OptimizeSkewedJoin
    * slices join partitions, not hash-aggregate groups — the case (b)
    * documented on ScaleOps.saltedJoin). A 3-value group key at 100 TB
    * means 3 reduce tasks own the whole final merge; pre-aggregating
    * on (key, salt-of-a-unique-column) spreads phase one across
    * 16 × |keys| partitions and the phase-two merge touches only
    * |keys| × 16 partial rows. Sums and counts re-aggregate exactly
    * (commutative monoids); AVG is carried as sum/count, never
    * averaged-of-averages. The oracle is the PLAIN aggregate — the
    * gate itself proves the rewrite result-invariant, like x08's salt.
    */
  private def x14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pre = Tables.lineitem(s, d)
      .groupBy($"l_returnflag", pmod(hash($"l_orderkey"), lit(16)).as("_salt"))
      .agg(count(lit(1)).as("pn"), sum($"l_quantity").as("pq"),
        sum($"l_extendedprice").as("pp"))
    pre.groupBy($"l_returnflag")
      .agg(sum($"pn").as("n_lines"),
        round(sum($"pq"), 2).as("sum_qty"),
        round(sum($"pp") / sum($"pn"), 4).as("avg_price"))
      .orderBy($"l_returnflag")
  }
  private val x14Sql =
    """SELECT l_returnflag, count(*) AS n_lines,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice) / count(*), 4) AS avg_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  val queries: Map[String, QueryFn] = Map(
    "x14_salted_agg" -> x14 _,
    "x13_timezone_rollup" -> x13 _,
    "x12_zorder_cluster" -> x12 _,
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
    "x14_salted_agg" -> x14Sql,
    "x13_timezone_rollup" -> x13Sql,
    "x12_zorder_cluster" -> x12Sql,
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
