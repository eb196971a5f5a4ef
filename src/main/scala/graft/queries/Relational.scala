package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational surface: scans, projections/filters, joins (equi / theta /
  * semi / anti / cross), aggregations (plain, rollup, cube, pivot), set ops,
  * sorts and top-k. Reference operators covered (SURVEY.md §2): S1-S3, S11,
  * P1/P7/P8, J1-J5, A1/A3/A4, O2/O3, U1/U2/U4, F12.
  *
  * Scale notes (100 TB design intent, verified on .explain):
  *  - every scan carries a pushed filter / pruned schema where the query
  *    allows (PushedFilters on l_shipdate, ReadSchema minimal);
  *  - dim tables (region/nation/customer/supplier/part) are broadcast —
  *    no shuffle of the fact side for q03/q05/q16;
  *  - aggregations are partial+final (HashAggregate pairs) — map-side
  *    combine keeps shuffle volume at |groups|, not |rows|.
  */
object Relational extends QueryModule {

  /** q01 — TPC-H Q1-style pricing summary (SURVEY §2.4: the standard
    * aggregate surface; reference A-ops are degenerate cases of this).
    * Doubles are rounded so Spark's and DuckDB's float summation order
    * cannot flip the last bit of the comparison hash.
    */
  private def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02 23:59:59").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** q02 — top-k (SURVEY §2.6 O3: descending priority scan as top-k).
    * TakeOrderedAndProject: per-partition top-k then driver merge — no
    * full sort of 100 TB, the k rows are the only thing that moves.
    */
  private def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }
  private val q02Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""

  /** q03 — TPC-H Q3-style: two equi-joins + agg + top-k (SURVEY §2.3).
    * customer is broadcast (small dim); orders⋈lineitem shuffles on the
    * join key once and the groupBy reuses that partitioning.
    */
  private def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate".cast("date").as("orderdate"), $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  private val q03Sql =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1997-01-01'
       GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** q04 — EXISTS as left-semi join (SURVEY §2.3/§2.4 A1: existence). */
  private def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).select($"l_orderkey").distinct()
    ord.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }
  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-07-01'
         AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** q05 — TPC-H Q5-style 6-way join through the star schema (SURVEY §2.3
    * J5 generalized). All dims broadcast; single shuffle on l_orderkey.
    */
  private def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val cust = Tables.customer(s, d)
    val supp = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }
  private val q05Sql =
    """SELECT r_name, n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       count(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  /** q06 — TPC-H Q6-style scan+filter+scalar agg; the filters all push
    * into the parquet scan (PushedFilters), so at 100 TB only matching
    * row groups are read.
    */
  private def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
  }
  private val q06Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  /** q07 — ROLLUP (engine extension over reference's flat aggs, SURVEY
    * §2.4 note). Group cols coalesced to a sentinel so Spark/DuckDB null
    * ordering cannot differ.
    */
  private def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
              coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
              $"sum_qty", $"n")
      .orderBy($"returnflag", $"linestatus")
  }
  private val q07Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY returnflag, linestatus"""

  /** q08 — CUBE over orders status×priority. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(sum($"o_totalprice"), 2).as("sum_price"), count(lit(1)).as("n"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
              coalesce($"o_orderpriority", lit("ALL")).as("priority"),
              $"sum_price", $"n")
      .orderBy($"status", $"priority")
  }
  private val q08Sql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY status, priority"""

  /** q09 — anti-join (SURVEY §2.3 J2/J3: the idempotent-load gate).
    * Customers with no pending order: NOT EXISTS as left_anti — the
    * set-algebra form of the reference's per-key SELECT probe
    * (mainTesting.py:704-713).
    */
  private def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
      .filter($"o_orderstatus" === "P").select($"o_custkey")
    cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
  private val q09Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
         WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
       ORDER BY c_custkey"""

  /** q10 — cross-join of run-scoped metadata onto rows (SURVEY §2.3 J4:
    * informasi_tambahan attach, mainTesting.py:58). The 1-row aggregate
    * side is broadcast — a BroadcastNestedLoopJoin that moves one row.
    */
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val meta = Tables.orders(s, d)
      .agg(count(lit(1)).as("total_orders"),
           round(max($"o_totalprice"), 2).as("max_price"))
    Tables.region(s, d)
      .crossJoin(broadcast(meta))
      .select($"r_regionkey", $"r_name", $"total_orders", $"max_price")
      .orderBy($"r_regionkey")
  }
  private val q10Sql =
    """SELECT r_regionkey, r_name, m.total_orders, m.max_price
       FROM region CROSS JOIN (SELECT count(*) AS total_orders,
         round(max(o_totalprice), 2) AS max_price FROM orders) m
       ORDER BY r_regionkey"""

  /** q11 — set ops: INTERSECT / EXCEPT (SURVEY §2.7 note: engine adds
    * them via built-ins). Customers active in 1997 but not 1998.
    */
  private def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, d)
    def activeIn(y: Int) = ord
      .filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
    activeIn(1997).except(activeIn(1998))
      .withColumnRenamed("o_custkey", "custkey")
      .orderBy($"custkey")
  }
  private val q11Sql =
    """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
       EXCEPT
       SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
       ORDER BY custkey"""

  /** q12 — INTERSECT: customers active in both 1997 and 1998. */
  private def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, d)
    def activeIn(y: Int) = ord
      .filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
    activeIn(1997).intersect(activeIn(1998))
      .withColumnRenamed("o_custkey", "custkey")
      .orderBy($"custkey")
  }
  private val q12Sql =
    """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
       INTERSECT
       SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
       ORDER BY custkey"""

  /** q13 — union-all of per-source slices (SURVEY §2.7 U1/U2: pd.concat
    * of per-page/per-file tables) + distinct (U4).
    */
  private def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, d)
    val a = ord.filter($"o_orderstatus" === "F")
      .select($"o_custkey", lit("F").as("bucket"))
    val b = ord.filter($"o_orderstatus" === "O")
      .select($"o_custkey", lit("O").as("bucket"))
    a.unionByName(b).distinct()
      .groupBy($"bucket").agg(count(lit(1)).as("n_custkeys"))
      .orderBy($"bucket")
  }
  private val q13Sql =
    """SELECT bucket, count(*) AS n_custkeys FROM (
         SELECT DISTINCT o_custkey, 'F' AS bucket FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT DISTINCT o_custkey, 'O' AS bucket FROM orders WHERE o_orderstatus = 'O'
       ) GROUP BY bucket ORDER BY bucket"""

  /** q14 — equi-join with a cross-side containment residual (SURVEY §2.3
    * J1: the LIKE-theta fact↔pdf-line join). Catalyst plans the equi part
    * as BroadcastHashJoin (part is the small dim) and evaluates the
    * contains() as a codegen'd residual — exactly the shape the reference
    * runs as an O(lines) remote nested loop (mainTesting.py:99-115).
    */
  private def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val part = Tables.part(s, d)
    li.join(broadcast(part),
        $"l_partkey" === $"p_partkey" &&
        lower($"p_name").contains(lower($"l_returnflag")))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_matches"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"p_brand")
  }
  private val q14Sql =
    """SELECT p_brand, count(*) AS n_matches, sum(l_quantity) AS sum_qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
        AND contains(lower(p_name), lower(l_returnflag))
       GROUP BY p_brand ORDER BY p_brand"""

  /** q15 — KV-sheet pivot to one wide row (SURVEY §2.4 A4: the metadata
    * sheet scan, mainTesting.py:413-431): first()-style min(when(...)).
    */
  private def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def kv(k: String) = round(min(when($"event_type" === k, $"value")), 2)
    Tables.events(s, d).agg(
      kv("click").as("click_min"),
      kv("view").as("view_min"),
      kv("signup").as("signup_min"),
      kv("error").as("error_min"))
  }
  private val q15Sql =
    """SELECT round(min(CASE WHEN event_type = 'click' THEN value END), 2) AS click_min,
       round(min(CASE WHEN event_type = 'view' THEN value END), 2) AS view_min,
       round(min(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup_min,
       round(min(CASE WHEN event_type = 'error' THEN value END), 2) AS error_min
       FROM events"""

  /** q16 — pivot to dynamic columns (SURVEY §2.4 A4 general form).
    * Values enumerated explicitly: no extra distinct-scan job, and the
    * output schema is static — required for both the oracle and any
    * downstream plan compiled before runtime.
    */
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "signup", "purchase", "error")
    val pivoted = Tables.events(s, d)
      .withColumn("user_bucket", $"user_id" % 10)
      .groupBy($"user_bucket")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy($"user_bucket")
  }
  private val q16Sql =
    """SELECT user_id % 10 AS user_bucket,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
       FROM events GROUP BY user_id % 10 ORDER BY user_bucket"""

  /** q17 — split+explode (SURVEY §2.7 U3: comma-split note refs →
    * extra rows, mainTesting.py:127-149). Generator (explode) over
    * split(); stays inside whole-stage codegen.
    */
  private def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_partkey", explode(split($"p_name", " ")).as("word"))
      .orderBy($"p_partkey", $"word")
  }
  private val q17Sql =
    """SELECT * FROM (
         SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part
       ) ORDER BY p_partkey, word"""

  /** q18 — existence flag per group (SURVEY §2.4 A1: fetchone()→bool). */
  private def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg((count(when($"o_orderstatus" === "F", 1)) > 0).as("has_f_order"),
           count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }
  private val q18Sql =
    """SELECT o_custkey,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) > 0 AS has_f_order,
       count(*) AS n_orders
       FROM orders GROUP BY o_custkey ORDER BY o_custkey"""

  /** q19 — conditional unit scaling (SURVEY §2.8 F12: ×1e6 for Q1–Q3
    * filings, full units for Q4 — mainTesting.py:55-57 with :428-429).
    * Expressed over orders: quarter-4 rows keep raw price, others scale.
    * Scale factor kept at 1e3 so the double sum stays < 2^53 at large
    * SF (exact integer cents → order-independent summation).
    */
  private def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("q", quarter($"o_orderdate").cast("long"))
      .withColumn("nilai",
        when($"q" =!= 4, round($"o_totalprice" * 1000.0, 2))
          .otherwise(round($"o_totalprice", 2)))
      .groupBy($"q")
      .agg(round(sum($"nilai"), 2).as("sum_scaled"), count(lit(1)).as("n"))
      .orderBy($"q")
  }
  private val q19Sql =
    """SELECT quarter(o_orderdate) AS q,
       round(sum(CASE WHEN quarter(o_orderdate) <> 4
         THEN round(o_totalprice * 1000.0, 2)
         ELSE round(o_totalprice, 2) END), 2) AS sum_scaled,
       count(*) AS n
       FROM orders GROUP BY quarter(o_orderdate) ORDER BY q"""

  /** q20 — idempotent-load gate end-to-end (SURVEY §2.3 J2 as the
    * reference uses it: probe existing keys, load only new rows —
    * mainTesting.py:693-729). "Existing" = 1997 buyers; "incoming" =
    * 1998 orders; loaded = incoming from customers not already present.
    */
  private def q20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, d)
    val existing = ord.filter(year($"o_orderdate") === 1997)
      .select($"o_custkey").distinct()
    val incoming = ord.filter(year($"o_orderdate") === 1998)
    incoming.join(existing.withColumnRenamed("o_custkey", "e_custkey"),
        $"o_custkey" === $"e_custkey", "left_anti")
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("totalprice"))
      .orderBy($"o_orderkey")
  }
  private val q20Sql =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
       FROM orders
       WHERE year(o_orderdate) = 1998
         AND o_custkey NOT IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
       ORDER BY o_orderkey"""

  /** q21 — TPC-H Q21 shape (suppliers who kept orders waiting): for
    * each multi-supplier order, find the supplier whose lines were the
    * ONLY delayed ones (shipdate > orderdate + 90 days) — the classic
    * EXISTS + NOT EXISTS double-correlation, rewritten as two
    * order-level aggregates joined back (the form Catalyst plans as
    * hash joins; the correlated original would be a per-row subquery).
    * Scale: one fact shuffle on l_orderkey computes both the per-
    * (order, supplier) delay flag and the per-order supplier/delay
    * counts; everything after is order-cardinality.
    */
  private def q21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate".cast("date") >
          date_add($"o_orderdate".cast("date"), 90)).as("delayed"))
    val perSupp = li.groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"delayed").as("supp_delayed"))
    val perOrder = perSupp.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum($"supp_delayed".cast("long")).as("n_delayed"))
    val waiting = perSupp.filter($"supp_delayed")
      .join(perOrder.filter($"n_supp" >= 2 && $"n_delayed" === 1), "l_orderkey")
    waiting.groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }
  private val q21Sql =
    """WITH li AS (
         SELECT l_orderkey, l_suppkey,
           CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS delayed
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       per_supp AS (
         SELECT l_orderkey, l_suppkey, max(delayed) AS supp_delayed
         FROM li GROUP BY 1, 2),
       per_order AS (
         SELECT l_orderkey, count(*) AS n_supp,
           sum(CASE WHEN supp_delayed THEN 1 ELSE 0 END) AS n_delayed
         FROM per_supp GROUP BY 1)
       SELECT s_name, count(*) AS numwait
       FROM per_supp
       JOIN per_order USING (l_orderkey)
       JOIN supplier ON l_suppkey = s_suppkey
       WHERE supp_delayed AND n_supp >= 2 AND n_delayed = 1
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""

  /** q22 — TPC-H Q22 shape (promising idle customers): customers whose
    * balance beats the average POSITIVE balance and who placed no
    * order in the latest year (1998), rolled up by nation. The
    * global-average scalar broadcasts; the "no recent orders" test is
    * a left anti-join (never NOT IN's null-trap); output is
    * nation-cardinality.
    */
  private def q22(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter($"c_acctbal" > 0)
      .agg(avg($"c_acctbal").as("avg_bal"))
    val idle = cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(Tables.orders(s, d).filter(year($"o_orderdate") === 1998)
          .select($"o_custkey").distinct(),
        $"c_custkey" === $"o_custkey", "left_anti")
    idle.groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_custs"),
        round(sum($"c_acctbal"), 2).as("total_bal"))
      .orderBy($"c_nationkey")
  }
  private val q22Sql =
    """SELECT c_nationkey, count(*) AS n_custs,
         round(sum(c_acctbal), 2) AS total_bal
       FROM customer
       WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
         AND c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE year(o_orderdate) = 1998)
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** q23 — UNPIVOT (melt): wide measure columns rotated to long
    * (measure, value) rows through the native `Dataset.unpivot` API —
    * the inverse of q15/q16's pivots and the exact wide→long
    * normalization the reference performs on financial statements
    * (SURVEY §1's long-format fact model). Unpivot is a map-side
    * expression (Spark plans an Expand), so the rotation adds zero
    * shuffles; the aggregate after it is the usual one exchange.
    */
  private def q23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
        $"l_discount", $"l_tax")
      .unpivot(
        ids = Array($"l_orderkey"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy($"measure")
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("total"),
        round(avg($"value"), 6).as("mean"))
      .orderBy($"measure")
  }
  private val q23Sql =
    """SELECT measure, count(*) AS n, round(sum(value), 2) AS total,
         round(avg(value), 6) AS mean
       FROM (
         SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
       GROUP BY measure ORDER BY measure"""

  /** q24 — GLOBAL VALUE-SHARE threshold (the TPC-H Q11 shape): parts
    * whose revenue from a nation subset exceeds a FRACTION OF THE
    * GLOBAL TOTAL — a correlated scalar aggregate over the whole fact
    * table. Distributed form: the global total is ONE scalar row,
    * computed by reusing the per-part aggregate (no second fact-table
    * pass) and broadcast into every partition via a crossJoin — the
    * scalar-subquery pattern that at 100 TB costs one extra
    * all-to-one-row reduction instead of a second corpus scan or a
    * shuffle. Revenue stays in exact integer cents until the final
    * display division, so the > comparison is integer-exact in both
    * engines (no float threshold flapping on the boundary part). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter($"n_name".isin(
        "NATION_1", "NATION_2", "NATION_3"))), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val byPart = Tables.lineitem(s, d)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey".as("partkey"))
      .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
        .cast("long")).as("cents"))
    // byPart feeds BOTH the scalar total and the final filter; persist
    // (eager, |parts|-sized) so the fact-table scan+join+agg runs once —
    // unpersisted, the broadcast-total stage re-executes the whole DAG
    byPart.persist().count()
    val total = byPart.agg(sum($"cents").as("total_cents"))
    byPart.crossJoin(broadcast(total))
      // threshold: part's share > 0.05% of the subset's global revenue
      // — integer comparison: cents * 10000 > 5 * total_cents
      .filter($"cents" * 10000L > lit(5L) * $"total_cents")
      .select($"partkey", $"cents",
        round($"cents".cast("double") / 100.0, 2).as("revenue"),
        round($"cents" * lit(1000000L).cast("double") / $"total_cents", 2)
          .as("share_ppm"))
      .orderBy($"cents".desc, $"partkey")
  }
  private val q24Sql =
    """WITH sup AS (
         SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')),
       by_part AS (
         SELECT l_partkey AS partkey,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
             AS BIGINT)) AS BIGINT) AS cents
         FROM lineitem JOIN sup ON l_suppkey = s_suppkey
         GROUP BY l_partkey),
       total AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM by_part)
       SELECT partkey, cents,
         round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
         round(CAST(cents * 1000000 AS DOUBLE) / total_cents, 2) AS share_ppm
       FROM by_part, total
       WHERE cents * 10000 > 5 * total_cents
       ORDER BY cents DESC, partkey"""

  val queries: Map[String, QueryFn] = Map(
    "q23_unpivot" -> q23 _,
    "q21_waiting_suppliers" -> q21 _,
    "q22_idle_customers" -> q22 _,
    "q24_value_share" -> q24 _,
    "q01_pricing_summary" -> q01 _,
    "q02_topk_orders" -> q02 _,
    "q03_shipping_priority" -> q03 _,
    "q04_semi_join_exists" -> q04 _,
    "q05_star_join_revenue" -> q05 _,
    "q06_scan_filter_agg" -> q06 _,
    "q07_rollup" -> q07 _,
    "q08_cube" -> q08 _,
    "q09_anti_join" -> q09 _,
    "q10_cross_join_meta" -> q10 _,
    "q11_except" -> q11 _,
    "q12_intersect" -> q12 _,
    "q13_union_distinct" -> q13 _,
    "q14_contains_theta_join" -> q14 _,
    "q15_kv_pivot" -> q15 _,
    "q16_pivot_dynamic" -> q16 _,
    "q17_split_explode" -> q17 _,
    "q18_existence_flag" -> q18 _,
    "q19_unit_scaling" -> q19 _,
    "q20_idempotent_load" -> q20 _,
  )

  val oracle: Map[String, String] = Map(
    "q23_unpivot" -> q23Sql,
    "q21_waiting_suppliers" -> q21Sql,
    "q22_idle_customers" -> q22Sql,
    "q24_value_share" -> q24Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_topk_orders" -> q02Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_semi_join_exists" -> q04Sql,
    "q05_star_join_revenue" -> q05Sql,
    "q06_scan_filter_agg" -> q06Sql,
    "q07_rollup" -> q07Sql,
    "q08_cube" -> q08Sql,
    "q09_anti_join" -> q09Sql,
    "q10_cross_join_meta" -> q10Sql,
    "q11_except" -> q11Sql,
    "q12_intersect" -> q12Sql,
    "q13_union_distinct" -> q13Sql,
    "q14_contains_theta_join" -> q14Sql,
    "q15_kv_pivot" -> q15Sql,
    "q16_pivot_dynamic" -> q16Sql,
    "q17_split_explode" -> q17Sql,
    "q18_existence_flag" -> q18Sql,
    "q19_unit_scaling" -> q19Sql,
    "q20_idempotent_load" -> q20Sql,
  )
}
