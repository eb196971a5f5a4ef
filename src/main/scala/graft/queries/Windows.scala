package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Window / sequence operators (SURVEY.md §2.5-2.6).
  *
  * The reference's core sequence idioms re-expressed declaratively:
  *  - W1 lookahead over ordered lines (mainTesting.py:124,152) → `lead`;
  *  - W2 contiguous-run / gaps-and-islands (mainTesting.py:231-238) →
  *    `lag` gap flag + running sum island id;
  *  - W4 forward repair (mainTesting.py:648-658) → frame-bound aggregates;
  * plus the standard ranking/running-total surface the reference lacks.
  *
  * Scale notes: every window here is `partitionBy(user|custkey)` — state
  * for one key fits one task, no global sort. The one deliberate
  * exception (w08 global ranking) is documented inline: a single-key
  * window is the known scale hazard, at 100 TB it must be re-keyed
  * (range-partitioned two-pass rank) — flagged in its scaladoc.
  */
object Windows extends QueryModule {

  /** w01 — lookahead 1/2 (SURVEY §2.5 W1: is the next line a note ref?).
    * Here: for each purchase event, the next and next-next event type of
    * the same user. Partition-local — no shuffle beyond the user hash.
    */
  private def w01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .withColumn("next2_type", lead($"event_type", 2).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"next_type", $"next2_type")
      .orderBy($"event_id")
  }
  private val w01Sql =
    """SELECT event_id, user_id, next_type, next2_type FROM (
         SELECT event_id, user_id, event_type,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next2_type
         FROM events)
       WHERE event_type = 'purchase' ORDER BY event_id"""

  /** w02 — gaps-and-islands (SURVEY §2.5 W2: contiguous page runs).
    * Sessions: a >30-min gap between a user's consecutive events starts a
    * new island; running sum of gap flags is the island id. Two stacked
    * windows over the same (user_id | ts) ordering — Catalyst evaluates
    * both in one Window exec pass, one shuffle total.
    */
  private def w02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("gap_us", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_island", when($"gap_us".isNull || $"gap_us" > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("island", sum($"new_island").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id")
      .agg(max($"island").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }
  private val w02Sql =
    """SELECT user_id, max(island) AS n_sessions, count(*) AS n_events FROM (
         SELECT user_id, CAST(sum(new_island) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
         FROM (
           SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) > 30*60*1000000
                  OR lag(epoch_us(ts), 1) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_island
           FROM events))
       GROUP BY user_id ORDER BY user_id"""

  /** w03 — ranking trio per group (engine extension, SURVEY §2.5 note:
    * reference has no ranking). Top-3 orders per customer by price;
    * deterministic total order via the (price DESC, orderkey) tiebreak.
    */
  private def w03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("price"),
        $"rn", $"rnk", $"drnk")
      .orderBy($"o_custkey", $"rn")
  }
  private val w03Sql =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn, rnk, drnk FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
       WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** w04 — running total (engine extension): cumulative spend per
    * customer in order-date order. Rounded per-row so the two engines'
    * identical left-to-right accumulation order hashes identically.
    */
  private def w04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("cum_spend", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey", $"cum_spend")
      .orderBy($"o_custkey", $"o_orderkey")
  }
  private val w04Sql =
    """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
       FROM orders ORDER BY o_custkey, o_orderkey"""

  /** w05 — lag delta (SURVEY §2.5 W1's mirror): change in event value vs
    * the user's previous event.
    */
  private def w05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("delta", round($"value" - lag($"value", 1).over(w), 2))
      .filter($"delta".isNotNull)
      .select($"event_id", $"user_id", $"delta")
      .orderBy($"event_id")
  }
  private val w05Sql =
    """SELECT event_id, user_id, delta FROM (
         SELECT event_id, user_id,
           round(value - lag(value, 1) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
         FROM events)
       WHERE delta IS NOT NULL ORDER BY event_id"""

  /** w06 — carry-forward over an unbounded-preceding frame (SURVEY §2.5
    * W3(a)/W4: "segment id = last heading seen so far"). Here: each
    * event carries the timestamp of the user's most recent error.
    * max(CASE) is used instead of last(…, ignoreNulls) so the oracle SQL
    * is engine-neutral; semantics are identical for a monotone orderBy.
    */
  private def w06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("last_error_ts", max(when($"event_type" === "error", $"ts")).over(w))
      .select($"event_id", $"user_id", $"event_type", $"last_error_ts")
      .orderBy($"event_id")
  }
  private val w06Sql =
    """SELECT event_id, user_id, event_type,
         max(CASE WHEN event_type = 'error' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
       FROM events ORDER BY event_id"""

  /** w07 — moving average over an explicit row frame (engine extension:
    * frame specs, absent from the reference).
    */
  private def w07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-3, Window.currentRow)
    Tables.events(s, d)
      .withColumn("mavg", round(avg($"value").over(w), 4))
      .select($"event_id", $"user_id", $"mavg")
      .orderBy($"event_id")
  }
  private val w07Sql =
    """SELECT event_id, user_id,
         round(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg
       FROM events ORDER BY event_id"""

  /** w08 — global distribution ranking: ntile / percent_rank / cume_dist
    * over ALL orders by price. Deliberately a single-partition window —
    * the canonical scale hazard, kept as the readable baseline. w09 is
    * the same result through the two-pass range-partitioned formulation
    * (sample → range bounds → per-range rank + offset) that holds at
    * 100 TB; both share one oracle and a spec asserts row equality.
    * The deterministic total order (price, orderkey) makes ties stable.
    */
  private def w08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .select($"o_orderkey", $"quartile", $"pct_rank", $"cume")
      .orderBy($"o_orderkey")
  }
  private val w08Sql =
    """SELECT o_orderkey, quartile, pct_rank, cume FROM (
         SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
         FROM orders
         WINDOW w AS (ORDER BY o_totalprice, o_orderkey))
       ORDER BY o_orderkey"""

  /** w09 — w08 without the single-partition window: the scalable global
    * rank. Pass 0 samples range bounds on the leading sort key
    * (approxQuantile — any price-monotone bucketing yields IDENTICAL
    * ranks; bounds only balance work, so sampling error cannot affect
    * the result). Pass 1 counts rows per range — a tiny aggregate whose
    * exclusive prefix sum (a window over |ranges| rows, not |rows|)
    * gives each range its global rank offset. Pass 2 ranks within each
    * range in parallel and adds the offset. (price, orderkey) is a total
    * order with no ties, so rank = row_number and
    * percent_rank/cume_dist/ntile are closed-form in (rn, n).
    */
  private def w09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, d).select($"o_orderkey", $"o_totalprice")
    val bounds = ord.stat
      .approxQuantile("o_totalprice", (1 until 32).map(_ / 32.0).toArray, 0.001)
      .distinct.sorted
    val boundsCol = array(bounds.map(lit).toIndexedSeq: _*)
    // range id = #bounds strictly below the price: monotone in price, so
    // every range's rows sort entirely before the next range's
    val bucketed = ord.withColumn("bkt",
      aggregate(boundsCol, lit(0), (acc, b) => acc + ($"o_totalprice" > b).cast("int")))
    val counts = bucketed.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
    val wB = Window.orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)
    // |ranges| rows — this single-partition window is over ~32 rows
    val offsets = counts
      .withColumn("off", coalesce(sum($"cnt").over(wB), lit(0L)))
    val total = counts.agg(sum($"cnt").as("n"))
    val wL = Window.partitionBy($"bkt").orderBy($"o_totalprice", $"o_orderkey")
    bucketed.join(broadcast(offsets), "bkt")
      .withColumn("rn", $"off" + row_number().over(wL))
      .crossJoin(broadcast(total))
      .withColumn("q", expr("n div 4")).withColumn("r", $"n" % 4)
      // ntile(4): first r tiles hold q+1 rows, the rest q
      .withColumn("quartile", expr(
        """CAST(CASE WHEN rn <= r * (q + 1) THEN (rn + q) div (q + 1)
                     ELSE r + (rn - r * (q + 1) + q - 1) div q END AS BIGINT)"""))
      .withColumn("pct_rank",
        when($"n" === 1, lit(0.0)).otherwise(round(($"rn" - 1) / ($"n" - 1), 6)))
      .withColumn("cume", round($"rn" / $"n", 6))
      .select($"o_orderkey", $"quartile", $"pct_rank", $"cume")
      .orderBy($"o_orderkey")
  }

  /** w10 — distribution window trio (percent_rank / cume_dist /
    * ntile): where each order's price sits within its priority class —
    * the percentile-normalization shape behind score calibration and
    * quota assignment. Partitioned by o_orderpriority (bounded
    * per-partition sort); the GLOBAL single-ordering variant of this
    * family is exactly what w09's two-pass range-partitioned rank is
    * for — compose these with w09's layout at 100 TB when no partition
    * key exists. Deterministic total order via the (price, orderkey)
    * tiebreak; fractional outputs rounded at 6. */
  private def w10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select($"o_orderpriority", $"o_orderkey",
        round($"o_totalprice", 2).as("price"),
        $"pct_rank", $"cume", $"quartile")
      .orderBy($"o_orderpriority", $"o_orderkey")
  }
  private val w10Sql =
    """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderpriority, o_orderkey"""

  /** w11 — the stock top-k window idiom, WRITTEN as row_number-filter-
    * drop and EXECUTED as the TopKPerKey operator: RankToTopKRule (see
    * plans/RankToTopKRule.scala) rewrites this plan because the rank
    * column is dead after the filter. Same data as w03's top-3 but
    * through the optimizer path — the oracle re-derives the answer with
    * the window formulation, so the gate proves the rewrite is
    * result-identical, and RankRewriteSpec asserts the physical plan
    * actually contains TopKPerKeyFinal (no silent fallback to Window).
    */
  private def w11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .drop("rn")
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("price"))
      .orderBy($"o_custkey", $"price".desc, $"o_orderkey")
  }
  private val w11Sql =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price FROM (
         SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders)
       WHERE rn <= 3 ORDER BY o_custkey, price DESC, o_orderkey"""

  /** w12 — time-series GAP FILL (dense resample): hourly event counts
    * per event type on a gapless hour axis — hours with no events
    * appear with n = 0 (the resample-then-fill step every downstream
    * charting/forecasting consumer needs, and the inverse of what a
    * plain groupBy gives, which silently drops empty buckets).
    * Scale design: the dense axis is generated from the 1-row global
    * [min, max] span (a broadcast scalar), cross-joined with the tiny
    * distinct-type set, and LEFT-joined to the hourly aggregate — the
    * only full-data pass is the aggregate itself (one shuffle of
    * (hour, type) partials); the fill join touches |hours x types|
    * rows, which is calendar-sized, not data-sized, at any corpus
    * scale.
    */
  private def w12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_raw"))
    val span = Tables.events(s, d)
      .agg(date_trunc("hour", min($"ts")).as("h0"), date_trunc("hour", max($"ts")).as("h1"))
    val axis = span.select(explode(sequence($"h0", $"h1", expr("INTERVAL '1' HOUR"))).as("hour"))
    val types = Tables.events(s, d).select($"event_type").distinct()
    axis.crossJoin(broadcast(types))
      .join(hourly, Seq("hour", "event_type"), "left")
      .select($"hour", $"event_type", coalesce($"n_raw", lit(0L)).as("n"))
      .orderBy($"hour", $"event_type")
  }
  private val w12Sql =
    """WITH span AS (
         SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
         FROM events),
       axis AS (
         SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span),
       types AS (SELECT DISTINCT event_type FROM events),
       hourly AS (
         SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_raw
         FROM events GROUP BY 1, 2)
       SELECT a.hour, t.event_type, COALESCE(n_raw, 0) AS n
       FROM axis a CROSS JOIN types t
       LEFT JOIN hourly h ON h.hour = a.hour AND h.event_type = t.event_type
       ORDER BY a.hour, t.event_type"""

  /** w13 — time-RANGE window frame (value-based, not row-based): per
    * user, how many of their events fall in the sliding hour ENDING at
    * each event — the rate-limiting / burst-detection primitive. A
    * RANGE frame is bounded by the ORDER column's VALUE (here epoch
    * micros, so ties and irregular spacing are handled by definition),
    * where the rows-frame w07 uses counts; this is the other half of
    * Spark's frame semantics, exercised over microsecond-exact event
    * time. One shuffle on user_id; frames never cross users.
    */
  private def w13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy(expr("unix_micros(ts)"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .select($"event_id", $"user_id", $"ts", $"n_last_hour")
      .orderBy($"event_id")
  }
  private val w13Sql =
    """SELECT event_id, user_id, ts,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           AS n_last_hour
       FROM events ORDER BY event_id"""

  /** w14 — LINEAR INTERPOLATION over time-series gaps (w12's dense
    * axis, upgraded from zero-fill to value estimation): hourly value
    * sums per event type, with missing hours filled by the straight
    * line between the nearest known points (edges carry the single
    * known neighbor). The carry windows are the ignore-nulls
    * last/first over the calendar-sized axis — each partition is one
    * type's hour series, so the sort is calendar-sized however big the
    * corpus; the only full-data pass is the hourly aggregate. Both
    * engines compute the interpolation in the same expression order on
    * the same rounded base series, so the gate checks the arithmetic
    * exactly.
    */
  private def w14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(round(sum($"value"), 2).as("v"))
    val span = Tables.events(s, d)
      .agg(date_trunc("hour", min($"ts")).as("h0"),
        date_trunc("hour", max($"ts")).as("h1"))
    val axis = span.select(explode(
      sequence($"h0", $"h1", expr("INTERVAL '1' HOUR"))).as("hour"))
    val types = Tables.events(s, d).select($"event_type").distinct()
    val grid = axis.crossJoin(broadcast(types))
      .join(hourly, Seq("hour", "event_type"), "left")
    val known = when($"v".isNotNull, struct($"hour", $"v"))
    val wPrev = Window.partitionBy($"event_type").orderBy($"hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy($"event_type").orderBy($"hour")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // Interpolation in INTEGER cent·microsecond space (the g01/s13
    // determinism discipline): a double formulation hit the classic
    // cross-engine round() midpoint split — Spark rounds the shortest
    // decimal form of the double (10.63375 → 10.6338) where DuckDB
    // rounds its binary value (10.633749999… → 10.6337). Here the
    // line value is the exact rational (pc·DT + (nc−pc)·dt) / DT in
    // cents, rounded HALF-UP to 1e-4 units by explicit integer
    // arithmetic ((200n + D) div 2D, valid for the non-negative sums
    // this series carries), so both engines produce the identical
    // 1e-4-unit integer and the final /1e4 double is bit-equal.
    grid
      .withColumn("p", last(known, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(known, ignoreNulls = true).over(wNext))
      .withColumn("v_interp",
        when($"v".isNotNull, $"v")
          .when($"p".isNull, $"nx.v")
          .when($"nx".isNull, $"p.v")
          .otherwise(expr(
            """CAST((200 * (CAST(round(p.v * 100) AS BIGINT)
               |         * (unix_micros(nx.hour) - unix_micros(p.hour))
               |       + (CAST(round(nx.v * 100) AS BIGINT)
               |          - CAST(round(p.v * 100) AS BIGINT))
               |         * (unix_micros(hour) - unix_micros(p.hour)))
               |      + (unix_micros(nx.hour) - unix_micros(p.hour)))
               |  div (2 * (unix_micros(nx.hour) - unix_micros(p.hour)))
               |  AS DOUBLE) / 10000.0""".stripMargin)))
      .select($"hour", $"event_type", $"v_interp", $"v".isNull.as("filled"))
      .orderBy($"hour", $"event_type")
  }
  private val w14Sql =
    """WITH span AS (
         SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
         FROM events),
       axis AS (
         SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span),
       types AS (SELECT DISTINCT event_type FROM events),
       hourly AS (
         SELECT date_trunc('hour', ts) AS hour, event_type,
           round(sum(value), 2) AS v
         FROM events GROUP BY 1, 2),
       grid AS (
         SELECT a.hour, t.event_type, v
         FROM axis a CROSS JOIN types t
         LEFT JOIN hourly h ON h.hour = a.hour AND h.event_type = t.event_type),
       carried AS (
         SELECT hour, event_type, v,
           last_value(v IGNORE NULLS) OVER wp AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS) OVER wp AS ph,
           first_value(v IGNORE NULLS) OVER wn AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS) OVER wn AS nh
         FROM grid
         WINDOW wp AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                wn AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       SELECT hour, event_type,
         CASE WHEN v IS NOT NULL THEN v
              WHEN pv IS NULL THEN nv
              WHEN nv IS NULL THEN pv
              ELSE CAST((200 * (CAST(round(pv * 100) AS BIGINT)
                                  * (epoch_us(nh) - epoch_us(ph))
                                + (CAST(round(nv * 100) AS BIGINT)
                                   - CAST(round(pv * 100) AS BIGINT))
                                  * (epoch_us(hour) - epoch_us(ph)))
                         + (epoch_us(nh) - epoch_us(ph)))
                     // (2 * (epoch_us(nh) - epoch_us(ph)))
                     AS DOUBLE) / 10000.0
         END AS v_interp,
         v IS NULL AS filled
       FROM carried ORDER BY hour, event_type"""

  /** w15 — EXPONENTIAL MOVING AVERAGE over each customer's daily spend
    * (the trend-smoothing pass behind anomaly detection and
    * forecasting features). EWMA is a recursion (s_t = α·x_t +
    * (1−α)·s_{t−1}) no SQL window expresses directly; with α = 1/2 the
    * unrolled weights are powers of two, so an 8-point truncated EWMA
    * is a FINITE weighted sum whose numerator and denominator are
    * exact BIGINTs: num = Σ_{k=0..7} cents_{t−k}·2^{7−k} over the lags
    * that exist, den = Σ of the same 2^{7−k} — the truncation error
    * (≤ 1/256 of mass) is the standard warm-up convention. One
    * partitioned window, eight lag() reads sharing a single sort —
    * partitioned by customer, so at 100 TB it parallelizes per key
    * with no global sort (w08/w09 cover the global case). The division
    * is ONE IEEE op over two exact integers — bit-identical across
    * engines, the g01/w14 determinism discipline. */
  private def w15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, d)
      .groupBy($"o_custkey".as("custkey"),
        // cast to DATE: DuckDB's date_trunc('day') yields DATE, Spark's
        // a midnight timestamp — align the physical type for the gate
        date_trunc("day", $"o_orderdate").cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"custkey").orderBy($"day")
    val num = (0 to 7).map(k =>
        coalesce(lag($"cents", k).over(w), lit(0L)) * lit(1L << (7 - k)))
      .reduce(_ + _)
    val den = (0 to 7).map(k =>
        when(lag($"cents", k).over(w).isNotNull, lit(1L << (7 - k)))
          .otherwise(lit(0L)))
      .reduce(_ + _)
    daily
      .withColumn("ewma_num", num)
      .withColumn("ewma_den", den)
      .withColumn("ewma_cents",
        ($"ewma_num".cast("double") / $"ewma_den".cast("double")))
      .select($"custkey", $"day", $"cents", $"ewma_num", $"ewma_den",
        $"ewma_cents")
      .orderBy($"custkey", $"day")
  }
  private val w15Sql =
    """WITH daily AS (
         SELECT o_custkey AS custkey, date_trunc('day', o_orderdate) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY 1, 2),
       lagged AS (
         SELECT custkey, day, cents,
           lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
           lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
           lag(cents, 5) OVER w AS c5, lag(cents, 6) OVER w AS c6,
           lag(cents, 7) OVER w AS c7
         FROM daily
         WINDOW w AS (PARTITION BY custkey ORDER BY day))
       SELECT custkey, day, cents,
         CAST(128 * cents + 64 * coalesce(c1, 0) + 32 * coalesce(c2, 0)
            + 16 * coalesce(c3, 0) + 8 * coalesce(c4, 0)
            + 4 * coalesce(c5, 0) + 2 * coalesce(c6, 0)
            + coalesce(c7, 0) AS BIGINT) AS ewma_num,
         CAST(128 + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
            + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
            + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
            + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
            + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
            + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
            + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS ewma_den,
         CAST(128 * cents + 64 * coalesce(c1, 0) + 32 * coalesce(c2, 0)
            + 16 * coalesce(c3, 0) + 8 * coalesce(c4, 0)
            + 4 * coalesce(c5, 0) + 2 * coalesce(c6, 0)
            + coalesce(c7, 0) AS DOUBLE)
         / CAST(128 + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
            + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
            + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
            + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
            + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
            + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
            + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END AS DOUBLE) AS ewma_cents
       FROM lagged ORDER BY custkey, day"""

  /** w16 — ROLLING Z-SCORE anomaly flags over each customer's daily
    * spend (the detection pass w15's smoothing feeds): each day is
    * scored against the trailing 8-day window (current day EXCLUDED —
    * a point must not normalize itself). All moments stay in exact
    * BIGINT cent arithmetic: with frame count n, sum s1, sum of
    * squares s2, the population z-score is algebraically
    * (n·x − s1) / sqrt(n·(n·s2 − s1²)) — numerator and the two radical
    * factors are exact integers (bounded ~1e17, no overflow), so the
    * only IEEE ops are one sqrt and one division, bit-identical across
    * engines (the w15/g01 determinism discipline). Days with fewer
    * than 4 priors or zero variance are unscored warm-up, filtered.
    * Partitioned by customer — parallel per key at any scale, no
    * global sort. Flag at |z| > 2. */
  private def w16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, d)
      .groupBy($"o_custkey".as("custkey"),
        date_trunc("day", $"o_orderdate").cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"custkey").orderBy($"day")
      .rowsBetween(-8, -1)
    daily
      .withColumn("n", count($"cents").over(w))
      .withColumn("s1", sum($"cents").over(w))
      .withColumn("s2", sum($"cents" * $"cents").over(w))
      .filter($"n" >= 4 && $"n" * $"s2" > $"s1" * $"s1")
      .withColumn("z",
        ($"n" * $"cents" - $"s1").cast("double") /
          sqrt(($"n" * ($"n" * $"s2" - $"s1" * $"s1")).cast("double")))
      .select($"custkey", $"day", $"cents", $"n".as("n_prior"),
        round($"z", 6).as("z"), (abs($"z") > 2.0).as("is_anomaly"))
      .orderBy($"custkey", $"day")
  }
  private val w16Sql =
    """WITH daily AS (
         SELECT o_custkey AS custkey, date_trunc('day', o_orderdate) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM orders GROUP BY 1, 2),
       m AS (
         SELECT custkey, day, cents,
           count(cents) OVER w AS n,
           sum(cents) OVER w AS s1,
           sum(cents * cents) OVER w AS s2
         FROM daily
         WINDOW w AS (PARTITION BY custkey ORDER BY day
                      ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
       scored AS (
         SELECT custkey, day, cents, n AS n_prior,
           CAST(n * cents - s1 AS DOUBLE)
             / sqrt(CAST(n * (n * s2 - s1 * s1) AS DOUBLE)) AS z
         FROM m WHERE n >= 4 AND n * s2 > s1 * s1)
       SELECT custkey, day, cents, n_prior, round(z, 6) AS z,
         abs(z) > 2.0 AS is_anomaly
       FROM scored ORDER BY custkey, day"""

  val queries: Map[String, QueryFn] = Map(
    "w16_zscore_anomaly" -> w16 _,
    "w15_ewma" -> w15 _,
    "w14_interpolate" -> w14 _,
    "w13_range_frame" -> w13 _,
    "w12_gap_fill" -> w12 _,
    "w11_topk_rewrite" -> w11 _,
    "w01_lead_lookahead" -> w01 _,
    "w10_distribution" -> w10 _,
    "w02_gaps_islands" -> w02 _,
    "w03_ranking_topk" -> w03 _,
    "w04_running_total" -> w04 _,
    "w05_lag_delta" -> w05 _,
    "w06_carry_forward" -> w06 _,
    "w07_moving_avg" -> w07 _,
    "w08_global_rank" -> w08 _,
    "w09_distributed_rank" -> w09 _,
  )

  val oracle: Map[String, String] = Map(
    "w16_zscore_anomaly" -> w16Sql,
    "w15_ewma" -> w15Sql,
    "w14_interpolate" -> w14Sql,
    "w13_range_frame" -> w13Sql,
    "w12_gap_fill" -> w12Sql,
    "w11_topk_rewrite" -> w11Sql,
    "w01_lead_lookahead" -> w01Sql,
    "w10_distribution" -> w10Sql,
    "w02_gaps_islands" -> w02Sql,
    "w03_ranking_topk" -> w03Sql,
    "w04_running_total" -> w04Sql,
    "w05_lag_delta" -> w05Sql,
    "w06_carry_forward" -> w06Sql,
    "w07_moving_avg" -> w07Sql,
    "w08_global_rank" -> w08Sql,
    // same oracle as w08: the two formulations must agree exactly
    "w09_distributed_rank" -> w08Sql,
  )
}
