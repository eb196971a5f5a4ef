package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic temporal join operators — the public library surface behind
  * the e05/e06 driver queries (point-in-time enrichment and interval
  * follow-up joins are the two temporal primitives an event pipeline
  * needs; the reference's closest analog is its per-row "latest note
  * before this statement" lookup loop, mainTesting.py:99-115, which is
  * exactly an as-of join executed one SELECT at a time).
  *
  * Scale design:
  *  - `asofJoin` is the SHUFFLE-ONCE union+carry formulation: both
  *    sides shuffle once on the key, a running max-of-struct window
  *    carries the latest build row forward, and the probe side is kept.
  *    The naive formulation (theta-join on time plus a per-probe argmax)
  *    shuffles the build side per probe row and explodes before it
  *    reduces; this one moves each row exactly once. Window memory is
  *    bounded by Spark's sliding frame (running max over ROWS is O(1)
  *    per row), and at 100 TB each user key's timeline is processed
  *    independently — no global sort.
  *  - `rangeJoin` keeps the equality key as the join's shuffle carrier
  *    and leaves the time range as a codegen'd residual predicate — the
  *    planner never sees a cartesian product (PlanAuditSpec pins this
  *    fleet-wide).
  */
object TemporalJoins {

  /** As-of join: each `probe` row gains the payload of the `build` row
    * with the greatest `buildTime` at-or-before its `probeTime`, per
    * key (null payload columns when no such row exists). Ties on
    * buildTime resolve to the row with the lexicographically largest
    * payload tuple — pass the payload columns in tiebreak-priority
    * order. Output: every probe column, plus `outPrefix`+payload.
    *
    * Column contract: `keys`, the time columns, and `payload` name
    * existing columns; internal scratch columns are "__"-prefixed, so
    * caller schemas must not use that prefix.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTime: String, buildTime: String, payload: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val payExpr = struct(
      (unix_micros(col(buildTime)).as("__bt") +: payload.map(col)): _*)
    val payType = build.select(payExpr.as("p")).schema("p").dataType
    val probeStruct = struct(probe.columns.toSeq.map(col): _*)
    val probeType = probe.select(probeStruct.as("p")).schema("p").dataType
    val pu = probe.select(
      keys.map(col) ++ Seq(col(probeTime).as("__t"),
        lit(1).as("__is_probe"), probeStruct.as("__probe"),
        lit(null).cast(payType).as("__pay")): _*)
    val bu = build.select(
      keys.map(col) ++ Seq(col(buildTime).as("__t"),
        lit(0).as("__is_probe"), lit(null).cast(probeType).as("__probe"),
        payExpr.as("__pay")): _*)
    // build rows sort BEFORE probe rows at equal time (at-or-before
    // semantics include ties); __pay completes a total enough order —
    // build peers with identical (time, payload) are interchangeable
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_probe"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pu.unionAll(bu)
      .withColumn("__last", max(col("__pay")).over(w))
      .filter(col("__is_probe") === 1)
      .select(col("__probe.*") +:
        payload.map(c => col("__last").getField(c).as(outPrefix + c)): _*)
  }

  /** Range (interval) join: `right` rows whose `rightTime` falls in
    * (leftTime + lower, leftTime + upper] of a key-matching `left` row.
    * Caller pre-renames so the two sides share no column names (the
    * join condition references both sides by bare name). */
  def rangeJoin(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      lower: Column, upper: Column, joinType: String = "inner"): DataFrame = {
    val cond = keys.map { case (a, b) => col(a) === col(b) }.reduce(_ && _) &&
      col(rightTime) > col(leftTime) + lower &&
      col(rightTime) <= col(leftTime) + upper
    left.join(right, cond, joinType)
  }
}
