package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse dimension modeling over change streams — the serving-side
  * counterpart of the reference's per-filing metadata loads
  * (mainTesting.py:413-431 probes entity attributes per quarter; a
  * warehouse keeps their HISTORY). */
object Dimensions {

  /** Type-2 slowly-changing-dimension build: collapse a change-record
    * stream into validity intervals per key.
    *
    * Input: one row per observed state (`keys`, `ts`, `attrs`, plus a
    * `tieBreak` column ordering same-instant observations — latest
    * wins). Output: one row per state CHANGE, with `valid_from` = the
    * change's `ts`, `valid_to` = the next change's `ts` (null on the
    * open interval), and `is_current` flagging it. Consecutive equal
    * states merge into one interval; attr comparison is null-safe via
    * a struct `<=>`, so a null attribute value is a state like any
    * other, not a wildcard.
    *
    * Scale: every window partitions by `keys` — state per key, never a
    * global window — so the whole build is ONE hash exchange on the
    * key (the three sorts over it are in-partition) and parallelism is
    * key cardinality. At 100 TB this is the shape that works: dimension
    * history is built per entity, and a skewed entity degrades only its
    * own partition.
    */
  def scd2(changes: DataFrame, keys: Seq[String], ts: String,
           attrs: Seq[String], tieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty && tieBreak.nonEmpty,
      "scd2 needs keys, attrs, and a deterministic tieBreak")
    val state: Column = struct(attrs.map(col): _*)
    // ALL windows partition by `keys` alone — a (keys, ts)-partitioned
    // dedup window would force a second hash exchange (hash(k,ts) does
    // not satisfy a clustered-by-k requirement). Instead, same-instant
    // dedup happens INSIDE the key window: order by (ts asc, tieBreak
    // desc) and keep each ts-run's first row = that instant's winner.
    // The later windows need only (ts asc), a prefix of this order, so
    // no re-sort either: one exchange, one sort, three window passes.
    val dedupOrder = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(ts).asc +: tieBreak.map(col(_).desc)): _*)
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    changes
      .withColumn("__prev_ts", lag(col(ts), 1).over(dedupOrder))
      .filter(!(col("__prev_ts") <=> col(ts)))
      .withColumn("__changed", !(lag(state, 1).over(byKey) <=> state))
      .filter(col("__changed"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) ++ attrs.map(col)
        ++ Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }
}
