package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

/** Hand-traced semantics of the public temporal-join operators on a
  * FOREIGN schema (sensor readings / calibrations) — proves the surface
  * is corpus-independent; e05/e06 put the same operators under the
  * DuckDB gate on the events table. */
class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: at-or-before, ties include same-instant build, largest-payload tiebreak") {
    import spark.implicits._
    val probe = Seq(
      (10L, "A", ts("2024-01-01 10:00:00")),
      (11L, "A", ts("2024-01-01 12:00:00")),
      (12L, "B", ts("2024-01-01 09:00:00")), // before any calibration
      (13L, "C", ts("2024-01-01 10:00:00"))
    ).toDF("reading_id", "sensor", "at")
    val build = Seq(
      ("A", ts("2024-01-01 09:30:00"), 1L, 0.5),
      ("A", ts("2024-01-01 12:00:00"), 2L, 0.7), // same instant as reading 11
      ("B", ts("2024-01-01 11:00:00"), 3L, 0.9),
      ("C", ts("2024-01-01 10:00:00"), 4L, 0.1), // tie on time with cal 5
      ("C", ts("2024-01-01 10:00:00"), 5L, 0.2)
    ).toDF("sensor", "cal_at", "cal_id", "gain")
    val got = TemporalJoins.asofJoin(probe, build, Seq("sensor"),
        "at", "cal_at", Seq("cal_id", "gain"), "cal_")
      .select("reading_id", "cal_cal_id", "cal_gain")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(got(10L) == ((Some(1L), Some(0.5))), "plain at-or-before")
    assert(got(11L) == ((Some(2L), Some(0.7))), "same-instant build included")
    assert(got(12L) == ((None, None)), "no build before -> null payload")
    assert(got(13L) == ((Some(5L), Some(0.2))),
      "time tie resolves to largest payload tuple (cal_id 5)")
  }

  test("asofJoin probe columns survive untouched; determinism across runs") {
    import spark.implicits._
    val probe = Seq((1L, "k", ts("2024-06-01 00:00:05"), "keepme"))
      .toDF("id", "key", "t", "extra")
    val build = Seq(("k", ts("2024-06-01 00:00:01"), 42L))
      .toDF("key", "bt", "payload")
    val out = TemporalJoins.asofJoin(probe, build, Seq("key"), "t", "bt",
      Seq("payload"))
    assert(out.columns.toSeq == Seq("id", "key", "t", "extra", "asof_payload"))
    assert(out.head.getAs[String]("extra") == "keepme")
    assert(out.head.getAs[Long]("asof_payload") == 42L)
  }

  test("rangeJoin: (t+lower, t+upper] residual on an equi-key carrier, no cartesian") {
    import spark.implicits._
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00")))
      .toDF("l_id", "l_key", "l_t")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 100L), // boundary: excluded (>)
      ("u1", ts("2024-01-01 10:30:00"), 101L), // inside
      ("u1", ts("2024-01-01 11:00:00"), 102L), // boundary: included (<=)
      ("u1", ts("2024-01-01 11:00:01"), 103L), // outside
      ("u2", ts("2024-01-01 10:30:00"), 104L)  // wrong key
    ).toDF("r_key", "r_t", "r_id")
    val got = TemporalJoins.rangeJoin(left, right, Seq("l_key" -> "r_key"),
        "l_t", "r_t", expr("INTERVAL 0 HOUR"), expr("INTERVAL 1 HOUR"))
      .select("r_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(101L, 102L), s"got $got")
    val plan = planOf(TemporalJoins.rangeJoin(left, right,
      Seq("l_key" -> "r_key"), "l_t", "r_t",
      expr("INTERVAL 0 HOUR"), expr("INTERVAL 1 HOUR")))
    assert(!plan.contains("CartesianProduct"),
      s"equi key must carry the join:\n$plan")
  }
}
