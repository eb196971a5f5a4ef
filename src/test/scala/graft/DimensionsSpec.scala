package graft

import graft.ops.Dimensions
import org.apache.spark.sql.functions._

class DimensionsSpec extends SparkSpec {

  test("scd2 hand-traced: merge, tiebreak, null state, open interval") {
    import spark.implicits._
    val changes = Seq(
      // key 1: A at t1, A again at t2 (merges), B at t3 -> two intervals
      (1L, 1, Some("A"), 10L),
      (1L, 2, Some("A"), 11L),
      (1L, 3, Some("B"), 12L),
      // key 2: same-instant conflict at t1 -> tieBreak picks seq=21 ("Y");
      // then a NULL state at t2 (a real state, not a wildcard), NULL
      // again at t3 (merges), back to "Y" at t4
      (2L, 1, Some("X"), 20L),
      (2L, 1, Some("Y"), 21L),
      (2L, 2, None, 22L),
      (2L, 3, None, 23L),
      (2L, 4, Some("Y"), 24L),
    ).toDF("k", "t", "v", "seq")

    val got = Dimensions.scd2(changes, keys = Seq("k"), ts = "t",
        attrs = Seq("v"), tieBreak = Seq("seq"))
      .orderBy($"k", $"valid_from")
      .as[(Long, Option[String], Int, Option[Int], Boolean)]
      .collect().toSeq

    assert(got == Seq(
      (1L, Some("A"), 1, Some(3), false),
      (1L, Some("B"), 3, None, true),
      (2L, Some("Y"), 1, Some(2), false),
      (2L, None, 2, Some(4), false),
      (2L, Some("Y"), 4, None, true),
    ))
  }

  test("property: scd2 matches a driver-side reference on random change streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val rowGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(1, 6),
      Gen.option(Gen.oneOf("A", "B", "C")))
    val streamGen = Gen.nonEmptyListOf(rowGen)
    (1 to 5).foreach { i =>
      val rows = streamGen
        .pureApply(Gen.Parameters.default.withSize(40), Seed(i.toLong))
        .zipWithIndex.map { case ((k, t, v), seq) => (k, t, v, seq.toLong) }

      // driver-side reference: per key, sort by (t, seq desc), keep the
      // first row of each t (tiebreak winner), drop consecutive equal
      // states, then zip each row with the next change's t
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val dedup = rs.sortBy(r => (r._2, -r._4)).distinctBy(_._2)
        val kept = dedup.foldLeft(List.empty[(Int, Option[String])]) {
          case (acc, (_, t, v, _)) =>
            if (acc.headOption.exists(_._2 == v)) acc else (t, v) :: acc
        }.reverse
        kept.zipAll(kept.drop(1).map(c => Some(c._1)), (0, None), None)
          .map { case ((from, v), to) => (k, v, from, to, to.isEmpty) }
      }.sortBy(r => (r._1, r._3))

      val got = Dimensions.scd2(rows.toDF("k", "t", "v", "seq"),
          Seq("k"), "t", Seq("v"), Seq("seq"))
        .orderBy($"k", $"valid_from")
        .as[(Long, Option[String], Int, Option[Int], Boolean)]
        .collect().toSeq
      assert(got == expected, s"case $i: $rows")
    }
  }

  test("scd2 plans one hash exchange on the key, no global window") {
    import spark.implicits._
    val changes = Seq((1L, 1, "A", 1L)).toDF("k", "t", "v", "seq")
    val plan = Dimensions.scd2(changes, Seq("k"), "t", Seq("v"), Seq("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 key exchange, plan:\n$plan")
    assert(!plan.contains("SinglePartition"), "no global window allowed")
  }
}
