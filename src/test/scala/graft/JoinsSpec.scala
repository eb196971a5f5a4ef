package graft

import graft.queries.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("every join query runs; oracle SQL exists for each") {
    Joins.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).columns.nonEmpty, name)
    }
    assert(Joins.queries.keySet == Joins.oracle.keySet)
  }

  test("x01 distribution mass equals the customer count (outer join keeps zero-order rows)") {
    val df = Joins.queries("x01_outer_distribution")(spark, sfDir)
    val mass = df.agg(sum("custdist")).head.getLong(0)
    assert(mass == graft.sources.Tables.customer(spark, sfDir).count())
    assert(df.filter(col("c_count") === 0).count() >= 0) // zero bucket representable
  }

  test("x02 keeps only rows at their group minimum") {
    val df = Joins.queries("x02_correlated_min")(spark, sfDir)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(min("l_extendedprice").as("true_min"))
    val bad = df.join(li, "l_partkey")
      .filter(abs(col("cheapest") - col("true_min")) > 0.005)
    assert(bad.count() == 0)
  }

  test("x05 full outer: every nation with suppliers or customers appears once") {
    val df = Joins.queries("x05_full_outer_reconcile")(spark, sfDir)
    assert(df.groupBy("nationkey").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(col("n_supp") === 0 && col("n_cust") === 0).count() == 0)
  }
}
