package graft

import graft.ops.ScaleOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Z-order layout: the morton key orders correctly and a z-clustered
  * file layout is min-max-prunable on BOTH dimensions, unlike a
  * single-column sort (the property x12's bucket rectangles model and
  * `ScaleOps.zorderWrite` materializes). */
class ZorderSpec extends SparkSpec {

  test("zorderKey2 interleaves bits (known values)") {
    import spark.implicits._
    def morton(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (255L, 0L), (240L, 15L), (12345L, 54321L))
      .toDF("x", "y")
      .withColumn("z", ScaleOps.zorderKey2(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-clustered files prune on both dims; single-column sort on one") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val mx = li.agg(max($"l_partkey").as("maxp"), max($"l_suppkey").as("maxs"))
      .collect()(0)
    val (maxp, maxs) = (mx.getLong(0), mx.getLong(1))
    val files = 16

    val zPath = graft.util.Scratch.dir("zorder_z")
    ScaleOps.zorderWrite(li, zPath, files,
      expr(s"(l_partkey * 65535) div $maxp"),
      expr(s"(l_suppkey * 65535) div $maxs"))

    // comparison layout: range-sorted by partkey alone (the best
    // single-column clustering for partkey probes — and the worst case
    // for suppkey probes)
    val pPath = graft.util.Scratch.dir("zorder_p")
    li.repartitionByRange(files, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(pPath)

    // per-file [min, max] of a column — what parquet footer stats give
    // a scan to skip with
    def spans(path: String, c: String): Array[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    def overlapping(sp: Array[(Long, Long)], lo: Long, hi: Long): Int =
      sp.count { case (l, h) => h >= lo && l <= hi }

    // a ~6%-wide range probe on each dimension
    val (pLo, pHi) = (maxp / 2, maxp / 2 + maxp / 16)
    val (sLo, sHi) = (maxs / 2, maxs / 2 + maxs / 16)

    val zPart = overlapping(spans(zPath, "l_partkey"), pLo, pHi)
    val zSupp = overlapping(spans(zPath, "l_suppkey"), sLo, sHi)
    val pPart = overlapping(spans(pPath, "l_partkey"), pLo, pHi)
    val pSupp = overlapping(spans(pPath, "l_suppkey"), sLo, sHi)

    val nZ = spans(zPath, "l_partkey").length
    assert(nZ > 1, "z layout produced a single file; widen the test data")
    // single-column sort: perfect on its own column, useless on the other
    assert(pPart <= math.max(2, files / 4))
    assert(pSupp >= nZ - 1, s"suppkey probe should touch ~all partkey-sorted files ($pSupp of $nZ)")
    // z-cluster: BOTH dims prune to a strict subset of files
    assert(zPart < nZ, s"z layout failed to prune partkey probe ($zPart of $nZ)")
    assert(zSupp < nZ, s"z layout failed to prune suppkey probe ($zSupp of $nZ)")
    // and the suppkey probe must beat the single-column layout clearly
    assert(zSupp <= pSupp / 2,
      s"z layout suppkey pruning ($zSupp) not better than partkey-sorted ($pSupp)")
  }
}
