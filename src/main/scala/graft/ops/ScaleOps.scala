package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.SqlBridge

/** Scale-out join utilities (the 100 TB toolbox the test SFs can't
  * force but a 1000-executor cluster needs):
  *
  *  - salted join: when one join key carries a disproportionate share
  *    of rows, AQE's skew splitting handles sort-merge spills, but a
  *    pathological hot key still serializes its probe side. Salting
  *    splits the hot key into `n` synthetic sub-keys: the big side
  *    hashes a unique column into a salt, the small side replicates
  *    each row n times — shuffle spreads n-ways, results are identical
  *    to the plain join (spec-asserted).
  *
  *  - bucketed co-located join: pre-shuffling both tables into the same
  *    bucket layout at write time makes every later equi-join on the
  *    bucket key shuffle-free — the dominant cost of repeated big-big
  *    joins amortizes to zero. `BucketingSpec` asserts the no-Exchange
  *    plan.
  */
object ScaleOps {

  /** Equi-join `left⋈right` on `key`, with the left side salted n ways
    * by a deterministic hash of `leftUnique` (any well-distributed left
    * column). `right` is replicated n times — use for dimension-sized
    * right sides where the duplication is cheap relative to the skew.
    *
    * SKEW REMEDY ORDERING at scale: reach for AQE's skew join FIRST
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE):
    * `OptimizeSkewedJoin` splits an oversized post-shuffle partition
    * into multiple reader tasks — slicing the hot partition's map
    * outputs and duplicating the matching partition of the other side —
    * so even a SINGLE hot key parallelizes under a sort-merge or
    * shuffled-hash join with zero code change, and only when runtime
    * sizes actually show skew (ScaleOpsSpec pins the split firing).
    * Salt manually only where AQE cannot act: (a) the skewed side of an
    * outer join whose rows must not be duplicated on the stream side,
    * (b) skew under an AGGREGATION rather than a join (AQE splits join
    * partitions, not hash-aggregate keys — pre-aggregate on
    * (key, salt) then re-aggregate on key), or (c) when a fixed n-way
    * layout must be reused deterministically across several stages.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftUnique: String, n: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(hash(col(leftUnique)), lit(n)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write `df` as a bucketed+sorted table: later equi-joins between
    * tables sharing (buckets, key) need no shuffle and no sort. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bloom-pruned join: `fact⋈dim` where a Bloom filter built over the
    * dim side's join keys pre-filters the fact side BEFORE its shuffle.
    * This is Spark's own runtime-filter mechanism (Catalyst
    * `BloomFilterAggregate` + `BloomFilterMightContain`, the pair the
    * optimizer injects when `runtime.bloomFilter.enabled` fires) made
    * an explicit operator, for when the planner's heuristics don't
    * trigger — e.g. the selective predicate is on a column the
    * optimizer can't see through. The bloom is a single binary blob
    * evaluated as a scalar subquery: the fact scan tests
    * `might_contain(xxhash64(key))` map-side, so at 100 TB only
    * plausibly-matching fact rows ever reach the join exchange. No
    * false negatives — the joined result is EXACTLY the plain join
    * (the x10 driver oracle is the plain-join SQL). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(SqlBridge.toCatalyst(dim(dimKey)))), expectedItems)
    val bloomDf = dim.agg(SqlBridge.column(
      bloomAgg.toAggregateExpression()).as("bloom"))
    // might_contain requires a constant or scalar-subquery bloom side;
    // the subquery broadcasts the blob exactly like the injected filter
    val mightContain = SqlBridge.column(new BloomFilterMightContain(
      ScalarSubquery(SqlBridge.logicalPlan(bloomDf)),
      new XxHash64(Seq(SqlBridge.toCatalyst(fact(factKey))))))
    fact.where(mightContain).join(dim, fact(factKey) === dim(dimKey))
  }

  /** Distributed global prefix sum (two-pass): a running total over a
    * GLOBAL order without the single-partition `Window.orderBy` that
    * serializes w08-style plans. Pass 1 range-partitions on the order
    * key and computes per-partition running sums; pass 2 folds the 32
    * per-partition totals (a tiny driver-sized table) into prefix
    * offsets broadcast back. Result is invariant to where the sampled
    * range boundaries land because the order tuples are required to be
    * unique. This is THE scalable form of cumulative aggregation — at
    * 100 TB every partition works independently except for a k-row
    * offset exchange. */
  def distributedPrefixSum(df: DataFrame, value: Column,
      order: Seq[Column], out: String, partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(partitions, order: _*)
      .withColumn("_pid", org.apache.spark.sql.functions.spark_partition_id())
    val within = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = ranged.groupBy(col("_pid")).agg(sum(value).as("_ptot"))
    // k rows total: the global window here is over the partition COUNT,
    // not the data — the one place a single-partition window is fine
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_off", coalesce(sum(col("_ptot")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged.join(broadcast(offsets), Seq("_pid"))
      .withColumn(out, sum(value).over(within) + col("_off"))
      .drop("_pid", "_off")
  }

  /** Same, but as an external table at an explicit path — for callers
    * that must control the storage location (the warehouse dir default
    * is cwd-relative, wrong for a library). */
  def writeBucketedAt(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Morton (Z-order) key over two dimensions, each truncated to its low
    * 16 bits: the classic shift-or-mask bit spread, built entirely from
    * codegen'd integer built-ins (shiftleft / bitwiseAND / bitwiseOR), so
    * the key computes inside WholeStageCodegen at scan speed — no UDF.
    *
    * WHY at 100 TB: sorting a fact table by one column clusters its
    * files for predicates on that column only; a z-sorted layout makes
    * file/row-group min-max stats selective on BOTH dimensions at once
    * (each file covers a small z-range ≈ a small rectangle in
    * (x, y)-space), so scans with a predicate on EITHER dimension skip
    * most files. This is the multi-dimensional clustering Delta's
    * OPTIMIZE ZORDER BY provides, expressed as a plain column the
    * engine can range-partition and sort by on any parquet table.
    * 16 bits/dim keeps the interleave in a 32-bit key; callers with
    * wider domains normalize first (mod, or a width-reducing rank —
    * min-max skipping only needs ORDER, not exact values). */
  def zorderKey2(x: Column, y: Column): Column = {
    def spread16(c: Column): Column = {
      var v = c.bitwiseAND(lit(0xFFFFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
      v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
  }

  /** Bits per dimension for an N-column Morton key: 16 (the
    * quantization width) while it fits, else the largest width whose
    * interleave stays inside a signed long's 63 value bits. */
  def zorderBits(n: Int): Int = math.min(16, 63 / n)

  /** N-dimensional Morton interleave of quantized columns (each
    * already in [0, 2^zorderBits(n))) — generalizes [[zorderKey2]] so
    * a 3-column cluster (issuer, year, quarter) tiles all three
    * dimensions. The 2-D case keeps the magic-mask spread; higher
    * dimensions build the key as an OR of per-bit shifts — a wider
    * expression tree, but codegen'd and paid once per compaction
    * rewrite, never per query. Bit i of column c lands at position
    * i*n + c, so each output file's z-range bounds EVERY column. */
  def zorderKeyN(cols: Seq[Column]): Column = {
    require(cols.nonEmpty && cols.size <= 8,
      s"zorderKeyN supports 1-8 columns, got ${cols.size}")
    cols.size match {
      case 1 => cols.head.bitwiseAND(lit(0xFFFFL))
      case 2 => zorderKey2(cols(0), cols(1))
      case n =>
        val bits = zorderBits(n)
        cols.zipWithIndex.map { case (c, i) =>
          val v = c.bitwiseAND(lit((1L << bits) - 1))
          (0 until bits).map { b =>
            shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * n + i)
          }.reduce(_ bitwiseOR _)
        }.reduce(_ bitwiseOR _)
    }
  }

  /** Write `df` z-clustered across `files` parquet files: range-
    * partition on the z-key (each output file owns one contiguous
    * z-range → a tight rectangle of (x, y) space for min-max skipping),
    * sort within partitions so row groups inside a file are tight too.
    * The z column itself is dropped — clustering is a LAYOUT property;
    * readers filter on the natural columns and parquet stats do the
    * skipping. ZorderSpec measures the effect: a range probe on either
    * dimension overlaps a small fraction of z-clustered files vs ~all
    * files of a single-column sort. */
  def zorderWrite(df: DataFrame, path: String, files: Int,
      x: Column, y: Column): Unit =
    df.withColumn("_z", zorderKey2(x, y))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
