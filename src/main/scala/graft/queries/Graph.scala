package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over relationship structure derived from the fact
  * tables — the "who matters in this network" layer (influence ranking
  * over the customer↔supplier trading graph).
  *
  * Scale design: the one corpus-scale operation is the graph BUILD — a
  * single join+aggregate pass that collapses the lineitem fact table to
  * a weighted edge list of dimension-table cardinality. Everything
  * iterative then runs on that aggregated graph: edges are persisted
  * once, hash-partitioned by src, so every power-iteration join reuses
  * the cached partitioning and only the node-sized rank table moves.
  * At 100 TB the iterations cost |edges| ≪ |lineitem| regardless of
  * iteration count, and nothing ever reaches the driver.
  *
  * Determinism: ranks are kept in integer micro-units (1e6 = mass 1.0)
  * and every step is BIGINT multiply / integer-divide / sum — exact and
  * summation-order-independent, so Spark and DuckDB agree bit-for-bit
  * after five iterations where a double formulation would drift ulps
  * per iteration and diverge under different partition orders (the
  * float-safety rule the rest of the oracle gate follows).
  */
object Graph extends QueryModule {

  /** Gate-sized deterministic order without orderBy's range-sampling
    * job re-executing the unpersisted DAG (same rationale as
    * Dedup.sortedSmall). */
  private def sortedSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** One cached edge table per invocation; the next call releases the
    * previous one (Dedup.swapPersist pattern — eager count so the five
    * iteration jobs never race a cold cache into parallel rebuilds). */
  private val edgeSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame]
  private def swapPersist(df: DataFrame): DataFrame = {
    val cached = df.persist()
    cached.count()
    val prev = edgeSlot.getAndSet(cached)
    // plan-equality guard, same reason as Dedup.swapPersist: the cache
    // entry is keyed by logical plan, so unpersisting an equal-plan
    // previous table would evict the cache just built above
    if (prev != null && (prev ne cached) &&
        !prev.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
      prev.unpersist(blocking = false)
    cached
  }

  /** g01 — weighted PageRank over the customer↔supplier bipartite
    * trading graph. Edge weight = lineitem count between the pair,
    * symmetrized (both directions) so every node has out-degree > 0 and
    * receives mass — no dangling-mass correction needed, by
    * construction. Five damped power iterations, d = 0.85:
    * r'(v) = 150000 + (85 * Σ_{(u,v)} (r(u)·w) div ow(u)) div 100,
    * starting from 1e6 micro-units per node. Node ids pack kind+key
    * into one BIGINT (2k for customers, 2k+1 for suppliers) so the
    * whole iteration joins on a single integer column.
    */
  private def g01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".as("c"), $"l_suppkey".as("s"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs.select(($"c" * 2).as("src"), ($"s" * 2 + 1).as("dst"), $"w")
      .unionAll(pairs.select(($"s" * 2 + 1).as("src"), ($"c" * 2).as("dst"), $"w"))
    val outw = edges.groupBy($"src").agg(sum($"w").as("ow"))
    // Partition the annotated edge list by src once; the cached
    // InMemoryTableScan advertises that partitioning, so each
    // iteration's join shuffles only the node-sized rank table.
    val e = swapPersist(edges.join(outw, "src").repartition($"src"))
    var ranks = e.select($"src".as("node")).distinct()
      .withColumn("r", lit(1000000L))
    for (_ <- 1 to 5) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .groupBy($"dst".as("node"))
        .agg(expr("150000 + (85 * sum((r * w) div ow)) div 100").cast("long").as("r"))
    }
    sortedSmall(
      ranks.select(
        when($"node" % 2 === 0, "customer").otherwise("supplier").as("kind"),
        expr("node div 2").as("key"),
        $"r".as("rank")),
      $"rank".desc, $"kind", $"key")
  }
  private val g01Sql =
    """WITH pairs AS (
         SELECT o_custkey AS c, l_suppkey AS s, count(*) AS w
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2),
       edges AS (
         SELECT 2*c AS src, 2*s+1 AS dst, w FROM pairs
         UNION ALL
         SELECT 2*s+1 AS src, 2*c AS dst, w FROM pairs),
       e AS (
         SELECT src, dst, w,
           CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS ow FROM edges),
       r0 AS (
         SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS r FROM edges),
       r1 AS (SELECT dst AS node,
                CAST(150000 + (85 * sum((r * w) // ow)) // 100 AS BIGINT) AS r
              FROM e JOIN r0 ON e.src = r0.node GROUP BY dst),
       r2 AS (SELECT dst AS node,
                CAST(150000 + (85 * sum((r * w) // ow)) // 100 AS BIGINT) AS r
              FROM e JOIN r1 ON e.src = r1.node GROUP BY dst),
       r3 AS (SELECT dst AS node,
                CAST(150000 + (85 * sum((r * w) // ow)) // 100 AS BIGINT) AS r
              FROM e JOIN r2 ON e.src = r2.node GROUP BY dst),
       r4 AS (SELECT dst AS node,
                CAST(150000 + (85 * sum((r * w) // ow)) // 100 AS BIGINT) AS r
              FROM e JOIN r3 ON e.src = r3.node GROUP BY dst),
       r5 AS (SELECT dst AS node,
                CAST(150000 + (85 * sum((r * w) // ow)) // 100 AS BIGINT) AS r
              FROM e JOIN r4 ON e.src = r4.node GROUP BY dst)
       SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
         node // 2 AS key, r AS rank
       FROM r5 ORDER BY rank DESC, kind, key"""

  val queries: Map[String, QueryFn] = Map(
    "g01_pagerank" -> g01 _,
  )
  val oracle: Map[String, String] = Map(
    "g01_pagerank" -> g01Sql,
  )
}
