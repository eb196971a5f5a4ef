package graft

/** Fleet-wide physical-plan audit: the properties that must hold for
  * every registered query, not just the ones with dedicated specs.
  * This is the 100 TB insurance — a regression that sneaks a cartesian
  * product or an unbroadcast nested loop into any query fails here
  * before it ever reaches a cluster.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries that intentionally cross-join a broadcast scalar/handful
    * of rows (1-row metadata, query vectors, centroid tables) — the
    * only place BroadcastNestedLoopJoin is acceptable. */
  private val bnljWhitelist = Set(
    "q10_cross_join_meta", "a09_tfidf_terms",
    "s01_cosine_topk", "s04_cosine_topk_native",
    "x02_sql_cosine_fn" /* s01's 1-row query-vector cross join via SQL */,
    "s03_ivf_ann", "s02_batch_knn" /* broadcast probe set x corpus */,
    "s05_quantized_cosine", "s06_ivf_nprobe",
    "s07_kmeans" /* k broadcast centroids x corpus, per Lloyd pass */,
    "s12_semantic_dedup" /* same k-means assignment pipeline as s07 */,
    "w09_distributed_rank" /* 1-row broadcast of the total count */,
    "e10_funnel" /* three 1-row stage counts cross-joined */,
    "a10_unigram_logprob" /* 1-row broadcast of the corpus token total */,
    "s09_range_search" /* broadcast probe set x corpus, filter in-scan */,
    "w12_gap_fill" /* calendar axis x broadcast distinct-type set */,
    "w14_interpolate" /* same calendar axis x broadcast types as w12 */,
    "s10_ann_recall" /* composes s02/s03/s06's broadcast-probe joins */,
    "s11_ranking_metrics" /* composes the same IVF broadcast-probe path */,
    "a14_source_mixing" /* 1-row broadcast of the global weight sum */,
    "x12_zorder_cluster" /* 1-row broadcast of the dim maxima */,
    "g03_triangles" /* 1-row broadcast edge/wedge/triangle aggregates */,
    "s13_pq_adc" /* 1-row broadcast query vector x dim stats / shortlist */,
    "s14_ivfpq" /* same broadcast query-vector composition as s03+s13 */,
    "q22_idle_customers" /* 1-row broadcast of the global average balance */,
    "d13_leakage_free_split" /* 1-row broadcast of the leaky-pair count */,
    "q24_value_share" /* 1-row broadcast of the global revenue total */,
    "a16_bigram_logprob" /* 1-row broadcast of the corpus token total */,
    "a17_perplexity_buckets" /* same 1-row total as a10's LM scoring */,
    "s15_mmr_rerank" /* 1-row broadcast query vector x corpus shortlist */,
    "s16_filtered_ann" /* 1-row broadcast query vector x filtered corpus */,
    "s17_stored_index" /* broadcast probe set x STORED centroids (s03/s06 shape, from the persisted index) */,
    "s18_stored_ivfpq" /* broadcast probes x stored centroids + stored stats x probes (the per-probe ADC tables) */,
    "v18_quality_constraints" /* three 1-row metric frames cross-joined */,
    "x08_sql_knn_view" /* s02's broadcast probe set, through the view */,
    "x09_sql_topk_view" /* s01's 1-row query-vector cross join, through the view */)

  test("q24 reuses the persisted per-part aggregate for the scalar total") {
    val plan = planOf(SparkEntry.queries("q24_value_share")(spark, sfDir))
    assert(plan.contains("InMemoryTableScan"),
      s"q24 must read the cached by-part aggregate, not recompute it:\n$plan")
  }

  test("g05 reads per-round persisted frontiers (no quadratic BFS lineage)") {
    // the frontier joins themselves live inside the cached rounds; the
    // final plan must therefore be cache reads, not a re-derivation of
    // the whole iteration DAG (the g01 lesson: an unpersisted round k
    // re-executes rounds 1..k-1)
    val plan = planOf(SparkEntry.queries("g05_khop_reach")(spark, sfDir))
    assert(plan.sliding("InMemoryTableScan".length).count(_ == "InMemoryTableScan") >= 4,
      s"g05 must read all four persisted BFS levels:\n${plan.take(2000)}")
    // cached nodes PRINT their (already-materialized) lineage, so scan
    // the plan only ABOVE the first cache node: nothing but the final
    // sort/union may live there
    val top = plan.take(math.max(0, plan.indexOf("InMemoryRelation")))
    assert(!top.contains("SortMergeJoin") && !top.contains("FileScan"),
      s"final g05 plan re-derives the BFS instead of reading caches:\n$top")
  }

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = planOf(fn(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
    }
  }

  test("BroadcastNestedLoopJoin only where a broadcast cross join is the design") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = planOf(fn(spark, sfDir))
      if (plan.contains("BroadcastNestedLoopJoin"))
        assert(bnljWhitelist.contains(name), s"unexpected BNLJ in $name:\n$plan")
    }
  }

  test("narrow projections prune the parquet scan (ReadSchema)") {
    // q06 touches 5 of lineitem's 11 columns; the scan must not read more
    val plan = planOf(graft.queries.Relational.queries("q06_scan_filter_agg")(spark, sfDir))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val cols = read.split(",").filter(_.nonEmpty)
    assert(cols.length <= 5, s"q06 should read <=5 columns, got: $read")
    // q02 projects 3 of orders' 6 columns
    val plan2 = planOf(graft.queries.Relational.queries("q02_topk_orders")(spark, sfDir))
    val read2 = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan2).map(_.group(1)).getOrElse("")
    assert(read2.split(",").length <= 3, s"q02 should read <=3 columns, got: $read2")
  }

  test("timestamp range predicates reach the scan as PushedFilters") {
    Seq("q01_pricing_summary", "q03_shipping_priority", "q06_scan_filter_agg").foreach { q =>
      val plan = planOf(graft.queries.Relational.queries(q)(spark, sfDir))
      assert(plan.contains("PushedFilters: [") &&
        (plan.contains("LessThan") || plan.contains("GreaterThan")),
        s"$q must push its date range:\n$plan")
    }
  }

  test("x11 plans a dynamicpruning subquery on the partitioned fact scan") {
    val plan = planOf(graft.queries.Joins.queries("x11_dynamic_pruning")(spark, sfDir))
    assert(plan.contains("dynamicpruning"),
      s"x11's fact scan must carry a runtime partition filter:\n$plan")
  }

  test("s02/s03 rank through TopKPerKey, never a window over the corpus join") {
    // the probes x corpus match set must be capped by partial heaps before
    // any exchange; the only Window allowed is the rank projection ABOVE
    // the TopKPerKeyFinal (<= k rows per probe by then)
    Seq("s02_batch_knn", "s03_ivf_ann", "s06_ivf_nprobe").foreach { name =>
      val plan = planOf(graft.ext.Similarity.queries(name)(spark, sfDir))
      assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"),
        s"$name must plan the TopKPerKey operator:\n$plan")
      val windowAt = plan.indexOf("Window")
      val topkAt = plan.indexOf("TopKPerKeyFinal")
      assert(windowAt == -1 || (topkAt >= 0 && windowAt < topkAt),
        s"$name: a Window may only appear above TopKPerKeyFinal:\n$plan")
    }
  }

  test("s07's Lloyd assignment is a map-side fold — no Window over the corpus") {
    // the argmax over k broadcast centroids must fold inside the scan
    // stage; a row_number window here exchanges the corpus x k product
    // once per Lloyd pass (the round-5 regression this pins)
    val plan = planOf(graft.ext.Similarity.queries("s07_kmeans")(spark, sfDir))
    assert(!plan.contains("Window"),
      s"s07 must not plan any Window operator:\n$plan")
  }

  test("a13's corpus cumsum window is range-partitioned (global window only over the count table)") {
    // the per-doc prefix sum must run under partitionBy(bkt) — an
    // unpartitioned window over the token stream serializes the corpus;
    // the only global window allowed is over the ~16-row range counts
    val plan = planOf(graft.ext.TextAnalysis.queries("a13_sequence_packing")(spark, sfDir))
    val corpusWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("n_tok")).toList
    assert(corpusWindows.nonEmpty,
      s"audit went vacuous — no Window line mentions n_tok; plan shape changed:\n$plan")
    corpusWindows.foreach { l =>
      assert(l.contains("], [bkt"),
        s"a13's corpus window must be partitioned by the range bucket:\n$l")
    }
  }

  test("a17's per-doc rank window is range-partitioned (global window only over the count table)") {
    // the per-doc row_number must run under partitionBy(bkt) — an
    // unpartitioned window over the score rows serializes the corpus
    // (billions of one-row-per-document records at 100 TB through one
    // task); the only global window allowed is over the ~32-row range
    // counts, which never mention avg_logp
    val plan = planOf(graft.ext.TextAnalysis.queries("a17_perplexity_buckets")(spark, sfDir))
    val corpusWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("avg_logp")).toList
    assert(corpusWindows.nonEmpty,
      s"audit went vacuous — no Window line mentions avg_logp; plan shape changed:\n$plan")
    corpusWindows.foreach { l =>
      assert(l.contains("], [bkt"),
        s"a17's corpus window must be partitioned by the range bucket:\n$l")
    }
  }

  test("hot scan families stay inside WholeStageCodegen (no interpreted hot path)") {
    Seq("q01_pricing_summary", "q06_scan_filter_agg", "t02_predicates",
      "a02_quality_score", "e08_histogram").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect() // AQE renders codegen stage markers only in the final plan
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("*("), s"$q lost codegen (no *(n) stage spans):\n$plan")
      assert(!plan.contains("ScalaUDF"), s"$q must not plan a UDF:\n$plan")
    }
  }

  test("every query result is deterministic: two runs hash identically") {
    // spot-check the families most at risk of order instability
    Seq("t06_segmentation", "d03_minhash_lsh", "s02_batch_knn", "v05_topk_aggregator")
      .foreach { name =>
        val fn = SparkEntry.queries(name)
        val a = fn(spark, sfDir).collect().toSeq
        val b = fn(spark, sfDir).collect().toSeq
        assert(a == b, s"$name is nondeterministic")
      }
  }
}
