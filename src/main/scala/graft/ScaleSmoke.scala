package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.sources.Tables

/** One-decade scale smoke for the dedup/similarity families: derives a
  * 10x corpus (sf1) from the sf0.1 test data, runs the headline
  * operators at both scales, and records the quantities the scaladocs'
  * scale arguments actually rest on — CANDIDATE-PAIR COUNTS per LSH
  * family, not just wall time (wall is co-tenant-noisy on this machine;
  * candidate growth is the bucketing math itself).
  *
  * The 10x derivation keeps within-shard structure identical to sf0.1
  * while making shards mutually dissimilar, so the expected reading is
  * sharp:
  *  - documents: shard k prefixes every token with "s<k>" — every
  *    shingle/word hash changes, so cross-shard text similarity is
  *    exactly zero and each shard reproduces sf0.1's pair structure.
  *    Linear-candidate families (banded minhash, simhash blocks) must
  *    therefore come out ~10x sf0.1; a superlinear reading would mean
  *    the banding math is wrong.
  *  - embeddings: shard k applies a deterministic +-1 sign flip per
  *    dimension (an orthogonal diagonal map — within-shard cosines are
  *    EXACTLY preserved, cross-shard cosines scrambled). Sign-plane
  *    bucketing at a FIXED plane count concentrates 10x vectors into
  *    the same 2^planes cells, so its candidate count must grow ~100x:
  *    the measured knee that forces `planes` to GROW with the corpus
  *    (Dedup.signBucket scaladoc) — and the planes=8 count alongside it
  *    shows the knob working.
  *
  * Usage: runMain graft.ScaleSmoke [sf0.1Dir] [sf1OutDir]
  * Writes scale_sf1.json (consumed into BASELINE.md).
  */
object ScaleSmoke {

  private val copies = 10
  private val idStride = 10000000L

  /** Deterministic +-1 mask for shard k (k=0 is identity). */
  private def signMask(k: Int, dims: Int): Seq[Float] =
    (0 until dims).map { i =>
      if (k == 0) 1.0f
      else if (((k * 2654435761L + i * 40503L) >> 7 & 1L) == 1L) -1.0f else 1.0f
    }

  /** Shard-replicate a relational table: k copies with every id column
    * offset by k·idStride, so each shard reproduces sf0.1's join
    * structure exactly (orders-per-customer, lineitems-per-order,
    * degree distributions) while shards stay disjoint — the TPC-H
    * scaling convention (row counts grow with SF, per-key structure
    * does not). idStride is divisible by every modulus the query suite
    * seeds with (g05's node % 50, d12's doc_id % 100), so deterministic
    * seed sets replicate per shard instead of collapsing onto shard 0. */
  private def shardTable(spark: SparkSession, src: String, out: String,
      table: String, idCols: Seq[String]): Unit = {
    val t = spark.read.parquet(s"$src/$table.parquet")
    (0 until copies).map { k =>
      idCols.foldLeft(t)((df, c) => df.withColumn(c, col(c) + lit(k * idStride)))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/$table.parquet")
  }

  private def buildSf1(spark: SparkSession, src: String, out: String): Unit = {
    // fixed dimensions stay single-copy (nation/region cardinality does
    // not scale with SF); every fact/dim keyed table shard-replicates
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    shardTable(spark, src, out, "customer", Seq("c_custkey"))
    shardTable(spark, src, out, "supplier", Seq("s_suppkey"))
    shardTable(spark, src, out, "part", Seq("p_partkey"))
    shardTable(spark, src, out, "orders", Seq("o_orderkey", "o_custkey"))
    shardTable(spark, src, out, "lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    shardTable(spark, src, out, "events", Seq("event_id", "user_id"))
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docShards = (0 until copies).map { k =>
      val text =
        if (k == 0) col("text")
        else concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"s$k"), w)))
      docs.select(
        (col("doc_id") + lit(k * idStride)).as("doc_id"),
        text.as("text"), col("lang"), col("source"), col("n_chars"))
    }
    docShards.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val embShards = (0 until copies).map { k =>
      val mask = array(signMask(k, dims).map(lit): _*)
      emb.select(
        (col("vec_id") + lit(k * idStride)).as("vec_id"),
        zip_with(col("embedding"), mask, (x, m) => (x * m).cast("float")).as("embedding"),
        col("label"))
    }
    embShards.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** sum over buckets of C(n,2) for the sign-plane embedding LSH. */
  private def embeddingCandidates(s: SparkSession, d: String, planes: Int): Long =
    Tables.embeddings(s, d)
      .select(Dedup.signBucket(col("embedding").cast("array<double>"), planes).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .agg((sum(col("n") * (col("n") - 1)) / 2).cast("long").as("c"))
      .first().getLong(0)

  /** Multi-probe join volume at `planes`: the probe side carries home +
    * `planes` Hamming-1 cells per vector, so the bucket join pays
    * sum over cells of n_probe(c) x n_home(c) rows — the quantity the
    * recall lever actually costs. The home-bucket pair count alone
    * (embeddingCandidates) understates multi-probe cost ~(planes+1)x. */
  private def multiProbeJoinRows(s: SparkSession, d: String, planes: Int): Long = {
    val e = Tables.embeddings(s, d)
      .select(Dedup.signBucket(col("embedding").cast("array<double>"), planes)
        .as("bucket"))
    val home = e.groupBy(col("bucket")).agg(count(lit(1)).as("nh"))
    val probe = e.withColumn("flip",
        explode(array((lit(0L) +: (0 until planes).map(i => lit(1L << i))): _*)))
      .select(col("bucket").bitwiseXOR(col("flip")).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("np"))
    probe.join(home, probe("cell") === home("bucket"))
      .agg(sum(col("np") * col("nh")).cast("long").as("c"))
      .first().getLong(0)
  }

  /** Distinct banded-minhash candidate pairs (what d03/d06 feed the
    * exact verifier). */
  private def minhashCandidates(s: SparkSession, d: String): Long = {
    import s.implicits._
    Dedup.bandCandidates(Dedup.minhashBands(
      Dedup.shingleHashes(Tables.documents(s, d), $"doc_id", $"text"), "smokemh"))
      .count()
  }

  /** Simhash 4x15-bit block-join candidate rows (pre-verification,
    * pre-pair-dedup — the join volume d09 actually pays). */
  private def simhashCandidates(s: SparkSession, d: String): Long = {
    import s.implicits._
    val sig = Dedup.simhashSigs(s, d, 60, None)
      .select($"doc_id", explode(array((0 until 4).map(lit): _*)).as("b"),
        $"simhash")
      .withColumn("bk", expr("(simhash >> (b * 15)) & 32767"))
      .select($"b", $"bk")
    sig.groupBy($"b", $"bk").agg(count(lit(1)).as("n"))
      .agg((sum($"n" * ($"n" - 1)) / 2).cast("long").as("c"))
      .first().getLong(0)
  }

  /** Distinct one-sided (batch×corpus) banded candidates for a 1-in-`mod`
    * ingest batch — the quantity behind d12's Θ(batch) claim. Against
    * `minhash_band_pairs` (the full two-sided count) a 1% batch should
    * cost ~2% of the full candidate volume (either endpoint may be the
    * batch doc), at BOTH scales — the incremental shape stays linear in
    * the batch however big the corpus grows. */
  private def incrementalCandidates(s: SparkSession, d: String, mod: Long): Long = {
    import s.implicits._
    val bands = Dedup.minhashBands(
      Dedup.shingleHashes(Tables.documents(s, d), $"doc_id", $"text"), "smokeincr")
    (0 until 3).map { b =>
      val x = bands.filter($"doc_id" % mod === 7)
        .select($"doc_id".as("na"), col(s"bh$b").as("bh"))
      val y = bands.select($"doc_id".as("nb"), col(s"bh$b").as("bh"))
      x.join(y, Seq("bh")).filter($"na" =!= $"nb")
        .select(least($"na", $"nb").as("a"), greatest($"na", $"nb").as("b"))
    }.reduce(_ unionByName _).distinct().count()
  }

  /** Ordered candidate pairs from d16's DF-capped containment index.
    * The sf1 shards are token-prefixed (cross-shard hash spaces are
    * disjoint), so posting-list document frequencies are unchanged
    * within each shard and the capped index must come out ~10x linear
    * — superlinear growth here would mean the stop-shingle cap is not
    * actually bounding per-key fan-out. */
  private def containmentCandidates(s: SparkSession, d: String): Long = {
    import s.implicits._
    val sh = Dedup.shingleHashes(Tables.documents(s, d), $"doc_id", $"text")
      .persist()
    sh.count()
    val rare = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" <= 64).select($"sh")
    val kept = sh.join(rare, "sh")
    val n = kept.select($"sh", $"doc_id".as("doc_a"))
      .join(kept.select($"sh", $"doc_id".as("doc_b")), "sh")
      .filter($"doc_a" =!= $"doc_b")
      .select($"doc_a", $"doc_b").distinct().count()
    sh.unpersist(blocking = false)
    n
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else
      graft.util.Scratch.dir("sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildSf1(spark, src, out)

    val names = Seq("d01_exact_dedup", "d03_minhash_lsh", "d05_embedding_neardup",
      "d06_lsh_verified_neardup", "d07_neardup_clusters", "d09_simhash_verified",
      "d10_decontaminate", "d11_multiprobe_neardup", "d12_incremental_neardup",
      "d16_containment",
      "s02_batch_knn", "s07_kmeans", "s12_semantic_dedup", "s13_pq_adc")
      .filter(SparkEntry.queries.contains)
    def j(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val dirs = Seq("sf0.1" -> src, "sf1" -> out)
    val sections = dirs.map { case (tag, dir) =>
      val perQuery = names.map { n =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s""""$n":{"sec":${j(sec)},"rows":$rows}"""
      }
      val cands = Seq(
        s""""minhash_band_pairs":${minhashCandidates(spark, dir)}""",
        s""""incremental_band_pairs_1pct":${incrementalCandidates(spark, dir, 100L)}""",
        s""""simhash_block_pairs":${simhashCandidates(spark, dir)}""",
        s""""containment_capped_pairs":${containmentCandidates(spark, dir)}""",
        s""""sign4_bucket_pairs":${embeddingCandidates(spark, dir, 4)}""",
        s""""sign8_bucket_pairs":${embeddingCandidates(spark, dir, 8)}""",
        s""""sign8_multiprobe_join_rows":${multiProbeJoinRows(spark, dir, 8)}""",
        s""""sign8_noprobe_result_pairs":${
          import spark.implicits._
          Dedup.embeddingNearDupPairs(Tables.embeddings(spark, dir),
            $"vec_id", $"embedding", threshold = 0.4, planes = 8,
            multiProbe = false).count()}""")
      spark.catalog.clearCache()
      s""""$tag":{"queries":{${perQuery.mkString(",")}},"candidates":{${cands.mkString(",")}}}"""
    }
    val json = s"""{${sections.mkString(",")},"copies":$copies}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("scale_sf1.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
