package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative property tests (SURVEY.md §5 item 3): the reference's
  * implicit invariants, checked over generated inputs rather than one
  * fixture. The scalatest-scalacheck bridge isn't on the offline
  * classpath, so generators are driven directly with fixed seeds —
  * deterministic cases, same breadth. Spark jobs are expensive
  * per-case, so 5 cases per property, sized 30.
  */
class PropertiesSpec extends SparkSpec {

  private def forAll[A](g: Gen[A], cases: Int = 5)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(p => body(p._1, p._2))

  private val noteToken: Gen[String] = for {
    n <- Gen.choose(1, 99)
    letter <- Gen.option(Gen.choose('a', 'z'))
  } yield n.toString + letter.map(_.toString).getOrElse("")

  test("property: explode(split) round-trips through ordered concat") {
    forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(noteToken))) { docs: List[List[String]] =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (toks, id) => (id.toLong, toks.mkString(",")) }
        .toDF("id", "csv")
      val back = df
        .select(col("id"), posexplode(split(col("csv"), ",")).as(Seq("p", "tok")))
        .groupBy("id")
        .agg(array_join(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), ",").as("rebuilt"))
      val bad = df.join(back, "id").filter(col("csv") =!= col("rebuilt"))
      assert(bad.count() == 0)
    }
  }

  test("property: hierarchical union-find matches brute-force components on random graphs") {
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)).suchThat(p => p._1 != p._2))
    forAll(edgeGen, cases = 5) { edges: List[(Long, Long)] =>
      import spark.implicits._
      // driver-side reference: repeated relabel-to-min until fixpoint
      var lbl = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> n).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a), lbl(b))
          if (lbl(a) != m || lbl(b) != m) { lbl += a -> m; lbl += b -> m; changed = true }
        }
        // propagate through chains: relabel every node to its label's label
        val next = lbl.map { case (n, l) => n -> lbl.getOrElse(l, l) }
        if (next != lbl) { lbl = next; changed = true }
      }
      val expect = lbl.toSeq.sorted
      val got = graft.ext.Dedup
        .connectedComponents(edges.toDF("src", "dst"), col("src"), col("dst"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == expect, s"edges=$edges")
    }
  }

  test("property: anti-join load gate is idempotent for any overlap") {
    forAll2(
      Gen.nonEmptyListOf(Gen.choose(1, 20)),
      Gen.listOf(Gen.choose(1, 20))) { (incoming: List[Int], existing: List[Int]) =>
      import spark.implicits._
      val inc = incoming.distinct.toDF("k")
      val ex = existing.distinct.toDF("k")
      val loaded = inc.join(ex, Seq("k"), "left_anti")
      // loading the union again admits nothing new
      val again = inc.join(ex.union(loaded).distinct(), Seq("k"), "left_anti")
      assert(again.count() == 0)
      // and the gate admitted exactly the set difference
      assert(loaded.collect().map(_.getInt(0)).toSet ==
        incoming.toSet -- existing.toSet)
    }
  }

  test("property: gaps-and-islands partitions rows; island count = gap count + 1") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 500L))) { offsets: List[Long] =>
      import spark.implicits._
      val sorted = offsets.distinct.sorted
      val gapThreshold = 50L
      val df = sorted.toDF("t")
      val w = org.apache.spark.sql.expressions.Window.orderBy("t")
      val islands = df
        .withColumn("gap", when(col("t") - lag(col("t"), 1).over(w) > gapThreshold, 1)
          .otherwise(lit(0)))
        .withColumn("island", sum(col("gap")).over(
          w.rowsBetween(Long.MinValue, 0)))
      val nIslands = islands.agg(countDistinct("island")).head.getLong(0)
      val expected = 1 + sorted.zip(sorted.drop(1)).count { case (a, b) => b - a > gapThreshold }
      assert(nIslands == expected)
    }
  }

  test("property: segmentation is total — every token lands in exactly one segment") {
    forAll(Gen.nonEmptyListOf(Gen.oneOf("table", "scan", "row", "data", "x"))) { words: List[String] =>
      import spark.implicits._
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Long.MinValue, 0)
      val segs = df
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .withColumn("seg", sum(when(col("word") === "table", 1L).otherwise(0L)).over(w))
      assert(segs.count() == words.length)
      val bounds = segs.agg(min("seg"), max("seg")).head
      assert(bounds.getLong(0) >= 0 &&
        bounds.getLong(1) == words.count(_ == "table"))
    }
  }

  test("property: unit-scaling law — loaded == raw * (annual ? 1 : 1e6)") {
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 4), Gen.choose(-1e6, 1e6)))) {
      rows: List[(Int, Double)] =>
      import spark.implicits._
      val df = rows.toDF("q", "raw")
      val scaled = df.withColumn("nilai",
        when(col("q") =!= 4, col("raw") * 1e6).otherwise(col("raw")))
      val bad = scaled.filter(
        (col("q") === 4 && col("nilai") =!= col("raw")) ||
        (col("q") =!= 4 && col("nilai") =!= col("raw") * 1e6))
      assert(bad.count() == 0)
    }
  }

  // Latin-1 text a filing line might carry: letters (so the bfrange
  // paths fire), digits/punct (bfchar path), "fi" (the ligature code),
  // accents, embedded spaces (the kerned-TJ split)
  private val pdfLine: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaChar.map(_.toString),
    2 -> Gen.numChar.map(_.toString),
    2 -> Gen.const(" "),
    1 -> Gen.oneOf('(', ')', '\\', '.', ',', '-', '%', 'é', 'ü').map(_.toString),
    1 -> Gen.const("fi"))).map(_.mkString)

  test("property: CID encoder → /ToUnicode parse round-trips arbitrary Latin-1 pages") {
    // pure parser law, no Spark job — so many cases are cheap
    forAll(Gen.nonEmptyListOf(Gen.listOf(pdfLine)), cases = 40) { pages: List[List[String]] =>
      val got = graft.sources.Pdf.parsePdf(
        graft.sources.Pdf.writePdfCid(pages.map(_.toSeq)))
      val want = for {
        (lines, pi) <- pages.zipWithIndex
        (text, li) <- lines.zipWithIndex
      } yield ((pi + 1).toLong, li.toLong, text)
      assert(got == want)
    }
  }
}
