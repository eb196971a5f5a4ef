package graft.plans

import org.apache.spark.sql.Dataset
import scala.collection.mutable

/** One ordered PDF text line (B3/B4 fixture shape, FIXTURES.md). */
case class CalkLine(doc_id: String, page: Int, line_no: Int, text: String)

/** One extracted notes section (reference sink schema
  * tb_catatan_atas_laporan_keuangan, mainTesting.py:673-677). */
case class CalkRow(doc_id: String, kode: String, heading: String, content: String)

/** Exact-fidelity CALK section parser (SURVEY.md §2.5 W3-exact).
  *
  * The reference implements this as a 136-line per-line state machine
  * (mainTesting.py:500-635): numeric headings `"<n>. TITLE"` open a
  * section; the FIRST single-letter heading of a section is accepted
  * whatever its letter (mainTesting.py:566 only rejects when a previous
  * letter exists), subsequent ones must continue the a,b,c,... sequence
  * or demote to content (:566-570), double-letter headings are accepted
  * once 'z' has been seen (:594-623), an ALL-CAPS
  * line directly after a numeric heading is a continuation of that
  * heading (W5, :530-539), and everything else accumulates into the
  * open section's content (:624-625). A repair pass then fills empty
  * contents from the neighbor section (W4, :648-658) and the sink
  * fills residual blanks with "-" (:669).
  *
  * Spark shape: the letter-sequence validation makes the fold
  * inherently sequential *per document*, so this is the one operator
  * built on `mapPartitions` over doc-clustered, (page, line_no)-sorted
  * partitions (SURVEY §4 "custom work warranted" item 1) instead of
  * window functions — `graft.queries.TextOps` t06/t07 carry the
  * window-expressible approximation, this carries the exact semantics.
  * Scale: `repartition(doc_id)` bounds task state to one document's
  * lines; 100 TB of PDFs parallelize across documents.
  *
  * Deliberate divergences from the reference (SURVEY §7.4): the
  * hardcoded-issuer and `str.replace` foreign-key bugs are not
  * reproduced; lookahead cannot overrun the last line.
  */
object CalkParser {

  private val NumericHeading = "^(\\d{1,2})\\.\\s+(.*)$".r
  private val LetterHeading = "^([a-z])\\.\\s+(.*)$".r
  private val DoubleLetterHeading = "^([a-z]{2})\\.\\s+(.*)$".r

  /** Distributed entry point: cluster by document, sort by position,
    * run the sequential machine per partition. */
  def parse(lines: Dataset[CalkLine]): Dataset[CalkRow] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .repartition($"doc_id")
      .sortWithinPartitions($"doc_id", $"page", $"line_no")
      .mapPartitions(parsePartition)
  }

  /** The per-partition machine; partition holds >=0 whole documents in
    * order. Exposed for direct unit testing. */
  def parsePartition(it: Iterator[CalkLine]): Iterator[CalkRow] = {
    val out = mutable.ArrayBuffer[CalkRow]()
    val docRows = mutable.ArrayBuffer[CalkRow]()

    var doc: String = null
    var kode: String = null
    var heading: String = null
    val content = new StringBuilder
    var parentNum: String = null
    // last accepted (sub)letter code in the current numeric section, or
    // null before any: the reference accepts ANY first letter heading
    // (mainTesting.py:566 fires only when known_letter_heading is
    // non-empty) and then requires consecutive letters; double-letter
    // headings are accepted once 'z' has been seen (:594-598)
    var lastLetter: String = null
    var numericOpen = false    // heading can absorb ALL-CAPS continuations

    def flushSection(): Unit = {
      if (kode != null) {
        docRows += CalkRow(doc, kode, heading, content.toString.trim)
      }
      kode = null; heading = null; content.clear(); numericOpen = false
    }

    def nextExpected(cur: String): String = cur match {
      case "z" => "aa"
      case s if s.length == 1 => (s.head + 1).toChar.toString
      case s => s.init + (s.last + 1).toChar // zz-overflow out of scope (ref never reaches it)
    }

    def letterValid(letter: String): Boolean =
      if (parentNum == null) false
      else if (lastLetter == null) letter.length == 1 // any first single letter
      else letter == nextExpected(lastLetter) ||
        (letter.length == 2 && lastLetter == "z")     // any double after 'z'

    def flushDoc(): Unit = {
      flushSection()
      // W4 repair (mainTesting.py:648-658): empty content borrows from
      // the following section; the last section borrows from the
      // previous; residual blanks become the "-" sentinel (:669).
      val n = docRows.length
      val repaired = docRows.zipWithIndex.map { case (r, i) =>
        val c =
          if (r.content.nonEmpty) r.content
          else if (i + 1 < n && docRows(i + 1).content.nonEmpty) docRows(i + 1).content
          else if (i > 0 && docRows(i - 1).content.nonEmpty) docRows(i - 1).content
          else "-"
        r.copy(content = c)
      }
      out ++= repaired
      docRows.clear()
      parentNum = null; lastLetter = null
    }

    it.foreach { line =>
      if (doc != line.doc_id) {
        if (doc != null) flushDoc()
        doc = line.doc_id
      }
      val text = line.text.trim
      text match {
        case NumericHeading(num, title) if num.toInt >= 1 && num.toInt <= 99 =>
          flushSection()
          kode = num; heading = title
          parentNum = num; lastLetter = null; numericOpen = true
        case LetterHeading(letter, title) if letterValid(letter) =>
          flushSection()
          kode = parentNum + letter; heading = title
          lastLetter = letter
        case DoubleLetterHeading(letters, title) if letterValid(letters) =>
          flushSection()
          kode = parentNum + letters; heading = title
          lastLetter = letters
        case t if numericOpen && t.nonEmpty && t == t.toUpperCase && t.exists(_.isLetter) =>
          // W5 continuation: ALL-CAPS line extends the open numeric heading
          heading = heading + " " + t
        case t if kode != null =>
          numericOpen = false // continuation window closes at first content line
          if (content.nonEmpty) content.append(' ')
          content.append(t) // includes out-of-sequence letter "headings" (:566-570)
        case _ => () // preamble line before any heading — reference drops it
      }
    }
    if (doc != null) flushDoc()
    out.iterator
  }
}
