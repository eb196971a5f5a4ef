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
  * (mainTesting.py:500-635):
  *  - a numeric heading line `"<n>. TITLE"` opens a section ONLY when
  *    the title is ALL-CAPS and the line contains exactly one dot
  *    (:544 `case[1].isupper() and len(case) == 2`) and the number is
  *    unseen; any other line starting `"<n>."` is silently dropped —
  *    it matches the numeric branch (:541) but no sub-case, so it
  *    reaches neither a section nor the content accumulator;
  *  - the FIRST single-letter heading of a section is accepted whatever
  *    its letter (:566 only rejects when a previous letter exists);
  *    subsequent ones must continue the a,b,c,... sequence or demote to
  *    content (:566-570); a REPEATED letter closes the open section
  *    with no new heading (:590-591 `heading = ""`);
  *  - a double-letter heading is accepted whenever 'z' has been seen
  *    and the pair is unseen (:597-598) — any pair, not only the
  *    consecutive one; a repeated pair closes like a repeated letter;
  *  - an ALL-CAPS line directly after a numeric heading continues that
  *    heading (W5, :530-539); other lines accumulate into the open
  *    section's content (:624-625); content with NO open section is
  *    appended to the last emitted section's content (:552-557
  *    `data[-1][-1] += content`), except before the first section
  *    (preamble), which is dropped.
  * A repair pass then fills empty contents from the neighbor section
  * (W4, :648-658) and the sink fills residual blanks with "-" (:669).
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
  * Deliberate divergences from the reference (SURVEY §7.4):
  *  - `heading` stores the title WITHOUT the `"<n>. "`/`"<l>. "` prefix
  *    (the reference stores the whole line; the prefix is redundant
  *    with `kode`);
  *  - sections span page breaks (the reference flushes per page and
  *    re-attaches follow-on content via the data[-1] append — same
  *    final content, different row timing);
  *  - the lowercase letter-heading continuation (:534-539) is treated
  *    as content (it is unreachable in well-formed input: it triggers
  *    only when a letter heading's title wraps mid-word);
  *  - a REPEATED numeric heading closes the open section (the
  *    reference keeps the stale heading variable live, which can
  *    re-emit an already-flushed heading — a bug, not a behavior);
  *  - the hardcoded-issuer and `str.replace` foreign-key bugs are not
  *    reproduced; lookahead cannot overrun the last line.
  */
object CalkParser {

  // broad form first (reference :541 is a bare startswith("<n>.")): the
  // ALL-CAPS/single-dot guard decides open-vs-drop, not the match
  private val NumericLead = "^(\\d{1,2})\\.(.*)$".r
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
    val knownNumbers = mutable.Set.empty[String]
    // letters accepted in the current numeric section (reference's
    // known_letter_heading): the FIRST single letter is accepted
    // whatever it is (:566 fires only when the list is non-empty), then
    // consecutive-from-last; any UNSEEN double letter once 'z' is known
    val seenLetters = mutable.Set.empty[String]
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

    def singleValid(letter: String): Boolean =
      parentNum != null && (lastLetter == null || letter == nextExpected(lastLetter))

    // reference :544: ALL-CAPS title (at least one letter, none lower)
    def isAllCaps(t: String): Boolean = {
      val letters = t.filter(_.isLetter)
      letters.nonEmpty && !letters.exists(_.isLower)
    }

    /** Content with no open section joins the last emitted section
      * (reference :552-557 data[-1][-1] append); true preamble drops. */
    def appendContent(t: String): Unit =
      if (kode != null) {
        numericOpen = false // continuation window closes at first content line
        if (content.nonEmpty) content.append(' ')
        content.append(t)
      } else if (docRows.nonEmpty) {
        val last = docRows.last
        docRows(docRows.length - 1) = last.copy(
          content = if (last.content.isEmpty) t else last.content + " " + t)
      } // else: preamble before any heading — reference drops it

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
      knownNumbers.clear(); seenLetters.clear()
      parentNum = null; lastLetter = null
    }

    it.foreach { line =>
      if (doc != line.doc_id) {
        if (doc != null) flushDoc()
        doc = line.doc_id
      }
      val text = line.text.trim
      text match {
        case NumericLead(num, _) =>
          // reference :544: qualify on the RAW line — exactly one dot
          // and an ALL-CAPS title; disqualified "<n>." lines vanish
          val parts = text.split("\\.", -1)
          if (parts.length == 2 && isAllCaps(parts(1))) {
            flushSection()
            if (!knownNumbers.contains(num)) {
              kode = num; heading = parts(1).trim
              knownNumbers += num
              parentNum = num; seenLetters.clear(); lastLetter = null
              numericOpen = true
            }
            // repeated number: section stays closed (scaladoc divergence)
          } // else: silently dropped, not even content
        case LetterHeading(letter, _) if parentNum != null && seenLetters.contains(letter) =>
          flushSection() // repeated letter closes with no new heading (:590-591)
        case LetterHeading(letter, title) if singleValid(letter) =>
          flushSection()
          kode = parentNum + letter; heading = title
          seenLetters += letter; lastLetter = letter
        case DoubleLetterHeading(letters, _) if parentNum != null && seenLetters.contains(letters) =>
          flushSection() // repeated pair closes like a repeated letter
        case DoubleLetterHeading(letters, title) if parentNum != null && seenLetters.contains("z") =>
          flushSection() // any unseen pair once 'z' is known (:597-598)
          kode = parentNum + letters; heading = title
          seenLetters += letters; lastLetter = letters
        case t if numericOpen && t.nonEmpty && t == t.toUpperCase && t.exists(_.isLetter) =>
          // W5 continuation: ALL-CAPS line extends the open numeric heading
          heading = heading + " " + t
        case t if t.nonEmpty =>
          appendContent(t) // includes out-of-sequence letter "headings" (:566-570)
        case _ => ()
      }
    }
    if (doc != null) flushDoc()
    out.iterator
  }
}
