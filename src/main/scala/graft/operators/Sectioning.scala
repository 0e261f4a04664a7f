package graft.operators

import graft.model.{Doc, Section}
import graft.functions.TextFns
import org.apache.spark.sql.{Dataset, SparkSession}

/** Section extraction (SURVEY.md C1/J6).
  *
  * Reference semantics (`1st Place/src/mimic_common.py:77-124`): a section
  * starts at a gazetteer header ("Header:") or at any line that ends with ':'
  * followed by a blank line (mapped to "other" when not in the gazetteer);
  * a section ends where the next one starts. Position→section assignment is
  * an as-of lookup (greatest header position ≤ mention start).
  *
  * Spark mapping: sections are computed *inside* the per-doc row (pure
  * function of the doc text) rather than via a shuffle join — each doc's
  * header list is tiny, so the as-of join J6 collapses to an in-row binary
  * search. This keeps the extract→section→match path shuffle-free.
  */
object Sectioning {

  val headerSet: Set[String] = graft.fixtures.Synth.headers.map(TextFns.normalize).toSet

  /** Sections that veto dictionary matches
    * (`1st Place/src/mimic_common.py:148-149`). */
  def isVetoSection(header: String): Boolean =
    header.contains("medication") || header.contains("service") || header.contains("date of birth")

  /** Pure per-doc section extraction over the concatenated text.
    * Returns non-overlapping, text-covering sections; text before the first
    * header is header="preamble". Headers are normalized (lowercased,
    * punctuation-stripped); non-gazetteer headers become "other". */
  def sections(docId: String, text: String): IndexedSeq[Section] = {
    val starts = IndexedSeq.newBuilder[(Int, String)]
    var lineStart = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        // line = [lineStart, i)
        var a = lineStart
        var b = i
        while (a < b && Character.isWhitespace(text.charAt(a))) a += 1
        while (b > a && Character.isWhitespace(text.charAt(b - 1))) b -= 1
        if (b > a && text.charAt(b - 1) == ':') {
          val name = TextFns.normalize(text.substring(a, b - 1))
          if (name.nonEmpty) {
            val header = if (headerSet.contains(name)) name else "other"
            starts += ((lineStart, header))
          }
        }
        lineStart = i + 1
      }
      i += 1
    }
    val hs = starts.result()
    val out = IndexedSeq.newBuilder[Section]
    if (hs.isEmpty || hs.head._1 > 0)
      out += Section(docId, "preamble", 0, if (hs.isEmpty) n else hs.head._1)
    var k = 0
    while (k < hs.length) {
      val end = if (k + 1 < hs.length) hs(k + 1)._1 else n
      out += Section(docId, hs(k)._2, hs(k)._1, end)
      k += 1
    }
    out.result()
  }

  /** Header line ranges: [lineStart, lineEnd) of every header line — the
    * reference drops mentions that start inside a header line
    * (`1st Place/src/mimic_common.py:74-78,143`). */
  def headerLineRanges(text: String): IndexedSeq[(Int, Int)] = {
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var lineStart = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        var b = i
        while (b > lineStart && Character.isWhitespace(text.charAt(b - 1))) b -= 1
        if (b > lineStart && text.charAt(b - 1) == ':') out += ((lineStart, i))
        lineStart = i + 1
      }
      i += 1
    }
    out.result()
  }

  /** As-of lookup: the section containing `pos` (sections sorted by start). */
  def sectionAt(secs: IndexedSeq[Section], pos: Int): String = {
    var lo = 0
    var hi = secs.length - 1
    var ans = "preamble"
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (secs(mid).start <= pos) { ans = secs(mid).header; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  /** Distributed form: docs → sections (narrow, no shuffle). */
  def apply(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[Section] = {
    import spark.implicits._
    docs.flatMap(d => sections(d.doc_id, d.text))
  }
}
