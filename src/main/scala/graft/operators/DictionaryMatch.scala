package graft.operators

import graft.model._
import graft.functions.TextFns
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Gazetteer / dictionary matching — the blocking join J7, Spark-first.
  *
  * The reference compiles a whitespace-tolerant regex per dictionary term and
  * scans every note with every pattern (`1st Place/src/mimic_common.py:53-71,
  * 127-161`) — O(|dict| × |corpus|) single-threaded work. We invert it:
  * each doc emits its token n-grams (n ≤ max dictionary term length) keyed by
  * the same canonical normalization applied to dictionary terms, and the
  * match is a broadcast hash equi-join on that key. Catalyst keeps the whole
  * path shuffle-free: doc → flatMap candidates (narrow) → BroadcastHashJoin.
  *
  * Matching-fidelity notes vs the reference matcher:
  *  - `\s+`/`[- ]`/`[/ ]` tolerance  → both sides normalized (TextFns.normalize)
  *  - trailing `s*` on every pattern → candidate n-grams also emit a
  *    last-token-destemmed key, so dict "cough" matches text "coughs"
  *  - word-boundary guards            → tokens are maximal alnum runs
  *  - pos ≥ 100 guard                 → `minStart` (mimic_common.py:139)
  *  - header-line veto                → headerLineRanges (mimic_common.py:143)
  *  - medication/service/DOB veto     → Sectioning.isVetoSection (l. 148)
  *  - section key match               → join predicate section='any' or equal
  */
object DictionaryMatch {

  /** One candidate doc n-gram (guards already applied in-row). */
  case class Cand(doc_id: String, start: Int, end: Int, key: String, section: String)

  /** Pure per-doc candidate generation. */
  def candidates(docId: String, text: String, maxTokens: Int, minStart: Int): Seq[Cand] = {
    val toks = TextFns.tokensWithOffsets(text)
    if (toks.isEmpty) return Seq.empty
    val secs = Sectioning.sections(docId, text)
    val headerLines = Sectioning.headerLineRanges(text)
    var hlIdx = 0
    val out = Seq.newBuilder[Cand]
    var i = 0
    while (i < toks.length) {
      val start = toks(i)._2
      if (start >= minStart) {
        // advance header-line cursor (token starts are increasing)
        while (hlIdx < headerLines.length && headerLines(hlIdx)._2 <= start) hlIdx += 1
        val inHeader = hlIdx < headerLines.length &&
          headerLines(hlIdx)._1 <= start && start < headerLines(hlIdx)._2
        if (!inHeader) {
          val section = Sectioning.sectionAt(secs, start)
          if (!Sectioning.isVetoSection(section)) {
            val sb = new StringBuilder
            var j = i
            while (j < toks.length && j - i < maxTokens) {
              if (j > i) sb.append(' ')
              sb.append(toks(j)._1)
              val end = toks(j)._3
              val key = sb.toString
              out += Cand(docId, start, end, key, section)
              val last = toks(j)._1
              if (last.length > 3 && last.endsWith("s"))
                out += Cand(docId, start, end,
                  key.substring(0, key.length - 1), section)
              j += 1
            }
          }
        }
      }
      i += 1
    }
    out.result()
  }

  /** Distributed gazetteer annotation: docs ⋈ broadcast(dict).
    * Result spans still overlap — feed through OverlapResolve. */
  def annotate(docs: Dataset[Doc], dict: Dataset[DictEntry],
               maxTokens: Int = 6, minStart: Int = 100)
              (implicit spark: SparkSession): Dataset[Annotation] = {
    import spark.implicits._
    val cands = docs.flatMap(d => candidates(d.doc_id, d.text, maxTokens, minStart))
    val d = dict.toDF("dsection", "dkey", "concept_id")
    cands.join(broadcast(d),
        cands("key") === d("dkey") &&
          (d("dsection") === "any" || d("dsection") === cands("section")))
      .select(col("doc_id"), col("start"), col("end"), col("concept_id"),
        col("dsection").as("section"), col("dkey").as("dict_entry"))
      .distinct()
      .as[Annotation]
  }

  /** Max token length of any dictionary term — drives candidate n-gram depth. */
  def maxDictTokens(dict: Seq[DictEntry]): Int =
    if (dict.isEmpty) 1 else dict.iterator.map(_.mention.count(_ == ' ') + 1).max
}
