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

  /** Pure per-doc candidate generation. `firstTokens` prunes generation to
    * n-grams that start with some dictionary term's first token — on real
    * corpora that is a ~10× cut in candidate allocation (most tokens start
    * no dictionary term), which is what lets this stage scale with cores
    * instead of saturating the allocator. `null` disables the filter.
    * `caseSensitive` keeps token case (the uc-dict second pass,
    * `1st Place/src/mimic_predict.py:31-49`: a separate dictionary of
    * uppercase-only mentions — "K", "THE" — that must NOT fire on their
    * lowercase homographs). */
  def candidates(docId: String, text: String, maxTokens: Int, minStart: Int,
                 firstTokens: java.util.Set[String] = null,
                 caseSensitive: Boolean = false): Seq[Cand] = {
    val toks = TextFns.tokensWithOffsets(text, preserveCase = caseSensitive)
    if (toks.isEmpty) return Seq.empty
    val secs = Sectioning.sections(docId, text)
    val headerLines = Sectioning.headerLineRanges(text)
    var hlIdx = 0
    val out = Seq.newBuilder[Cand]
    var i = 0
    while (i < toks.length) {
      val start = toks(i)._2
      val tok0 = toks(i)._1
      val prefixOk = firstTokens == null || firstTokens.contains(tok0) ||
        (tok0.length > 3 && tok0.endsWith("s") &&
          firstTokens.contains(tok0.substring(0, tok0.length - 1))) // 1-token plural
      if (start >= minStart && prefixOk) {
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
    * Result spans still overlap — feed through OverlapResolve.
    * `caseSensitive=true` runs the uc-dict pass: dict mentions are matched
    * against case-PRESERVED doc n-grams (dict entries must then carry the
    * exact-cased mention, e.g. "THE"). */
  def annotate(docs: Dataset[Doc], dict: Dataset[DictEntry],
               maxTokens: Int = 6, minStart: Int = 100,
               caseSensitive: Boolean = false)
              (implicit spark: SparkSession): Dataset[Annotation] = {
    import spark.implicits._
    // first-token prefix filter: the dictionary is broadcast-scale by
    // assumption (it is broadcast below), so its first-token set is too
    val firstTokens: java.util.Set[String] = {
      val s = new java.util.HashSet[String]()
      dict.toDF().select(col("mention")).distinct().collect().foreach { r =>
        val m = r.getString(0)
        val cut = m.indexOf(' ')
        s.add(if (cut < 0) m else m.substring(0, cut))
      }
      s
    }
    val ftB = spark.sparkContext.broadcast(firstTokens)
    val cands = docs.flatMap(d =>
      candidates(d.doc_id, d.text, maxTokens, minStart, ftB.value, caseSensitive))
    val d = dict.toDF("dsection", "dkey", "concept_id")
    // No distinct: a span can match a dict term via exactly one key (the
    // exact and destemmed keys are different strings and dict terms are
    // unique per (section, mention)), so the join emits no duplicate rows —
    // and the overlap sweep downstream is duplicate-tolerant anyway.
    // Dropping it saves a full-row shuffle; the only remaining shuffle on
    // this path is the doc_id repartition for overlap resolution.
    cands.join(broadcast(d),
        cands("key") === d("dkey") &&
          (d("dsection") === "any" || d("dsection") === cands("section")))
      .select(col("doc_id"), col("start"), col("end"), col("concept_id"),
        col("dsection").as("section"), col("dkey").as("dict_entry"))
      .as[Annotation]
  }

  /** Max token length of any dictionary term — drives candidate n-gram depth. */
  def maxDictTokens(dict: Seq[DictEntry]): Int =
    if (dict.isEmpty) 1 else dict.iterator.map(_.mention.count(_ == ' ') + 1).max

  /** The reference's join_predictions (`1st Place/src/mimic_predict.py:43-49`):
    * concatenate the lowercase-dict and uppercase-dict prediction passes,
    * then resolve overlaps per doc. Children are re-aliased through toDF —
    * unioning two plans rooted at the same doc leaf otherwise trips
    * Union.rewriteConstraints on shared attribute ids (Spark 4.1.2). */
  def joinPredictions(preds: Dataset[Annotation]*)
                     (implicit spark: SparkSession): Dataset[Annotation] = {
    import spark.implicits._
    val u = preds.map(_.toDF()
        .toDF("doc_id", "start", "end", "concept_id", "section", "dict_entry"))
      .reduce(_ union _).as[Annotation]
    OverlapResolve.apply(u)
  }
}
