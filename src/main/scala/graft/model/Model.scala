package graft.model

/** Core data model for the graft record-linkage engine.
  *
  * Mirrors the relations the reference computes over (see SURVEY.md §1):
  *  - docs: interleaved text+media spans (BASELINE.json input_hint), the
  *    generalization of the reference's `notes(note_id, text)` CSV
  *    (reference: `1st Place/src/mimic_dev_main.py:38-40`).
  *  - mentions/annotations: half-open char intervals [start, end) into the
  *    concatenation of the doc's kind='text' span texts
  *    (reference: `1st Place/src/process_data.py:126-143`).
  *  - terminology: SNOMED-like concepts/descriptions/relationships
  *    (reference: `1st Place/src/process_data.py:45-66,328-346`).
  *
  * All SCT-like ids are Long (SCTIDs are up to 18 digits, see
  * `1st Place/src/process_data.py:63`).
  */

/** One interleaved fragment of a document. kind ∈ {"text","media"}.
  * For kind="text": `text` holds the fragment, `mediaRef` is "".
  * For kind="media": `text` is "", `mediaRef` is "media://<id>".
  * `offset` is the cumulative char offset of this fragment's start within
  * the concatenation of all *text* fragments of the doc (media spans carry
  * the offset at which they sit between text fragments).
  */
case class DocSpan(kind: String, text: String, media_ref: String, offset: Int)

/** A document = ordered interleaved text+media spans (input_hint shape). */
case class Doc(doc_id: String, spans: Seq[DocSpan]) {
  /** The "note text": concatenation of kind='text' span texts, in order. */
  def text: String = spans.iterator.filter(_.kind == "text").map(_.text).mkString
}

/** A section of a doc, [start,end) into the doc text; header is the
  * gazetteer header (or "other"). Reference: `1st Place/src/mimic_common.py:94-124`. */
case class Section(doc_id: String, header: String, start: Int, end: Int)

/** An extracted candidate mention (pre-linking). `norm` is the normalized
  * surface form used for blocking/matching. */
case class Mention(doc_id: String, start: Int, end: Int, surface: String, norm: String, section: String) {
  /** Stable mention id, FIXTURES.md §2: concat(note_id,':',start,':',end). */
  def mentionId: String = s"$doc_id:$start:$end"
}

/** A linked/annotated span — the reference's canonical annotation record
  * (`1st Place/src/mimic_common.py:128`). */
case class Annotation(doc_id: String, start: Int, end: Int, concept_id: Long,
                      section: String, dict_entry: String)

/** Ground-truth label row (FIXTURES.md §2). */
case class GoldAnnotation(doc_id: String, start: Int, end: Int, concept_id: Long)

/** Dictionary entry: normalized mention key -> concept, valid in `section`
  * ("any" = everywhere; reference keys dicts by (section|tuple|"any", mention),
  * `1st Place/src/mimic_train.py:45-63`). */
case class DictEntry(section: String, mention: String, concept_id: Long)

/** Terminology rows (FIXTURES.md §3). */
case class Concept(concept_id: Long, active: Int)
case class Description(concept_id: Long, term: String, typ: String, active: Int)
case class Relationship(source_id: Long, dest_id: Long, type_id: Long, active: Int)

/** A blocking key assignment: one mention may emit many keys
  * (MinHash-LSH bands + sorted-neighborhood prefixes). */
case class BlockKey(mention_id: String, key: String)

/** A scored candidate pair (mention ids ordered a < b). */
case class ScoredPair(a: String, b: String, jw: Double, lev: Double, cos: Double, score: Double)

/** Final cluster assignment: mention -> representative (min mention id). */
case class ClusterAssignment(mention_id: String, cluster_id: String)

object Relationship {
  /** SNOMED Is-A relationship type id (`1st Place/src/process_data.py:328`). */
  val IsA: Long = 116680003L
}
