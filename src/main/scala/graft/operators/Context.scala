package graft.operators

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Mention context extraction — the features the 3rd-place solution feeds
  * its entity-linking stage:
  *
  *  - F14 ±N-word window (`3rd Place/src/snomedctentitylinking.py:558-592`
  *    extract_context): the mention text plus up to N whitespace words on
  *    each side.
  *  - F13 section-conditioned template (`3rd Place/src/document.py:855-871`
  *    extract_context_for_terms): a section-specific phrase wrapper
  *    ("Allergies" → "Allergy to X finding", "Chief Complaint" →
  *    "Disorder of X", surgical procedures → "X procedure").
  *
  * Spark shape: per-doc cogroup (doc text crosses the wire once, windows
  * are computed in-row), template is a codegen'd column expression.
  */
object Context {

  /** extract_context transcription: word-index arithmetic over
    * whitespace-split words. */
  def contextWindow(text: String, start: Int, end: Int,
                    numWordsBefore: Int = 5, numWordsAfter: Int = 5): String = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val wordsBefore = text.substring(0, math.min(start, text.length))
      .split("\\s+").count(_.nonEmpty)
    val wordsAfter = text.substring(math.min(end, text.length))
      .split("\\s+").count(_.nonEmpty)
    val startWordIndex = wordsBefore
    val endWordIndex = words.length - wordsAfter - 1
    val startContext = math.max(0, startWordIndex - numWordsBefore)
    val endContext = math.min(words.length, endWordIndex + numWordsAfter + 1)
    words.slice(startContext, endContext).mkString(" ")
  }

  /** F13 template as a column expression over (section, term) — sections
    * are our normalized lowercase headers. */
  def sectionTemplate(section: org.apache.spark.sql.Column,
                      term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(section === "allergies", concat(lit("Allergy to "), term, lit(" finding")))
      .when(section === "chief complaint", concat(lit("Disorder of "), term))
      .when(section === "major surgical or invasive procedure",
        concat(term, lit(" procedure")))
      .otherwise(term)

  /** Distributed context table: annotations + their ±N-word windows,
    * section template applied. Output (doc_id, start, end, concept_id,
    * section, term, context, templated). */
  def mentionContexts(docs: Dataset[Doc], anns: Dataset[Annotation],
                      numWordsBefore: Int = 5, numWordsAfter: Int = 5)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = docs.groupByKey(_.doc_id).cogroup(anns.groupByKey(_.doc_id)) {
      (_, docIt, annIt) =>
        docIt.toSeq.headOption match {
          case None => Iterator.empty
          case Some(d) =>
            val text = d.text
            annIt.map { a =>
              val term = text.substring(math.min(a.start, text.length),
                math.min(a.end, text.length))
              (a.doc_id, a.start, a.end, a.concept_id, a.section, term,
                contextWindow(text, a.start, a.end, numWordsBefore, numWordsAfter))
            }
        }
    }.toDF("doc_id", "start", "end", "concept_id", "section", "term", "context")
    rows.withColumn("templated", sectionTemplate(col("section"), col("term")))
  }
}
