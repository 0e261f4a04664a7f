package graft.plans

import graft.functions.TextFns
import graft.model._
import graft.operators._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end record-linkage pipeline (north rule / SURVEY §7.1):
  *
  *   mentions ∪ dictionary-term nodes
  *     → blocking keys (exact + sorted-neighborhood + MinHash-LSH bands)
  *     → candidate pairs (hot keys frequency-capped)
  *     → batched pairwise scoring (JW + Levenshtein + cosine, logistic fusion)
  *     → similarity edges (score ≥ 0.5) ∪ structural term→concept edges
  *     → large-star/small-star transitive clustering
  *     → mention → cluster assignment
  *
  * Node id scheme: "m:<doc:start:end>" mentions, "t:<norm>" dictionary terms,
  * "c:<conceptId>" concepts. Term-term pairs are never scored into edges —
  * dictionary terms carry known distinct concepts (the reference never merges
  * concepts; its dict keeps only unambiguous keys,
  * `1st Place/src/mimic_train.py:342-345`). A cluster containing a "c:" node
  * is that concept's entity; clusters without one are unlinked-mention groups.
  */
object LinkagePipeline {

  case class Result(assignments: DataFrame, // (id, component)
                    scored: DataFrame,      // (a, b, jw, lev_ratio, cos, score)
                    blockKeys: DataFrame,   // (id, key)
                    keyFreq: DataFrame)     // (key, freq) skew report

  /** Extract mention nodes for labeled spans via typed cogroup — the doc text
    * is never replicated per mention (one pass per doc, J5 semantics with the
    * substring done doc-side). */
  def mentionsFromSpans(docs: Dataset[Doc], spans: Dataset[GoldAnnotation])
                       (implicit spark: SparkSession): Dataset[Mention] = {
    import spark.implicits._
    docs.groupByKey(_.doc_id).cogroup(spans.groupByKey(_.doc_id)) {
      (_, docIt, spanIt) =>
        docIt.toSeq.headOption match {
          case None => Iterator.empty
          case Some(d) =>
            val text = d.text
            val secs = Sectioning.sections(d.doc_id, text)
            spanIt.map { g =>
              val surface = text.substring(g.start, math.min(g.end, text.length))
              Mention(d.doc_id, g.start, g.end, surface,
                TextFns.normalize(surface), Sectioning.sectionAt(secs, g.start))
            }
        }
    }
  }

  /** Unambiguous dictionary terms (mention → unique concept), reference
    * `most_common unique` semantics. */
  def unambiguousDict(dict: Dataset[DictEntry]): DataFrame =
    dict.toDF().groupBy("mention")
      .agg(countDistinct(col("concept_id")).as("nc"), min(col("concept_id")).as("concept_id"))
      .filter(col("nc") === 1)
      .select(col("mention"), col("concept_id"))

  def run(mentions: Dataset[Mention], dict: Dataset[DictEntry],
          weights: PairwiseScoring.Weights = PairwiseScoring.Weights(),
          hotKeyCap: Int = 1000)
         (implicit spark: SparkSession): Result = {
    val mentionNodes = mentions.toDF()
      .select(concat(lit("m:"), col("doc_id"), lit(":"), col("start"), lit(":"), col("end")).as("id"),
        col("norm"))
    val d = unambiguousDict(dict)
    val termNodes = d.select(concat(lit("t:"), col("mention")).as("id"), col("mention").as("norm"))
    val nodes = mentionNodes.union(termNodes).distinct()

    val keys = Blocking.blockKeys(nodes)
    val keyFreq = Blocking.keyFrequencies(keys)
    val pairs = Blocking.candidatePairs(keys, hotKeyCap)
      // dictionary terms are labeled distinct entities — never merge them
      // through a scored term-term edge
      .filter(!(col("a").startsWith("t:") && col("b").startsWith("t:")))
    val scored = PairwiseScoring.score(pairs, nodes, weights)
    // Linking edges use BEST-CANDIDATE semantics (the reference's top-k →
    // threshold → pick-best shape, `2nd Place/submission/infer.py:184-232`,
    // `3rd Place/src/snomedctentitylinking.py:603-646`): each mention keeps
    // only its highest-scoring dictionary term, if above threshold. An
    // absolute threshold alone cannot separate near-identical cross-concept
    // strings ("localized X" vs "generalized X"); argmax can, because the
    // mention's own term always outscores the confusable one. Mention-mention
    // scores remain in `scored` (pair diagnostics) but never form edges —
    // transitivity through concept nodes links co-referent mentions.
    val mt = scored.filter(col("a").startsWith("m:") && col("b").startsWith("t:"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("score").desc, col("b").asc)
    val simEdges = mt.withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1 && col("score") >= 0.5)
      .select(col("a"), col("b"))
    val structEdges = d.select(concat(lit("t:"), col("mention")).as("a"),
      concat(lit("c:"), col("concept_id")).as("b"))
    val components = ConnectedComponents(simEdges.union(structEdges))

    val assignments = nodes.select(col("id"))
      .join(components, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    Result(assignments, scored, keys, keyFreq)
  }

  /** Mention → concept link table: mentions clustered with a "c:" node. */
  def mentionConcepts(r: Result): DataFrame = {
    val conceptOfComponent = r.assignments
      .filter(col("id").startsWith("c:"))
      .select(col("component"), substring(col("id"), 3, 32).cast("long").as("concept_id"))
    r.assignments.filter(col("id").startsWith("m:"))
      .join(conceptOfComponent, "component")
      .select(col("id").as("mention_id"), col("concept_id"))
  }
}
