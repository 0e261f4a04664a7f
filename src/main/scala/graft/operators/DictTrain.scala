package graft.operators

import graft.functions.TextFns
import graft.model._
import graft.plans.LinkagePipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary construction — the 1st-place training pipeline (SURVEY §3.2,
  * `1st Place/src/mimic_train.py:327-379,475-500`), all-relational:
  *
  *  - corpus word counter → frequency blacklist             [A3, lines 30-42]
  *  - (section, mention) → modal concept, kept iff unique   [A1, lines 45-63,342-345]
  *  - terminology synonyms via concepts ⋈ descriptions      [J1, process_data.py:58-60]
  *  - external-vocabulary synonyms via the Athena-style
  *    3-way mapping join                                    [J2, process_data.py:200-224]
  *  - abbreviation ⋈ concept-name lowercase-equality join   [J8, process_data.py:268-291]
  *  - permutation / word-replacement expansions             [F8/F9, mimic_train.py:198-240]
  *  - dict scored against training annotations (+1 exact
  *    span+concept match / −1 otherwise), keys dropped when
  *    correct < θ · incorrect                               [M5/A5/O6, mimic_train.py:66-134,243-263]
  */
object DictTrain {

  /** A3: whitespace word counts over doc text; returns words above cutoff
    * (the reference's `blacklist_thresh=2000` idea, scaled by corpus). */
  def wordBlacklist(docs: Dataset[Doc], cutoff: Long)
                   (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.flatMap(d => TextFns.normalize(d.text).split(' '))
      .toDF("word")
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") > cutoff)
  }

  /** A1: harvest (section, mention-norm) → concept from labeled spans; keep
    * a key only when its modal concept is the unique majority (tie-break
    * pinned (count desc, concept_id asc); uniqueness = strict majority). */
  def dictFromAnnotations(docs: Dataset[Doc], golds: Dataset[GoldAnnotation])
                         (implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    val mentions = LinkagePipeline.mentionsFromSpans(docs, golds).toDF()
      .select(col("doc_id"), col("start"), col("end"), col("norm"), col("section"))
    val labeled = mentions.join(golds.toDF(), Seq("doc_id", "start", "end"))
    val counted = labeled.groupBy(col("section"), col("norm"), col("concept_id"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("section"), col("norm"))
      .orderBy(col("cnt").desc, col("concept_id").asc)
    counted
      .withColumn("rn", row_number().over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("section"), col("norm"))))
      .filter(col("rn") === 1 && col("cnt") * 2 > col("total"))
      .select(col("section"), col("norm").as("mention"), col("concept_id"))
      .as[DictEntry]
  }

  /** J1: active concepts ⋈ active descriptions; FSN tag stripped (F3/F4). */
  def dictFromTerminology(concepts: Dataset[Concept], descriptions: Dataset[Description])
                         (implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    val c = concepts.filter(_.active == 1).toDF()
    val d = descriptions.filter(_.active == 1).toDF()
    c.join(d, "concept_id")
      .withColumn("term_clean",
        when(col("typ") === "FSN", regexp_replace(col("term"), "\\s*\\([^)]*\\)$", ""))
          .otherwise(col("term")))
      .select(lit("any").as("section"),
        normalizeUdf(col("term_clean")).as("mention"), col("concept_id"))
      .filter(length(col("mention")) >= 3) // P3: drop too-short synonyms
      .distinct()
      .as[DictEntry]
  }

  /** J2: the Athena-style 3-way join — ext concept (valid vocabulary) →
    * 'Maps to' relationship → SNOMED concept id; the ext NAME becomes a
    * synonym of the mapped concept. */
  def dictFromExternal(extConcepts: DataFrame, extMappings: DataFrame,
                       invalidVocabs: Seq[String] = Seq("FAKEVOCAB1"))
                      (implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    extConcepts
      .filter(!col("vocabulary").isin(invalidVocabs: _*)) // P4 vocab blacklist
      .join(extMappings.filter(col("relationship") === "Maps to"),
        col("ext_id") === col("ext_id_1"))
      .select(lit("any").as("section"),
        normalizeUdf(col("name")).as("mention"),
        col("ext_id_2").as("concept_id"))
      .distinct()
      .as[DictEntry]
  }

  /** J8: abbreviation ⋈ concept names on lowercase equality (plus the
    * prefix-before-"(" variant handled by FSN cleaning upstream). */
  def abbreviationEntries(abbr: DataFrame, dict: Dataset[DictEntry])
                         (implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    abbr.join(dict.toDF(),
        normalizeUdf(col("meaning")) === col("mention"))
      .select(col("section"), normalizeUdf(col("abbr")).as("mention"), col("concept_id"))
      .filter(length(col("mention")) >= 3)
      .distinct()
      .as[DictEntry]
  }

  /** F8/F9: deterministic expansions — "A B C" → "C of A B" permutation,
    * " of " insertion/removal variants. */
  def expandEntries(dict: Dataset[DictEntry])(implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    dict.flatMap { e =>
      val parts = e.mention.split(' ')
      val perms =
        if (parts.length == 3 && !parts.contains("of"))
          Seq(s"${parts(2)} of ${parts(0)} ${parts(1)}")
        else if (parts.length == 4 && parts(1) == "of")
          Seq(s"${parts(2)} ${parts(3)} ${parts(0)}")
        else Seq.empty
      (Seq(e.mention) ++ perms).distinct.map(m => DictEntry(e.section, m, e.concept_id))
    }
  }

  /** M5/A5/O6: score each dict key against training gold — an emitted
    * annotation counts +1 on exact (doc,start,end,concept) match, −1
    * otherwise; keys with correct < θ·incorrect are dropped. */
  def pruneByScore(docs: Dataset[Doc], golds: Dataset[GoldAnnotation],
                   dict: Dataset[DictEntry], theta: Double = 0.3)
                  (implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    val pred = OverlapResolve.apply(DictionaryMatch.annotate(docs, dict))
    val g = golds.toDF().withColumn("hit", lit(1))
    val scoredKeys = pred.toDF()
      .join(g, Seq("doc_id", "start", "end", "concept_id"), "left_outer")
      .withColumn("correct", when(col("hit").isNotNull, 1).otherwise(0))
      .groupBy(col("section"), col("dict_entry").as("mention"))
      .agg(sum(col("correct")).as("n_correct"),
        sum(lit(1) - col("correct")).as("n_incorrect"))
    dict.toDF().join(scoredKeys, Seq("section", "mention"), "left_outer")
      .filter(col("n_correct").isNull || // never fired on train: keep
        col("n_correct") >= col("n_incorrect") * theta)
      .select(col("section"), col("mention"), col("concept_id"))
      .as[DictEntry]
  }

  /** F10: mentions whose gold occurrences are ≥99% uppercase in the raw text
    * (the reference builds a separate case-sensitive dict from these). */
  def uppercaseMentions(docs: Dataset[Doc], golds: Dataset[GoldAnnotation])
                       (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = LinkagePipeline.mentionsFromSpans(docs, golds).toDF()
    m.select(col("norm"),
        when(col("surface") === upper(col("surface")), 1.0).otherwise(0.0).as("uc"))
      .groupBy("norm").agg(avg(col("uc")).as("uc_ratio"), count(lit(1)).as("n"))
      .filter(col("uc_ratio") > 0.99)
  }

  /** The full training pipeline, split into (lowercase dict, case-sensitive
    * uppercase dict) — the two dictionaries of the 1st-place inference
    * (`mimic_train.py:extract_uppercase_mentions` + `mimic_predict.py:31-49`):
    * harvested + terminology + external + abbreviation entries, expanded;
    * keys whose gold surfaces are ≥99% uppercase move UPPERCASED into the
    * case-sensitive dict (they would otherwise fire on their lowercase
    * homographs — "the" vs initialism "THE"); the lowercase remainder is
    * score-pruned. */
  def trainDictionarySplit(docs: Dataset[Doc], golds: Dataset[GoldAnnotation],
                           concepts: Dataset[Concept], descriptions: Dataset[Description],
                           extConcepts: DataFrame, extMappings: DataFrame, abbr: DataFrame,
                           theta: Double = 0.3)
                          (implicit spark: SparkSession): (Dataset[DictEntry], Dataset[DictEntry]) = {
    import spark.implicits._
    val harvested = dictFromAnnotations(docs, golds)
    val term = dictFromTerminology(concepts, descriptions)
    val ext = dictFromExternal(extConcepts, extMappings)
    val base = expandEntries(harvested.union(term).union(ext)).distinct()
    val withAbbr = base.union(abbreviationEntries(abbr, base)).distinct()
    val ucNorms = uppercaseMentions(docs, golds).select(col("norm"))
    val ucDict = withAbbr.toDF().join(ucNorms, col("mention") === col("norm"))
      .select(col("section"), upper(col("mention")).as("mention"), col("concept_id"))
      .distinct().as[DictEntry]
    val lcDict = withAbbr.toDF()
      .join(ucNorms, col("mention") === col("norm"), "left_anti")
      .as[DictEntry]
    (pruneByScore(docs, golds, lcDict, theta), ucDict)
  }

  /** Combined view of the split dictionaries (uc entries carry UPPERCASE
    * mentions — the case marker IS the key). */
  def trainDictionary(docs: Dataset[Doc], golds: Dataset[GoldAnnotation],
                      concepts: Dataset[Concept], descriptions: Dataset[Description],
                      extConcepts: DataFrame, extMappings: DataFrame, abbr: DataFrame,
                      theta: Double = 0.3)
                     (implicit spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    val (lc, uc) = trainDictionarySplit(docs, golds, concepts, descriptions,
      extConcepts, extMappings, abbr, theta)
    lc.toDF().toDF("section", "mention", "concept_id")
      .union(uc.toDF().toDF("section", "mention", "concept_id"))
      .as[DictEntry]
  }

  /** The 1st-place two-pass inference: lowercase-dict annotate ∪
    * case-sensitive uc-dict annotate → per-doc overlap resolution
    * (`mimic_predict.py:31-49` + join_predictions). */
  def infer(docs: Dataset[Doc], lcDict: Dataset[DictEntry], ucDict: Dataset[DictEntry])
           (implicit spark: SparkSession): Dataset[Annotation] =
    DictionaryMatch.joinPredictions(
      DictionaryMatch.annotate(docs, lcDict),
      DictionaryMatch.annotate(docs, ucDict, caseSensitive = true))

  val normalizeUdf = udf((s: String) => TextFns.normalize(s))
}
