package graft.operators

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Term-extension attribute table — the J4/U3 operator of the 1st-place
  * training pipeline (`1st Place/src/process_data.py:360-417`):
  *
  *   active FSN descriptions ⋈ active Is-A relationships, the SAME
  *   description table joined for the source and the destination name;
  *   a (specific, general) pair is an "attribute extension" when, after
  *   lowercasing and stripping the FSN tag, the specific name's word SET
  *   minus the general's minus stop words is EXACTLY ONE word and the
  *   general contributes no word of its own — that word is the attribute
  *   ("left", "right", ...).
  *
  * Spark-first shape: the reference materializes the 3-way pandas merge and
  * then loops rows in Python; here the joins stay Catalyst equi-joins and
  * the word-set algebra is `array_except` over `split` columns — fully
  * codegen-able, shuffles only on the two join keys (and the description
  * side is dimension-scale, so AQE broadcasts it).
  */
object TermExtension {

  /** The reference's stop-word list (`process_data.py:392-394`). */
  val stopWords: Seq[String] =
    ("a an and are as at be but by for if in into is it no not of on or such " +
      "that the their then there these they this to was will with").split(' ').toSeq

  /** descriptions (FSN rows) + relationships (Is-A) →
    * (general_id, general_name, specific_id, specific_name, additional_word).
    */
  def termExtensions(relationships: Dataset[Relationship],
                     descriptions: Dataset[Description])
                    (implicit spark: SparkSession): DataFrame = {
    val fsn = descriptions.toDF()
      .filter(col("active") === 1 && col("typ") === "FSN")
      .select(col("concept_id"), col("term"))
      .dropDuplicates("concept_id")
    val rels = relationships.toDF()
      .filter(col("active") === 1 && col("type_id") === Relationship.IsA)
      .select(col("source_id"), col("dest_id"))
      .distinct()
    // lowercase, strip from the first '(' (the FSN tag), split on
    // whitespace, de-dup to a word SET, drop empties
    def wordSet(c: org.apache.spark.sql.Column) =
      array_remove(array_distinct(split(
        trim(regexp_extract(lower(c), "^([^(]*)", 1)), "\\s+")), "")
    val stops = lit(stopWords.toArray)
    val joined = rels
      .join(fsn.select(col("concept_id").as("source_id"),
        col("term").as("specific_name")), "source_id")
      .join(fsn.select(col("concept_id").as("dest_id"),
        col("term").as("general_name")), "dest_id")
      .withColumn("s_words", wordSet(col("specific_name")))
      .withColumn("d_words", wordSet(col("general_name")))
      .withColumn("s_min_d",
        array_except(array_except(col("s_words"), col("d_words")), stops))
      .withColumn("d_min_s",
        array_except(array_except(col("d_words"), col("s_words")), stops))
    joined
      .filter(size(col("d_min_s")) === 0 && size(col("s_min_d")) === 1)
      .select(
        col("dest_id").as("general_id"),
        col("general_name"),
        col("source_id").as("specific_id"),
        col("specific_name"),
        element_at(col("s_min_d"), 1).as("additional_word"))
  }
}
