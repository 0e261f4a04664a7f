package graft.sources

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks (SURVEY §2.1).
  *
  * S1 header CSV (notes/annotations), S2 gzip CSV (codec auto-detected by
  * extension), S3 TSV with quoting disabled (RF2/Athena,
  * `1st Place/src/process_data.py:147-153` uses QUOTE_NONE), S4 parquet
  * checkpoint tables (the Iceberg stand-in in this jar set), S5 artifact
  * tables (dictionaries as plain relations instead of pickles), S6 the
  * submission CSV with exactly (note_id,start,end,concept_id)
  * (`1st Place/src/mimic_submission_main.py:25-26`).
  */
object Readers {

  // ---- S1: notes/annotations CSV (header row, explicit schema) ----
  val notesSchema: StructType = StructType(Seq(
    StructField("note_id", StringType), StructField("text", StringType)))
  val annotationsSchema: StructType = StructType(Seq(
    StructField("note_id", StringType), StructField("start", IntegerType),
    StructField("end", IntegerType), StructField("concept_id", LongType)))

  /** Works for plain and gzip CSV alike (S2: codec from extension). */
  def notesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"").schema(notesSchema).csv(path)

  def annotationsCsv(spark: SparkSession, path: String): Dataset[GoldAnnotation] = {
    import spark.implicits._
    spark.read.option("header", "true").schema(annotationsSchema).csv(path)
      .withColumnRenamed("note_id", "doc_id").as[GoldAnnotation]
  }

  // ---- S3: RF2 snapshot TSVs (tab-separated, header, quoting disabled) ----
  private def tsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("sep", "\t").option("quote", "")
      .csv(path)

  /** sct2_Concept: id, effectiveTime, active, moduleId, definitionStatusId. */
  def rf2Concepts(spark: SparkSession, path: String): Dataset[Concept] = {
    import spark.implicits._
    tsv(spark, path)
      .select(col("id").cast("long").as("concept_id"),
        col("active").cast("int").as("active"))
      .as[Concept]
  }

  /** sct2_Description: id, …, conceptId, …, typeId, term, … with
    * FSN = 900000000000003001, SYN = 900000000000013009
    * (`1st Place/src/process_data.py:63`). */
  def rf2Descriptions(spark: SparkSession, path: String): Dataset[Description] = {
    import spark.implicits._
    tsv(spark, path)
      .select(col("conceptId").cast("long").as("concept_id"),
        col("term").as("term"),
        when(col("typeId") === "900000000000003001", "FSN").otherwise("SYN").as("typ"),
        col("active").cast("int").as("active"))
      .as[Description]
  }

  /** sct2_Relationship: sourceId, destinationId, typeId, active. */
  def rf2Relationships(spark: SparkSession, path: String): Dataset[Relationship] = {
    import spark.implicits._
    tsv(spark, path)
      .select(col("sourceId").cast("long").as("source_id"),
        col("destinationId").cast("long").as("dest_id"),
        col("typeId").cast("long").as("type_id"),
        col("active").cast("int").as("active"))
      .as[Relationship]
  }

  // ---- S4/S5: parquet checkpoint / artifact tables ----
  def writeDocs(docs: Dataset[Doc], path: String): Unit =
    docs.write.mode(SaveMode.Overwrite).parquet(path)

  def readDocs(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(path).as[Doc]
  }

  def writeDict(dict: Dataset[DictEntry], path: String): Unit =
    dict.write.mode(SaveMode.Overwrite).parquet(path)

  def readDict(spark: SparkSession, path: String): Dataset[DictEntry] = {
    import spark.implicits._
    spark.read.parquet(path).as[DictEntry]
  }

  // ---- F20: JSON synonym-dict sink/source ----
  /** The reference persists concept→synonyms maps as JSON
    * (`2nd Place/src/preprocess.py:127-131` json.dump of
    * {sctid: [synonyms]}, read back at `2nd Place/src/data.py:14-18` with
    * keys destringized to int). One JSON object per line here —
    * {"concept_id": N, "synonyms": [...]} — so the sink/source stay
    * partition-parallel instead of one driver-side map literal. */
  val synJsonSchema: StructType = StructType(Seq(
    StructField("concept_id", LongType),
    StructField("synonyms", ArrayType(StringType))))

  def writeSynJson(syn: DataFrame, path: String, coalesceOne: Boolean = false): Unit = {
    val out = syn.select(col("concept_id").cast("long"), col("synonyms"))
    (if (coalesceOne) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).json(path)
  }

  /** Explicit schema: inference would scan the data once just to type it. */
  def readSynJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(synJsonSchema).json(path)

  // ---- S6: submission sink — exactly (note_id, start, end, concept_id) ----
  def writeSubmission(pred: DataFrame, path: String, coalesceOne: Boolean = false): Unit = {
    val out = pred.select(col("doc_id").as("note_id"), col("start"), col("end"),
      col("concept_id"))
    (if (coalesceOne) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }
}
