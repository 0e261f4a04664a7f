package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting. All narrow (per-row)
  * transforms — they fuse into the scan under whole-stage codegen except the
  * langid/fingerprint UDF calls, which are deterministic pure Scala.
  */
object TextAnalysis {

  /** Tiny deterministic stopword profiles for an n-gram/stopword language-ID
    * heuristic (public-knowledge function words only). CJK is detected by
    * codepoint range first; otherwise the language with the most stopword
    * hits wins, ties alphabetical; no hits → "und". */
  val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "was", "with", "for", "that", "this", "are"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que", "une", "avec"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "es", "en", "por", "que", "una", "con"),
    "de" -> Set("der", "die", "das", "und", "ist", "mit", "von", "für", "nicht", "ein", "eine", "zu"),
    "pt" -> Set("o", "os", "de", "e", "em", "um", "uma", "para", "com", "não", "que", "do"))

  def detectLanguage(text: String): String = {
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.3) return "zh"
    val toks = TextFns.normalize(text).split(' ')
    val scores = profiles.view.mapValues(p => toks.count(p.contains)).toMap
    val best = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (best._2 == 0) "und" else best._1
  }

  val langIdUdf = udf(detectLanguage _)

  /** docs(doc_id, text) → language prediction + confidence proxy. */
  def languageId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langIdUdf(col("text")).as("lang_pred"))

  /** Quality features in pure column expressions (codegen'd, no UDF):
    * length, token count, mean token length, space/digit/upper ratios,
    * stopword ratio, and a fused [0,1] quality score. */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val len = length(col("text")).cast("double")
    val spaces = (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("double")
    val digits = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val uppers = length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double")
    val toks = size(split(trim(col("text")), "\\s+")).cast("double")
    val stopHits = size(filter(split(lower(col("text")), "\\s+"),
      t => t.isin(profiles("en").toSeq.map(lit(_)): _*))).cast("double")
    docs.filter(length(col("text")) > 0).select(
      col("doc_id"),
      len.as("n_chars"),
      toks.as("n_tokens"),
      round(len / greatest(toks, lit(1.0)), 4).as("mean_token_len"),
      round(spaces / len, 4).as("space_ratio"),
      round(digits / len, 4).as("digit_ratio"),
      round(uppers / len, 4).as("upper_ratio"),
      round(stopHits / greatest(toks, lit(1.0)), 4).as("stopword_ratio"),
      round(
        lit(1.0)
          - least(lit(1.0), abs(spaces / len - lit(0.16)) * 3)
          - least(lit(0.5), digits / len * 2)
          - least(lit(0.5), uppers / len), 4).as("quality"))
  }

  /** Document fingerprints: 64-bit rolling hash of the full text + simhash
    * over word shingles (near-dup sketch) + first MinHash band. */
  def fingerprints(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val sh = Dedup.wordShingles(text)
        (id,
          TextFns.fingerprint64(text),
          TextFns.simHashOfSet(sh),
          TextFns.bandKeys(TextFns.minHashOfSet(sh, 16), 4)(0))
      }.toDF("doc_id", "content_hash", "simhash", "minhash_band0")
  }
}
