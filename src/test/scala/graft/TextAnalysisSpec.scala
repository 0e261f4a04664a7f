package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("language id on multilingual fixtures") {
    assert(TextAnalysis.detectLanguage(
      "the patient was admitted to the ward and this is a note for the doctor") == "en")
    assert(TextAnalysis.detectLanguage(
      "le patient est admis dans le service et les notes sont pour le médecin") == "fr")
    assert(TextAnalysis.detectLanguage(
      "el paciente es admitido en la sala y una nota para el médico con los datos") == "es")
    assert(TextAnalysis.detectLanguage(
      "der Patient ist mit einem Befund und die Notiz für den Arzt nicht da") == "de")
    assert(TextAnalysis.detectLanguage("病人已入院，这是给医生的记录。") == "zh")
    assert(TextAnalysis.detectLanguage("zzz qqq xxx") == "und")
  }

  test("languageId runs distributed") {
    val df = Seq((1L, "the and of to in is"), (2L, "le la les de et est"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr"))
  }

  test("quality features are bounded and deterministic") {
    val df = Seq((1L, "The quick brown fox jumps over the lazy dog 123 ABC"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df).collect().head
    val space = r.getDouble(r.fieldIndex("space_ratio"))
    val quality = r.getDouble(r.fieldIndex("quality"))
    assert(space > 0 && space < 1)
    assert(quality <= 1.0)
    assert(r.getDouble(r.fieldIndex("n_tokens")) == 11.0)
  }

  test("fingerprints are stable across runs and discriminative") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different content here about other things entirely")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L)._1 != fp(3L)._1)
    assert(fp(1L)._2 != fp(3L)._2)
  }
}
