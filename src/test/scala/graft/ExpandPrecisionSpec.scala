package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.model._
import graft.operators.DictTrain

/** F9 full permutation/word-replacement expansion + A4 corpus-precision
  * pruning (2nd Place static_dict calc_ratio/filt_by_ratio). */
class ExpandPrecisionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("expandEntries reproduces the reference branch structure") {
    def expand(m: String, bl: Set[String] = Set.empty): Set[String] =
      DictTrain.expandEntries(Seq(DictEntry("any", m, 1L)).toDS(), bl)
        .collect().map(_.mention).toSet

    // 3 words with 'of' middle → rotation only
    assert(expand("fracture of femur") == Set("fracture of femur", "femur fracture",
      "fracture of the femur"))
    // 4 words, of at index 1 → one rotation (+ " of " → " of the ")
    assert(expand("fracture of acute femur") ==
      Set("fracture of acute femur", "acute femur fracture",
        "fracture of the acute femur"))
    // 4 words, of at index 2 → two rotations
    assert(expand("acute fracture of femur") ==
      Set("acute fracture of femur", "femur acute fracture", "acute femur fracture",
        "acute fracture of the femur"))
    // 4 words, no 'of' → NOTHING (the reference's n==4 elif shadows the
    // all-permutations branch)
    assert(expand("very acute femur fracture") == Set("very acute femur fracture"))
    // 3 words, no 'of' → all 6 permutations
    assert(expand("acute femur fracture").size == 6)
    // ... unless a word is blacklisted
    assert(expand("acute femur fracture", Set("femur")) == Set("acute femur fracture"))
    // word replacements
    assert(expand("pain and swelling") ==
      Set("pain and swelling", "pain with swelling",
        "and pain swelling", "and swelling pain", "pain swelling and",
        "swelling and pain", "swelling pain and"))
  }

  test("pruneByCorpusPrecision drops terms that fire mostly outside annotations") {
    val nConcepts = 120
    val (docsSeq, goldsSeq) = Synth.corpus(40, nConcepts)
    val docs = spark.createDataset(docsSeq)
    val golds = spark.createDataset(goldsSeq)
    // dict: real concept names (high precision) + a common template word
    // ("patient": floods the corpus, never annotated)
    val dict = (Synth.dictionary(nConcepts, includeAbbrs = false).take(50) :+
      DictEntry("any", "patient", 999L)).toDS()
    val kept = DictTrain.pruneByCorpusPrecision(docs, golds, dict, threshold = 0.25)
      .collect().map(_.mention).toSet
    assert(!kept.contains("patient"))
    // planted names that actually occur in gold survive
    val goldNorms = goldsSeq.map { g =>
      graft.functions.TextFns.normalize(
        docsSeq.find(_.doc_id == g.doc_id).get.text.substring(g.start, g.end))
    }.toSet
    val dictFindable = dict.collect().map(_.mention)
      .filter(m => goldNorms.contains(m)).toSet
    assert(dictFindable.nonEmpty)
    assert((dictFindable -- kept).size.toDouble / dictFindable.size < 0.3,
      s"most gold-occurring terms should survive: missing ${dictFindable -- kept}")
  }
}
