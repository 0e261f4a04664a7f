package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.functions.TextFns
import graft.metrics.Metrics
import graft.operators.{DictTrain, DictionaryMatch, OverlapResolve}
import org.apache.spark.sql.functions._

/** The uc-dict inference path (F10 + `1st Place/src/mimic_predict.py:31-49`):
  * a separate case-sensitive dictionary for mentions that only ever occur
  * uppercase (initialisms), so they link when uppercase and never fire on
  * their lowercase homographs. */
class UcDictSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  val nConcepts = 150
  val nDocs = 80
  lazy val (docsSeq, goldsSeq) = Synth.corpus(nDocs, nConcepts)
  lazy val docs = spark.createDataset(docsSeq)
  lazy val golds = spark.createDataset(goldsSeq)

  def plantedAbbrGolds = {
    val abbrIds = (0 until nConcepts)
      .flatMap(i => Synth.abbrOf(i, nConcepts).map(Synth.conceptId(i) -> _)).toMap
    goldsSeq.filter { g =>
      abbrIds.get(g.concept_id).exists { abbr =>
        val d = docsSeq.find(_.doc_id == g.doc_id).get.text
        d.substring(g.start, g.end) == abbr
      }
    }
  }

  test("synth corpus plants uppercase-only abbreviation mentions, incl. homographs") {
    assert(plantedAbbrGolds.nonEmpty)
    val surfaces = plantedAbbrGolds.map(g =>
      docsSeq.find(_.doc_id == g.doc_id).get.text.substring(g.start, g.end)).toSet
    assert(surfaces.exists(Synth.homographAbbrs.contains),
      s"expected a homograph abbreviation among $surfaces")
  }

  test("uppercaseMentions flags exactly the norms whose gold surfaces are all-uppercase") {
    val flagged = DictTrain.uppercaseMentions(docs, golds)
      .select("norm").as[String].collect().toSet
    // driver-side differential: group gold surfaces by norm, flag norms
    // whose surfaces are uppercase in >99% of occurrences
    val byNorm = goldsSeq.groupBy { g =>
      TextFns.normalize(docsSeq.find(_.doc_id == g.doc_id).get.text
        .substring(g.start, g.end))
    }
    val expected = byNorm.collect { case (norm, gs)
      if gs.count { g =>
        val s = docsSeq.find(_.doc_id == g.doc_id).get.text.substring(g.start, g.end)
        s == s.toUpperCase
      }.toDouble / gs.size > 0.99 => norm
    }.toSet
    assert(flagged == expected,
      s"extra: ${flagged -- expected}, missing: ${expected -- flagged}")
  }

  test("case-sensitive pass links uppercase initialisms but not lowercase homographs") {
    val uc = spark.createDataset(Synth.ucDictionary(nConcepts))
    val pred = DictionaryMatch.annotate(docs, uc, caseSensitive = true).collect()
    assert(pred.nonEmpty)
    // every match's raw surface is the exact-cased dict mention
    val byDoc = docsSeq.map(d => d.doc_id -> d.text).toMap
    for (a <- pred) {
      val raw = byDoc(a.doc_id).substring(a.start, a.end)
      assert(TextFns.normalizeCased(raw) == a.dict_entry,
        s"case-sensitive match surface '$raw' != key '${a.dict_entry}'")
    }
    // specifically: no annotation covers a lowercase homograph
    assert(!pred.exists(a => {
      val raw = byDoc(a.doc_id).substring(a.start, a.end)
      raw != raw.toUpperCase
    }))
  }

  test("two-pass inference beats the single lowercase pass that carries abbr keys") {
    val lcWithAbbr = spark.createDataset(Synth.dictionary(nConcepts))
    val lcClean = spark.createDataset(Synth.dictionary(nConcepts, includeAbbrs = false))
    val uc = spark.createDataset(Synth.ucDictionary(nConcepts))
    val g = golds.toDF()

    def iou(pred: org.apache.spark.sql.DataFrame): Double =
      Metrics.macroCharIou(
        pred.select(col("doc_id"), col("start"), col("end"), col("concept_id")), g)._2

    // single pass, abbr keys case-folded into the lc dict: "the"-type
    // homograph false positives
    val single = iou(OverlapResolve.apply(
      DictionaryMatch.annotate(docs, lcWithAbbr)).toDF())
    val twoPass = iou(DictTrain.infer(docs, lcClean, uc).toDF())
    assert(twoPass > single,
      s"uc path should beat case-folded abbrs: two-pass=$twoPass single=$single")
  }

  test("fused dual-dict inference is identical to the two-pass + overlap-resolve form") {
    val lcClean = spark.createDataset(Synth.dictionary(nConcepts, includeAbbrs = false))
    val uc = spark.createDataset(Synth.ucDictionary(nConcepts))
    // reference form: two annotate passes unioned, then the cogrouped
    // per-doc overlap resolution
    val twoPass = DictionaryMatch.joinPredictions(
        DictionaryMatch.annotate(docs, lcClean),
        DictionaryMatch.annotate(docs, uc, caseSensitive = true))
      .collect().map(a => (a.doc_id, a.start, a.end, a.concept_id, a.section, a.dict_entry))
      .toSet
    val fused = DictionaryMatch.annotateDualResolved(docs, lcClean, uc)
      .collect().map(a => (a.doc_id, a.start, a.end, a.concept_id, a.section, a.dict_entry))
      .toSet
    assert(fused == twoPass,
      s"extra: ${fused -- twoPass take 5}, missing: ${twoPass -- fused take 5}")
    assert(fused.nonEmpty)
  }

  test("trained split dictionary routes uc-only keys to the uc dict and links them") {
    val k = nConcepts
    val (lc, uc) = DictTrain.trainDictionarySplit(
      docs, golds,
      spark.createDataset(Synth.concepts(k)), spark.createDataset(Synth.descriptions(k)),
      spark.createDataset(Synth.extConcepts(k)).toDF(),
      spark.createDataset(Synth.extMappings(k)).toDF(),
      spark.createDataset(Synth.abbreviations(k)).toDF())
    val ucEntries = uc.collect()
    assert(ucEntries.nonEmpty)
    assert(ucEntries.forall(e => e.mention == e.mention.toUpperCase))
    // lc must not contain any uc-dict mention in lowercase
    val lcMentions = lc.collect().map(_.mention).toSet
    assert(ucEntries.forall(e => !lcMentions.contains(e.mention.toLowerCase)))
    // the planted abbr mentions get linked by the two-pass inference
    val pred = DictTrain.infer(docs, lc, uc).collect()
      .map(a => (a.doc_id, a.start, a.end, a.concept_id)).toSet
    val hits = plantedAbbrGolds.count(g =>
      pred.contains((g.doc_id, g.start, g.end, g.concept_id)))
    assert(hits > 0, "at least some planted abbreviation mentions must link")
    assert(hits.toDouble / plantedAbbrGolds.size > 0.8,
      s"most planted abbreviations should link: $hits/${plantedAbbrGolds.size}")
  }
}
