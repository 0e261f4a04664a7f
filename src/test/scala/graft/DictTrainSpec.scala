package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.functions.TextFns
import graft.metrics.Metrics
import graft.operators.{DictTrain, DictionaryMatch, OverlapResolve}
import org.apache.spark.sql.functions._

class DictTrainSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  val nConcepts = 150
  lazy val (docsSeq, goldsSeq) = Synth.corpus(60, nConcepts)
  lazy val docs = spark.createDataset(docsSeq)
  lazy val golds = spark.createDataset(goldsSeq)

  test("word blacklist finds template words, not concept words") {
    val bl = DictTrain.wordBlacklist(docs, cutoff = 100).collect().map(_.getString(0)).toSet
    assert(bl.contains("the") || bl.contains("patient"))
    assert(!bl.contains("femur"))
  }

  test("harvested dictionary keys map to the true concept") {
    val d = DictTrain.dictFromAnnotations(docs, golds).collect()
    assert(d.nonEmpty)
    val truth = (0 until nConcepts).flatMap { i =>
      Seq(Synth.conceptName(i), Synth.permSynonym(i), Synth.conceptName(i) + "s")
        .map(t => TextFns.normalize(t) -> Synth.conceptId(i))
    }.toMap
    val checkable = d.filter(e => truth.contains(e.mention))
    assert(checkable.nonEmpty)
    for (e <- checkable) assert(truth(e.mention) == e.concept_id, s"bad entry $e")
  }

  test("terminology dictionary strips FSN tags and drops inactive rows") {
    val d = DictTrain.dictFromTerminology(
      spark.createDataset(Synth.concepts(nConcepts)),
      spark.createDataset(Synth.descriptions(nConcepts))).collect()
    assert(d.nonEmpty)
    assert(!d.exists(_.mention.contains("finding")), "FSN tag leaked into a mention")
    val inactive = Synth.concepts(nConcepts).filter(_.active == 0).map(_.concept_id).toSet
    assert(!d.exists(e => inactive.contains(e.concept_id)))
  }

  test("external 3-way mapping join yields renamed synonyms for mapped concepts") {
    val d = DictTrain.dictFromExternal(
      spark.createDataset(Synth.extConcepts(nConcepts)).toDF(),
      spark.createDataset(Synth.extMappings(nConcepts)).toDF()).collect()
    assert(d.nonEmpty)
    // mapping is ext(900000+i) -> conceptId(i); FAKEVOCAB1 rows are blacklisted
    for (e <- d) {
      val i = (0 until nConcepts).find(j => Synth.conceptId(j) == e.concept_id).get
      assert(i % 5 == 0 && i % 10 != 0)
    }
  }

  test("abbreviation join attaches initials to the right concept") {
    val base = DictTrain.dictFromTerminology(
      spark.createDataset(Synth.concepts(nConcepts)),
      spark.createDataset(Synth.descriptions(nConcepts)))
    val d = DictTrain.abbreviationEntries(
      spark.createDataset(Synth.abbreviations(nConcepts)).toDF(), base).collect()
    assert(d.nonEmpty)
    for (e <- d) {
      val i = (0 until nConcepts).find(j => Synth.conceptId(j) == e.concept_id).get
      val expected = Synth.conceptName(i).split(' ').map(_.head).mkString
      assert(e.mention == expected.toLowerCase)
    }
  }

  test("trained dictionary drives inference to high macro IoU on train docs") {
    val k = nConcepts
    val trained = DictTrain.trainDictionary(
      docs, golds,
      spark.createDataset(Synth.concepts(k)), spark.createDataset(Synth.descriptions(k)),
      spark.createDataset(Synth.extConcepts(k)).toDF(),
      spark.createDataset(Synth.extMappings(k)).toDF(),
      spark.createDataset(Synth.abbreviations(k)).toDF())
    val pred = OverlapResolve.apply(DictionaryMatch.annotate(docs, trained)).toDF()
    val (_, macroIou) = Metrics.macroCharIou(
      pred.select(col("doc_id"), col("start"), col("end"), col("concept_id")),
      golds.toDF())
    info(f"trained-dict macro IoU = $macroIou%.4f")
    assert(macroIou > 0.55, f"trained dict IoU too low: $macroIou%.4f")
  }
}
