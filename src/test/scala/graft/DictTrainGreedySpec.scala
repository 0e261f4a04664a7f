package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.metrics.Metrics
import graft.model._
import graft.operators.{DictTrain, DictionaryMatch}
import org.apache.spark.sql.functions._

/** M5 two-pointer scoring + O6 greedy key selection + limit-any (the
  * 1st-place `mimic_train.py` training refinements). */
class DictTrainGreedySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("overlapScore transcription cases") {
    // ref starts after ann → -1
    assert(DictTrain.overlapScore(10, 20, 5, 9, 1L, 1L, "x y") == -1)
    // ref ends before ann starts → 0 (might overlap next)
    assert(DictTrain.overlapScore(0, 4, 5, 9, 1L, 1L, "x y") == 0)
    // overlapping, same concept, exact span → 1
    assert(DictTrain.overlapScore(5, 9, 5, 9, 1L, 1L, "x") == 1)
    // overlapping, same concept, inexact span, multiword mention → 1
    assert(DictTrain.overlapScore(5, 12, 5, 9, 1L, 1L, "x y") == 1)
    // overlapping, same concept, inexact span, single-word mention → -1
    assert(DictTrain.overlapScore(5, 12, 5, 9, 1L, 1L, "x") == -1)
    // overlapping, different concept → -1
    assert(DictTrain.overlapScore(5, 9, 5, 9, 1L, 2L, "x y") == -1)
  }

  test("scoreDocPredictions aligns via the as-of pointer, not exact keys") {
    def g(s: Int, e: Int, c: Long) = GoldAnnotation("d", s, e, c)
    def a(s: Int, e: Int, c: Long, m: String) = Annotation("d", s, e, c, "any", m)
    val refs = IndexedSeq(g(0, 10, 1L), g(20, 30, 2L), g(40, 50, 3L), g(60, 70, 4L))
    // pred at 22-30 wrong concept → -1; pred at 40-50 right → +1;
    // pred at 35-38 (between refs): as-of ref (20,30) ends before 35 → 0,
    // next ref (40,50) starts after 35 → -1 → -1
    val anns = IndexedSeq(a(22, 30, 9L, "x y"), a(35, 38, 3L, "x y"), a(40, 50, 3L, "x y"))
    val got = DictTrain.scoreDocPredictions(refs, anns).map(_._2)
    assert(got == Seq(-1, -1, 1))
  }

  // independent literal transcription of get_bad_keys_for_concept
  // (`mimic_train.py:291-311`) for the differential
  def referenceBadKeys(scores: Seq[((String, String), (Long, Long))],
                       n: Long): Seq[(String, String)] = {
    val ratio = scores.map { case (k, (c, i)) => k -> c.toDouble / (i + 0.01) }.toMap
    val orderedKeys = scores.map(_._1)
      .sortBy(k => (-ratio(k), k._1, k._2))
    val counts = scores.toMap
    var correct = 0.0
    var incorrect = 0.0
    val bad = scala.collection.mutable.Buffer.empty[(String, String)]
    for ((k, i) <- orderedKeys.zipWithIndex) {
      val curr = correct / (incorrect + n)
      val (c, inc) = counts(k)
      val keep = curr < ratio(k) ||
        !DictTrain.naiveRemove(c, inc, k._1, doubleThr = i > 2)
      if (keep) { correct += c; incorrect += inc }
      else bad += k
    }
    bad.toSeq
  }

  test("badKeysForConcept matches the literal reference transcription") {
    // deterministic pseudo-random key stats
    for (seed <- 0 until 20) {
      val nKeys = 1 + Synth.hn(12, seed.toLong, 1L)
      val scores = (0 until nKeys).map { j =>
        val sec = if (Synth.hn(2, seed.toLong, j.toLong, 2L) == 0) "any" else "exam"
        ((sec, s"k$j"),
          (Synth.hn(8, seed.toLong, j.toLong, 3L).toLong,
            Synth.hn(8, seed.toLong, j.toLong, 4L).toLong))
      }
      val n = 1L + Synth.hn(20, seed.toLong, 5L)
      assert(DictTrain.badKeysForConcept(scores, n) == referenceBadKeys(scores, n),
        s"divergence at seed=$seed scores=$scores n=$n")
    }
  }

  test("greedy selection drops a poisoned key the naive rule keeps") {
    // three strong keys then a borderline one: the naive rule keeps
    // (3 correct ≥ 0.3·8 incorrect) but past the 3rd key the greedy loop
    // doubles the threshold AND the running score (27/5=5.4) exceeds the
    // key's ratio (0.37) → dropped
    val dict = (Seq("g1", "g2", "g3", "bad key"))
      .map(m => DictEntry("any", m, 1L)).toDS()
    val byMention = Seq(
      ("any", "g1", 10L, 0L), ("any", "g2", 9L, 0L), ("any", "g3", 8L, 0L),
      ("any", "bad key", 3L, 8L)).toDF("section", "mention", "n_correct", "n_incorrect")
    val golds = (0 until 5).map(i => GoldAnnotation(s"d$i", 0, 5, 1L)).toDS()
    val kept = DictTrain.pruneGreedyKeys(dict, byMention, golds)
      .collect().map(_.mention).toSet
    assert(kept == Set("g1", "g2", "g3"))
    // naive alone would keep all four
    val naiveKept = DictTrain.pruneNaiveKeys(dict, byMention).collect().map(_.mention).toSet
    assert(naiveKept == Set("g1", "g2", "g3", "bad key"))
  }

  test("distributed scoredPredictions equals the driver-side per-doc scoring") {
    val nConcepts = 120
    val (docsSeq, goldsSeq) = Synth.corpus(50, nConcepts)
    val docs = spark.createDataset(docsSeq)
    val golds = spark.createDataset(goldsSeq)
    val dict = DictTrain.dictFromAnnotations(docs, golds)
    val got = DictTrain.scoredPredictions(docs, golds, dict)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .groupBy(identity).view.mapValues(_.length).toMap

    val dictLocal = dict.collect()
    val predLocal = DictionaryMatch.annotate(docs, spark.createDataset(dictLocal.toSeq))
      .collect().groupBy(_.doc_id)
    val goldLocal = goldsSeq.groupBy(_.doc_id)
    val expected = docsSeq.flatMap { d =>
      val refs = goldLocal.getOrElse(d.doc_id, Seq.empty)
        .toIndexedSeq.sortBy(r => (r.start, r.end, r.concept_id))
      val anns = predLocal.getOrElse(d.doc_id, Array.empty)
        .toIndexedSeq.sortBy(a => (a.start, a.end, a.concept_id))
      DictTrain.scoreDocPredictions(refs, anns)
        .map { case (a, s) => (d.doc_id, a.section, a.dict_entry, s) }
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == expected)
  }

  test("limitAnyToAllowedSections narrows any-keys and keeps unknown types") {
    val nConcepts = 120
    val (docsSeq, goldsSeq) = Synth.corpus(40, nConcepts)
    val docs = spark.createDataset(docsSeq)
    val golds = spark.createDataset(goldsSeq)
    val descriptions = spark.createDataset(Synth.descriptions(nConcepts))
    val cidToType = DictTrain.conceptTypes(descriptions)
    val allowed = DictTrain.allowedSections(docs, golds, cidToType)
    val dict = Seq(
      DictEntry("any", "acute femur fracture", Synth.conceptId(1)),
      DictEntry("any", "mystery term", 999999999L), // no type → stays any
      DictEntry("physical exam", "kept as is", Synth.conceptId(2))).toDS()
    val out = DictTrain.limitAnyToAllowedSections(dict, allowed, cidToType).collect()
    val allowedSecs = allowed.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val c1Type = cidToType.filter(col("concept_id") === Synth.conceptId(1))
      .collect().head.getString(1)
    val c1Sections = out.filter(_.mention == "acute femur fracture").map(_.section).toSet
    assert(c1Sections == allowedSecs(c1Type))
    assert(out.filter(_.mention == "mystery term").map(_.section).toSeq == Seq("any"))
    assert(out.filter(_.mention == "kept as is").map(_.section).toSeq == Seq("physical exam"))
  }

  test("end-to-end trained dictionary reaches macro IoU >= 0.85 on train docs") {
    val nConcepts = 150
    val n = 80
    val (docsSeq, goldsSeq) = Synth.corpus(n, nConcepts)
    val docs = spark.createDataset(docsSeq)
    val golds = spark.createDataset(goldsSeq)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val (lc, uc) = DictTrain.trainDictionarySplit(
      docs, golds,
      spark.createDataset(Synth.concepts(nConcepts)),
      spark.createDataset(Synth.descriptions(nConcepts)),
      spark.createDataset(Synth.extConcepts(nConcepts)).toDF(),
      spark.createDataset(Synth.extMappings(nConcepts)).toDF(),
      spark.createDataset(Synth.abbreviations(nConcepts)).toDF())
    val pred = DictTrain.infer(docs, lc, uc).toDF()
    val (_, iou) = Metrics.macroCharIou(
      pred.select(col("doc_id"), col("start"), col("end"), col("concept_id")),
      golds.toDF())
    assert(iou >= 0.85, s"trained-dict macro IoU $iou below 0.85")
    // no-leak contract: training's lazily-checkpointed intermediates
    // (mentions/harvested/ucNorms/scored/expanded/core/full) must have
    // been freed once the output dicts materialized — after releasing the
    // two output dicts, training must leave NOTHING newly cached behind
    lc.unpersist(); uc.unpersist()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"training leaked cached/checkpointed RDDs: $leaked")
  }
}
