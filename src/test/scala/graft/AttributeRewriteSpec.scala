package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.metrics.Metrics
import graft.model._
import graft.operators.{AttributeRewrite, DictionaryMatch, OverlapResolve, TermExtension}
import org.apache.spark.sql.functions._

class AttributeRewriteSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  val k = 500

  test("termExtensions matches the closed-form expectation on the synth terminology") {
    val got = TermExtension.termExtensions(
      spark.createDataset(Synth.relationships(k)),
      spark.createDataset(Synth.descriptions(k)))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    val expected = (0 until k).filter(Synth.hasAttrChild).map { i =>
      (Synth.conceptId(i), Synth.fsn(i), Synth.attrChildId(i),
        Synth.attrChildFsn(i), Synth.attrWord(i))
    }.toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("termExtensions never accepts a tree edge between unrelated names") {
    // unrelated triples differ by >1 word, so only attribute children pass
    val got = TermExtension.termExtensions(
      spark.createDataset(Synth.relationships(k)),
      spark.createDataset(Synth.descriptions(k)))
      .select("specific_id").as[Long].collect().toSet
    val treeSources = (1 until k).map(Synth.conceptId).toSet
    assert(got.intersect(treeSources).isEmpty)
  }

  // driver-side transcription of the reference loop, deliberately naive:
  // scan ALL window positions, independent data structures — a differential
  // oracle for rewriteDoc
  def naiveRewrite(text: String, anns: IndexedSeq[Annotation],
                   att: Map[Long, Seq[(String, Long)]]): Seq[Annotation] =
    anns.indices.map { i =>
      val a = anns(i)
      val cand = att.getOrElse(a.concept_id, Seq.empty)
      if (cand.isEmpty) a
      else {
        val aTxt = text.substring(a.start, math.min(a.end, text.length))
        val leftLim =
          if (i > 0) math.max(anns(i - 1).end + 1, a.start - 20)
          else math.max(0, a.start - 20)
        val rightLim =
          if (i < anns.length - 1) math.min(anns(i + 1).start - 1, a.end + 20)
          else math.min(a.end + 20, text.length - 1)
        val window = text.substring(math.max(0, leftLim),
          math.max(math.max(0, leftLim), math.min(rightLim, text.length)))
        val rx = java.util.regex.Pattern.compile(
          "(?:\\b\\S+\\s*){0,2}" + java.util.regex.Pattern.quote(aTxt) +
            "\\b(?:\\s*\\S+\\s*?){0,2}")
        val m = rx.matcher(window)
        if (!m.find()) a
        else {
          val cut = m.group(0).indexOf(aTxt)
          val before = m.group(0).substring(0, cut)
          val wordsBefore = before.split("\\s+").filter(_.nonEmpty)
          cand.iterator.flatMap { case (attribute, specific) =>
            val sides = AttributeRewrite.sideWords(attribute)
            val hit = wordsBefore.indices.find(j => sides.contains(wordsBefore(j)))
            hit.map { j =>
              if (j == wordsBefore.length - 1) {
                val delta = before.length - before.replaceAll("\\s+$", "").length
                a.copy(start = a.start - wordsBefore.last.length - delta,
                  concept_id = specific)
              } else a.copy(concept_id = specific)
            }
          }.nextOption().getOrElse(a)
        }
      }
    }

  test("rewriteDoc transcription cases: extend, rewrite-only, bound by neighbor, no-op") {
    val att = Map(100L -> Seq(("left", 108L)))
    def ann(s: Int, e: Int, c: Long) = Annotation("d", s, e, c, "any", "x")

    // attribute directly before → concept rewritten AND span extended
    val t1 = "exam shows left acute femur fracture today"
    val r1 = AttributeRewrite.rewriteDoc(t1, IndexedSeq(ann(16, 36, 100L)), att)
    assert(r1 == Seq(ann(11, 36, 108L)))

    // attribute two words before → rewritten, span NOT extended
    val t2 = "left sided acute femur fracture today"
    val r2 = AttributeRewrite.rewriteDoc(t2, IndexedSeq(ann(11, 31, 100L)), att)
    assert(r2 == Seq(ann(11, 31, 108L)))

    // a PREVIOUS annotation covering the attribute blocks the window
    val t3 = "left acute femur fracture here"
    val r3 = AttributeRewrite.rewriteDoc(t3,
      IndexedSeq(ann(0, 4, 999L), ann(5, 25, 100L)), att)
    assert(r3(1) == ann(5, 25, 100L))

    // no candidate attribute → unchanged
    val r4 = AttributeRewrite.rewriteDoc(t1, IndexedSeq(ann(16, 36, 777L)), att)
    assert(r4 == Seq(ann(16, 36, 777L)))
  }

  test("distributed rewrite equals the naive driver transcription on synth docs") {
    val n = 40
    val nc = 150
    val (docsSeq, _) = Synth.corpus(n, nc)
    val docs = spark.createDataset(docsSeq)
    val base = OverlapResolve.apply(
      DictionaryMatch.annotate(docs,
        spark.createDataset(Synth.dictionary(nc, includeAttrChildren = false, includeAbbrs = false))))
    val att = TermExtension.termExtensions(
      spark.createDataset(Synth.relationships(nc)),
      spark.createDataset(Synth.descriptions(nc)))
    val got = AttributeRewrite.apply(docs, base, att).collect()
      .map(a => (a.doc_id, a.start, a.end, a.concept_id)).toSet

    val attMap = att.collect()
      .map(r => (r.getLong(0), r.getString(4), r.getLong(2)))
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(_._3).map(r => (r._2, r._3)).toSeq
      }
    val baseLocal = base.collect().groupBy(_.doc_id)
    val expected = docsSeq.flatMap { d =>
      naiveRewrite(d.text,
        baseLocal.getOrElse(d.doc_id, Array.empty).toIndexedSeq.sortBy(a => (a.start, a.end)),
        attMap)
    }.map(a => (a.doc_id, a.start, a.end, a.concept_id)).toSet
    assert(got == expected)
    assert(got != base.collect().map(a => (a.doc_id, a.start, a.end, a.concept_id)).toSet,
      "rewrite should change at least one annotation on the synth corpus")
  }

  test("postprocess improves macro char IoU vs gold on the synth corpus") {
    val n = 60
    val nc = 150
    val (docsSeq, goldsSeq) = Synth.corpus(n, nc)
    val docs = spark.createDataset(docsSeq)
    val golds = spark.createDataset(goldsSeq).toDF()
    val base = OverlapResolve.apply(
      DictionaryMatch.annotate(docs,
        spark.createDataset(Synth.dictionary(nc, includeAttrChildren = false, includeAbbrs = false))))
    val att = TermExtension.termExtensions(
      spark.createDataset(Synth.relationships(nc)),
      spark.createDataset(Synth.descriptions(nc)))
    val post = AttributeRewrite.apply(docs, base, att)

    def iou(pred: org.apache.spark.sql.DataFrame): Double =
      Metrics.macroCharIou(
        pred.select(col("doc_id"), col("start"), col("end"), col("concept_id")), golds)._2

    val baseIou = iou(base.toDF())
    val postIou = iou(post.toDF())
    assert(postIou > baseIou,
      s"postprocess should improve IoU: base=$baseIou post=$postIou")
  }
}
