package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.functions.TextFns
import graft.model._
import graft.operators.{Context, DictTrain, SpanCompare}
import org.apache.spark.sql.functions._

/** A11 span-compare, F13/F14 context extraction, A6 nested section stats. */
class SpanCompareContextSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  val nConcepts = 120
  lazy val (docsSeq, goldsSeq) = Synth.corpus(40, nConcepts)
  lazy val docs = spark.createDataset(docsSeq)
  lazy val golds = spark.createDataset(goldsSeq)

  test("classify transcription cases") {
    val others = IndexedSeq((10, 20), (30, 40))
    assert(SpanCompare.classify(10, 20, others) == "same")
    assert(SpanCompare.classify(12, 18, others) == "included") // contained
    assert(SpanCompare.classify(8, 22, others) == "included")  // contains
    assert(SpanCompare.classify(15, 25, others) == "intersect")
    assert(SpanCompare.classify(22, 28, others) == "no")
    assert(SpanCompare.classify(25, 35, others) == "intersect") // hits 2nd span
  }

  test("termTallies matches a naive driver transcription") {
    // two synthetic annotation sets with engineered overlaps
    def spans(shift: Int, term: String) = (0 until 30).map { i =>
      ("d" + (i % 5), i * 10 + shift, i * 10 + shift + 4 + (i % 3), term + (i % 4))
    }
    val a = spans(0, "t").toDF("doc_id", "start", "end", "term")
    val b = spans(2, "t").toDF("doc_id", "start", "end", "term")
    val got = SpanCompare.termTallies(a, b).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    // driver transcription
    val aLoc = spans(0, "t").groupBy(_._1)
    val bLoc = spans(2, "t").groupBy(_._1)
    val tally = scala.collection.mutable.Map.empty[String, Array[Long]]
    def t6(term: String) = tally.getOrElseUpdate(term, new Array[Long](6))
    for ((doc, as) <- aLoc) {
      val bs = bLoc.getOrElse(doc, Seq.empty).sortBy(x => (x._2, x._3, x._4))
        .map(x => (x._2, x._3)).toIndexedSeq
      for (s <- as.sortBy(x => (x._2, x._3, x._4))) {
        SpanCompare.classify(s._2, s._3, bs) match {
          case "same"      => t6(s._4)(0) += 1; t6(s._4)(3) += 1
          case "included"  => t6(s._4)(0) += 1; t6(s._4)(4) += 1
          case "intersect" => t6(s._4)(0) += 1; t6(s._4)(5) += 1
          case _           => t6(s._4)(1) += 1
        }
      }
    }
    for ((doc, bs) <- bLoc) {
      val as = aLoc.getOrElse(doc, Seq.empty).sortBy(x => (x._2, x._3, x._4))
        .map(x => (x._2, x._3)).toIndexedSeq
      for (s <- bs.sortBy(x => (x._2, x._3, x._4))) {
        SpanCompare.classify(s._2, s._3, as) match {
          case "included"  => t6(s._4)(0) += 1; t6(s._4)(4) += 1
          case "intersect" => t6(s._4)(0) += 1; t6(s._4)(5) += 1
          case "no"        => t6(s._4)(2) += 1
          case _           => // B-side "same" untallied (reference quirk)
        }
      }
    }
    val expected = tally.map { case (k, v) => k -> (v(0), v(1), v(2), v(3), v(4), v(5)) }.toMap
    assert(got == expected)
  }

  test("termOccurrences counts normalized n-gram occurrences") {
    val terms = Seq("patient", "acute femur fracture").toDF("term")
    val got = SpanCompare.termOccurrences(docs, terms).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver oracle: count token-aligned normalized occurrences
    def countIn(text: String, term: String): Long = {
      val norm = TextFns.normalize(text)
      // token-aligned: pad with spaces
      val hay = " " + norm + " "
      val needle = " " + term + " "
      var c = 0L; var i = hay.indexOf(needle)
      while (i >= 0) { c += 1; i = hay.indexOf(needle, i + 1) }
      c
    }
    for ((term, n) <- got) {
      val expected = docsSeq.map(d => countIn(d.text, term)).sum
      assert(n == expected, s"term '$term': got $n expected $expected")
    }
    assert(got("patient") > 0)
  }

  test("contextWindow transcription") {
    val text = "one two three four five TARGET WORDS seven eight nine ten eleven"
    val start = text.indexOf("TARGET")
    val end = start + "TARGET WORDS".length
    assert(Context.contextWindow(text, start, end, 2, 2) ==
      "four five TARGET WORDS seven eight")
    assert(Context.contextWindow(text, start, end, 50, 50) == text)
    // span at text start
    assert(Context.contextWindow(text, 0, 3, 2, 1) == "one two")
  }

  test("mentionContexts carries windows and section templates") {
    val anns = golds.map(g => Annotation(g.doc_id, g.start, g.end, g.concept_id, "any", ""))
    val ctx = Context.mentionContexts(docs, anns).collect()
    assert(ctx.length == goldsSeq.size)
    val byDoc = docsSeq.map(d => d.doc_id -> d.text).toMap
    for (r <- ctx.take(200)) {
      val term = r.getAs[String]("term")
      val context = r.getAs[String]("context")
      assert(context.contains(term.split("\\s+").head))
      assert(byDoc(r.getAs[String]("doc_id")).contains(term))
    }
    // templates fire for the mapped sections
    val allergies = Context.sectionTemplate(lit("allergies"), lit("cat hair"))
    assert(Seq(1).toDF("x").select(allergies).head.getString(0) == "Allergy to cat hair finding")
  }

  test("dictSectionStats nests counts per section with a default rollup") {
    val stats = DictTrain.dictSectionStats(docs, golds).collect()
    assert(stats.nonEmpty)
    // driver oracle for one name: pick the most frequent norm
    val mentions = graft.plans.LinkagePipeline.mentionsFromSpans(docs, golds).collect()
    val labeled = mentions.flatMap { m =>
      goldsSeq.find(g => g.doc_id == m.doc_id && g.start == m.start && g.end == m.end)
        .map(g => (m.norm, m.section, g.concept_id))
    }
    val name = labeled.groupBy(_._1).maxBy(_._2.size)._1
    val rows = labeled.filter(_._1 == name)
    val expectedDefault = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val row = stats.find(_.getString(0) == name).get
    val sections = row.getAs[Map[String, Map[Long, Long]]]("dict_sections")
    assert(sections("default") == expectedDefault)
    val expectedArgmax = expectedDefault.toSeq.sortBy { case (cid, n) => (-n, cid) }.head._1
    assert(row.getAs[Long]("concept_id") == expectedArgmax)
    // per-section maps sum to the default
    val summed = sections.collect { case (k, m) if k != "default" => m }
      .foldLeft(Map.empty[Long, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0L) + v) }
      }
    assert(summed == expectedDefault)
  }

  test("flat section stats carry exactly the MapType form's entries") {
    val mapRows = DictTrain.dictSectionStats(docs, golds).collect()
    val fromMap = mapRows.flatMap { r =>
      val name = r.getString(0)
      val best = r.getAs[Long]("concept_id")
      r.getAs[Map[String, Map[Long, Long]]]("dict_sections").flatMap {
        case (section, m) => m.map { case (cid, cnt) => (name, section, cid, cnt, best) }
      }
    }.toSet
    val flat = DictTrain.dictSectionStatsFlat(docs, golds).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(flat == fromMap,
      s"extra: ${(flat -- fromMap).take(3)}, missing: ${(fromMap -- flat).take(3)}")
    assert(flat.nonEmpty)
  }
}
