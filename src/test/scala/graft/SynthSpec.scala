package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.functions.TextFns

class SynthSpec extends AnyFunSuite {

  val (docs, golds) = Synth.corpus(nDocs = 60, nConcepts = 200)

  test("generator is a pure function of the index") {
    val (d1, g1) = Synth.genDoc(7L, 200)
    val (d2, g2) = Synth.genDoc(7L, 200)
    assert(d1 == d2 && g1 == g2)
  }

  test("gold offsets are exact substrings of the concatenated text") {
    val byDoc = docs.map(d => d.doc_id -> d.text).toMap
    assert(golds.nonEmpty)
    for (g <- golds) {
      val surface = byDoc(g.doc_id).substring(g.start, g.end)
      assert(surface.trim == surface, s"untrimmed: '$surface'")
      assert(surface.nonEmpty)
    }
  }

  test("gold annotations are non-overlapping per doc") {
    for ((_, gs) <- golds.groupBy(_.doc_id)) {
      val s = gs.sortBy(_.start)
      for (Seq(a, b) <- s.sliding(2) if s.length > 1)
        assert(b.start >= a.end)
    }
  }

  test("docs interleave media spans with correct offsets and empty text") {
    val withMedia = docs.count(_.spans.exists(_.kind == "media"))
    assert(withMedia == docs.length)
    for (d <- docs) {
      var off = 0
      for (sp <- d.spans) {
        assert(sp.offset == off)
        if (sp.kind == "text") off += sp.text.length
        else {
          assert(sp.text == "" && sp.media_ref.startsWith("media://"))
        }
      }
    }
  }

  test("concept names are distinct and variants stay near their concept") {
    val names = (0 until 500).map(Synth.conceptName)
    assert(names.distinct.size == 500)
    // a typo'd variant is much closer to its own concept than to others
    val v = Synth.typo(Synth.conceptName(3), 99L)
    assert(TextFns.jaroWinkler(TextFns.normalize(v),
      TextFns.normalize(Synth.conceptName(3))) > 0.9)
  }

  test("concept names stay bijective past the 32^3 triple space") {
    // the scaling ladders run k up to 400k concepts: every name (and every
    // permutation synonym) must stay unique or the linkage workload
    // degenerates via unambiguousDict (measured r5: at k=160k every
    // unqualified name was shared by ~5 concepts and candidate pairs
    // DROPPED 7x when the corpus grew 4x)
    val total = Synth.adjectives.length * Synth.anatomies.length * Synth.nouns.length
    val idxs = (0 until 3000) ++ (total - 1500 until total + 1500) ++
      (5 * total - 500 until 5 * total + 500) ++
      (24 * total - 500 until 26 * total + 500)
    val names = idxs.map(Synth.conceptName)
    assert(names.distinct.size == idxs.size)
    assert(idxs.map(Synth.permSynonym).distinct.size == idxs.size)
    // sf-dir-visible names (i < total) are byte-identical to the
    // unqualified triple form: exactly 3 words, no qualifier vocabulary
    for (i <- 0 until 2000) {
      val w = Synth.conceptName(i).split(' ')
      assert(w.length == 3 && !w.exists(Synth.qualifiers.contains))
    }
    // qualified names end in qualifier words, which no other vocab contains
    assert(Synth.conceptName(total + 7).split(' ').length == 4)
    val qv = Synth.qualifiers.toSet
    assert(qv.intersect(Synth.adjectives.toSet ++ Synth.anatomies.toSet ++
      Synth.nouns.toSet ++ Synth.attrWords.toSet ++ Synth.fillers.toSet).isEmpty)
  }

  test("dictionary terms are normalized and reference active concepts") {
    val dict = Synth.dictionary(200)
    assert(dict.nonEmpty)
    for (e <- dict) assert(e.mention == TextFns.normalize(e.mention))
    val inactive = Synth.concepts(200).filter(_.active == 0).map(_.concept_id).toSet
    assert(!dict.exists(e => inactive.contains(e.concept_id)))
  }
}
