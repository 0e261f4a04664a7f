package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Annotation
import graft.operators.OverlapResolve._

class OverlapResolveSpec extends AnyFunSuite with SparkTestBase {

  def ann(s: Int, e: Int, cid: Long = 1L, sec: String = "other") =
    Annotation("d0", s, e, cid, sec, "x")

  test("keeps longest among overlapping spans") {
    val r = removeOverlaps(Seq(ann(0, 10), ann(5, 8)))
    assert(r == Seq(ann(0, 10)))
  }

  test("equal-length overlap keeps the earlier in pinned order") {
    val r = removeOverlaps(Seq(ann(0, 5, 2L), ann(0, 5, 1L)))
    assert(r == Seq(ann(0, 5, 1L)))
  }

  test("'any' section loses to section-keyed annotation on the same span") {
    val r = removeOverlaps(Seq(ann(0, 5, 1L, "any"), ann(0, 5, 2L, "chief complaint")))
    assert(r == Seq(ann(0, 5, 2L, "chief complaint")))
  }

  test("rescue pass re-adds a dropped span that no longer overlaps survivors") {
    // [0,4) and [3,10): [0,4) is shorter -> removed; then [3,10) vs [8,20):
    // shorter [3,10) removed... construct the reference's rescue scenario:
    // chain a < b < c where b overlaps both, b longest removes a and c... use:
    // [0,6) len6, [5,7) len2, [6,12) len6 — sweep: i=0 vs j=1 -> remove [5,7);
    // i=0 vs [6,12): no overlap (6 >= 6). Survivors [0,6),[6,12); rescued none
    // ([5,7) endpoints 5 inside [0,6) -> stays removed).
    val r1 = removeOverlaps(Seq(ann(0, 6), ann(5, 7), ann(6, 12)))
    assert(r1.map(a => (a.start, a.end)) == Seq((0, 6), (6, 12)))
    // now make the middle long enough to kill both neighbors, then neighbors
    // cannot return (they overlap the survivor), but a distant dropped one can:
    // [0,5) vs [0,12): [0,5) removed; [0,12) vs [4,6): removed; [4,6) endpoints
    // inside [0,12) -> stays removed; [0,5) inside -> stays removed.
    val r2 = removeOverlaps(Seq(ann(0, 5), ann(0, 12), ann(4, 6)))
    assert(r2.map(a => (a.start, a.end)) == Seq((0, 12)))
  }

  test("output is always overlap-free and deterministic under permutation") {
    val spans = Seq(ann(0, 7), ann(3, 9), ann(9, 15), ann(14, 20, 2L),
      ann(2, 4, 3L), ann(25, 30), ann(27, 33, 4L, "any"))
    val base = removeOverlaps(spans)
    for (p <- spans.permutations.take(50)) assert(removeOverlaps(p) == base)
    val s = base.sortBy(_.start)
    for (Seq(a, b) <- s.sliding(2) if s.length > 1) assert(b.start >= a.end)
  }

  test("distributed resolution equals the pure driver-side oracle") {
    import spark.implicits._
    val (docs, _) = graft.fixtures.Synth.corpus(30, 100)
    val dict = graft.fixtures.Synth.dictionary(100)
    val matched = graft.operators.DictionaryMatch.annotate(
      spark.createDataset(docs), spark.createDataset(dict), maxTokens = 4)
    val resolved = graft.operators.OverlapResolve.apply(matched).collect()
      .sortBy(a => (a.doc_id, a.start, a.end, a.concept_id)).toSeq
    // driver-side: same pure functions composed sequentially
    val oracle = matched.collect().groupBy(_.doc_id).toSeq.flatMap { case (_, anns) =>
      removeOverlaps(anns.toSeq)
    }.sortBy(a => (a.doc_id, a.start, a.end, a.concept_id))
    assert(resolved == oracle)
    assert(resolved.nonEmpty)
    assert(overlapViolations(graft.operators.OverlapResolve.apply(matched)) == 0)
  }
}
