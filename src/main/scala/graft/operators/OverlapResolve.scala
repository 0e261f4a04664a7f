package graft.operators

import graft.model.Annotation
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable

/** Greedy overlap resolution — SURVEY.md O3, the single most
  * semantics-critical operator (it defines the final span set).
  *
  * Faithful transcription of the reference algorithm
  * (`1st Place/src/mimic_common.py:164-209`):
  *   1. sort spans by start
  *   2. effective length = (end - start), minus 0.1 when section is
  *      "any"/tuple (prefer section-keyed annotations on equal spans)
  *   3. forward greedy sweep: for each surviving i, scan j>i while
  *      start_j < end_i; remove the shorter of (i, j) (ties remove j);
  *      if i was removed, stop scanning its window
  *   4. rescue pass: a removed span returns if neither of its endpoints
  *      falls strictly inside any current survivor (survivor set grows as
  *      spans are rescued — same as the reference's df2.loc[i] inserts)
  *
  * Determinism deviation (documented in SURVEY §7.4.5): the reference's sort
  * is stable w.r.t. Python dict-iteration insertion order and its rescue pass
  * iterates a Python set; we pin a total order
  * (start, end, section, concept_id, dict_entry) for the sweep and ascending
  * sweep-index order for the rescue pass.
  *
  * Distributed form: one shuffle on doc_id, then a per-doc in-memory sweep —
  * groups are single documents (≤ thousands of spans), so executor memory is
  * bounded regardless of corpus size.
  */
object OverlapResolve {

  def isAnySection(section: String): Boolean =
    section == "any" || section.startsWith("(") // tuple-style keys

  /** Pure per-doc resolution; input spans may arrive in any order. */
  def removeOverlaps(anns: Seq[Annotation]): Seq[Annotation] = {
    if (anns.length <= 1) return anns
    val sorted = anns.sortBy(a => (a.start, a.end, a.section, a.concept_id, a.dict_entry))
    val n = sorted.length
    val effLen = Array.tabulate(n) { k =>
      val a = sorted(k)
      (a.end - a.start).toDouble - (if (isAnySection(a.section)) 0.1 else 0.0)
    }
    val removed = new mutable.BitSet(n)
    var i = 0
    while (i < n) {
      if (!removed(i)) {
        var j = i + 1
        var iAlive = true
        while (iAlive && j < n && sorted(j).start < sorted(i).end) {
          val rm = if (effLen(i) < effLen(j)) i else j // ties remove j
          removed += rm
          if (rm == i) iAlive = false else j += 1
        }
      }
      i += 1
    }
    // rescue pass over growing survivor set
    val survivors = mutable.ArrayBuffer.empty[Int]
    var k = 0
    while (k < n) { if (!removed(k)) survivors += k; k += 1 }
    val rescued = mutable.ArrayBuffer.empty[Int]
    for (r <- removed) {
      val s = sorted(r).start
      val e = sorted(r).end
      val overlaps = (survivors.iterator ++ rescued.iterator).exists { v =>
        val vs = sorted(v).start
        val ve = sorted(v).end
        (vs <= s && ve > s) || (vs <= e && ve > e)
      }
      if (!overlaps) rescued += r
    }
    (survivors ++ rescued).sorted.map(sorted(_)).toSeq
  }

  /** Distributed form: single shuffle on doc_id, bounded per-group memory.
    * Uses hash aggregation (collect_list → ObjectHashAggregate) instead of
    * groupByKey's sort-based grouping: thread dumps showed the sort of the
    * shuffled annotation rows (TimSort on row pointers, memory-latency
    * bound) dominating 19/31 worker threads — the sweep itself sorts each
    * tiny per-doc group in memory anyway. */
  def apply(anns: Dataset[Annotation])(implicit spark: SparkSession): Dataset[Annotation] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    anns.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start"), col("end"), col("concept_id"),
        col("section"), col("dict_entry"))).as("rows"))
      .as[(String, Seq[(Int, Int, Long, String, String)])]
      .flatMap { case (docId, rows) =>
        removeOverlaps(rows.map(r => Annotation(docId, r._1, r._2, r._3, r._4, r._5)))
      }
  }

  /** Overlap-freeness invariant (reference check
    * `1st Place/src/mimic_common.py:212-225`): returns offending row count. */
  def overlapViolations(anns: Dataset[Annotation])(implicit spark: SparkSession): Long = {
    import spark.implicits._
    anns.groupByKey(_.doc_id).flatMapGroups { (_, it) =>
      val s = it.toSeq.sortBy(_.start)
      s.iterator.zip(s.iterator.drop(1)).filter { case (a, b) => b.start < a.end }
    }.count()
  }
}
