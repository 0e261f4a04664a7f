package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F7: annotation-offset fix under duplicate-space deletion (SURVEY §2.8).
  *
  * The reference deletes every space that follows another space and shifts
  * annotation offsets by the cumulative count of deleted positions at or
  * before each offset (`2nd Place/src/data.py:60-86` fix_annotation: mark
  * the 2nd+ space of every run, label_char = cumsum(marks),
  * `s -= label_char[s]; e -= label_char[e]`; the `<br>`→" " replace feeding
  * it is `3rd Place/src/document.py:93`).
  *
  * Closed form instead of a per-char scan: the number of marked positions
  * in text[0..p] equals the length the prefix loses when every run of ≥ 2
  * spaces collapses to one — each run of k spaces contains exactly k−1
  * marks, and a run cut by the prefix boundary contributes its in-prefix
  * length − 1 either way. That makes the whole fix three Catalyst
  * expressions (substring, regexp_replace, length) per offset — fully
  * whole-stage-codegen'd, no UDF, no per-doc state, so it rides the scan
  * at any scale.
  */
object OffsetFix {

  /** Marks at or before 0-based position p of `text` = chars deleted from
    * the inclusive prefix text[0..p] by collapsing space runs. */
  def deletedUpTo(text: Column, p: Column): Column = {
    val prefix = text.substr(lit(1), p + 1)
    length(prefix) - length(regexp_replace(prefix, " {2,}", " "))
  }

  /** The squeezed text itself (runs of spaces → one space) — the corpus the
    * adjusted offsets index into. */
  def squeeze(text: Column): Column = regexp_replace(text, " {2,}", " ")

  /** Adjust spans(doc_id, start, end, …) against docs(doc_id, text):
    * returns the span columns with start/end shifted into squeezed-text
    * coordinates plus the surface the adjusted span covers there (an
    * end-to-end witness that the arithmetic landed on the same chars). */
  def fixSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    spans.join(d, "doc_id")
      .withColumn("new_start", col("start") - deletedUpTo(col("text"), col("start")))
      .withColumn("new_end", col("end") - deletedUpTo(col("text"), col("end")))
      .withColumn("term", squeeze(col("text"))
        .substr(col("new_start") + 1, col("new_end") - col("new_start")))
      .drop("text")
  }
}
