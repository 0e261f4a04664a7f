package graft.operators

import graft.model.Doc
import org.apache.spark.sql.{Dataset, SparkSession}

/** Chunking / offset-tracked tokenization (SURVEY §2.9, 3rd-place pipeline).
  *
  * C2 sentence/phrase splitting and C3 split-to-≤N-tokens + greedy
  * re-merge-to-≤M-tokens (`3rd Place/src/document.py:166-190,281-311,
  * 364-438`), as pure per-doc functions exploded into a chunk relation —
  * narrow transforms, no shuffle. Token = whitespace token (the rebuild
  * ships no ML tokenizer; documented in SURVEY §2.9 C3).
  */
object Chunking {

  case class Chunk(doc_id: String, chunk_idx: Int, start: Int, end: Int, n_tokens: Int)

  /** C2: sentence boundaries — [start, end) spans split after runs of
    * '.', '!', '?' or newlines; never returns empty spans. */
  def sentences(text: String): IndexedSeq[(Int, Int)] = {
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var start = 0
    var i = 0
    val n = text.length
    def isBoundary(c: Char) = c == '.' || c == '!' || c == '?' || c == '\n'
    while (i < n) {
      if (isBoundary(text.charAt(i))) {
        while (i < n && isBoundary(text.charAt(i))) i += 1
        if (i > start && text.substring(start, i).exists(!_.isWhitespace))
          out += ((start, i))
        start = i
      } else i += 1
    }
    if (start < n && text.substring(start, n).exists(!_.isWhitespace))
      out += ((start, n))
    out.result()
  }

  def tokenCount(text: String, from: Int, to: Int): Int = {
    var cnt = 0
    var inTok = false
    var i = from
    while (i < to) {
      val ws = Character.isWhitespace(text.charAt(i))
      if (!ws && !inTok) { cnt += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    cnt
  }

  /** C3: sentences longer than maxTokens are split at token boundaries;
    * then consecutive pieces greedily re-merge while ≤ mergeTokens.
    * Offsets always index the original text. */
  def chunkSpans(text: String, maxTokens: Int, mergeTokens: Int): IndexedSeq[(Int, Int)] = {
    // 1. split phase
    val pieces = IndexedSeq.newBuilder[(Int, Int)]
    for ((s, e) <- sentences(text)) {
      if (tokenCount(text, s, e) <= maxTokens) pieces += ((s, e))
      else {
        // walk tokens, cut every maxTokens tokens
        var cur = s
        var cnt = 0
        var i = s
        var inTok = false
        while (i < e) {
          val ws = Character.isWhitespace(text.charAt(i))
          if (!ws && !inTok) {
            cnt += 1
            if (cnt > maxTokens) { pieces += ((cur, i)); cur = i; cnt = 1 }
            inTok = true
          } else if (ws) inTok = false
          i += 1
        }
        if (cur < e) pieces += ((cur, e))
      }
    }
    // 2. greedy merge phase
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var curStart = -1
    var curEnd = -1
    var curTokens = 0
    for ((s, e) <- pieces.result()) {
      val t = tokenCount(text, s, e)
      if (curStart < 0) { curStart = s; curEnd = e; curTokens = t }
      else if (curTokens + t <= mergeTokens) { curEnd = e; curTokens += t }
      else { out += ((curStart, curEnd)); curStart = s; curEnd = e; curTokens = t }
    }
    if (curStart >= 0) out += ((curStart, curEnd))
    out.result()
  }

  /** Distributed form: docs → chunk relation (narrow). */
  def apply(docs: Dataset[Doc], maxTokens: Int = 40, mergeTokens: Int = 120)
           (implicit spark: SparkSession): Dataset[Chunk] = {
    import spark.implicits._
    docs.flatMap { d =>
      val text = d.text
      chunkSpans(text, maxTokens, mergeTokens).zipWithIndex.map { case ((s, e), i) =>
        Chunk(d.doc_id, i, s, e, tokenCount(text, s, e))
      }
    }
  }
}
