package graft.functions

import scala.collection.mutable

/** F16: LLM-echo block alignment — a faithful transcription of CPython's
  * `difflib.SequenceMatcher` over character sequences, as the reference
  * uses it to map an LLM's echoed/annotated text back to source offsets
  * (`3rd Place/src/document.py:635-665` find_matching_sequences_difflib;
  * consumers at `:1061-1116`).
  *
  * Semantics pinned to stdlib difflib with `isjunk=None, autojunk=True`
  * (the reference passes `None`): b2j char→positions index; AUTOJUNK —
  * when len(b) ≥ 200, chars occurring more than len(b)/100 + 1 times are
  * "popular" and removed from b2j (they cannot seed a match) but are NOT
  * junk (the first pair of extension loops still grows a match across
  * them, and with no isjunk the junk-extension loops are no-ops);
  * find_longest_match prefers the earliest i then earliest j among
  * maximal matches; get_matching_blocks splits LIFO around each longest
  * match, sorts, merges adjacent blocks, and appends the (la, lb, 0)
  * dummy. Parity with real Python difflib is pinned vector-for-vector in
  * BioGmlOffsetSpec (including an autojunk-triggering ≥200-char case).
  *
  * CONTRACT: elements are UTF-16 code units, so parity with CPython (which
  * matches codepoints) holds exactly for BMP-only text — all of this
  * engine's ASCII-guarded corpora — and a match boundary can split a
  * surrogate pair on astral-plane input. Per-pair scalar computation (the
  * operator shape is a per-row map) — distribution comes from the
  * enclosing Dataset, not from this class.
  */
object DiffLib {

  final case class Match(a: Int, b: Int, size: Int)

  final class SequenceMatcher(a: String, b: String, autojunk: Boolean = true) {
    // __chain_b: b2j (ascending index lists), minus popular elements
    private val b2j: Map[Char, Array[Int]] = {
      val m = mutable.LinkedHashMap.empty[Char, mutable.ArrayBuffer[Int]]
      var i = 0
      while (i < b.length) {
        m.getOrElseUpdate(b.charAt(i), mutable.ArrayBuffer.empty) += i
        i += 1
      }
      val n = b.length
      val popular: Set[Char] =
        if (autojunk && n >= 200) {
          val ntest = n / 100 + 1
          m.iterator.collect { case (c, idxs) if idxs.length > ntest => c }.toSet
        } else Set.empty
      m.iterator.filterNot { case (c, _) => popular(c) }
        .map { case (c, idxs) => c -> idxs.toArray }.toMap
    }
    // isjunk = None → bjunk is empty; popular chars are NOT junk
    private def isbjunk(@annotation.unused c: Char): Boolean = false

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a.charAt(i)) match {
          case Some(idxs) =>
            var p = 0
            var break = false
            while (p < idxs.length && !break) {
              val j = idxs(p)
              if (j < blo) () // continue
              else if (j >= bhi) break = true
              else {
                val k = j2len.getOrElse(j - 1, 0) + 1
                newj2len(j) = k
                if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
              }
              p += 1
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // extend over NON-junk on both ends (popular chars pass this test)
      while (besti > alo && bestj > blo && !isbjunk(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        !isbjunk(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      // junk-extension loops (no-ops with isjunk=None, kept for shape parity)
      while (besti > alo && bestj > blo && isbjunk(b.charAt(bestj - 1)) &&
        a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        isbjunk(b.charAt(bestj + bestsize)) &&
        a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      Match(besti, bestj, bestsize)
    }

    /** LIFO split around each longest match, sort, merge adjacent, append
      * the (la, lb, 0) dummy — byte-for-byte the stdlib algorithm. */
    def getMatchingBlocks: Seq[Match] = {
      val la = a.length; val lb = b.length
      val queue = mutable.Stack((0, la, 0, lb))
      val blocks = mutable.ArrayBuffer.empty[Match]
      while (queue.nonEmpty) {
        val (alo, ahi, blo, bhi) = queue.pop()
        val m = findLongestMatch(alo, ahi, blo, bhi)
        if (m.size > 0) {
          blocks += m
          if (alo < m.a && blo < m.b) queue.push((alo, m.a, blo, m.b))
          if (m.a + m.size < ahi && m.b + m.size < bhi)
            queue.push((m.a + m.size, ahi, m.b + m.size, bhi))
        }
      }
      val sorted = blocks.sortBy(m => (m.a, m.b, m.size))
      val nonAdjacent = mutable.ArrayBuffer.empty[Match]
      var i1 = 0; var j1 = 0; var k1 = 0
      for (m <- sorted) {
        if (i1 + k1 == m.a && j1 + k1 == m.b) k1 += m.size
        else {
          if (k1 > 0) nonAdjacent += Match(i1, j1, k1)
          i1 = m.a; j1 = m.b; k1 = m.size
        }
      }
      if (k1 > 0) nonAdjacent += Match(i1, j1, k1)
      nonAdjacent += Match(la, lb, 0)
      nonAdjacent.toSeq
    }
  }

  /** `find_matching_sequences_difflib` (`document.py:635-665`): matching
    * blocks minus the dummy, zero-length dropped, as
    * ((start1, end1), (start2, end2), matched text1 slice). */
  def findMatchingSequences(text1: String, text2: String)
      : Seq[((Int, Int), (Int, Int), String)] = {
    val blocks = new SequenceMatcher(text1, text2).getMatchingBlocks
    blocks.dropRight(1).collect {
      case Match(s1, s2, k) if k > 0 =>
        ((s1, s1 + k), (s2, s2 + k), text1.substring(s1, s1 + k))
    }
  }
}
