package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Chunking, Graph}
import org.apache.spark.sql.functions._

class GraphChunkingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("ancestor closure on a known tree") {
    // tree: 1<-2,3; 2<-4,5; 3<-6; 5<-7 (child, parent)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L), (7L, 5L))
      .toDF("child", "parent")
    val anc = Graph.ancestorClosure(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(anc == Set((2L, 1L), (3L, 1L), (4L, 2L), (4L, 1L), (5L, 2L), (5L, 1L),
      (6L, 3L), (6L, 1L), (7L, 5L), (7L, 2L), (7L, 1L)))
    val desc = Graph.descendants(edges, Seq(2L).toDF("root")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(desc == Set((2L, 4L), (2L, 5L), (2L, 7L)))
  }

  test("BFS local fast path ≡ frontier-join loop (differential, incl. a cycle)") {
    // tree + diamond (7 has parents 4 AND 5) + cycle 1→7→5→2→1 (child, parent)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 3L), (7L, 5L),
      (7L, 4L), (1L, 7L)).toDF("child", "parent")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).toSet
    // edgeCap = 0 forces the fact-scale frontier loop; default takes the
    // collected-adjacency local path — outputs must be row-identical
    assert(pairs(Graph.ancestorClosure(edges)) ==
      pairs(Graph.ancestorClosure(edges, edgeCap = 0)))
    val roots = Seq(1L, 6L).toDF("root")
    assert(pairs(Graph.descendants(edges, roots)) ==
      pairs(Graph.descendants(edges, roots, edgeCap = 0)))
    assert(pairs(Graph.shortestPaths(edges, roots)) ==
      pairs(Graph.shortestPaths(edges, roots, edgeCap = 0)))
    assert(pairs(Graph.neighbourhood(edges, roots, steps = 2)) ==
      pairs(Graph.neighbourhood(edges, roots, steps = 2, edgeCap = 0)))
    // the cycle reaches the root itself: (1, 1) must be in the closure
    assert(pairs(Graph.ancestorClosure(edges)).contains(List(1L, 1L)))
    // the loud maxDist truncation guard fires identically on BOTH paths
    val chain = (2L to 6L).map(i => (i, i - 1)).toDF("child", "parent")
    val exLocal = intercept[IllegalArgumentException] {
      Graph.shortestPaths(chain, Seq(1L).toDF("root"), maxDist = 3).collect()
    }
    assert(exLocal.getMessage.contains("maxDist"))
    val exLoop = intercept[IllegalArgumentException] {
      Graph.shortestPaths(chain, Seq(1L).toDF("root"), maxDist = 3, edgeCap = 0)
        .collect()
    }
    assert(exLoop.getMessage.contains("maxDist"))
  }

  test("isolate removal keeps only edge endpoints") {
    val nodes = Seq(1L, 2L, 3L, 99L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 1L)).toDF("child", "parent")
    val kept = Graph.removeIsolates(nodes, edges).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("sentence splitting covers all non-whitespace and respects boundaries") {
    val text = "First sentence. Second one!\nThird?? And a last one"
    val ss = Chunking.sentences(text)
    assert(ss.nonEmpty)
    for (Seq((_, e1), (s2, _)) <- ss.sliding(2) if ss.length > 1) assert(e1 <= s2)
    val covered = ss.map { case (s, e) => text.substring(s, e).trim }.mkString(" ")
    assert(covered.contains("First sentence") && covered.contains("And a last one"))
  }

  test("chunk spans track offsets, respect budgets, and preserve text") {
    val (docsSeq, _) = graft.fixtures.Synth.corpus(15, 100)
    for (d <- docsSeq) {
      val text = d.text
      val chunks = Chunking.chunkSpans(text, maxTokens = 20, mergeTokens = 60)
      // offsets valid and non-overlapping
      for (Seq((_, e1), (s2, _)) <- chunks.sliding(2) if chunks.length > 1) assert(e1 <= s2)
      for ((s, e) <- chunks) {
        assert(s >= 0 && e <= text.length && s < e)
        assert(Chunking.tokenCount(text, s, e) <= 60)
      }
      // every non-whitespace char of the text lands in some chunk
      val inChunk = new Array[Boolean](text.length)
      for ((s, e) <- chunks; i <- s until e) inChunk(i) = true
      for (i <- 0 until text.length if !text.charAt(i).isWhitespace)
        assert(inChunk(i), s"char $i '${text.charAt(i)}' of ${d.doc_id} not covered")
    }
  }

  test("distributed chunking returns consistent token counts") {
    val (docsSeq, _) = graft.fixtures.Synth.corpus(10, 100)
    val chunks = Chunking.apply(spark.createDataset(docsSeq)).collect()
    assert(chunks.nonEmpty)
    val byDoc = docsSeq.map(d => d.doc_id -> d.text).toMap
    for (c <- chunks)
      assert(c.n_tokens == Chunking.tokenCount(byDoc(c.doc_id), c.start, c.end))
  }
}
