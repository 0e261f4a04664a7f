package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Deterministic corpus with planted near-dups: docs 0..49 unique word
    * salads; doc 100+i = copy of doc i with one word changed; doc 200+i =
    * copy with a sentence appended (i < 10). */
  lazy val docs = {
    val vocab = graft.fixtures.Synth.fillers ++ graft.fixtures.Synth.nouns
    def salad(seed: Long, n: Int) =
      (0 until n).map(k => vocab(graft.fixtures.Synth.hn(vocab.length, seed, k.toLong))).mkString(" ")
    val base = (0 until 50).map(i => (i.toLong, salad(i.toLong, 60)))
    val oneWord = (0 until 10).map { i =>
      val words = base(i)._2.split(' '); words(30) = "changedword"
      (100L + i, words.mkString(" "))
    }
    val appended = (0 until 10).map(i => (200L + i, base(i)._2 + " " + salad(900L + i, 6)))
    val exactCopy = (0 until 5).map(i => (300L + i, base(i)._2))
    (base ++ oneWord ++ appended ++ exactCopy).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under min doc_id") {
    val r = Dedup.exact(docs).collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    for (i <- 0 until 5) {
      val row = r.find(_._1 == 300L + i).get
      assert(row._2 == i && row._3 == 2)
    }
    assert(r.find(_._1 == 7L).get._3 == 1)
  }

  test("minhash-lsh finds planted near-dups and no false positives") {
    val pairs = Dedup.minHashPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 10) assert(pairs.contains((i.toLong, 100L + i)), s"missed one-word dup $i")
    for (i <- 0 until 10) assert(pairs.contains((i.toLong, 200L + i)), s"missed appended dup $i")
    for (i <- 0 until 5) assert(pairs.contains((i.toLong, 300L + i)), s"missed exact dup $i")
    // no pair between unrelated base docs
    val falsePos = pairs.filter { case (a, b) => a < 50 && b < 50 }
    assert(falsePos.isEmpty, s"false positives: $falsePos")
  }

  test("minhash clusters give canonical = min id per dup group") {
    val cl = Dedup.clusters(Dedup.minHashPairs(docs, threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0 until 10) assert(cl(100L + i) == i.toLong)
    for (i <- 0 until 5) assert(cl(300L + i) == i.toLong)
  }

  test("simhash finds exact and single-word dups within hamming bound") {
    val pairs = Dedup.simHashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 5) assert(pairs.contains((i.toLong, 300L + i)))
    assert(!pairs.exists { case (a, b) => a < 50 && b < 50 })
  }

  test("ngram jaccard detector agrees with minhash on planted dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 5) assert(pairs.contains((i.toLong, 300L + i)))
    for (i <- 0 until 10) assert(pairs.contains((i.toLong, 200L + i)))
  }

  test("adaptive shingle sampling recovers SHORT-doc near-dup pairs") {
    // regression for the measured sf0.01 miss (pair 31/383, ~40 shingles):
    // a fixed 1-in-8 sample rate gave short near-dup pairs a ~0.7% miss
    // probability. With the adaptive mask, docs under 32 shingles sample
    // EVERY shingle, so recovery of these pairs is guaranteed, not lucky.
    val words = (0 until 30).map(i => s"w$i")
    def doc(drop: Int) = words.zipWithIndex
      .collect { case (w, i) if i != drop => w }.mkString(" ")
    val shortDocs = (0 until 12).flatMap { k =>
      // pair (10k, 10k+1): 29-token docs (25 shingles < 32 ⇒ mask 1 ⇒
      // every shingle sampled) differing in one adjacent word drop
      Seq((10L * k, doc(k)), (10L * k + 1, doc(k + 1)))
    }.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(shortDocs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- 0 until 12)
      assert(pairs.contains((10L * k, 10L * k + 1)), s"missed short pair $k")
  }

  test("embedding near-dup finds planted duplicate vectors") {
    val base = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        (graft.fixtures.Synth.h(i.toLong, d.toLong).toDouble / Long.MaxValue).toFloat))
    }
    // planted: 100+i = tiny perturbation of i
    val dups = (0 until 8).map { i =>
      (100L + i, base(i)._2.zipWithIndex.map { case (v, d) =>
        v + (if (d == 0) 0.01f else 0f) })
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(emb, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 8) assert(pairs.contains((i.toLong, 100L + i)), s"missed vec dup $i")
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 })
  }
}
