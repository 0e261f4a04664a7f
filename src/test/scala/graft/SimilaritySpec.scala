package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Clustered fixture: 12 centers, 10 members each with small deterministic
    * noise — near neighbors genuinely exist (LSH prunes nothing useful on
    * uniform random vectors; no index can). */
  def vectors: Seq[(Long, Array[Float])] = (0 until 120).map { i =>
    val c = i % 12
    (i.toLong, Array.tabulate(64) { d =>
      val center = graft.fixtures.Synth.h(c.toLong, d.toLong, 5L).toDouble / Long.MaxValue
      val noise = graft.fixtures.Synth.h(i.toLong, d.toLong, 9L).toDouble / Long.MaxValue
      (center + 0.15 * noise).toFloat
    })
  }

  lazy val emb = vectors.toDF("vec_id", "embedding")

  def bruteOracle(k: Int): Map[Long, Seq[Long]] = {
    val vecs = vectors
    vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (n, nv) => (n, math.rint(TextFns.cosine(qv, nv) * 10000) / 10000.0) }
        .sortBy { case (n, s) => (-s, n) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("brute-force top-k matches the driver-side oracle exactly") {
    val got = Similarity.bruteForceTopK(emb, k = 5).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(got == bruteOracle(5))
  }

  test("lsh ann achieves >=60% recall@5 vs brute force and exact top-1 hits for planted dup") {
    val oracle = bruteOracle(5)
    val got = Similarity.lshTopK(emb, k = 5).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(4 - 1)).map(_.getLong(1)).toSet }
    val recalls = oracle.map { case (q, top) =>
      val g = got.getOrElse(q, Set.empty)
      top.count(g.contains).toDouble / top.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"mean recall@5 = $meanRecall%.3f")
    assert(meanRecall >= 0.6, f"LSH recall too low: $meanRecall%.3f")
  }

  test("hyperplane signature is deterministic and locality-sensitive") {
    val planes = Similarity.hyperplanes(16, 64)
    val v = Array.tabulate(64)(d => (d.toFloat - 32) / 64)
    val v2 = v.clone(); v2(0) += 0.001f
    val far = v.map(-_)
    assert(Similarity.hyperplaneSig(v, planes) == Similarity.hyperplaneSig(v, planes))
    assert(TextFns.hammingDistance(
      Similarity.hyperplaneSig(v, planes), Similarity.hyperplaneSig(v2, planes)) <= 1)
    assert(Similarity.hyperplaneSig(far, planes) == ~Similarity.hyperplaneSig(v, planes) ||
      TextFns.hammingDistance(Similarity.hyperplaneSig(far, planes),
        Similarity.hyperplaneSig(v, planes)) >= 12)
  }
}
