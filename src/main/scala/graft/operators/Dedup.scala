package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four escalating detectors, all shaped as
  *   narrow signature computation → band/bucket equi-join (candidates)
  *   → exact verification on the candidate pairs only → canonical clusters
  * so the all-pairs O(n²) never materializes; the only shuffles are the
  * bucket join and the final CC.
  *
  * Word-shingle signatures (not char n-grams): corpus documents share one
  * small vocabulary, so char-gram SETS are near-identical across unrelated
  * docs; w-word shingles keep unrelated docs disjoint while true near-dups
  * stay similar.
  */
object Dedup {

  val ShingleSize = 5

  def wordShingles(text: String, w: Int = ShingleSize): Array[String] = {
    val toks = TextFns.normalize(text).split(' ').filter(_.nonEmpty)
    if (toks.length <= w) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - w + 1)(i => toks.slice(i, i + w).mkString(" "))
  }

  def shingleJaccard(a: String, b: String, w: Int = ShingleSize): Double = {
    val sa = wordShingles(a, w).toSet
    val sb = wordShingles(b, w).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  /** Exact dedup: canonical = min doc_id per content hash (hash-groupBy). */
  def exact(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val canon = h.groupBy("h").agg(min(col("doc_id")).as("canonical_id"),
      count(lit(1)).as("group_size"))
    h.join(canon, "h").select(col("doc_id"), col("canonical_id"), col("group_size"))
  }

  /** MinHash-LSH near-dup pairs: shingle → minhash → band → bucket-join →
    * exact-Jaccard verify. Returns (a, b, jaccard) with a < b. */
  def minHashPairs(docs: DataFrame, threshold: Double = 0.8,
                   k: Int = 128, rowsPerBand: Int = 4)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        TextFns.bandKeys(
          TextFns.minHashOfSet(wordShingles(text), k), rowsPerBand)
          .map(b => (id, b))
      }.toDF("doc_id", "band")
    val cand = sigs.toDF("a", "band")
      .join(sigs.toDF("b", "band"), "band")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    verifyJaccard(cand, docs, threshold)
  }

  /** Exact-verification join: pairs + both texts → shingle Jaccard ≥ τ. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    val jac = udf((x: String, y: String) => shingleJaccard(x, y))
    val ta = docs.select(col("doc_id").as("a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("b"), col("text").as("text_b"))
    pairs.join(ta, "a").join(tb, "b")
      .withColumn("jaccard", jac(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit sketch over word shingles, bucketed by
    * its four 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 chunk equal),
    * verified by exact Hamming distance. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(maxHamming <= 3, "4-chunk pigeonhole covers hamming <= 3")
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, TextFns.simHashOfSet(wordShingles(text))) }
      .toDF("doc_id", "sim")
    val chunked = sigs.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(c =>
        concat(lit(c + ":"), (shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL))))): _*))
        .as("chunk"))
    val cand = chunked.select(col("doc_id").as("a"), col("sim").as("sim_a"), col("chunk"))
      .join(chunked.select(col("doc_id").as("b"), col("sim").as("sim_b"), col("chunk")), "chunk")
      .filter(col("a") < col("b"))
      .select("a", "b", "sim_a", "sim_b").distinct()
    val ham = udf((x: Long, y: Long) => TextFns.hammingDistance(x, y))
    cand.withColumn("hamming", ham(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** N-gram-Jaccard dedup: candidates from cheap sorted-token-prefix keys,
    * verified by exact shingle Jaccard (the "slow path" detector). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8)
                       (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val keyed = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        // sampled shingles as blocking keys, rate ADAPTIVE to doc length:
        // largest power-of-two m with m ≤ n/16, i.e. ~n/m ≥ 16 sampled
        // keys per doc. Two docs at jaccard ≥ τ then share ≥ ~16·τ
        // expected sampled keys under the coarser of their two masks
        // (a shared shingle collides iff its hash passes BOTH masks), so
        // the pair-miss probability is ≤ e^(−16τ) ≈ 6e−7 at τ = 0.9 —
        // a FIXED 1-in-8 rate missed real 40-shingle near-dup pairs
        // (measured: pair (31, 383) at sf0.01), while short docs are
        // exactly the ones where sampling saves nothing. Long-doc key
        // cost stays O(n/16).
        val sh = wordShingles(text)
        val m = Integer.highestOneBit(math.max(1, sh.length / 16)).toLong
        sh.iterator
          .filter(s => (TextFns.hash64(s, 7) & (m - 1L)) == 0L).map(s => (id, s))
      }.toDF("doc_id", "key")
    val cand = keyed.toDF("a", "key").join(keyed.toDF("b", "key"), "key")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    verifyJaccard(cand, docs, threshold)
  }

  /** Embedding-cosine near-dup: random-hyperplane LSH buckets → verify
    * cosine ≥ τ. Hyperplanes are deterministic (hash-derived).
    *
    * Scale shape: bucket rows and the candidate distinct carry ids only;
    * the embedding vectors are re-attached to the DEDUPLICATED (a, b)
    * pairs by two id-keyed joins — each vector crosses the shuffle once
    * per pair, never once per shared bucket. */
  def embeddingPairs(emb: DataFrame, threshold: Double = 0.95,
                     nPlanes: Int = 16, chunkBits: Int = 4)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(
      Similarity.hyperplanes(nPlanes, 64))
    val sigs = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, v) =>
        (id, Similarity.hyperplaneSig(v.toArray, planes.value))
      }.toDF("vec_id", "sig")
    val nChunks = nPlanes / chunkBits
    val chunked = sigs.select(col("vec_id"),
      explode(array((0 until nChunks).map(c =>
        concat(lit(c + ":"), shiftright(col("sig"), c * chunkBits)
          .bitwiseAND(lit((1 << chunkBits) - 1).cast("long")))): _*)).as("bucket"))
    val cand = chunked.toDF("a", "bucket")
      .join(chunked.toDF("b", "bucket"), "bucket")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val withVecs = cand
      .join(vecs.toDF("a", "va"), "a")
      .join(vecs.toDF("b", "vb"), "b")
    val cos = udf((x: Seq[Float], y: Seq[Float]) => TextFns.cosine(x.toArray, y.toArray))
    withVecs.withColumn("cosine", cos(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** Near-dup groups: verified pairs → transitive closure → canonical id. */
  def clusters(pairs: DataFrame)(implicit spark: SparkSession): DataFrame =
    ConnectedComponents(pairs.select(col("a"), col("b")))
      .select(col("id").as("doc_id"), col("component").as("canonical_id"))
}
