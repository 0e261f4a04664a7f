package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batched pairwise scoring (north rule): Jaro-Winkler + Levenshtein +
  * cosine-over-embedding features fused by a logistic scorer.
  *
  * Reference analogs: exact dict-key equality (1st place), SapBERT cosine
  * with 0.90 accept threshold (2nd place, `2nd Place/submission/
  * second_stage_postprocess.py:86-90`), LLM re-rank pick (3rd place). Our
  * deterministic rebuild scores candidate pairs with string+embedding
  * features; the logistic fusion plays the re-ranker's role (SURVEY §3.4).
  *
  * Plan shape: node features (norm + hashed embedding) are computed ONCE per
  * node (narrow), then the pair table joins them twice. `levenshtein` is the
  * codegen'd Spark built-in; JW and cosine are scala UDFs over the already-
  * joined feature columns.
  */
object PairwiseScoring {

  /** Logistic fusion weights: sigmoid(gain·(w·x − bias)). Calibrated on the
    * synthetic corpus (PairwiseScoringSpec prints the margin); score ≥ 0.5
    * ⟺ fused linear combination ≥ bias. */
  case class Weights(wJw: Double = 0.30, wLev: Double = 0.40, wCos: Double = 0.30,
                     bias: Double = 0.82, gain: Double = 12.0)

  val jwUdf = udf((a: String, b: String) => TextFns.jaroWinkler(a, b))
  val embUdf = udf((s: String) => TextFns.hashedEmbedding(s))

  /** Per-executor bounded cache of hashed embeddings: each node participates
    * in many pairs, so recomputing its embedding per pair is wasted CPU,
    * while SHIPPING it through the pair joins is 256 B/row of shuffle —
    * the cache gives the best of both (compute once per executor). */
  // Thread-local LRU: a shared synchronized map would serialize all task
  // threads on every access-order mutation — a measured scaling killer at
  // local[32]. Per-thread caches cost a little memory, zero contention.
  @transient private lazy val embCache =
    ThreadLocal.withInitial[java.util.LinkedHashMap[String, Array[Float]]](() =>
      new java.util.LinkedHashMap[String, Array[Float]](16384, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Float]]) =
          size() > 50000
      })

  /** RAW (unnormalized) hashed embeddings: cosine is scale-invariant, and
    * over the integer-valued raw vectors it is bit-exact across engines
    * (see TextFns.hashedEmbeddingRaw) — the float rounding of the
    * L2-normalized form would break the DuckDB score replay. */
  def cachedEmbedding(s: String): Array[Float] = {
    val m = embCache.get()
    val hit = m.get(s)
    if (hit != null) hit
    else { val v = TextFns.hashedEmbeddingRaw(s); m.put(s, v); v }
  }

  /** cos feature of two norms via the executor-local embedding cache. */
  val cosNormUdf = udf((a: String, b: String) =>
    TextFns.cosine(cachedEmbedding(a), cachedEmbedding(b)))

  /** nodes(id, norm) → nodes(id, norm, emb) (kept for API users that want
    * materialized embeddings; the scorer itself derives them from norms). */
  def withFeatures(nodes: DataFrame): DataFrame =
    nodes.withColumn("emb", embUdf(col("norm")))

  /** Narrow scoring over pairs that already carry both norms
    * (Blocking.candidatePairsWithNorms) — zero additional shuffles. */
  def scoreInline(pairsWithNorms: DataFrame, w: Weights = Weights()): DataFrame =
    addScoreColumns(pairsWithNorms, w)

  /** pairs(a, b) ⋈ node norms → scored pairs (jw, lev_ratio, cos, score).
    * Only the 2 norm strings travel through the pair joins; embeddings are
    * derived executor-side (cached), and `levenshtein` is the codegen'd
    * built-in. */
  def score(pairs: DataFrame, nodes: DataFrame, w: Weights = Weights())
           (implicit spark: SparkSession): DataFrame = {
    val fa = nodes.select(col("id").as("a"), col("norm").as("norm_a"))
    val fb = nodes.select(col("id").as("b"), col("norm").as("norm_b"))
    addScoreColumns(pairs.join(fa, "a").join(fb, "b"), w)
  }

  private def addScoreColumns(joined: DataFrame, w: Weights): DataFrame = {
    val jw = jwUdf(col("norm_a"), col("norm_b"))
    val levRatio = lit(1.0) - levenshtein(col("norm_a"), col("norm_b")).cast("double") /
      greatest(length(col("norm_a")), length(col("norm_b")), lit(1))
    val cos = cosNormUdf(col("norm_a"), col("norm_b"))
    val linear = lit(w.wJw) * col("jw") + lit(w.wLev) * col("lev_ratio") + lit(w.wCos) * col("cos")
    joined
      .withColumn("jw", jw)
      .withColumn("lev_ratio", levRatio)
      .withColumn("cos", cos)
      .withColumn("score",
        lit(1.0) / (lit(1.0) + exp(-lit(w.gain) * (linear - lit(w.bias)))))
      .select(col("a"), col("b"), col("jw"), col("lev_ratio"), col("cos"), col("score"))
  }

  /** Match edges: fused probability ≥ 0.5 (⟺ linear ≥ bias). */
  def matchEdges(scored: DataFrame): DataFrame =
    scored.filter(col("score") >= 0.5).select(col("a"), col("b"))

  /** Pure driver-side oracle of the same fusion (differential tests). */
  def scorePure(na: String, nb: String, w: Weights = Weights()): Double = {
    val jw = TextFns.jaroWinkler(na, nb)
    val levr = 1.0 - TextFns.levenshtein(na, nb).toDouble /
      math.max(1, math.max(na.length, nb.length))
    val cos = TextFns.cosine(TextFns.hashedEmbeddingRaw(na), TextFns.hashedEmbeddingRaw(nb))
    val linear = w.wJw * jw + w.wLev * levr + w.wCos * cos
    1.0 / (1.0 + math.exp(-w.gain * (linear - w.bias)))
  }
}
