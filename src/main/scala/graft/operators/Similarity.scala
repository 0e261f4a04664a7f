package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — the J12 kNN join of the reference
  * (`2nd Place/submission/infer.py:184-232`: query @ DB^T then top-k;
  * `3rd Place/src/vectorDB.py`: Faiss index) re-expressed Spark-first.
  *
  * - bruteForceTopK: broadcast the database matrix, mapPartitions over the
  *   queries with a bounded top-k heap — one narrow pass, no shuffle. This
  *   is exactly the reference's batched matmul, distributed over query
  *   partitions. Baseline + oracle.
  * - lshTopK: random-hyperplane signatures → bucket join → exact rescoring
  *   of candidates only → top-k. The scale path when the database itself is
  *   too big to broadcast.
  */
object Similarity {

  /** Deterministic pseudo-random unit hyperplanes (hash-derived, seedless). */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        // gaussian-ish via sum of 4 uniform hashes (CLT), deterministic
        var s = 0.0
        var r = 0
        while (r < 4) {
          val h = graft.fixtures.Synth.h(p.toLong, d.toLong, r.toLong)
          s += (h.toDouble / Long.MaxValue)
          r += 1
        }
        s / 2.0
      }
    }

  /** Sign signature of v against the hyperplanes, packed into a Long. */
  def hyperplaneSig(v: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val pl = planes(p)
      val n = math.min(v.length, pl.length)
      var i = 0
      while (i < n) { dot += v(i) * pl(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Exact top-k cosine neighbors per query vector. `sim` is rounded to 4
    * decimals BEFORE ranking (ties broken by neighbor id) so the ranking is
    * reproducible across engines. */
  def bruteForceTopK(emb: DataFrame, k: Int = 5)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val db = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, v) => (id, v.toArray) }
      .sortBy(_._1)
    val dbB = spark.sparkContext.broadcast(db)
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val data = dbB.value
        it.flatMap { case (qid, qv) =>
          val q = qv.toArray
          // bounded top-k: (simRounded desc, neighbor asc)
          val ord = Ordering.by[(Long, Double), (Double, Long)] {
            case (id, s) => (-s, id)
          }
          var heap = Vector.empty[(Long, Double)]
          var worst: (Long, Double) = null
          data.foreach { case (nid, nv) =>
            if (nid != qid) {
              val s = math.rint(TextFns.cosine(q, nv) * 10000) / 10000.0
              val cand = (nid, s)
              if (heap.size < k) {
                heap = (heap :+ cand).sorted(ord)
              } else if (ord.lt(cand, heap.last)) {
                heap = (heap.init :+ cand).sorted(ord)
              }
            }
          }
          heap.zipWithIndex.map { case ((nid, s), r) => (qid, nid, s, r + 1) }
        }
      }.toDF("vec_id", "neighbor_id", "sim", "rnk")
  }

  /** LSH-bucketed ANN: candidates share ≥1 signature chunk; exact cosine on
    * candidates only; top-k per query (same rounding/tie rules). */
  def lshTopK(emb: DataFrame, k: Int = 5, nPlanes: Int = 16, chunkBits: Int = 4)
             (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(hyperplanes(nPlanes, 64))
    val sigs = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v.toArray, hyperplaneSig(v.toArray, planes.value)) }
      .toDF("vec_id", "v", "sig")
    val nChunks = nPlanes / chunkBits
    val chunked = sigs.select(col("vec_id"), col("v"),
      explode(array((0 until nChunks).map(c =>
        concat(lit(c + ":"), shiftright(col("sig"), c * chunkBits)
          .bitwiseAND(lit((1 << chunkBits) - 1).cast("long")))): _*)).as("bucket"))
    val cand = chunked.select(col("vec_id").as("vec_id"), col("v").as("qv"), col("bucket"))
      .join(chunked.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("bucket")), "bucket")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id", "qv", "nv").distinct()
    val cos = udf((x: Seq[Float], y: Seq[Float]) =>
      math.rint(TextFns.cosine(x.toArray, y.toArray) * 10000) / 10000.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("sim", cos(col("qv"), col("nv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("sim"), col("rnk"))
  }
}
