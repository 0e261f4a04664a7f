package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** A9: per-group embedding mean (the reference averages synonym vectors per
  * concept then L2-normalizes, `2nd Place/src/embeds.py:39-72`). A typed
  * `Aggregator` with a mutable (sums, count) buffer — partial aggregation
  * happens map-side, only (dim+1) doubles cross the shuffle per group. */
class VectorMean(dim: Int, normalize: Boolean)
  extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val arr = b._1
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { arr(i) += v(i); i += 1 }
    (arr, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val arr = x._1
    var i = 0
    while (i < dim) { arr(i) += y._1(i); i += 1 }
    (arr, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Float] = {
    if (b._2 == 0) return Seq.fill(dim)(0f)
    val mean = b._1.map(_ / b._2)
    val out =
      if (!normalize) mean
      else {
        val norm = math.sqrt(mean.map(x => x * x).sum)
        if (norm == 0) mean else mean.map(_ / norm)
      }
    out.map(_.toFloat).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}

object VectorAgg {
  /** Column form: mean (optionally L2-normalized) of an array<float> column. */
  def vectorMean(dim: Int, normalize: Boolean = false) =
    org.apache.spark.sql.functions.udaf(new VectorMean(dim, normalize))
}
