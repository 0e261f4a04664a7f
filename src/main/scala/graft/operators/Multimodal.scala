package graft.operators

import graft.model.Doc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (media) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata — the
  * engine's job is the Spark-side plumbing (schema, partitioning, batched
  * feature extraction), not codecs. The decode step is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries);
  * `decodeStub` is the single seam where a real decoder would plug in.
  * Batch shape mirrors a `mapInPandas`/Arrow pipeline: mapPartitions with
  * per-partition batching, so a real decoder amortizes model/codec init
  * per partition — the reference batches GPU calls the same way
  * (`2nd Place/submission/infer.py:136-146`, bs=256).
  */
object Multimodal {

  case class MediaRow(doc_id: String, media_ref: String, position: Int, bytes: Array[Byte])
  case class MediaFeatures(doc_id: String, media_ref: String, position: Int,
                           n_bytes: Int, width: Int, height: Int,
                           mean_intensity: Double, histogram: Array[Long])

  /** Extract the media table from interleaved docs. The deterministic fake
    * payload is a pure function of media_ref (stands in for object-store
    * fetch; kind/text/media_ref pass through untouched per the input_hint
    * span invariant). */
  def mediaTable(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.flatMap { d =>
      d.spans.zipWithIndex.collect { case (sp, i) if sp.kind == "media" =>
        MediaRow(d.doc_id, sp.media_ref, i, fakePayload(sp.media_ref))
      }
    }
  }

  /** Deterministic fake payload: 256 bytes derived from the ref hash. */
  def fakePayload(mediaRef: String): Array[Byte] = {
    val seed = graft.functions.TextFns.hash64(mediaRef, 0x6d6d)
    Array.tabulate(256)(i => (graft.fixtures.Synth.h(seed, i.toLong) & 0xff).toByte)
  }

  /** STUB decoder: deterministic pseudo-decode of the payload into
    * image-like features. Replace with a real codec at the `???` seam. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double, Array[Long]) = {
    // real implementation would be: val img = ImageIO.read(...) — unavailable
    // here; the fake derives stable "dimensions" and a 16-bin histogram.
    val w = 16 + (bytes.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 16 + (bytes.lift(1).getOrElse(0: Byte) & 0x3f)
    val hist = new Array[Long](16)
    var s = 0L
    bytes.foreach { b => val v = b & 0xff; s += v; hist(v >> 4) += 1 }
    // 2dp mean via INTEGER half-up rounding — exact and replayable in SQL
    // ((200s + n) / 2n == floor(100·s/n + 0.5) for non-negative ints),
    // unlike float rint whose half-even ties an oracle can't reproduce
    val mean =
      if (bytes.isEmpty) 0.0
      else ((200L * s + bytes.length) / (2L * bytes.length)) / 100.0
    (w, h, mean, hist)
  }

  /** Batched feature extraction: repartition by media_ref hash (spreads
    * object-store reads), then per-partition batched decode. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 256)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(col("media_ref"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would initialize once here and process the batch
          batch.iterator.map { m =>
            val (w, h, mean, hist) = decodeStub(m.bytes)
            MediaFeatures(m.doc_id, m.media_ref, m.position, m.bytes.length, w, h, mean, hist)
          }
        }
      }
  }
}
