package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class MultimodalStreamingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("media table extraction preserves refs and positions") {
    val (docsSeq, _) = graft.fixtures.Synth.corpus(20, 100)
    val media = Multimodal.mediaTable(spark.createDataset(docsSeq)).collect()
    assert(media.nonEmpty)
    val byDoc = docsSeq.map(d => d.doc_id -> d).toMap
    for (m <- media) {
      val sp = byDoc(m.doc_id).spans(m.position)
      assert(sp.kind == "media" && sp.media_ref == m.media_ref)
      assert(m.bytes.length == 256)
    }
  }

  test("feature extraction is deterministic and typed") {
    val (docsSeq, _) = graft.fixtures.Synth.corpus(10, 100)
    val media = Multimodal.mediaTable(spark.createDataset(docsSeq))
    val f1 = Multimodal.extractFeatures(media).collect()
      .sortBy(m => (m.doc_id, m.position))
    val f2 = Multimodal.extractFeatures(media).collect()
      .sortBy(m => (m.doc_id, m.position))
    assert(f1.toSeq.map(_.media_ref) == f2.toSeq.map(_.media_ref))
    assert(f1.toSeq.map(_.mean_intensity) == f2.toSeq.map(_.mean_intensity))
    for (f <- f1) {
      assert(f.histogram.sum == f.n_bytes)
      assert(f.width >= 16 && f.height >= 16)
    }
  }

  test("streaming hourly counts equal the batch aggregation") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = EventStream.hourlyCounts(spark, sfDir)
      .select(col("hour"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
