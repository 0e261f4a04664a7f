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

  test("sessionize: hand-built sessions close at the gap, sentinels excluded") {
    // user 1: events at 0, 10, 25 min (one session), then 70 min (second
    // session, closed only by the sentinel). user 2: single event.
    val base = 1700000000000L
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("sess_spec").toString
    // the streaming source's pathGlobFilter matches LEAF files, so the
    // fixture must be a plain file named events.parquet (like the driver's
    // testdata), not a Spark output directory
    Seq(
      (1L, ts(0), 1L, "click", 1.0, ""),
      (2L, ts(10), 1L, "click", 2.0, ""),
      (3L, ts(25), 1L, "view", 4.0, ""),
      (4L, ts(70), 1L, "click", 8.0, ""),
      (5L, ts(5), 2L, "view", 16.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events_out")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/events_out"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = EventStream.sessionize(spark, dir, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, ts(0), ts(25), 3L, 7.0),
      (1L, ts(70), ts(70), 1L, 8.0),
      (2L, ts(5), ts(5), 1L, 16.0)))
  }

  test("sessionize fails loudly on NULL user_id instead of desyncing counts") {
    val base = 1700000000000L
    val dir = java.nio.file.Files.createTempDirectory("sess_null").toString
    Seq(
      (1L, new java.sql.Timestamp(base), java.lang.Long.valueOf(1L), "click", 1.0, ""),
      (2L, new java.sql.Timestamp(base + 60000L), null.asInstanceOf[java.lang.Long], "view", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events_out")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/events_out"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val ex = intercept[IllegalArgumentException] {
      EventStream.sessionize(spark, dir)
    }
    assert(ex.getMessage.contains("NULL user_id"))
  }

  test("sessionize equals the batch gaps-and-islands assignment on real events") {
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ parquet → LTZ (UTC session)
      .withColumn("ep", col("ts").cast("double")) // fractional epoch seconds (keep millis)
      .withColumn("brk", when(lag(col("ep"), 1).over(w).isNull ||
        col("ep") - lag(col("ep"), 1).over(w) > 1800.0, 1)
        .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val streamed = EventStream.sessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
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
