package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming coverage. The reference is batch-only (SURVEY §2.13),
  * but the engine exposes the streaming shape of its per-event aggregations:
  * hourly windowed counts with a watermark, runnable synchronously over the
  * static events table for verification (memory sink + processAllAvailable).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly windowed counts per event_type, streaming, drained to a memory
    * sink. Returns the finished result as a DataFrame
    * (hour timestamp, event_type, n, sum_value). */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_" + math.abs(sfDir.hashCode).toString
    val stream = spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
  }
}
