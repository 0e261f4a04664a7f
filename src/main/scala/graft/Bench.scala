package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every SparkEntry query
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds,
  * plus the linkage-pipeline docs/sec headline (BASELINE.json metric:
  * docs-scored-per-second). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest sf (not timed)
    try SparkEntry.queries("q01_agg_sum")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: docs scored per second through the full linkage pipeline
    val nDocs = graft.queries.LinkageQueries.corpusSize(sfDir)
    val t0 = System.nanoTime()
    graft.queries.LinkageQueries.pipelineF1(spark, sfDir).collect()
    val pipelineSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nDocs / pipelineSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""docs_per_sec":$docsPerSec,"pipeline_docs":$nDocs,"pipeline_sec":$pipelineSec,""" +
      s""""cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
