package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick bottleneck probe: doc GENERATION vs storage-read ANNOTATE at
  * several parallelism levels — separates the synthetic fixture's allocator
  * cost from the engine's. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleprobe").toString
    Scaling.materialize(dir, n, 1000)
    for (cores <- Seq(2, 8, 32)) {
      val t = Scaling.withSession(cores) { spark =>
        import spark.implicits._
        implicit val s = spark
        // generation only
        val t0 = System.nanoTime()
        graft.queries.LinkageQueries.docs(spark, n).map(_.spans.length)
          .agg(Map("value" -> "sum")).head()
        val genSec = (System.nanoTime() - t0) / 1e9
        // storage-read annotate: first (codegen/broadcast warmup) + steady
        val (annSec, _) = Scaling.time(Scaling.annotateJob(spark, dir, n))
        val (annSec2, _) = Scaling.time(Scaling.annotateJob(spark, dir, n))
        (genSec, annSec, annSec2)
      }
      println(f"cores=$cores%2d  gen=${t._1}%6.1f s (${n / t._1}%8.0f docs/s)  annotate1=${t._2}%6.1f s (${n / t._2}%8.0f docs/s)  annotate2=${t._3}%6.1f s (${n / t._3}%8.0f docs/s)")
    }
  }
}
