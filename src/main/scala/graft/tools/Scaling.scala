package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Scaling-efficiency evidence (north rule: throughput scaling efficiency
  * ≥ 0.8 from N to 4N executors; no real cluster in this sandbox, so the
  * same jobs run at two `local[k]` levels on the same input —
  * efficiency = t_N / (4 · t_4N)).
  *
  * The INPUT IS PRE-MATERIALIZED TO PARQUET (untimed) and every measured
  * job reads it from storage — the north-rule deployment shape
  * (spark-submit over an Iceberg doc table). Timing the synthetic doc
  * GENERATOR inside the job would measure the fixture's string allocation,
  * which saturates this host's single-socket allocator near 24 threads and
  * is not part of the engine.
  *
  * Two jobs, each at local[4]→local[16] and local[8]→local[32]:
  *  1. gazetteer annotation (fused broadcast-probe → OverlapResolve) — the
  *     1st-place inference path
  *  2. the full linkage pipeline (blocking → scoring → argmax edges → CC)
  *
  * Results are appended to BENCH/SCALING_RUN.md.
  */
object Scaling {

  def withSession[A](cores: Int)(f: SparkSession => A): A = {
    // shuffle/spill on tmpfs when available: a scaling measurement is about
    // CPU parallelism — single-disk writeback timing is noise this sandbox
    // adds that a real cluster (per-executor disks) does not have
    val localDir =
      if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm/graft-spark-local"
      else System.getProperty("java.io.tmpdir")
    // default: shuffle partitions track cores (the round-2..5 ladder
    // protocol). GRAFT_SHUFFLE_PARTS pins a FIXED partition count at every
    // level — the truer cluster analogy (a real job sizes partitions for
    // the data, then scales executors under it)
    val parts = sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", cores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  /** Materialize the annotate input (doc_id, text) and the pipeline inputs
    * (docs text + golds) to parquet — untimed setup. */
  def materialize(dir: String, annDocs: Int, pipDocs: Int): Unit = {
    withSession(32) { spark =>
      import spark.implicits._
      import graft.queries.LinkageQueries
      // flat text table via pure column expressions (codegen'd)
      def textTable(n: Int) = LinkageQueries.docs(spark, n).toDF()
        .select(col("doc_id"),
          array_join(transform(filter(col("spans"), s => s("kind") === "text"),
            s => s("text")), "").as("text"))
      // 256 output files: enough waves at every measured parallelism that
      // one straggler file can't serialize a level
      textTable(annDocs).repartition(256).write.mode("overwrite").parquet(s"$dir/ann_docs")
      textTable(pipDocs).repartition(256).write.mode("overwrite").parquet(s"$dir/pip_docs")
      LinkageQueries.gold(spark, pipDocs).toDF()
        .repartition(64).write.mode("overwrite").parquet(s"$dir/pip_golds")
      // the dictionaries too: building the synthetic dict Seq on the driver
      // is fixture cost and must not sit inside the timed job
      LinkageQueries.dict(spark, annDocs).toDF()
        .write.mode("overwrite").parquet(s"$dir/ann_dict")
      LinkageQueries.dict(spark, pipDocs).toDF()
        .write.mode("overwrite").parquet(s"$dir/pip_dict")
    }
  }

  def annotateJob(spark: SparkSession, dir: String, nDocs: Int): Long = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    import graft.model.DictEntry
    val docsText = spark.read.parquet(s"$dir/ann_docs").as[(String, String)]
    val dict = spark.read.parquet(s"$dir/ann_dict").as[DictEntry]
    // fused probe + IN-ROW overlap resolve (the production inference shape,
    // r4): same output as OverlapResolve.apply(annotateText(...)) minus the
    // row shuffle that only regrouped rows already co-produced per doc
    graft.operators.DictionaryMatch.annotateTextResolved(docsText, dict).count()
  }

  def pipelineJob(spark: SparkSession, dir: String, nDocs: Int): Long = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    import graft.model.{DictEntry, GoldAnnotation}
    val docsText = spark.read.parquet(s"$dir/pip_docs").as[(String, String)]
    val golds = spark.read.parquet(s"$dir/pip_golds").as[GoldAnnotation]
    val dict = spark.read.parquet(s"$dir/pip_dict").as[DictEntry]
    val mentions = graft.plans.LinkagePipeline.mentionsFromText(docsText, golds)
    // persistScored stays TRUE even though this job reads only assignments:
    // the cache boundary is what pins the scoring expressions to exactly one
    // evaluation per pair — measured without it, the argmax chain re-derives
    // them downstream and the same 400k-doc run went 105 s → 440-590 s at
    // local[16] (see LinkagePipeline.run scaladoc)
    val r = graft.plans.LinkagePipeline.run(mentions, dict)
    val n = r.assignments.count()
    r.release()
    n
  }

  def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    // annDocs == 0 → pipeline-only ladder (skips the annotate job per rep:
    // lets a within-session 4↔16 pipeline ladder fit a short quiet window)
    val annDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val pipDocs = args.lift(1).map(_.toInt).getOrElse(100000)
    val pipOnly = annDocs == 0
    // inputs on tmpfs too — the measurement is CPU scaling, not disk
    val dir =
      if (Files.isDirectory(Paths.get("/dev/shm")))
        Files.createTempDirectory(Paths.get("/dev/shm"), "graft-scaling").toString
      else Files.createTempDirectory("graft-scaling").toString

    materialize(dir, math.max(annDocs, 1000), pipDocs)

    // JIT warmup (small) so the first measured run isn't penalized
    withSession(32) { s =>
      if (pipOnly) pipelineJob(s, dir, pipDocs) else annotateJob(s, dir, annDocs)
      ()
    }

    case class Meas(cores: Int, tAnn: Double, tPip: Double)
    val levels = args.lift(2).map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(4, 16, 8, 32))
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    // INTERLEAVED repeats, min per level: single runs on this shared host
    // are bimodal (co-tenant load / GC / JIT interference) and an
    // interference window can cover consecutive runs of one level —
    // alternating levels samples the interference evenly; the min is the
    // engine's steady-state
    val samples = (1 to reps).flatMap { r =>
      levels.map { k =>
        val ta = if (pipOnly) 0.0
          else withSession(k)(s => time(annotateJob(s, dir, annDocs)))._1
        val tp = withSession(k)(s => time(pipelineJob(s, dir, pipDocs)))._1
        val annStr = if (pipOnly) "" else f", annotate $ta%.1f s"
        println(f"[scaling-sample] rep$r local[$k]: pipeline $tp%.1f s$annStr")
        (k, ta, tp)
      }
    }
    // annotate lines/columns are omitted in pipeline-only mode (annDocs=0)
    // instead of reporting 0.0 s rows and 0/0 = NaN efficiencies
    def annPart(t: Double): String = if (pipOnly) "" else f", annotate $t%.1f s"
    val meas = levels.map { k =>
      val ks = samples.filter(_._1 == k)
      val m = Meas(k, ks.map(_._2).min, ks.map(_._3).min)
      println(f"[scaling] local[$k]: pipeline ${m.tPip}%.1f s${annPart(m.tAnn)}")
      k -> m
    }.toMap

    def eff(lo: Int, hi: Int, f: Meas => Double): Double =
      f(meas(lo)) / (4.0 * f(meas(hi)))

    if (!Seq(4, 8, 16, 32).forall(meas.contains)) {
      // partial ladder (targeted re-run): raw lines only
      meas.toSeq.sortBy(_._1).foreach { case (k, m) =>
        println(f"[scaling-partial] local[$k]: pipeline ${m.tPip}%.1f s${annPart(m.tAnn)}")
      }
      return
    }

    val annRow = if (pipOnly) "" else
      // double leading pipe: the first is the stripMargin margin char
      f"\n|| gazetteer annotate (fused probe) | ${meas(4).tAnn}%.1f | ${meas(16).tAnn}%.1f | ${eff(4, 16, _.tAnn)}%.3f | ${meas(8).tAnn}%.1f | ${meas(32).tAnn}%.1f | ${eff(8, 32, _.tAnn)}%.3f |"
    val annThroughput = if (pipOnly) "" else
      f" annotate ${annDocs / meas(32).tAnn}%.0f docs/s at local[32] (${annDocs / meas(4).tAnn}%.0f at local[4]);"
    val md =
      f"""
         |## Measured scaling — same job, same parquet input, N vs 4N threads
         |
         |No real cluster in this sandbox: the north rule's N vs 4N executors is
         |evidenced as the same job on the same MATERIALIZED parquet input at two
         |`local[k]` levels. Efficiency = t_N / (4 · t_4N). Inputs: $annDocs docs
         |(annotate), $pipDocs docs (pipeline); terminology scales with corpus.
         |The corpus generator runs once, untimed, to parquet — measured jobs
         |read from storage (the spark-submit/Iceberg deployment shape).
         |
         || Job | t@4 (s) | t@16 (s) | eff 4→16 | t@8 (s) | t@32 (s) | eff 8→32 |
         ||---|---|---|---|---|---|---|$annRow
         || full linkage pipeline | ${meas(4).tPip}%.1f | ${meas(16).tPip}%.1f | ${eff(4, 16, _.tPip)}%.3f | ${meas(8).tPip}%.1f | ${meas(32).tPip}%.1f | ${eff(8, 32, _.tPip)}%.3f |
         |
         |Throughput:$annThroughput pipeline
         |${pipDocs / meas(32).tPip}%.0f docs/s at local[32].
         |Reference single-node throughput: 1st-place inference ≈ 0.083 docs/s
         |(5 docs/min, `1st Place/README.md:20`).
         |""".stripMargin

    println(md)
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/SCALING_RUN.md"), md)
  }
}
