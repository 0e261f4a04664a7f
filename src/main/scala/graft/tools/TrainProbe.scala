package graft.tools

import graft.fixtures.Synth
import graft.model.DictEntry
import graft.operators.DictTrain
import graft.plans.LinkagePipeline
import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-phase wall time of the dict_train query (NOT graded —
  * replays trainDictionarySplit's sequence with explicit barriers to
  * attribute its bench cost). Args: sfDir cores. */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[train-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val n = LinkageQueries.corpusSize(sfDir)
    val k = LinkageQueries.numConcepts(n)
    val (docs, golds) = phase("corpus persist") {
      val (d, g) = LinkageQueries.sharedCorpus(spark, sfDir)
      d.count(); g.count(); (d, g)
    }
    val mentions = phase("mentions extract+persist") {
      val m = LinkagePipeline.mentionsFromSpans(docs, golds).toDF().persist(MEMORY_AND_DISK)
      m.count(); m
    }
    val harvested = phase("harvest dict") {
      val h = DictTrain.dictFromMentions(mentions, golds).persist(MEMORY_AND_DISK)
      h.count(); h
    }
    val ucNorms = phase("uc norms") {
      val u = DictTrain.uppercaseMentionsOf(mentions).select(col("norm")).persist(MEMORY_AND_DISK)
      u.count(); u
    }
    val lcHarvested = phase("uc split of harvest") {
      val lc = harvested.toDF().join(ucNorms, col("mention") === col("norm"), "left_anti")
        .as[DictEntry].persist(MEMORY_AND_DISK)
      lc.count(); lc
    }
    val scored = phase("two-pointer scoring") {
      val sc = DictTrain.scoredPredictions(docs, golds, lcHarvested).persist(MEMORY_AND_DISK)
      sc.count(); sc
    }
    val byNote = phase("byNote agg") {
      val b = DictTrain.keyScoresByNote(scored).persist(MEMORY_AND_DISK); b.count(); b
    }
    val naive = phase("naive prune") {
      val nv = DictTrain.pruneNaiveKeys(lcHarvested, byNote).persist(MEMORY_AND_DISK)
      nv.count(); nv
    }
    val core = phase("greedy prune") {
      val c = DictTrain.pruneGreedyKeys(naive, DictTrain.keyScoresByMention(scored), golds)
        .persist(MEMORY_AND_DISK)
      c.count(); c
    }
    val blacklist = phase("word blacklist collect") {
      DictTrain.wordBlacklist(docs, cutoff = 13L * n)
        .select(col("word")).as[String].collect().toSet
    }
    val expanded = phase("terminology+expand+abbr") {
      val term = DictTrain.dictFromTerminology(
        spark.createDataset(Synth.concepts(k)), spark.createDataset(Synth.descriptions(k)))
      val ext = DictTrain.dictFromExternal(
        spark.createDataset(Synth.extConcepts(k)).toDF(),
        spark.createDataset(Synth.extMappings(k)).toDF())
      val e = DictTrain.expandEntries(core.union(term).union(ext), blacklist).distinct()
      val w = e.union(DictTrain.abbreviationEntries(
        spark.createDataset(Synth.abbreviations(k)).toDF(), e)).distinct()
        .persist(MEMORY_AND_DISK)
      w.count(); w
    }
    phase("TOTAL-equivalent full train") {
      LinkageQueries.clearTrainCache()
      val (lc, uc) = LinkageQueries.sharedTrainedDicts(spark, sfDir)
      lc.count(); uc.count()
    }
    println(s"[train-probe] expanded rows: ${expanded.count()}")
    spark.stop()
  }
}
