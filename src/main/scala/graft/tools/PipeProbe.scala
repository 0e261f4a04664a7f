package graft.tools

import org.apache.spark.sql.functions._

/** Instrumented pipeline probe: row counts per stage, key-frequency
  * distribution, pair volume — to find what actually explodes at scale. */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    Scaling.withSession(cores) { spark =>
      implicit val s = spark
      import graft.queries.LinkageQueries
      val t0 = System.nanoTime()
      def lap(tag: String): Unit =
        println(f"[probe] $tag at ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val mentions = graft.plans.LinkagePipeline.mentionsFromSpans(
        LinkageQueries.docs(spark, n), LinkageQueries.gold(spark, n))
      val dict = LinkageQueries.dict(spark, n)
      val d = graft.plans.LinkagePipeline.unambiguousDict(dict)
      val surfaceNodes = mentions.toDF().select(col("norm")).distinct()
        .select(concat(lit("s:"), col("norm")).as("id"), col("norm"))
      val termNodes = d.select(concat(lit("t:"), col("mention")).as("id"), col("mention").as("norm"))
      val nodes = surfaceNodes.union(termNodes).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] nodes=${nodes.count()}"); lap("nodes")
      val keysN = graft.operators.Blocking.blockKeysWithNorm(nodes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] keys=${keysN.count()}"); lap("keys")
      val freq = graft.operators.Blocking.keyFrequencies(keysN.select(col("id"), col("key")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      freq.select(
        count(lit(1)).as("n_keys"),
        sum(when(col("freq") > 1000, 1).otherwise(0)).as("gt_cap"),
        sum(when(col("freq") > 300 && col("freq") <= 1000, 1).otherwise(0)).as("salted"),
        max(col("freq")).as("max_freq"),
        sum(col("freq") * (col("freq") - 1) / 2).cast("decimal(38,0)").as("naive_pairs"))
        .show(false)
      lap("freq")
      val pairs = graft.operators.Blocking.candidatePairsBipartite(
        keysN.filter(col("id").startsWith("s:")),
        keysN.filter(col("id").startsWith("t:")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] pairs=${pairs.count()}"); lap("pairs")
      val scored = graft.operators.PairwiseScoring.scoreInline(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] scored=${scored.count()}"); lap("scored")
      val simEdges = graft.plans.LinkagePipeline.argmaxEdges(scored)
      val structEdges = d.select(concat(lit("t:"), col("mention")).as("a"),
        concat(lit("c:"), col("concept_id")).as("b"))
      val edges = simEdges.union(structEdges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] edges=${edges.count()}"); lap("edges")
      val comp = graft.operators.ConnectedComponents(edges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] components=${comp.count()}"); lap("components")
      val assigned = comp.count()
      println(s"[probe] done=$assigned"); lap("total")
    }
  }
}
