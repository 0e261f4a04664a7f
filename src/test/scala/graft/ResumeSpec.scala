package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Synth
import graft.plans.LinkagePipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Kill-and-resume gate (north rule: "resumable from checkpoint... a killed
  * job continues from the last completed stage"; FIXTURES.md invariant 6). */
class ResumeSpec extends AnyFunSuite with SparkTestBase {

  val nConcepts = 150
  lazy val (docsSeq, goldsSeq) = Synth.corpus(50, nConcepts)
  lazy val docs = spark.createDataset(docsSeq)(org.apache.spark.sql.Encoders.product)
  lazy val golds = spark.createDataset(goldsSeq)(org.apache.spark.sql.Encoders.product)
  lazy val dict = spark.createDataset(Synth.dictionary(nConcepts))(org.apache.spark.sql.Encoders.product)

  def assignmentsOf(workDir: String, failAfter: Option[String]) = {
    val mentions = LinkagePipeline.mentionsFromSpans(docs, golds)
    LinkagePipeline.runCheckpointed(mentions, dict, workDir, failAfterStage = failAfter)
  }

  def sortedAssignments(r: graft.plans.LinkagePipeline.Result): Seq[(String, String)] =
    r.assignments.collect().map(x => (x.getString(0), x.getString(1))).sortBy(identity).toSeq

  test("kill after a mid stage, rerun, byte-identical final output; earlier stages not recomputed") {
    val dirA = Files.createTempDirectory("graft_resume_a").toString
    val dirB = Files.createTempDirectory("graft_resume_b").toString

    val (resA, runnerA) = assignmentsOf(dirA, None)
    val uninterrupted = sortedAssignments(resA)
    assert(runnerA.history.forall(!_.resumed))

    val ex = intercept[RuntimeException] { assignmentsOf(dirB, Some("scored")) }
    assert(ex.getMessage.contains("injected failure"))

    val (resB, runnerB) = assignmentsOf(dirB, None)
    val resumed = sortedAssignments(resB)
    assert(resumed == uninterrupted)
    val byName = runnerB.history.map(s => s.name -> s.resumed).toMap
    for (st <- Seq("dict", "nodes", "block_keys", "key_freq", "pairs", "scored"))
      assert(byName(st), s"stage $st should have been resumed, not recomputed")
    for (st <- Seq("edges", "components", "assignments"))
      assert(!byName(st), s"stage $st should have been computed on resume")
  }

  test("idempotent re-run: everything resumes, checksums unchanged") {
    val dir = Files.createTempDirectory("graft_resume_c").toString
    val (_, r1) = assignmentsOf(dir, None)
    val (_, r2) = assignmentsOf(dir, None)
    assert(r2.history.forall(_.resumed))
    val c1 = r1.history.map(s => s.name -> s.checksum).toMap
    val c2 = r2.history.map(s => s.name -> s.checksum).toMap
    assert(c1 == c2)
  }

  test("per-partition lineage metrics sum to stage row counts") {
    val dir = Files.createTempDirectory("graft_resume_d").toString
    val (_, runner) = assignmentsOf(dir, None)
    for (s <- runner.history) {
      val m = spark.read.parquet(s"$dir/_metrics/${s.name}")
      val total = m.agg(sum(col("rows"))).head().getLong(0)
      assert(total == s.rows, s"stage ${s.name}: metrics $total != ${s.rows}")
      assert(m.select("partition_id").distinct().count() == m.count())
    }
  }
}
