package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.mutable

/** Stage-level checkpoint/resume (north rule; reference semantics R1/R2:
  * skip-if-exists artifact gating, `2nd Place/src/preprocess.py:88-143`, and
  * incremental parquet backup, `3rd Place/src/snomedctentitylinking.py:439`).
  *
  * Every stage materializes to `workDir/<stage>/` (parquet; the Iceberg-
  * snapshot analog in this jar-set) plus:
  *   - `workDir/_metrics/<stage>/`: per-partition lineage rows
  *     (stage, partition_id, rows) — the skew/lineage evidence table
  *   - `workDir/_manifest/<stage>.json`: commit record with row count,
  *     an order-independent content checksum, and a FINGERPRINT of the
  *     run's configuration plus every upstream stage's checksum, written
  *     ATOMICALLY (temp file + move) after the data lands
  *
  * A re-run consults the manifest: a stage is trusted only when (a) its
  * recorded fingerprint matches the one this run derives (same config,
  * same upstream content) and (b) the stored content checksum matches the
  * re-read parquet. Config drift or a corrupted/stale artifact therefore
  * RECOMPUTES instead of silently serving old data. `failAfterStage`
  * injects a crash after a stage commits (for the kill-and-resume test).
  */
class StageRunner(workDir: String, failAfterStage: Option[String] = None,
                  config: String = "")
                 (implicit spark: SparkSession) {

  case class StageInfo(name: String, resumed: Boolean, rows: Long, checksum: String)
  val history: mutable.Buffer[StageInfo] = mutable.Buffer.empty

  private def manifestPath(name: String) = Paths.get(s"$workDir/_manifest/$name.json")

  /** Fingerprint of (config, upstream checksums): any change upstream or in
    * the run parameters invalidates every downstream committed stage. */
  private def expectedFingerprint(name: String): String = {
    val basis = config + "|" + name + "|" +
      history.map(s => s.name + "=" + s.checksum).mkString(",")
    java.lang.Long.toHexString(graft.functions.TextFns.hash64(basis, 0x5747))
  }

  def stage(name: String)(compute: => DataFrame): DataFrame = {
    val outPath = s"$workDir/$name"
    val fp = expectedFingerprint(name)
    if (Files.exists(manifestPath(name))) {
      val manifest = Files.readString(manifestPath(name))
      val storedSum = jsonField(manifest, "checksum")
      val storedFp = jsonField(manifest, "fingerprint")
      if (storedFp.contains(fp) && Files.exists(Paths.get(outPath))) {
        val back = spark.read.parquet(outPath)
        val (rows, sum) = contentChecksum(back)
        if (storedSum.contains(sum)) {
          history += StageInfo(name, resumed = true, rows, sum)
          return back
        }
        // checksum mismatch: artifact corrupted/overwritten — recompute
      }
      // fingerprint mismatch: different config or upstream — recompute
    }
    val df = compute
    df.write.mode("overwrite").parquet(outPath)
    val back = spark.read.parquet(outPath)

    // per-partition lineage metrics (no RDD: spark_partition_id is a column)
    back.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(name))
      .write.mode("overwrite").parquet(s"$workDir/_metrics/$name")

    val (rows, sum) = contentChecksum(back)
    commitManifest(name, rows, sum, fp)
    history += StageInfo(name, resumed = false, rows, sum)
    if (failAfterStage.contains(name))
      throw new RuntimeException(s"injected failure after stage '$name'")
    back
  }

  /** Minimal flat-JSON string-field extractor (manifests are flat). */
  private def jsonField(json: String, field: String): Option[String] = {
    val m = ("\"" + field + "\":\"([^\"]*)\"").r.findFirstMatchIn(json)
    m.map(_.group(1))
  }

  /** Order-independent content checksum: decimal sum of row hashes. */
  private def contentChecksum(df: DataFrame): (Long, String) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")), lit(0))
        .cast("string").as("h")).head()
    (r.getLong(0), r.getString(1))
  }

  private def commitManifest(name: String, rows: Long, checksum: String,
                             fingerprint: String): Unit = {
    val dir = Paths.get(s"$workDir/_manifest")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$name.json.tmp")
    val json = s"""{"stage":"$name","rows":$rows,"checksum":"$checksum","fingerprint":"$fingerprint","committed_at_ms":${System.currentTimeMillis()}}"""
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** The manifest as a table (stage, rows, checksum, resumed-this-run). */
  def manifest: DataFrame = {
    import spark.implicits._
    history.toSeq.map(s => (s.name, s.rows, s.checksum, s.resumed))
      .toDF("stage", "rows", "checksum", "resumed")
  }
}
