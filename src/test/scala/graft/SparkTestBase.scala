package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for suites (one JVM-wide session via getOrCreate). */
trait SparkTestBase {
  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
