package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Blocking

/** Salted-replication skew handling must be semantically invisible:
  * pair sets identical with and without the salted path engaged. */
class BlockingSaltSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("salted hot-key pairs equal unsalted pairs") {
    // one hot key (200 members), several cold keys
    val rows = (0 until 200).map(i => (f"id$i%04d", "hotkey")) ++
      (0 until 40).map(i => (f"id$i%04d", s"cold${i % 8}"))
    val keys = rows.toDF("id", "key")
    val salted = Blocking.candidatePairs(keys, hotKeyCap = 1000,
      saltThreshold = 64, salts = 16)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val unsalted = Blocking.candidatePairs(keys, hotKeyCap = 1000,
      saltThreshold = 100000, salts = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted == unsalted)
    // cold-key pairs (ids 0..39) are a subset of the hot key's pairs
    assert(salted.size == 200 * 199 / 2)
  }

  test("keys above the hot cap are dropped entirely") {
    val rows = (0 until 50).map(i => (f"id$i%04d", "toohot")) ++
      Seq(("a", "ok"), ("b", "ok"))
    val keys = rows.toDF("id", "key")
    val pairs = Blocking.candidatePairs(keys, hotKeyCap = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b")))
  }
}
