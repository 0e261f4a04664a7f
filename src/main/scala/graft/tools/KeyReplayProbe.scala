package graft.tools

import graft.functions.TextFns
import graft.operators.{Blocking, PairwiseScoring}

/** Validation harness for the r5 blocking-key / pairwise-score SQL replay:
  * prints (a) the engine's expected values as JSON and (b) the DuckDB SQL
  * that must reproduce them, for `tools/check_key_replay.py` to compare.
  * Pure driver-side — no SparkSession. */
object KeyReplayProbe {
  def main(args: Array[String]): Unit = {
    val norms = Seq(
      "acute femur fracture", "femur fracture", "fracture", "x", "",
      "acute femur fractures", "chronic kidney stenosis",
      "of the and", "a b c d e f g", "acute  femur", "sss",
      "degenerative retina lesion", "lesion of retina")
    def jl(xs: Seq[String]) = xs.mkString("[", ",", "]")
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
    // expected keys per norm (signed longs, sorted)
    val keys = norms.map { n =>
      s"${q(n)}: ${jl(Blocking.keyHashesFor(n).sorted.map(_.toString))}"
    }.mkString("{", ",", "}")
    // expected raw-embedding entries per norm: idx:weight for nonzero
    val embs = norms.map { n =>
      val v = TextFns.hashedEmbeddingRaw(n)
      val entries = v.zipWithIndex.collect { case (w, i) if w != 0f =>
        s"\"$i\": ${w.toInt}"
      }
      s"${q(n)}: {${entries.mkString(",")}}"
    }.mkString("{", ",", "}")
    // expected jw + fused score on all ordered pairs
    val pairs = for (a <- norms; b <- norms if a < b) yield (a, b)
    val scores = pairs.map { case (a, b) =>
      val jw = TextFns.jaroWinkler(a, b)
      val sc = PairwiseScoring.scorePure(a, b)
      s"[${q(a)}, ${q(b)}, $jw, $sc]"
    }.mkString("[", ",", "]")
    val vals = norms.map(n => "('" + n.replace("'", "''") + "')").mkString(", ")
    val keySql =
      s"""WITH krsrc AS (SELECT * FROM (VALUES $vals) t(norm)),
         |${graft.queries.LinkageQueries.blockKeySql("krsrc", "kr_")}
         |SELECT norm, CAST(CASE WHEN keyu >= CAST(9223372036854775808 AS UBIGINT)
         |  THEN CAST(keyu AS HUGEINT) - CAST(18446744073709551616 AS HUGEINT)
         |  ELSE CAST(keyu AS HUGEINT) END AS BIGINT) AS key
         |FROM kr_keys ORDER BY norm, key""".stripMargin
    val embSql =
      s"""WITH krsrc AS (SELECT * FROM (VALUES $vals) t(norm)),
         |${graft.queries.LinkageQueries.blockKeySql("krsrc", "kr_")}
         |SELECT norm, CAST(b1 % CAST(64 AS UBIGINT) AS INT) AS idx,
         |  CAST(sum(CASE WHEN (b1 >> 6) & CAST(1 AS UBIGINT) = CAST(1 AS UBIGINT)
         |    THEN 1 ELSE -1 END) AS BIGINT) AS w
         |FROM kr_gb GROUP BY norm, idx ORDER BY norm, idx""".stripMargin
    println(s"""{"keys": $keys, "embs": $embs, "scores": $scores,""" +
      s""""key_sql": ${q(keySql)}, "emb_sql": ${q(embSql)}}""")
  }
}
