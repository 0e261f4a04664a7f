package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One driver-verifiable query: a Spark implementation plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables. Column names
  * must agree exactly between the two (driver sorts columns by name before
  * hashing values). */
case class QueryDef(name: String,
                    fn: (SparkSession, String) => DataFrame,
                    oracle: Option[String])

/** Core relational operator coverage (SURVEY.md §2.2–§2.7) exercised on the
  * driver's TPC-H-ish tables. Each query maps to reference semantics noted
  * in its comment; numeric outputs are integer-exact or rounded so the
  * Spark/DuckDB comparison is deterministic.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** One temp root per JVM for the round-trip sinks (GML/JSON): the writers
    * use Overwrite, so bench repetitions reuse the same paths instead of
    * leaking a fresh directory per execution. */
  private lazy val rtRoot: String =
    java.nio.file.Files.createTempDirectory("graft_rt").toString

  val defs: Seq[QueryDef] = Seq(

    // A-class aggregation (SURVEY §2.4 A3/A12 analog): group-agg with
    // map-side partial aggregation; money sums rounded for cross-engine parity.
    QueryDef("q01_agg_sum",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"),
          round(avg(col("l_discount")), 4).as("avg_disc")),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             |round(sum(l_extendedprice), 2) AS sum_price,
             |count(*) AS n,
             |round(avg(l_discount), 4) AS avg_disc
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // J1-style chained equi-joins (orders ⋈ customer ⋈ nation), small dims
    // broadcast by Catalyst/AQE automatically.
    QueryDef("q02_join_agg",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price")),
      Some("""SELECT n_name, count(*) AS n_orders,
             |round(sum(o_totalprice), 2) AS sum_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // W2 top-k per group: row_number window with fully deterministic ordering.
    QueryDef("q03_topk_window",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
      },
      Some("""SELECT o_custkey, o_orderkey, rnk FROM (
             |SELECT o_custkey, o_orderkey,
             |row_number() OVER (PARTITION BY o_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
             |FROM orders) WHERE rnk <= 2""".stripMargin)),

    // J9 semi-join: customers that have at least one order.
    QueryDef("q04_semijoin",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust")),
      Some("""SELECT c_mktsegment, count(*) AS n_cust FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |GROUP BY c_mktsegment""".stripMargin)),

    // J10 anti-join: customers with no orders.
    QueryDef("q05_antijoin",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin)),

    // A8 distinct.
    QueryDef("q06_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // U1 union + dedup (reference concatenates prediction sources,
    // `1st Place/src/mimic_predict.py:43-49`).
    QueryDef("q07_union",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_totalprice") > 300000).select(col("o_orderkey"))
          .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
          .distinct()
      },
      Some("""SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
             |UNION
             |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin)),

    // A1 per-key mode with the engine's pinned deterministic tie-break
    // (count desc, value asc) — reference `most_common(1)` semantics
    // (`1st Place/src/mimic_train.py:60-61`).
    QueryDef("q08_mode",
      (s, dir) => {
        val counted = t(s, dir, "lineitem")
          .groupBy("l_partkey", "l_returnflag").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("cnt").desc, col("l_returnflag").asc)
        counted.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_partkey"), col("l_returnflag").as("mode_flag"), col("cnt"))
      },
      Some("""SELECT l_partkey, mode_flag, cnt FROM (
             |SELECT l_partkey, l_returnflag AS mode_flag, count(*) AS cnt,
             |row_number() OVER (PARTITION BY l_partkey
             |  ORDER BY count(*) DESC, l_returnflag ASC) AS rn
             |FROM lineitem GROUP BY l_partkey, l_returnflag) WHERE rn = 1""".stripMargin)),

    // A3 word-frequency counter over the documents corpus
    // (`1st Place/src/process_data.py:429-443`).
    QueryDef("q09_wordcount",
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(100),
      Some("""SELECT word, count(*) AS cnt FROM (
             |SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
             |FROM documents) WHERE word <> ''
             |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 100""".stripMargin)),

    // F1/F2/F11-class scalar string functions.
    QueryDef("q10_strings",
      (s, dir) => t(s, dir, "documents")
        .select(
          col("doc_id"),
          length(col("text")).as("len"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).as("n_spaces"),
          substring(lower(col("text")), 1, 20).as("prefix20"),
          upper(col("lang")).as("lang_uc")),
      Some("""SELECT doc_id, length(text) AS len,
             |length(text) - length(replace(text, ' ', '')) AS n_spaces,
             |substr(lower(text), 1, 20) AS prefix20,
             |upper(lang) AS lang_uc FROM documents""".stripMargin)),

    // J13 interval-overlap join semantics on integer-derived intervals
    // (the reference drops static-dict spans overlapping model spans,
    // `2nd Place/submission/static_dict.py:56-77`).
    QueryDef("q11_interval_overlap",
      (s, dir) => {
        val iv = t(s, dir, "orders").select(
          col("o_orderkey").as("k"),
          (col("o_orderkey") % 1000).as("s"),
          (col("o_orderkey") % 1000 + 1 + col("o_custkey") % 50).as("e"),
          (col("o_orderkey") % 200).as("grp"))
        // r6 band join (guide §3, exploding-join avoidance): interval
        // length is 1 + custkey%50 ≤ 50, so overlapping pairs differ by
        // < 51 in s — join on (grp, band) with band = s div 51 and the
        // right side replicated to its 3 adjacent bands. Every
        // overlapping pair matches EXACTLY once (the three replicas carry
        // distinct band values, at most one equal to the left's), the
        // predicates are unchanged, and the measured candidate volume
        // drops 112.5M → 22.5M residual evaluations at sf0.1. The two key
        // columns are PACKED into one bigint (grp·64 + band+1, band ∈
        // [−1, 19]) — a single-long join key keeps Spark's dense
        // LongHashedRelation; a (grp, band) two-column key fell back to
        // generic UnsafeRow hashing and was measured 2.5× SLOWER than the
        // unbanded join despite 5× fewer candidates.
        val a = iv.withColumn("gb", col("grp") * 64 + expr("s div 51") + 1).alias("a")
        val b = iv.select(col("k"), col("s"), col("e"), col("grp"),
          explode(expr("array(grp * 64 + s div 51, grp * 64 + s div 51 + 1, " +
            "grp * 64 + s div 51 + 2)")).as("gb"))
          .alias("b")
        a.join(b, col("a.gb") === col("b.gb") &&
            col("a.k") < col("b.k") &&
            greatest(col("a.s"), col("b.s")) < least(col("a.e"), col("b.e")))
          .groupBy(col("a.grp").as("grp"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s"))).as("overlap_len"))
      },
      Some("""WITH iv AS (SELECT o_orderkey AS k, o_orderkey % 1000 AS s,
             |o_orderkey % 1000 + 1 + o_custkey % 50 AS e, o_orderkey % 200 AS grp FROM orders)
             |SELECT a.grp AS grp, count(*) AS n_pairs,
             |CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) AS overlap_len
             |FROM iv a JOIN iv b ON a.grp = b.grp AND a.k < b.k
             |AND greatest(a.s, b.s) < least(a.e, b.e)
             |GROUP BY a.grp""".stripMargin)),

    // W3 lag window (prev/next annotation context,
    // `1st Place/src/mimic_postprocess_attributes.py:20-41`).
    QueryDef("q12_lag_window",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            lag(col("event_id"), 1).over(w).as("prev_event_id"))
      },
      Some("""SELECT event_id, user_id,
             |lag(event_id, 1) OVER (PARTITION BY user_id
             |  ORDER BY ts ASC, event_id ASC) AS prev_event_id
             |FROM events""".stripMargin)),

    // A6 'default' roll-up analog (`3rd Place/faiss_db_preparation.py:124-144`).
    QueryDef("q13_rollup",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust")),
      Some("""SELECT r_name, n_name, count(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)),

    // U2-class set operation (INTERSECT with set semantics).
    QueryDef("q14_intersect",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)),

    // Exact dedup: md5 content hash, canonical = min doc_id per hash
    // (hash-groupBy dedup over the documents table).
    QueryDef("q15_dedup_exact",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("h"))
        val w = Window.partitionBy(col("h"))
        d.select(col("doc_id"), col("h"),
            min(col("doc_id")).over(w).as("canonical_id"),
            count(lit(1)).over(w).as("group_size"))
      },
      Some("""SELECT doc_id, md5(text) AS h,
             |min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
             |count(*) OVER (PARTITION BY md5(text)) AS group_size
             |FROM documents""".stripMargin)),

    // Token counting (whitespace tokens) — text-analysis op.
    QueryDef("q16_token_stats",
      (s, dir) => t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          length(col("text")).as("len"),
          (col("n_chars") === length(col("text"))).as("len_ok")),
      Some("""SELECT doc_id,
             |len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             |length(text) AS len,
             |n_chars = length(text) AS len_ok
             |FROM documents WHERE length(text) > 0""".stripMargin)),

    // Quality scoring: linear combination of deterministic ratios.
    QueryDef("q17_quality",
      (s, dir) => {
        val d = t(s, dir, "documents").filter(length(col("text")) > 0)
        val len = length(col("text")).cast("double")
        val spaces = (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("double")
        val digits = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
        val uppers = length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double")
        d.select(col("doc_id"),
          round(spaces / len, 4).as("space_ratio"),
          round(digits / len, 4).as("digit_ratio"),
          round(uppers / len, 4).as("upper_ratio"),
          round(lit(1.0) - digits / len - uppers / len, 4).as("quality"))
      },
      Some("""SELECT doc_id,
             |round((length(text) - length(replace(text,' ',''))) / CAST(length(text) AS DOUBLE), 4) AS space_ratio,
             |round(length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS digit_ratio,
             |round(length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS upper_ratio,
             |round(1.0 - length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE)
             |  - length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE), 4) AS quality
             |FROM documents WHERE length(text) > 0""".stripMargin)),

    // Multi-hop join chain: distinct suppliers per customer.
    QueryDef("q18_multihop",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp")),
      Some("""SELECT c_custkey, count(DISTINCT l_suppkey) AS n_supp
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_custkey""".stripMargin)),

    // G2/north-rule transitive closure: the REAL large-star/small-star CC
    // runs over a graph whose components DuckDB can derive in closed form
    // (customers chained within their nation + each customer's orders as a
    // star + self-edges ⇒ component = min custkey of the nation).
    QueryDef("q19_components",
      (s, dir) => {
        implicit val sp = s
        val cust = t(s, dir, "customer")
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
        val chain = cust
          .select(col("c_nationkey"), col("c_custkey"),
            lag(col("c_custkey"), 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
          .select(col("prev").as("a"), col("c_custkey").as("b"))
        val selfEdges = cust.select(col("c_custkey").as("a"), col("c_custkey").as("b"))
        val star = t(s, dir, "orders")
          .select(col("o_custkey").as("a"), (col("o_orderkey") + 1000000000L).as("b"))
        graft.operators.ConnectedComponents(chain.union(selfEdges).union(star))
          .select(col("id").as("node"), col("component").as("comp"))
      },
      Some("""WITH mins AS (SELECT c_nationkey, min(c_custkey) AS m
             |  FROM customer GROUP BY c_nationkey)
             |SELECT c.c_custkey AS node, m.m AS comp
             |FROM customer c JOIN mins m ON c.c_nationkey = m.c_nationkey
             |UNION ALL
             |SELECT 1000000000 + o.o_orderkey AS node, m.m AS comp
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN mins m ON c.c_nationkey = m.c_nationkey""".stripMargin)),

    // J6/W4 as-of semantics: most recent prior event of the same user with
    // value > 1.0 (the reference's greatest-header-position-≤-start lookup,
    // `1st Place/src/mimic_common.py:81-91`, as a window).
    QueryDef("q23_asof",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "events").select(col("event_id"), col("user_id"),
          last(when(col("value") > 1.0, col("event_id")), ignoreNulls = true)
            .over(w).as("prev_big_event"))
      },
      Some("""SELECT event_id, user_id,
             |last_value(CASE WHEN value > 1.0 THEN event_id END IGNORE NULLS)
             |  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_big_event
             |FROM events""".stripMargin)),

    // G2 iterative frontier-join ancestor closure vs DuckDB's recursive CTE:
    // a synthetic tree on order keys (parent = key div 8).
    QueryDef("q21_descendants",
      (s, dir) => {
        implicit val sp = s
        val edges = t(s, dir, "orders")
          .filter(col("o_orderkey") >= 8)
          .select(col("o_orderkey").as("child"),
            expr("o_orderkey div 8").as("parent"))
        graft.operators.Graph.ancestorClosure(edges)
          .select(col("node"), col("anc"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT o_orderkey AS child, o_orderkey // 8 AS parent
             |  FROM orders WHERE o_orderkey >= 8),
             |anc(node, anc) AS (
             |  SELECT child, parent FROM e
             |  UNION
             |  SELECT a.node, e.parent FROM anc a JOIN e ON a.anc = e.child)
             |SELECT node, anc FROM anc""".stripMargin)),

    // A9 embedding mean per label (elementwise), exact-relational form.
    QueryDef("q22_embedding_mean",
      // `+ 0` on BOTH sides: IEEE −0.0 + 0 = +0.0 — DuckDB's round keeps a
      // negative zero where Spark normalizes it, and the driver's float
      // canonicalization renders them differently ("-0.000000" vs
      // "0.000000"); surfaced by a tiny negative group mean at sf0.001.
      (s, dir) => t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .groupBy(col("label"), (col("pos") + 1).as("pos"))
        .agg((round(avg(col("val").cast("double")), 4) + lit(0.0)).as("mean_val"))
        .select(col("label"), col("pos").cast("long").as("pos"), col("mean_val")),
      Some("""SELECT label, i AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0 AS mean_val
             |FROM embeddings, generate_series(1, 64) t(i)
             |GROUP BY label, i""".stripMargin)),

    // Pairwise-scoring feature parity: Levenshtein distance (built-in both
    // engines; a north-rule scoring feature).
    QueryDef("q20_levenshtein",
      (s, dir) => {
        val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"),
          (col("p_partkey") % 100).as("bkt"))
        val a = p.alias("a"); val b = p.alias("b")
        a.join(b, col("a.bkt") === col("b.bkt") && col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
            levenshtein(col("a.p_name"), col("b.p_name")).as("lev"))
      },
      Some("""SELECT a.p_partkey AS k1, b.p_partkey AS k2,
             |levenshtein(a.p_name, b.p_name) AS lev
             |FROM part a JOIN part b
             |ON a.p_partkey % 100 = b.p_partkey % 100 AND a.p_partkey < b.p_partkey""".stripMargin)),

    // M1 metric oracle: the SAME Metrics.macroCharIou code that grades the
    // linkage queries, run on spans derived deterministically from orders
    // (one doc per order → non-overlapping by construction), checked
    // against DuckDB's char-painting form (positions exploded via
    // generate_series — exactly the reference scorer's dense matrix,
    // `1st Place/src/scoring.py:10-47`).
    QueryDef("metric_macro_iou",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey").as("k"))
        val pred = o.select(col("k").as("doc_id"), (col("k") % 7).as("concept_id"),
          ((col("k") * 13) % 400).as("start"),
          ((col("k") * 13) % 400 + 1 + col("k") % 29).as("end"))
        val gt = o.select(col("k").as("doc_id"),
          ((col("k") + when(col("k") % 11 === 0, 1).otherwise(0)) % 7).as("concept_id"),
          ((col("k") * 13) % 400 + col("k") % 5).as("start"),
          ((col("k") * 13) % 400 + col("k") % 5 + 1 + col("k") % 31).as("end"))
        val (perConcept, _) = graft.metrics.Metrics.macroCharIou(pred, gt)
        perConcept.select(col("concept_id"), round(col("iou"), 4).as("iou"))
      },
      Some("""WITH p AS (SELECT o_orderkey AS doc, o_orderkey%7 AS cid,
             |  (o_orderkey*13)%400 AS s, (o_orderkey*13)%400 + 1 + o_orderkey%29 AS e
             |  FROM orders),
             |g AS (SELECT o_orderkey AS doc,
             |  (o_orderkey + CASE WHEN o_orderkey%11=0 THEN 1 ELSE 0 END)%7 AS cid,
             |  (o_orderkey*13)%400 + o_orderkey%5 AS s,
             |  (o_orderkey*13)%400 + o_orderkey%5 + 1 + o_orderkey%31 AS e
             |  FROM orders),
             |pp AS (SELECT DISTINCT doc, cid, pos FROM
             |  (SELECT doc, cid, unnest(range(s, e)) AS pos FROM p)),
             |gg AS (SELECT DISTINCT doc, cid, pos FROM
             |  (SELECT doc, cid, unnest(range(s, e)) AS pos FROM g)),
             |inter AS (SELECT cid, count(*) AS n FROM pp JOIN gg USING (doc, cid, pos) GROUP BY cid),
             |un AS (SELECT cid, count(*) AS n FROM
             |  (SELECT doc, cid, pos FROM pp UNION SELECT doc, cid, pos FROM gg) GROUP BY cid)
             |SELECT un.cid AS concept_id,
             |  round(CAST(coalesce(inter.n, 0) AS DOUBLE) / un.n, 4) AS iou
             |FROM un LEFT JOIN inter ON un.cid = inter.cid""".stripMargin)),

    // M7 metric oracle: the SAME Metrics.pairwiseF1 used by the linkage F1
    // gate, on a derived clustering (custkey%7) vs derived labels
    // (custkey%3) over a same-nation pair universe, checked against plain
    // SQL pair counting.
    QueryDef("metric_pairwise_f1",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_nationkey").as("n"))
        val pairs = c.toDF("a", "na")
          .join(c.toDF("b", "nb"), col("na") === col("nb") && col("a") < col("b"))
          .select(col("a"), col("b"))
        val pred = pairs.filter(col("a") % 7 === col("b") % 7)
        val gold = pairs.filter(col("a") % 3 === col("b") % 3)
        val (p, r, f1) = graft.metrics.Metrics.pairwiseF1(pred, gold)
        Seq((math.rint(p * 10000) / 10000, math.rint(r * 10000) / 10000,
          math.rint(f1 * 10000) / 10000)).toDF("precision", "recall", "f1")
      },
      Some("""WITH u AS (SELECT a.c_custkey AS a, b.c_custkey AS b
             |  FROM customer a JOIN customer b
             |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
             |s AS (SELECT
             |  CAST(count(*) FILTER (a%7 = b%7 AND a%3 = b%3) AS DOUBLE) AS ni,
             |  CAST(count(*) FILTER (a%7 = b%7) AS DOUBLE) AS np,
             |  CAST(count(*) FILTER (a%3 = b%3) AS DOUBLE) AS ng
             |  FROM u)
             |SELECT round(ni/np, 4) AS precision, round(ni/ng, 4) AS recall,
             |  round(2*(ni/np)*(ni/ng)/((ni/np)+(ni/ng)), 4) AS f1
             |FROM s""".stripMargin)),

    // M4 hit@k linking accuracy (`3rd Place/src/metrics.py:119-144`) run on
    // arithmetically derived candidate lists: per order, a ranked list of 20
    // pseudo-candidates and a truth id, both pure index arithmetic — the
    // derived-data oracle pattern (the metric code is what's under test;
    // DuckDB regenerates the same lists and slices them per k).
    QueryDef("metric_hit_at_k",
      (s, dir) => {
        val d = t(s, dir, "orders").select(
          expr("transform(sequence(0, 19), i -> (o_orderkey * 7 + i * 11) % 50)")
            .as("candidates"),
          (col("o_custkey") % 50).as("truth"))
        val h = graft.metrics.Metrics.hitAtK(d)
        h.select(h.columns.map(c => round(col(c), 4).as(c)): _*)
      },
      Some("""WITH d AS (SELECT
             |  list_transform(range(0, 20), i -> (o_orderkey * 7 + i * 11) % 50) AS cand,
             |  o_custkey % 50 AS truth FROM orders)
             |SELECT
             |  round(avg(CASE WHEN list_contains(cand[1:1], truth) THEN 1.0 ELSE 0.0 END), 4) AS hit_at_1,
             |  round(avg(CASE WHEN list_contains(cand[1:5], truth) THEN 1.0 ELSE 0.0 END), 4) AS hit_at_5,
             |  round(avg(CASE WHEN list_contains(cand[1:10], truth) THEN 1.0 ELSE 0.0 END), 4) AS hit_at_10,
             |  round(avg(CASE WHEN list_contains(cand[1:20], truth) THEN 1.0 ELSE 0.0 END), 4) AS hit_at_20
             |FROM d""".stripMargin)),

    // J11 exact form (`3rd Place/src/metrics.py:79-144`): semi-filter both
    // annotation sides to shared (note_id, start) keys, align, then
    // accuracy@k by string membership in the comma-packed candidate list.
    // gt/pred derived arithmetically from orders with disjoint dropout
    // (every 5th key missing from gt, every 3rd from pred) so the
    // matching-keys filter is exercised in both directions.
    QueryDef("metric_align_accuracy",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val gt = o.filter(col("o_orderkey") % 5 =!= 0).select(
          (col("o_orderkey") % 100).as("note_id"),
          col("o_orderkey").as("start"),
          (col("o_custkey") % 50).as("concept_id"))
        val pred = o.filter(col("o_orderkey") % 3 =!= 0).select(
          (col("o_orderkey") % 100).as("note_id"),
          col("o_orderkey").as("start"),
          expr("array_join(transform(sequence(0, 19), " +
            "i -> CAST((o_orderkey * 7 + i * 11) % 50 AS STRING)), ',')")
            .as("top_concept_id"))
        graft.metrics.Metrics.alignAccuracy(gt, pred)
      },
      Some("""WITH gt AS (SELECT o_orderkey % 100 AS note_id, o_orderkey AS start_pos,
             |  o_custkey % 50 AS concept_id FROM orders WHERE o_orderkey % 5 <> 0),
             |pred AS (SELECT o_orderkey % 100 AS note_id, o_orderkey AS start_pos,
             |  list_transform(range(0, 20), i -> CAST((o_orderkey * 7 + i * 11) % 50 AS VARCHAR)) AS cand
             |  FROM orders WHERE o_orderkey % 3 <> 0),
             |a AS (SELECT g.concept_id, p.cand FROM gt g
             |  JOIN pred p ON g.note_id = p.note_id AND g.start_pos = p.start_pos)
             |SELECT
             |  round(avg(CASE WHEN list_contains(cand[1:1], CAST(concept_id AS VARCHAR)) THEN 1.0 ELSE 0.0 END), 4) AS acc_at_1,
             |  round(avg(CASE WHEN list_contains(cand[1:5], CAST(concept_id AS VARCHAR)) THEN 1.0 ELSE 0.0 END), 4) AS acc_at_5,
             |  round(avg(CASE WHEN list_contains(cand[1:10], CAST(concept_id AS VARCHAR)) THEN 1.0 ELSE 0.0 END), 4) AS acc_at_10,
             |  round(avg(CASE WHEN list_contains(cand, CAST(concept_id AS VARCHAR)) THEN 1.0 ELSE 0.0 END), 4) AS acc_at_20
             |FROM a""".stripMargin)),

    // G3 shortest-path distances (find_path, snomed_graph.py:284-320):
    // frontier BFS down the orders div-8 tree from its roots; first-visit
    // level IS the min distance. Oracle: recursive CTE + min(dist).
    QueryDef("graph_shortest_path",
      (s, dir) => {
        implicit val sp = s
        val edges = t(s, dir, "orders")
          .filter(col("o_orderkey") >= 8)
          .select(col("o_orderkey").as("child"),
            expr("o_orderkey div 8").as("parent"))
        val roots = edges.filter(col("parent") < 8)
          .select(col("parent").as("root")).distinct()
        graft.operators.Graph.shortestPaths(edges, roots)
          .select(col("root"), col("node"), col("dist"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT o_orderkey AS child, o_orderkey // 8 AS parent
             |  FROM orders WHERE o_orderkey >= 8),
             |r AS (SELECT DISTINCT parent AS root FROM e WHERE parent < 8),
             |p(root, node, dist) AS (
             |  SELECT root, child, 1 FROM e JOIN r ON e.parent = r.root
             |  UNION
             |  SELECT p.root, e.child, p.dist + 1 FROM p JOIN e ON p.node = e.parent)
             |SELECT root, node, min(dist) AS dist FROM p GROUP BY root, node""".stripMargin)),

    // G3 neighbourhood (get_neighbourhood, snomed_graph.py:258-282):
    // nodes within 3 UNDIRECTED hops of each root, root excluded — BFS
    // over the symmetrized edge set. Oracle: recursive CTE bounded by the
    // step budget, min(dist) per (root, node).
    QueryDef("graph_neighbourhood",
      (s, dir) => {
        implicit val sp = s
        val edges = t(s, dir, "orders")
          .filter(col("o_orderkey") >= 8)
          .select(col("o_orderkey").as("child"),
            expr("o_orderkey div 8").as("parent"))
        val roots = edges.filter(col("child") >= 64 && col("child") < 72)
          .select(col("child").as("root")).distinct()
        graft.operators.Graph.neighbourhood(edges, roots, steps = 3)
          .select(col("root"), col("node"), col("dist"))
      },
      Some("""WITH RECURSIVE e0 AS (
             |  SELECT o_orderkey AS child, o_orderkey // 8 AS parent
             |  FROM orders WHERE o_orderkey >= 8),
             |e AS (SELECT child, parent FROM e0
             |  UNION ALL SELECT parent, child FROM e0),
             |r AS (SELECT DISTINCT child AS root FROM e0
             |  WHERE child >= 64 AND child < 72),
             |p(root, node, dist) AS (
             |  SELECT root, child, 1 FROM e JOIN r ON e.parent = r.root
             |  UNION
             |  SELECT p.root, e.child, p.dist + 1 FROM p JOIN e ON p.node = e.parent
             |  WHERE p.dist < 3)
             |SELECT root, node, min(dist) AS dist FROM p
             |WHERE node <> root GROUP BY root, node""".stripMargin)),

    // S7 GML round-trip (nx.write_gml/read_gml, snomed_graph.py:322-331,
    // 360-371): nodes+edges → single-line-record GML text → parse back —
    // entirely through the text sink/source, ids destringized to Long.
    // Labels embed '"' and '&' so the entity escaping is on the verified
    // path. Oracle re-derives the joined result straight from orders: a
    // hash mismatch means the serialization dropped or mangled something.
    QueryDef("gml_roundtrip",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") < 20000)
        val nodes = o.select(col("o_orderkey").as("id"),
          concat(lit("order \""), col("o_orderpriority"), lit("\" & co"))
            .as("label"))
        val edges = o.filter(col("o_orderkey") >= 8)
          .select(col("o_orderkey").as("source"),
            expr("o_orderkey div 8").as("target"),
            col("o_orderstatus").as("etype"))
        val path = s"$rtRoot/graph.gml"
        graft.sources.Gml.write(nodes, edges, path)
        val (rtNodes, rtEdges) = graft.sources.Gml.read(s, path)
        rtEdges.join(rtNodes.withColumnRenamed("id", "source"), "source")
          .select(col("source"), col("target"), col("etype"), col("label"))
      },
      Some("""SELECT o_orderkey AS source, o_orderkey // 8 AS target,
             |  o_orderstatus AS etype,
             |  'order "' || o_orderpriority || '" & co' AS label
             |FROM orders WHERE o_orderkey >= 8 AND o_orderkey < 20000""".stripMargin)),

    // F20 JSON synonym-dict round-trip (preprocess.py:127-131 json.dump,
    // data.py:14-18 json.load with int keys): concept→synonyms rows →
    // JSONL sink → schema'd JSON source → exploded pairs. Oracle reads the
    // source relation directly, so the JSON encode/decode is what's under
    // test.
    QueryDef("json_dict_roundtrip",
      (s, dir) => {
        val syn = t(s, dir, "part")
          .groupBy((col("p_partkey") % 211).as("concept_id"))
          .agg(sort_array(collect_set(col("p_name"))).as("synonyms"))
        val path = s"$rtRoot/syn_json"
        graft.sources.Readers.writeSynJson(syn, path)
        graft.sources.Readers.readSynJson(s, path)
          .select(col("concept_id"), explode(col("synonyms")).as("synonym"))
      },
      Some("""SELECT DISTINCT p_partkey % 211 AS concept_id, p_name AS synonym
             |FROM part""".stripMargin))
  )
}
