package graft.queries

import graft.fixtures.Synth
import graft.metrics.Metrics
import graft.model._
import graft.operators.{Blocking, DictionaryMatch, OverlapResolve}
import graft.plans.LinkagePipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-linking pipeline queries over the deterministic synthetic corpus
  * (FIXTURES.md; the driver's parquet tables don't carry interleaved docs, so
  * the corpus is generated *distributed* — `spark.range(n).map(genDoc)` — a
  * pure function of the row index, identical at any parallelism).
  *
  * No DuckDB oracle (non-SQL-expressible); correctness is enforced by the
  * ScalaTest differential/golden suites instead. Driver records rows>0.
  */
object LinkageQueries {

  val NumConcepts = 500

  /** Terminology size scales with corpus size (constant mentions-per-entity
    * — the web-scale regime; a fixed terminology would make same-entity
    * blocks, and thus candidate pairs, grow quadratically with the corpus). */
  def numConcepts(nDocs: Int): Int = math.max(NumConcepts, nDocs / 10)

  /** Corpus size scales with the driver's sf dir. */
  def corpusSize(sfDir: String): Int =
    if (sfDir.contains("0.001")) 200
    else if (sfDir.contains("0.01")) 1000
    else 4000

  def docs(spark: SparkSession, n: Int): Dataset[Doc] = {
    import spark.implicits._
    val k = numConcepts(n)
    spark.range(n.toLong).map(i => Synth.genDoc(i, k)._1)
  }

  def gold(spark: SparkSession, n: Int): Dataset[GoldAnnotation] = {
    import spark.implicits._
    val k = numConcepts(n)
    spark.range(n.toLong).flatMap(i => Synth.genDoc(i, k)._2)
  }

  /** Session-memoized PERSISTED (docs, gold) pair for a sf dir. Ten driver
    * queries consume the same deterministic corpus; without this every one
    * re-ran `genDoc` over the whole corpus (the measured round-2 regression:
    * the generator is allocator-bound fixture cost, not engine work). The
    * same input-materialization principle as the scaling protocol in
    * BENCH/BASELINE.md — queries are timed reading a table, not
    * synthesizing one. */
  private val corpusCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Dataset[Doc], Dataset[GoldAnnotation])]()

  def sharedCorpus(s: SparkSession, dir: String): (Dataset[Doc], Dataset[GoldAnnotation]) = {
    val key = s.sparkContext.hashCode().toString + "|" + dir
    corpusCache.computeIfAbsent(key, _ => {
      import org.apache.spark.storage.StorageLevel
      val n = corpusSize(dir)
      (docs(s, n).persist(StorageLevel.MEMORY_AND_DISK),
        gold(s, n).persist(StorageLevel.MEMORY_AND_DISK))
    })
  }

  def sharedDocs(s: SparkSession, dir: String): Dataset[Doc] = sharedCorpus(s, dir)._1
  def sharedGold(s: SparkSession, dir: String): Dataset[GoldAnnotation] = sharedCorpus(s, dir)._2

  /** Release + forget the memoized corpus frames. */
  def clearCorpusCache(): Unit = {
    corpusCache.values.forEach { case (d, g) =>
      try { d.unpersist(); g.unpersist() } catch { case _: Throwable => }
    }
    corpusCache.clear()
  }

  def dict(spark: SparkSession, nDocs: Int): Dataset[DictEntry] = {
    import spark.implicits._
    spark.createDataset(Synth.dictionary(numConcepts(nDocs)))
  }

  /** One full pipeline run shared by linkage_clusters / linkage_block_skew /
    * linkage_pairwise_f1 within a session: the input is deterministic, so
    * re-running the identical pipeline per query only re-spends ~2/3 of the
    * linkage bench time. Keyed by (session, sfDir); evicted (and its cached
    * frames released) when a different key arrives. */
  private val runCache =
    new java.util.concurrent.ConcurrentHashMap[String, LinkagePipeline.Result]()

  def sharedRun(s: SparkSession, dir: String): LinkagePipeline.Result = {
    val key = s.sparkContext.hashCode().toString + "|" + dir
    runCache.computeIfAbsent(key, _ => {
      implicit val sp: SparkSession = s
      val n = corpusSize(dir)
      val (d, g) = sharedCorpus(s, dir)
      // r6 (guide §5): persist the mention extraction — the cogroup output
      // feeds node building, mention-level block keys AND the mention
      // assignment join inside run(); un-persisted it re-ran the full
      // doc⋈gold cogroup shuffle once per consumer (~2 s each at sf0.1).
      // Tracked in Result.persisted so release() frees it with the rest.
      val mentions = LinkagePipeline.mentionsFromSpans(d, g)
        .localCheckpoint(false)
      val r = LinkagePipeline.run(mentions, dict(s, n))
      r.copy(persisted = r.persisted :+ mentions.toDF)
    })
  }

  /** Release + forget every memoized pipeline Result (honest re-timing). */
  def clearRunCache(): Unit = {
    runCache.values.forEach(r => try r.release() catch { case _: Throwable => })
    runCache.clear()
  }

  /** Trained (lc, uc) dictionaries shared by dict_train / dict_train_iou —
    * both train on the identical deterministic inputs, so the second query
    * re-spending the whole training pipeline buys nothing. */
  private val trainCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Dataset[DictEntry], Dataset[DictEntry])]()

  def sharedTrainedDicts(s: SparkSession, dir: String): (Dataset[DictEntry], Dataset[DictEntry]) = {
    val key = s.sparkContext.hashCode().toString + "|" + dir
    trainCache.computeIfAbsent(key, _ => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val n = corpusSize(dir)
      val k = numConcepts(n)
      val (d, g) = sharedCorpus(s, dir)
      // trainDictionarySplit returns persisted, eagerly materialized dicts
      graft.operators.DictTrain.trainDictionarySplit(
        d, g,
        s.createDataset(Synth.concepts(k)), s.createDataset(Synth.descriptions(k)),
        s.createDataset(Synth.extConcepts(k)).toDF(),
        s.createDataset(Synth.extMappings(k)).toDF(),
        s.createDataset(Synth.abbreviations(k)).toDF())
    })
  }

  /** Drop memoized trained dicts (bench re-timing: a second pass must
    * re-pay the training compute, not read this cache). */
  def clearTrainCache(): Unit = {
    trainCache.values.forEach { case (lc, uc) =>
      try { lc.unpersist(); uc.unpersist() } catch { case _: Throwable => }
    }
    trainCache.clear()
  }

  /** The 1st-place inference path (SURVEY §3.1), both passes: lowercase
    * gazetteer annotate + case-sensitive uc-dict annotate → join_predictions
    * (per-doc overlap resolve) → flat annotation table. */
  def annotate(spark: SparkSession, sfDir: String): Dataset[Annotation] = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val n = corpusSize(sfDir)
    val k = numConcepts(n)
    val lc = spark.createDataset(Synth.dictionary(k, includeAbbrs = false))
    val uc = spark.createDataset(Synth.ucDictionary(k))
    graft.operators.DictTrain.infer(sharedDocs(spark, sfDir), lc, uc)
  }

  /** Export dir for the end-to-end pipeline oracles (VERDICT r3 Next #1):
    * the graded queries write their ACTUAL inputs (engine outputs) to
    * parquet at this fixed path, and the oracle SQL re-scores them in
    * DuckDB with the same interval-IoU / pair-F1 SQL already proven on
    * derived data (`metric_macro_iou` / `metric_pairwise_f1`). The path
    * must be static because oracle SQL is static. Exports happen only when
    * `graft.export.oracle` is set (Verify sets it; Bench does not — so a
    * later bench run at a different sf can never overwrite the exports the
    * driver's DuckDB pass reads, and export IO never pollutes timings).
    * Queries export their own inputs even when another query exports the
    * same table (e.g. the shared doc text) — each query must stay
    * self-contained under any execution order, and the duplicated
    * Verify-only IO is a few MB at sf0.01. */
  val ExportDir = "/tmp/graft_export"

  private[queries] def exportEnabled: Boolean = sys.props.contains("graft.export.oracle")

  /** SQL recomputing the per-doc span checksum from an exported flattened
    * span table — the full `spanChecksum` algebra in DuckDB: per field a
    * seeded 31-poly hash (HUGEINT mod-2^64 list_reduce) with the
    * xorshift64*-style finalizer, per doc the ordered FNV-style
    * xor-multiply fold over [kind, text, media_ref, idx] of every span.
    * Yields (doc_id, cks BIGINT). */
  private def checksumSql(exportName: String): String =
    s"""WITH sp AS (SELECT doc_id, idx, kind, text, media_ref
       |  FROM read_parquet('$ExportDir/$exportName/*.parquet')),
       |f AS (SELECT doc_id, idx, 1 AS fno, kind AS fval FROM sp
       |  UNION ALL SELECT doc_id, idx, 2, text FROM sp
       |  UNION ALL SELECT doc_id, idx, 3, media_ref FROM sp),
       |fh AS (SELECT doc_id, idx, fno, xor(mm, mm >> 32) AS hv FROM (
       |  SELECT doc_id, idx, fno, CAST((CAST(list_reduce(list_prepend(
       |      CAST(1125899906842597 AS HUGEINT) * 31 + fno,
       |      list_transform(list_filter(string_split(fval, ''), x -> x <> ''),
       |        x -> CAST(unicode(x) AS HUGEINT))),
       |      (a, c) -> (a * 31 + c) % CAST(18446744073709551616 AS HUGEINT)) AS HUGEINT)
       |      * CAST(2685821657736338717 AS HUGEINT))
       |      % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT) AS mm FROM f)),
       |sl AS (SELECT doc_id, idx,
       |    list_append(list(hv ORDER BY fno), CAST(idx AS UBIGINT)) AS f4
       |  FROM fh GROUP BY doc_id, idx),
       |fl AS (SELECT doc_id, flatten(list(f4 ORDER BY idx)) AS vs FROM sl GROUP BY doc_id),
       |ck AS (SELECT doc_id,
       |    list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), vs),
       |      (a, v) -> CAST((CAST(xor(a, v) AS HUGEINT) * 1099511628211)
       |        % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT)) AS cu FROM fl)
       |SELECT doc_id, CAST(CASE WHEN CAST(cu AS HUGEINT) >= CAST(9223372036854775808 AS HUGEINT)
       |  THEN CAST(cu AS HUGEINT) - CAST(18446744073709551616 AS HUGEINT)
       |  ELSE CAST(cu AS HUGEINT) END AS BIGINT) AS cks
       |FROM ck""".stripMargin

  /** Run token claimed by this JVM's FIRST export: the static export dir is
    * world-writable, so a CONCURRENT Verify (another JVM, possibly another
    * sf dir) clobbering it mid-run would silently mix exports from two runs
    * and mislead the DuckDB compare (ADVICE r4). The first export of a JVM
    * clears stale exports and writes a unique token; every later export
    * re-reads it and fails loudly on mismatch. Sequential re-runs (the
    * normal builder/driver flow) simply re-claim the dir. */
  private val runToken = new java.util.concurrent.atomic.AtomicReference[String](null)

  private[queries] def exportTable(df: DataFrame, name: String): Unit =
    if (exportEnabled) {
      val tokenPath = java.nio.file.Paths.get(ExportDir, "_run_token")
      runToken.synchronized {
        if (runToken.get() == null) {
          val dir = new java.io.File(ExportDir)
          def rm(f: java.io.File): Unit = {
            val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete()
          }
          rm(dir); dir.mkdirs()
          val tok = java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
            ":" + System.nanoTime()
          java.nio.file.Files.writeString(tokenPath, tok)
          runToken.set(tok)
        } else {
          val cur = try java.nio.file.Files.readString(tokenPath)
            catch { case _: Exception => "<missing>" }
          require(cur == runToken.get(),
            s"$ExportDir was clobbered by a concurrent Verify run (token " +
              s"'$cur' != this run's '${runToken.get()}') — oracle exports " +
              "are inconsistent; re-run Verify alone")
        }
      }
      df.coalesce(1).write.mode("overwrite").parquet(s"$ExportDir/$name")
    }

  /** DuckDB header-gazetteer literal (Synth.headers normalized). */
  private val headerSqlList: String =
    Synth.headers.map(h => "'" + graft.functions.TextFns.normalize(h) + "'").mkString(", ")

  private[queries] val M64 = "CAST(18446744073709551616 AS HUGEINT)" // 2^64

  /** 31-poly fingerprint of a VARCHAR expression as UBIGINT (mod-2^64
    * HUGEINT reduce over per-char codepoints — ASCII-guarded corpus). */
  private[queries] def polySql(expr: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |      list_transform(list_filter(string_split($expr, ''), x -> x <> ''),
       |        x -> CAST(unicode(x) AS HUGEINT))),
       |      (a, c) -> (a * 31 + c) % $M64) AS UBIGINT)""".stripMargin

  /** xorshift64*-style finalize of a UBIGINT expression: multiply by a
    * bounded odd constant (< 2^62 — no HUGEINT overflow), fold high half. */
  private[queries] def foldSql(expr: String, mul: Long): String =
    s"""xor(CAST((CAST($expr AS HUGEINT) * $mul) % $M64 AS UBIGINT),
       |      CAST((CAST($expr AS HUGEINT) * $mul) % $M64 AS UBIGINT) >> 32)""".stripMargin

  /** VALUES rows for the first k minhash seed-multiplier PAIRS, split into
    * 32-bit limbs: multiplying by an ARBITRARY 64-bit constant overflows
    * HUGEINT, so the SQL replay decomposes a·b mod 2^64 into limb products
    * (each < 2^64). Constants come from the same splitmix64 generator the
    * engine uses (TextFns.seedMultipliers) at SQL-build time. */
  private[queries] def seedRowsSql(k: Int): String = {
    val mul = graft.functions.TextFns.seedMultipliers(k)
    (0 until k).map { i =>
      val a = mul(2 * i); val b = mul(2 * i + 1)
      s"($i, ${a >>> 32}, ${a & 0xffffffffL}, ${b >>> 32}, ${b & 0xffffffffL})"
    }.mkString(", ")
  }

  /** a·b mod 2^64 where a is an embedded constant split into (hiCol, loCol)
    * 32-bit limbs and `b` is a UBIGINT expression: the classic limb
    * decomposition — lo·b_lo + 2^32·((hi·b_lo + lo·b_hi) mod 2^32), every
    * partial product < 2^64, the sum < 2^65, all safely inside HUGEINT. */
  private[queries] def limbMulSql(hiCol: String, loCol: String, b: String): String =
    s"""(CAST($loCol AS HUGEINT) * CAST($b & CAST(4294967295 AS UBIGINT) AS HUGEINT)
       |      + ((CAST($hiCol AS HUGEINT) * CAST($b & CAST(4294967295 AS UBIGINT) AS HUGEINT)
       |          + CAST($loCol AS HUGEINT) * CAST($b >> 32 AS HUGEINT)) % 4294967296) * 4294967296)""".stripMargin

  /** CTE fragment replaying `Blocking.keyHashesFor` for every DISTINCT norm
    * of CTE `src` (which must expose a `norm` column): char-3-gram 31-poly
    * fingerprints, the two xorshift64*-style folded base hashes, the
    * 64-seed double-hash minhash (limb-decomposed mod-2^64 multiplies,
    * SIGNED min like the engine's Long compare), FNV band folds with the
    * per-band init, and the domain-separated ex:/st: whole-string hashes.
    * Emits `<p>keys(norm, keyu)` — the same key multiset per norm the
    * engine's flatMap produces — plus `<p>gb(norm, b1, b2)` per gram
    * occurrence (b1 = simGramHash, reused by the embedding replay). */
  private[graft] def blockKeySql(src: String, p: String): String =
    s"""${p}nrm AS MATERIALIZED (SELECT DISTINCT norm FROM $src),
       |${p}gr AS (SELECT norm, unnest(CASE WHEN length(norm) < 3 THEN [norm]
       |    ELSE [substr(norm, i, 3) for i in range(1, length(norm) - 1)] END) AS gram
       |  FROM ${p}nrm),
       |${p}gp AS (SELECT norm, ${polySql("gram")} AS poly FROM ${p}gr),
       |${p}gb AS MATERIALIZED (SELECT norm,
       |    xor(m1, m1 >> 32) AS b1,
       |    xor(m2, m2 >> 32) | CAST(1 AS UBIGINT) AS b2
       |  FROM (SELECT norm,
       |      CAST((CAST(poly AS HUGEINT) * ${graft.functions.TextFns.XsMul1}) % $M64 AS UBIGINT) AS m1,
       |      CAST((CAST(poly AS HUGEINT) * ${graft.functions.TextFns.XsMul2}) % $M64 AS UBIGINT) AS m2
       |    FROM ${p}gp)),
       |${p}sd AS (SELECT * FROM (VALUES ${seedRowsSql(64)}) t(i, a1h, a1l, a2h, a2l)),
       |${p}hh AS (SELECT norm, i,
       |    CAST((${limbMulSql("a1h", "a1l", "b1")}
       |      + ${limbMulSql("a2h", "a2l", "b2")}) % $M64 AS UBIGINT) AS hu
       |  FROM ${p}gb CROSS JOIN ${p}sd),
       |${p}sg AS MATERIALIZED (SELECT norm, i,
       |    min(CAST(CASE WHEN hu >= CAST(9223372036854775808 AS UBIGINT)
       |      THEN CAST(hu AS HUGEINT) - $M64
       |      ELSE CAST(hu AS HUGEINT) END AS BIGINT)) AS hs
       |  FROM ${p}hh GROUP BY norm, i),
       |${p}sgu AS (SELECT norm, i,
       |    CAST(CASE WHEN hs < 0 THEN CAST(hs AS HUGEINT) + $M64
       |      ELSE CAST(hs AS HUGEINT) END AS UBIGINT) AS hu
       |  FROM ${p}sg),
       |${p}bd AS (SELECT norm, CAST(i // 4 AS INT) AS band, list(hu ORDER BY i) AS sl
       |  FROM ${p}sgu GROUP BY norm, i // 4),
       |${p}bk AS (SELECT norm,
       |    list_reduce(list_prepend(
       |      xor(CAST(14695981039346656037 AS UBIGINT),
       |        CAST(CAST(band AS HUGEINT) * 11400714819323198485 % $M64 AS UBIGINT)),
       |      sl),
       |      (a, v) -> CAST((CAST(xor(a, v) AS HUGEINT) * 1099511628211)
       |        % $M64 AS UBIGINT)) AS keyu
       |  FROM ${p}bd),
       |${p}wp AS (SELECT norm, ${polySql("norm")} AS poly FROM ${p}nrm),
       |${p}sp AS (SELECT norm, ${polySql("sorted")} AS poly
       |  FROM (SELECT norm, array_to_string(list_sort(list_filter(string_split(norm, ' '),
       |      x -> x <> '' AND x NOT IN ('of','the','a','an','in','on','and','or','to'))), ' ') AS sorted
       |    FROM ${p}nrm)),
       |${p}keys AS MATERIALIZED (
       |  SELECT norm, keyu FROM ${p}bk
       |  UNION ALL
       |  SELECT norm, ${foldSql("xor(poly, CAST(284545 AS UBIGINT))", graft.functions.TextFns.XsMul1)} FROM ${p}wp
       |  UNION ALL
       |  SELECT norm, ${foldSql("xor(poly, CAST(359069 AS UBIGINT))", graft.functions.TextFns.XsMul1)} FROM ${p}sp)""".stripMargin

  /** Full SQL replay of the flagship inference path — matchDocDual + the
    * greedy overlap resolve — over exported docs + dictionaries:
    * line/segment offset arithmetic (window prefix sums), sectioning with
    * the gazetteer/other mapping and ASOF as-of lookup, header-line veto,
    * token n-grams ≤ 6 with last-token destem, per-section dict joins, and
    * the resolve as two recursive CTEs (the sweep — including its
    * scan-does-not-skip-removed-j semantics — and the growing-survivor
    * rescue pass). Validated against literal transcriptions on adversarial
    * fixtures (header/veto/plural/uppercase/overlap cases) before wiring.
    * MATERIALIZED hints keep the recursion from re-inlining the match
    * pipeline per level. */
  private def annotateOracleSql: String =
    annotateReplaySql("ga_docs", "ga_lc", "ga_uc")

  /** The gazetteer CANDIDATE machinery as a reusable CTE fragment over an
    * exported (doc_id, text) table: line/segment offset arithmetic,
    * sectioning, header-line + veto-section guards, token n-grams ≤ 6 with
    * the last-token destem — everything `matchDoc` does before the dict
    * probe. Shared by the inference replays (annotateReplaySql) and the
    * dict_train scored-table replay. `keys` is MATERIALIZED: every raw
    * match branch references it and an inlined copy re-runs the whole
    * candidate pipeline per branch. */
  private def matchCandidatesSql(docsT: String): String =
    s"""lines AS (
       |  SELECT doc_id, line, li,
       |    CAST(sum(length(line) + 1) OVER (PARTITION BY doc_id ORDER BY li
       |      ROWS UNBOUNDED PRECEDING) - length(line) - 1 AS INT) AS ls
       |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
       |          unnest(range(1, len(string_split(text, chr(10))) + 1)) AS li
       |        FROM read_parquet('$ExportDir/$docsT/*.parquet'))),
       |hl AS (
       |  SELECT doc_id, ls, ls + length(line) AS le
       |  FROM (SELECT doc_id, ls, line,
       |          regexp_replace(line, '[ \\t\\r\\x0B\\f]+$$', '') AS rt FROM lines)
       |  WHERE length(rt) > 0 AND substr(rt, length(rt), 1) = ':'),
       |sec AS (
       |  SELECT doc_id, ls,
       |    CASE WHEN name IN ($headerSqlList) THEN name ELSE 'other' END AS header
       |  FROM (SELECT doc_id, ls,
       |          trim(regexp_replace(lower(substr(t, 1, length(t) - 1)), '[^a-z0-9]+', ' ', 'g')) AS name
       |        FROM (SELECT doc_id, ls,
       |                trim(line, ' ' || chr(9) || chr(13) || chr(11) || chr(12)) AS t
       |              FROM lines)
       |        WHERE length(t) > 0 AND substr(t, length(t), 1) = ':')
       |  WHERE name <> ''),
       |segs AS (
       |  SELECT doc_id, seg, si,
       |    CAST(sum(length(seg)) OVER (PARTITION BY doc_id ORDER BY si
       |      ROWS UNBOUNDED PRECEDING) - length(seg) AS INT) AS soff
       |  FROM (SELECT doc_id,
       |          unnest(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9]+')) AS seg,
       |          unnest(range(1, len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9]+')) + 1)) AS si
       |        FROM read_parquet('$ExportDir/$docsT/*.parquet'))),
       |toks AS (
       |  SELECT doc_id, seg AS tok, soff AS ts, soff + length(seg) AS te,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY si) AS INT) AS ti
       |  FROM segs WHERE regexp_matches(seg, '^[a-zA-Z0-9]')),
       |tokarr AS (
       |  SELECT doc_id, list(tok ORDER BY ti) AS raws, list(lower(tok) ORDER BY ti) AS lcs
       |  FROM toks GROUP BY doc_id),
       |cand0 AS (
       |  SELECT t1.doc_id, t1.ti AS i, t2.ti AS j, t1.ts AS cstart, t2.te AS cend,
       |    t2.tok AS lastTok
       |  FROM toks t1 JOIN toks t2
       |    ON t1.doc_id = t2.doc_id AND t2.ti BETWEEN t1.ti AND t1.ti + 5
       |  WHERE t1.ts >= 100
       |    AND NOT EXISTS (SELECT 1 FROM hl
       |      WHERE hl.doc_id = t1.doc_id AND hl.ls <= t1.ts AND t1.ts < hl.le)),
       |cand AS (
       |  SELECT c.*, coalesce(s.header, 'preamble') AS dsec
       |  FROM cand0 c ASOF LEFT JOIN sec s
       |    ON c.doc_id = s.doc_id AND c.cstart >= s.ls),
       |candv AS (
       |  SELECT * FROM cand
       |  WHERE NOT (dsec LIKE '%medication%' OR dsec LIKE '%service%'
       |    OR dsec LIKE '%date of birth%')),
       |keys AS MATERIALIZED (
       |  SELECT c.doc_id, c.cstart, c.cend, c.dsec,
       |    array_to_string(array_slice(a.lcs, c.i, c.j), ' ') AS key_lc,
       |    array_to_string(array_slice(a.raws, c.i, c.j), ' ') AS key_uc,
       |    (length(c.lastTok) > 3 AND lower(substr(c.lastTok, length(c.lastTok), 1)) = 's') AS destem
       |  FROM candv c JOIN tokarr a USING (doc_id))""".stripMargin

  /** Parameterized by export-table names so the same replay verifies both
    * the fixed-dictionary path (linkage_annotate) and the TRAINED-dict
    * inference (dict_train_iou). */
  private def annotateReplaySql(docsT: String, lcT: String, ucT: String): String =
    s"""WITH RECURSIVE
       |${matchCandidatesSql(docsT)},
       |lcd AS (SELECT * FROM read_parquet('$ExportDir/$lcT/*.parquet')),
       |ucd AS (SELECT * FROM read_parquet('$ExportDir/$ucT/*.parquet')),
       |raw AS (
       |  SELECT k.doc_id, k.cstart AS s, k.cend AS e, dd.concept_id, dd.section, dd.mention
       |  FROM keys k JOIN lcd dd ON dd.mention = k.key_lc
       |  WHERE dd.section = 'any' OR dd.section = k.dsec
       |  UNION ALL
       |  SELECT k.doc_id, k.cstart, k.cend, dd.concept_id, dd.section, dd.mention
       |  FROM keys k JOIN lcd dd
       |    ON k.destem AND dd.mention = array_slice(k.key_lc, 1, length(k.key_lc) - 1)
       |  WHERE dd.section = 'any' OR dd.section = k.dsec
       |  UNION ALL
       |  SELECT k.doc_id, k.cstart, k.cend, dd.concept_id, dd.section, dd.mention
       |  FROM keys k JOIN ucd dd ON dd.mention = k.key_uc
       |  WHERE dd.section = 'any' OR dd.section = k.dsec
       |  UNION ALL
       |  SELECT k.doc_id, k.cstart, k.cend, dd.concept_id, dd.section, dd.mention
       |  FROM keys k JOIN ucd dd
       |    ON k.destem AND dd.mention = array_slice(k.key_uc, 1, length(k.key_uc) - 1)
       |  WHERE dd.section = 'any' OR dd.section = k.dsec),
       |spans AS MATERIALIZED (
       |  SELECT doc_id, s, e, concept_id, section, mention,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY s, e, section, concept_id, mention) AS INT) AS k,
       |    (e - s) - CASE WHEN section = 'any' OR section LIKE '(%' THEN 0.1 ELSE 0.0 END AS eff
       |  FROM raw),
       |arr AS MATERIALIZED (
       |  SELECT doc_id, CAST(count(*) AS INT) AS n, list(s ORDER BY k) AS ss,
       |    list(e ORDER BY k) AS es, list(eff ORDER BY k) AS fs
       |  FROM spans GROUP BY doc_id),
       |sweep(doc_id, i, j, removed) AS (
       |  SELECT doc_id, 1, 2, CAST([] AS INT[]) FROM arr WHERE n > 1
       |  UNION ALL
       |  SELECT s.doc_id,
       |    CASE WHEN list_contains(s.removed, s.i) THEN s.i + 1
       |         WHEN s.j <= a.n AND a.ss[s.j] < a.es[s.i]
       |           THEN CASE WHEN a.fs[s.i] < a.fs[s.j] THEN s.i + 1 ELSE s.i END
       |         ELSE s.i + 1 END,
       |    CASE WHEN list_contains(s.removed, s.i) THEN s.i + 2
       |         WHEN s.j <= a.n AND a.ss[s.j] < a.es[s.i]
       |           THEN CASE WHEN a.fs[s.i] < a.fs[s.j] THEN s.i + 2 ELSE s.j + 1 END
       |         ELSE s.i + 2 END,
       |    CASE WHEN list_contains(s.removed, s.i) THEN s.removed
       |         WHEN s.j <= a.n AND a.ss[s.j] < a.es[s.i]
       |           THEN CASE WHEN a.fs[s.i] < a.fs[s.j]
       |                     THEN list_append(s.removed, s.i)
       |                     WHEN list_contains(s.removed, s.j) THEN s.removed
       |                     ELSE list_append(s.removed, s.j) END
       |         ELSE s.removed END
       |  FROM sweep s JOIN arr a USING (doc_id)
       |  WHERE s.i <= a.n),
       |final_removed AS MATERIALIZED (
       |  SELECT s.doc_id, list_sort(s.removed) AS rl,
       |    list_filter(range(1, a.n + 1), v -> NOT list_contains(s.removed, v)) AS survivors
       |  FROM sweep s JOIN arr a USING (doc_id) WHERE s.i = a.n + 1),
       |rescue(doc_id, k, rescued) AS (
       |  SELECT doc_id, 1, CAST([] AS INT[]) FROM final_removed WHERE len(rl) > 0
       |  UNION ALL
       |  SELECT r.doc_id, r.k + 1,
       |    CASE WHEN len(list_filter(f.survivors || r.rescued, v ->
       |        (a.ss[CAST(v AS INT)] <= a.ss[f.rl[r.k]] AND a.es[CAST(v AS INT)] > a.ss[f.rl[r.k]]) OR
       |        (a.ss[CAST(v AS INT)] <= a.es[f.rl[r.k]] AND a.es[CAST(v AS INT)] > a.es[f.rl[r.k]]))) > 0
       |      THEN r.rescued ELSE list_append(r.rescued, f.rl[r.k]) END
       |  FROM rescue r JOIN final_removed f USING (doc_id) JOIN arr a USING (doc_id)
       |  WHERE r.k <= len(f.rl)),
       |final_rescued AS (
       |  SELECT r.doc_id, r.rescued FROM rescue r JOIN final_removed f USING (doc_id)
       |  WHERE r.k = len(f.rl) + 1),
       |kept AS (
       |  SELECT f.doc_id, unnest(f.survivors || coalesce(fr.rescued, [])) AS k
       |  FROM final_removed f LEFT JOIN final_rescued fr USING (doc_id)
       |  UNION ALL
       |  SELECT a.doc_id, 1 FROM arr a WHERE a.n = 1)
       |SELECT sp.doc_id, sp.s AS "start", sp.e AS "end", sp.concept_id, sp.section,
       |  sp.mention AS dict_entry
       |FROM kept JOIN spans sp ON kept.doc_id = sp.doc_id AND kept.k = sp.k""".stripMargin

  /** SQL re-derivation of the ENTIRE trained dictionary from the exported
    * scored-key artifact + raw inputs — see the dict_train QueryDef. */
  private def trainOracleSql: String =
    s"""
       |WITH RECURSIVE
       |${matchCandidatesSql("tr_docs")},
       |mention0 AS (
       |  SELECT g.doc_id, g."start" AS s, g."end" AS e, g.concept_id,
       |    array_slice(d.text, g."start" + 1, least(g."end", length(d.text))) AS surface
       |  FROM read_parquet('$ExportDir/tr_gold/*.parquet') g
       |  JOIN read_parquet('$ExportDir/tr_docs/*.parquet') d USING (doc_id)),
       |mentions AS MATERIALIZED (
       |  SELECT m.doc_id, m.s, m.e, m.concept_id, m.surface,
       |    trim(regexp_replace(lower(m.surface), '[^a-z0-9]+', ' ', 'g')) AS norm,
       |    coalesce(sc2.header, 'preamble') AS msec
       |  FROM mention0 m ASOF LEFT JOIN sec sc2
       |    ON m.doc_id = sc2.doc_id AND m.s >= sc2.ls),
       |-- harvest: unique strict-majority concept per (section, norm)
       |grain AS (SELECT msec AS section, norm, concept_id, count(*) AS cnt
       |  FROM mentions GROUP BY 1, 2, 3),
       |harvested AS (
       |  SELECT section, norm AS mention, concept_id FROM (
       |    SELECT section, norm, concept_id, cnt,
       |      row_number() OVER (PARTITION BY section, norm ORDER BY cnt DESC, concept_id ASC) AS rn,
       |      sum(cnt) OVER (PARTITION BY section, norm) AS total
       |    FROM grain) WHERE rn = 1 AND 2 * cnt > total),
       |ucn AS (SELECT norm FROM (
       |    SELECT norm, avg(CASE WHEN surface = upper(surface) THEN 1.0 ELSE 0.0 END) AS r
       |    FROM mentions GROUP BY norm) WHERE r > 0.99),
       |lc_harv AS MATERIALIZED (SELECT h.* FROM harvested h LEFT JOIN ucn ON h.mention = ucn.norm
       |  WHERE ucn.norm IS NULL),
       |uc_harv AS (SELECT DISTINCT h.section, upper(h.mention) AS mention, h.concept_id
       |  FROM harvested h JOIN ucn ON h.mention = ucn.norm),
       |-- gazetteer predictions of the harvested lc dict, re-derived from RAW
       |-- inputs (r5, closing the last training seam): the same candidate
       |-- machinery as the inference replay probes the SQL-derived lc_harv —
       |-- KEEP_OVERLAPS semantics, so scoring sees the unresolved span set
       |tr_pred AS (
       |  SELECT k.doc_id, k.cstart AS s, k.cend AS e, dd.concept_id, dd.section, dd.mention
       |  FROM keys k JOIN lc_harv dd ON dd.mention = k.key_lc
       |  WHERE dd.section = 'any' OR dd.section = k.dsec
       |  UNION ALL
       |  SELECT k.doc_id, k.cstart, k.cend, dd.concept_id, dd.section, dd.mention
       |  FROM keys k JOIN lc_harv dd
       |    ON k.destem AND dd.mention = array_slice(k.key_lc, 1, length(k.key_lc) - 1)
       |  WHERE dd.section = 'any' OR dd.section = k.dsec),
       |-- two-pointer ±1 scoring (compare_ref_pred, mimic_train.py:89-134):
       |-- the pointer advances monotonically with prediction start, so iRef
       |-- is a pure AS-OF function of start — no recursion needed.
       |-- iRef = min(max(#{refs: start <= pred.start} - 1, 0), max(nRef-2, 0));
       |-- overlap-score 0 probes ref iRef+1 only while iRef+1 < nRef-1 (the
       |-- reference's advance guard); a remaining 0 becomes -1.
       |refs AS MATERIALIZED (
       |  SELECT doc_id, "start" AS rs, "end" AS re, concept_id AS rcid,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY "start", "end", concept_id) AS INT) - 1 AS ri,
       |    CAST(count(*) OVER (PARTITION BY doc_id) AS INT) AS nref
       |  FROM read_parquet('$ExportDir/tr_gold/*.parquet')),
       |pasof AS (
       |  SELECT p.*, r.ri AS lri
       |  FROM tr_pred p ASOF LEFT JOIN refs r ON p.doc_id = r.doc_id AND p.s >= r.rs),
       |pidx AS (
       |  SELECT pa.*, rn.nref,
       |    CASE WHEN rn.nref IS NULL THEN NULL
       |         ELSE least(greatest(coalesce(pa.lri, -1), 0), greatest(rn.nref - 2, 0)) END AS iref
       |  FROM pasof pa LEFT JOIN (SELECT doc_id, max(nref) AS nref FROM refs GROUP BY doc_id) rn
       |    USING (doc_id)),
       |ps0 AS (
       |  SELECT p.*,
       |    CASE WHEN r0.rs > p.s THEN -1
       |         WHEN r0.re < p.s THEN 0
       |         WHEN r0.rcid = p.concept_id
       |           AND ((r0.rs = p.s AND r0.re = p.e) OR contains(p.mention, ' ')) THEN 1
       |         ELSE -1 END AS sc0
       |  FROM pidx p LEFT JOIN refs r0 ON p.doc_id = r0.doc_id AND p.iref = r0.ri),
       |ps1 AS (
       |  SELECT p.*,
       |    CASE WHEN r1.ri IS NULL THEN NULL
       |         WHEN r1.rs > p.s THEN -1
       |         WHEN r1.re < p.s THEN 0
       |         WHEN r1.rcid = p.concept_id
       |           AND ((r1.rs = p.s AND r1.re = p.e) OR contains(p.mention, ' ')) THEN 1
       |         ELSE -1 END AS sc1
       |  FROM ps0 p LEFT JOIN refs r1
       |    ON p.doc_id = r1.doc_id AND p.iref + 1 = r1.ri AND p.iref + 1 < p.nref - 1),
       |tr_scored AS MATERIALIZED (
       |  SELECT doc_id, section, mention,
       |    CASE WHEN nref IS NULL THEN -1
       |         WHEN sc0 = 0 AND sc1 IS NOT NULL THEN (CASE WHEN sc1 = 0 THEN -1 ELSE sc1 END)
       |         WHEN sc0 = 0 THEN -1
       |         ELSE sc0 END AS score
       |  FROM ps1),
       |-- scoring rollups from the RE-DERIVED scored table (inputs-only)
       |bynote AS (
       |  SELECT section, mention, CAST(sum(has1) AS BIGINT) AS n_correct,
       |    CAST(sum(hasm1) AS BIGINT) AS n_incorrect
       |  FROM (SELECT doc_id, section, mention,
       |          max(CASE WHEN score = 1 THEN 1 ELSE 0 END) AS has1,
       |          max(CASE WHEN score = -1 THEN 1 ELSE 0 END) AS hasm1
       |        FROM tr_scored GROUP BY 1, 2, 3) GROUP BY 1, 2),
       |naive AS (
       |  SELECT h.* FROM lc_harv h LEFT JOIN bynote b USING (section, mention)
       |  WHERE b.n_correct IS NULL OR NOT (b.n_correct <
       |    (CASE WHEN b.n_correct = 1 THEN 1.0
       |          WHEN h.section = 'any' THEN 0.3 ELSE 0.2 END) * b.n_incorrect)),
       |bymention AS (
       |  SELECT section, mention,
       |    CAST(sum(CASE WHEN score = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |    CAST(sum(CASE WHEN score = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_incorrect
       |  FROM tr_scored GROUP BY 1, 2),
       |goldc AS (SELECT concept_id, CAST(count(*) AS BIGINT) AS n_gold FROM read_parquet('$ExportDir/tr_gold/*.parquet') GROUP BY 1),
       |greedy_in AS (
       |  SELECT n.concept_id, n.section, n.mention, m.n_correct AS c, m.n_incorrect AS i, gc.n_gold
       |  FROM naive n JOIN bymention m USING (section, mention)
       |  JOIN goldc gc USING (concept_id)),
       |garr AS MATERIALIZED (
       |  SELECT concept_id, CAST(count(*) AS INT) AS nk, max(n_gold) AS n_gold,
       |    list(section ORDER BY -(c / (i + 0.01)), section, mention) AS secs,
       |    list(mention ORDER BY -(c / (i + 0.01)), section, mention) AS ms,
       |    list(c ORDER BY -(c / (i + 0.01)), section, mention) AS cs,
       |    list(i ORDER BY -(c / (i + 0.01)), section, mention) AS xs
       |  FROM greedy_in GROUP BY concept_id),
       |greedy(concept_id, k, corr, inc, bad) AS (
       |  SELECT concept_id, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST([] AS INT[]) FROM garr
       |  UNION ALL
       |  SELECT q.concept_id, q.k + 1,
       |    CASE WHEN q.keep THEN q.corr + q.ck ELSE q.corr END,
       |    CASE WHEN q.keep THEN q.inc + q.ik ELSE q.inc END,
       |    CASE WHEN q.keep THEN q.bad ELSE list_append(q.bad, q.k) END
       |  FROM (SELECT r.concept_id, r.k, r.corr, r.inc, r.bad,
       |      a.cs[r.k] AS ck, a.xs[r.k] AS ik,
       |      (CAST(r.corr AS DOUBLE) / (r.inc + a.n_gold) < a.cs[r.k] / (a.xs[r.k] + 0.01)
       |       OR NOT (a.cs[r.k] <
       |         (CASE WHEN a.cs[r.k] = 1 THEN 1.0
       |               WHEN a.secs[r.k] = 'any' THEN (CASE WHEN r.k > 3 THEN 0.6 ELSE 0.3 END)
       |               ELSE (CASE WHEN r.k > 3 THEN 0.4 ELSE 0.2 END) END) * a.xs[r.k])) AS keep
       |    FROM greedy r JOIN garr a USING (concept_id) WHERE r.k <= a.nk) q),
       |badkeys AS (
       |  SELECT a.concept_id, a.secs[bi] AS section, a.ms[bi] AS mention
       |  FROM (SELECT gr.concept_id, unnest(gr.bad) AS bi
       |        FROM greedy gr JOIN garr a2 USING (concept_id) WHERE gr.k = a2.nk + 1) u
       |  JOIN garr a USING (concept_id)),
       |core AS MATERIALIZED (
       |  SELECT n.* FROM naive n LEFT JOIN (SELECT DISTINCT section, mention FROM badkeys) b
       |    USING (section, mention)
       |  WHERE b.section IS NULL),
       |-- terminology
       |term AS (
       |  SELECT DISTINCT 'any' AS section, m AS mention, concept_id FROM (
       |    SELECT concept_id,
       |      trim(regexp_replace(lower(tc), '[^a-z0-9]+', ' ', 'g')) AS m
       |    FROM (SELECT des.concept_id,
       |        CASE WHEN des.typ = 'FSN'
       |             THEN regexp_replace(des.term, '\\s*\\([^)]*\\)$$', '') ELSE des.term END AS tc
       |      FROM read_parquet('$ExportDir/tr_desc/*.parquet') des
       |      JOIN read_parquet('$ExportDir/tr_concepts/*.parquet') con_t USING (concept_id)
       |      WHERE des.active = 1 AND con_t.active = 1
       |        AND length(des.term) >= 3
       |        AND NOT contains(des.term, 'machine translation')
       |        AND NOT (contains(des.term, ']') AND strpos(des.term, '[') > 6))
       |    WHERE regexp_matches(substr(tc, 1, 1), '[a-zA-Z0-9]'))
       |  WHERE length(m) >= 3 AND len(string_split(m, ' ')) BETWEEN 1 AND 5),
       |ext AS (
       |  SELECT DISTINCT 'any' AS section,
       |    trim(regexp_replace(lower(e.name), '[^a-z0-9]+', ' ', 'g')) AS mention,
       |    m.ext_id_2 AS concept_id
       |  FROM read_parquet('$ExportDir/tr_extc/*.parquet') e
       |  JOIN read_parquet('$ExportDir/tr_extm/*.parquet') m ON e.ext_id = m.ext_id_1 AND m.relationship = 'Maps to'
       |  WHERE e.vocabulary <> 'FAKEVOCAB1'),
       |-- blacklist
       |bl AS MATERIALIZED (
       |  SELECT word FROM (
       |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
       |    FROM read_parquet('$ExportDir/tr_docs/*.parquet')),
       |    (SELECT count(*) AS nd FROM read_parquet('$ExportDir/tr_docs/*.parquet')) n
       |  WHERE word <> '' GROUP BY word, n.nd HAVING count(*) > 13 * nd),
       |-- expansion
       |base AS MATERIALIZED (SELECT DISTINCT section, mention, concept_id FROM
       |  (SELECT * FROM core UNION ALL SELECT * FROM term UNION ALL SELECT * FROM ext)),
       |blarr AS MATERIALIZED (SELECT coalesce(list(word), CAST([] AS VARCHAR[])) AS bwords FROM bl),
       |base2 AS MATERIALIZED (SELECT b.*, string_split(mention, ' ') AS w, len(string_split(mention, ' ')) AS n,
       |    (len(string_split(mention, ' ')) = 3 AND string_split(mention, ' ')[2] <> 'of'
       |     AND len(list_filter(string_split(mention, ' '), x -> list_contains(bl2.bwords, x))) = 0) AS allperm
       |  FROM base b CROSS JOIN blarr bl2),
       |variants AS (
       |  SELECT section, mention AS v, concept_id FROM base2
       |  UNION ALL
       |  SELECT section, w[3] || ' ' || w[1], concept_id FROM base2 WHERE n = 3 AND w[2] = 'of'
       |  UNION ALL
       |  SELECT section, w[3] || ' ' || w[4] || ' ' || w[1], concept_id FROM base2 WHERE n = 4 AND w[2] = 'of'
       |  UNION ALL
       |  SELECT section, w[4] || ' ' || w[1] || ' ' || w[2], concept_id FROM base2
       |    WHERE n = 4 AND w[2] <> 'of' AND w[3] = 'of'
       |  UNION ALL
       |  SELECT section, w[1] || ' ' || w[4] || ' ' || w[2], concept_id FROM base2
       |    WHERE n = 4 AND w[2] <> 'of' AND w[3] = 'of'
       |  UNION ALL
       |  SELECT section, p[1] || ' ' || p[2] || ' ' || p[3], concept_id
       |  FROM base2, (VALUES ([1,2,3]),([1,3,2]),([2,1,3]),([2,3,1]),([3,1,2]),([3,2,1])) t(ord),
       |    LATERAL (SELECT [w[ord[1]], w[ord[2]], w[ord[3]]] AS p)
       |  WHERE allperm
       |  UNION ALL
       |  SELECT section, replace(mention, ' and ', ' with '), concept_id FROM base2 WHERE contains(mention, ' and ')
       |  UNION ALL
       |  SELECT section, replace(mention, ' with ', ' and '), concept_id FROM base2 WHERE contains(mention, ' with ')
       |  UNION ALL
       |  SELECT section, replace(mention, ' valve ', ' '), concept_id FROM base2 WHERE contains(mention, ' valve ')
       |  UNION ALL
       |  SELECT section, replace(mention, ' of ', ' of the '), concept_id FROM base2 WHERE contains(mention, ' of ')),
       |expanded AS MATERIALIZED (SELECT DISTINCT section, v AS mention, concept_id FROM variants),
       |abbre AS (
       |  SELECT DISTINCT e.section,
       |    trim(regexp_replace(lower(ab.abbr), '[^a-z0-9]+', ' ', 'g')) AS mention, e.concept_id
       |  FROM read_parquet('$ExportDir/tr_abbr/*.parquet') ab JOIN expanded e
       |    ON trim(regexp_replace(lower(ab.meaning), '[^a-z0-9]+', ' ', 'g')) = e.mention
       |  WHERE length(trim(regexp_replace(lower(ab.abbr), '[^a-z0-9]+', ' ', 'g'))) >= 3),
       |withabbr AS (SELECT DISTINCT * FROM
       |  (SELECT * FROM expanded UNION ALL SELECT * FROM abbre)),
       |extadd AS (
       |  SELECT w.* FROM withabbr w
       |  LEFT JOIN (SELECT DISTINCT section, mention FROM core) c USING (section, mention)
       |  WHERE c.section IS NULL),
       |fulld AS (SELECT DISTINCT * FROM (SELECT * FROM core UNION ALL SELECT * FROM extadd)),
       |lcdict AS (SELECT f.* FROM fulld f LEFT JOIN ucn ON f.mention = ucn.norm WHERE ucn.norm IS NULL),
       |ucext AS (SELECT DISTINCT f.section, upper(f.mention) AS mention, f.concept_id
       |  FROM fulld f JOIN ucn ON f.mention = ucn.norm),
       |ucdict AS (SELECT DISTINCT * FROM (SELECT * FROM uc_harv UNION ALL SELECT * FROM ucext)),
       |-- limit any
       |cid2type AS (
       |  SELECT concept_id, min(ctype) AS ctype FROM (
       |    SELECT concept_id, regexp_extract(term, '\\(([^)]*)\\)\\s*$$', 1) AS ctype
       |    FROM read_parquet('$ExportDir/tr_desc/*.parquet') WHERE active = 1 AND typ = 'FSN') WHERE ctype <> '' GROUP BY concept_id),
       |allowed AS (
       |  SELECT DISTINCT t.ctype, m.msec AS section
       |  FROM mentions m JOIN cid2type t USING (concept_id)),
       |anyrows AS (
       |  SELECT l.section, l.mention, l.concept_id, t.ctype
       |  FROM lcdict l LEFT JOIN cid2type t USING (concept_id)
       |  WHERE l.section = 'any'),
       |limited AS (
       |  SELECT a2.section, ar.mention, ar.concept_id
       |  FROM anyrows ar JOIN allowed a2 ON ar.ctype = a2.ctype),
       |keptany AS (
       |  SELECT 'any' AS section, ar.mention, ar.concept_id
       |  FROM anyrows ar LEFT JOIN (SELECT DISTINCT ctype FROM allowed) al ON ar.ctype = al.ctype
       |  WHERE al.ctype IS NULL),
       |lcfinal AS (SELECT DISTINCT * FROM (
       |  SELECT section, mention, concept_id FROM lcdict WHERE section <> 'any'
       |  UNION ALL SELECT * FROM limited
       |  UNION ALL SELECT * FROM keptany))
       |SELECT section, mention, concept_id FROM lcfinal
       |UNION ALL
       |SELECT section, mention, concept_id FROM ucdict""".stripMargin.trim

  val defs: Seq[QueryDef] = Seq(
    // final annotation table (reference submission shape + section/dict_entry).
    // ORACLE (r4): the FLAGSHIP inference path — fused dual-dict gazetteer +
    // greedy overlap resolve — replayed completely in SQL over the exported
    // docs and dictionaries (see annotateOracleSql).
    QueryDef("linkage_annotate",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        if (exportEnabled) {
          val n = corpusSize(dir)
          val k = numConcepts(n)
          exportTable(sharedDocs(s, dir).map(d => (d.doc_id, d.text))
            .toDF("doc_id", "text"), "ga_docs")
          exportTable(s.createDataset(Synth.dictionary(k, includeAbbrs = false))
            .toDF(), "ga_lc")
          exportTable(s.createDataset(Synth.ucDictionary(k)).toDF(), "ga_uc")
        }
        annotate(s, dir).toDF()
      },
      Some(annotateOracleSql)),

    // official-metric query: macro char IoU of the gazetteer path vs gold.
    // END-TO-END ORACLE (r4): the pred table (real two-pass inference
    // output) and the gold table are exported to parquet and DuckDB
    // re-scores them with the char-painting interval-IoU SQL proven in
    // metric_macro_iou — the hard oracle sits on the pipeline RESULT, not
    // just the metric function. Both sides are non-overlapping per doc
    // (pred is overlap-resolved; synth gold is disjoint by construction),
    // where char painting ≡ the engine's interval arithmetic.
    QueryDef("linkage_macro_iou",
      (s, dir) => {
        val n = corpusSize(dir)
        // r6 note: like dict_train_iou, an eager localCheckpoint of the
        // inference was tried here and measured slightly SLOWER than the
        // in-job duplicate evaluation — kept un-materialized.
        val pred = annotate(s, dir).toDF()
          .select(col("doc_id"), col("start"), col("end"), col("concept_id"))
        val gt = sharedGold(s, dir).toDF()
          .select(col("doc_id"), col("start"), col("end"), col("concept_id"))
        exportTable(pred, "liou_pred")
        exportTable(gt, "liou_gold")
        val (perConcept, macroAvg) = Metrics.macroCharIou(pred, gt)
        val nConcepts = perConcept.count()
        import s.implicits._
        Seq(("macro_char_iou", math.rint(macroAvg * 10000) / 10000, nConcepts))
          .toDF("metric", "value", "n_concepts")
      },
      Some(s"""WITH p AS (SELECT doc_id AS doc, concept_id AS cid, "start" AS s, "end" AS e
             |  FROM read_parquet('$ExportDir/liou_pred/*.parquet')),
             |g AS (SELECT doc_id AS doc, concept_id AS cid, "start" AS s, "end" AS e
             |  FROM read_parquet('$ExportDir/liou_gold/*.parquet')),
             |pp AS (SELECT DISTINCT doc, cid, pos FROM
             |  (SELECT doc, cid, unnest(range(s, e)) AS pos FROM p)),
             |gg AS (SELECT DISTINCT doc, cid, pos FROM
             |  (SELECT doc, cid, unnest(range(s, e)) AS pos FROM g)),
             |inter AS (SELECT cid, count(*) AS n FROM pp JOIN gg USING (doc, cid, pos) GROUP BY cid),
             |un AS (SELECT cid, count(*) AS n FROM
             |  (SELECT doc, cid, pos FROM pp UNION SELECT doc, cid, pos FROM gg) GROUP BY cid)
             |SELECT 'macro_char_iou' AS metric,
             |  round(avg(CAST(coalesce(inter.n, 0) AS DOUBLE) / un.n), 4) AS value,
             |  CAST(count(*) AS BIGINT) AS n_concepts
             |FROM un LEFT JOIN inter ON un.cid = inter.cid""".stripMargin)),

    // span-sequence invariant (input_hint): per-doc checksum of
    // (kind, text, media_ref, order) survives a real round-trip through the
    // engine's parquet doc sink/scan (the artifact every pipeline stage
    // consumes) — not a tautological re-generation. ORACLE (r4): both the
    // original and the round-tripped span tables are exported flattened,
    // and DuckDB recomputes BOTH checksums from scratch (seeded 31-poly
    // field hashes + FNV-style fold, all HUGEINT mod-2^64 / UBIGINT
    // xor-fold arithmetic) — verifying the checksum algebra AND the
    // round-trip equality independently of the engine.
    QueryDef("linkage_span_invariant",
      (s, dir) => {
        import s.implicits._
        val n = corpusSize(dir)
        def flatSpans(ds: org.apache.spark.sql.Dataset[Doc]) =
          ds.flatMap(d => d.spans.zipWithIndex.map { case (sp, i) =>
            (d.doc_id, i, sp.kind, sp.text, sp.media_ref)
          }).toDF("doc_id", "idx", "kind", "text", "media_ref")
        val before = sharedDocs(s, dir).map(d => (d.doc_id, spanChecksum(d)))
          .toDF("doc_id", "checksum_before")
        val rt = java.nio.file.Files
          .createTempDirectory("span_invariant").toString + "/docs"
        graft.sources.Readers.writeDocs(sharedDocs(s, dir), rt)
        val rtDocs = graft.sources.Readers.readDocs(s, rt)
        exportTable(flatSpans(sharedDocs(s, dir)), "si_before")
        exportTable(flatSpans(rtDocs), "si_after")
        val after = rtDocs.map(d => (d.doc_id, spanChecksum(d)))
          .toDF("doc_id", "checksum_after")
        before.join(after, "doc_id")
          .withColumn("ok", col("checksum_before") === col("checksum_after"))
      },
      Some(s"""SELECT b.doc_id, b.cks AS checksum_before, a.cks AS checksum_after,
             |  b.cks = a.cks AS ok
             |FROM (${checksumSql("si_before")}) b
             |JOIN (${checksumSql("si_after")}) a USING (doc_id)""".stripMargin)),

    // full record-linkage pipeline: blocking → scoring → argmax link edges →
    // large-star/small-star clustering; output mention→cluster assignments.
    // NORMS-ONLY ORACLE (r5, closing VERDICT r4 Next #2/#3): the engine's
    // scored pairs are NOT read any more — DuckDB re-derives the whole
    // chain from exported node NORMS: the blocking-key universe (poly-family
    // ex/st hashes + the 64-seed minhash band keys via limb-decomposed
    // mod-2^64 multiplies — parity-checked key-for-key by
    // tools/check_key_replay.py), the frequency cap, the bipartite
    // candidate pairs with the length prefilter, all three scoring features
    // (DuckDB jaro_winkler_similarity — the engine's JW is pinned to its
    // exact semantics; levenshtein; cosine over the integer-valued raw
    // hashed embeddings, bit-exact by construction), the logistic fusion,
    // the per-surface argmax + threshold edges, then the graph-theoretic
    // closed form of the clustering: after star contraction each component
    // is a star around one "c:" node ("c:" < "s:" < "t:" makes the concept
    // the lexicographic min = CC label), so expected components need no
    // iterative CC.
    QueryDef("linkage_clusters",
      (s, dir) => {
        implicit val sp: SparkSession = s
        val r = sharedRun(s, dir)
        if (exportEnabled) {
          val n = corpusSize(dir)
          val d = LinkagePipeline.unambiguousDict(dict(s, n))
          val (docsDs, goldDs) = sharedCorpus(s, dir)
          val mentions = LinkagePipeline.mentionsFromSpans(docsDs, goldDs)
          exportTable(d, "cl_dict")
          exportTable(LinkagePipeline.surfaceNodesOf(mentions, d), "cl_nodes")
          exportTable(mentions.toDF().select(
            concat(lit("m:"), col("doc_id"), lit(":"), col("start"), lit(":"),
              col("end")).as("id"), col("norm")), "cl_mentions")
        }
        r.assignments
      },
      Some(s"""WITH cln AS (SELECT id, norm FROM read_parquet('$ExportDir/cl_nodes/*.parquet')),
             |${blockKeySql("cln", "k_")},
             |kid AS MATERIALIZED (SELECT n.id, n.norm, k.keyu FROM cln n JOIN k_keys k USING (norm)),
             |kok AS (SELECT keyu FROM kid GROUP BY keyu HAVING count(*) <= 1000),
             |prs AS MATERIALIZED (
             |  SELECT DISTINCT l.id AS a, r.id AS b, l.norm AS norm_a, r.norm AS norm_b
             |  FROM kid l JOIN kok ok ON l.keyu = ok.keyu JOIN kid r ON r.keyu = l.keyu
             |  WHERE l.id LIKE 's:%' AND r.id LIKE 't:%'
             |    AND abs(length(l.norm) - length(r.norm)) <= 10),
             |ev AS MATERIALIZED (SELECT norm, CAST(b1 % CAST(64 AS UBIGINT) AS INT) AS idx,
             |    CAST(sum(CASE WHEN (b1 >> 6) & CAST(1 AS UBIGINT) = CAST(1 AS UBIGINT)
             |      THEN 1 ELSE -1 END) AS BIGINT) AS w
             |  FROM k_gb GROUP BY norm, idx),
             |n2 AS MATERIALIZED (SELECT norm, sum(w * w) AS nn FROM ev GROUP BY norm),
             |dots AS (SELECT p.a, p.b, sum(ea.w * eb.w) AS dot
             |  FROM prs p JOIN ev ea ON ea.norm = p.norm_a
             |  JOIN ev eb ON eb.norm = p.norm_b AND eb.idx = ea.idx
             |  GROUP BY p.a, p.b),
             |ft AS (SELECT p.a, p.b,
             |    CASE WHEN p.norm_a = p.norm_b THEN 1.0
             |         ELSE jaro_winkler_similarity(p.norm_a, p.norm_b) END AS jwv,
             |    1.0 - CAST(levenshtein(p.norm_a, p.norm_b) AS DOUBLE)
             |      / greatest(length(p.norm_a), length(p.norm_b), 1) AS levr,
             |    CASE WHEN na.nn = 0 OR nb.nn = 0 THEN 0.0
             |         ELSE CAST(coalesce(d.dot, 0) AS DOUBLE)
             |           / sqrt(CAST(na.nn AS DOUBLE) * nb.nn) END AS cosv
             |  FROM prs p
             |  LEFT JOIN dots d ON d.a = p.a AND d.b = p.b
             |  JOIN n2 na ON na.norm = p.norm_a JOIN n2 nb ON nb.norm = p.norm_b),
             |am AS (SELECT a, b FROM (
             |    SELECT a, b, score, row_number() OVER (PARTITION BY a
             |      ORDER BY score DESC, b ASC) AS rn
             |    FROM (SELECT a, b, 1.0 / (1.0 + exp(-12.0 *
             |        ((0.3 * jwv + 0.4 * levr + 0.3 * cosv) - 0.82))) AS score FROM ft))
             |  WHERE rn = 1 AND score >= 0.5),
             |tc AS (SELECT 't:' || mention AS t, 'c:' || concept_id AS c
             |  FROM read_parquet('$ExportDir/cl_dict/*.parquet')),
             |comp AS (SELECT am.a AS id, tc.c AS component FROM am JOIN tc ON am.b = tc.t
             |  UNION ALL SELECT t AS id, c AS component FROM tc),
             |surf AS (SELECT substr(id, 3) AS norm, component FROM comp WHERE id LIKE 's:%'),
             |mm AS (SELECT mn.id, coalesce(su.component, 's:' || mn.norm) AS component
             |  FROM read_parquet('$ExportDir/cl_mentions/*.parquet') mn
             |  LEFT JOIN surf su ON mn.norm = su.norm),
             |nn AS (SELECT n.id, coalesce(c.component, n.id) AS component
             |  FROM read_parquet('$ExportDir/cl_nodes/*.parquet') n
             |  LEFT JOIN comp c ON n.id = c.id)
             |SELECT id, component FROM mm UNION ALL SELECT id, component FROM nn""".stripMargin)),

    // the north-rule gate computed distributed: pairwise P/R/F1 on labeled
    // mention pairs at the same blocking key. ORACLE (r5): the candidate
    // universe is no longer exported — DuckDB re-derives it from the
    // exported mention (id, norm) table via the same blocking-key replay as
    // linkage_clusters (freq cap ≤ 1000, a < b, distinct; the deterministic
    // hash-sampling is inactive at graded scale factors, asserted
    // engine-side). Gold labels are raw inputs; the engine's cluster
    // ASSIGNMENTS stay the artifact under test, re-scored with the plain
    // pair-counting SQL proven in metric_pairwise_f1.
    QueryDef("linkage_pairwise_f1",
      (s, dir) => pipelineF1(s, dir),
      Some(s"""WITH fm AS (SELECT id, norm FROM read_parquet('$ExportDir/f1_mentions/*.parquet')),
             |${blockKeySql("fm", "m_")},
             |mk AS MATERIALIZED (SELECT f.id, k.keyu FROM fm f
             |  JOIN (SELECT DISTINCT norm, keyu FROM m_keys) k USING (norm)),
             |mok AS (SELECT keyu FROM mk GROUP BY keyu HAVING count(*) <= 1000),
             |u AS (SELECT DISTINCT l.id AS a, r.id AS b
             |  FROM mk l JOIN mok ok ON l.keyu = ok.keyu JOIN mk r ON r.keyu = l.keyu
             |  WHERE l.id < r.id),
             |l AS (SELECT id, cid FROM read_parquet('$ExportDir/f1_labels/*.parquet')),
             |c AS (SELECT id, component FROM read_parquet('$ExportDir/f1_assign/*.parquet')),
             |j AS (SELECT (la.cid = lb.cid) AS gold, (ca.component = cb.component) AS pred
             |  FROM u JOIN l la ON u.a = la.id JOIN l lb ON u.b = lb.id
             |  JOIN c ca ON u.a = ca.id JOIN c cb ON u.b = cb.id),
             |s AS (SELECT CAST(count(*) FILTER (gold AND pred) AS DOUBLE) AS tp,
             |  CAST(count(*) FILTER (NOT gold AND pred) AS DOUBLE) AS fp,
             |  CAST(count(*) FILTER (gold AND NOT pred) AS DOUBLE) AS fneg,
             |  count(*) AS n FROM j),
             |pr AS (SELECT CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS p,
             |  CASE WHEN tp + fneg = 0 THEN 0.0 ELSE tp / (tp + fneg) END AS r, n FROM s)
             |SELECT round(p, 4) AS precision, round(r, 4) AS recall,
             |  round(CASE WHEN p + r = 0 THEN 0.0 ELSE 2 * p * r / (p + r) END, 4) AS f1,
             |  CAST(n AS BIGINT) AS n_pairs
             |FROM pr""".stripMargin)),

    // blocking skew report (per-key frequencies — the lineage/metrics view
    // that proves hot keys are capped). ORACLE (r4): the node-level block
    // key table is exported and DuckDB re-aggregates the same top-200
    // (freq desc, key asc — a total order, so the limit is deterministic).
    QueryDef("linkage_block_skew",
      (s, dir) => {
        val r = sharedRun(s, dir)
        exportTable(r.nodeKeys, "skew_keys")
        r.keyFreq.orderBy(col("freq").desc, col("key").asc).limit(200)
      },
      Some(s"""WITH f AS (SELECT key, CAST(count(*) AS BIGINT) AS freq
             |  FROM read_parquet('$ExportDir/skew_keys/*.parquet') GROUP BY key)
             |SELECT key, freq FROM f ORDER BY freq DESC, key ASC LIMIT 200""".stripMargin)),

    // dictionary construction (1st-place training, SURVEY §3.2): harvested +
    // terminology + external-vocab + abbreviation entries, expanded, pruned.
    // INPUTS-ONLY ORACLE (r5, closing VERDICT r4 Next #1): DuckDB re-derives
    // the ENTIRE final dictionary from raw inputs alone — no engine artifact
    // is read. The scored-key table (the last r4 export seam) is itself
    // replayed in SQL: the harvested-dict gazetteer predictions come from
    // the same candidate machinery as the inference replay probing the
    // SQL-derived lc_harv, and the two-pointer ±1 scoring
    // (`mimic_train.py:89-134`) reduces to an AS-OF pointer (it advances
    // monotonically with prediction start — no recursion needed). Downstream
    // stay as r4: mention harvest with strict-majority argmax, the uppercase
    // split, naive by-note pruning, the per-concept GREEDY key-selection
    // loop as a recursive CTE (ratio ordering, doubled thresholds past the
    // 3rd key), terminology/external/abbreviation entries, permutation &
    // replacement expansion with the corpus word blacklist, cond-update
    // anti-join, and allowed-section limiting. The Scala scoring transcription
    // stays pinned by DictTrainGreedySpec differentials.
    QueryDef("dict_train",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        val (lc, uc) = sharedTrainedDicts(s, dir)
        if (exportEnabled) {
          val n = corpusSize(dir)
          val k = numConcepts(n)
          val (d, g) = sharedCorpus(s, dir)
          exportTable(d.map(x => (x.doc_id, x.text)).toDF("doc_id", "text"), "tr_docs")
          exportTable(g.toDF().select(col("doc_id"), col("start"), col("end"),
            col("concept_id")), "tr_gold")
          exportTable(s.createDataset(Synth.concepts(k)).toDF(), "tr_concepts")
          exportTable(s.createDataset(Synth.descriptions(k)).toDF(), "tr_desc")
          exportTable(s.createDataset(Synth.extConcepts(k)).toDF(), "tr_extc")
          exportTable(s.createDataset(Synth.extMappings(k)).toDF(), "tr_extm")
          exportTable(s.createDataset(Synth.abbreviations(k)).toDF(), "tr_abbr")
        }
        lc.toDF().toDF("section", "mention", "concept_id")
          .union(uc.toDF().toDF("section", "mention", "concept_id"))
      },
      Some(trainOracleSql)),

    // end-to-end retrain-then-infer: macro char IoU using the TRAINED
    // (lc, uc) dictionary pair through the two-pass inference. ORACLE (r4):
    // the TRAINED dictionaries (engine artifacts), docs and gold are
    // exported, and DuckDB independently replays the ENTIRE inference
    // (gazetteer match + greedy resolve, same recursive-CTE replay as
    // linkage_annotate) and re-scores the char-painting macro IoU — so the
    // trained-dict inference result is hard-verified even though the
    // iterative training itself has no SQL form (dict_train stays the one
    // rows-only query).
    QueryDef("dict_train_iou",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        val n = corpusSize(dir)
        val (lc, uc) = sharedTrainedDicts(s, dir)
        if (exportEnabled) {
          exportTable(sharedDocs(s, dir).map(d => (d.doc_id, d.text))
            .toDF("doc_id", "text"), "ti_docs")
          exportTable(lc.toDF().toDF("section", "mention", "concept_id"), "ti_lc")
          exportTable(uc.toDF().toDF("section", "mention", "concept_id"), "ti_uc")
          exportTable(sharedGold(s, dir).toDF()
            .select(col("doc_id"), col("start"), col("end"), col("concept_id")), "ti_gold")
        }
        // r6 note: macroCharIou references pred in two plan subtrees, so
        // the inference evaluates twice INSIDE the one scoring action — an
        // eager localCheckpoint here was tried and measured SLOWER (9.1 s
        // vs 4.6-5.2 s graded): the duplicate evaluation runs in-stage
        // across otherwise-idle cores, while the checkpoint adds a serial
        // job barrier. Kept un-materialized deliberately.
        val pred = graft.operators.DictTrain.infer(sharedDocs(s, dir), lc, uc).toDF()
          .select(col("doc_id"), col("start"), col("end"), col("concept_id"))
        val (_, macroAvg) = Metrics.macroCharIou(pred, sharedGold(s, dir).toDF())
        Seq(("macro_char_iou_trained_dict", math.rint(macroAvg * 10000) / 10000))
          .toDF("metric", "value")
      },
      Some(s"""WITH p0 AS ((${annotateReplaySql("ti_docs", "ti_lc", "ti_uc")})),
             |p AS (SELECT doc_id AS doc, concept_id AS cid, "start" AS s, "end" AS e FROM p0),
             |g AS (SELECT doc_id AS doc, concept_id AS cid, "start" AS s, "end" AS e
             |  FROM read_parquet('$ExportDir/ti_gold/*.parquet')),
             |pp AS (SELECT DISTINCT doc, cid, pos FROM
             |  (SELECT doc, cid, unnest(range(s, e)) AS pos FROM p)),
             |gg AS (SELECT DISTINCT doc, cid, pos FROM
             |  (SELECT doc, cid, unnest(range(s, e)) AS pos FROM g)),
             |inter AS (SELECT cid, count(*) AS n FROM pp JOIN gg USING (doc, cid, pos) GROUP BY cid),
             |un AS (SELECT cid, count(*) AS n FROM
             |  (SELECT doc, cid, pos FROM pp UNION SELECT doc, cid, pos FROM gg) GROUP BY cid)
             |SELECT 'macro_char_iou_trained_dict' AS metric,
             |  round(avg(CAST(coalesce(inter.n, 0) AS DOUBLE) / un.n), 4) AS value
             |FROM un LEFT JOIN inter ON un.cid = inter.cid""".stripMargin)),

    // J4/U3 term-extension attribute table (process_data.py:360-417): the
    // 3-way Is-A ⋈ FSN join + word-set difference. Runs on the FIXED
    // k=500 terminology (a terminology-side operator, independent of the
    // corpus scale factor) so the DuckDB oracle — which regenerates the
    // deterministic Synth terminology in SQL and emits the closed-form
    // expected extensions — always matches.
    QueryDef("dict_term_extension",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        val k = 500
        graft.operators.TermExtension.termExtensions(
          s.createDataset(Synth.relationships(k)),
          s.createDataset(Synth.descriptions(k)))
      },
      Some("""WITH v AS (SELECT
             |  ['acute','chronic','severe','mild','recurrent','bilateral','persistent','intermittent','progressive','stable','diffuse','focal','congenital','degenerative','ischemic','benign','malignant','obstructive','superficial','residual','traumatic','postoperative','localized','generalized','secondary','primary','atypical','refractory','transient','subacute','latent','advanced'] AS adj,
             |  ['femur','wrist','shoulder','kidney','liver','spleen','colon','retina','larynx','humerus','ankle','thyroid','bladder','pancreas','sternum','clavicle','scapula','trachea','duodenum','patella','radius','ulna','tibia','fibula','cornea','maxilla','mandible','vertebra','aorta','ventricle','atrium','ureter'] AS anat,
             |  ['fracture','infection','lesion','stenosis','edema','hemorrhage','neoplasm','inflammation','occlusion','rupture','dislocation','hypertrophy','atrophy','fibrosis','necrosis','ulceration','abscess','contusion','laceration','thrombosis','aneurysm','calcification','degeneration','perforation','prolapse','erosion','dysplasia','effusion','granuloma','impingement','malformation','spasm'] AS nouns,
             |  ['finding','procedure','body structure'] AS hiers,
             |  ['left','right','upper','lower'] AS attrs),
             |c AS (SELECT i, (i*10007)%32768 AS idx FROM range(500) t(i)
             |      WHERE i%6=0 AND i%50<>49),
             |named AS (SELECT i,
             |  v.adj[1 + idx%32] || ' ' || v.anat[1 + (idx//32)%32] || ' ' || v.nouns[1 + idx//1024] AS name,
             |  v.hiers[1 + i%3] AS hier, v.attrs[1 + (i//6)%4] AS attr
             |  FROM c, v)
             |SELECT CAST(100003 + 16*i AS BIGINT) AS general_id,
             |  name || ' (' || hier || ')' AS general_name,
             |  CAST(100003 + 16*i + 8 AS BIGINT) AS specific_id,
             |  attr || ' ' || name || ' (' || hier || ')' AS specific_name,
             |  attr AS additional_word
             |FROM named""".stripMargin)),

    // W3/F18 attribute postprocess (mimic_postprocess_attributes.py:6-105):
    // gazetteer annotations re-examined in a prev/next-bounded ±20-char
    // window; mentions of a general concept preceded by an attribute word
    // are rewritten to the specific child (span extended over the word)
    // W3/F18 attribute postprocess. ORACLE (r4): docs, the gazetteer base
    // annotations and the attribute table are exported, and DuckDB replays
    // the ENTIRE rewrite in SQL — lag/lead prev/next bounds, the ±20-char
    // window, the same regex (RE2 ≡ Java here: ASCII corpus, \b/\S
    // ASCII-semantics, \Q..\E quoting), partial-word splitting, case-variant
    // side-word sets, first-candidate-wins in specific_id order, and the
    // trailing-whitespace-delta span extension. Validated against a literal
    // transcription on adversarial fixtures before wiring.
    QueryDef("linkage_postprocess",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        val n = corpusSize(dir)
        val k = numConcepts(n)
        val ds = sharedDocs(s, dir)
        // trained-dict scenario: the specific child terms are NOT in the
        // matching dictionary — the rewrite stage is what recovers them
        val baseDict = s.createDataset(
          Synth.dictionary(k, includeAttrChildren = false, includeAbbrs = false))
        val base = OverlapResolve.apply(DictionaryMatch.annotate(ds, baseDict))
        val att = graft.operators.TermExtension.termExtensions(
          s.createDataset(Synth.relationships(k)),
          s.createDataset(Synth.descriptions(k)))
        if (exportEnabled) {
          exportTable(ds.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), "pp_docs")
          exportTable(base.toDF(), "pp_base")
          exportTable(att.select(col("general_id"), col("specific_id"),
            col("additional_word")), "pp_att")
        }
        graft.operators.AttributeRewrite.apply(ds, base, att).toDF()
      },
      Some(s"""WITH an AS (SELECT a."start" AS s, a."end" AS e, a.*, d.text,
             |    lag(a."end") OVER (PARTITION BY a.doc_id ORDER BY a."start") AS prev_end,
             |    lead(a."start") OVER (PARTITION BY a.doc_id ORDER BY a."start") AS next_start
             |  FROM read_parquet('$ExportDir/pp_base/*.parquet') a
             |  JOIN read_parquet('$ExportDir/pp_docs/*.parquet') d USING (doc_id)),
             |w AS (SELECT *,
             |    array_slice(text, least(s, length(text)) + 1, least(e, length(text))) AS atxt,
             |    greatest(0, least(CASE WHEN prev_end IS NULL THEN greatest(0, s - 20)
             |                           ELSE greatest(prev_end + 1, s - 20) END, length(text))) AS lo
             |  FROM an),
             |w2 AS (SELECT *,
             |    greatest(lo, least(CASE WHEN next_start IS NULL THEN least(e + 20, length(text) - 1)
             |                            ELSE least(next_start - 1, e + 20) END, length(text))) AS hi
             |  FROM w),
             |m AS (SELECT *, regexp_extract(array_slice(text, lo + 1, hi),
             |    '(?:\\b\\S+\\s*){0,2}\\Q' || atxt || '\\E\\b(?:\\s*\\S+\\s*?){0,2}', 0) AS matched
             |  FROM w2),
             |tb AS (SELECT *, CASE WHEN matched = '' OR atxt = '' THEN NULL
             |    ELSE array_slice(matched, 1, greatest(strpos(matched, atxt) - 1, 0)) END AS txt_before
             |  FROM m),
             |wb AS (SELECT *, CASE WHEN txt_before IS NULL THEN NULL
             |    ELSE list_filter(string_split_regex(txt_before, '\\s+'), x -> x <> '') END AS words_before
             |  FROM tb),
             |cand AS (SELECT wb.*, att.specific_id AS sid, att.additional_word AS word,
             |    [word, upper(array_slice(word, 1, 1)) || array_slice(word, 2, length(word)), upper(word)]
             |      || CASE WHEN word IN ('left', 'right')
             |              THEN [upper(array_slice(word, 1, 1)), word || '-sided'] ELSE [] END AS sides
             |  FROM wb JOIN read_parquet('$ExportDir/pp_att/*.parquet') att
             |    ON wb.concept_id = att.general_id
             |  WHERE words_before IS NOT NULL),
             |hits AS (SELECT *,
             |    list_filter(range(1, len(words_before) + 1),
             |      k -> list_contains(sides, words_before[CAST(k AS INT)])) AS ind
             |  FROM cand),
             |firsthit AS (SELECT *, row_number() OVER (PARTITION BY doc_id, s, e ORDER BY sid) AS rn
             |  FROM hits WHERE len(ind) > 0),
             |rewritten AS (SELECT doc_id, s AS s0, e AS e0,
             |    CASE WHEN ind[1] = len(words_before)
             |         THEN s - length(words_before[len(words_before)])
             |                - (length(txt_before) - length(regexp_replace(txt_before, '\\s+$$', '')))
             |         ELSE s END AS ns,
             |    sid AS nc
             |  FROM firsthit WHERE rn = 1)
             |SELECT a.doc_id, CAST(coalesce(r.ns, a."start") AS INT) AS "start",
             |  a."end", coalesce(r.nc, a.concept_id) AS concept_id,
             |  a.section, a.dict_entry
             |FROM read_parquet('$ExportDir/pp_base/*.parquet') a
             |LEFT JOIN rewritten r
             |  ON a.doc_id = r.doc_id AND a."start" = r.s0 AND a."end" = r.e0""".stripMargin)),

    // A11 remove/add-lists classification (3rd Place/remove-add-lists.py):
    // two span sets classified same/included/intersect/no per term, with
    // corpus occurrence counts and curation ratios. DERIVED-DATA ORACLE
    // (r3): both span sets and the doc texts are pure arithmetic over the
    // driver's orders table, constructed so every classification class is
    // exercised and the expected tallies/occurrences have a closed form the
    // DuckDB oracle regenerates — the operator's cogroup classification and
    // rolling-hash occurrence scan run for real. The synth-corpus form
    // (gold vs inference spans) stays pinned by SpanCompareContextSpec.
    QueryDef("span_compare_terms",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val o = s.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey").as("k"))
        val base = o.select(col("k"),
            concat(lit("d"), col("k") % 50).as("doc_id"),
            (row_number().over(
              Window.partitionBy(col("k") % 50).orderBy(col("k"))) * 40L).as("sa"),
            element_at(array(lit("alpha"), lit("bravo"), lit("charlie")),
              (col("k") % 3).cast("int") + 1).as("term"),
            (col("k") % 4).as("cls"))
          .withColumn("ea", col("sa") + 4 + col("k") % 5)
          // r6: materialize once — a, b AND the term-occurrence union all
          // derive from this windowed frame; un-checkpointed, the orders
          // window recomputed ~5× across the query's actions (guide §5)
          .localCheckpoint()
        val a = base.select(col("doc_id"), col("sa").cast("int").as("start"),
          col("ea").cast("int").as("end"), col("term"))
        // per class: 0 same span, 1 strictly contained, 2 right-shifted
        // overlap, 3 disjoint (slots are 40 apart, so rows never interact)
        val b = base.select(col("doc_id"),
          when(col("cls") === 0, col("sa")).when(col("cls") === 1, col("sa") + 1)
            .when(col("cls") === 2, col("sa") + 2).otherwise(col("sa") + 20)
            .cast("int").as("start"),
          when(col("cls") === 0, col("ea")).when(col("cls") === 1, col("ea") - 1)
            .when(col("cls") === 2, col("ea") + 2).otherwise(col("sa") + 24)
            .cast("int").as("end"),
          col("term"))
        val docsDs = o.select((col("k") % 50).as("dn")).distinct().as[Long].map { dn =>
          Doc(s"d$dn", Seq(DocSpan("text",
            "alpha bravo charlie " * (5 + dn % 7).toInt, "", 0)))
        }
        graft.operators.SpanCompare.removeAddSummary(docsDs, a, b)
      },
      Some("""WITH r AS (SELECT o_orderkey AS k,
             |    ['alpha','bravo','charlie'][CAST(o_orderkey % 3 AS INT) + 1] AS term,
             |    o_orderkey % 4 AS cls FROM orders),
             |tal AS (SELECT term,
             |    CAST(count(*) FILTER (cls IN (0,1,2)) + count(*) FILTER (cls IN (1,2)) AS BIGINT) AS "both",
             |    CAST(count(*) FILTER (cls = 3) AS BIGINT) AS only_a,
             |    CAST(count(*) FILTER (cls = 3) AS BIGINT) AS only_b,
             |    CAST(count(*) FILTER (cls = 0) AS BIGINT) AS "same",
             |    CAST(2 * count(*) FILTER (cls = 1) AS BIGINT) AS included,
             |    CAST(2 * count(*) FILTER (cls = 2) AS BIGINT) AS "intersect"
             |  FROM r GROUP BY term),
             |occ AS (SELECT CAST(sum(5 + dn % 7) AS BIGINT) AS occurrences
             |  FROM (SELECT DISTINCT o_orderkey % 50 AS dn FROM orders))
             |SELECT t.term, t."both", t.only_a, t.only_b, t."same", t.included,
             |  t."intersect", o.occurrences,
             |  round(t."both" / nullif(CAST(t.only_b AS DOUBLE), 0), 4) AS to_remove,
             |  round((o.occurrences - t."both") / nullif(CAST(t.only_b AS DOUBLE), 0), 4) AS to_remove2,
             |  round(t."both" / nullif(CAST(t.only_a AS DOUBLE), 0), 4) AS to_add,
             |  round(o.occurrences / nullif(CAST(t.only_a + t."both" AS DOUBLE), 0), 4) AS to_add2,
             |  CAST(length(t.term) AS INT) AS term_length
             |FROM tal t CROSS JOIN occ o""".stripMargin)),

    // F13/F14 mention context windows + section-conditioned templates.
    // ORACLE (r4): doc texts + the real inference annotations are exported
    // and DuckDB replays the word-index window arithmetic (whitespace
    // split, partial-word counting included) and the section template in
    // SQL. Offset parity holds because UTF-16 units ≡ codepoints on this
    // BMP-only corpus and Java \s ≡ RE2 \s on ASCII whitespace.
    QueryDef("linkage_context",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        val anns = annotate(s, dir)
        if (exportEnabled) {
          exportTable(sharedDocs(s, dir).map(d => (d.doc_id, d.text))
            .toDF("doc_id", "text"), "ctx_docs")
          exportTable(anns.toDF().select(col("doc_id"), col("start"),
            col("end"), col("concept_id"), col("section")), "ctx_anns")
        }
        graft.operators.Context.mentionContexts(sharedDocs(s, dir), anns)
      },
      Some(s"""WITH d AS (SELECT doc_id, text FROM read_parquet('$ExportDir/ctx_docs/*.parquet')),
             |an AS (SELECT * FROM read_parquet('$ExportDir/ctx_anns/*.parquet')),
             |j AS (SELECT an.doc_id, an."start", an."end", an.concept_id, an.section, d.text
             |  FROM an JOIN d USING (doc_id)),
             |w AS (SELECT doc_id, "start", "end", concept_id, section,
             |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words,
             |  len(list_filter(string_split_regex(array_slice(text, 1, "start"), '\\s+'), x -> x <> '')) AS wb,
             |  len(list_filter(string_split_regex(array_slice(text, "end" + 1, length(text)), '\\s+'), x -> x <> '')) AS wa,
             |  array_slice(text, "start" + 1, "end") AS term
             |  FROM j),
             |c AS (SELECT doc_id, "start", "end", concept_id, section, term,
             |  array_to_string(array_slice(words, greatest(0, wb - 5) + 1,
             |    least(len(words), len(words) - wa - 1 + 5 + 1)), ' ') AS context
             |  FROM w)
             |SELECT doc_id, "start", "end", concept_id, section, term, context,
             |  CASE WHEN section = 'allergies' THEN 'Allergy to ' || term || ' finding'
             |       WHEN section = 'chief complaint' THEN 'Disorder of ' || term
             |       WHEN section = 'major surgical or invasive procedure' THEN term || ' procedure'
             |       ELSE term END AS templated
             |FROM c""".stripMargin)),

    // A6 per-name section stats with the 'default' rollup and the
    // default-map argmax, FLAT oracle-sortable shape (the round-2 MapType
    // output could not be hashed by the driver's columnar compare —
    // VERDICT r2 wrong-1). Derived-data oracle: labeled (name, section,
    // concept) rows are index arithmetic over lineitem; the grain counts,
    // rollup rows and tie-broken argmax are plain SQL. The corpus MapType
    // form (`dictSectionStats`) is pinned consistent with this flat form
    // in SpanCompareContextSpec.
    QueryDef("dict_section_stats",
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        graft.operators.DictTrain.sectionStatsFlat(li.select(
          concat(lit("n"), col("l_partkey") % 97).as("name"),
          concat(lit("s"), col("l_suppkey") % 7).as("section"),
          (col("l_orderkey") % 13).as("concept_id")))
      },
      Some("""WITH labeled AS (SELECT 'n' || (l_partkey % 97) AS name,
             |    's' || (l_suppkey % 7) AS section, l_orderkey % 13 AS concept_id
             |  FROM lineitem),
             |grain AS (SELECT name, section, concept_id,
             |    CAST(count(*) AS BIGINT) AS cnt FROM labeled GROUP BY 1, 2, 3),
             |defaults AS (SELECT name, 'default' AS section, concept_id,
             |    CAST(count(*) AS BIGINT) AS cnt FROM labeled GROUP BY 1, 3),
             |allr AS (SELECT * FROM grain UNION ALL SELECT * FROM defaults),
             |best AS (SELECT name, concept_id AS best_concept FROM (
             |  SELECT name, concept_id, row_number() OVER (PARTITION BY name
             |    ORDER BY cnt DESC, concept_id ASC) AS rn FROM defaults) WHERE rn = 1)
             |SELECT a.name, a.section, a.concept_id, a.cnt, b.best_concept
             |FROM allr a JOIN best b ON a.name = b.name""".stripMargin)),

    // corpus-path chunking (VERDICT r4 Next #6): the real synthetic-corpus
    // text through the C2/C3 splitter + merger at the operator's default
    // budgets (40/120), so the graded run times chunking on the natural
    // sentence-length distribution, not only the closed-form derived
    // families of `chunking` below. INPUTS-ONLY ORACLE: DuckDB replays the
    // whole operator from the exported doc text — sentence tiling
    // (boundary runs of .!?\n appended to the preceding span, whitespace-
    // only spans dropped), whitespace tokenization with offsets, the
    // cut-every-40-tokens split phase (cuts at sentence-LOCAL token starts:
    // a non-ws run crossing a sentence boundary restarts as a new token,
    // exactly like the engine's per-span scan), and the greedy ≤120-token
    // re-merge as a per-doc recursive CTE; chunk n_tokens is re-counted
    // over the merged span (piece sums would double-count runs that a
    // sentence boundary splits, e.g. "3.5").
    QueryDef("chunking_corpus",
      (s, dir) => {
        implicit val sp = s
        import s.implicits._
        exportTable(sharedDocs(s, dir).map(d => (d.doc_id, d.text))
          .toDF("doc_id", "text"), "ck_docs")
        graft.operators.Chunking.apply(sharedDocs(s, dir)).toDF()
      },
      Some(s"""WITH RECURSIVE
             |ckd AS (SELECT doc_id, text FROM read_parquet('$ExportDir/ck_docs/*.parquet')),
             |sp0 AS (SELECT doc_id, piece, si,
             |    CAST(sum(length(piece)) OVER (PARTITION BY doc_id ORDER BY si
             |      ROWS UNBOUNDED PRECEDING) - length(piece) AS INT) AS ss
             |  FROM (SELECT doc_id,
             |      unnest(regexp_extract_all(text, '[^.!?\\n]*[.!?\\n]+|[^.!?\\n]+')) AS piece,
             |      unnest(range(1, len(regexp_extract_all(text, '[^.!?\\n]*[.!?\\n]+|[^.!?\\n]+')) + 1)) AS si
             |    FROM ckd)),
             |snt AS (SELECT doc_id, si, ss, ss + length(piece) AS se FROM sp0
             |  WHERE regexp_matches(piece, '[^ \\t\\n\\r\\x0B\\f]')),
             |wsg AS (SELECT doc_id, seg, wi,
             |    CAST(sum(length(seg)) OVER (PARTITION BY doc_id ORDER BY wi
             |      ROWS UNBOUNDED PRECEDING) - length(seg) AS INT) AS wts
             |  FROM (SELECT doc_id,
             |      unnest(regexp_extract_all(text, '[^ \\t\\n\\r\\x0B\\f]+|[ \\t\\n\\r\\x0B\\f]+')) AS seg,
             |      unnest(range(1, len(regexp_extract_all(text, '[^ \\t\\n\\r\\x0B\\f]+|[ \\t\\n\\r\\x0B\\f]+')) + 1)) AS wi
             |    FROM ckd)),
             |wt AS MATERIALIZED (SELECT doc_id, wts, wts + length(seg) AS wte
             |  FROM wsg WHERE regexp_matches(seg, '^[^ \\t\\n\\r\\x0B\\f]')),
             |stk AS (SELECT s.doc_id, s.si, s.ss, s.se, greatest(w.wts, s.ss) AS lts,
             |    row_number() OVER (PARTITION BY s.doc_id, s.si ORDER BY w.wts) AS rnk
             |  FROM snt s JOIN wt w ON s.doc_id = w.doc_id AND w.wts < s.se AND w.wte > s.ss),
             |bounds AS (
             |  SELECT doc_id, si, ss AS b FROM snt
             |  UNION ALL
             |  SELECT doc_id, si, lts FROM stk WHERE rnk > 1 AND (rnk - 1) % 40 = 0),
             |pieces AS (SELECT doc_id, b AS ps,
             |    coalesce(lead(b) OVER (PARTITION BY doc_id, si ORDER BY b), se) AS pe,
             |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY b) AS INT) AS k
             |  FROM (SELECT bo.doc_id, bo.si, bo.b, s.se
             |    FROM bounds bo JOIN snt s ON bo.doc_id = s.doc_id AND bo.si = s.si)),
             |pt AS (SELECT p.doc_id, p.k, p.ps, p.pe,
             |    CAST(count(w.wts) AS INT) AS t
             |  FROM pieces p LEFT JOIN wt w
             |    ON p.doc_id = w.doc_id AND w.wts < p.pe AND w.wte > p.ps
             |  GROUP BY p.doc_id, p.k, p.ps, p.pe),
             |parr AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS INT) AS n,
             |    list(ps ORDER BY k) AS pss, list(pe ORDER BY k) AS pes,
             |    list(t ORDER BY k) AS tts
             |  FROM pt GROUP BY doc_id),
             |mrg(doc_id, k, ct, brk) AS (
             |  SELECT doc_id, 1, tts[1], true FROM parr WHERE n >= 1
             |  UNION ALL
             |  SELECT m.doc_id, m.k + 1,
             |    CASE WHEN m.ct + a.tts[m.k + 1] > 120
             |         THEN a.tts[m.k + 1] ELSE m.ct + a.tts[m.k + 1] END,
             |    m.ct + a.tts[m.k + 1] > 120
             |  FROM mrg m JOIN parr a USING (doc_id) WHERE m.k < a.n),
             |cid AS (SELECT doc_id, k,
             |    CAST(sum(CASE WHEN brk THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY k ROWS UNBOUNDED PRECEDING) AS INT) - 1 AS chunk_idx
             |  FROM mrg),
             |ch2 AS (SELECT c.doc_id, c.chunk_idx,
             |    min(a.pss[c.k]) AS cs, max(a.pes[c.k]) AS ce
             |  FROM cid c JOIN parr a USING (doc_id)
             |  GROUP BY c.doc_id, c.chunk_idx)
             |SELECT c.doc_id, c.chunk_idx, CAST(c.cs AS INT) AS start,
             |  CAST(c.ce AS INT) AS "end",
             |  CAST(count(w.wts) AS INT) AS n_tokens
             |FROM ch2 c LEFT JOIN wt w
             |  ON c.doc_id = w.doc_id AND w.wts < c.ce AND w.wte > c.cs
             |GROUP BY c.doc_id, c.chunk_idx, c.cs, c.ce""".stripMargin)),

    // chunking relation (C2 sentence split + C3 greedy token-budget merge)
    // over arithmetically derived doc texts, so every chunk boundary has a
    // closed form the DuckDB oracle replays: per doc (one per customer row)
    // all sentences carry the same token count t ≤ maxTokens (split phase
    // is a no-op here — it stays exercised in GraphChunkingSpec on the
    // synth corpus) and the greedy merge therefore packs exactly
    // ⌊mergeTokens/t⌋ sentences per chunk. Sentence layout: unit
    // "tok "·(t−1)+"tok. " of length 4t+1; sentences() assigns S_0=[0,4t)
    // and S_k=[k(4t+1)−1,(k+1)(4t+1)−1) (each later sentence carries the
    // preceding separator space), and the '. ' between sentences keeps
    // whitespace-token runs from fusing across merged spans. The REAL
    // chunkSpans operator runs Spark-side; only the expectation is
    // closed-form.
    // r4 adds a second derived family ('s' docs) whose sentences carry
    // T = 8m > maxTokens tokens (m ∈ {2,3}), so the SPLIT phase cuts every
    // sentence into m exact-budget pieces of 8 tokens before the greedy
    // merge packs 3 pieces (24 ≤ 25) per chunk — closing the r3 gap where
    // the oracle-checked path exercised only the merge phase (VERDICT r3
    // missing #3). Piece boundaries have the closed form below (validated
    // against a literal transcription of chunkSpans): sentence k ≥ 1 starts
    // at k(4T+1)−1 carrying the preceding separator space; piece q of
    // sentence k starts at +1+32q (the split cuts at the 9th token start).
    QueryDef("chunking",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        val mergeDocs = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey")).as[Long].map { ck =>
            val t = 1 + (ck % 8).toInt
            val nSent = 5 + (ck % 17).toInt
            val unit = "tok " * (t - 1) + "tok. "
            Doc(s"c$ck", Seq(DocSpan("text", unit * nSent, "", 0)))
          }
        val splitDocs = s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey")).as[Long].map { ck =>
            val m = 2 + (ck % 2).toInt
            val t = 8 * m // every sentence needs the split phase
            val nSent = 3 + (ck % 5).toInt
            val unit = "tok " * (t - 1) + "tok. "
            Doc(s"s$ck", Seq(DocSpan("text", unit * nSent, "", 0)))
          }
        graft.operators.Chunking.apply(mergeDocs.union(splitDocs),
          maxTokens = 8, mergeTokens = 25).toDF()
      },
      Some("""WITH d AS (SELECT c_custkey AS ck, 1 + c_custkey % 8 AS t,
             |  5 + c_custkey % 17 AS ns FROM customer),
             |p AS (SELECT ck, t, ns, 25 // t AS kg FROM d),
             |c AS (SELECT 'c' || ck AS doc_id, t, ns, kg,
             |  unnest(range(0, CAST(ceil(ns / CAST(kg AS DOUBLE)) AS BIGINT))) AS j FROM p)
             |SELECT doc_id, CAST(j AS INT) AS chunk_idx,
             |  CAST(CASE WHEN j = 0 THEN 0 ELSE j * kg * (4 * t + 1) - 1 END AS INT) AS start,
             |  CAST(least((j + 1) * kg, ns) * (4 * t + 1) - 1 AS INT) AS "end",
             |  CAST((least((j + 1) * kg, ns) - j * kg) * t AS INT) AS n_tokens
             |FROM c
             |UNION ALL
             |SELECT doc_id, CAST(j AS INT) AS chunk_idx,
             |  CAST(CASE WHEN p0 // m = 0 THEN 32 * (p0 % m)
             |    ELSE (p0 // m) * (4 * T + 1) - 1 +
             |      CASE WHEN p0 % m = 0 THEN 0 ELSE 1 + 32 * (p0 % m) END
             |  END AS INT) AS start,
             |  CAST(CASE WHEN p1 // m = 0 THEN 32 * (p1 % m + 1)
             |    ELSE (p1 // m) * (4 * T + 1) + 32 * (p1 % m + 1)
             |  END AS INT) AS "end",
             |  CAST(8 * (p1 - p0 + 1) AS INT) AS n_tokens
             |FROM (
             |  SELECT doc_id, m, T, j, 3 * j AS p0, least(3 * j + 3, N) - 1 AS p1
             |  FROM (SELECT 's' || ck AS doc_id, m, 8 * m AS T, m * ns AS N,
             |      unnest(range(0, CAST(ceil(m * ns / 3.0) AS BIGINT))) AS j
             |    FROM (SELECT c_custkey AS ck, 2 + c_custkey % 2 AS m,
             |        3 + c_custkey % 5 AS ns FROM customer)))""".stripMargin)),

    // C4 BIO label alignment (get_labels, 2nd Place/src/data.py:43-53):
    // gold char spans → per-token BIO labels via offset bisect, classes
    // from the concept hierarchy. ORACLE: docs + gold exported; DuckDB
    // re-derives the token starts (alnum-run scan over per-char lists),
    // li/ri as counts of starts below each boundary, and the reference's
    // sequential last-span-wins writes as an argmax over span order — an
    // independent formulation of the same semantics. Output: the labeled
    // (non-O) tokens.
    QueryDef("bio_labels",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        if (exportEnabled) {
          exportTable(sharedDocs(s, dir).map(d => (d.doc_id, d.text))
            .toDF("doc_id", "text"), "bl_docs")
          exportTable(sharedGold(s, dir).toDF(), "bl_gold")
        }
        graft.operators.Bio.bioLabels(sharedDocs(s, dir),
            sharedGold(s, dir).toDF().withColumn("cls", conceptClsExpr))
          .filter(col("label") =!= "O")
      },
      Some(s"""WITH ${bioLabelCtes("bl_docs", "bl_gold")}
             |SELECT doc_id, ti, tstart, tend, label FROM lab WHERE rn = 1""".stripMargin)),

    // C5 BIO decode back to mentions (fix_spans + join_classes_bio,
    // 2nd Place/submission/infer.py:83-125): the C4 labels with token ends
    // extended one char (the tokenizer-offsets-include-following-space
    // shape that makes the strip adjustment live), O's dropped, B-headed
    // runs merged while char gaps ≤ 2, offsets shrunk to the stripped
    // surface. ORACLE: same inputs-only label re-derivation as bio_labels,
    // then the merge sweep as a per-doc recursive CTE over list-packed
    // spans and the strip arithmetic in ltrim/trim form.
    QueryDef("bio_decode",
      (s, dir) => {
        implicit val sp: SparkSession = s
        import s.implicits._
        if (exportEnabled) {
          exportTable(sharedDocs(s, dir).map(d => (d.doc_id, d.text))
            .toDF("doc_id", "text"), "bd_docs")
          exportTable(sharedGold(s, dir).toDF(), "bd_gold")
        }
        // r6: labels + end-extension + decode FUSED into one per-doc
        // cogroup (Bio.labelDecodeFused) — the unfused chain paid two doc
        // cogroup shuffles plus a doc-length join (a third doc pass) for a
        // computation that is per-doc end to end. Output pinned identical
        // to the chain by BioGmlOffsetSpec; the oracle SQL is unchanged.
        graft.operators.Bio.labelDecodeFused(sharedDocs(s, dir),
          sharedGold(s, dir).toDF().withColumn("cls", conceptClsExpr))
      },
      Some(s"""WITH RECURSIVE ${bioLabelCtes("bd_docs", "bd_gold")},
             |lbl AS (SELECT l.doc_id, l.tstart,
             |    least(l.tend + 1, b.n) AS tend, l.label
             |  FROM lab l JOIN bld b USING (doc_id) WHERE l.rn = 1),
             |nz AS MATERIALIZED (SELECT doc_id, tstart, tend, label,
             |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tstart) AS INT) AS k
             |  FROM lbl),
             |nzarr AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS INT) AS kn,
             |    list(tstart ORDER BY k) AS ss, list(tend ORDER BY k) AS es,
             |    list(label ORDER BY k) AS ls
             |  FROM nz GROUP BY doc_id),
             |mg(doc_id, k, head) AS (
             |  SELECT doc_id, 1, 1 FROM nzarr WHERE kn >= 1
             |  UNION ALL
             |  SELECT m.doc_id, m.k + 1,
             |    CASE WHEN (a.ss[m.k + 1] - a.es[m.k]) IN (0, 1, 2)
             |        AND substr(a.ls[m.head], 1, 1) = 'B'
             |        AND substr(a.ls[m.k + 1], 1, 1) = 'I'
             |        AND substr(a.ls[m.head], 3) = substr(a.ls[m.k + 1], 3)
             |      THEN m.head ELSE m.k + 1 END
             |  FROM mg m JOIN nzarr a USING (doc_id) WHERE m.k < a.kn),
             |grp AS (SELECT m.doc_id, m.head,
             |    max(m.k) AS klast FROM mg m GROUP BY m.doc_id, m.head),
             |raw AS (SELECT g.doc_id, a.ss[g.head] AS s0, a.es[g.klast] AS e0,
             |    substr(a.ls[g.head], 3) AS cls
             |  FROM grp g JOIN nzarr a USING (doc_id)),
             |st AS (SELECT r.doc_id, r.s0, r.e0, r.cls,
             |    array_slice(b.text, r.s0 + 1, r.e0) AS t, b.text
             |  FROM raw r JOIN bld b USING (doc_id)),
             |ws AS (SELECT ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12) AS cs),
             |adj AS (SELECT doc_id,
             |    CAST(s0 + length(t) - length(ltrim(t, cs)) AS INT) AS "start",
             |    CAST(s0 + length(t) - length(ltrim(t, cs)) + length(trim(t, cs)) AS INT) AS "end",
             |    cls, text
             |  FROM st CROSS JOIN ws)
             |SELECT doc_id, "start", "end",
             |  array_slice(text, "start" + 1, "end") AS term, cls
             |FROM adj""".stripMargin))
  )

  /** Span class from the synth concept id — hierarchy(i) over
    * conceptId(i) = 100003 + 16i (fixtures/Synth.scala), the
    * add_concept_class analog (`2nd Place/src/data.py:20-38`). */
  private def conceptClsExpr: org.apache.spark.sql.Column =
    expr("""CASE CAST(((concept_id - 100003) div 16) % 3 AS INT)
           |  WHEN 0 THEN 'finding' WHEN 1 THEN 'procedure'
           |  ELSE 'body structure' END""".stripMargin)

  /** Shared bio_labels oracle CTE chain over exported docs/gold tables:
    * ends in `lab(doc_id, ti, tstart, tend, label, rn)` where rn = 1 picks
    * the last-written (max span order) label per token. Tokens are maximal
    * [a-zA-Z0-9] runs (ASCII corpus — the single-char BETWEEN comparisons
    * are exact). */
  private def bioLabelCtes(docsT: String, goldT: String): String =
    s"""bld AS MATERIALIZED (SELECT doc_id, text, length(text) AS n
       |  FROM read_parquet('$ExportDir/$docsT/*.parquet')),
       |tkb AS MATERIALIZED (SELECT doc_id,
       |    list_filter(range(0, n), p ->
       |      (text[p+1] BETWEEN '0' AND '9' OR lower(text[p+1]) BETWEEN 'a' AND 'z')
       |      AND (p = 0 OR NOT (text[p] BETWEEN '0' AND '9' OR lower(text[p]) BETWEEN 'a' AND 'z'))) AS starts,
       |    list_filter(range(0, n), p ->
       |      (text[p+1] BETWEEN '0' AND '9' OR lower(text[p+1]) BETWEEN 'a' AND 'z')
       |      AND (p = n - 1 OR NOT (text[p+2] BETWEEN '0' AND '9' OR lower(text[p+2]) BETWEEN 'a' AND 'z'))) AS lasts
       |  FROM bld),
       |tk AS (SELECT doc_id,
       |    CAST(unnest(range(0, len(starts))) AS INT) AS ti,
       |    CAST(unnest(starts) AS INT) AS tstart,
       |    CAST(unnest(lasts) + 1 AS INT) AS tend
       |  FROM tkb),
       |gs0 AS (SELECT doc_id, "start" AS s, "end" AS e,
       |    CASE CAST(((concept_id - 100003) // 16) % 3 AS INT)
       |      WHEN 0 THEN 'finding' WHEN 1 THEN 'procedure'
       |      ELSE 'body structure' END AS cls
       |  FROM read_parquet('$ExportDir/$goldT/*.parquet')),
       |gsp AS (SELECT doc_id, s, e, cls,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY s, e, cls) AS ord
       |  FROM gs0),
       |gli AS (SELECT g.doc_id, g.cls, g.ord,
       |    len(list_filter(t.starts, x -> x < g.s)) AS li,
       |    len(list_filter(t.starts, x -> x < g.e)) AS ri
       |  FROM gsp g JOIN tkb t USING (doc_id)),
       |lab AS (SELECT tk.doc_id, tk.ti, tk.tstart, tk.tend,
       |    CASE WHEN tk.ti = gl.li THEN 'B-' || gl.cls ELSE 'I-' || gl.cls END AS label,
       |    row_number() OVER (PARTITION BY tk.doc_id, tk.ti ORDER BY gl.ord DESC) AS rn
       |  FROM tk JOIN gli gl ON tk.doc_id = gl.doc_id
       |    AND (tk.ti = gl.li OR (tk.ti > gl.li AND tk.ti < gl.ri)))""".stripMargin

  /** Distributed pairwise-F1 gate (metric M7 / BASELINE.json line 1).
    * The mention-level pair universe grows superlinearly with the corpus;
    * beyond `maxUniversePairs` it is DETERMINISTICALLY sampled by pair hash
    * (an unbiased estimate of the same P/R/F1 — every pair keeps equal
    * inclusion probability regardless of its block). Inactive at the
    * graded scale factors. */
  val maxUniversePairs: Long = 50000000L

  def pipelineF1(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import s.implicits._
    val n = corpusSize(dir)
    val g = sharedGold(s, dir)
    val result = sharedRun(s, dir)
    val mKeys = result.blockKeys.filter(col("id").startsWith("m:"))
    // r6 (guide §1.2): the sampling decision needs only to know the
    // universe is UNDER the cap — a cheap per-key frequency sum bounds the
    // pre-dedup pair bag (Σ freq·(freq−1)/2 over capped keys ≥ the
    // distinct pair count), so when the bound clears the cap the pair
    // table is never materialized or counted: the judged aggregation
    // consumes it fused in one job. Equivalence: bound ≤ cap ⟹
    // nPairs ≤ cap ⟹ the old path was unsampled too; above the bound we
    // fall back to the exact persist+count+maybe-sample path unchanged.
    val hotKeyCap = 1000
    // decimal(38,0) accumulation (the CC-signature trick): a plain long sum
    // over ~1e13+ capped keys could wrap negative and silently take the
    // unsampled shortcut at exactly the scale where sampling matters
    val pairBagBound = BigDecimal(Blocking.keyFrequencies(mKeys)
      .filter(col("freq") <= hotKeyCap)
      .agg(coalesce(sum(expr("freq * (freq - 1) div 2").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")))
      .head().getDecimal(0))
    val (universe, universeAllOpt, nPairsKnown) =
      if (pairBagBound <= BigDecimal(maxUniversePairs))
        // bound ≤ 50M here, so the long conversion is exact
        (Blocking.candidatePairs(mKeys, hotKeyCap), None, pairBagBound.toLong)
      else {
        val universeAll = Blocking.candidatePairs(mKeys, hotKeyCap)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPairs = universeAll.count()
        val u =
          if (nPairs <= maxUniversePairs) universeAll
          else universeAll.filter(
            pmod(xxhash64(col("a"), col("b")), lit(nPairs / maxUniversePairs + 1)) === 0)
        (u, Some(universeAll), nPairs)
      }
    val labels = g.map(x => (s"m:${x.doc_id}:${x.start}:${x.end}", x.concept_id))
      .toDF("id", "cid")
    // end-to-end oracle exports (Verify only): mention norms (the oracle
    // re-derives the blocking universe from them — r5), gold labels, and
    // the engine's cluster assignments, re-scored by plain pair-counting
    // SQL (see the linkage_pairwise_f1 def). The SQL replays the FULL
    // universe, so exporting while the hash-sampler is active would be a
    // silent oracle mismatch — assert it never is at verified scales.
    if (exportEnabled) {
      require(nPairsKnown <= maxUniversePairs,
        s"linkage_pairwise_f1 oracle assumes the unsampled universe but " +
          s"$nPairsKnown pairs (or bag bound) > $maxUniversePairs — " +
          "verified scale factors must stay below the sampler")
      val (dd, gg) = sharedCorpus(s, dir)
      exportTable(LinkagePipeline.mentionsFromSpans(dd, gg).toDF().select(
        concat(lit("m:"), col("doc_id"), lit(":"), col("start"), lit(":"),
          col("end")).as("id"), col("norm")), "f1_mentions")
    }
    exportTable(labels, "f1_labels")
    exportTable(result.assignments.toDF("id", "component"), "f1_assign")
    // r6 (guide §2.4): labels and assignments are joined ONCE into a
    // per-mention info table, then attached to the pair universe per side —
    // 3 shuffle joins instead of 4. Inner-join semantics unchanged: every
    // universe id is a gold mention (the universe derives from the gold
    // mention keys), so each id carries exactly one label and one
    // assignment either way.
    val nodeInfo = labels
      .join(result.assignments.toDF("id", "component"), "id")
    val ja = nodeInfo.toDF("a", "cid_a", "comp_a")
    val jb = nodeInfo.toDF("b", "cid_b", "comp_b")
    val judged = universe.join(ja, "a").join(jb, "b")
      .select(
        (col("cid_a") === col("cid_b")).as("gold"),
        (col("comp_a") === col("comp_b")).as("pred"))
      .groupBy()
      .agg(
        sum(when(col("gold") && col("pred"), 1).otherwise(0)).as("tp"),
        sum(when(!col("gold") && col("pred"), 1).otherwise(0)).as("fp"),
        sum(when(col("gold") && !col("pred"), 1).otherwise(0)).as("fn"),
        count(lit(1)).as("n_pairs"))
      .head()
    universeAllOpt.foreach(_.unpersist())
    val tp = judged.getLong(0).toDouble
    val fp = judged.getLong(1).toDouble
    val fn = judged.getLong(2).toDouble
    val prec = if (tp + fp == 0) 0.0 else tp / (tp + fp)
    val rec = if (tp + fn == 0) 0.0 else tp / (tp + fn)
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    Seq((r4(prec), r4(rec), r4(f1), judged.getLong(3)))
      .toDF("precision", "recall", "f1", "n_pairs")
  }

  /** Seeded field hash of the span checksum: 31-polynomial with the seed
    * folded in as a leading pseudo-char, finalized by the same
    * xorshift64*-style multiply-fold as `TextFns.simGramHash` — chosen (r4,
    * replacing murmur) because every step is exactly replayable in SQL,
    * which is what lets the span-invariant query carry a DuckDB oracle. */
  def fieldHash(s: String, seed: Int): Long = {
    var h = 1125899906842597L * 31 + seed
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    val m = h * 2685821657736338717L
    m ^ (m >>> 32)
  }

  def spanChecksum(d: Doc): Long =
    d.spans.zipWithIndex.foldLeft(0xcbf29ce484222325L) { case (h, (sp, i)) =>
      var x = h
      x = (x ^ fieldHash(sp.kind, 1)) * 0x100000001b3L
      x = (x ^ fieldHash(sp.text, 2)) * 0x100000001b3L
      x = (x ^ fieldHash(sp.media_ref, 3)) * 0x100000001b3L
      (x ^ i.toLong) * 0x100000001b3L
    }
}
