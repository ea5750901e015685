package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gfunctions._
import graft.fixtures.PagesGen
import graft.model.{Model, PredicateSpec}
import graft.pipeline.Dedupe

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys map 1:1 to SURVEY.md §2 operator rows; each has a DuckDB
  * `oracleSql` twin where SQL-expressible (column names aligned — the
  * driver sorts columns by name and hashes values). Non-SQL-expressible
  * pipelines (CC clustering) are rows-only checked, per the contract.
  */
object SparkEntry {

  /** The model fixture used by flagship/demo queries (FIXTURES.md F4). */
  val demoModel: Model = Model(
    bias = -13.0,
    weights = Map(
      "jw_text_norm" -> 6.0,
      "lev_text_norm" -> 9.0,
      "exact_lang" -> 0.4),
    threshold = 0.5,
    predicates = Seq(
      PredicateSpec("token", "text_norm"),
      PredicateSpec("simhash", "text", bands = 4)))

  /**
   * Memoized token-blocked part-name candidate pairs with names attached —
   * shared input of five heavy queries (q_block_pairs, q_score_pairs,
   * q_ngram_jaccard, q_affine_scores, q_threshold). The computation is
   * deterministic, so sharing the localCheckpoint snapshot changes nothing
   * about each query's output; without it every query re-ran the same
   * 47M-pair generation shuffle at sf0.1 (measured ~100 s each).
   */
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def attachedNamePairs(s: SparkSession, dir: String): DataFrame =
    pairCache.computeIfAbsent((s, dir), { _ =>
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val blocks = graft.block.Blocking.blockingMap(
        recs, Seq(PredicateSpec("token", "name")), "id")
      val pairs = graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 1000000)
      graft.pairs.PairGen.attachFields(pairs, recs, "id", Seq("name"))
        .localCheckpoint()
    })

  /** Flagship: full dedupe pipeline (block → score → CC cluster → entity
    * map) over a pages table derived deterministically from sf0.001
    * documents with injected near-duplicate variants. rows > 0 smoke. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.fromDocuments(spark, "/root/testdata/sf0.001")
    val result = Dedupe.run(spark, pages, Dedupe.Config(demoModel, collectMetrics = false))
    result.entityMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6 G9 / baseline agg sanity (hash aggregate, map-side combine)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.3 B2 + §2.4 J1-J3: token blocking + self-join pair-gen over
    // customer names; returns candidate pairs (the engine's core join)
    "q_block_pairs" -> ((s, dir) =>
      attachedNamePairs(s, dir).select(col("id1"), col("id2"))),

    // §2.5 C1: Jaro-Winkler + Levenshtein comparators on name pairs
    "q_score_pairs" -> ((s, dir) => {
      attachedNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          round(jaro_winkler(col("name_1"), col("name_2")), 6).as("jw"),
          levenshtein(col("name_1"), col("name_2")).cast("long").as("lev"))
    }),

    // §2.6 G1: exact-duplicate grouping over part rows
    "q_exact_dedup" -> ((s, dir) => {
      s.read.parquet(s"$dir/part.parquet")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("rep"))
        .orderBy(col("p_brand"), col("p_type"))
    }),

    // §2.6 G8: window top-k (gazetteer top-n analog) over orders
    "q_topk_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk").cast("long").as("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // flagship pipeline as a query (rows-only check: CC not SQL-expressible)
    "q_dedupe_pipeline" -> ((s, dir) => {
      val pages = PagesGen.fromDocuments(s, dir)
      Dedupe.run(s, pages, Dedupe.Config(demoModel, collectMetrics = false)).entityMap
        .select(col("url"), col("component"), round(col("confidence"), 6).as("confidence"))
        .orderBy(col("url"))
    }),

    // text-analysis pack over documents: token counts, lang-ID, quality
    "q_text_stats" -> ((s, dir) => {
      import graft.textops.TextOps
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextOps.bpeishCount(col("text")).cast("long").as("n_bpeish"),
          TextOps.langId(col("text")).as("lang_guess"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // exact dedup (hash-groupBy) over documents ∪ shifted-id copy
    "q_exact_text_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("id"), col("text"))
      val dup = d.select((col("id") + 1000000L).as("id"), col("text"))
      TextOps.exactDupes(d.unionByName(dup), "id", "text")
        .orderBy(col("id"))
    }),

    // char-trigram Jaccard similarity over blocked part-name pairs
    "q_ngram_jaccard" -> ((s, dir) => {
      import graft.textops.TextOps
      attachedNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          round(TextOps.ngramJaccard(col("name_1"), col("name_2"), 3), 6).as("jac3"))
    }),

    // brute-force cosine top-k ANN over the embeddings table
    "q_ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.ann.Ann.bruteForceTopK(emb, queries, 10)
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cos"), 5).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // MinHash-LSH near-dup pairs over derived pages (rows-only: hash fns)
    "q_minhash_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val pages = PagesGen.fromDocuments(s, dir)
        .select(xxhash64(col("url")).as("id"), col("text"))
      TextOps.minhashDupePairs(pages, "id", "text", jaccardThreshold = 0.6)
        .orderBy(col("id1"), col("id2"))
    }),

    // SimHash near-dup pairs (rows-only: hash fns)
    "q_simhash_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val pages = PagesGen.fromDocuments(s, dir)
        .select(xxhash64(col("url")).as("id"), col("text"))
      TextOps.simhashDupePairs(pages, "id", "text", bands = 4, maxHamming = 8)
        .orderBy(col("id1"), col("id2"))
    }),

    // gazetteer: variant pages (messy) matched against base pages (canon)
    "q_gazetteer" -> ((s, dir) => {
      val pages = PagesGen.fromDocuments(s, dir)
      val prepared = Dedupe.prepare(pages)
      val canon = prepared.filter(!col("url").endsWith("-v1"))
      val messy = prepared.filter(col("url").endsWith("-v1"))
      graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
          graft.pipeline.Gazetteer.Config(demoModel, nMatches = 1,
            maxCanonBlockSize = 200))
        .select(col("messy_id"), col("canon_id"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy(col("messy_id"))
    }),

    // multimodal plumbing: batched feature extraction over binary columns
    "q_media_features" -> ((s, dir) => {
      val media = graft.multimodal.Media.fakeMediaFromDocuments(s, dir)
      graft.multimodal.Media.extractFeatures(media)
        .select(col("media_id"), col("kind"),
          round(aggregate(col("features"), lit(0.0d), (a, x) => a + x), 6).as("feat_sum"),
          round(element_at(col("features"), 1), 6).as("feat0"))
        .orderBy(col("media_id"))
    }),

    // review queue (G7): window-ranked next-clusters over a synthetic
    // entity state derived from orders (component=custkey)
    "q_review_queue" -> ((s, dir) => {
      val state = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("id"), col("o_custkey").as("component"),
          round(col("o_totalprice") / 600000.0, 6).as("confidence"),
          lit(false).as("reviewed"), lit(false).as("accepted"),
          lit(null).cast("timestamp").as("checked_out_at"))
      graft.pipeline.Review.nextClusters(state, n = 10)
        .select(col("component"), round(col("min_confidence"), 6).as("min_confidence"),
          col("cluster_size"), col("review_rank").cast("long").as("review_rank"))
        .orderBy(col("review_rank"))
    }),

    // threshold selection (C11) from the score histogram — single row
    "q_threshold" -> ((s, dir) => {
      import s.implicits._
      val scored = attachedNamePairs(s, dir)
        .withColumn("score", lit(1.0) / (lit(1.0) +
          exp(-(lit(-8.0) + lit(9.0) * jaro_winkler(col("name_1"), col("name_2")) +
            lit(6.0) * levenshtein_sim(col("name_1"), col("name_2"))))))
      Seq(graft.score.Threshold.select(scored)).toDF("theta")
    }),

    // per-component HAC refinement (G3) over deterministic weak-bridge edges
    "q_hac_refine" -> ((s, dir) => {
      import s.implicits._
      val edges = Seq(
        (1L, 2L, 0.95), (3L, 4L, 0.95), (2L, 3L, 0.35), // bridged → splits
        (10L, 11L, 0.9), (11L, 12L, 0.85), (10L, 12L, 0.8)) // tight → holds
        .toDF("id1", "id2", "score")
      val labels = graft.cluster.ConnectedComponents.run(
        edges.select("id1", "id2")).labels
      graft.cluster.Hierarchical.refine(labels, edges, cut = 0.5)
        .orderBy(col("id"))
    }),

    // affine-gap comparator (C1 reference parity option) — no DuckDB twin
    "q_affine_scores" -> ((s, dir) => {
      attachedNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          round(affine_gap(col("name_1"), col("name_2")), 6).as("affine"))
    }),

    // phonetic (double-metaphone) blocking keys (B12) — no DuckDB metaphone
    "q_metaphone_block" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      graft.block.Blocking.blockingMap(
        recs, Seq(PredicateSpec("metaphone", "name")), "id")
    }),

    // left-anti join (records lacking a match — §2.7 except/anti)
    "q_anti_join" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    })
  )

  /** DuckDB oracle SQL (same parquet tables, column names aligned). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_block_pairs" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '\W+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok)
        |SELECT DISTINCT a.id AS id1, b.id AS id2
        |FROM blocks a JOIN blocks b USING (block_key)
        |WHERE a.id < b.id
        |ORDER BY id1, id2""".stripMargin,

    "q_score_pairs" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '\W+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id)
        |SELECT p.id1, p.id2,
        |  round(jaro_winkler_similarity(r1.name, r2.name), 6) AS jw,
        |  levenshtein(r1.name, r2.name) AS lev
        |FROM pairs p
        |JOIN recs r1 ON p.id1 = r1.id
        |JOIN recs r2 ON p.id2 = r2.id
        |ORDER BY p.id1, p.id2""".stripMargin,

    "q_exact_dedup" ->
      """SELECT p_brand, p_type, count(*) AS n, min(p_partkey) AS rep
        |FROM part GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_topk_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,

    "q_text_stats" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\W+'),
        |                x -> length(x) > 0) AS ltoks
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, text, ltoks,
        |    len(list_filter(ltoks, x -> list_contains(
        |      ['der','die','das','und','ist','nicht','ein','mit','zu','auf'], x))) AS h_de,
        |    len(list_filter(ltoks, x -> list_contains(
        |      ['the','and','of','to','a','in','is','that','it','for'], x))) AS h_en,
        |    len(list_filter(ltoks, x -> list_contains(
        |      ['el','la','los','de','y','es','un','una','en','por'], x))) AS h_es,
        |    len(list_filter(ltoks, x -> list_contains(
        |      ['le','la','les','et','est','un','une','dans','que','pour'], x))) AS h_fr
        |  FROM base),
        |q AS (
        |  SELECT doc_id, text, ltoks, h_de, h_en, h_es, h_fr,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    greatest(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE), 1.0) AS nns,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS nalpha,
        |    CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) AS npunct,
        |    greatest(CAST(len(ltoks) AS DOUBLE), 1.0) AS ntoks
        |  FROM hits)
        |SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '\W+'), x -> length(x) > 0)) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
        |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        |       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
        |       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |       ELSE 'de' END AS lang_guess,
        |  round(0.35 * (nalpha / nns)
        |      + 0.25 * (1.0 - least(npunct / nns * 5.0, 1.0))
        |      + 0.2 * least((CAST(h_en AS DOUBLE) / ntoks) * 4.0, 1.0)
        |      + 0.2 * (least(nchars / 50.0, 1.0)
        |               * (1.0 - least(greatest(nchars - 2000.0, 0.0) / 8000.0, 1.0))),
        |    6) AS quality
        |FROM q ORDER BY doc_id""".stripMargin,

    "q_exact_text_dedup" ->
      """WITH u AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents),
        |m AS (SELECT text, min(id) AS rep FROM u GROUP BY text)
        |SELECT u.id, m.rep, u.id <> m.rep AS is_dup
        |FROM u JOIN m USING (text) ORDER BY u.id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '\W+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |g AS (
        |  SELECT id, list_distinct(
        |    [substr(name, CAST(i AS INT), 3) FOR i IN range(1, length(name) - 1)]) AS g3
        |  FROM recs)
        |SELECT p.id1, p.id2,
        |  round(CASE WHEN len(g1.g3) + len(g2.g3) - len(list_intersect(g1.g3, g2.g3)) = 0
        |        THEN 1.0
        |        ELSE CAST(len(list_intersect(g1.g3, g2.g3)) AS DOUBLE)
        |             / (len(g1.g3) + len(g2.g3) - len(list_intersect(g1.g3, g2.g3)))
        |        END, 6) AS jac3
        |FROM pairs p JOIN g g1 ON p.id1 = g1.id JOIN g g2 ON p.id2 = g2.id
        |ORDER BY p.id1, p.id2""".stripMargin,

    "q_ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS item_id,
        |        list_cosine_similarity(e.v, q.qv) AS cos FROM e, q),
        |r AS (SELECT query_id, item_id, cos,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cos DESC, item_id) AS "rank" FROM s)
        |SELECT query_id, "rank", item_id, round(cos, 5) AS cos
        |FROM r WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_review_queue" ->
      """WITH state AS (
        |  SELECT o_orderkey AS id, o_custkey AS component,
        |         round(o_totalprice / 600000.0, 6) AS confidence
        |  FROM orders),
        |clusters AS (
        |  SELECT component, min(confidence) AS min_confidence,
        |         count(*) AS cluster_size
        |  FROM state GROUP BY component),
        |ranked AS (
        |  SELECT component, round(min_confidence, 6) AS min_confidence,
        |         cluster_size,
        |         row_number() OVER (ORDER BY min_confidence ASC, component) AS review_rank
        |  FROM clusters)
        |SELECT component, min_confidence, cluster_size, review_rank
        |FROM ranked WHERE review_rank <= 10 ORDER BY review_rank""".stripMargin
  )
}
