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

  /** Flagship: full dedupe pipeline (block → score → CC cluster → entity
    * map) over a pages table derived deterministically from sf0.001
    * documents with injected near-duplicate variants. rows > 0 smoke. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.fromDocuments(spark, "/root/testdata/sf0.001")
    val result = Dedupe.run(spark, pages, Dedupe.Config(demoModel))
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
    "q_block_pairs" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val blocks = graft.block.Blocking.blockingMap(
        c, Seq(PredicateSpec("token", "name")), "id")
      graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 1000000)
        .orderBy(col("id1"), col("id2"))
    }),

    // §2.5 C1: Jaro-Winkler + Levenshtein comparators on name pairs
    "q_score_pairs" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val blocks = graft.block.Blocking.blockingMap(
        c, Seq(PredicateSpec("token", "name")), "id")
      val pairs = graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 1000000)
      graft.pairs.PairGen.attachFields(pairs, c, "id", Seq("name"))
        .select(col("id1"), col("id2"),
          round(jaro_winkler(col("name_1"), col("name_2")), 6).as("jw"),
          levenshtein(col("name_1"), col("name_2")).cast("long").as("lev"))
        .orderBy(col("id1"), col("id2"))
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
      Dedupe.run(s, pages, Dedupe.Config(demoModel)).entityMap
        .select(col("url"), col("component"), round(col("confidence"), 6).as("confidence"))
        .orderBy(col("url"))
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
        |ORDER BY o_custkey, rk""".stripMargin
  )
}
