package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), DataFrame]()
  private val scoredCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), DataFrame]()
  private val fsCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), DataFrame]()

  /** Evict memoized snapshots when their context ends — the caches would
    * otherwise pin snapshot DataFrames for the JVM lifetime in a
    * long-lived process cycling contexts (Bench does exactly that). */
  private def evictOnStop(s: SparkSession): Unit =
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
        pairCache.keySet.removeIf(_._1 eq s.sparkContext)
        scoredCache.keySet.removeIf(_._1 eq s.sparkContext)
        fsCache.keySet.removeIf(_._1 eq s.sparkContext)
      }
    })

  /** Sub-session every memo snapshot is READ through, with small read
    * splits (round-6, guide §6 input-split sizing): the 47M-row pair and
    * scored snapshots dictionary-compress ~100:1, so the 128m default
    * packs a ~270 MB snapshot into 3-4 splits and every consumer outside
    * Bench's tuned sub-session scanned it on 3-4 threads (measured:
    * q_bridge_edges spent ~13 s per near-serial scan). Byte-based split
    * sizing simply misjudges these row-dense files; 4m splits restore
    * full scan parallelism for every consumer. Parameterised via
    * spark.graft.snapshotSplitBytes; results are unaffected (no memo
    * consumer observes partition layout — q_training_sample's sampling is
    * partition-free by construction). */
  private val readerSessions =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, SparkSession]()
  private def snapshotReader(s: SparkSession): SparkSession =
    readerSessions.computeIfAbsent(s.sparkContext, { _ =>
      val r = s.newSession()
      r.conf.set("spark.sql.files.maxPartitionBytes",
        s.conf.getOption("spark.graft.snapshotSplitBytes").getOrElse("4m"))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          readerSessions.remove(s.sparkContext)
      })
      r
    })

  /** Parquet snapshot, NOT localCheckpoint: caching 47M rows as
    * deserialized block-manager objects read back at ~140k rows/s vs
    * ~3M rows/s from parquet (measured — object scan + GC of a 10 GB live
    * set); a columnar snapshot is 20× faster to consume and is the same
    * mechanism the pipeline's resume point uses. */
  private def snapshot(s: SparkSession, df: DataFrame, tag: String, dir: String): DataFrame = {
    // the memo maps are keyed by (SparkContext, dir) — round-6 change:
    // the old (session, dir) key made Bench's default session rebuild the
    // 47M-row pair/scored snapshots its tuned sub-session had already
    // built (~20 s of duplicate work per round, paid by whichever
    // default-session query sorted first). ONE snapshot per context is
    // safe because queries run sequentially and computeIfAbsent returns
    // the existing frame — no session ever overwrites files another
    // session's memoized file listing still points at. The path carries
    // the context identity so two live contexts never collide.
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_snap_${tag}_" +
      java.lang.Integer.toHexString(dir.hashCode) + "_" +
      java.lang.Integer.toHexString(System.identityHashCode(s.sparkContext))
    // normalize the file layout to ~two fat-row-group files per core
    // (measured: the 47M-row scored snapshot as 128 x 2MB files cost
    // 1.4 s per consumer scan vs 0.7 s with fat files — per-file
    // open/footer overhead; and one row group per file keeps ~2 effective
    // tasks per core for comparator-heavy consumers at the 4m reader
    // split, since a row group belongs to the split holding its midpoint.
    // 2x cores, not 1x: the snapshot WRITE itself — dedup aggregate +
    // parquet encode — inherits this width, and a single 32-task wave
    // measured ~4 s slower than two waves on the 47M-pair build).
    // coalesce, not repartition: no extra shuffle.
    val width = s.sparkContext.defaultParallelism * 2
    val toWrite = if (df.rdd.getNumPartitions > width) df.coalesce(width) else df
    toWrite.write.mode("overwrite").parquet(path)
    // reclaim at JVM exit: repeated driver/bench invocations otherwise
    // accumulate a ~250 MB snapshot set per process in /tmp (round-6
    // hygiene; the ADVICE temp-dir class)
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(p)
    snapshotReader(s).read.parquet(path)
  }

  /** Drop the memoized snapshots (Bench's repeat-round protocol: both
    * timing rounds must pay the full snapshot build, or the second
    * round's pair queries would measure cached reads only). */
  private[graft] def clearSnapshotCaches(): Unit = {
    pairCache.clear()
    scoredCache.clear()
    fsCache.clear()
  }

  /** THE token blocking over part names — q_block_pairs/q_score_pairs
    * (via [[attachedNamePairs]]) and q_meta_blocking share this single
    * construction, so "same blocking surface" holds structurally, not by
    * copy. Returns (records, blocking map). */
  private def nameTokenBlocks(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // repartition: part.parquet is one row group — without it the NFKC
    // normalize + token explode feeding the census run single-threaded
    val recs = s.read.parquet(s"$dir/part.parquet")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
    (recs, graft.block.Blocking.blockingMap(
      recs, Seq(PredicateSpec("token", "name")), "id"))
  }

  private def attachedNamePairs(s: SparkSession, dir: String): DataFrame =
    pairCache.computeIfAbsent((s.sparkContext, dir), { _ =>
      evictOnStop(s)
      val (recs, blocks) = nameTokenBlocks(s, dir)
      val pairs = graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 1000000)
      // partitioning: PairGen emits the pair set at full width (explicit
      // repartition, AQE-coalesce-exempt) and the attach joins broadcast
      // the record side, so the snapshot inherits that parallelism
      snapshot(s, graft.pairs.PairGen.attachFields(pairs, recs, "id", Seq("name")),
        "pairs", dir)
    })

  /** JW + Levenshtein over the memoized pairs, snapshotted ONCE — shared
    * by q_score_pairs and q_threshold (recomputing 47M JW+Lev per query
    * was ~100 s each at sf0.1). Raw (unrounded) values; consumers round. */
  private def scoredNamePairs(s: SparkSession, dir: String): DataFrame =
    scoredCache.computeIfAbsent((s.sparkContext, dir), { _ =>
      evictOnStop(s)
      // round-6: ONE Levenshtein DP per pair instead of two — `lev` comes
      // from the graft kernel (value-identical to the builtin, ~2.3x
      // faster measured: thread-local scratch vs per-call DP rows) and
      // lev_sim is DERIVED as 1 - d/maxLen, textually LevenshteinSimExpr's
      // own formula over the same distance and the same (ASCII) char
      // counts, so the doubles are bit-identical to the old twin-kernel
      // form (oracle-verified at sf0.001/0.01/0.1)
      snapshot(s, attachedNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          jaro_winkler(col("name_1"), col("name_2")).as("jw"),
          levenshtein_dist(col("name_1"), col("name_2")).cast("long").as("lev"),
          greatest(length(col("name_1")), length(col("name_2"))).as("_maxlen"))
        .select(col("id1"), col("id2"), col("jw"), col("lev"),
          when(col("_maxlen") === 0, lit(1.0))
            .otherwise(lit(1.0) -
              col("lev").cast("double") / col("_maxlen").cast("double"))
            .as("lev_sim")),
        "scored", dir)
    })

  /** Same-nation customer self-pairs with per-side attribute columns
    * (suffixes `_1`/`_2`) — the ONE copy of the expansion scaffolding
    * shared by q_feature_pairs and the Fellegi–Sunter queries. The
    * explicit width on the join key keeps the 9M-row expansion parallel:
    * a 15k-row dimension self-join has tiny shuffle INPUT, so AQE
    * coalesces it to ~1 partition and the expansion runs single-threaded
    * (measured 72 s; same expansion-blindness as pair-gen). */
  private def customerPairs(s: SparkSession, dir: String,
      attrs: Seq[(String, Column)]): DataFrame = {
    val c = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("id") +: col("c_nationkey").as("nat") +:
        attrs.map { case (n, e) => e.as(n) }: _*)
    val a = c.select(col("id").as("id1") +: col("nat") +:
      attrs.map { case (n, _) => col(n).as(s"${n}_1") }: _*)
    val b = c.select(col("id").as("id2") +: col("nat") +:
      attrs.map { case (n, _) => col(n).as(s"${n}_2") }: _*)
    val width = s.sparkContext.defaultParallelism * 4
    a.repartition(width, col("nat"))
      .join(b.repartition(width, col("nat")), "nat")
      .filter(col("id1") < col("id2"))
  }

  /** Same-nation customer pairs with three discrete agreement gammas —
    * memoized snapshot shared by q_fs_patterns and q_fs_classify (exact
    * segment match, last-2-of-name match, balance-sign match: all
    * integer/string comparisons, so both engines derive identical 0/1
    * indicators). */
  private def fsCustomerGammas(s: SparkSession, dir: String): DataFrame =
    fsCache.computeIfAbsent((s.sparkContext, dir), { _ =>
      evictOnStop(s)
      snapshot(s, customerPairs(s, dir, Seq(
          "seg" -> col("c_mktsegment"),
          "n2" -> substring(col("c_name"), -2, 2),
          "pos" -> (col("c_acctbal") > 0)))
        .select(col("id1"), col("id2"), col("n2_1"),
          (col("seg_1") === col("seg_2")).cast("int").as("g_seg"),
          (col("n2_1") === col("n2_2")).cast("int").as("g_name2"),
          (col("pos_1") === col("pos_2")).cast("int").as("g_bal")),
        "fsgamma", dir)
    })

  /** Shared 5-doc near-dup fixture for the minhash/simhash fixture
    * queries — ONE literal so the "same fixture" premise cannot drift. */
  private def nearDupFixtureDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away now"),
      (3L, "completely different content about spark clusters and shuffles here today"),
      (4L, "completely different content about spark clusters and shuffles here tomorrow"),
      (5L, "unrelated third topic with nothing shared at all in common"))
      .toDF("id", "text")
  }

  /** Run the pipeline, derive the query's output frame, truncate it
    * eagerly and reclaim the run's scratch. Contract queries execute
    * repeatedly (Bench runs each three rounds) and deleteOnExit-only
    * reclamation stacks input-sized scratch dirs for the JVM's lifetime —
    * the ENOSPC class ScaleRun hit before its per-point cleanup. */
  private def runReclaimed(s: SparkSession, pages: DataFrame,
      config: Dedupe.Config)(f: Dedupe.Result => DataFrame): DataFrame = {
    val r = Dedupe.run(s, pages, config)
    val out = f(r).localCheckpoint(true)
    Dedupe.cleanupScratch(s, r)
    out
  }

  /** Flagship: full dedupe pipeline (block → score → CC cluster → entity
    * map) over a pages table derived deterministically from sf0.001
    * documents with injected near-duplicate variants. rows > 0 smoke. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.fromDocuments(spark, "/root/testdata/sf0.001")
    runReclaimed(spark, pages, Dedupe.Config(demoModel, collectMetrics = false))(
      _.entityMap)
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

    // meta-blocking (Papadakis TKDE'14 / SparkER EDBT'19): block
    // filtering (ratio 0.75 — exact in binary, so ceil(nb*ratio) is
    // engine-independent) → CBS comparison weights → weighted node
    // pruning, over the same token blocking q_block_pairs uses. Every
    // decision is counts + exact integer arithmetic, so the whole
    // pruned comparison set is oracle-checked
    "q_meta_blocking" -> ((s, dir) => {
      val (_, blocks) = nameTokenBlocks(s, dir)
      graft.block.MetaBlocking.prune(blocks, ratio = 0.75, maxBlockSize = 1000000)
        .orderBy(col("id1"), col("id2"))
    }),

    // §2.4 J7: exact set-similarity self-join via prefix filtering —
    // every document pair with token-3-shingle Jaccard >= 1/2, no LSH
    // recall loss; verified in exact integer arithmetic, oracle = the
    // brute-force O(n²) DuckDB twin in the identical integer form
    "q_ssjoin" -> ((s, dir) => {
      val toks = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id").as("id"),
          array_distinct(token_shingles(tokens(lower(col("text"))), 3)).as("toks"))
      graft.pairs.SetSimJoin.jaccardSelfJoin(toks, 1, 2)
        .orderBy(col("id1"), col("id2"))
    }),

    // §2.4 J8: exact edit-distance self-join (q-gram prefix filtering +
    // banded verification) — every part-name pair with levenshtein <= 2;
    // oracle = brute-force DuckDB twin of the same exact predicate
    "q_edit_join" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("s"))
      // no orderBy: the driver's hash compare is order-insensitive and a
      // global sort of the multi-million-row output costs ~7 s at sf0.1
      graft.pairs.EditDistJoin.selfJoin(recs, k = 2, q = 2)
    }),

    // §2.3 blocking quality metrics (RR / PC / PQ): token-name blocking
    // judged against the same-brand-and-type truth rule — every ratio
    // input an exact integer count
    "q_block_quality" -> ((s, dir) => {
      val cand = attachedNamePairs(s, dir).select("id1", "id2")
      val parts = s.read.parquet(s"$dir/part.parquet")
      val recs = parts.select(col("p_partkey").as("id"), col("p_brand"), col("p_type"))
      val truth = recs.as("a").join(recs.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_type") === col("b.p_type") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"))
      graft.block.BlockingEval.quality(cand, truth, parts.count())
        .select(col("n_candidates"), col("n_truth"), col("n_hit"),
          round(col("reduction_ratio"), 6).as("reduction_ratio"),
          round(col("pair_completeness"), 6).as("pair_completeness"),
          round(col("pairs_quality"), 6).as("pairs_quality"))
    }),

    // §2.5 hybrid comparator: Monge-Elkan mean-of-max Jaro-Winkler over
    // token sets, on a deterministic 1/20 slice of the candidate pairs
    "q_monge_elkan" -> ((s, dir) => {
      attachedNamePairs(s, dir).filter(col("id1") % 20 === 0)
        .select(col("id1"), col("id2"),
          round(monge_elkan(tokens(col("name_1")), tokens(col("name_2"))), 6).as("me"))
        .orderBy(col("id1"), col("id2"))
    }),

    // §2.5 hybrid comparator: Soft-TFIDF (Cohen et al. 2003) — TF-IDF
    // term weights with JW-fuzzy term matching at theta = 0.9, over the
    // same L2-normalized vectors as q_tfidf_cosine, on q_monge_elkan's
    // deterministic 1/20 pair slice
    "q_soft_tfidf" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val vecs = graft.score.Scoring.withTfidfVectors(recs, "name", "id")
        .select(col("id"), col("name_tfidf"))
      attachedNamePairs(s, dir).select(col("id1"), col("id2"))
        .filter(col("id1") % 20 === 0)
        .join(vecs.select(col("id").as("id1"), col("name_tfidf").as("v1")), "id1")
        .join(vecs.select(col("id").as("id2"), col("name_tfidf").as("v2")), "id2")
        .select(col("id1"), col("id2"),
          round(soft_tfidf(col("v1"), col("v2"), 0.9), 6).as("stf"))
        .orderBy(col("id1"), col("id2"))
    }),

    // match explainability: per (pair, feature) raw value, weight, and
    // contribution w·f plus bias and final σ score — the melt shares
    // scorePairs' algebra by construction, so this green row doubles as
    // a regression guard on the LR scoring itself (deterministic 1/50
    // pair slice keeps the melt review-queue-sized)
    "q_explain_pairs" -> ((s, dir) => {
      val m = Model(bias = -8.0,
        weights = Map("jw_name" -> 9.0, "lev_name" -> 6.0), threshold = 0.5,
        predicates = Seq(PredicateSpec("token", "name")))
      graft.score.Scoring.explainPairs(
          attachedNamePairs(s, dir).filter(col("id1") % 50 === 0), m)
        .select(col("id1"), col("id2"), col("feature"),
          round(col("value"), 6).as("value"), col("weight"),
          round(col("contribution"), 6).as("contribution"),
          col("bias"), round(col("score"), 6).as("score"))
        .orderBy(col("id1"), col("id2"), col("feature"))
    }),

    // §2.5 C1: Jaro-Winkler + Levenshtein comparators on name pairs
    "q_score_pairs" -> ((s, dir) => {
      scoredNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          round(col("jw"), 6).as("jw"), col("lev"))
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

    // flagship pipeline as a query. Oracle: frozen observed table
    // (FrozenOracles — CC not independently SQL-expressible over xxhash
    // ids; the q_dedupe_e2e recursive-CTE twin derives the same pipeline
    // semantics independently on hash-free keys)
    "q_dedupe_pipeline" -> ((s, dir) => {
      val pages = PagesGen.fromDocuments(s, dir)
      runReclaimed(s, pages, Dedupe.Config(demoModel, collectMetrics = false))(
        _.entityMap
          .select(col("url"), col("component"), round(col("confidence"), 6).as("confidence")))
        .orderBy(col("url"))
    }),

    // text-analysis pack over documents: token counts, lang-ID, quality.
    // repartition: the single-row-group input scan would otherwise run
    // every regex kernel on one thread (scan-parallelism floor)
    "q_text_stats" -> ((s, dir) => {
      import graft.textops.TextOps
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextOps.bpeishCount(col("text")).cast("long").as("n_bpeish"),
          TextOps.langId(col("text")).as("lang_guess"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // BM25 inverted-index retrieval: every 50th doc queries the corpus
    // (df-prune at 0.75 — exact in binary — drops the stopword-ish head
    // half of the synthetic vocabulary, exercising the prune)
    "q_bm25_topk" -> ((s, dir) => {
      import graft.textops.Retrieval
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      val queries = docs.filter(pmod(col("doc_id"), lit(50L)) === 0L)
        .select(col("doc_id").as("qid"), col("text"))
      Retrieval.bm25Search(docs, "doc_id", "text", queries, "qid", "text",
          k = 5, maxDfRatio = 0.75)
        .orderBy(col("qid"), col("rank"))
    }),

    // distributed full-batch LR training (score/GradLR, the fastText-
    // style corpus quality classifier): 2 GD steps from zero weights on
    // bag-of-token features, label = (lang = 'en'), then predict. The
    // micro-unit weight/gradient quantization makes the whole TRAINING
    // RUN oracle-checkable — the DuckDB twin unrolls both steps.
    "q_lr_quality" -> ((s, dir) => {
      import graft.score.GradLR
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      val feats = GradLR.tokenFeatures(docs, "doc_id", "text")
      val labels = docs.select(col("doc_id").as("id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      val w = GradLR.fit(feats, labels, iters = 2, learnRate = 0.01)
      GradLR.predict(feats, w)
        .join(labels, "id")
        .select(col("id").as("doc_id"), col("y"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // PageRank over a host link graph (graphops/PageRank): pages are
    // synthesized deterministically off documents (each doc's host links
    // to one h-host, every third doc also to an s-host sink — so dangling
    // nodes exist), links are EXTRACTED from the html with the same
    // href regex as production, and 4 exact-integer-mass power
    // iterations run. The DuckDB twin unrolls the identical update 4
    // times — an oracle-checked ITERATIVE graph operator (CC itself is
    // only fixture-checkable because its iteration count is data-driven;
    // PageRank's is fixed, so the loop unrolls into plain SQL).
    "q_pagerank" -> ((s, dir) => {
      import graft.graphops.PageRank
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"))
      val pages = docs.select(
        concat(lit("h"), (col("doc_id") % 50).cast("string"),
          lit(".example")).as("host"),
        concat(
          lit("<p><a href=\"https://h"),
          ((col("doc_id") * 7) % 50).cast("string"),
          lit(".example/x\">l</a>"),
          when(col("doc_id") % 3 === 0,
            concat(lit("<a href=\"https://s"),
              (col("doc_id") % 23).cast("string"),
              lit(".example/y\">m</a>"))).otherwise(lit("")),
          lit("</p>")).as("html"))
      PageRank.run(PageRank.hostLinks(pages, "host", "html"),
          "src_host", "dst_host", iters = 4)
        .orderBy(col("node"))
    }),

    // leakage-safe train/eval split (textops/Splits): the corpus gets
    // exact-dup clusters (every doc_id % 3 == 0 re-appears under a new
    // id with byte-identical text), the cluster key is md5(text), and
    // the split is a salted hash of the CLUSTER — so duplicates can
    // never straddle train/eval. Pure column expression, no shuffle.
    "q_leakage_split" -> ((s, dir) => {
      import graft.textops.Splits
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"))
      val dupes = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val corpus = docs.unionByName(dupes)
        .withColumn("cluster", md5(col("text").cast("binary")))
      Splits.splitByCluster(corpus, "cluster", evalFrac = 0.125, salt = "r3")
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // distributed BPE vocabulary training (Sennrich et al. ACL 2016†,
    // textops/Bpe): one corpus scan -> word census, then per merge one
    // exact-integer pair census + 1-row argmax + one codegen'd kernel
    // rewrite. Constant classic fixture (low:5 lower:2 newest:6
    // widest:3) -> constant merge table -> green VALUES oracle; the
    // pair counts and tie-breaks are hand-derived in BpeSpec.
    "q_bpe_train" -> ((s, dir) => {
      import graft.textops.Bpe
      import s.implicits._
      val corpus = Seq(
        (1L, Seq.fill(5)("low").mkString(" ")),
        (2L, Seq.fill(2)("lower").mkString(" ")),
        (3L, Seq.fill(6)("newest").mkString(" ")),
        (4L, Seq.fill(3)("widest").mkString(" "))).toDF("id", "text")
      val (merges, _) = Bpe.train(Bpe.wordCensus(corpus, "text"), k = 5)
      merges.toDF().select(col("step"), col("left").as("lhs"),
        col("right").as("rhs"), col("freq")).orderBy(col("step"))
    }),

    // DSIR importance-resampling selection (Xie et al. NeurIPS 2023†):
    // fit unigram+bigram Laplace log-ratio weights of a trusted slice
    // (doc_id % 5 = 0 — the stand-in for the paper's Wikipedia target)
    // vs the full raw corpus, then score every doc's log importance
    // weight as an exact integer sum of micro-quantized per-gram
    // log-ratios — the q_lm_perplexity determinism idiom, so fit AND
    // scoring are DuckDB-twinned bit-for-bit (textops/Dsir.scala).
    "q_dsir" -> ((s, dir) => {
      import graft.textops.Dsir
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"))
      // one gram census, snapshotted: fit's two censuses and the scoring
      // pass all derive from it (gramFeatures over the target slice ==
      // the full-corpus features filtered to target ids — per-doc
      // grouping). Same counts, same weights, same scores; measured ~3x
      // fewer explode+census passes per query.
      val feats = graft.pipeline.Dedupe.snapshotIfResolvable(s,
        Dsir.gramFeatures(docs, "doc_id", "text"), "dsir_feats")
      val model = Dsir.fitFromFeatures(
        feats.filter(col("id") % 5 === 0), feats)
      Dsir.scoreFromFeatures(docs, "doc_id", feats, model).orderBy(col("doc_id"))
    }),

    // the selection step: keep the 100 most target-like docs under the
    // strict (lw_per_gram desc, doc_id asc) total order — plans as
    // TakeOrdered (per-partition top-k), never a global sort
    "q_dsir_select" -> ((s, dir) => {
      import graft.textops.Dsir
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"))
      val feats = graft.pipeline.Dedupe.snapshotIfResolvable(s,
        Dsir.gramFeatures(docs, "doc_id", "text"), "dsir_feats_sel")
      val model = Dsir.fitFromFeatures(
        feats.filter(col("id") % 5 === 0), feats)
      Dsir.selectTopK(Dsir.scoreFromFeatures(docs, "doc_id", feats, model),
        "doc_id", 100)
    }),

    // exact distributed order statistics (stats/Quantiles): MSD radix
    // selection on the order-preserving double key — four censuses, no
    // sort, no row shuffle; the returned value is an actual element,
    // bit-exact, so the DuckDB row_number rebuild matches with no
    // rounding at all
    "q_quantiles" -> ((s, dir) => {
      import graft.stats.Quantiles
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      Quantiles.quantilesDisc(li, "l_extendedprice",
        Seq(0.25, 0.5, 0.9, 0.99)).orderBy(col("q"))
    }),

    // WEIGHT-quantiles: "below which discount do q% of the QUANTITY
    // units sit?" — the token-budget-cutoff question, asked of
    // lineitem so duplicates are heavy (11 distinct discounts).
    // Weight-sum censuses, same radix walk, zero extra shuffle
    "q_weighted_quantiles" -> ((s, dir) => {
      import graft.stats.Quantiles
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      Quantiles.weightedQuantilesDisc(li, "l_discount", "l_quantity",
        Seq(0.1, 0.5, 0.9, 1.0)).orderBy(col("q"))
    }),

    // per-GROUP exact quantiles — the shape CCNet's cutoffs actually
    // take (per-language percentile buckets); same radix walk with the
    // active (group, prefix) frontier pushed down as a broadcast
    // left-semi join, groups processed in bounded chunks
    "q_group_quantiles" -> ((s, dir) => {
      import graft.stats.Quantiles
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      Quantiles.quantilesDiscByGroup(docs, "source", "n_chars",
        Seq(0.33, 0.66, 1.0)).orderBy(col("source"), col("q"))
    }),

    // CCNet-style LM perplexity filter (Wenzek et al. 2020†): fit a
    // trigram Lidstone LM on the trusted slice (doc_id % 5 != 0 — the
    // stand-in for CCNet's Wikipedia), score EVERY doc's cross-entropy
    // under it, bucket head/middle/tail at literal cutoffs (CCNet's are
    // per-language percentiles computed offline). Every probability is a
    // ratio of exact integer counts and per-gram contributions are
    // micro-unit-quantized, so the whole operator — fit included — is
    // DuckDB-twinned bit-for-bit (textops/LangModel.scala).
    "q_lm_perplexity" -> ((s, dir) => {
      import graft.textops.LangModel
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"))
      val lm = LangModel.fit(docs.filter(col("doc_id") % 5 =!= 0), "text", n = 3)
      LangModel.crossEntropy(docs, "doc_id", "text", lm, alpha = 0.1)
        // cutoffs ≈ this corpus's 33rd/66th ce percentiles (CCNet buckets
        // at the 33/66 perplexity percentiles of each language)
        .withColumn("bucket", LangModel.pplBucket(col("ce"), 2.75, 2.87))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition stats (one-pass kernel). The corpus is
    // single-line, so the query splices each doc into three lines —
    // prefix(60), middle(61..260), prefix(60) again — giving every doc a
    // guaranteed duplicate line plus non-trivial word-gram repetition
    // from the small shared vocabulary; DuckDB rebuilds the same spliced
    // text and recomputes all five fractions from explode+groupBy.
    "q_repetition_stats" -> ((s, dir) => {
      import graft.textops.TextOps
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          concat_ws("\n", substring(col("text"), 1, 60),
            substring(col("text"), 61, 200),
            substring(col("text"), 1, 60)).as("text"))
        .select(col("doc_id"), TextOps.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"), col("r.*"))
        .orderBy(col("doc_id"))
    }),

    // Gopher quality-rule battery over spliced 3-line docs: every rule
    // is exercised — doc_id % 7 bullets line 1, % 5 ends line 2 with an
    // ellipsis, % 13 injects hash symbols, % 2 splices stop-list words,
    // % 11 swaps line 3 for a bulleted stub, and the varying line-3
    // truncation sweeps word counts across the 50-word cutoff. DuckDB
    // rebuilds the same text and recomputes every census from
    // list/regexp primitives; keep compares RAW ratios (integer-ratio
    // doubles, bit-identical across engines), outputs round to 6.
    "q_gopher_rules" -> ((s, dir) => {
      import graft.textops.TextOps
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), concat_ws("\n",
          concat(when(col("doc_id") % 7 === 0, lit("- ")).otherwise(lit("")),
            substring(col("text"), 1, 60)),
          concat(substring(col("text"), 61, 140),
            when(col("doc_id") % 2 === 0, lit(" of the and that")).otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit(" ...")).otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit(" # tagged # list")).otherwise(lit(""))),
          when(col("doc_id") % 11 === 0, lit("• menu"))
            .otherwise(col("text").substr(lit(1),
              lit(40) + (col("doc_id") % 60).cast("int")))).as("text"))
        .select(col("doc_id"), TextOps.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy(col("doc_id"))
    }),

    // C4 heuristic filters over spliced 4-line docs: line 1 ends with a
    // period and carries ≥5 words (kept), line 2 is a short stub
    // (dropped by the word floor), line 3 gains terminal punctuation on
    // odd doc_ids only (sweeping n_sentences across the ≥3 page floor,
    // so keep discriminates), line 4 varies per doc — % 9 injects "lorem ipsum",
    // % 8 a curly brace, % 6 a javascript mention, rest a kept sentence.
    // DuckDB rebuilds the text and the line filter with list lambdas.
    "q_c4_filters" -> ((s, dir) => {
      import graft.textops.TextOps
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), concat_ws("\n",
          concat(substring(col("text"), 1, 60), lit(".")),
          lit("nav stub"),
          concat(substring(col("text"), 61, 80),
            when(col("doc_id") % 2 === 1, lit(".")).otherwise(lit(""))),
          when(col("doc_id") % 9 === 0, lit("standard Lorem Ipsum passage follows."))
            .when(col("doc_id") % 8 === 0, lit("function f() { return 1; }"))
            .when(col("doc_id") % 6 === 0, lit("please enable JavaScript to continue."))
            .otherwise(concat(substring(col("text"), 141, 60), lit(" tail sentence!")))).as("text"))
        .select(col("doc_id"), TextOps.c4Filters(col("text")).as("c"))
        .select(col("doc_id"), col("c.*"))
        .orderBy(col("doc_id"))
    }),

    // the composed curation pipeline, end-to-end oracle-exact: spliced
    // 3-line docs → corpus line-dedup (footer df=500 + nav df=25 both
    // stripped, every doc reduced to its unique payload line) →
    // repetition filter (corpus-tuned gram thresholds: 259/500 survive
    // at sf0.01; dup-line metrics are 0 on the single surviving line) →
    // PII redaction (the spliced email) → exact dedup across a
    // shifted-id duplicate wave (post-redaction prefix collisions also
    // merge — wanted, that IS the dedup). Output: surviving (doc_id,
    // text) representatives. The DuckDB twin chains the independently-
    // green stage rebuilds in the same order.
    "q_curate_pipeline" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          concat_ws("\n",
            lit("all rights reserved example footer"),
            concat(substring(col("text"), 1, 120), lit(" contact user"),
              col("doc_id").cast("string"), lit("@crawl-example.org")),
            concat(lit("nav"), (col("doc_id") % 20).cast("string"),
              lit(" menu"))).as("text"))
      val lined = TextOps.dedupeLines(docs, "doc_id", "text", maxLineDf = 10L)
      val kept = lined.filter(TextOps.repetitionKeep(col("text"),
        maxTop2 = 0.045, maxTop3 = 0.041))
      // Snapshot the redacted stage: it feeds both the exact-dup census
      // and the final reassembly join, and without a materialization the
      // doc_id-partitioned final exchange cannot reuse the census
      // exchanges — the whole line-dedup/repetition/PII chain would run
      // twice. Degrades to recompute when no scratch base resolves.
      val red = graft.pipeline.Dedupe.snapshotIfResolvable(s,
        kept.select(col("doc_id"),
          TextOps.redactPii(col("text")).as("text")), "curate_red")
      val unioned = red.unionByName(
        red.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val survivors = TextOps.exactDupes(unioned, "doc_id", "text")
        .filter(!col("is_dup")).select(col("id").as("doc_id"))
      unioned.join(survivors, Seq("doc_id")).orderBy(col("doc_id"))
    }),

    // PII scrub: each doc gets a deterministic email, phone, and IP
    // spliced between its text halves; output is the fully redacted text
    // (the strong parity signal — every placeholder position checked)
    // plus the pre-redaction census counts
    "q_pii_redact" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          concat_ws(" ",
            substring(col("text"), 1, 60),
            concat(lit("contact user"), col("doc_id").cast("string"),
              lit("@crawl-example.org now")),
            concat(lit("call 555-"),
              (col("doc_id") % 900 + 100).cast("string"), lit("-"),
              (col("doc_id") % 9000 + 1000).cast("string")),
            concat(lit("from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), (col("doc_id") % 100).cast("string")),
            substring(col("text"), 61, 60)).as("text"))
      docs.select(col("doc_id"),
          TextOps.redactPii(col("text")).as("red_text"),
          TextOps.piiCounts(col("text")).as("c"))
        .select(col("doc_id"), col("red_text"), col("c.*"))
        .orderBy(col("doc_id"))
    }),

    // corpus-level boilerplate-line removal: every doc gets five lines —
    // a corpus-wide footer (df=500, removed), its own 80-char prefix
    // (rare, kept), a mod-100 group line (df=5 <= threshold, kept), a
    // mod-20 nav line (df=25, removed), and a 2-char line ("ok", below
    // minLineLen, immune despite df=500) — so both removal rules and
    // both keep rules are oracle-checked, with line order preserved
    "q_line_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          concat_ws("\n",
            lit("all rights reserved example footer"),
            substring(col("text"), 1, 80),
            concat(lit("grp"), (col("doc_id") % 100).cast("string"),
              lit(" shared boilerplate row")),
            concat(lit("nav"), (col("doc_id") % 20).cast("string"),
              lit(" menu")),
            lit("ok")).as("text"))
      TextOps.dedupeLines(docs, "doc_id", "text", maxLineDf = 10L)
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization + latest-capture dedup: four deterministic
    // capture spellings per doc — case/port/tracking-param variant,
    // clean twin, trailing-slash twin (later ts on odd docs), and a
    // distinct https page — so both winner rules (newest ts; raw-url
    // tie-break when ts ties) and the n_captures census are oracle-
    // checked against an independent DuckDB canonicalization rebuild
    "q_url_dedup" -> ((s, dir) => {
      import graft.textops.UrlOps
      val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      val h = (col("doc_id") % 50).cast("string")
      val i = col("doc_id").cast("string")
      val t0 = to_timestamp(lit("2017-07-14 02:40:00"))
      val caps = d.select(
          concat(lit("HTTP://Host"), h, lit(".Example.COM:80/d/"), i,
            lit("?b=2&a=1&utm_source=feed#top")).as("url"), t0.as("warc_ts"))
        .unionByName(d.select(concat(lit("http://host"), h,
          lit(".example.com/d/"), i, lit("?a=1&b=2")).as("url"),
          t0.as("warc_ts")))
        .unionByName(d.select(concat(lit("http://host"), h,
          lit(".example.com/d/"), i, lit("/?a=1&b=2")).as("url"),
          to_timestamp(when(col("doc_id") % 2 === 1,
            lit("2017-07-14 02:41:00"))
            .otherwise(lit("2017-07-14 02:40:00"))).as("warc_ts")))
        .unionByName(d.select(concat(lit("https://Host"), h,
          lit(".example.com:443/alt/"), i).as("url"), t0.as("warc_ts")))
      UrlOps.latestCapture(caps).orderBy(col("canon_url"))
    }),

    // crawl-to-crawl snapshot diff: old = every page but doc_id%10==0,
    // new = every page but doc_id%7==0 with doc_id%5==0 texts revised —
    // all four statuses (added/removed/changed/unchanged) in the output
    "q_snapshot_diff" -> ((s, dir) => {
      import graft.textops.UrlOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))
      val url = concat(lit("https://"), col("source"), lit("/"),
        col("doc_id").cast("string"))
      val oldSnap = docs.filter(col("doc_id") % 10 =!= 0)
        .select(url.as("url"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .select(url.as("url"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      UrlOps.snapshotDiff(oldSnap, newSnap).orderBy(col("url"))
    }),

    // per-host quota sampling (domain balancing): zipf-skewed synthetic
    // hosts (host 0 carries half the pages), deterministic score; keep
    // the top 5 per host by (score desc, id asc). salts=4 exercises the
    // two-stage skew-proof path — oracle equality with DuckDB's
    // single-window row_number proves two-stage == one-stage.
    "q_domain_cap" -> ((s, dir) => {
      import graft.textops.UrlOps
      val d = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"))
      val h = when(col("doc_id") % 2 === 0, lit(0L))
        .otherwise(pmod(col("doc_id"), lit(22L)) + 1L).cast("string")
      val docs = d.select(col("doc_id"),
        concat(lit("https://host"), h, lit(".example/d/"),
          col("doc_id").cast("string")).as("url"),
        ((col("doc_id") * 37L) % 101L).as("score"))
      UrlOps.domainCap(docs, "url", "doc_id", col("score"), maxPerHost = 5,
          salts = 4)
        .select(col("host"), col("host_rank").cast("long").as("host_rank"),
          col("doc_id"), col("score"))
        .orderBy(col("host"), col("host_rank"))
    }),

    // cross-doc duplicated-span removal: every doc carries the same
    // 12-token license span (plus a second 9-token span on the %5
    // group); spanDedupe(k=8) splices the span out of every doc except
    // the keeper (min doc_id per gram), whose text — like every
    // untouched doc — comes back byte-identical. The census keys on raw
    // grams here so the DuckDB twin is hash-free; the xxhash64 scale
    // path is parity-pinned in TextOpsSpec.
    "q_span_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          concat(
            lit("u"), col("doc_id").cast("string"),
            lit(" terms of service all content provided here is licensed for verbatim reuse "),
            when(col("doc_id") % 5 === 0,
              lit("mirror notice this page is an archived copy snapshot "))
              .otherwise(lit("")),
            substring(col("text"), 1, 40)).as("text"))
      TextOps.spanDedupe(docs, "doc_id", "text", k = 8)
        .orderBy(col("doc_id"))
    }),

    // deterministic token-budget sharding: bucketed distributed prefix
    // sum (bucketWidth=128 forces many buckets at sf0.01) vs the DuckDB
    // twin's single global cumsum — equality proves the decomposition
    "q_pack_shards" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      TextOps.packShards(docs, "doc_id", "n_tok",
          targetTokens = 4096, bucketWidth = 128)
        .orderBy(col("doc_id"))
    }),

    // per-lang token-budget sampling (data mixing): each lang's 2000-token
    // budget fills with its highest-scored docs; deterministic synthetic
    // score so the DuckDB twin reproduces the total order exactly
    "q_budget_sample" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
          ((col("doc_id") * 37) % 101).as("score"))
      TextOps.budgetSample(docs, Seq("lang"), "n_tok",
          col("score"), "doc_id", budgetTokens = 2000L)
        .select(col("lang"), col("doc_id"), col("n_tok"), col("cum_tokens"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // temperature-based source mixing at α = 0.5 over a derived skewed
    // grouping (300/150/50 docs): rare buckets keep a HIGHER rate than
    // their raw share — the flattening the operator exists for.
    // Selection is a deterministic Lehmer hash-threshold (no window, no
    // per-source sort); sqrt keeps the rates IEEE-identical in DuckDB
    "q_temperature_mix" -> ((s, dir) => {
      import graft.textops.Mixing
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          when(col("doc_id") % 10 < 6, lit("b0"))
            .when(col("doc_id") % 10 < 9, lit("b1"))
            .otherwise(lit("b2")).as("bucket"))
      Mixing.temperatureMix(docs, "doc_id", "bucket", targetRows = 200L)
        .select(col("doc_id"), col("bucket"), col("keep_rate"))
        .orderBy(col("doc_id"))
    }),

    // per-(source, lang) best-representative pick: highest quality wins,
    // ties break to the smaller doc_id — a max_by aggregate, no window
    "q_keep_best" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("source"), col("lang"),
          TextOps.qualityScore(col("text")).as("quality"))
      TextOps.keepBest(docs, Seq("source", "lang"), "quality", "doc_id")
        .orderBy(col("source"), col("lang"))
    }),

    // HTML -> text extraction over the raw-table html:binary shape: each
    // doc's text is wrapped in a deterministic page skeleton exercising
    // every extraction rule (entity-bearing title, style block, script
    // whose BODY contains markup, entities adjacent to text, a comment),
    // encoded to binary, then recovered by the codegen'd column chain
    "q_html_extract" -> ((s, dir) => {
      import graft.textops.TextOps
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
      val html = encode(concat(
        lit("<html><head><title>News &amp; views</title>" +
          "<style type=\"text/css\">body{margin:0}</style></head><body><h1>"),
        substring(col("text"), 1, 40),
        lit("</h1><script>var x = '<p>not text</p>';</script><p>"),
        col("text"),
        lit(" &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;tail</p>" +
          "<!-- hidden --></body></html>")), "UTF-8")
      docs.select(col("doc_id"), TextOps.extractHtmlText(html).as("text_out"))
        .orderBy(col("doc_id"))
    }),

    // incremental batch-vs-corpus exact dedup: corpus = documents; the
    // batch mixes re-crawled texts (rejected by the corpus gate), fresh
    // texts, and a within-batch duplicate of each fresh text (rejected
    // by the representative gate) — all three outcomes in the output
    "q_incr_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val recrawl = corpus.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val fresh = corpus.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" fresh addendum")).as("text"))
      val freshDup = fresh
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val batch = recrawl.unionByName(fresh).unionByName(freshDup)
      TextOps.dedupeAgainstCorpus(batch, corpus, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // same scenario through the bloom gate: a corpus-side bloom filter
    // (built once, reused per batch) prefilters the batch's distinct
    // hashes map-side; the exact hash join behind it removes bloom false
    // positives, so the output — and the DuckDB oracle — are identical
    // to q_incr_dedup's
    "q_incr_dedup_bloom" -> ((s, dir) => {
      import graft.textops.TextOps
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val recrawl = corpus.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val fresh = corpus.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" fresh addendum")).as("text"))
      val freshDup = fresh
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val batch = recrawl.unionByName(fresh).unionByName(freshDup)
      val bloom = TextOps.corpusTextBloom(corpus, "text",
        expectedItems = 20000L, fpp = 0.01)
      TextOps.dedupeAgainstCorpus(batch, corpus, "doc_id", "text",
        corpusBloom = Some(bloom))
        .orderBy(col("doc_id"))
    }),

    // incremental batch-vs-corpus NEAR dedup over the persisted MinHash
    // index: every doc_id%4==0 page borrows its successor's corpus text —
    // verbatim (recrawl), with an appended tail (near-dup), or keeps its
    // own (novel). Oracle: frozen observed table — banding + the Jaccard
    // estimate run on internal xxhash64 minhashes DuckDB cannot recompute;
    // the green q_incr_neardup_fixture twin pins the kernel independently
    "q_incr_neardup" -> ((s, dir) => {
      import graft.textops.TextOps
      // no scan-widening repartition here: the signature kernel is cheap
      // (~0.3 s over this corpus, measured via tools.SigProbe) and the
      // multi-KB text shuffle re-executes in every snapshot job, so
      // widening costs more than the 1-task scan it parallelizes
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val donors = docs.filter(col("doc_id") % 4 === 1)
        .select((col("doc_id") - 1).as("doc_id"), col("text").as("dtext"))
      val batch = docs.filter(col("doc_id") % 4 === 0).join(donors, Seq("doc_id"))
        .select((col("doc_id") + 5000000L).as("doc_id"),
          when(col("doc_id") % 3 === 0, col("dtext"))
            .when(col("doc_id") % 3 === 1,
              concat(col("dtext"), lit(" appended recrawl banner tail")))
            .otherwise(col("text")).as("text"))
      val corpusSigs = TextOps.minhashSignatures(corpus, "doc_id", "text")
      TextOps.neardupAgainstCorpus(batch, corpusSigs, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // fixture twin of q_incr_neardup over the shared 5-doc corpus: one
    // exact recrawl, one near-dup, one novel batch doc. xxhash64-based,
    // so the oracle freezes the expected constant table
    "q_incr_neardup_fixture" -> ((s, dir) => {
      import graft.textops.TextOps
      import s.implicits._
      val corpus = nearDupFixtureDocs(s)
      val batch = Seq(
        (101L, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (102L, "completely different content about spark clusters and shuffles here this morning"),
        (103L, "a wholly novel batch document about tensor compilers and kernel fusion passes"))
        .toDF("id", "text")
      val sigs = TextOps.minhashSignatures(corpus, "id", "text")
      TextOps.neardupAgainstCorpus(batch, sigs, "id", "text",
          estThreshold = 0.35)
        .orderBy(col("id"))
    }),

    // WARC ingest framing: each doc becomes a two-record WARC blob
    // (warcinfo + HTTP response) whose BODY contains a "WARC/1.0" decoy
    // line — only Content-Length-driven framing (never marker splitting)
    // recovers the rows the oracle derives from the fixture construction
    "q_warc_ingest" -> ((s, dir) => {
      import graft.io.Warc
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .repartition(s.sparkContext.defaultParallelism)
      val url = concat(lit("https://crawl.example/doc/"),
        col("doc_id").cast("string"))
      val date = concat(lit("2024-03-01T10:15:"),
        lpad((col("doc_id") % 60).cast("string"), 2, "0"), lit("Z"))
      val body = concat(col("text"), lit("\nquote WARC/1.0 not a record"))
      val http = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n"),
        body)
      val warcinfo = lit("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
        "Content-Length: 17\r\n\r\nsoftware: graft\r\n\r\n\r\n")
      val resp = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
        lit("\r\nWARC-Date: "), date,
        lit("\r\nContent-Length: "), octet_length(http).cast("string"),
        lit("\r\n\r\n"), http, lit("\r\n\r\n"))
      val blobs = docs.select(encode(concat(warcinfo, resp), "UTF-8").as("blob"))
      Warc.records(blobs, "blob")
        .filter(col("record_type") === "response")
        .select(col("url"), col("warc_date"),
          decode(col("body"), "UTF-8").as("text_out"))
        .orderBy(col("url"))
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

    // unrestricted Damerau-Levenshtein over the candidate-pair stream —
    // the transposition-aware comparator (C1 family) hash-checked against
    // DuckDB's damerau_levenshtein at corpus scale; dl <= lev on every
    // row is the variant's defining inequality, asserted by the oracle
    // carrying both columns
    "q_damerau_pairs" -> ((s, dir) => {
      attachedNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          damerau_levenshtein(col("name_1"), col("name_2")).cast("long").as("dl"),
          levenshtein(col("name_1"), col("name_2")).cast("long").as("lev"))
    }),

    // Smith-Waterman local-alignment similarity (best matching
    // substrings) over a deterministic 1/199 pair slice. DuckDB has no
    // SW, so the oracle RUNS THE DP ITSELF: a recursive CTE marching
    // the anti-diagonal with the last two diagonals carried as list
    // columns (validated cell-for-cell against the kernel)
    "q_sw_pairs" -> ((s, dir) => {
      attachedNamePairs(s, dir)
        .filter(pmod(col("id1"), lit(199L)) === 0)
        .select(col("id1"), col("id2"),
          round(smith_waterman(col("name_1"), col("name_2")), 6).as("sw"))
        .orderBy(col("id1"), col("id2"))
    }),

    // affine-gap (Gotoh) comparator over the same 1/199 real-data slice
    // — upgrades C1's optional comparator from fixture-pinned
    // (q_affine_fixture) to DP-verified on real pairs: the DuckDB twin
    // RUNS the three-matrix Gotoh recurrence itself (V/I/J carried as
    // anti-diagonal list columns, boundaries by multiplication and
    // interiors by the kernel's exact left-associated additions, so
    // every cell is IEEE-identical). q_affine_scores stays the full-
    // surface rows-only run; this is its oracle-backed witness.
    "q_affine_dp" -> ((s, dir) => {
      attachedNamePairs(s, dir)
        .filter(pmod(col("id1"), lit(199L)) === 0)
        .select(col("id1"), col("id2"),
          round(affine_gap(col("name_1"), col("name_2")), 6).as("affine"))
        .orderBy(col("id1"), col("id2"))
    }),

    // isotonic calibration of pair scores against deterministic noisy
    // labels (match rate rises with jw by construction, mid-range noise
    // forces real pooling). Scores pool per rounded value, then PAV;
    // the oracle computes the SAME fit through the minimax identity
    // fit(x) = max_{i<=x} min_{j>=x} mean(y[i..j]) — every mean is an
    // integer/integer division, so values are bit-identical
    "q_isotonic" -> ((s, dir) => {
      val labeled = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.75 &&
          pmod(col("id1") + col("id2"), lit(31L)) === 0)
        .select(round(col("jw"), 3).as("s"),
          when(col("jw") >= 0.99, lit(1))
            .when(col("jw") >= 0.97,
              (pmod(col("id1") + col("id2"), lit(10L)) < 7).cast("int"))
            .otherwise(
              (pmod(col("id1") + col("id2"), lit(10L)) < 2).cast("int"))
            .as("lbl"))
      graft.score.Calibration.isotonicTable(labeled, "s", "lbl")
        .select(col("score"), col("n"),
          round(col("calibrated"), 6).as("calibrated"))
        .orderBy(col("score"))
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

    // MinHash-LSH near-dup pairs over derived pages. Oracle: frozen
    // observed table (xxhash64 minhashes opaque to DuckDB; kernel pinned
    // independently by the green q_minhash_fixture twin)
    "q_minhash_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val pages = PagesGen.fromDocuments(s, dir)
        .select(xxhash64(col("url")).as("id"), col("text"))
      TextOps.minhashDupePairs(pages, "id", "text", jaccardThreshold = 0.6)
        .orderBy(col("id1"), col("id2"))
    }),

    // SimHash near-dup pairs. Oracle: frozen observed table (xxhash64
    // simhash opaque to DuckDB; kernel pinned independently by the green
    // q_simhash_fixture twin)
    "q_simhash_dedup" -> ((s, dir) => {
      import graft.textops.TextOps
      val pages = PagesGen.fromDocuments(s, dir)
        .select(xxhash64(col("url")).as("id"), col("text"))
      TextOps.simhashDupePairs(pages, "id", "text", bands = 4, maxHamming = 8)
        .orderBy(col("id1"), col("id2"))
    }),

    // MinHash-LSH near-dup over a literal fixture, checked against an
    // INDEPENDENT DuckDB oracle that computes exact shingle-set Jaccard
    // over all pairs: on this fixture the banded LSH recalls every
    // above-threshold pair (verified, deterministic — fixed strings, fixed
    // seeds), so LSH-candidates ∩ verify == the exact answer
    "q_minhash_fixture" -> ((s, dir) => {
      import graft.textops.TextOps
      import s.implicits._
      val docs = nearDupFixtureDocs(s)
      TextOps.minhashDupePairs(docs, "id", "text", jaccardThreshold = 0.5)
        .orderBy(col("id1"), col("id2"))
    }),

    // SimHash banded near-dup over the same fixture — hamming verification
    // runs on internal 64-bit hashes, so the oracle freezes the expected
    // constant output (regression guard for simhash64 + banding)
    "q_simhash_fixture" -> ((s, dir) => {
      import graft.textops.TextOps
      import s.implicits._
      val docs = nearDupFixtureDocs(s)
      TextOps.simhashDupePairs(docs, "id", "text", bands = 4, maxHamming = 16)
        .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id1"), col("id2"))
    }),

    // block-combination simhash banding (the simhash_combo predicate's
    // kernel) over the shared fixture + one exact duplicate: combo keys
    // structurally guarantee any pair within hamming 3 shares a key (the
    // exact dup, hamming 0). Beyond-k pairs collide only when ALL their
    // differing bits concentrate in <= k blocks: the fixture's hamming-9
    // pair (1,2) does (one shared key), the hamming-8 pair (3,4) does not
    // — under plain 16-bit banding BOTH paired, via exactly the chance
    // collisions the combo kind suppresses at crawl scale.
    // xxhash64-based, so the oracle freezes the expected constant table.
    "q_simhash_combo_fixture" -> ((s, dir) => {
      import s.implicits._
      val docs = nearDupFixtureDocs(s).unionByName(
        Seq((6L, "unrelated third topic with nothing shared at all in common"))
          .toDF("id", "text"))
      val hashed = docs.select(col("id"),
        simhash64(tokens(lower(col("text")))).as("sh"))
      val blocks = hashed.select(col("id"),
        explode(array(
          graft.block.Blocking.simhashComboKeys(col("sh"), 6, 3): _*)).as("block_key"))
      val pairs = graft.pairs.PairGen.candidatePairs(blocks, 1000)
      graft.pairs.PairGen.attachFields(pairs, hashed, "id", Seq("sh"))
        .select(col("id1"), col("id2"),
          hamming64(col("sh_1"), col("sh_2")).cast("long").as("hamming"))
        .orderBy(col("id1"), col("id2"))
    }),

    // winnowing rolling-hash document fingerprints (Schleimer 2003) over
    // the shared near-dup fixture: fingerprint-set sizes + all positive
    // pairwise overlap similarities. xxhash64-based, so DuckDB cannot
    // recompute it — the oracle freezes the expected constant table
    // (regression guard, like q_metaphone_fixture)
    "q_winnow_fingerprint" -> ((s, dir) => {
      val fp = nearDupFixtureDocs(s)
        .select(col("id"), graft.textops.TextOps.winnowFingerprints(col("text")).as("fp"))
      val a = fp.select(col("id").as("id1"), col("fp").as("fp1"))
      val b = fp.select(col("id").as("id2"), col("fp").as("fp2"))
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(graft.textops.TextOps.winnowSimilarity(col("fp1"), col("fp2")), 6).as("sim"))
        .filter(col("sim") > 0)
        .orderBy(col("id1"), col("id2"))
    }),

    // train/eval n-gram decontamination (LLM-pipeline op): the eval set
    // is built INSIDE the query with deterministic spliced contamination
    // — each eval doc is its source doc's 80-char prefix plus a 120-char
    // fragment of the doc_id+1 partner — so the flagged (train, eval)
    // pairs are a pure function of the corpus and DuckDB rebuilds them
    // exactly. n=5 over the short word-salad docs; minHits=3 keeps
    // chance 5-gram collisions out; exact-dup families of the source or
    // partner get flagged too (wanted: a leak is a leak through a dup).
    // The maxTrainDocFreq boilerplate guard is semantically inert at
    // df>50 on this corpus (unit-tested with a literal fixture instead)
    // but runs for real, so the census+anti-join plumbing is oracle-
    // covered; the hashGrams shuffle-width variant is unit-asserted
    // equal to the string-gram plan.
    "q_decontaminate" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val evalDf = docs.as("e").filter(col("e.doc_id") % 7 === 3)
        .join(docs.as("p"), col("p.doc_id") === col("e.doc_id") + 1)
        .select(col("e.doc_id").as("doc_id"),
          concat_ws(" ", substring(col("e.text"), 1, 80),
            substring(col("p.text"), 1, 120)).as("text"))
      graft.textops.TextOps.ngramOverlap(docs, evalDf, "doc_id", "text",
          n = 5, minHits = 3L, maxTrainDocFreq = 50L)
        .orderBy(col("train_id"), col("eval_id"))
    }),

    // gazetteer: variant pages (messy) matched against base pages (canon)
    "q_gazetteer" -> ((s, dir) => {
      val pages = PagesGen.fromDocuments(s, dir)
      // one materialized prepare: the canon block census, both block-join
      // legs and the two field attaches are separate plan branches — each
      // would re-run the scan → normalize chain otherwise
      val prepared = Dedupe.widenIfNarrow(Dedupe.ephemeralSnapshot(s,
        Dedupe.prepare(pages).drop("html"), "gaz_prep"))
      val canon = prepared.filter(!col("url").endsWith("-v1"))
      val messy = prepared.filter(col("url").endsWith("-v1"))
      graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
          graft.pipeline.Gazetteer.Config(demoModel, nMatches = 1,
            maxCanonBlockSize = 200))
        .select(col("messy_id"), col("canon_id"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy(col("messy_id"))
    }),

    // ADVICE r4: an independently-derivable spot check on the frozen
    // q_gazetteer oracle, so the flagship surface is not pinned ONLY by
    // its own prior output. For pinned messy docs whose rank-1 canon is
    // the true parent, the score is re-derived from the raw parquet text
    // in BOTH engines: PagesGen's -v1 derivation collapses under
    // normalize_text to cnorm || ' © example inc', and the DuckDB twin
    // rebuilds exactly that, substitutes the 2-byte '©' with ASCII '@'
    // on both sides (DuckDB JW/levenshtein count UTF-8 bytes, ours
    // counts chars — the substitution makes byte math equal char math
    // without changing any distance), and pushes jw/lev_sim through the
    // demoModel sigmoid. Matching scores prove the frozen table's
    // numbers are what the model arithmetic says they should be, from
    // source data the system never touched.
    "q_gazetteer_spot" -> ((s, dir) => {
      val spotDocs = Seq(11L, 37L, 120L, 208L, 261L, 333L, 404L)
      val pages = PagesGen.fromDocuments(s, dir)
      val prepared = Dedupe.widenIfNarrow(Dedupe.ephemeralSnapshot(s,
        Dedupe.prepare(pages).drop("html"), "gaz_spot_prep"))
      val canon = prepared.filter(!col("url").endsWith("-v1"))
      // messy side pre-filtered to the pinned docs: each messy record's
      // blocking, scoring, and rank-1 pick are independent of other
      // messy rows (the window partitions by messy_id) and the canon
      // block census is canon-side only, so the 7 output rows are
      // IDENTICAL to the full run's — this just stops paying the other
      // ~2000 messy records' matching to read 7 rows
      val messy = prepared.filter(col("url").isin(
        spotDocs.map(d => s"https://docs.example/$d-v1"): _*))
      val matched = graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
        graft.pipeline.Gazetteer.Config(demoModel, nMatches = 1,
          maxCanonBlockSize = 200))
      val urls = prepared.select(col("id"), col("url"))
      // rlike prefilters before the ANSI cast: the other side's urls
      // produce '' from regexp_extract, which ANSI-cast refuses
      matched
        .join(urls.filter(col("url").rlike("/\\d+-v1$"))
          .select(col("id").as("messy_id"),
            regexp_extract(col("url"), "/(\\d+)-v1$", 1).cast("long").as("doc_id")),
          Seq("messy_id"))
        .join(urls.filter(col("url").rlike("/\\d+$"))
          .select(col("id").as("canon_id"),
            regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("canon_doc")),
          Seq("canon_id"))
        .filter(col("doc_id").isin(spotDocs: _*))
        .select(col("doc_id"), col("canon_doc"),
          round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))
    }),

    // S5 session metrics + per-partition lineage as a QUERY: the
    // flagship runs over a deterministic sub-corpus with a checkpoint
    // dir, then the PERSISTED artifacts ($ckpt/metrics/{scored_pairs,
    // labels,run}) are read back and projected to their
    // partition-independent content — per-stage lineage row TOTALS (the
    // per-partition split is layout-private by design) and the one-row
    // scoring-metrics table unpivoted to (metric, value). Frozen oracle
    // (freezer-verified stable across local[8]/local[32]): the S5
    // artifacts are oracle-pinned, not just unit-tested.
    "q_lineage" -> ((s, dir) => {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_q_lineage").toString
      val pages = PagesGen.fromDocuments(s, dir)
        .filter(pmod(xxhash64(col("url")), lit(7L)) === 0)
      val res = Dedupe.run(s, pages, Dedupe.Config(demoModel,
        checkpointDir = Some(ckpt), collectMetrics = true))
      // run() writes every S5 artifact eagerly; nothing to force
      Dedupe.cleanupScratch(s, res)
      def lineageTotal(stage: String) =
        s.read.parquet(s"$ckpt/metrics/$stage")
          .agg(coalesce(sum(col("n_rows")), lit(0L)).as("value"))
          .select(lit(s"lineage_${stage}_rows").as("metric"), col("value"))
      val runMetrics = s.read.parquet(s"$ckpt/metrics/run").selectExpr(
        """stack(9,
          |  'records', records, 'exact_groups', exactGroups,
          |  'block_keys', blockKeys, 'plural_keys', pluralKeys,
          |  'capped_keys', cappedKeys, 'candidate_pairs', candidatePairs,
          |  'edges_above_theta', edgesAboveTheta, 'entities', entities,
          |  'cc_iterations', cast(ccIterations AS bigint)
          |) AS (metric, value)""".stripMargin)
      // ADVICE r5: the metrics artifacts are partition-count-sized —
      // materialize the projected rows eagerly and remove the whole temp
      // checkpoint dir (pairs snapshot included) instead of leaking it
      val outRows = lineageTotal("scored_pairs").unionByName(lineageTotal("labels"))
        .unionByName(runMetrics)
        .orderBy(col("metric"))
        .localCheckpoint(true)
      graft.pipeline.Dedupe.deleteScratchPath(s, ckpt)
      outRows
    }),

    // T1 blocked training sampling at the real pair surface. The
    // pre-thinning is a seeded HASH THRESHOLD (partition-free since the
    // round-5 rewrite — df.sample seeds per partition, so the labeled
    // sample used to move with partition layout), and the final pick is
    // hash-ordered-limit: the whole query is a pure function of
    // (data, seed), so the scale path carries a frozen observed oracle
    // (stability across local[8]/local[32] verified by the freezer);
    // TrainingSpec pins seed-determinism and the blocked/random split
    "q_training_sample" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"))
      val blocked = attachedNamePairs(s, dir).select(col("id1"), col("id2"))
      graft.score.Training.samplePairsForLabeling(recs, blocked,
          nBlocked = 40, nRandom = 20, seed = 7L)
        .orderBy(col("id1"), col("id2"))
    }),

    // S4 bucketed entity sink as a QUERY: write→read round trip through
    // TableIO.writeBucketed (bucket = pmod(xxhash64(component), 8) — the
    // path-layout contract point lookups depend on), digested per
    // bucket. Deterministic: seed-free range data + a pure hash of
    // literal component ids, so the frozen oracle pins the layout, the
    // bucket assignment, and the round trip's losslessness (counts +
    // id sums must survive the write)
    "q_bucketed_sink" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_q_sink").toString
      val entities = s.range(0, 1000).toDF("id")
        .withColumn("component", pmod(col("id"), lit(37L)))
      graft.io.TableIO.writeBucketed(entities, graft.io.TableIO.Path(out),
        bucketCol = "component", numBuckets = 8)
      // ADVICE r5: materialize the 8-row digest eagerly, then delete the
      // temp sink — repeated bench rounds otherwise accumulate temp dirs
      val digest = s.read.parquet(out)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          countDistinct(col("component")).as("n_components"))
        .orderBy(col("bucket"))
        .localCheckpoint(true)
      graft.pipeline.Dedupe.deleteScratchPath(s, out)
      digest
    }),

    // multimodal plumbing: batched feature extraction over binary columns.
    // Green-checkable: the deterministic decode stub is a byte histogram,
    // so DuckDB reproduces bins from the (all-ASCII) source text — feat0 =
    // control-char bin (empty-bin correctness), feat6 = the 0x60-0x6f bin
    // (varies per doc), feat_sum = 1.0 (normalization)
    "q_media_features" -> ((s, dir) => {
      val media = graft.multimodal.Media.fakeMediaFromDocuments(s, dir)
      graft.multimodal.Media.extractFeatures(media)
        .select(col("media_id"), col("kind"),
          round(aggregate(col("features"), lit(0.0d), (a, x) => a + x), 6).as("feat_sum"),
          round(element_at(col("features"), 1), 6).as("feat0"),
          round(element_at(col("features"), 7), 6).as("feat6"))
        .orderBy(col("media_id"))
    }),

    // REAL media decode for every format a pure JVM parses without
    // native codec libs (RIFF/WAVE PCM-16, BMP 24bpp via spec parsers;
    // PNG + JPEG via the JDK's bundled ImageIO plugins) — the rows
    // where the "decoder honestly stubbed" caveat no longer applies.
    // The fixture is literal spec-conformant writer output (MediaGen):
    // mono + stereo-behind-a-decoy-LIST-chunk WAVs, bottom-up padded +
    // top-down BMPs, a gradient PNG (lossless → means computable a
    // priori), a solid-gray JPEG (DC-only blocks → the lossy codec
    // still roundtrips the color exactly, CodecsSpec-verified), and an
    // unparseable payload that must degrade to format='unknown', and an
    // AVI whose stream-header geometry surfaces as width/height/bits
    // (per-frame pixel features live in q_video_vhash).
    // Constant input → constant output → green VALUES oracle (the
    // q_hac_refine pattern); the signal/pixel math is independently
    // hand-checked in CodecsSpec.
    "q_media_decode" -> ((s, dir) => {
      import graft.fixtures.MediaGen
      import s.implicits._
      val media = Seq(
        (1L, MediaGen.wav(Seq[Short](0, 1000, -1000, 0), 8000, 1)),
        (2L, MediaGen.wav(Seq[Short](100, -100, 200, -200), 44100, 2,
          extraChunk = true)),
        (3L, MediaGen.bmp(2, 2,
          Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)))),
        (4L, MediaGen.bmp(3, 1, Seq((1, 2, 3), (4, 5, 6), (7, 8, 9)),
          topDown = true)),
        (5L, "plain text payload".getBytes("UTF-8")),
        (6L, MediaGen.png(2, 2,
          Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)))),
        (7L, MediaGen.jpegSolid(16, 16, 128, 128, 128)),
        (8L, MediaGen.avi(9, 8, "DIB ",
          Seq(MediaGen.dibFrame(9, 8, Seq.fill(72)((1, 2, 3)))))))
        .toDF("media_id", "bytes")
      graft.multimodal.Media.decodeTable(media).orderBy(col("media_id"))
    }),

    // perceptual image hashing (dHash 9×8 box-mean difference hash —
    // the image-side near-dup signature, ImageHash.scala): every
    // constant is ANALYTICALLY derived, not transcribed from a run —
    // a left-to-right gradient sets every bit (-1), a solid image none
    // (0), alternating columns give 0x55 per row, a half-up/half-down
    // split sets exactly the top 32 bits (-4294967296, written in BOTH
    // BMP row layouts to pin the bottom-up flip), the 18×16 gradient
    // exercises box averaging to the same hash as its 9×8 twin, and
    // the PNG twin of the gradient pins BMP/ImageIO decoder geometry
    // equality. Non-images and sub-grid images carry null hashes.
    "q_image_dhash" -> ((s, dir) => {
      import graft.fixtures.MediaGen
      import s.implicits._
      def grid(vOf: Int => Int): Seq[(Int, Int, Int)] =
        (0 until 8).flatMap(_ => (0 until 9).map { x =>
          val v = vOf(x); (v, v, v) })
      val split = (0 until 8).flatMap(y => (0 until 9).map { x =>
        val v = if (y < 4) x * 10 else (8 - x) * 10; (v, v, v) })
      val media = Seq(
        (1L, MediaGen.bmp(9, 8, grid(x => x * 10))),
        (2L, MediaGen.bmp(9, 8, Seq.fill(72)((128, 128, 128)))),
        (3L, MediaGen.bmp(9, 8, grid(x => if (x % 2 == 0) 200 else 100))),
        (4L, MediaGen.bmp(18, 16, (0 until 16).flatMap(_ =>
          (0 until 18).map { x => val v = (x / 2) * 10; (v, v, v) }))),
        (5L, MediaGen.png(9, 8, grid(x => x * 10))),
        (6L, MediaGen.png(9, 8, grid(x => (8 - x) * 10))),
        (7L, MediaGen.jpegSolid(16, 16, 128, 128, 128)),
        (8L, "not an image".getBytes("UTF-8")),
        (9L, MediaGen.bmp(4, 4, Seq.fill(16)((1, 2, 3)))),
        (10L, MediaGen.bmp(9, 8, split)),
        (11L, MediaGen.bmp(9, 8, split, topDown = true)))
        .toDF("media_id", "bytes")
      graft.multimodal.Media.imageHashTable(media).orderBy(col("media_id"))
    }),

    // perceptual audio fingerprinting (eHash — 65 frame energies, one
    // sign-of-delta bit per adjacent pair, AudioHash.scala), completing
    // the modality triple on the shared Hamming kernel. Constants
    // derived on paper exactly like q_image_dhash: monotone energy ramp
    // sets every bit (-1), constant energy none (0), alternating
    // loud/quiet frames give 0x5555..., ramp-up-then-down sets exactly
    // the top 32 bits (the k=32/33 boundary frames have EQUAL energy,
    // so the strictly-less bit stays 0); a stereo clip behind a decoy
    // LIST chunk pins the shared RIFF walk; sub-frame clips and
    // non-audio payloads carry null hashes.
    "q_audio_ehash" -> ((s, dir) => {
      import graft.fixtures.MediaGen
      import s.implicits._
      def frames(ampOf: Int => Int): Seq[Short] =
        (0 until 65).flatMap(k => Seq.fill(16)(ampOf(k).toShort))
      val media = Seq(
        (1L, MediaGen.wav(Seq.fill(1040)(1000.toShort), 8000, 1)),
        (2L, MediaGen.wav(Seq.tabulate(1040)(i => i.toShort), 8000, 1)),
        (3L, MediaGen.wav(frames(k => if (k % 2 == 0) 2000 else 100), 8000, 1)),
        (4L, MediaGen.wav(frames(k => if (k <= 32) k * 30 else (65 - k) * 30),
          8000, 1)),
        (5L, MediaGen.wav(Seq.fill(1040)(500.toShort), 44100, 2,
          extraChunk = true)),
        (6L, MediaGen.wav(Seq.fill(64)(100.toShort), 8000, 1)),
        (7L, "not audio".getBytes("UTF-8")),
        (8L, MediaGen.bmp(2, 2, Seq.fill(4)((9, 9, 9)))))
        .toDF("media_id", "bytes")
      graft.multimodal.Media.audioHashTable(media).orderBy(col("media_id"))
    }),

    // video keyframe dHash (AVI container walk → per-frame image dHash,
    // VideoHash.scala) — the FOURTH modality on the shared Hamming
    // kernel. Constants are the same analytic 9×8 patterns q_image_dhash
    // pins, carried as video frames: a gradient DIB frame sets every bit
    // (-1), a solid frame none (0), alternating columns 0x5555…; the
    // MJPEG row is a solid 16×16 JPEG whose dHash is 0 by construction
    // (equal box means compare strictly-less) independent of the JPEG
    // decoder; the audio-first AVI pins stream numbering (frames are
    // '01db' there), the JUNK row pins the length-driven walk against a
    // decoy '00db' banner, and non-video payloads carry null frame rows.
    "q_video_vhash" -> ((s, dir) => {
      import graft.fixtures.MediaGen
      import s.implicits._
      def grid(vOf: Int => Int): Seq[(Int, Int, Int)] =
        (0 until 8).flatMap(_ => (0 until 9).map { x =>
          val v = vOf(x); (v, v, v) })
      val grad = MediaGen.dibFrame(9, 8, grid(x => x * 10))
      val solid = MediaGen.dibFrame(9, 8, Seq.fill(72)((128, 128, 128)))
      val alt = MediaGen.dibFrame(9, 8, grid(x => if (x % 2 == 0) 200 else 100))
      val media = Seq(
        (1L, MediaGen.avi(9, 8, "DIB ", Seq(grad, solid, alt))),
        (2L, MediaGen.avi(16, 16, "MJPG",
          Seq(MediaGen.jpegSolid(16, 16, 128, 128, 128)))),
        (3L, MediaGen.avi(9, 8, "DIB ", Seq(grad), audioFirst = true)),
        (4L, MediaGen.avi(9, 8, "DIB ", Seq(solid, grad), junk = true)),
        (5L, "not a video".getBytes("UTF-8")),
        (6L, MediaGen.wav(Seq[Short](0, 1, 2, 3), 8000, 1)))
        .toDF("media_id", "bytes")
      graft.multimodal.Media.videoHashTable(media)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // the ONE-CALL multimodal near-dup API (Media.nearDupPairs): a
    // mixed media table — modality detected per row, hashed by the
    // right kernel (image dHash / audio eHash / video keyframe dHash),
    // joined WITHIN modality on the shared banded Hamming kernel.
    // Analytic expectations: the PNG and BMP render the same gradient
    // (decoder-geometry equality → equal dHash → image pair at 0), two
    // gains of one envelope share an eHash (audio pair at 0), the two
    // clips match on both sampled frames (video pair, min_hamming 0,
    // frames_matched 2). The PLANTED CROSS-MODALITY COLLISION — a solid
    // image (dHash 0) and a constant clip (eHash 0) — must NOT pair:
    // signatures never cross modalities.
    "q_media_neardup" -> ((s, dir) => {
      import graft.fixtures.MediaGen
      import s.implicits._
      def grid(vOf: Int => Int): Seq[(Int, Int, Int)] =
        (0 until 8).flatMap(_ => (0 until 9).map { x =>
          val v = vOf(x); (v, v, v) })
      def env(ampOf: Int => Int): Seq[Short] =
        (0 until 65).flatMap(k => Seq.fill(16)(ampOf(k).toShort))
      val grad = MediaGen.dibFrame(9, 8, grid(x => x * 10))
      val gradHam1 = MediaGen.dibFrame(9, 8,
        (0 until 8).flatMap(y => (0 until 9).map { x =>
          val v = if (y == 0 && x == 8) 70 else x * 10; (v, v, v) }))
      val solid = MediaGen.dibFrame(9, 8, Seq.fill(72)((128, 128, 128)))
      val media = Seq(
        (1L, MediaGen.png(9, 8, grid(x => x * 10))),
        (2L, MediaGen.bmp(9, 8, grid(x => x * 10))),
        (3L, MediaGen.bmp(9, 8, Seq.fill(72)((128, 128, 128)))),
        (4L, MediaGen.wav(env(k => (k % 13) * 7 + 5), 8000, 1)),
        (5L, MediaGen.wav(env(k => ((k % 13) * 7 + 5) * 2), 8000, 1)),
        (6L, MediaGen.wav(Seq.fill(1040)(1000.toShort), 8000, 1)),
        (7L, MediaGen.avi(9, 8, "DIB ", Seq(grad, solid))),
        (8L, MediaGen.avi(9, 8, "DIB ", Seq(gradHam1, solid))),
        (9L, "no modality here".getBytes("UTF-8")))
        .toDF("media_id", "bytes")
      graft.multimodal.Media.nearDupPairs(media, maxBucketSize = 100)
        .orderBy(col("modality"), col("id1"), col("id2"))
    }),

    // clip-level video near-dup: keyframe dHashes through the SAME
    // banded Hamming join as text/image/audio, folded to clip pairs.
    // Hand-derived: clip 20 is clip 10 with ONE boundary-cell
    // perturbation in frame 0 (row 0's col-8 box drops to col-7's
    // value, so exactly the (row0, 7 vs 8) comparison flips — analytic
    // hamming 1); the solid second frames match at hamming 0 → the pair
    // matches on 2 sampled frames with min_hamming 0. Clip 30's
    // alternating frame sits 32 bits from both patterns → no pair.
    "q_video_neardup" -> ((s, dir) => {
      import graft.fixtures.MediaGen
      import s.implicits._
      def grid(vOf: Int => Int): Seq[(Int, Int, Int)] =
        (0 until 8).flatMap(_ => (0 until 9).map { x =>
          val v = vOf(x); (v, v, v) })
      val grad = MediaGen.dibFrame(9, 8, grid(x => x * 10))
      val gradHam1 = MediaGen.dibFrame(9, 8,
        (0 until 8).flatMap(y => (0 until 9).map { x =>
          val v = if (y == 0 && x == 8) 70 else x * 10; (v, v, v) }))
      val solid = MediaGen.dibFrame(9, 8, Seq.fill(72)((128, 128, 128)))
      val alt = MediaGen.dibFrame(9, 8, grid(x => if (x % 2 == 0) 200 else 100))
      val media = Seq(
        (10L, MediaGen.avi(9, 8, "DIB ", Seq(grad, solid))),
        (20L, MediaGen.avi(9, 8, "DIB ", Seq(gradHam1, solid))),
        (30L, MediaGen.avi(9, 8, "DIB ", Seq(alt))))
        .toDF("media_id", "bytes")
      graft.multimodal.Media.videoNearDupPairs(media, maxBucketSize = 100)
        .orderBy(col("id1"), col("id2"))
    }),

    // the banded Hamming near-dup join (the kernel under text simhash
    // near-dup AND image dHash near-dup) against a signature table BOTH
    // engines derive from the same 31+32-bit mixing arithmetic (no
    // hash-function opacity — every operation is ANSI SQL), with
    // two-bit-flipped partners planted every 5th base row. bands=4 >
    // maxHamming=3, so banding recall is structural (pigeonhole) and
    // the Spark output must equal DuckDB's brute-force
    // bit_count(xor) <= 3 over all ~1.6M pairs exactly.
    "q_hamming_neardup" -> ((s, dir) => {
      def shOf(i: Column): Column =
        pmod(i * lit(2654435761L), lit(2147483648L)) * lit(4294967296L) +
          pmod((i * lit(40503L) + lit(12345L)) * lit(65537L), lit(4294967296L))
      val base = s.range(0, 1500).select(col("id"), shOf(col("id")).as("sh"))
      val planted = s.range(0, 300).select((col("id") * 5).as("b"))
        .select((col("b") + 100000L).as("id"),
          shOf(col("b")).bitwiseXOR(
            expr("shiftleft(1L, cast(b % 60 as int))").bitwiseXOR(
              expr("shiftleft(1L, cast((b*7+13) % 60 as int))"))).as("sh"))
      graft.textops.TextOps.hammingNearDupPairs(
          base.unionByName(planted), bands = 4, maxHamming = 3,
          maxBucketSize = 10000)
        .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id1"), col("id2"))
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

    // threshold selection (C11) from the score histogram — single row.
    // Reuses the memoized JW+Lev snapshot (identical values; recomputing
    // 47M comparator pairs here was ~100 s at sf0.1).
    "q_threshold" -> ((s, dir) => {
      import s.implicits._
      val scored = scoredNamePairs(s, dir)
        .withColumn("score", lit(1.0) / (lit(1.0) +
          exp(-(lit(-8.0) + lit(9.0) * col("jw") + lit(6.0) * col("lev_sim")))))
      Seq(graft.score.Threshold.select(scored)).toDF("theta")
    }),

    // T2 active-learning batch selection: the next pairs a human should
    // label = the candidates the current LR model is least certain about,
    // ranked by |logit| (monotone twin of |sigma-0.5| without exp() in the
    // sort key), per-record diversity cap via mutual endpoint rank.
    // Reuses the memoized JW+Lev snapshot like q_threshold.
    "q_uncertain_batch" -> ((s, dir) => {
      val scored = scoredNamePairs(s, dir)
        .withColumn("z",
          lit(-8.0) + lit(9.0) * col("jw") + lit(6.0) * col("lev_sim"))
        .select(col("id1"), col("id2"), col("z"))
      graft.score.Training.uncertainBatch(scored, batchSize = 100)
        .select(col("id1"), col("id2"), round(col("z"), 6).as("z"))
    }),

    // SURVEY §3.3 — the composed active-learning ROUND-TRIP, the
    // reference's get-unlabeled -> mark-pair -> train -> re-rank loop
    // as ONE oracle-checked query: select the uncertain batch under the
    // prior model, apply golden labels (the deterministic stand-in for
    // the human: y = [jw >= 0.63], a cut inside the batch's score
    // range so BOTH classes appear), refit two quantized GD steps
    // (Training.fitLRQuantized — the GradLR micro-unit determinism
    // contract, so the whole TRAINING RUN is engine-reproducible),
    // re-score EVERY candidate pair with the refit weights, and
    // re-select the next uncertain batch. The DuckDB twin unrolls the
    // entire loop including both gradient steps.
    "q_al_round" -> ((s, dir) => {
      val feats = scoredNamePairs(s, dir)
        .select(col("id1"), col("id2"), col("jw"), col("lev_sim"))
      val prior = feats.select(col("id1"), col("id2"),
        (lit(-8.0) + lit(9.0) * col("jw") + lit(6.0) * col("lev_sim")).as("z"))
      val batch = graft.score.Training.uncertainBatch(prior, batchSize = 100)
      // materialize the 100-row labeled batch ONCE: fitLRQuantized runs
      // one aggregate action per gradient iteration, and each action on
      // the lazy plan would re-run the whole 47M-pair batch selection —
      // measured 2 × ~8 s of the query's 33 s at sf0.1
      val labeled = graft.pipeline.Dedupe.ephemeralSnapshot(s,
        batch.select("id1", "id2")
          .join(feats, Seq("id1", "id2"))
          .withColumn("y", when(col("jw") >= 0.63, 1.0).otherwise(0.0)),
        "al_labeled")
      val w = graft.score.Training.fitLRQuantized(
        labeled, Seq("jw", "lev_sim"), "y", iters = 2, learnRate = 10.0)
      val margin =
        round(col("jw") * lit(1e6), 0).cast("long") * lit(w("jw")) +
          round(col("lev_sim") * lit(1e6), 0).cast("long") * lit(w("lev_sim")) +
          lit(1000000L) * lit(w("__bias__"))
      val rescored = feats.select(col("id1"), col("id2"),
        (margin.cast("double") / lit(1e12)).as("z"))
      graft.score.Training.uncertainBatch(rescored, batchSize = 100)
        .select(col("id1"), col("id2"), round(col("z"), 6).as("z"))
    }),

    // per-component HAC refinement (G3) over deterministic weak-bridge edges
    "q_hac_refine" -> ((s, dir) => {
      import s.implicits._
      val edges = Seq(
        (1L, 2L, 0.95), (3L, 4L, 0.95), (2L, 3L, 0.35), // bridged → splits
        (10L, 11L, 0.9), (11L, 12L, 0.85), (10L, 12L, 0.8)) // tight → holds
        .toDF("id1", "id2", "score")
      val labels = graft.cluster.ConnectedComponents.labels(
        edges.select("id1", "id2"))
      graft.cluster.Hierarchical.refine(labels, edges, cut = 0.5)
        .orderBy(col("id"))
    }),

    // affine-gap comparator (C1 reference parity option) at the FULL pair
    // surface. Output is a 64-bucket digest covering every one of the
    // ~468k pairs: n_pairs, the exact long sum of micro-quantized scores,
    // and a bit_xor of per-pair (id1,id2,micro) hashes — any single
    // score drift or pair-set change flips at least one bucket row. A
    // digest (not raw rows) because 468k rows are too large to freeze as
    // a VALUES oracle and the Gotoh DP too slow to re-run 468k× in
    // DuckDB; q_affine_dp DOES re-run it cell-for-cell over its slice and
    // q_affine_fixture pins the kernel on literals. All digest columns
    // are integer-exact (long sums/xors commute), so the frozen observed
    // oracle (FrozenOracles) is partition-order-proof by construction.
    "q_affine_scores" -> ((s, dir) => {
      attachedNamePairs(s, dir)
        .select(col("id1"), col("id2"),
          round(affine_gap(col("name_1"), col("name_2")) * 1000000.0, 0)
            .cast("long").as("micro"))
        .groupBy(pmod(xxhash64(col("id1"), col("id2")), lit(64L)).as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("micro")).as("sum_micro"),
          expr("bit_xor(xxhash64(id1, id2, micro))").as("sig"))
        .orderBy(col("bucket"))
    }),

    // phonetic (double-metaphone) blocking keys (B12). Oracle: frozen
    // observed table (DuckDB has no metaphone; codes pinned independently
    // by the green q_metaphone_fixture VALUES twin)
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
    }),

    // TF-IDF cosine comparator (C2) over the blocked name pairs
    "q_tfidf_cosine" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val vecs = graft.score.Scoring.withTfidfVectors(recs, "name", "id")
        .select(col("id"), col("name_tfidf"))
      attachedNamePairs(s, dir).select(col("id1"), col("id2"))
        .join(vecs.select(col("id").as("id1"), col("name_tfidf").as("v1")), "id1")
        .join(vecs.select(col("id").as("id2"), col("name_tfidf").as("v2")), "id2")
        .select(col("id1"), col("id2"),
          round(graft.score.Scoring.tfidfCosine(col("v1"), col("v2")), 6).as("cos"))
    }),

    // gazetteer restricted to token blocking + a pure-JW model so DuckDB
    // can oracle the whole path (J4+G8 green twin of q_gazetteer)
    "q_gazetteer_jw" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val messy = recs.filter(col("id") % 2 === 1)
      val canon = recs.filter(col("id") % 2 === 0)
      val m = Model(bias = -8.0, weights = Map("jw_name" -> 12.0), threshold = 0.5,
        predicates = Seq(PredicateSpec("token", "name")))
      graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
          graft.pipeline.Gazetteer.Config(m, nMatches = 2, maxCanonBlockSize = 1000))
        .select(col("messy_id"), col("canon_id"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy(col("messy_id"), col("rank"))
    }),

    // the full multi-feature LR gazetteer path, oracle-green end to end
    // (round-2 verdict stretch item): token-only blocking so DuckDB can
    // twin the candidate set, but the MODEL is the real thing — three
    // comparator families (JW + normalized Levenshtein + exact dummy)
    // through Scoring's feature registry and the σ(w·f+b) classifier,
    // oversize-block drop and top-n window included
    "q_gazetteer_model" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"),
          normalize_text(col("p_name")).as("name"),
          normalize_text(col("p_brand")).as("brand"))
      val messy = recs.filter(col("id") % 2 === 1)
      val canon = recs.filter(col("id") % 2 === 0)
      val m = Model(bias = -10.0,
        weights = Map("jw_name" -> 9.0, "lev_name" -> 4.0, "exact_brand" -> 1.5),
        threshold = 0.5,
        predicates = Seq(PredicateSpec("token", "name")))
      graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
          graft.pipeline.Gazetteer.Config(m, nMatches = 2, maxCanonBlockSize = 1000))
        .select(col("messy_id"), col("canon_id"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy(col("messy_id"), col("rank"))
    }),

    // §2.6 G10: one-to-one record linkage (unique assignment) over the
    // same gazetteer surface as q_gazetteer_jw. Oracle: frozen observed
    // table (iterative matching is not SQL-expressible); greedy-equality
    // is pinned independently by the green fixture twin below +
    // OneToOneSpec's sequential-greedy fuzz
    "q_one_to_one" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
      val messy = recs.filter(col("id") % 2 === 1)
      val canon = recs.filter(col("id") % 2 === 0)
      val m = Model(bias = -8.0, weights = Map("jw_name" -> 12.0), threshold = 0.5,
        predicates = Seq(PredicateSpec("token", "name")))
      val scored = graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
          graft.pipeline.Gazetteer.Config(m, nMatches = 2, maxCanonBlockSize = 1000))
        .select(col("messy_id").as("id1"), col("canon_id").as("id2"), col("score"))
      graft.cluster.OneToOne.greedyMatch(scored, bipartite = true).pairs
        .select(col("id1"), col("id2"), round(col("score"), 6).as("score"))
        .orderBy(col("id1"), col("id2"))
    }),

    // frozen 6-edge fixture: expected output = the sequential greedy
    // matching under (score desc, id1, id2), a constant — the VALUES
    // oracle makes the locally-dominant iteration's greedy equality a
    // green regression guard (same pattern as q_hac_refine)
    "q_one_to_one_fixture" -> ((s, dir) => {
      import s.implicits._
      val edges = Seq(
        (1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 10L, 0.85),
        (2L, 11L, 0.7), (3L, 11L, 0.6), (3L, 12L, 0.95))
        .toDF("id1", "id2", "score")
      graft.cluster.OneToOne.greedyMatch(edges, bipartite = true).pairs
        .orderBy(col("id1"))
    }),

    // §2.9 incremental CC at crawl cadence: batch-1 star edges give each
    // custkey%150 group its min-member label; batch-2 edges then join each
    // even group's min to the next odd group's min. The construction keeps
    // the FULL-recompute answer in closed form — component = min custkey
    // over the (grp div 2) super-group — so DuckDB can state it without
    // iterating, making incrementalLabelAll == CC(E1 ∪ E2) a green row at
    // parquet scale (IncrementalCCSpec fuzz-asserts the general equality)
    "q_incr_cc" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("id"),
          pmod(col("c_custkey"), lit(150)).as("grp"))
      val gmin = c.groupBy("grp").agg(min(col("id")).as("gmin"))
      val batch1 = c.join(gmin, "grp").filter(col("id") =!= col("gmin"))
        .select(col("id").as("id1"), col("gmin").as("id2"))
      val prev = graft.cluster.ConnectedComponents.labelAll(
        c.select("id"), "id", batch1)
      val even = gmin.filter(pmod(col("grp"), lit(2)) === 0)
        .select(floor(col("grp") / 2).as("pg"), col("gmin").as("id1"))
      val odd = gmin.filter(pmod(col("grp"), lit(2)) === 1)
        .select(floor(col("grp") / 2).as("pg"), col("gmin").as("id2"))
      val batch2 = even.join(odd, "pg").select("id1", "id2")
      graft.cluster.ConnectedComponents.incrementalLabelAll(prev, batch2)
        .orderBy(col("id"))
    }),

    // §2.9 snapshot-to-snapshot entity reconciliation: two deterministic
    // labelings of customer (10-wide id windows, the new one shifted by 3)
    // exercise plurality pick + the status taxonomy; fully SQL-expressible
    "q_crosswalk" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val old = c.select(col("c_custkey").as("id"),
        floor(col("c_custkey") / 10).as("component"))
      val nw = c.select(col("c_custkey").as("id"),
        floor((col("c_custkey") + 3) / 10).as("component"))
      graft.cluster.Crosswalk.crosswalk(old, nw)
        .orderBy(col("component_new"))
    }),

    // chance-corrected agreement between the two q_crosswalk labelings:
    // Rand + Hubert-Arabie adjusted Rand from the exact contingency
    // pair-count sums (decimal internally, longs out) — the quantitative
    // companion to the crosswalk's per-entity taxonomy
    "q_ari" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val old = c.select(col("c_custkey").as("id"),
        floor(col("c_custkey") / 10).as("component"))
      val nw = c.select(col("c_custkey").as("id"),
        floor((col("c_custkey") + 3) / 10).as("component"))
      graft.cluster.ClusterEval.adjustedRand(old, nw)
    }),

    // B-cubed precision/recall/F1 over the same pair of labelings —
    // the per-record agreement metric ER pairs with pairwise F1;
    // per-cell contributions quantized to 1e-6 micro-units so the sum
    // is partitioning-order-independent (DuckDB twin does the same)
    "q_bcubed" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val pred = c.select(col("c_custkey").as("id"),
        floor(col("c_custkey") / 10).as("component"))
      val truth = c.select(col("c_custkey").as("id"),
        floor((col("c_custkey") + 3) / 10).as("component"))
      graft.cluster.ClusterEval.bcubed(pred, truth)
    }),

    // persistent entity ids across re-clustering: winner-takes-the-old-id,
    // split losers keep fresh ids (same shifted labelings as q_crosswalk)
    "q_stable_ids" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val old = c.select(col("c_custkey").as("id"),
        floor(col("c_custkey") / 10).as("component"))
      val nw = c.select(col("c_custkey").as("id"),
        floor((col("c_custkey") + 3) / 10).as("component"))
      graft.cluster.Crosswalk.stableIds(old, nw).orderBy(col("id"))
    }),

    // cannot-link enforcement (binding human "distinct" labels) over a
    // frozen fixture: chain 1-2-3-4 (all 0.9) with cannot-link (1,4)
    // splits at the weakest constrained merge; component {10,11} is
    // untouched. Constant expected output → VALUES oracle green row
    // (ConstraintsSpec fuzz-asserts the general invariants)
    "q_cannot_link_fixture" -> ((s, dir) => {
      import s.implicits._
      val scored = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (3L, 4L, 0.9),
        (10L, 11L, 0.9)).toDF("id1", "id2", "score")
      val labels = graft.cluster.ConnectedComponents.labels(
        scored.select("id1", "id2"))
      graft.cluster.Constraints.enforceCannotLink(
          labels, scored, Seq((1L, 4L)).toDF("id1", "id2"))
        .orderBy(col("id"))
    }),

    // double-metaphone codes over a literal fixture (B12). DuckDB has no
    // phonetic functions, so the oracle is the frozen expected code table —
    // spot values match the published DoubleMetaphone behavior (smith→SM0,
    // schmidt→XMT, thompson→TMPS, ...), making this a regression guard for
    // the commons-codec integration rather than rows-only coverage
    "q_metaphone_fixture" -> ((s, dir) => {
      import s.implicits._
      val recs = Seq(
        (1L, "smith johnson"),
        (2L, "schmidt thompson"),
        (3L, "wright knight"),
        (4L, "garcia gonzalez")).toDF("id", "name")
      graft.block.Blocking.blockingMap(
          recs, Seq(PredicateSpec("metaphone", "name")), "id")
        .orderBy(col("id"), col("block_key"))
    }),

    // normalized affine-gap distances over a literal fixture (optional C1
    // comparator; no DuckDB twin exists, so the oracle freezes the Gotoh
    // DP's expected values — identical strings anchor at 0.25 =
    // (n·match)/(2n) with the affinegap library's published weights)
    "q_affine_fixture" -> ((s, dir) => {
      import s.implicits._
      val pairs = Seq(
        (1L, "same string", "same string"),
        (2L, "kitten", "sitting"),
        (3L, "acme corp", "acme corporation"),
        (4L, "abc", ""),
        (5L, "prefix gap suffix", "prefix suffix")).toDF("id", "a", "b")
      pairs.select(col("id"), round(affine_gap(col("a"), col("b")), 6).as("affine"))
        .orderBy(col("id"))
    }),

    // END-TO-END pipeline GREEN twin: exact pre-group (G1) → prepare (P1)
    // → token blocking (B2) → pair-gen (J1-J3) → JW scoring + LR (C1/C10)
    // → threshold → connected components (G2) → member expansion, as ONE
    // hash-checked row. Output keys are xxhash-free (entity = min url of
    // the cluster — invariant to rep choice and to CC's internal min-id
    // labels) so DuckDB can reproduce the whole flow: blocking+closure via
    // CTEs. Pages are built inline (ASCII boilerplate only: DuckDB's JW is
    // byte-based, ours is char-based — they agree on ASCII exactly).
    "q_dedupe_e2e" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 7 === 1)
        .repartition(s.sparkContext.defaultParallelism)
      def page(urlSuffix: String, text: org.apache.spark.sql.Column) = docs.select(
        concat(lit("https://docs.example/"), col("doc_id"), lit(urlSuffix)).as("url"),
        to_timestamp(lit("2017-07-14 02:40:00")).as("warc_ts"),
        encode(col("text"), "UTF-8").as("html"),
        text.as("text"), col("lang"))
      val pages = page("", col("text"))
        .unionByName(page("-v1", // near-dup: doubled first space + suffix
          concat(regexp_replace(col("text"), "^(\\S+) ", "$1  "),
            lit(" (c) example inc"))))
        .unionByName(page("-v2", col("text"))) // exact duplicate (G1 path)
      // threshold 0.96 ⇔ jw ≥ 0.9315: merges true near-dup variants
      // (base↔v1 jw ≈ 0.99) but not the formulaic cross-doc similarity of
      // the synthetic corpus (avg jw 0.68, tail to ~0.93)
      val m = Model(bias = -8.0, weights = Map("jw_text_norm" -> 12.0),
        threshold = 0.96, predicates = Seq(PredicateSpec("token", "text_norm")))
      runReclaimed(s, pages, Dedupe.Config(m, collectMetrics = false)) { r =>
        val ents = r.entityMap.groupBy("component").agg(min("url").as("entity_url"))
        r.entityMap.join(ents, "component")
          .select(col("url"), col("entity_url"))
      }.orderBy(col("url"))
    }),

    // greedy predicate cover (T3) over a literal fixture — the choice is a
    // pure function of the fixture, so the expected pick is a constant
    // (VALUES oracle), regression-guarding the cover logic: both `token
    // name` and `prefix4 name` cover all 3 dupe pairs; prefix wins on the
    // lower pair volume (4 vs 5); nothing else adds marginal coverage
    "q_predicate_cover" -> ((s, dir) => {
      import s.implicits._
      val recs = Seq(
        (1L, "acme corp", "11 main st"),
        (2L, "acme corporation", "11 main street"),
        (3L, "acme corp", "99 elm ave"),
        (4L, "zenith ltd", "5 oak blvd"),
        (5L, "zenith limited", "5 oak blvd"),
        (6L, "other co", "77 pine rd")).toDF("id", "name", "addr")
      val dupes = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id1", "id2")
      val candidates = Seq(
        PredicateSpec("token", "name"),
        PredicateSpec("token", "addr"),
        PredicateSpec("prefix", "name", n = 4),
        PredicateSpec("whole", "addr"))
      val chosen = graft.score.Training.greedyPredicateCover(
        recs, dupes, candidates, maxPredicates = 2)
      chosen.zipWithIndex
        .map { case (p, i) => ((i + 1).toLong, p.kind, p.field) }
        .toDF("pick", "kind", "field")
    }),

    // connected components (G2) GREEN twin: thresholded JW edges over the
    // blocked name pairs → large/small-star CC; the DuckDB oracle computes
    // the same labels via a recursive-CTE transitive closure (component =
    // min reachable id — exactly CC.run's label contract). This makes the
    // core clustering operator hash-checked, not just rows-only.
    // the (id1+id2)%17 sparsifier is deterministic and SQL-mirrored: part
    // names are formulaic, so jw≥0.95 alone admits ~3.9M near-clique edges
    // at sf0.1 — a giant-clique CC demo that q_dedupe_pipeline already
    // covers; sparsified, the graph has longer chains (more CC iterations,
    // a better algorithmic exercise) at bounded size
    "q_cc_components" -> ((s, dir) => {
      val edges = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.95 &&
          pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"))
      graft.cluster.ConnectedComponents.labels(edges)
        .orderBy(col("id"))
    }),

    // over-merge repair: bridge edges of the q_cc_components match graph
    // — the single edges whose removal disconnects their entity (Tarjan
    // low-link per component). Oracle = per-excluded-edge reachability:
    // an edge is a bridge iff its far endpoint is unreachable with the
    // edge knocked out, with the excluded-edge id riding the recursive
    // reach relation (the q_threshold_sweep parameterized-CTE idiom)
    "q_bridge_edges" -> ((s, dir) => {
      val edges = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.95 &&
          pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"))
      graft.cluster.Bridges.bridgeEdges(edges)
        .orderBy(col("id1"), col("id2"))
    }),

    // over-merge repair, record flavor: articulation nodes of the same
    // graph — the single RECORD gluing two duplicate families (a dirty
    // row matching both sides). Oracle = per-excluded-NODE reachability
    // among the node's neighbors, excl riding the reach relation
    "q_cut_vertices" -> ((s, dir) => {
      val edges = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.95 &&
          pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"))
      graft.cluster.Bridges.cutVertices(edges)
        .orderBy(col("id"))
    }),

    // the repair APPLIED: delete bridges scoring under 0.97 and relabel
    // — split entities shrink, orphaned nodes keep singleton rows, the
    // rest of the labeling is untouched. Oracle re-derives the weak
    // bridge set (per-excluded-edge reach) then recomputes components
    // over the kept edges
    "q_bridge_split" -> ((s, dir) => {
      val scored = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.95 &&
          pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"), col("jw"))
      graft.cluster.Bridges.splitWeakBridges(scored, "jw", floor = 0.97)
        .orderBy(col("id"))
    }),

    // robustness complement: the 3-core of the match graph — records
    // surviving repeated deletion of everything with < 3 strong matches
    // (entity trust kernels), relabeled within the core since peeling
    // can split a component. Oracle = the peel itself, loop-unrolled
    // (6 rounds; the sf0.01 graph converges in 2 — 3x margin, and any
    // data change that needs more shows up as a hash mismatch)
    "q_kcore" -> ((s, dir) => {
      val edges = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.95 &&
          pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"))
      graft.cluster.Cores.kCore(edges, k = 3)
        .orderBy(col("id"))
    }),

    // entity shape diagnostics over the same graph: exact per-component
    // diameter/radius — diameter ≈ n-1 is the chain-merge smell (the
    // entity exists only by transitivity through borderline pairs).
    // Oracle = bounded-walk BFS: rows (src, node, d) for every walk
    // length ≤ 32 (UNION-deduped, so bounded), true distance = min d;
    // real diameters here are ≤ ~6, so the cap has 5x margin and a
    // violation surfaces as a hash mismatch
    "q_entity_shapes" -> ((s, dir) => {
      val edges = scoredNamePairs(s, dir)
        .filter(col("jw") >= 0.95 &&
          pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"))
      graft.cluster.Shape.entityShapes(edges)
        .orderBy(col("component"))
    }),

    // C11 companion: clustering-threshold sensitivity sweep — transitive
    // entity statistics at three θ levels over the q_cc_components edge
    // subset. Oracle = ONE theta-parameterized recursive CTE (theta rides
    // the reach relation as a column), so an ITERATIVE sweep is a single
    // green row set; zero-row θ levels still report (the all-zeros row is
    // the sweep's point)
    "q_threshold_sweep" -> ((s, dir) => {
      val scored = scoredNamePairs(s, dir)
        .filter(pmod(col("id1") + col("id2"), lit(17L)) === 0)
        .select(col("id1"), col("id2"), col("jw"))
      graft.cluster.ThresholdSweep.sweepFast(scored, Seq(0.95, 0.97, 0.99), "jw")
        .orderBy(col("theta"))
    }),

    // unicode tokenizer parity (round-2 verdict item 7): the REAL blocking
    // path (token predicate) over a non-ASCII literal fixture, green-
    // checked against DuckDB's RE2 on the same `[^\p{L}\p{N}]+` class —
    // proves blocking keys agree on multilingual crawl text, not just the
    // ASCII part/customer names every other green query uses
    "q_unicode_block" -> ((s, dir) => {
      import s.implicits._
      val recs = Seq(
        (1L, "café crème brûlée"),
        (2L, "naïve café owner"),
        (3L, "mötley crüe 東京 tour"),
        (4L, "data_pipeline über alles"),
        (5L, "ασπίδα δεδομένων 42")).toDF("id", "name")
      graft.block.Blocking.blockingMap(
          recs, Seq(PredicateSpec("token", "name")), "id")
        .orderBy(col("id"), col("block_key"))
    }),

    // gazetteer with a MULTI-feature LR model (JW + Lev + exact), token
    // blocking only — the full matchRecords path with several weighted
    // comparators, DuckDB-oracle-checkable end to end (verdict item 10)
    "q_gazetteer_multi" -> ((s, dir) => {
      val recs = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"),
          col("p_brand").as("brand"))
      val messy = recs.filter(col("id") % 2 === 1)
      val canon = recs.filter(col("id") % 2 === 0)
      val m = Model(bias = -10.0,
        weights = Map("jw_name" -> 9.0, "lev_name" -> 6.0, "exact_brand" -> 1.0),
        threshold = 0.5,
        predicates = Seq(PredicateSpec("token", "name")))
      graft.pipeline.Gazetteer.matchRecords(s, messy, canon,
          graft.pipeline.Gazetteer.Config(m, nMatches = 2, maxCanonBlockSize = 1000))
        .select(col("messy_id"), col("canon_id"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy(col("messy_id"), col("rank"))
    }),

    // feature battery (C3 logratio, C6 exact+categorical dummies, C7
    // interaction, C8 missing dummy) over same-nation customer pairs
    "q_feature_pairs" -> ((s, dir) => {
      import graft.score.Scoring.featureColumn
      customerPairs(s, dir, Seq(
          "seg" -> col("c_mktsegment"),
          "bal" -> when(col("c_acctbal") > 0, col("c_acctbal").cast("double"))))
        .select(col("id1"), col("id2"),
          featureColumn("exact_seg").as("f_exact"),
          featureColumn("missing_bal").as("f_missing"),
          round(featureColumn("logratio_bal"), 6).as("f_logratio"),
          featureColumn("cat_seg__BUILDING__AUTOMOBILE").as("f_cat_ba"),
          featureColumn("cat_seg__BUILDING__BUILDING").as("f_cat_bb"),
          featureColumn("inter_exact_seg__missing_bal").as("f_inter"))
    }),

    // Fellegi–Sunter sufficient statistics: the ONE distributed step of
    // unsupervised weight learning — same-nation customer pairs collapse
    // into the 2^3 agreement-pattern histogram (discrete gammas only, so
    // the oracle carries no float-threshold boundary risk)
    "q_fs_patterns" -> ((s, dir) => {
      graft.score.FellegiSunter
        .agreementPatterns(fsCustomerGammas(s, dir), Seq("g_seg", "g_name2", "g_bal"))
        .orderBy(col("g_seg"), col("g_name2"), col("g_bal"))
    }),

    // Fellegi–Sunter EM on a literal 100-pair histogram: expected
    // parameters independently recomputed (separate float EM, same IEEE
    // ops; converged values sit ≥4e-8 from every round-6 boundary) and
    // frozen in the VALUES oracle — regression-guards the estimator
    "q_fs_weights" -> ((s, dir) => {
      import s.implicits._
      val rows = Seq.fill(20)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
        Seq.fill(5)((0, 1)) ++ Seq.fill(70)((0, 0))
      val p = graft.score.FellegiSunter.fit(rows.toDF("g1", "g2"), Seq("g1", "g2"))
      Seq(("g1", p.m(0), p.u(0), p.lambda), ("g2", p.m(1), p.u(1), p.lambda))
        .toDF("field", "m", "u", "lam")
        .select(col("field"), round(col("m"), 6).as("m"),
          round(col("u"), 6).as("u"), round(col("lam"), 6).as("lam"))
        .orderBy("field")
    }),

    // Fellegi–Sunter posterior scoring: fitted weights re-enter the plan
    // as literals in a codegen'd column (model params exact in binary so
    // the oracle's decimal literals parse to the identical doubles)
    "q_fs_classify" -> ((s, dir) => {
      import graft.score.FellegiSunter
      val p = FellegiSunter.FsParams(0.25,
        Array(0.75, 0.875, 0.625), Array(0.125, 0.25, 0.375))
      fsCustomerGammas(s, dir)
        .select(col("id1"), col("id2"),
          round(FellegiSunter.posterior(p, Seq("g_seg", "g_name2", "g_bal")), 6)
            .as("post"))
        .orderBy(col("id1"), col("id2"))
    }),

    // Fellegi–Sunter with term-frequency adjustment: agreeing on a RARE
    // last-2-of-name is worth more than a frequent one — the shared
    // value's corpus frequency replaces the global u via a broadcast
    // join against the vocabulary-sized frequency table
    "q_fs_tf" -> ((s, dir) => {
      import graft.score.FellegiSunter
      val p = FellegiSunter.FsParams(0.25,
        Array(0.75, 0.875, 0.625), Array(0.125, 0.25, 0.375))
      val freqs = FellegiSunter.valueFrequencies(
        s.read.parquet(s"$dir/customer.parquet")
          .select(substring(col("c_name"), -2, 2).as("n2")), "n2")
      fsCustomerGammas(s, dir)
        .join(broadcast(freqs.withColumnRenamed("value", "n2_1")), Seq("n2_1"), "left")
        .select(col("id1"), col("id2"),
          round(FellegiSunter.posteriorTf(p, Seq("g_seg", "g_name2", "g_bal"),
            Map("g_name2" -> col("tf_freq"))), 6).as("post"))
        .orderBy(col("id1"), col("id2"))
    }),

    // sorted-neighborhood blocking (Hernández–Stolfo): rank by the
    // REVERSED name (an id-scrambled, digits-vary-fastest order) via
    // range partitions + bucket-local windows + driver prefix over the
    // bucket census (never a global window), pair each record with its
    // 4 successors; DuckDB's single-window rebuild is the exact oracle
    "q_snm_pairs" -> ((s, dir) => {
      // no repartition: withGlobalRank's range exchange redistributes
      // the scan anyway, so a round-robin shuffle here would be waste
      val recs = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("long").as("id"), col("c_name"))
      graft.block.SortedNeighborhood.pairs(recs, "id", reverse(col("c_name")), window = 5)
        .orderBy("id1", "id2")
    }),

    // datetime comparator (C5) over same-customer order pairs
    "q_dt_pairs" -> ((s, dir) => {
      import graft.score.Scoring.featureColumn
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("id"), col("o_custkey").as("ck"),
          col("o_orderdate").as("odate"))
      val a = o.select(col("id").as("id1"), col("ck"), col("odate").as("odate_1"))
      val b = o.select(col("id").as("id2"), col("ck"), col("odate").as("odate_2"))
      val width = s.sparkContext.defaultParallelism * 4
      a.repartition(width, col("ck"))
        .join(b.repartition(width, col("ck")), "ck")
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(featureColumn("dt_odate"), 6).as("dt_days"))
    }),

    // haversine comparator (C4) over same-nation suppliers with
    // deterministic synthetic coordinates derived from the key
    "q_haversine_pairs" -> ((s, dir) => {
      import graft.score.Scoring.featureColumn
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey").cast("long").as("id"), col("s_nationkey").as("nat"),
          (pmod(col("s_suppkey").cast("long") * 7, lit(179L)) - 89).cast("double").as("loc_lat"),
          (pmod(col("s_suppkey").cast("long") * 13, lit(359L)) - 179).cast("double").as("loc_lon"))
      val a = sup.select(col("id").as("id1"), col("nat"),
        col("loc_lat").as("loc_lat_1"), col("loc_lon").as("loc_lon_1"))
      val b = sup.select(col("id").as("id2"), col("nat"),
        col("loc_lat").as("loc_lat_2"), col("loc_lon").as("loc_lon_2"))
      a.join(b, "nat").filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(featureColumn("haversine_loc"), 4).as("km"))
        .orderBy(col("id1"), col("id2"))
    }),

    // B14 latLongGrid blocking predicate (closes the one n/a row of the
    // predicate zoo): candidate pairs = same 30°x30° grid cell over the
    // synthetic supplier coordinates, each surfaced pair verified by its
    // haversine distance
    "q_geo_grid_pairs" -> ((s, dir) => {
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey").cast("long").as("id"),
          (pmod(col("s_suppkey").cast("long") * 7, lit(179L)) - 89)
            .cast("double").as("loc_lat"),
          (pmod(col("s_suppkey").cast("long") * 13, lit(359L)) - 179)
            .cast("double").as("loc_lon"))
      val keys = graft.block.Blocking.blockingMap(sup,
        Seq(PredicateSpec("latlong_grid", "loc", n = 30)), "id")
      val cand = keys.as("a")
        .join(keys.as("b"), col("a.block_key") === col("b.block_key"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      val c1 = sup.select(col("id").as("id1"),
        col("loc_lat").as("lat1"), col("loc_lon").as("lon1"))
      val c2 = sup.select(col("id").as("id2"),
        col("loc_lat").as("lat2"), col("loc_lon").as("lon2"))
      cand.join(c1, "id1").join(c2, "id2")
        .select(col("id1"), col("id2"),
          round(haversine_km(col("lat1"), col("lon1"),
            col("lat2"), col("lon2")), 4).as("km"))
        .orderBy(col("id1"), col("id2"))
    }),

    // embedding-cosine near-duplicate pairs — exact, grid-decomposed
    // self-join (the LSH-bucketed variant is the recall<1 scale path)
    "q_embed_neardup" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("id"), col("embedding"))
      val blocks = emb.select(col("id"), lit("all").as("block_key"))
      val pairs = graft.pairs.PairGen.candidatePairs(
        blocks, maxBlockSize = Int.MaxValue, chunkTarget = 128)
      graft.pairs.PairGen.attachFields(pairs, emb, "id", Seq("embedding"))
        .select(col("id1"), col("id2"),
          cosine_sim(col("embedding_1"), col("embedding_2")).as("cos_raw"))
        .filter(col("cos_raw") >= 0.4)
        .select(col("id1"), col("id2"), round(col("cos_raw"), 5).as("cos"))
        .orderBy(col("id1"), col("id2"))
    }),

    // second-stage dedupeCanon (G6) over a deterministic subset of pages.
    // Oracle: frozen observed table (CC + pipeline not SQL-expressible
    // over xxhash ids; the remap seam is independently green via
    // q_canon_remap)
    "q_dedupe_canon" -> ((s, dir) => {
      val pages = PagesGen.fromDocuments(s, dir)
        .filter(pmod(xxhash64(col("url")), lit(5L)) === 0)
      val cfg = Dedupe.Config(demoModel, collectMetrics = false)
      val r = Dedupe.run(s, pages, cfg)
      // reclaimScratch truncates the remap (consuming r's frames) AND
      // deletes the second stage's scratch; r's own scratch is then safe
      // to reclaim too — without this each bench round leaks two
      // input-sized run dirs
      val out = graft.pipeline.Gazetteer.dedupeCanon(
        s, r.entityMap.select(col("id"), col("component")), r.canon, cfg,
        reclaimScratch = true)
      Dedupe.cleanupScratch(s, r)
      out.orderBy(col("id"))
    }),

    // second-stage dedupeCanon (G6) over a LITERAL canon table — cluster
    // membership is invariant to the pipeline's internal xxhash ids and
    // the remap keys are the fixture's own first-pass components, so the
    // expected output is a hand-derivable constant: canon texts 1 and 2
    // are near-dups (share every token, jw ≈ 0.99 ≥ the 0.85 needed at
    // threshold 0.9) and merge to min(1,2)=1; texts 3 and 4 share no
    // blocking token with anything, so components 3 and 4 survive
    "q_canon_remap" -> ((s, dir) => {
      import s.implicits._
      val firstEntityMap = Seq((101L, 1L), (102L, 1L), (201L, 2L),
        (301L, 3L), (401L, 4L)).toDF("id", "component")
      val canon = Seq(
        (1L, "the acme corporation homepage", "en"),
        (2L, "the acme corporation home page", "en"),
        (3L, "completely unrelated canon text", "en"),
        (4L, "another totally distinct document", "en"))
        .toDF("component", "text_norm", "lang")
      val cfg = Dedupe.Config(
        Model(bias = -8.0, weights = Map("jw_text_norm" -> 12.0),
          threshold = 0.9, predicates = Seq(PredicateSpec("token", "text_norm"))),
        collectMetrics = false)
      graft.pipeline.Gazetteer.dedupeCanon(s, firstEntityMap, canon, cfg,
          reclaimScratch = true)
        .orderBy(col("id"))
    }),

    // G5 companion: plurality-vote canonicalization (voteTable) over
    // deterministic pseudo-entities (p_partkey % 200, ~10-member
    // clusters) on two categorical fields — the melted one-shuffle
    // argmax path, tie-break cnt DESC, len DESC, value DESC; DuckDB twin
    // is first(v ORDER BY ...) over the same melt
    "q_canon_vote" -> ((s, dir) => {
      val parts = s.read.parquet(s"$dir/part.parquet")
        .select((col("p_partkey") % 200).as("entity"),
          col("p_type"), col("p_brand"))
      graft.cluster.Canonicalize.voteTable(parts, "entity",
          Seq("p_type", "p_brand"))
        .orderBy(col("entity"))
    }),

    // G4 cluster confidence over a literal 4-cluster edge fixture — the
    // last SURVEY §2 compute row without an oracle: per-record mean of
    // intra-cluster incident edge scores, cross-cluster edges dropped,
    // singletons (and edgeless members) = 1.0. The DuckDB twin rebuilds
    // the whole computation, not just its answers.
    "q_confidences" -> ((s, dir) => {
      import s.implicits._
      val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
        (11L, 10L), (20L, 20L), (30L, 30L)).toDF("id", "component")
      val scored = Seq(
        (1L, 2L, 0.95), (2L, 3L, 0.85), (1L, 3L, 0.60), // triangle
        (10L, 11L, 0.99), // pair
        (10L, 20L, 0.97)) // cross-cluster -> must not count
        .toDF("id1", "id2", "score")
      graft.cluster.Canonicalize.confidences(labels, scored)
        .select(col("id"), col("component"),
          round(col("confidence"), 6).as("confidence"))
        .orderBy(col("id"))
    }),

    // G5 medoid path over a literal cluster fixture — the reference's
    // actual getCanonicalRep semantics (canonTable/medoidWeighted) with
    // every branch pinned: separated costs, the 2-value majority-weight
    // case, duplicate-multiplicity pull, the 256-char comparator cap
    // (two long values identical through the cap tie exactly -> the
    // lexicographically smaller wins; WITHOUT the cap the suffix would
    // decide differently), an all-null entity, and null rows counting
    // toward cluster_size. The DuckDB twin mirrors the capped weighted
    // cost Σ cnt_j·(1−JW) including substr(v,1,256).
    "q_canon_medoid" -> ((s, dir) => {
      import s.implicits._
      val longP = "p" * 256
      val src = Seq(
        // entity 1: 4 distinct values, well-separated costs
        (1L, Option("johnson controls inc")),
        (1L, Option("johnson controls incorporated")),
        (1L, Option("johnson controls")),
        (1L, Option("jonson kontrols gmbh")),
        // entity 2: two values, 3-vs-1 multiplicity -> majority wins
        (2L, Option("acme corp")), (2L, Option("acme corp")),
        (2L, Option("acme corp")), (2L, Option("acme corporation")),
        // entity 3: weighted pull + a null row (counts in cluster_size)
        (3L, Option("york")), (3L, Option("york")), (3L, Option("york")),
        (3L, Option("yorkshire")), (3L, Option("new york")),
        (3L, None: Option[String]),
        // entity 4: 256-char-cap tie -> lexicographic min of the longs
        (4L, Option(longP + "aaa zebra")),
        (4L, Option(longP + "bbb anchor")),
        (4L, Option(longP + "ccc anchor")),
        // entity 5: all-null -> null medoid, size kept
        (5L, None: Option[String]), (5L, None: Option[String]))
        .toDF("entity", "name")
      graft.cluster.Canonicalize.canonTable(src, "entity", Seq("name"))
        .orderBy(col("entity"))
    }),

    // tumbling-window event aggregation (§2.9; same code path runs
    // streaming once the caller adds a watermark)
    "q_event_windows" -> ((s, dir) => {
      graft.streaming.EventAgg.windowedCounts(
          s.read.parquet(s"$dir/events.parquet"), "1 hour")
        .orderBy(col("ws"), col("event_type"))
    }),

    // gap-based sessionization, batch twin (§2.9/§2.10; the streaming
    // flatMapGroupsWithState twin is asserted equal in SessionizeSpec)
    "q_sessionize" -> ((s, dir) => {
      graft.streaming.EventAgg.sessionize(
          s.read.parquet(s"$dir/events.parquet"), gapMinutes = 30)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // blocking-key zoo part 2: the numeric (B10), set (B13), suffix/
    // shingle/first-token, exists (B17) and compound (B16) predicate
    // families over a literal fixture, each mirrored in the DuckDB twin —
    // converts the remaining unit-only predicate rows to hash-checked
    "q_blocking_keys2" -> ((s, dir) => {
      import s.implicits._
      val recs = Seq(
        (1L, "alpha beta 42 gamma 199", 250.0, Seq("x", "y", "x"), Option("p")),
        (2L, "7 delta 100", 0.02, Seq("z"), None: Option[String]),
        (3L, "omega", 0.0, Seq("a", "b", "c", "d"), Option("q")))
        .toDF("id", "name", "num", "tags", "maybe_null")
      graft.block.Blocking.blockingMap(recs, Seq(
          PredicateSpec("first_token", "name"), // 0
          PredicateSpec("shingle", "name", n = 2), // 1
          PredicateSpec("suffix", "name", n = 3), // 2
          PredicateSpec("integer", "name"), // 3
          PredicateSpec("first_integer", "name"), // 4
          PredicateSpec("near_integer", "name"), // 5
          PredicateSpec("hundred_integer", "name"), // 6
          PredicateSpec("alphanum", "name"), // 7
          PredicateSpec("order_of_magnitude", "num"), // 8
          PredicateSpec("exists", "maybe_null"), // 9
          PredicateSpec("whole_set", "tags"), // 10
          PredicateSpec("common_set", "tags"), // 11
          PredicateSpec("first_set_element", "tags"), // 12
          PredicateSpec("last_set_element", "tags"), // 13
          PredicateSpec("common_set_2", "tags"), // 14
          PredicateSpec("magnitude_cardinality", "tags"), // 15
          PredicateSpec("compound", "name", sub = Seq( // 16
            PredicateSpec("first_token", "name"),
            PredicateSpec("exists", "maybe_null")))), "id")
        .orderBy(col("id"), col("block_key"))
    }),

    // IVF with FULL probe (nprobe = nlist): every inverted list is probed,
    // so the candidate set is the whole corpus and the output must equal
    // exact brute-force top-k — which DuckDB can express. Hash-checks the
    // IVF plumbing (centroid assignment via max_by, probe ranking, rank
    // window) end to end; the recall<1 partial-probe path stays rows-only
    // in q_ann_ivf + unit-tested.
    "q_ann_ivf_full" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      // lloydIters exercises the k-means refinement in an ORACLE query:
      // under full probe every inverted list is scanned, so the result is
      // centroid-invariant — the oracle stays exact while the refinement
      // path (assign -> element-wise mean -> reassign) runs for real
      graft.ann.Ann.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 16,
          lloydIters = 2)
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cos"), 5).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // SemDeDup (Abbas et al. 2023†): centroid-clustered embedding dedup —
    // the SCALE path for q_embed_neardup's exact O(n²) baseline. Seed
    // centroids are modulus-sampled (vec_id % 50) so the DuckDB twin
    // reproduces the clustering and the WHOLE path — assignment argmax,
    // within-cluster pairs, CC duplicate groups, low-centroid-sim keeper —
    // is hash-checked end to end. tau = 0.4 matches q_embed_neardup's
    // near-dup threshold, so the two queries also document the method's
    // recall tradeoff on the same data (within-cluster pairs ⊂ global).
    "q_semdedup" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      graft.ann.Ann.semDedup(emb, cents, tau = 0.4)
        .orderBy(col("item_id"))
    }),

    // the blocking-key zoo over a literal fixture: token, prefix, acronym,
    // fingerprint and char-4-gram predicates all hash-checked against
    // DuckDB list/regex twins (B-family was previously unit-only)
    "q_blocking_keys" -> ((s, dir) => {
      import s.implicits._
      val recs = Seq(
        (1L, "acme corp intl"),
        (2L, "beta data systems"),
        (3L, "corp acme")).toDF("id", "name")
      graft.block.Blocking.blockingMap(recs, Seq(
          PredicateSpec("token", "name"),
          PredicateSpec("prefix", "name", n = 3),
          PredicateSpec("acronym", "name"),
          PredicateSpec("fingerprint", "name"),
          PredicateSpec("ngram", "name", n = 4)), "id")
        .orderBy(col("id"), col("block_key"))
    }),

    // IVF-style ANN (scale path; centroids hash-sampled). Oracle: frozen
    // observed table — Lloyd centroid float sums verified identical across
    // local[8]/local[32] before freezing; recall vs brute force pinned
    // independently by the green q_ann_ivf_full twin
    "q_ann_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.ann.Ann.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 4,
          lloydIters = 2)
        .select(col("query_id"), col("rank"), col("item_id"),
          round(col("cos"), 5).as("cos"))
        .orderBy(col("query_id"), col("rank"))
    })
  )

  // --- shared DuckDB oracle fragments --------------------------------
  // q_curate_pipeline's oracle chains the SAME stage rebuilds the
  // q_line_dedup / q_repetition_stats / q_pii_redact oracles are green
  // on. The chaining is structural, not copy-paste: each fragment below
  // is interpolated into both the stage oracle and the composed oracle,
  // so a stage-oracle correction propagates to the composed twin.

  // The patterns are the implementation's own (shared visibility, not a
  // copy): redactPii and the oracle replace/extract use literally the
  // same regex source strings.
  private val emailRe = graft.textops.TextOps.emailRe
  private val phoneRe = graft.textops.TextOps.phoneRe
  private val ipRe = graft.textops.TextOps.ipRe

  /** Triple RE2 'g' replacement — twin of TextOps.redactPii (same
    * pattern order: email, phone, IP). */
  private def piiReplaceSql(in: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($in,
       |    '$emailRe', '<EMAIL>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g'),
       |    '$ipRe', '<IP>', 'g')""".stripMargin

  /** CTE chain `sp/lines/hot/keptl/lined`: split `in`(doc_id, text) into
    * indexed lines, census distinct-doc df over lines with length >= 5,
    * drop df > 10, ordered reassembly (string_agg ORDER BY idx = the
    * array_sort twin) -> `lined`(doc_id, text). Twin of
    * TextOps.dedupeLines(maxLineDf = 10). */
  private def lineDedupCtes(in: String): String =
    s"""sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM $in),
       |lines AS (SELECT doc_id, i AS idx, ls[CAST(i AS INT)] AS l
       |          FROM sp, unnest(range(1, len(ls) + 1)) r(i)),
       |hot AS (SELECT l FROM (
       |          SELECT l, count(DISTINCT doc_id) AS df FROM lines
       |          WHERE length(l) >= 5 GROUP BY l) WHERE df > 10),
       |keptl AS (SELECT doc_id, idx, l FROM lines ANTI JOIN hot USING (l)),
       |lined AS (
       |  SELECT d.doc_id, coalesce(r.text, '') AS text
       |  FROM $in d LEFT JOIN (
       |    SELECT doc_id, string_agg(l, chr(10) ORDER BY idx) AS text
       |    FROM keptl GROUP BY doc_id) r USING (doc_id))""".stripMargin

  /** One unrolled PageRank power iteration `cur` from `prev` — the
    * DuckDB twin of graphops.PageRank.run's update (same exact-integer
    * mass arithmetic: per-edge integer-division shares, dangling mass
    * split by integer division, damping as one IEEE double product
    * floored back; `(1 - 0.85)` is spelled as the subtraction so both
    * engines compute the identical double). Expects CTEs `links`
    * (src_host, dst_host), `outd` (src_host, d), `nodes` (node), `nn`
    * (n). */
  private def pagerankIterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT nd.node,
       |    CAST(floor((1 - 0.85) * 1000000000000 / nn.n) AS BIGINT)
       |    + CAST(floor(0.85 * (coalesce(m.in_sum, 0) + dg.dang // nn.n))
       |        AS BIGINT) AS r
       |  FROM nodes nd
       |  CROSS JOIN nn
       |  CROSS JOIN (SELECT coalesce(sum(p.r), 0) AS dang
       |              FROM $prev p ANTI JOIN outd o ON p.node = o.src_host) dg
       |  LEFT JOIN (SELECT l.dst_host AS node, sum(p.r // o.d) AS in_sum
       |             FROM links l
       |             JOIN $prev p ON p.node = l.src_host
       |             JOIN outd o ON o.src_host = l.src_host
       |             GROUP BY 1) m USING (node))""".stripMargin

  /** CTE chain `qbase/qhits/qq`: lower-token list, per-language stopword
    * hit counts, and the char-census columns (nchars/nns/nalpha/npunct/
    * ntoks) that [[qualityExpr]] consumes — the single DuckDB twin of
    * TextOps.langId + TextOps.qualityScore, shared by every oracle that
    * recomputes quality (q_text_stats, q_keep_best) so the formula can
    * never fork between them. `passCols` rides along unchanged. */
  private def qualityCtes(in: String, passCols: String): String =
    raw"""qbase AS (
       |  SELECT $passCols, text,
       |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
       |                x -> length(x) > 0) AS ltoks
       |  FROM $in),
       |qhits AS (
       |  SELECT *,
       |    len(list_filter(ltoks, x -> list_contains(
       |      ['der','die','das','und','ist','nicht','ein','mit','zu','auf'], x))) AS h_de,
       |    len(list_filter(ltoks, x -> list_contains(
       |      ['the','and','of','to','a','in','is','that','it','for'], x))) AS h_en,
       |    len(list_filter(ltoks, x -> list_contains(
       |      ['el','la','los','de','y','es','un','una','en','por'], x))) AS h_es,
       |    len(list_filter(ltoks, x -> list_contains(
       |      ['le','la','les','et','est','un','une','dans','que','pour'], x))) AS h_fr
       |  FROM qbase),
       |qq AS (
       |  SELECT *,
       |    CAST(length(text) AS DOUBLE) AS nchars,
       |    greatest(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE), 1.0) AS nns,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS nalpha,
       |    CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) AS npunct,
       |    greatest(CAST(len(ltoks) AS DOUBLE), 1.0) AS ntoks
       |  FROM qhits)""".stripMargin

  /** The quality formula over `qq`'s columns, rounded to 6 — term-for-term
    * twin of TextOps.qualityScore (en-stopword density term only). */
  private val qualityExpr: String =
    """round(0.35 * (nalpha / nns)
      |      + 0.25 * (1.0 - least(npunct / nns * 5.0, 1.0))
      |      + 0.2 * least((CAST(h_en AS DOUBLE) / ntoks) * 4.0, 1.0)
      |      + 0.2 * (least(nchars / 50.0, 1.0)
      |               * (1.0 - least(greatest(nchars - 2000.0, 0.0) / 8000.0, 1.0))),
      |    6)""".stripMargin

  /** Per-n gram census `g$n`(doc_id, gram, c) from the `tok` CTE — the
    * list-slice twin of the token_shingles pattern. */
  private def gramCountCte(n: Int): String =
    s"""g$n AS (SELECT doc_id, gram, count(*) AS c FROM (
       |    SELECT doc_id,
       |      array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+${n - 1}], ' ') AS gram
       |    FROM tok, unnest(range(1, len(ts) - $n + 2)) AS r(i)
       |    WHERE len(ts) >= $n) GROUP BY 1, 2)""".stripMargin

  /** CTE chain `rlines/lc/lstat/tok/g2/g2s/g3/g3s/g5/g5s`: Gopher-style
    * repetition stats over `in`(doc_id, text). Every fraction is one IEEE
    * division of exact integer sums. Twin of RepetitionStats.compute. */
  private def repetitionCtes(in: String): String =
    raw"""rlines AS (
       |  SELECT doc_id, l FROM $in,
       |    unnest(string_split(text, chr(10))) AS t(l)
       |  WHERE length(l) > 0),
       |lc AS (SELECT doc_id, l, count(*) AS c, length(l) AS len
       |       FROM rlines GROUP BY 1, 2),
       |lstat AS (SELECT doc_id,
       |         CAST(sum(c - 1) AS DOUBLE) / sum(c) AS dup_line_frac,
       |         CAST(sum((c - 1) * len) AS DOUBLE) / sum(c * len) AS dup_line_char_frac
       |       FROM lc GROUP BY 1),
       |tok AS (
       |  SELECT doc_id, [x for x in
       |      regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')
       |      if length(x) > 0] AS ts
       |  FROM $in),
       |${gramCountCte(2)},
       |g2s AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top2_frac
       |        FROM g2 GROUP BY 1),
       |${gramCountCte(3)},
       |g3s AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top3_frac
       |        FROM g3 GROUP BY 1),
       |${gramCountCte(5)},
       |g5s AS (SELECT doc_id,
       |          CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c) AS dup5_frac
       |        FROM g5 GROUP BY 1)""".stripMargin

  /** q_kcore DuckDB twin: the 3-core peel itself, loop-unrolled (the
    * q_pagerank loop-unrolling idiom) — each step keeps nodes with >= 3
    * neighbors among the previous step's survivors; 6 rounds vs the 2
    * the sf0.01 graph needs, then components over the core edges. */
  private val kcoreOracleSql: String = {
    val steps = (1 to 6).map { i =>
      s"""n$i AS MATERIALIZED (
         |  SELECT a.u AS id FROM adj a
         |  JOIN n${i - 1} x ON a.u = x.id
         |  JOIN n${i - 1} y ON a.v = y.id
         |  GROUP BY a.u HAVING count(*) >= 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE recs AS (
       |  SELECT p_partkey AS id,
       |         lower(trim(regexp_replace(p_name, '\\s+', ' ', 'g'))) AS name
       |  FROM part),
       |blocks AS (
       |  SELECT id, tok AS block_key FROM recs,
       |    unnest(regexp_split_to_array(name, '[^\\p{L}\\p{N}]+')) AS t(tok)
       |  WHERE length(tok) > 0
       |  GROUP BY id, tok),
       |pairs AS (
       |  SELECT DISTINCT a.id AS id1, b.id AS id2
       |  FROM blocks a JOIN blocks b USING (block_key)
       |  WHERE a.id < b.id),
       |scored AS MATERIALIZED (
       |  SELECT p.id1, p.id2
       |  FROM pairs p
       |  JOIN recs r1 ON p.id1 = r1.id
       |  JOIN recs r2 ON p.id2 = r2.id
       |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.95
       |    AND (p.id1 + p.id2) % 17 = 0),
       |adj AS MATERIALIZED (
       |  SELECT id1 AS u, id2 AS v FROM scored
       |  UNION ALL SELECT id2, id1 FROM scored),
       |n0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM adj),
       |$steps,
       |ce AS (
       |  SELECT s.id1, s.id2 FROM scored s
       |  JOIN n6 a ON s.id1 = a.id
       |  JOIN n6 b ON s.id2 = b.id),
       |cadj AS (
       |  SELECT id1 AS u, id2 AS v FROM ce
       |  UNION ALL SELECT id2, id1 FROM ce),
       |reach(id, n) AS (
       |  SELECT u, v FROM cadj
       |  UNION
       |  SELECT r.id, a.v FROM reach r JOIN cadj a ON r.n = a.u)
       |SELECT id, least(min(n), id) AS component
       |FROM reach GROUP BY id ORDER BY id""".stripMargin
  }

  /** DuckDB oracle SQL (same parquet tables, column names aligned). */
  def oracleSql: Map[String, String] = Map(
    // Frozen observed-table oracles (round-5: the q_gazetteer idiom at
    // the remaining scale paths). Each is the query's own sf0.01 output,
    // regenerated at local[32] AND local[8] by tools.FreezeOracles and
    // diffed byte-identical before freezing — regression pins for the
    // paths whose internals (xxhash64 simhash/minhash keys, greedy
    // iteration, Lloyd iterations, pipeline CC) DuckDB cannot recompute;
    // every one has a green independently-derived fixture twin pinning
    // the same kernel (see each query's comment).
    "q_simhash_dedup" -> graft.fixtures.FrozenOracles.q_simhash_dedup,
    "q_training_sample" -> graft.fixtures.FrozenOracles.tables("q_training_sample"),
    "q_bucketed_sink" -> graft.fixtures.FrozenOracles.tables("q_bucketed_sink"),
    "q_lineage" -> graft.fixtures.FrozenOracles.tables("q_lineage"),
    "q_minhash_dedup" -> graft.fixtures.FrozenOracles.q_minhash_dedup,
    "q_incr_neardup" -> graft.fixtures.FrozenOracles.q_incr_neardup,
    "q_one_to_one" -> graft.fixtures.FrozenOracles.q_one_to_one,
    "q_metaphone_block" -> graft.fixtures.FrozenOracles.q_metaphone_block,
    "q_ann_ivf" -> graft.fixtures.FrozenOracles.q_ann_ivf,
    "q_dedupe_pipeline" -> graft.fixtures.FrozenOracles.q_dedupe_pipeline,
    "q_dedupe_canon" -> graft.fixtures.FrozenOracles.q_dedupe_canon,
    "q_affine_scores" -> graft.fixtures.FrozenOracles.q_affine_scores,
    "q_kcore" -> kcoreOracleSql,
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
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok)
        |SELECT DISTINCT a.id AS id1, b.id AS id2
        |FROM blocks a JOIN blocks b USING (block_key)
        |WHERE a.id < b.id
        |ORDER BY id1, id2""".stripMargin,

    // independent rebuild of the meta-blocking pipeline: same blocking
    // CTE as q_block_pairs, then block filtering via SQL windows, CBS by
    // plain group-count, WNP in the identical exact-integer form
    // (w*n >= s) the engine uses — no floating mean on either side
    "q_meta_blocking" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |sized AS (
        |  SELECT b.id, b.block_key,
        |    row_number() OVER (PARTITION BY b.id
        |                       ORDER BY s.bsize, b.block_key) AS rk,
        |    count(*) OVER (PARTITION BY b.id) AS nb
        |  FROM blocks b JOIN (
        |    SELECT block_key, count(*) AS bsize FROM blocks
        |    GROUP BY block_key) s USING (block_key)),
        |filt AS (SELECT id, block_key FROM sized WHERE rk <= ceil(nb * 0.75)),
        |w AS (
        |  SELECT a.id AS id1, b.id AS id2, count(*) AS w
        |  FROM filt a JOIN filt b USING (block_key)
        |  WHERE a.id < b.id
        |  GROUP BY a.id, b.id),
        |nodes AS (
        |  SELECT id, sum(w) AS s, count(*) AS n FROM (
        |    SELECT id1 AS id, w FROM w UNION ALL SELECT id2 AS id, w FROM w)
        |  GROUP BY id)
        |SELECT w.id1, w.id2, w.w
        |FROM w JOIN nodes n1 ON w.id1 = n1.id JOIN nodes n2 ON w.id2 = n2.id
        |WHERE w.w * n1.n >= n1.s OR w.w * n2.n >= n2.s
        |ORDER BY id1, id2""".stripMargin,

    // brute-force O(n²) twin of the prefix-filtered set-similarity join —
    // identical shingling and the identical exact-integer verification
    // (q·|∩| >= p·(|a|+|b|−|∩|)), so the filtered plan must reproduce the
    // exhaustive answer bit-for-bit
    "q_ssjoin" ->
      raw"""WITH toks AS (
        |  SELECT doc_id AS id, list_filter(
        |    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |    t -> length(t) > 0) AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(list_transform(generate_series(1, len(tk)-2),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ts
        |  FROM toks WHERE len(tk) >= 3),
        |pairs AS (
        |  SELECT a.id AS id1, b.id AS id2,
        |         len(list_intersect(a.ts, b.ts)) AS inter,
        |         len(a.ts) AS len1, len(b.ts) AS len2
        |  FROM sh a JOIN sh b ON a.id < b.id)
        |SELECT id1, id2, inter, len1, len2 FROM pairs
        |WHERE 2*inter >= 1*(len1 + len2 - inter)
        |ORDER BY id1, id2""".stripMargin,

    // brute-force twin of the q-gram-filtered edit-distance join; the
    // length guard only prunes (|len diff| > k implies lev > k), so both
    // engines evaluate the identical exact predicate
    "q_edit_join" ->
      raw"""WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS s
        |  FROM part)
        |SELECT a.id AS id1, b.id AS id2,
        |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM recs a JOIN recs b ON a.id < b.id
        |WHERE abs(length(a.s) - length(b.s)) <= 2
        |  AND levenshtein(a.s, b.s) <= 2
        |ORDER BY id1, id2""".stripMargin,

    // blocking quality metrics: candidate stream = the q_block_pairs
    // surface; truth rule = same brand AND type; ratios are single IEEE
    // divisions of exact integer counts on both engines
    "q_block_quality" ->
      raw"""WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |cand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key) WHERE a.id < b.id),
        |truth AS (
        |  SELECT a.p_partkey AS id1, b.p_partkey AS id2 FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        |    AND a.p_partkey < b.p_partkey),
        |nn AS (SELECT count(*) AS n FROM part),
        |c AS (SELECT count(*) AS n_candidates FROM cand),
        |t AS (SELECT count(*) AS n_truth FROM truth),
        |h AS (SELECT count(*) AS n_hit
        |      FROM cand SEMI JOIN truth USING (id1, id2))
        |SELECT n_candidates, n_truth, n_hit,
        |  round(1 - n_candidates / (nn.n * (nn.n - 1) / 2), 6) AS reduction_ratio,
        |  round(n_hit / n_truth, 6) AS pair_completeness,
        |  round(n_hit / n_candidates, 6) AS pairs_quality
        |FROM c, t, h, nn""".stripMargin,

    // Monge-Elkan mean-of-max: inner max and outer mean run over the
    // same token order on both engines; jaro_winkler_similarity is the
    // fuzz-verified parity primitive
    "q_monge_elkan" ->
      raw"""WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |cand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key) WHERE a.id < b.id),
        |toks AS (
        |  SELECT id, list_filter(
        |    regexp_split_to_array(name, '[^\p{L}\p{N}]+'),
        |    t -> length(t) > 0) AS ts
        |  FROM recs)
        |SELECT c.id1, c.id2,
        |  round(list_aggregate(list_transform(ta.ts, t ->
        |    list_aggregate(list_transform(tb.ts,
        |      u -> jaro_winkler_similarity(t, u)), 'max')), 'avg'), 6) AS me
        |FROM cand c JOIN toks ta ON ta.id = c.id1 JOIN toks tb ON tb.id = c.id2
        |WHERE c.id1 % 20 = 0
        |ORDER BY id1, id2""".stripMargin,

    // Soft-TFIDF: same vector pipeline as the q_tfidf_cosine twin; per
    // a-term contribution = w_a · (max weight among argmax-JW b-terms) ·
    // best JW when best >= 0.9 — the same total tie rule as the kernel;
    // term-ascending struct lists mirror the kernel's key-ascending maps
    // so even the summation order matches
    "q_soft_tfidf" ->
      raw"""WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |toks AS (
        |  SELECT id, tok AS term FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0),
        |tf AS (
        |  SELECT id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM recs),
        |dfreq AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT id, term FROM toks) GROUP BY term),
        |w AS (
        |  SELECT tf.id, tf.term,
        |    tf.tf * (ln(((SELECT n FROM nd) + 1.0) / (dfreq.df + 1)) + 1.0) AS w
        |  FROM tf JOIN dfreq USING (term)),
        |ranked AS (
        |  SELECT id, term, w,
        |    row_number() OVER (PARTITION BY id ORDER BY w DESC, term) AS rk
        |  FROM w),
        |topw AS (SELECT id, term, w FROM ranked WHERE rk <= 64),
        |nrm AS (SELECT id, sqrt(sum(w*w)) AS nrm FROM topw GROUP BY id),
        |vec AS (
        |  SELECT t.id, t.term, t.w / n.nrm AS wn
        |  FROM topw t JOIN nrm n USING (id)),
        |vlist AS (
        |  SELECT id, list({'t': term, 'w': wn} ORDER BY term) AS ts
        |  FROM vec GROUP BY id)
        |SELECT p.id1, p.id2,
        |  round(list_aggregate(list_transform(ta.ts, x ->
        |    CASE WHEN list_aggregate(list_transform(tb.ts,
        |        y -> jaro_winkler_similarity(x.t, y.t)), 'max') >= 0.9
        |    THEN x.w
        |      * list_aggregate(list_transform(list_filter(tb.ts, y ->
        |          jaro_winkler_similarity(x.t, y.t)
        |          = list_aggregate(list_transform(tb.ts,
        |              z -> jaro_winkler_similarity(x.t, z.t)), 'max')),
        |          y -> y.w), 'max')
        |      * list_aggregate(list_transform(tb.ts,
        |          y -> jaro_winkler_similarity(x.t, y.t)), 'max')
        |    ELSE 0.0 END), 'sum'), 6) AS stf
        |FROM pairs p
        |JOIN vlist ta ON ta.id = p.id1
        |JOIN vlist tb ON tb.id = p.id2
        |WHERE p.id1 % 20 = 0
        |ORDER BY id1, id2""".stripMargin,

    // independent rebuild of the explanation melt: same blocking CTEs,
    // raw jw/lev_sim recomputed, one UNION ALL branch per feature
    "q_explain_pairs" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id AND a.id % 50 = 0),
        |f AS (
        |  SELECT p.id1, p.id2,
        |    jaro_winkler_similarity(r1.name, r2.name) AS jw,
        |    1.0 - CAST(levenshtein(r1.name, r2.name) AS DOUBLE)
        |        / greatest(length(r1.name), length(r2.name)) AS lev_sim
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |s AS (
        |  SELECT *,
        |    1.0/(1.0 + exp(-(-8.0 + 9.0*jw + 6.0*lev_sim))) AS score
        |  FROM f)
        |SELECT id1, id2, 'jw_name' AS feature, round(jw, 6) AS value,
        |  CAST(9.0 AS DOUBLE) AS weight, round(9.0*jw, 6) AS contribution,
        |  CAST(-8.0 AS DOUBLE) AS bias, round(score, 6) AS score FROM s
        |UNION ALL
        |SELECT id1, id2, 'lev_name', round(lev_sim, 6),
        |  CAST(6.0 AS DOUBLE), round(6.0*lev_sim, 6),
        |  CAST(-8.0 AS DOUBLE), round(score, 6) FROM s
        |ORDER BY id1, id2, feature""".stripMargin,

    "q_score_pairs" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
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
      raw"""WITH ${qualityCtes("documents", "doc_id")}
        |SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'), x -> length(x) > 0)) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
        |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        |       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
        |       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |       ELSE 'de' END AS lang_guess,
        |  $qualityExpr AS quality
        |FROM qq ORDER BY doc_id""".stripMargin,

    // BM25: every scalar input is exact integer arithmetic (tf, dl, df,
    // N; avgdl = exact-int-sum / count), constants are spelled as the
    // same IEEE expressions Spark evaluates ((1.2 + 1.0), not 2.2), and
    // the ln 1-ulp licence is absorbed by the per-term 1e-6 quantization;
    // the per-doc score sums exact bigint micro-units (order-independent
    // on both engines) and ties break on doc_id, so top-5 is engine-exact
    "q_bm25_topk" ->
      raw"""WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf
        |  FROM documents,
        |    unnest(regexp_split_to_array(text, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM dl),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |terms AS (
        |  SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
        |  FROM dfreq, stats WHERE df <= n_docs * 0.75),
        |post AS (
        |  SELECT tf.term, tf.doc_id, tf.tf, dl.dl, t.idf, t.avgdl
        |  FROM tf JOIN terms t USING (term) JOIN dl USING (doc_id)),
        |qterms AS (
        |  SELECT DISTINCT doc_id AS qid, tok AS term
        |  FROM documents,
        |    unnest(regexp_split_to_array(text, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE doc_id % 50 = 0 AND length(tok) > 0),
        |scored AS (
        |  SELECT q.qid, p.doc_id,
        |    sum(CAST(round(p.idf * (p.tf * (1.2 + 1.0)) /
        |      (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / p.avgdl))
        |      * 1e6, 0) AS BIGINT)) / 1e6 AS score
        |  FROM qterms q JOIN post p USING (term)
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qid, doc_id,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank, score
        |  FROM scored)
        |SELECT qid, doc_id, rank, score FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // both GD steps unrolled: step 1 exploits margin=0 => sigma=0.5
    // exactly; every gradient contribution is micro-unit-quantized and
    // summed as exact integers, so weights (and thus predictions) are
    // engine-identical
    "q_lr_quality" ->
      raw"""WITH feats AS (
        |  SELECT doc_id AS id, tok AS feature, CAST(count(*) AS BIGINT) AS x
        |  FROM documents,
        |    unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS u(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY 1, 2
        |  UNION ALL
        |  SELECT doc_id, '__bias__', CAST(1 AS BIGINT) FROM documents),
        |labels AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM labels),
        |g1 AS (
        |  SELECT f.feature,
        |    CAST(sum(CAST(round(f.x * (0.5 - l.y) * 1e6, 0) AS BIGINT))
        |      AS BIGINT) AS g
        |  FROM feats f JOIN labels l USING (id) GROUP BY 1),
        |w1 AS (
        |  SELECT feature,
        |    0 - CAST(round(0.01 * g / nn.n, 0) AS BIGINT) AS w
        |  FROM g1, nn),
        |m1 AS (
        |  SELECT f.id, CAST(sum(f.x * coalesce(w1.w, 0)) AS BIGINT) AS m
        |  FROM feats f LEFT JOIN w1 USING (feature) GROUP BY 1),
        |r1 AS (
        |  SELECT m1.id, 1.0 / (1.0 + exp(-m1.m / 1e6)) - l.y AS r
        |  FROM m1 JOIN labels l USING (id)),
        |g2 AS (
        |  SELECT f.feature,
        |    CAST(sum(CAST(round(f.x * r1.r * 1e6, 0) AS BIGINT))
        |      AS BIGINT) AS g
        |  FROM feats f JOIN r1 USING (id) GROUP BY 1),
        |w2 AS (
        |  SELECT g2.feature,
        |    coalesce(w1.w, 0) - CAST(round(0.01 * g2.g / nn.n, 0) AS BIGINT) AS w
        |  FROM g2 LEFT JOIN w1 USING (feature), nn),
        |m2 AS (
        |  SELECT f.id, CAST(sum(f.x * coalesce(w2.w, 0)) AS BIGINT) AS m
        |  FROM feats f LEFT JOIN w2 USING (feature) GROUP BY 1)
        |SELECT l.id AS doc_id, l.y,
        |  round(1.0 / (1.0 + exp(-m2.m / 1e6)), 6) AS score
        |FROM m2 JOIN labels l USING (id)
        |ORDER BY doc_id""".stripMargin,

    // the same synthetic pages, the same href-extraction regex, and the
    // same integer-mass update unrolled 4 times (pagerankIterSql)
    "q_pagerank" ->
      s"""WITH pages AS (
        |  SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS host,
        |    '<p><a href="https://h' || CAST((doc_id * 7) % 50 AS VARCHAR)
        |      || '.example/x">l</a>'
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN '<a href="https://s' || CAST(doc_id % 23 AS VARCHAR)
        |           || '.example/y">m</a>'
        |         ELSE '' END
        |    || '</p>' AS html
        |  FROM documents),
        |links AS (
        |  SELECT host AS src_host, dst AS dst_host
        |  FROM pages,
        |    unnest(regexp_extract_all(html,
        |      '${graft.graphops.PageRank.hrefHostRe}', 1)) AS t(dst)),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src_host AS node FROM links
        |    UNION ALL SELECT dst_host FROM links)),
        |outd AS (SELECT src_host, count(*) AS d FROM links GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // nn.n AS r FROM nodes, nn),
        |${pagerankIterSql("r0", "r1")},
        |${pagerankIterSql("r1", "r2")},
        |${pagerankIterSql("r2", "r3")},
        |${pagerankIterSql("r3", "r4")}
        |SELECT node, CAST(r AS BIGINT) AS rank_mass,
        |  round(r / 1000000000000.0, 9) AS rank
        |FROM r4 ORDER BY node""".stripMargin,

    // split threshold = hexThreshold(0.125) = 0x2 * 16^12 scaled to 32
    // lowercase hex chars; lexicographic compare on fixed-width hex =
    // numeric compare, identical in both engines
    "q_leakage_split" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0),
        |keyed AS (SELECT doc_id, md5(text) AS cluster FROM corpus)
        |SELECT doc_id, cluster,
        |  CASE WHEN md5('r3' || cluster) < '20000000000000000000000000000000'
        |       THEN 'eval' ELSE 'train' END AS split
        |FROM keyed ORDER BY doc_id""".stripMargin,

    // the LM fit AND the scoring twinned end to end: trigram census over
    // the trusted slice, context totals from the census (so P(·|ctx)
    // normalizes), vocab + 1 OOV slot, Lidstone alpha=0.1, per-gram
    // contributions quantized to 1e-6 micro-units (exact-integer sum)
    // constant classic fixture -> constant merge sequence (pair counts
    // and lexicographic tie-breaks hand-derived in BpeSpec)
    "q_bpe_train" ->
      """SELECT CAST(step AS INTEGER) AS step, lhs, rhs,
        |  CAST(freq AS BIGINT) AS freq
        |FROM (VALUES
        |  (1, 'e', 's', 9), (2, 'es', 't', 9), (3, 'est', '</w>', 9),
        |  (4, 'l', 'o', 7), (5, 'lo', 'w', 7))
        |  t(step, lhs, rhs, freq)
        |ORDER BY step""".stripMargin,

    // independent DSIR rebuild: same tokenizer, unigram+bigram bag from
    // the list-slice shingle pattern, Laplace log-probs micro-quantized
    // per SIDE (the proven q_lm_perplexity idiom) so each gram's
    // log-ratio weight and every doc's weight sum are exact integers
    "q_dsir" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, [x for x in
        |    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')
        |    if length(x) > 0] AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, gram, count(*) AS c FROM (
        |    SELECT doc_id, unnest(ts) AS gram FROM toks
        |    UNION ALL
        |    SELECT doc_id,
        |      array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+1], ' ') AS gram
        |    FROM toks, unnest(range(1, len(ts) - 2 + 2)) AS r(i)
        |    WHERE len(ts) >= 2)
        |  GROUP BY 1, 2),
        |joined AS (
        |  SELECT gram, coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc FROM
        |    (SELECT gram, sum(c) AS tc FROM grams
        |     WHERE doc_id % 5 = 0 GROUP BY 1) t
        |  FULL JOIN
        |    (SELECT gram, sum(c) AS rc FROM grams GROUP BY 1) r
        |  USING (gram)),
        |totals AS (SELECT sum(tc) AS tt, sum(rc) AS rt, count(*) AS v
        |  FROM joined),
        |w AS (
        |  SELECT gram,
        |    CAST(round(ln((tc + 0.1) / (tt + 0.1 * v)) * 1e6, 0) AS BIGINT) -
        |    CAST(round(ln((rc + 0.1) / (rt + 0.1 * v)) * 1e6, 0) AS BIGINT)
        |      AS lw
        |  FROM joined CROSS JOIN totals),
        |scored AS (
        |  SELECT g.doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |    CAST(sum(c * lw) AS BIGINT) AS lw_micros
        |  FROM grams g JOIN w USING (gram) GROUP BY 1)
        |SELECT d.doc_id, s.n_grams, s.lw_micros,
        |  round(s.lw_micros / (1e6 * s.n_grams), 6) AS lw_per_gram
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN scored s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // same rebuild, selection step: top-100 by (lw_per_gram desc, id asc)
    "q_dsir_select" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, [x for x in
        |    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')
        |    if length(x) > 0] AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, gram, count(*) AS c FROM (
        |    SELECT doc_id, unnest(ts) AS gram FROM toks
        |    UNION ALL
        |    SELECT doc_id,
        |      array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+1], ' ') AS gram
        |    FROM toks, unnest(range(1, len(ts) - 2 + 2)) AS r(i)
        |    WHERE len(ts) >= 2)
        |  GROUP BY 1, 2),
        |joined AS (
        |  SELECT gram, coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc FROM
        |    (SELECT gram, sum(c) AS tc FROM grams
        |     WHERE doc_id % 5 = 0 GROUP BY 1) t
        |  FULL JOIN
        |    (SELECT gram, sum(c) AS rc FROM grams GROUP BY 1) r
        |  USING (gram)),
        |totals AS (SELECT sum(tc) AS tt, sum(rc) AS rt, count(*) AS v
        |  FROM joined),
        |w AS (
        |  SELECT gram,
        |    CAST(round(ln((tc + 0.1) / (tt + 0.1 * v)) * 1e6, 0) AS BIGINT) -
        |    CAST(round(ln((rc + 0.1) / (rt + 0.1 * v)) * 1e6, 0) AS BIGINT)
        |      AS lw
        |  FROM joined CROSS JOIN totals),
        |scored AS (
        |  SELECT g.doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |    CAST(sum(c * lw) AS BIGINT) AS lw_micros
        |  FROM grams g JOIN w USING (gram) GROUP BY 1)
        |SELECT doc_id, n_grams, lw_micros,
        |  round(lw_micros / (1e6 * n_grams), 6) AS lw_per_gram
        |FROM scored
        |ORDER BY lw_per_gram DESC, doc_id ASC LIMIT 100""".stripMargin,

    // independent rebuild of exact discrete quantiles: rank = ceil(q*n),
    // value = the element at that row_number — bit-identical doubles
    "q_quantiles" ->
      s"""WITH v AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
        |n AS (SELECT count(*) AS n FROM v),
        |ks AS (
        |  SELECT q, CAST(ceil(q * n) AS BIGINT) AS k
        |  FROM (VALUES (0.25), (0.5), (0.9), (0.99)) t(q) CROSS JOIN n)
        |SELECT ks.q, ks.k, r.x AS value
        |FROM ks JOIN r ON r.rn = ks.k
        |ORDER BY q""".stripMargin,

    // weighted rebuild: k = ceil(q*W); value = min x whose inclusive
    // cumulative weight reaches k (RANGE window ties match the radix
    // walk's per-value weight aggregation exactly)
    "q_weighted_quantiles" ->
      s"""WITH v AS (
        |  SELECT CAST(l_discount AS DOUBLE) AS x,
        |         CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_quantity > 0),
        |tot AS (SELECT sum(w) AS tw FROM v),
        |c AS (SELECT x, sum(w) OVER (ORDER BY x) AS cum FROM v),
        |ks AS (
        |  SELECT q, CAST(ceil(q * tw) AS BIGINT) AS k
        |  FROM (VALUES (0.1), (0.5), (0.9), (1.0)) t(q) CROSS JOIN tot)
        |SELECT q, k, (SELECT min(x) FROM c WHERE cum >= k) AS value
        |FROM ks ORDER BY q""".stripMargin,

    // per-group rebuild: rank = ceil(q*n_group) against a per-group
    // row_number — values bit-identical (actual elements, no rounding)
    "q_group_quantiles" ->
      s"""WITH v AS (
        |  SELECT CAST(source AS VARCHAR) AS source,
        |         CAST(n_chars AS DOUBLE) AS x
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |r AS (SELECT source, x,
        |        row_number() OVER (PARTITION BY source ORDER BY x) AS rn
        |      FROM v),
        |n AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
        |ks AS (
        |  SELECT source, q, CAST(ceil(q * n) AS BIGINT) AS k
        |  FROM n CROSS JOIN (VALUES (0.33), (0.66), (1.0)) t(q))
        |SELECT ks.source, ks.q, ks.k, r.x AS value
        |FROM ks JOIN r ON r.source = ks.source AND r.rn = ks.k
        |ORDER BY 1, 2""".stripMargin,

    "q_lm_perplexity" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, [x for x in
        |    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')
        |    if length(x) > 0] AS ts
        |  FROM documents),
        |census AS (
        |  SELECT gram, count(*) AS cnt FROM (
        |    SELECT array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+2], ' ') AS gram
        |    FROM toks, unnest(range(1, len(ts) - 3 + 2)) AS r(i)
        |    WHERE doc_id % 5 <> 0 AND len(ts) >= 3)
        |  GROUP BY 1),
        |contexts AS (
        |  SELECT regexp_replace(gram, ' [^ ]+$$', '') AS ctx, sum(cnt) AS ctx_cnt
        |  FROM census GROUP BY 1),
        |vocab AS (
        |  SELECT count(DISTINCT tok) + 1 AS v
        |  FROM (SELECT unnest(ts) AS tok FROM toks WHERE doc_id % 5 <> 0)),
        |docgrams AS (
        |  SELECT doc_id,
        |    array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+2], ' ') AS gram,
        |    count(*) AS tf
        |  FROM toks, unnest(range(1, len(ts) - 3 + 2)) AS r(i)
        |  WHERE len(ts) >= 3
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.doc_id,
        |    CAST(sum(tf) AS BIGINT) AS n_grams,
        |    CAST(sum(CAST(round(tf * ln((coalesce(c.cnt, 0) + 0.1) /
        |        (coalesce(x.ctx_cnt, 0) + 0.1 * v.v)) * 1e6, 0) AS BIGINT))
        |      AS BIGINT) AS logprob_micros
        |  FROM docgrams d
        |  LEFT JOIN census c USING (gram)
        |  LEFT JOIN contexts x ON x.ctx = regexp_replace(d.gram, ' [^ ]+$$', '')
        |  CROSS JOIN vocab v
        |  GROUP BY 1),
        |ced AS (
        |  SELECT t.doc_id, s.n_grams, s.logprob_micros,
        |    round(-s.logprob_micros / (1e6 * s.n_grams), 6) AS ce,
        |    round(exp(-s.logprob_micros / (1e6 * s.n_grams)), 6) AS ppl
        |  FROM (SELECT DISTINCT doc_id FROM documents) t
        |  LEFT JOIN scored s USING (doc_id))
        |SELECT doc_id, n_grams, logprob_micros, ce, ppl,
        |  CASE WHEN ce IS NULL THEN NULL
        |       WHEN ce < 2.75 THEN 'head'
        |       WHEN ce < 2.87 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM ced ORDER BY doc_id""".stripMargin,

    // independent rebuild of the repetition kernel: same spliced 3-line
    // text, line stats from a per-line count census, gram stats from the
    // list-slice shingle pattern (n = 2, 3, 5); every fraction is a single
    // IEEE division of exact integer sums, rounded to 6 on both engines
    "q_repetition_stats" ->
      s"""WITH docs2 AS (
        |  SELECT doc_id,
        |    substr(text, 1, 60) || chr(10) || substr(text, 61, 200) ||
        |      chr(10) || substr(text, 1, 60) AS text
        |  FROM documents),
        |${repetitionCtes("docs2")}
        |SELECT doc_id,
        |  round(coalesce(dup_line_frac, 0.0), 6) AS dup_line_frac,
        |  round(coalesce(dup_line_char_frac, 0.0), 6) AS dup_line_char_frac,
        |  round(coalesce(top2_frac, 0.0), 6) AS top2_frac,
        |  round(coalesce(top3_frac, 0.0), 6) AS top3_frac,
        |  round(coalesce(dup5_frac, 0.0), 6) AS dup5_frac
        |FROM docs2 LEFT JOIN lstat USING (doc_id) LEFT JOIN g2s USING (doc_id)
        |  LEFT JOIN g3s USING (doc_id) LEFT JOIN g5s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // independent rebuild of the Gopher battery: same spliced 3-line
    // text, every census from list/regexp primitives; keep compares the
    // same RAW integer-ratio doubles the Spark side thresholds on
    "q_gopher_rules" ->
      raw"""WITH docs2 AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 7 = 0 THEN '- ' ELSE '' END) ||
        |      substr(text, 1, 60) || chr(10) ||
        |    substr(text, 61, 140) ||
        |      (CASE WHEN doc_id % 2 = 0 THEN ' of the and that' ELSE '' END) ||
        |      (CASE WHEN doc_id % 5 = 0 THEN ' ...' ELSE '' END) ||
        |      (CASE WHEN doc_id % 13 = 0 THEN ' # tagged # list' ELSE '' END) ||
        |      chr(10) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '• menu'
        |          ELSE substr(text, 1, 40 + doc_id % 60) END) AS text
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, text,
        |    string_split(text, chr(10)) AS lines,
        |    list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS words
        |  FROM docs2),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    greatest(CAST(len(words) AS DOUBLE), 1.0) AS nw,
        |    greatest(CAST(len(lines) AS DOUBLE), 1.0) AS nl,
        |    CAST(coalesce(list_sum(list_transform(words, w -> len(w))), 0)
        |      AS DOUBLE) AS sum_len,
        |    CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE) AS hash_cnt,
        |    CAST(len(text) - len(replace(text, '...', '')) AS DOUBLE) / 3 +
        |      CAST(len(text) - len(replace(text, '…', '')) AS DOUBLE) AS ell_cnt,
        |    CAST(len(list_filter(lines,
        |      l -> regexp_matches(l, '^[-•*] '))) AS DOUBLE) AS bullet_lines,
        |    CAST(len(list_filter(lines,
        |      l -> regexp_matches(l, '(\.\.\.|…)$$'))) AS DOUBLE) AS ell_lines,
        |    CAST(len(list_filter(words,
        |      w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) AS alpha_words,
        |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |      sw -> list_contains(list_transform(words, w -> lower(w)), sw)))
        |      AS BIGINT) AS stop_hits
        |  FROM g)
        |SELECT doc_id, n_words,
        |  round(sum_len / nw, 6) AS mean_word_len,
        |  round(hash_cnt / nw, 6) AS hash_ratio,
        |  round(ell_cnt / nw, 6) AS ellipsis_ratio,
        |  round(bullet_lines / nl, 6) AS bullet_line_frac,
        |  round(ell_lines / nl, 6) AS ellipsis_line_frac,
        |  round(alpha_words / nw, 6) AS alpha_word_frac,
        |  stop_hits,
        |  (n_words BETWEEN 50 AND 100000
        |   AND sum_len / nw >= 3.0 AND sum_len / nw <= 10.0
        |   AND hash_cnt / nw <= 0.1 AND ell_cnt / nw <= 0.1
        |   AND bullet_lines / nl <= 0.9 AND ell_lines / nl <= 0.3
        |   AND alpha_words / nw >= 0.8 AND stop_hits >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // independent rebuild of the C4 battery: same spliced 4-line text,
    // the kept-line filter and all page-level signals from list/regexp
    // primitives ('g' flag on the sentence-census replace — DuckDB
    // replaces first-match-only by default, Spark replaces all)
    "q_c4_filters" ->
      raw"""WITH docs2 AS (
        |  SELECT doc_id,
        |    substr(text, 1, 60) || '.' || chr(10) ||
        |    'nav stub' || chr(10) ||
        |    substr(text, 61, 80) ||
        |      (CASE WHEN doc_id % 2 = 1 THEN '.' ELSE '' END) || chr(10) ||
        |    (CASE WHEN doc_id % 9 = 0 THEN 'standard Lorem Ipsum passage follows.'
        |          WHEN doc_id % 8 = 0 THEN 'function f() { return 1; }'
        |          WHEN doc_id % 6 = 0 THEN 'please enable JavaScript to continue.'
        |          ELSE substr(text, 141, 60) || ' tail sentence!' END) AS text
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, text,
        |    string_split(text, chr(10)) AS lines
        |  FROM docs2),
        |k AS (
        |  SELECT doc_id, text, lines,
        |    list_filter(lines, l -> regexp_matches(l, '[.!?"]$$') AND
        |      len(list_filter(string_split_regex(l, '\s+'), w -> len(w) > 0)) >= 5)
        |      AS kept
        |  FROM g),
        |m AS (
        |  SELECT doc_id, text, lines, kept,
        |    array_to_string(kept, chr(10)) AS clean_text
        |  FROM k)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  CAST(len(clean_text) -
        |    len(regexp_replace(clean_text, '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(text, '{') AS has_brace,
        |  regexp_matches(lower(text), '(^|[^a-z])javascript([^a-z]|$$)') AS has_js,
        |  (len(clean_text) - len(regexp_replace(clean_text, '[.!?]', '', 'g')) >= 3
        |   AND NOT contains(lower(text), 'lorem ipsum')
        |   AND NOT contains(text, '{')
        |   AND NOT regexp_matches(lower(text), '(^|[^a-z])javascript([^a-z]|$$)')) AS keep,
        |  clean_text
        |FROM m ORDER BY doc_id""".stripMargin,

    // same splice, same three patterns with RE2 'g' replacement; counts
    // from regexp_extract_all on the pre-redaction text
    "q_pii_redact" ->
      s"""WITH docs2 AS (
        |  SELECT doc_id,
        |    substr(text, 1, 60) ||
        |    ' contact user' || CAST(doc_id AS VARCHAR) || '@crawl-example.org now' ||
        |    ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
        |      CAST(doc_id % 9000 + 1000 AS VARCHAR) ||
        |    ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |      CAST(doc_id % 100 AS VARCHAR) ||
        |    ' ' || substr(text, 61, 60) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  ${piiReplaceSql("text")} AS red_text,
        |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(text, '$ipRe')) AS BIGINT) AS n_ip
        |FROM docs2 ORDER BY doc_id""".stripMargin,

    // independent rebuild of the line census + removal + ordered
    // reassembly (string_agg ORDER BY line index = the array_sort twin)
    "q_line_dedup" ->
      s"""WITH docs2 AS (
        |  SELECT doc_id,
        |    'all rights reserved example footer' || chr(10) ||
        |    substr(text, 1, 80) || chr(10) ||
        |    'grp' || CAST(doc_id % 100 AS VARCHAR) || ' shared boilerplate row'
        |      || chr(10) ||
        |    'nav' || CAST(doc_id % 20 AS VARCHAR) || ' menu' || chr(10) ||
        |    'ok' AS text
        |  FROM documents),
        |${lineDedupCtes("docs2")}
        |SELECT doc_id, text FROM lined
        |ORDER BY doc_id""".stripMargin,

    // the composed curation chain: the q_line_dedup rebuild feeding the
    // q_repetition_stats rebuild as a keep-filter (raw unrounded ratios
    // vs thresholds — integer-ratio doubles are bit-identical across
    // engines), then the q_pii_redact replacement chain, then the
    // q_exact_text_dedup min-id winner pick over the shifted-id union
    "q_curate_pipeline" ->
      s"""WITH docs2 AS (
        |  SELECT doc_id,
        |    'all rights reserved example footer' || chr(10) ||
        |    substr(text, 1, 120) || ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@crawl-example.org' || chr(10) ||
        |    'nav' || CAST(doc_id % 20 AS VARCHAR) || ' menu' AS text
        |  FROM documents),
        |${lineDedupCtes("docs2")},
        |${repetitionCtes("lined")},
        |keptd AS (
        |  SELECT doc_id FROM lined
        |    LEFT JOIN lstat USING (doc_id) LEFT JOIN g2s USING (doc_id)
        |    LEFT JOIN g3s USING (doc_id) LEFT JOIN g5s USING (doc_id)
        |  WHERE coalesce(dup_line_frac, 0.0) <= 0.30
        |    AND coalesce(dup_line_char_frac, 0.0) <= 0.20
        |    AND coalesce(top2_frac, 0.0) <= 0.045
        |    AND coalesce(top3_frac, 0.0) <= 0.041
        |    AND coalesce(dup5_frac, 0.0) <= 0.15),
        |red AS (
        |  SELECT doc_id,
        |    ${piiReplaceSql("text")} AS text
        |  FROM lined JOIN keptd USING (doc_id)),
        |u AS (SELECT doc_id, text FROM red
        |      UNION ALL
        |      SELECT doc_id + 1000000, text FROM red),
        |m AS (SELECT text, min(doc_id) AS rep FROM u GROUP BY text)
        |SELECT u.doc_id, u.text FROM u JOIN m ON u.text = m.text
        |WHERE u.doc_id = m.rep ORDER BY doc_id""".stripMargin,

    // independent rebuild of canonicalization (fragment strip, authority
    // lowercase, default-port strip, trailing-slash collapse, tracking-
    // param drop + sort) and of the winner pick (row_number twin of the
    // max_by(struct(ts, url)) aggregate: ts DESC, raw url DESC)
    // independent rebuild of span dedup: gram census over the SAME raw
    // 8-gram strings (no hashing on either side), min-doc keeper,
    // position-set union via range unnest, then the run-level splice —
    // token/separator run decomposition, removed tokens take their
    // trailing separator, ordered '' string_agg — so untouched docs
    // reassemble byte-identical on both engines
    "q_span_dedup" ->
      raw"""WITH docs2 AS (
        |  SELECT doc_id,
        |    'u' || CAST(doc_id AS VARCHAR) ||
        |    ' terms of service all content provided here is licensed for verbatim reuse ' ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN 'mirror notice this page is an archived copy snapshot '
        |      ELSE '' END ||
        |    substr(text, 1, 40) AS text
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, [lower(x) for x in
        |      regexp_extract_all(text, '[\p{L}\p{N}]+')] AS ts
        |  FROM docs2),
        |g AS (SELECT doc_id, i - 1 AS i,
        |        array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+7], ' ') AS gram
        |      FROM tok, unnest(range(1, len(ts) - 8 + 2)) AS r(i)
        |      WHERE len(ts) >= 8),
        |cen AS (SELECT gram, min(doc_id) AS keeper FROM g
        |        GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |dup AS (SELECT doc_id, i FROM g JOIN cen USING (gram)
        |        WHERE doc_id <> keeper),
        |rem AS (SELECT DISTINCT doc_id, i + o AS pos
        |        FROM dup, unnest(range(0, 8)) AS r(o)),
        |runs0 AS (SELECT doc_id,
        |            regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}]+') AS rs
        |          FROM docs2),
        |runr AS (SELECT doc_id, i - 1 AS rpos, rs[CAST(i AS INT)] AS run,
        |           regexp_matches(rs[CAST(i AS INT)], '^[\p{L}\p{N}]') AS is_tok
        |         FROM runs0, unnest(range(1, len(rs) + 1)) AS r(i)),
        |ti AS (SELECT doc_id, rpos, run, is_tok,
        |         sum(CASE WHEN is_tok THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY rpos) - 1 AS ti
        |       FROM runr),
        |fl AS (SELECT t.doc_id, t.rpos, t.run, t.is_tok,
        |         (t.is_tok AND r.pos IS NOT NULL) AS cut
        |       FROM ti t LEFT JOIN rem r
        |         ON t.is_tok AND t.doc_id = r.doc_id AND t.ti = r.pos),
        |fl2 AS (SELECT *, coalesce(lag(cut)
        |          OVER (PARTITION BY doc_id ORDER BY rpos), false) AS cut_prev
        |        FROM fl),
        |keep AS (SELECT * FROM fl2
        |         WHERE NOT cut AND NOT (NOT is_tok AND cut_prev)),
        |reb AS (SELECT doc_id, string_agg(run, '' ORDER BY rpos) AS text,
        |               CAST(sum(CASE WHEN is_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |        FROM keep GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(r.text, '') AS text,
        |  len(t.ts) - coalesce(r.n_kept, 0) AS n_removed
        |FROM tok t LEFT JOIN reb r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // independent rebuild of token-budget sharding: ONE global cumsum
    // window (fine for an oracle; the Spark side decomposes it into a
    // bounded bucket scan + partitioned windows), integer shard math
    "q_pack_shards" ->
      raw"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        sum(n_tok) OVER (ORDER BY doc_id) AS cum FROM d)
        |SELECT doc_id, n_tok, CAST((cum - n_tok) // 4096 AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    // independent rebuild of the budget sampler: one global window cumsum
    // per lang over the identical (score desc, doc_id asc) total order —
    // the single-window twin of the salted two-stage prefix-sum prune
    "q_budget_sample" ->
      raw"""WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(regexp_split_to_array(text, '[^\p{L}\p{N}]+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tok,
        |    (doc_id * 37) % 101 AS score
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tok,
        |        sum(n_tok) OVER (PARTITION BY lang
        |          ORDER BY score DESC, doc_id ASC) AS cum
        |      FROM d)
        |SELECT lang, doc_id, n_tok, CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum - n_tok < 2000
        |ORDER BY lang, doc_id""".stripMargin,

    // independent rebuild of the temperature mix: same bucket
    // derivation, sqrt-share rates, same Lehmer key threshold
    "q_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 6 THEN 'b0'
        |         WHEN doc_id % 10 < 9 THEN 'b1'
        |         ELSE 'b2' END AS bucket
        |  FROM documents WHERE doc_id IS NOT NULL),
        |c AS (SELECT bucket, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT sum(sqrt(CAST(n AS DOUBLE))) AS tot FROM c),
        |r AS (SELECT bucket,
        |        least(CAST(1.0 AS DOUBLE),
        |          200.0 * sqrt(CAST(n AS DOUBLE)) / tot / CAST(n AS DOUBLE))
        |          AS rate
        |      FROM c, t)
        |SELECT d.doc_id, d.bucket, round(r.rate, 6) AS keep_rate
        |FROM d JOIN r USING (bucket)
        |WHERE CAST((((((d.doc_id % 2147483646) + 1) * 48271) % 2147483647)
        |        * 48271) % 2147483647 AS DOUBLE)
        |      < r.rate * 2147483647
        |ORDER BY d.doc_id""".stripMargin,

    // independent rebuild of the per-host quota: single-window
    // row_number twin of the salted two-stage top-k (same total order:
    // score desc, doc_id asc)
    "q_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE doc_id % 22 + 1 END AS hn,
        |    (doc_id * 37) % 101 AS score
        |  FROM documents),
        |r AS (
        |  SELECT 'host' || CAST(hn AS VARCHAR) || '.example' AS host,
        |    doc_id, score,
        |    row_number() OVER (PARTITION BY hn
        |      ORDER BY score DESC, doc_id ASC) AS host_rank
        |  FROM d)
        |SELECT host, host_rank, doc_id, score FROM r
        |WHERE host_rank <= 5 ORDER BY host, host_rank""".stripMargin,

    "q_url_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS h,
        |         CAST(doc_id AS VARCHAR) AS i FROM documents),
        |caps AS (
        |  SELECT 'HTTP://Host' || h || '.Example.COM:80/d/' || i ||
        |         '?b=2&a=1&utm_source=feed#top' AS url,
        |         TIMESTAMP '2017-07-14 02:40:00' AS warc_ts FROM d
        |  UNION ALL
        |  SELECT 'http://host' || h || '.example.com/d/' || i || '?a=1&b=2',
        |         TIMESTAMP '2017-07-14 02:40:00' FROM d
        |  UNION ALL
        |  SELECT 'http://host' || h || '.example.com/d/' || i || '/?a=1&b=2',
        |         CASE WHEN doc_id % 2 = 1 THEN TIMESTAMP '2017-07-14 02:41:00'
        |              ELSE TIMESTAMP '2017-07-14 02:40:00' END FROM d
        |  UNION ALL
        |  SELECT 'https://Host' || h || '.example.com:443/alt/' || i,
        |         TIMESTAMP '2017-07-14 02:40:00' FROM d),
        |c1 AS (SELECT url, warc_ts,
        |         regexp_replace(url, '#.*$', '') AS nofrag FROM caps),
        |c2 AS (SELECT *, regexp_extract(nofrag,
        |         '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS head FROM c1),
        |c3 AS (SELECT *, substr(nofrag, length(head) + 1) AS rest,
        |         lower(head) AS headlc FROM c2),
        |c4 AS (SELECT *,
        |         CASE WHEN starts_with(headlc, 'http://')
        |                THEN regexp_replace(headlc, ':80$', '')
        |              WHEN starts_with(headlc, 'https://')
        |                THEN regexp_replace(headlc, ':443$', '')
        |              ELSE headlc END AS headnp,
        |         regexp_extract(rest, '^([^?]*)', 1) AS path,
        |         regexp_extract(rest, '\?(.*)$', 1) AS q FROM c3),
        |c5 AS (SELECT *,
        |         CASE WHEN length(regexp_replace(path, '/+$', '')) = 0 THEN '/'
        |              ELSE regexp_replace(path, '/+$', '') END AS pathn,
        |         array_to_string(list_sort([p for p in string_split(q, '&')
        |           if length(p) > 0 AND NOT regexp_matches(p,
        |             '^(utm_[A-Za-z0-9_]*|fbclid|gclid)=')]), '&') AS qs
        |       FROM c4),
        |c6 AS (SELECT url, warc_ts, headnp || pathn ||
        |         CASE WHEN length(qs) > 0 THEN '?' || qs ELSE '' END AS canon_url
        |       FROM c5)
        |SELECT canon_url, url, warc_ts, n_captures FROM (
        |  SELECT canon_url, url, warc_ts,
        |    count(*) OVER (PARTITION BY canon_url) AS n_captures,
        |    row_number() OVER (PARTITION BY canon_url
        |                       ORDER BY warc_ts DESC, url DESC) AS rk
        |  FROM c6) WHERE rk = 1 ORDER BY canon_url""".stripMargin,

    // independent rebuild of the snapshot diff: DuckDB compares the texts
    // directly (exactly the equality the md5 projection stands in for)
    // with null-safe IS NOT DISTINCT FROM mirroring the engine's <=>
    "q_snapshot_diff" ->
      """WITH o AS (
        |  SELECT 'https://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
        |         text
        |  FROM documents WHERE doc_id % 10 <> 0),
        |n AS (
        |  SELECT 'https://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
        |         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(o.url, n.url) AS url,
        |  CASE WHEN o.url IS NULL THEN 'added'
        |       WHEN n.url IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.url = n.url
        |ORDER BY url""".stripMargin,

    // independent rebuild of the per-group best pick: the SHARED quality
    // CTE chain (qualityCtes — the same strings the green q_text_stats
    // row pins, so the formula cannot fork between the two oracles),
    // then ONE row_number window picks (quality desc, doc_id asc) — the
    // twin of the Spark side's max_by(struct(quality, ~doc_id)) aggregate
    "q_keep_best" ->
      raw"""WITH ${qualityCtes("documents", "doc_id, source, lang")},
        |qual AS (
        |  SELECT doc_id, source, lang, $qualityExpr AS quality
        |  FROM qq),
        |r AS (
        |  SELECT source, lang, doc_id, quality,
        |    row_number() OVER (PARTITION BY source, lang
        |                       ORDER BY quality DESC, doc_id ASC) AS rn
        |  FROM qual)
        |SELECT source, lang, doc_id, quality FROM r WHERE rn = 1
        |ORDER BY source, lang""".stripMargin,

    // independent rebuild of the HTML extraction: the same page skeleton
    // built by string concat, then the IDENTICAL pattern chain
    // (script/style blocks, comments, tags, the five entities with &amp;
    // last, whitespace collapse). Case folding is spelled as [sS]-style
    // classes and whitespace as the explicit [ \t\n\r\f\x0B] class, so
    // DuckDB's RE2 and Spark's Java regex agree byte-for-byte (Java (?i)
    // folds ASCII-only vs RE2 Unicode; Java \s includes \x0B, RE2's not)
    "q_html_extract" ->
      raw"""WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>News &amp; views</title><style type="text/css">body{margin:0}</style></head><body><h1>'
        |    || substr(text, 1, 40)
        |    || '</h1><script>var x = ''<p>not text</p>'';</script><p>'
        |    || text
        |    || ' &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;tail</p><!-- hidden --></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html, '(?s)<[sS][cC][rR][iI][pP][tT][^>]*>.*?</[sS][cC][rR][iI][pP][tT]>', ' ', 'g') AS s FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(s, '(?s)<[sS][tT][yY][lL][eE][^>]*>.*?</[sS][tT][yY][lL][eE]>', ' ', 'g') AS s FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g') AS s FROM s2),
        |s4 AS (SELECT doc_id, regexp_replace(s, '(?s)<[^>]*>', ' ', 'g') AS s FROM s3),
        |e AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(s,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS s FROM s4)
        |SELECT doc_id, trim(regexp_replace(s, '[ \t\n\r\f\x0B]+', ' ', 'g')) AS text_out
        |FROM e ORDER BY doc_id""".stripMargin,

    // independent rebuild of the batch-vs-corpus dedup: DuckDB joins on
    // the raw text (exactly what the 256-bit hash join stands in for)
    "q_incr_dedup" ->
      """WITH b AS (
        |  SELECT doc_id + 2000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' fresh addendum'
        |  FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 4000000, text || ' fresh addendum'
        |  FROM documents WHERE doc_id % 3 = 1),
        |m AS (SELECT text, min(doc_id) AS rep FROM b GROUP BY text),
        |c AS (SELECT DISTINCT text FROM documents)
        |SELECT b.doc_id, (c.text IS NOT NULL) AS in_corpus, m.rep,
        |       (c.text IS NULL AND b.doc_id = m.rep) AS keep
        |FROM b JOIN m USING (text) LEFT JOIN c ON b.text = c.text
        |ORDER BY b.doc_id""".stripMargin,

    // structural oracle for the WARC framing: the oracle does not parse
    // the archive — it independently derives what a correct
    // Content-Length-driven parse of the fixture construction MUST yield
    // (url, raw date header, http-stripped body), so any framing slip
    // (marker splitting on the decoy, off-by-one lengths, header bleed,
    // warcinfo leak-through) lands as a mismatch
    "q_warc_ingest" ->
      raw"""SELECT 'https://crawl.example/doc/' || doc_id AS url,
        |  '2024-03-01T10:15:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z' AS warc_date,
        |  text || e'\nquote WARC/1.0 not a record' AS text_out
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY url""".stripMargin,

    // the bloom gate is an exactness-preserving prefilter, so the bloom
    // variant answers to the very same relational spec
    "q_incr_dedup_bloom" ->
      """WITH b AS (
        |  SELECT doc_id + 2000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' fresh addendum'
        |  FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 4000000, text || ' fresh addendum'
        |  FROM documents WHERE doc_id % 3 = 1),
        |m AS (SELECT text, min(doc_id) AS rep FROM b GROUP BY text),
        |c AS (SELECT DISTINCT text FROM documents)
        |SELECT b.doc_id, (c.text IS NOT NULL) AS in_corpus, m.rep,
        |       (c.text IS NULL AND b.doc_id = m.rep) AS keep
        |FROM b JOIN m USING (text) LEFT JOIN c ON b.text = c.text
        |ORDER BY b.doc_id""".stripMargin,

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
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
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

    "q_damerau_pairs" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id)
        |SELECT p.id1, p.id2,
        |  damerau_levenshtein(r1.name, r2.name) AS dl,
        |  levenshtein(r1.name, r2.name) AS lev
        |FROM pairs p JOIN recs r1 ON p.id1 = r1.id JOIN recs r2 ON p.id2 = r2.id
        |ORDER BY p.id1, p.id2""".stripMargin,

    // the oracle RUNS the Smith-Waterman DP itself: anti-diagonal d of
    // the H matrix as a list column (1-based slot k = cell i=k-1,
    // j=d-i; boundaries 0), the recursion carrying diagonals d and d-1
    // to build d+1; the answer is the max cell over all diagonals,
    // normalized by the 2*min(n,m) perfect-local-match ceiling
    "q_sw_pairs" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |pp AS (
        |  SELECT p.id1, p.id2, r1.name AS s, r2.name AS t,
        |         CAST(length(r1.name) AS INT) AS n,
        |         CAST(length(r2.name) AS INT) AS m
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE p.id1 % 199 = 0),
        |dp(id1, id2, s, t, n, m, d, prev, cur) AS (
        |  SELECT id1, id2, s, t, n, m, 1,
        |         list_transform(range(0, n+1), i -> 0),
        |         list_transform(range(0, n+1), i -> 0)
        |  FROM pp
        |  UNION ALL
        |  SELECT id1, id2, s, t, n, m, d+1, cur,
        |    list_transform(range(0, n+1), i ->
        |      CASE WHEN i = 0 OR d+1-i <= 0 OR d+1-i > m THEN 0
        |      ELSE greatest(0,
        |        coalesce(cur[CAST(i AS INT)], 0) - 1,
        |        coalesce(cur[CAST(i+1 AS INT)], 0) - 1,
        |        coalesce(prev[CAST(i AS INT)], 0) +
        |          CASE WHEN substr(s, CAST(i AS INT), 1)
        |                  = substr(t, CAST(d+1-i AS INT), 1)
        |               THEN 2 ELSE -1 END)
        |      END)
        |  FROM dp WHERE d < n + m)
        |SELECT id1, id2,
        |  round(max(list_max(cur)) / (2.0 * least(n, m)), 6) AS sw
        |FROM dp GROUP BY id1, id2, n, m
        |ORDER BY id1, id2""".stripMargin,

    // the Gotoh three-matrix recurrence run IN DuckDB: V/I/J carried as
    // anti-diagonal lists; boundaries use the kernel's multiplication
    // form (1.0 + 0.7*k), interiors its left-associated additions, so
    // every cell is IEEE-identical; INF arms (1e300) never win a min
    "q_affine_dp" ->
      raw"""WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |pp AS (
        |  SELECT p.id1, p.id2, r1.name AS s, r2.name AS t,
        |         CAST(length(r1.name) AS INT) AS n,
        |         CAST(length(r2.name) AS INT) AS m
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE p.id1 % 199 = 0),
        |dp(id1, id2, s, t, n, m, d, prev, cur, ci, cj) AS (
        |  SELECT id1, id2, s, t, n, m, 0,
        |    CAST(NULL AS DOUBLE[]),
        |    [0.0] || list_transform(range(1, n+1), i -> CAST(NULL AS DOUBLE)),
        |    [1e300] || list_transform(range(1, n+1), i -> CAST(NULL AS DOUBLE)),
        |    [1e300] || list_transform(range(1, n+1), i -> CAST(NULL AS DOUBLE))
        |  FROM pp
        |  UNION ALL
        |  SELECT id1, id2, s, t, n, m, d+1,
        |    cur,
        |    list_transform(range(0, n+1), i -> CASE
        |      WHEN d+1-i < 0 OR d+1-i > m THEN CAST(NULL AS DOUBLE)
        |      WHEN i = 0 THEN 1.0 + 0.7*(d+1)
        |      WHEN d+1-i = 0 THEN 1.0 + 0.7*i
        |      ELSE least(
        |        prev[CAST(i AS INT)] +
        |          CASE WHEN substr(s, CAST(i AS INT), 1)
        |                  = substr(t, CAST(d+1-i AS INT), 1)
        |               THEN 0.5 ELSE 1.1 END,
        |        least(ci[CAST(i AS INT)] + 0.7,
        |              cur[CAST(i AS INT)] + 1.0 + 0.7),
        |        least(cj[CAST(i+1 AS INT)] + 0.7,
        |              cur[CAST(i+1 AS INT)] + 1.0 + 0.7))
        |      END),
        |    list_transform(range(0, n+1), i -> CASE
        |      WHEN d+1-i < 0 OR d+1-i > m THEN CAST(NULL AS DOUBLE)
        |      WHEN d+1-i = 0 THEN 1e300
        |      WHEN i = 0 THEN 1.0 + 0.7*(d+1)
        |      ELSE least(ci[CAST(i AS INT)] + 0.7,
        |                 cur[CAST(i AS INT)] + 1.0 + 0.7)
        |      END),
        |    list_transform(range(0, n+1), i -> CASE
        |      WHEN d+1-i < 0 OR d+1-i > m THEN CAST(NULL AS DOUBLE)
        |      WHEN i = 0 OR d+1-i = 0 THEN 1e300
        |      ELSE least(cj[CAST(i+1 AS INT)] + 0.7,
        |                 cur[CAST(i+1 AS INT)] + 1.0 + 0.7)
        |      END)
        |  FROM dp WHERE d < n + m)
        |SELECT id1, id2,
        |  round(cur[CAST(n+1 AS INT)] / (n + m), 6) AS affine
        |FROM dp WHERE d = n + m
        |ORDER BY id1, id2""".stripMargin,

    // the oracle computes the isotonic fit through the minimax identity
    // instead of running PAV: interval means over the pooled points
    // (exact integer/integer divisions), then max over starts of the
    // min over ends — the Robertson-Wright-Dykstra characterization
    "q_isotonic" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |base AS (
        |  SELECT p.id1, p.id2,
        |         jaro_winkler_similarity(r1.name, r2.name) AS jw
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.75
        |    AND (p.id1 + p.id2) % 31 = 0),
        |lab AS (
        |  SELECT round(jw, 3) AS score,
        |    CASE WHEN jw >= 0.99 THEN 1
        |         WHEN jw >= 0.97 THEN
        |           CASE WHEN (id1 + id2) % 10 < 7 THEN 1 ELSE 0 END
        |         ELSE CASE WHEN (id1 + id2) % 10 < 2 THEN 1 ELSE 0 END
        |    END AS lbl
        |  FROM base),
        |pool AS (
        |  SELECT score, count(*) AS n, sum(lbl) AS s FROM lab GROUP BY 1),
        |ord AS (
        |  SELECT score, n, s, row_number() OVER (ORDER BY score) AS rn
        |  FROM pool),
        |ivm AS (
        |  SELECT a.rn AS i, b.rn AS j,
        |         CAST(sum(k.s) AS DOUBLE) / sum(k.n) AS m
        |  FROM ord a
        |  JOIN ord b ON a.rn <= b.rn
        |  JOIN ord k ON k.rn BETWEEN a.rn AND b.rn
        |  GROUP BY a.rn, b.rn),
        |mm AS (
        |  SELECT x.rn AS x, v.i, min(v.m) AS mn
        |  FROM ord x
        |  JOIN ivm v ON v.i <= x.rn AND v.j >= x.rn
        |  GROUP BY x.rn, v.i),
        |fit AS (SELECT x, max(mn) AS f FROM mm GROUP BY x)
        |SELECT o.score, o.n, round(fit.f, 6) AS calibrated
        |FROM ord o JOIN fit ON fit.x = o.rn
        |ORDER BY o.score""".stripMargin,

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

    // INDEPENDENT oracle: exact 3-token-shingle Jaccard over all pairs —
    // equals the LSH+verify output because banded recall is complete on
    // this fixture (deterministic: fixed strings, fixed seeds)
    "q_minhash_fixture" ->
      """WITH docs AS (
        |  SELECT * FROM (VALUES
        |    (CAST(1 AS BIGINT), 'the quick brown fox jumps over the lazy dog and runs away fast'),
        |    (2, 'the quick brown fox jumps over the lazy dog and runs away now'),
        |    (3, 'completely different content about spark clusters and shuffles here today'),
        |    (4, 'completely different content about spark clusters and shuffles here tomorrow'),
        |    (5, 'unrelated third topic with nothing shared at all in common'))
        |    AS v(id, text)),
        |toks AS (
        |  SELECT id, list_filter(
        |    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |    x -> length(x) > 0) AS ts
        |  FROM docs),
        |sh AS (
        |  SELECT id, list_distinct(
        |    [ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1] || ' ' || ts[CAST(i AS INT) + 2]
        |     FOR i IN range(1, len(ts) - 1)]) AS sg
        |  FROM toks),
        |p AS (
        |  SELECT a.id AS id1, b.id AS id2,
        |    CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
        |      / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS j
        |  FROM sh a JOIN sh b ON a.id < b.id)
        |SELECT id1, id2, round(j, 6) AS jaccard FROM p WHERE j >= 0.5
        |ORDER BY id1, id2""".stripMargin,

    // frozen observed table (MinHash agreement runs on internal xxhash64
    // signatures, not SQL-reproducible): 101 = exact recrawl of corpus
    // doc 1, 102 = near-dup of doc 3 at 47/64 agreeing components, 103 =
    // novel. Regression guard for signatures + band keys + the
    // batch-vs-index probe + the estimate
    "q_incr_neardup_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(101 AS BIGINT), true, CAST(1 AS BIGINT),
        |   CAST(1.0 AS DOUBLE), false),
        |  (102, true, 3, 0.734375, false),
        |  (103, false, NULL, NULL, true))
        |  AS t(id, near_dup, dup_of, est_jaccard, keep)
        |ORDER BY id""".stripMargin,

    // frozen constants (hamming runs on internal 64-bit simhashes, not
    // SQL-reproducible): regression guard for simhash64 + band keys
    "q_simhash_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(9 AS BIGINT)),
        |  (3, 4, 8)) AS t(id1, id2, hamming)
        |ORDER BY id1, id2""".stripMargin,

    // frozen observed table (see the query's comment for why (1,2)
    // collides at hamming 9 but (3,4) does not at hamming 8)
    "q_simhash_combo_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(9 AS BIGINT)),
        |  (5, 6, 0)) AS t(id1, id2, hamming)
        |ORDER BY id1, id2""".stripMargin,

    // each predicate index gets its own UNION branch; suffix bound =
    // min(len-2, 16) mirrors the kernel's (minLen 3, cap 16 longest-first)
    "q_blocking_keys2" ->
      """WITH recs AS (
        |  SELECT * FROM (VALUES
        |    (CAST(1 AS BIGINT), 'alpha beta 42 gamma 199',
        |     CAST(250.0 AS DOUBLE), ['x','y','x'], 'p'),
        |    (2, '7 delta 100', 0.02, ['z'], NULL),
        |    (3, 'omega', 0.0, ['a','b','c','d'], 'q'))
        |    AS v(id, name, num, tags, maybe_null)),
        |toks AS (SELECT id, regexp_split_to_array(name, '[^\p{L}\p{N}]+') AS ts FROM recs),
        |ints AS (SELECT id, CAST(x AS BIGINT) AS i
        |         FROM recs, unnest(regexp_extract_all(name, '\d+')) AS u(x)),
        |sset AS (SELECT id, list_sort(list_distinct(tags)) AS st FROM recs),
        |keys AS (
        |  SELECT id, '0:' || ts[1] AS k FROM toks
        |  WHERE len(ts) >= 1 AND length(ts[1]) > 0
        |  UNION
        |  SELECT id, '1:' || ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1]
        |  FROM toks, unnest(range(1, len(ts))) AS r(i)
        |  UNION
        |  SELECT id, '2:' || substr(name, CAST(i AS INT))
        |  FROM recs,
        |    unnest(range(1, least(CAST(length(name) AS BIGINT) - 2, 16) + 1)) AS r(i)
        |  UNION
        |  SELECT id, '3:' || CAST(i AS VARCHAR) FROM ints
        |  UNION
        |  SELECT id, '4:' || regexp_extract(name, '^(\d+)', 1) FROM recs
        |  WHERE length(regexp_extract(name, '^(\d+)', 1)) > 0
        |  UNION
        |  SELECT id, '5:' || CAST(i + d AS VARCHAR)
        |  FROM ints, unnest([-1, 0, 1]) AS o(d)
        |  UNION
        |  SELECT id, '6:' || CAST(i - i % 100 AS VARCHAR) FROM ints
        |  UNION
        |  SELECT id, '7:' || x
        |  FROM recs, unnest(regexp_extract_all(name, '[a-z0-9]+')) AS u(x)
        |  UNION
        |  SELECT id, '8:' || CAST(CAST(round(log10(abs(num))) AS BIGINT) AS VARCHAR)
        |  FROM recs WHERE abs(num) > 0
        |  UNION
        |  SELECT id, '9:' || CASE WHEN maybe_null IS NULL THEN '0' ELSE '1' END
        |  FROM recs
        |  UNION
        |  SELECT id, '10:' || list_aggregate(st, 'string_agg', ' ') FROM sset
        |  UNION
        |  SELECT id, '11:' || t FROM sset, unnest(st) AS u(t)
        |  UNION
        |  SELECT id, '12:' || st[1] FROM sset WHERE len(st) >= 1
        |  UNION
        |  SELECT id, '13:' || st[len(st)] FROM sset WHERE len(st) >= 1
        |  UNION
        |  SELECT s1.id, '14:' || a.t || ' ' || b.t
        |  FROM sset s1, unnest(s1.st) AS a(t), unnest(s1.st) AS b(t)
        |  WHERE a.t < b.t
        |  UNION
        |  SELECT id, '15:' || CAST(CAST(round(log10(len(tags))) AS BIGINT) AS VARCHAR)
        |  FROM recs WHERE len(tags) > 0
        |  UNION
        |  SELECT t.id, '16:' || t.ts[1] || ':' ||
        |    CASE WHEN r.maybe_null IS NULL THEN '0' ELSE '1' END
        |  FROM toks t JOIN recs r USING (id) WHERE len(t.ts) >= 1)
        |SELECT id, k AS block_key FROM keys ORDER BY id, block_key""".stripMargin,

    // full probe ⇒ exact: the oracle is brute-force top-k (same as
    // q_ann_topk) — any IVF plumbing bug that loses or double-counts a
    // candidate breaks the hash
    "q_ann_ivf_full" ->
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

    // SemDeDup twin: same modulus-sampled centroids, argmax assignment
    // (ties: cos desc, cent_id asc — mirrors max_by(_, struct(cos_c,
    // -cent_id))), within-cluster pairs, recursive-CTE connected
    // components (component = min reachable id = CC.run's label
    // contract), keeper = lowest cos-to-centroid then lowest id
    "q_semdedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT id AS cent_id, v AS cvec FROM e WHERE id % 50 = 0),
        |sc AS (SELECT e.id, c.cent_id,
        |         list_cosine_similarity(e.v, c.cvec) AS cos_c FROM e, c),
        |asg AS (
        |  SELECT id, cent_id, cos_c FROM (
        |    SELECT id, cent_id, cos_c,
        |           row_number() OVER (PARTITION BY id
        |                              ORDER BY cos_c DESC, cent_id) AS rn
        |    FROM sc) WHERE rn = 1),
        |dup AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM asg a JOIN asg b ON a.cent_id = b.cent_id AND a.id < b.id
        |  JOIN e ea ON ea.id = a.id JOIN e eb ON eb.id = b.id
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4),
        |edges AS (SELECT id1 AS u, id2 AS v FROM dup
        |          UNION SELECT id2, id1 FROM dup),
        |reach(id, n) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.id, e2.v FROM reach r JOIN edges e2 ON r.n = e2.u),
        |grp AS (SELECT id, least(min(n), id) AS group_id FROM reach GROUP BY id),
        |lab AS (
        |  SELECT asg.id, asg.cent_id, asg.cos_c,
        |         coalesce(grp.group_id, asg.id) AS group_id
        |  FROM asg LEFT JOIN grp ON asg.id = grp.id)
        |SELECT id AS item_id, cent_id, round(cos_c, 5) AS cos_c, group_id,
        |       (row_number() OVER (PARTITION BY group_id
        |                           ORDER BY cos_c ASC, id) = 1) AS keep
        |FROM lab ORDER BY item_id""".stripMargin,

    "q_blocking_keys" ->
      """WITH recs AS (
        |  SELECT * FROM (VALUES
        |    (CAST(1 AS BIGINT), 'acme corp intl'),
        |    (2, 'beta data systems'),
        |    (3, 'corp acme')) AS v(id, name)),
        |toks AS (
        |  SELECT id, regexp_split_to_array(name, '[^\p{L}\p{N}]+') AS ts
        |  FROM recs),
        |keys AS (
        |  SELECT id, '0:' || t AS block_key
        |  FROM toks, unnest(ts) AS u(t) WHERE length(t) > 0
        |  UNION
        |  SELECT id, '1:' || substr(name, 1, 3) FROM recs
        |  UNION
        |  SELECT id, '2:' || list_aggregate(
        |    list_transform(list_sort(ts), x -> substr(x, 1, 1)), 'string_agg', '')
        |  FROM toks
        |  UNION
        |  SELECT id, '3:' || list_aggregate(
        |    list_sort(list_distinct(ts)), 'string_agg', '')
        |  FROM toks
        |  UNION
        |  SELECT id, '4:' || substr(name, CAST(i AS INT), 4)
        |  FROM recs, unnest(range(1, length(name) - 2)) AS r(i))
        |SELECT id, block_key FROM keys ORDER BY id, block_key""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_threshold" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT 1.0/(1.0 + exp(-((-8.0 + 9.0*jaro_winkler_similarity(r1.name, r2.name))
        |    + 6.0*(1.0 - CAST(levenshtein(r1.name, r2.name) AS DOUBLE)
        |                 / greatest(length(r1.name), length(r2.name)))))) AS score
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |hist AS (
        |  SELECT least(CAST(floor(score*200) AS INTEGER), 199) AS bin,
        |         count(*) AS n, sum(score) AS mass
        |  FROM scored GROUP BY 1),
        |sweep AS (
        |  SELECT bin,
        |    sum(n) OVER (ORDER BY bin DESC) AS n_above,
        |    sum(mass) OVER (ORDER BY bin DESC) AS mass_above,
        |    (SELECT sum(mass ORDER BY bin) FROM hist) AS total_mass
        |  FROM hist),
        |f AS (
        |  SELECT bin/200.0 AS theta,
        |    ((2.0*(mass_above/n_above))*(mass_above/total_mass))
        |      / ((1.0*(mass_above/n_above)) + (mass_above/total_mass)) AS fscore
        |  FROM sweep)
        |SELECT theta FROM f ORDER BY fscore DESC, theta DESC LIMIT 1""".stripMargin,

    "q_uncertain_batch" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |    (-8.0 + 9.0*jaro_winkler_similarity(r1.name, r2.name)
        |          + 6.0*(1.0 - CAST(levenshtein(r1.name, r2.name) AS DOUBLE)
        |                 / greatest(length(r1.name), length(r2.name)))) AS z
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |roles AS (
        |  SELECT id1 AS rid, id1, id2, z FROM scored
        |  UNION ALL
        |  SELECT id2 AS rid, id1, id2, z FROM scored),
        |ranked AS (
        |  SELECT rid, id1, id2, z,
        |    row_number() OVER (PARTITION BY rid ORDER BY abs(z), id1, id2) AS rk
        |  FROM roles),
        |mutual AS (
        |  SELECT id1, id2, z FROM ranked WHERE rk <= 1
        |  GROUP BY id1, id2, z HAVING count(*) = 2)
        |SELECT id1, id2, round(z, 6) AS z
        |FROM mutual ORDER BY abs(z), id1, id2 LIMIT 100""".stripMargin,

    // the whole active-learning loop unrolled: uncertain batch under
    // the prior, golden labels, TWO micro-unit GD steps (the
    // q_lr_quality idiom — contributions quantized to BIGINT before the
    // sum, weight updates HALF_UP), re-score, re-rank
    "q_al_round" ->
      raw"""WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |feat AS (
        |  SELECT p.id1, p.id2,
        |    jaro_winkler_similarity(r1.name, r2.name) AS jw,
        |    (1.0 - CAST(levenshtein(r1.name, r2.name) AS DOUBLE)
        |           / greatest(length(r1.name), length(r2.name))) AS lev_sim
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |scored0 AS (
        |  SELECT id1, id2, -8.0 + 9.0*jw + 6.0*lev_sim AS z FROM feat),
        |roles0 AS (
        |  SELECT id1 AS rid, id1, id2, z FROM scored0
        |  UNION ALL
        |  SELECT id2 AS rid, id1, id2, z FROM scored0),
        |ranked0 AS (
        |  SELECT rid, id1, id2, z,
        |    row_number() OVER (PARTITION BY rid ORDER BY abs(z), id1, id2) AS rk
        |  FROM roles0),
        |batch0 AS (
        |  SELECT id1, id2 FROM (
        |    SELECT id1, id2, z FROM ranked0 WHERE rk <= 1
        |    GROUP BY id1, id2, z HAVING count(*) = 2)
        |  ORDER BY abs(z), id1, id2 LIMIT 100),
        |labeled AS (
        |  SELECT f.id1, f.id2,
        |    CAST(round(f.jw * 1e6, 0) AS BIGINT) AS xjw,
        |    CAST(round(f.lev_sim * 1e6, 0) AS BIGINT) AS xlv,
        |    CAST(1000000 AS BIGINT) AS xb,
        |    CASE WHEN f.jw >= 0.63 THEN 1.0 ELSE 0.0 END AS y
        |  FROM batch0 b JOIN feat f USING (id1, id2)),
        |nn AS (SELECT count(*) AS n FROM labeled),
        |g1 AS (
        |  SELECT
        |    CAST(sum(CAST(round(xjw * (0.5 - y), 0) AS BIGINT)) AS BIGINT) AS gjw,
        |    CAST(sum(CAST(round(xlv * (0.5 - y), 0) AS BIGINT)) AS BIGINT) AS glv,
        |    CAST(sum(CAST(round(xb  * (0.5 - y), 0) AS BIGINT)) AS BIGINT) AS gb
        |  FROM labeled),
        |w1 AS (
        |  SELECT
        |    0 - CAST(round(10.0 * g1.gjw / nn.n, 0) AS BIGINT) AS wjw,
        |    0 - CAST(round(10.0 * g1.glv / nn.n, 0) AS BIGINT) AS wlv,
        |    0 - CAST(round(10.0 * g1.gb  / nn.n, 0) AS BIGINT) AS wb
        |  FROM g1, nn),
        |r2 AS (
        |  SELECT l.xjw, l.xlv, l.xb,
        |    1.0 / (1.0 + exp(-CAST(l.xjw*w1.wjw + l.xlv*w1.wlv
        |                           + l.xb*w1.wb AS DOUBLE) / 1e12)) - l.y AS r
        |  FROM labeled l, w1),
        |g2 AS (
        |  SELECT
        |    CAST(sum(CAST(round(xjw * r, 0) AS BIGINT)) AS BIGINT) AS gjw,
        |    CAST(sum(CAST(round(xlv * r, 0) AS BIGINT)) AS BIGINT) AS glv,
        |    CAST(sum(CAST(round(xb  * r, 0) AS BIGINT)) AS BIGINT) AS gb
        |  FROM r2),
        |w2 AS (
        |  SELECT
        |    w1.wjw - CAST(round(10.0 * g2.gjw / nn.n, 0) AS BIGINT) AS wjw,
        |    w1.wlv - CAST(round(10.0 * g2.glv / nn.n, 0) AS BIGINT) AS wlv,
        |    w1.wb  - CAST(round(10.0 * g2.gb  / nn.n, 0) AS BIGINT) AS wb
        |  FROM w1, g2, nn),
        |rescored AS (
        |  SELECT f.id1, f.id2,
        |    CAST(CAST(round(f.jw * 1e6, 0) AS BIGINT) * w2.wjw
        |       + CAST(round(f.lev_sim * 1e6, 0) AS BIGINT) * w2.wlv
        |       + 1000000 * w2.wb AS DOUBLE) / 1e12 AS z
        |  FROM feat f, w2),
        |roles AS (
        |  SELECT id1 AS rid, id1, id2, z FROM rescored
        |  UNION ALL
        |  SELECT id2 AS rid, id1, id2, z FROM rescored),
        |ranked AS (
        |  SELECT rid, id1, id2, z,
        |    row_number() OVER (PARTITION BY rid ORDER BY abs(z), id1, id2) AS rk
        |  FROM roles),
        |mutual AS (
        |  SELECT id1, id2, z FROM ranked WHERE rk <= 1
        |  GROUP BY id1, id2, z HAVING count(*) = 2)
        |SELECT id1, id2, round(z, 6) AS z
        |FROM mutual ORDER BY abs(z), id1, id2 LIMIT 100""".stripMargin,

    "q_tfidf_cosine" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |toks AS (
        |  SELECT id, tok AS term FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0),
        |tf AS (
        |  SELECT id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM recs),
        |dfreq AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT id, term FROM toks) GROUP BY term),
        |w AS (
        |  SELECT tf.id, tf.term,
        |    tf.tf * (ln(((SELECT n FROM nd) + 1.0) / (dfreq.df + 1)) + 1.0) AS w
        |  FROM tf JOIN dfreq USING (term)),
        |ranked AS (
        |  SELECT id, term, w,
        |    row_number() OVER (PARTITION BY id ORDER BY w DESC, term) AS rk
        |  FROM w),
        |topw AS (SELECT id, term, w FROM ranked WHERE rk <= 64),
        |nrm AS (SELECT id, sqrt(sum(w*w)) AS nrm FROM topw GROUP BY id),
        |vec AS (
        |  SELECT t.id, t.term, t.w / n.nrm AS wn
        |  FROM topw t JOIN nrm n USING (id)),
        |dots AS (
        |  SELECT p.id1, p.id2, sum(v1.wn * v2.wn) AS cos
        |  FROM pairs p
        |  JOIN vec v1 ON v1.id = p.id1
        |  JOIN vec v2 ON v2.id = p.id2 AND v1.term = v2.term
        |  GROUP BY 1, 2)
        |SELECT p.id1, p.id2, round(coalesce(d.cos, 0.0), 6) AS cos
        |FROM pairs p LEFT JOIN dots d USING (id1, id2)
        |ORDER BY id1, id2""".stripMargin,

    // INDEPENDENT rebuild of the flagship gazetteer scores for the
    // pinned docs (ADVICE r4): rebuilds the -v1 text derivation from the
    // raw parquet (normalize collapses PagesGen's doubled space, so
    // mnorm = cnorm || ' © example inc'), substitutes the 2-byte '©'
    // with ASCII '@' on both sides so DuckDB's byte-counting JW/lev
    // equals our char-counting kernels (substitution is 1-char↔1-char
    // and '@' never occurs in the vocab — no distance changes), and
    // pushes jw/lev_sim/exact_lang through the demoModel sigmoid.
    "q_gazetteer_spot" ->
      """WITH spot AS (
        |  SELECT * FROM (VALUES (11),(37),(120),(208),(261),(333),(404)) s(doc_id)),
        |base AS (
        |  SELECT d.doc_id,
        |    lower(trim(regexp_replace(d.text, '\s+', ' ', 'g'))) AS cnorm
        |  FROM documents d JOIN spot USING (doc_id)),
        |sc AS (
        |  SELECT doc_id, replace(cnorm, '©', '@') AS c,
        |    replace(cnorm || ' © example inc', '©', '@') AS m
        |  FROM base),
        |f AS (
        |  SELECT doc_id, jaro_winkler_similarity(c, m) AS jw,
        |    1.0 - CAST(levenshtein(c, m) AS DOUBLE)
        |      / greatest(length(c), length(m)) AS lev_sim
        |  FROM sc)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(doc_id AS BIGINT) AS canon_doc,
        |  round(1.0/(1.0 + exp(-(-13.0 + 6.0*jw + 9.0*lev_sim + 0.4))), 6) AS score
        |FROM f ORDER BY doc_id""".stripMargin,

    // frozen observed table (the q_simhash_combo_fixture idiom at
    // full surface): the flagship gazetteer pipeline blocks on
    // simhash-of-text keys, which DuckDB cannot recompute (xxhash64
    // internals) - the oracle pins the complete 456-row match table
    // instead (verified identical across parallelism levels; testdata
    // is seed-fixed and read-only, so the constants are stable).
    // Any drift in prepare/blocking/scoring/ranking -> hash mismatch.
    "q_gazetteer" ->
      """SELECT * FROM (VALUES
        |  
        |  (CAST(-9136122943942289660 AS BIGINT), CAST(-8555444254264629136 AS BIGINT), CAST(0.895028 AS DOUBLE), CAST(1 AS BIGINT)),
        |  (-9077191951453321577, 6258471487415018888, 0.893296, 1),
        |  (-8989348959301508422, 7370186043205003842, 0.893496, 1),
        |  (-8942480582415683546, 4507192468697300350, 0.887196, 1),
        |  (-8905332820107222157, 6244649326971941544, 0.893644, 1),
        |  (-8900402074605455939, 3431158106648949384, 0.773732, 1),
        |  (-8759597916136143623, -6449236042923690346, 0.627394, 1),
        |  (-8755462995603592940, 3585015177172603474, 0.855589, 1),
        |  (-8691914923281667389, -409987194856902957, 0.8766, 1),
        |  (-8689955591246271520, 4292064520302568476, 0.883007, 1),
        |  (-8685828905485308400, 7694756269878099120, 0.881937, 1),
        |  (-8666739083954832791, 5361784614586244827, 0.865191, 1),
        |  (-8652877284894691836, 8049688868930686773, 0.887035, 1),
        |  (-8608998135546206022, -4009488725986204628, 0.851315, 1),
        |  (-8597355913585059914, 6355908395796127491, 0.882587, 1),
        |  (-8574776333597469624, -7965387250369688812, 0.843697, 1),
        |  (-8573303562405850866, -5452336503488361108, 0.825639, 1),
        |  (-8563357641860143342, 3758821413050989773, 0.805639, 1),
        |  (-8367497275361717165, 5755401022430944701, 0.773732, 1),
        |  (-8366030306254801619, -6224135297466627382, 0.83591, 1),
        |  (-8310110552579449524, 5244965563534464942, 0.862158, 1),
        |  (-8307496965692536261, -7535022861774847174, 0.877598, 1),
        |  (-8304284126400155479, 6269279668112785659, 0.834158, 1),
        |  (-8268155546644645016, 6229704175073654420, 0.831704, 1),
        |  (-8251184553134044741, -792159771085373328, 0.893693, 1),
        |  (-8157731143739034713, 7161977243062020628, 0.890656, 1),
        |  (-8091723136740163261, 6095341388086419051, 0.875549, 1),
        |  (-8080217873158455968, 3155931764058400446, 0.882587, 1),
        |  (-8070699820264974770, 1791349102993689227, 0.891206, 1),
        |  (-8046055400497140484, -4741892747516375287, 0.862158, 1),
        |  (-7992506166086570428, 5610613433891672622, 0.863968, 1),
        |  (-7958452314570758863, 7301171924964487948, 0.845084, 1),
        |  (-7885264325222524187, 3296791573150615383, 0.838139, 1),
        |  (-7858035665800399264, 1580833247761098280, 0.883518, 1),
        |  (-7839752611221276812, -8445481118404063755, 0.894495, 1),
        |  (-7766630611896002936, 6753560740260447656, 0.879329, 1),
        |  (-7669644144538414649, 4310821310208400282, 0.728325, 1),
        |  (-7656017001585069554, 8487667983549248759, 0.839209, 1),
        |  (-7636344679858891445, -665601498887416896, 0.877737, 1),
        |  (-7610675166760086334, 4062856442325664702, 0.88955, 1),
        |  (-7562390563150501174, -9101253151273612696, 0.83233, 1),
        |  (-7536015291159403447, -4546419949007043325, 0.871867, 1),
        |  (-7525468390115218609, -2425375697007676367, 0.681054, 1),
        |  (-7487291644741079556, -4173198586993500411, 0.884591, 1),
        |  (-7483768082478976427, 2840775622543380665, 0.856574, 1),
        |  (-7469173185165146593, 3253639502054763198, 0.886954, 1),
        |  (-7466270659040598350, 768676019312097275, 0.889067, 1),
        |  (-7396640181219107645, -5413422757259242273, 0.89156, 1),
        |  (-7355999049246346310, -5930263041711656893, 0.89379, 1),
        |  (-7353805160598729721, -6228961821147791926, 0.609173, 1),
        |  (-7335723565927949921, -5952336077035037686, 0.89224, 1),
        |  (-7316385916936481564, 5346394748121700754, 0.889618, 1),
        |  (-7316001025771267738, -2016084029587404427, 0.867036, 1),
        |  (-7279750011714525043, 7290776152899435626, 0.851693, 1),
        |  (-7274198802297440643, 2911789903832707966, 0.875395, 1),
        |  (-7268220017704308446, 896954017102786420, 0.894449, 1),
        |  (-7194887180025333172, 3520305246754728653, 0.805639, 1),
        |  (-7191782811060595246, -4617570179741439052, 0.850546, 1),
        |  (-7186458600080514581, -5192676451693841735, 0.864217, 1),
        |  (-7144728048252243487, 854186680131796119, 0.808704, 1),
        |  (-7127264816613125645, -5965746575452053247, 0.883213, 1),
        |  (-7073257820207475092, 2886075969301620390, 0.819512, 1),
        |  (-7037706104191992596, 7957466012779207715, 0.879581, 1),
        |  (-7025785674126107150, -2840282989457039042, 0.891905, 1),
        |  (-7019179568737243846, -3280198160082296730, 0.8766, 1),
        |  (-7019043135744659651, 5283304679537512206, 0.884305, 1),
        |  (-6992562480204281344, -4938347137128510442, 0.878282, 1),
        |  (-6983972182831694885, 5206061144437758479, 0.883007, 1),
        |  (-6978475752136563455, -3759478549115771465, 0.894941, 1),
        |  (-6954261944287886996, -8958332288015772543, 0.89262, 1),
        |  (-6944624679138181919, -6500151398876701299, 0.728325, 1),
        |  (-6890342884274670090, 6574637337007020879, 0.877459, 1),
        |  (-6863669927588018145, -238455980567489835, 0.876006, 1),
        |  (-6856948230777549843, -8688013507003446772, 0.86613, 1),
        |  (-6801622542885142801, 4599040384815712462, 0.853876, 1),
        |  (-6759950729040366960, -31221838143653371, 0.885419, 1),
        |  (-6716566018214085803, 1199301467665583295, 0.870362, 1),
        |  (-6714065265861596435, 9188024787933081961, 0.875395, 1),
        |  (-6693639701340973349, 1608659009403306295, 0.838678, 1),
        |  (-6693354762298699053, -2663732634015028986, 0.891086, 1),
        |  (-6681032227376854426, 9134703287407871468, 0.892566, 1),
        |  (-6634576070443555515, 1190550415150664283, 0.876006, 1),
        |  (-6626195802720155941, -1902965038539113620, 0.892989, 1),
        |  (-6618934026068573916, 4852117581986786284, 0.872584, 1),
        |  (-6602047151401702194, -2080672882893313056, 0.845535, 1),
        |  (-6580155793714888305, 8259425508406679785, 0.842744, 1),
        |  (-6527890505065029055, 5436000695296191227, 0.873107, 1),
        |  (-6525734132153529076, -6024327985296347231, 0.895328, 1),
        |  (-6511536995065645219, 4975814665790514387, 0.857214, 1),
        |  (-6409763047220331190, -6273248057136373810, 0.858149, 1),
        |  (-6308156489607867346, 500988485715036691, 0.89078, 1),
        |  (-6296264319937376408, 6969896293952181043, 0.82343, 1),
        |  (-6279958813761189000, 2205299532815068323, 0.870938, 1),
        |  (-6213765358410690141, -2138256695306912209, 0.82775, 1),
        |  (-6180252188718568984, 8141568754578550685, 0.783194, 1),
        |  (-6173926349833674826, 701529259602491495, 0.73885, 1),
        |  (-6141709830869154570, -5048619398697337853, 0.858149, 1),
        |  (-6004541203954494763, 1228906602045218390, 0.803503, 1),
        |  (-5970143451864555282, 8023142241265652544, 0.869772, 1),
        |  (-5948253644613207720, 5950643072593461402, 0.888997, 1),
        |  (-5936736628313703511, -506882619902587684, 0.595978, 1),
        |  (-5902366602175910818, -6207588670345941654, 0.894357, 1),
        |  (-5896636130622782913, -6658395522691437033, 0.884685, 1),
        |  (-5893933406320202627, 5295132262104516951, 0.892566, 1),
        |  (-5889444159268477248, 8270844320304687621, 0.838139, 1),
        |  (-5837864517013363137, 1051501049721059875, 0.893693, 1),
        |  (-5836560685159131253, 5345049192663900626, 0.857214, 1),
        |  (-5812429974987091317, -985005196534776395, 0.888855, 1),
        |  (-5783397339162863229, -152221372238448779, 0.783194, 1),
        |  (-5783145074330552140, -8773228527645234700, 0.885508, 1),
        |  (-5783036769585002700, -5617740817171542870, 0.881937, 1),
        |  (-5779007708771461869, -4553697298639820687, 0.893983, 1),
        |  (-5768472688042361131, 35553338014875586, 0.864464, 1),
        |  (-5755539031968569325, -3666124956166284736, 0.887745, 1),
        |  (-5737915876727480880, -4253089063274168826, 0.892185, 1),
        |  (-5706019522756434750, 8267213573378647457, 0.892185, 1),
        |  (-5666512154995856236, -5322060376905593096, 0.881937, 1),
        |  (-5614874762602037563, -4178077258748569329, 0.89156, 1),
        |  (-5548489882453924343, 3852089147159281489, 0.63308, 1),
        |  (-5470692424198422047, -7560505074377851680, 0.889414, 1),
        |  (-5465005961911336404, 7218300013144599451, 0.863463, 1),
        |  (-5439999858978611536, 5943245312338024085, 0.882693, 1),
        |  (-5421354672901415784, 7506518966342744140, 0.891266, 1),
        |  (-5344441978502697684, 8157800627520261850, 0.756997, 1),
        |  (-5288624012595582556, -1565184257204767481, 0.873618, 1),
        |  (-5234999164145039413, 4014461177124797250, 0.848543, 1),
        |  (-5181249548907151198, -5529317283144893114, 0.890467, 1),
        |  (-5164003303166839929, 7208718258614464313, 0.728325, 1),
        |  (-5143226869197819532, -4508670924670138032, 0.878943, 1),
        |  (-5127054137432438574, -5327850816649535232, 0.82267, 1),
        |  (-5038427338498752688, 4682168738164004729, 0.880797, 1),
        |  (-4951749494384326133, 4375290804769962083, 0.868124, 1),
        |  (-4868943982985449592, 6019938961042060839, 0.845535, 1),
        |  (-4841779352064454460, -4077162934904156147, 0.887821, 1),
        |  (-4800702327047897852, -8034878167657630208, 0.890718, 1),
        |  (-4800385696930744441, -2139427274543504171, 0.854226, 1),
        |  (-4797196997010145398, 1579769187542771638, 0.876745, 1),
        |  (-4733371859637921758, 1221288726546922826, 0.831704, 1),
        |  (-4687592810880089746, 8593836534825225312, 0.574443, 1),
        |  (-4596553298066944414, 4923769720248707909, 0.887355, 1),
        |  (-4575546805302364668, -1734631470732606574, 0.894357, 1),
        |  (-4516887621472491830, -5350661365371694512, 0.89078, 1),
        |  (-4427553655750388966, 4334461911810502198, 0.866812, 1),
        |  (-4253640813253427748, 6753560740260447656, 0.884301, 1),
        |  (-4231015677181462699, 7279405802790293880, 0.887512, 1),
        |  (-4215819642925822199, -2351676657452698220, 0.887512, 1),
        |  (-4153320158022063881, 2739745110181046082, 0.836479, 1),
        |  (-4153000348301242124, 7718830403152610783, 0.801288, 1),
        |  (-4087510993584591658, -6604876781530007130, 0.719676, 1),
        |  (-4002248002699443842, 2567962485545523447, 0.887821, 1),
        |  (-3809396174036906403, 5171361651788775814, 0.839734, 1),
        |  (-3782190832551877688, -7348672533157490224, 0.848129, 1),
        |  (-3693559613730207406, 481129375639282886, 0.802406, 1),
        |  (-3622319520127765173, 2615383009893941475, 0.894853, 1),
        |  (-3572635851547102279, 6719973809943403051, 0.858149, 1),
        |  (-3562157161250497711, 7363520821235083456, 0.890656, 1),
        |  (-3517236212432482145, 128139317542507283, 0.866587, 1),
        |  (-3449029388930799485, 8487986959552225556, 0.81066, 1),
        |  (-3389377468198766630, -3370398169550136493, 0.783194, 1),
        |  (-3362096326189632517, -480353640343528170, 0.890656, 1),
        |  (-3300047847907312852, 7065867560034396800, 0.866812, 1),
        |  (-3280688182506006953, -3200697973625116036, 0.88612, 1),
        |  (-3276493565575321219, -2824313666826713781, 0.864464, 1),
        |  (-3264288531871275607, -1970269778714734973, 0.883916, 1),
        |  (-3263730824451341584, 6338368147984134564, 0.788879, 1),
        |  (-3094180438281684887, -3314184822057141139, 0.883213, 1),
        |  (-3092682907185435107, 1398033142671587292, 0.890593, 1),
        |  (-3058026067398902850, 2109820366727306029, 0.883417, 1),
        |  (-3039664342161632573, -5598243228052446765, 0.881826, 1),
        |  (-2955883877807864565, 2461369244061512506, 0.880797, 1),
        |  (-2923371327958303855, -9027742071959958542, 0.864709, 1),
        |  (-2909130669356542641, -5325532047139745647, 0.889685, 1),
        |  (-2864192952552297573, -563255949754009447, 0.877176, 1),
        |  (-2862896256510257400, -7088304921555737933, 0.808704, 1),
        |  (-2849840656787701715, 7425524004609275001, 0.877034, 1),
        |  (-2668712346631556263, -5320027010131467399, 0.733723, 1),
        |  (-2632727754219754989, 9177211793803331981, 0.891384, 1),
        |  (-2606091688989032360, 5732989910032178849, 0.894311, 1),
        |  (-2515718115062117048, 1179936765621307445, 0.886873, 1),
        |  (-2514230779456612377, -8448518636007996859, 0.877176, 1),
        |  (-2478000929232997666, -8998382508058093217, 0.82775, 1),
        |  (-2366311632747909567, -6016445177655781276, 0.73885, 1),
        |  (-2346725161097884426, 2880417805945794894, 0.871314, 1),
        |  (-2341539542242828729, -518560697746142428, 0.831069, 1),
        |  (-2308023705787462122, -9182422714695459167, 0.864217, 1),
        |  (-2258087717043922875, -3305227702400728346, 0.883417, 1),
        |  (-2252255846272995670, 8226755770397997679, 0.841268, 1),
        |  (-2251375644365265583, 2302149626223098055, 0.893194, 1),
        |  (-2248304438044313538, -4803791951796508865, 0.888274, 1),
        |  (-2227116908524035524, -8041911219855474682, 0.869572, 1),
        |  (-2133251882498595870, -9065356332396509835, 0.888495, 1),
        |  (-2063006106885035514, -6829151904147835877, 0.890467, 1),
        |  (-2024631771198073671, -7802120016388094494, 0.834158, 1),
        |  (-1894550559348061325, -3460577570178870768, 0.756997, 1),
        |  (-1893151809819776446, -2434356416922037433, 0.895496, 1),
        |  (-1815847464946029025, 6272570395460268037, 0.805639, 1),
        |  (-1785975963957843666, 3331328930576915870, 0.860508, 1),
        |  (-1775322677318141776, -2036997271317333118, 0.892884, 1),
        |  (-1710554663421702326, 4114532695689845083, 0.88612, 1),
        |  (-1645818288870869400, -6775604480703341384, 0.865665, 1),
        |  (-1638346426379866556, 5548233671608460173, 0.885056, 1),
        |  (-1566575727528286915, 4282746826924388305, 0.890842, 1),
        |  (-1547842654881093318, 8394402776719288513, 0.864217, 1),
        |  (-1545203630834381698, 6667311126594858932, 0.880077, 1),
        |  (-1527772250271166227, -5955335097508405464, 0.875703, 1),
        |  (-1432496804162438670, 3321374935179125369, 0.874925, 1),
        |  (-1387921483963621116, -1698377919939302129, 0.888124, 1),
        |  (-1385367717400212524, -4853216756774050685, 0.888855, 1),
        |  (-1363676331472695557, -5530712105647340515, 0.89078, 1),
        |  (-1328897166458280296, 8435845459931529885, 0.852803, 1),
        |  (-1183509580624364654, -3856515090496061159, 0.859352, 1),
        |  (-1174214849570928682, 8151199716442222774, 0.887974, 1),
        |  (-1133138678902349120, 2017440989365801822, 0.886034, 1),
        |  (-1047337986079787544, 3170956706699629890, 0.891206, 1),
        |  (-1003745641001207465, -1064929229777137943, 0.816145, 1),
        |  (-992103544523029893, 6638325682850968788, 0.857214, 1),
        |  (-969777977688741578, -791428955092985837, 0.859935, 1),
        |  (-961825910466226103, -2535136422153453814, 0.85784, 1),
        |  (-960885776564813502, -403947823932245628, 0.873952, 1),
        |  (-943119300141814905, -7452313224219489680, 0.867257, 1),
        |  (-939024730362400230, 5145137164306670182, 0.827057, 1),
        |  (-910820872064285735, -8150098533406221629, 0.833557, 1),
        |  (-855532024128552000, 2057340386479112522, 0.85625, 1),
        |  (-751855698707151023, 576953098747135659, 0.815269, 1),
        |  (-704628306172646700, -6403866841300119956, 0.889618, 1),
        |  (-626151672108294156, 8471526730064475236, 0.839209, 1),
        |  (-545160855965856241, 2142977733858519382, 0.87689, 1),
        |  (-533970143005994833, -4987271974903018543, 0.855589, 1),
        |  (-506793201243842566, -3458748500021626966, 0.874117, 1),
        |  (-421904989447330231, -8199519260286724805, 0.826353, 1),
        |  (-413224271846509291, -3575509441594798283, 0.877318, 1),
        |  (-385923126419590722, -696202167394892000, 0.871127, 1),
        |  (-312893888534061530, -1039915428894376435, 0.891146, 1),
        |  (-311986659274154622, -8386159808273539450, 0.882265, 1),
        |  (-290014722400824542, -7749507540905837098, 0.891443, 1),
        |  (-250876514734144698, 3446307693410527305, 0.79538, 1),
        |  (-186418387765164662, -1567340467482808894, 0.882373, 1),
        |  (-104837609738822956, 3613748582029983093, 0.86613, 1),
        |  (-27209559553941325, 3719159349713957198, 0.860789, 1),
        |  (41101392161205842, -6039608847580393553, 0.889414, 1),
        |  (50806158368243620, -8242143042681191384, 0.796606, 1),
        |  (56085193263751513, 3760660752270641212, 0.865898, 1),
        |  (65481256310819941, 1780448920101393967, 0.852437, 1),
        |  (70745768036120996, 4923543922969862796, 0.891206, 1),
        |  (99084734628634326, -4967158407808764955, 0.890276, 1),
        |  (105687415871656958, 4436412644365148451, 0.595978, 1),
        |  (135202530798233284, -3948648770050153981, 0.833557, 1),
        |  (169625292878795346, 1511248584821909096, 0.841766, 1),
        |  (297128686762666715, 2227039825181384368, 0.855921, 1),
        |  (321779803449043628, 4009979357736351042, 0.870167, 1),
        |  (331748413556380554, 1682176959432215277, 0.801288, 1),
        |  (524305362703757721, 6610354142903923210, 0.895115, 1),
        |  (535117835892297830, 5733201980653691439, 0.888784, 1),
        |  (625712206729766397, -3619817195085493051, 0.533284, 1),
        |  (630011167694510779, -6795813771914704702, 0.893595, 1),
        |  (683132558408175744, -7653829124960833122, 0.893644, 1),
        |  (686056517694479095, -1348630549438124704, 0.885948, 1),
        |  (790819953972209925, 8699999106764791757, 0.882373, 1),
        |  (857034425537413719, -8688331719117321894, 0.891443, 1),
        |  (861152434476222906, -5429593599297328829, 0.839734, 1),
        |  (927767490738513140, -1209953534934061062, 0.832948, 1),
        |  (929421957183434774, 3641261416982353983, 0.773732, 1),
        |  (936054866270912953, -3495479025416423236, 0.83591, 1),
        |  (1001860687551134568, 7505159226213649995, 0.832948, 1),
        |  (1019584344768962778, -7405816337115579916, 0.888495, 1),
        |  (1135657683912797676, -2976407017222424761, 0.864217, 1),
        |  (1158875806879673667, 7238890701456138206, 0.89403, 1),
        |  (1193011172957439035, -7021339964465936495, 0.858454, 1),
        |  (1221006303073254458, -8069315857294911217, 0.882373, 1),
        |  (1221061738467402437, -6142289119257328671, 0.888567, 1),
        |  (1231939835035938560, -5024256081096007442, 0.893143, 1),
        |  (1320578893843370975, -293538570129790667, 0.888926, 1),
        |  (1326173134302832723, -7319877349628996357, 0.890404, 1),
        |  (1362132656739009885, 5174563464946153951, 0.860508, 1),
        |  (1363175025343921056, 3238083677355099626, 0.852803, 1),
        |  (1423360881919278070, 3892693667925610266, 0.889345, 1),
        |  (1424575477675663995, 6244649326971941544, 0.896676, 1),
        |  (1462484291136579838, 1500683031777402677, 0.88032, 1),
        |  (1505541067714529464, 1829926434712846057, 0.780172, 1),
        |  (1564942067536378539, 2211256723413186927, 0.882587, 1),
        |  (1576958277770292280, -9087520300356777165, 0.871314, 1),
        |  (1655958296081878546, -1920482382900623618, 0.722636, 1),
        |  (1707958904205407113, -1085546423847863636, 0.89304, 1),
        |  (1730434989716987227, 6622333290305156559, 0.887116, 1),
        |  (1739593586491226461, -1151594873415425983, 0.890404, 1),
        |  (1767476355094157610, -2411081461702444604, 0.894125, 1),
        |  (1777755177876146478, -4207198779995260776, 0.725518, 1),
        |  (1807122150676524911, 1693603401718583549, 0.836479, 1),
        |  (1808979006483500973, 9189530420133677644, 0.752784, 1),
        |  (1839373416034145371, -5320954115792921094, 0.876305, 1),
        |  (1894102250501058835, -7433338462608090943, 0.870167, 1),
        |  (1901049503407333595, 4071195233296214597, 0.873786, 1),
        |  (1968352422452486490, 8260326270653444996, 0.878011, 1),
        |  (1994454905437564788, 1770202848294616173, 0.89053, 1),
        |  (1996640538770472596, -7013916250871643803, 0.843697, 1),
        |  (2012315405212942411, -3487048295321010250, 0.867695, 1),
        |  (2083136005422583642, 7542213920666094049, 0.886791, 1),
        |  (2131979860551738247, 7007048026266193361, 0.893983, 1),
        |  (2159591482367022323, -9219668057290577111, 0.802406, 1),
        |  (2249357443173872680, -3565388077608956010, 0.890404, 1),
        |  (2310017967401118397, 1618476767802621448, 0.87276, 1),
        |  (2332916542822520847, 721755543098910587, 0.848129, 1),
        |  (2434045366532783777, -4249460834125971594, 0.879831, 1),
        |  (2441272448263526084, 5045128594603602716, 0.890467, 1),
        |  (2466273124518877057, -2093095779689193532, 0.859352, 1),
        |  (2673895451931135144, -8478292544013388786, 0.884305, 1),
        |  (2802544945993390627, -3102951434510978902, 0.877034, 1),
        |  (2825533315335278477, -3674820504781065179, 0.892673, 1),
        |  (2827497184265165508, -3704677107301894802, 0.83233, 1),
        |  (2838486913318047055, 5742050378524461217, 0.877318, 1),
        |  (2844995814919422516, 649613733601788145, 0.887196, 1),
        |  (2853212912862951230, -6898064840543634520, 0.884872, 1),
        |  (2918965307670184751, 2183173550625727935, 0.888049, 1),
        |  (2993097514977676883, -3003424499581246401, 0.89472, 1),
        |  (2996746193047748069, -1816043995687548217, 0.82032, 1),
        |  (3026898254900384810, 9178575672950001665, 0.878549, 1),
        |  (3075072740054557039, 8491347269034854130, 0.825639, 1),
        |  (3288827443216873566, -3157024811320949774, 0.891443, 1),
        |  (3309786699892433838, -8494836653461374803, 0.883619, 1),
        |  (3317810729607813545, -2908463720528480472, 0.874281, 1),
        |  (3322908898004664648, 4040003243357205095, 0.867477, 1),
        |  (3335005625758571764, 6662708053826371369, 0.864217, 1),
        |  (3360887877661592786, -1271992814930418989, 0.887355, 1),
        |  (3411987913626998985, 5889214921657627348, 0.886291, 1),
        |  (3570175806001407198, 273454097859639285, 0.890842, 1),
        |  (3604166994362908142, -8335124099723470001, 0.889685, 1),
        |  (3655030309101890217, 4445740256053959247, 0.869167, 1),
        |  (3662836016587333722, -7327764315033261333, 0.886375, 1),
        |  (3771738803512325210, 2562654612054966891, 0.63308, 1),
        |  (3798152894513278135, 1768202817238418756, 0.885508, 1),
        |  (3860226888086161755, -8897819837471544970, 0.805639, 1),
        |  (3866226539120125642, -506025330556644116, 0.784658, 1),
        |  (3868747801359016780, 8327972037506721692, 0.860789, 1),
        |  (3872510641425242668, -2781595187241782037, 0.878282, 1),
        |  (3881810886167921100, -1259897673479471075, 0.86613, 1),
        |  (3943646190190593737, 6746395944915421415, 0.873952, 1),
        |  (3994508605225742107, -4090093828983417713, 0.877875, 1),
        |  (4022903546962979295, 5500740369389388888, 0.878812, 1),
        |  (4022915082423119933, -2265001593020705917, 0.829107, 1),
        |  (4074784972753853524, 1763709030510583845, 0.8766, 1),
        |  (4082338682713896708, 5773212113595100741, 0.881031, 1),
        |  (4164281887841613572, 3218933921440923410, 0.885773, 1),
        |  (4168255214314989411, -1097612078665493903, 0.881376, 1),
        |  (4176295777373304201, -8889867840383397459, 0.524175, 1),
        |  (4197811658631336237, -1064976660624932103, 0.881602, 1),
        |  (4263734455492300368, -5512941188171675658, 0.854915, 1),
        |  (4274218436741035200, 2771952196728014831, 0.885147, 1),
        |  (4324661438127010678, 2682572922572750239, 0.878943, 1),
        |  (4349366815351427952, 40467751634979928, 0.890276, 1),
        |  (4485788496455875606, -5892482383098639403, 0.878147, 1),
        |  (4487956817720999879, 3825719584427425553, 0.891384, 1),
        |  (4536215180565654869, -2227324580472572969, 0.880077, 1),
        |  (4590398749692137684, -2774992954615444078, 0.805639, 1),
        |  (4700856101532836886, -6352631201590064826, 0.803503, 1),
        |  (4799705711417493230, 3864922318230618872, 0.852437, 1),
        |  (4969932094324608020, -3113558919665397578, 0.863207, 1),
        |  (4975271479564838969, -5342614700309152771, 0.882587, 1),
        |  (4976511165525091798, -2641045778731920070, 0.848953, 1),
        |  (5006224511915629023, -7725906585326484976, 0.892779, 1),
        |  (5036202939332858385, -2418232508804183932, 0.838678, 1),
        |  (5059356010119848848, 1838611596941775060, 0.886626, 1),
        |  (5179803229522404094, -4536553048696894045, 0.881602, 1),
        |  (5236212459430918954, -219130506611088150, 0.801288, 1),
        |  (5274312328217444863, 103484144087268605, 0.861069, 1),
        |  (5285187603242289463, -8129576447432656462, 0.627394, 1),
        |  (5350163230822097350, -1102355476695641957, 0.850933, 1),
        |  (5364718364441243029, -6204873913098787486, 0.888274, 1),
        |  (5482737595250676472, 7117345638043776535, 0.88864, 1),
        |  (5526544541071410798, 7269257313490180835, 0.892779, 1),
        |  (5546153152123742303, -3046925930227533711, 0.827057, 1),
        |  (5646547078157503222, 8136564675822629383, 0.885147, 1),
        |  (5754689492161551600, -8031769759475078124, 0.827057, 1),
        |  (5762262910141011762, -477942450445396722, 0.89379, 1),
        |  (5810224668659538636, -27960410509062934, 0.88248, 1),
        |  (5827675012759032392, 151098513385853122, 0.881147, 1),
        |  (5848480913146874279, 1266658373521611043, 0.879201, 1),
        |  (5896879478304591444, -8722974708713827521, 0.886375, 1),
        |  (5908518628301840683, -9121027273200341041, 0.885948, 1),
        |  (5917248239482324744, -4956171723554929635, 0.8715, 1),
        |  (5967906166575460184, -5887696209182451094, 0.827057, 1),
        |  (6063724904630965244, -400334989594581860, 0.866587, 1),
        |  (6098554090892271763, -4588371479644885066, 0.877176, 1),
        |  (6230630449968236485, -842339899227535538, 0.889951, 1),
        |  (6291777390954676975, -6245366066490642966, 0.876305, 1),
        |  (6299815836698018798, -4317473317638351755, 0.88864, 1),
        |  (6301433218503780480, -2899525435981701235, 0.889951, 1),
        |  (6385194642496363615, -8880562690595107526, 0.878147, 1),
        |  (6388668808119283045, -1521600605428770045, 0.894853, 1),
        |  (6411721505601436586, -5730107581662742861, 0.892295, 1),
        |  (6442936953067916985, -1987099509055847888, 0.854573, 1),
        |  (6562432498703814764, 5398462212691693116, 0.891502, 1),
        |  (6565150282277132670, 29773432384056815, 0.871684, 1),
        |  (6593869490620393669, -4220216669694658131, 0.867695, 1),
        |  (6608416440317576361, 6002824039418529206, 0.891384, 1),
        |  (6642571781850195999, -3843415897120826977, 0.768525, 1),
        |  (6701894942366285172, -6794003504386425961, 0.881147, 1),
        |  (6725297323788047499, 5797355854680505169, 0.864464, 1),
        |  (6728138315605276338, -6961503127832464159, 0.891086, 1),
        |  (6728964282601015730, 1529780595923479486, 0.852437, 1),
        |  (6735762567324004391, 741853282276619024, 0.891676, 1),
        |  (6858317524604960483, 3132893993541913372, 0.892185, 1),
        |  (6946357205746658168, -2164614140272118978, 0.82343, 1),
        |  (6984992875643671685, 911432095342138106, 0.888124, 1),
        |  (6995875317459083443, -7852641528625941067, 0.775394, 1),
        |  (7045983073158528344, 1875337270263225856, 0.81869, 1),
        |  (7105029868269696154, 4862945765525998070, 0.889482, 1),
        |  (7283941312335808390, 4943693415066560852, 0.886543, 1),
        |  (7285845621414188481, 4065060402953368143, 0.893296, 1),
        |  (7336709842578630789, -5957297051568573441, 0.8077, 1),
        |  (7394942330779235338, 4039112021902646001, 0.844165, 1),
        |  (7430535129577212836, -846221163018446363, 0.854915, 1),
        |  (7543537353721054141, -4219115330300508642, 0.892347, 1),
        |  (7549927358967060196, 7273693554733029238, 0.873786, 1),
        |  (7611632408165564902, 7440149592887473193, 0.891025, 1),
        |  (7644243345403566901, 6273304022005589797, 0.889885, 1),
        |  (7738628742287934838, 6116554024797246444, 0.886709, 1),
        |  (7767720890268564835, 3608702845250140103, 0.885419, 1),
        |  (7770933844128345607, -3372755720040919221, 0.885685, 1),
        |  (7922671314463070091, 1270194042209873847, 0.889685, 1),
        |  (7959413823438536481, -9105575842714687203, 0.877875, 1),
        |  (8008763549030905534, -4118863045471060575, 0.884496, 1),
        |  (8071685781145001245, 4625076385324851787, 0.894449, 1),
        |  (8097899857073394093, -1957455035791879244, 0.808704, 1),
        |  (8122438283206084735, 2862695528341809657, 0.883111, 1),
        |  (8149992067052311768, 1875337270263225856, 0.831871, 1),
        |  (8162280253709024993, -2974205254137010066, 0.878943, 1),
        |  (8164142220793647256, 6040256489775392709, 0.892017, 1),
        |  (8214432938232865571, -2578788793093686368, 0.63308, 1),
        |  (8232243475998954370, -2319601274276189240, 0.894765, 1),
        |  (8357601745340242585, 1662325406399245126, 0.864217, 1),
        |  (8385066921199917676, 5662899830287537333, 0.8077, 1),
        |  (8398949116087137012, 743025505117283597, 0.878943, 1),
        |  (8402408126372307012, 5075990286595430324, 0.852437, 1),
        |  (8443030500755853973, -827405873745296695, 0.821899, 1),
        |  (8456693096342799013, 4282787719988348548, 0.894449, 1),
        |  (8479553253466120758, -2639853700671284782, 0.893496, 1),
        |  (8550692843020076791, 8169985421656430887, 0.873279, 1),
        |  (8563451285068752503, -8752653101643300152, 0.887974, 1),
        |  (8572807941300969518, 3357869973924528525, 0.894809, 1),
        |  (8597232682614245181, -1187735888719446476, 0.865191, 1),
        |  (8618315143314968473, 2551927570369868370, 0.887116, 1),
        |  (8659283220114683648, -4660065233624021653, 0.80458, 1),
        |  (8677380266049083235, -5342913885796064675, 0.888926, 1),
        |  (8734030898933095735, -6428012164654158877, 0.875239, 1),
        |  (8891889096056669938, 8114702854367167257, 0.80458, 1),
        |  (8894293048710711401, 565295585193682964, 0.879707, 1),
        |  (8897193717519511755, -4219115330300508642, 0.88864, 1),
        |  (8899110773777327897, 7030380118355657345, 0.866587, 1),
        |  (8904339361348882194, -7707586213994643318, 0.627394, 1),
        |  (8910488877231666853, -7918579655649737792, 0.866359, 1),
        |  (8925829043386823265, 2711458195739146224, 0.892779, 1),
        |  (8925929004955427381, -4132246748838464571, 0.876156, 1),
        |  (8950585488455929043, 799559698465135154, 0.880914, 1),
        |  (9043730510342191449, -4356238290874089585, 0.894172, 1),
        |  (9123941954178996939, 6718559054118837472, 0.884305, 1),
        |  (9208874017471123718, -9085959183697233935, 0.883818, 1))
        |  AS t(messy_id, canon_id, score, rank)
        |ORDER BY messy_id""".stripMargin,

    "q_gazetteer_jw" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |canon_blocks AS (SELECT * FROM blocks WHERE id % 2 = 0),
        |eligible AS (
        |  SELECT block_key FROM canon_blocks
        |  GROUP BY block_key HAVING count(*) <= 1000),
        |messy_blocks AS (SELECT * FROM blocks WHERE id % 2 = 1),
        |pairs AS (
        |  SELECT DISTINCT m.id AS id1, c.id AS id2
        |  FROM messy_blocks m
        |  JOIN canon_blocks c ON m.block_key = c.block_key
        |  JOIN eligible e ON c.block_key = e.block_key),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |    1.0/(1.0 + exp(-(-8.0 + 12.0*coalesce(
        |      jaro_winkler_similarity(r1.name, r2.name), 0.0)))) AS score
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |ranked AS (
        |  SELECT id1, id2, score,
        |    row_number() OVER (PARTITION BY id1 ORDER BY score DESC, id2) AS rnk
        |  FROM scored WHERE score >= 0.5)
        |SELECT id1 AS messy_id, id2 AS canon_id,
        |  round(score, 6) AS score, rnk AS "rank"
        |FROM ranked WHERE rnk <= 2
        |ORDER BY messy_id, "rank"""".stripMargin,

    "q_gazetteer_model" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name,
        |         lower(trim(regexp_replace(p_brand, '\s+', ' ', 'g'))) AS brand
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |canon_blocks AS (SELECT * FROM blocks WHERE id % 2 = 0),
        |eligible AS (
        |  SELECT block_key FROM canon_blocks
        |  GROUP BY block_key HAVING count(*) <= 1000),
        |messy_blocks AS (SELECT * FROM blocks WHERE id % 2 = 1),
        |pairs AS (
        |  SELECT DISTINCT m.id AS id1, c.id AS id2
        |  FROM messy_blocks m
        |  JOIN canon_blocks c ON m.block_key = c.block_key
        |  JOIN eligible e ON c.block_key = e.block_key),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |    1.0/(1.0 + exp(-(-10.0
        |      + 9.0*coalesce(jaro_winkler_similarity(r1.name, r2.name), 0.0)
        |      + 4.0*(1.0 - CAST(levenshtein(r1.name, r2.name) AS DOUBLE)
        |             / greatest(length(r1.name), length(r2.name)))
        |      + 1.5*CAST(r1.brand = r2.brand AS DOUBLE)))) AS score
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |ranked AS (
        |  SELECT id1, id2, score,
        |    row_number() OVER (PARTITION BY id1 ORDER BY score DESC, id2) AS rnk
        |  FROM scored WHERE score >= 0.5)
        |SELECT id1 AS messy_id, id2 AS canon_id,
        |  round(score, 6) AS score, rnk AS "rank"
        |FROM ranked WHERE rnk <= 2
        |ORDER BY messy_id, "rank"""".stripMargin,

    "q_feature_pairs" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
        |    CASE WHEN c_acctbal > 0 THEN CAST(c_acctbal AS DOUBLE) END AS bal
        |  FROM customer)
        |SELECT a.id AS id1, b.id AS id2,
        |  CAST(a.seg = b.seg AS DOUBLE) AS f_exact,
        |  CAST(a.bal IS NULL OR b.bal IS NULL AS DOUBLE) AS f_missing,
        |  round(coalesce(abs(log10(a.bal) - log10(b.bal)), 0.0), 6) AS f_logratio,
        |  CAST((a.seg = 'BUILDING' AND b.seg = 'AUTOMOBILE')
        |    OR (a.seg = 'AUTOMOBILE' AND b.seg = 'BUILDING') AS DOUBLE) AS f_cat_ba,
        |  CAST(a.seg = 'BUILDING' AND b.seg = 'BUILDING' AS DOUBLE) AS f_cat_bb,
        |  CAST(a.seg = b.seg AS DOUBLE)
        |    * CAST(a.bal IS NULL OR b.bal IS NULL AS DOUBLE) AS f_inter
        |FROM c a JOIN c b ON a.nat = b.nat AND a.id < b.id
        |ORDER BY id1, id2""".stripMargin,

    // FS gammas are exact string/sign comparisons; count(*) is BIGINT on
    // both engines, CAST(bool AS INT) is int32 on both
    "q_fs_patterns" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
        |    right(c_name, 2) AS n2, c_acctbal > 0 AS pos
        |  FROM customer),
        |g AS (
        |  SELECT CAST(a.seg = b.seg AS INT) AS g_seg,
        |    CAST(a.n2 = b.n2 AS INT) AS g_name2,
        |    CAST(a.pos = b.pos AS INT) AS g_bal
        |  FROM c a JOIN c b ON a.nat = b.nat AND a.id < b.id)
        |SELECT g_seg, g_name2, g_bal, count(*) AS n
        |FROM g GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // frozen from an independent float-EM recomputation of the literal
    // 100-pair fixture (20×(1,1), 5×(1,0), 5×(0,1), 70×(0,0); 20 iters,
    // λ0=0.1 m0=0.9 u0=0.1): converged params land ≥4e-8 away from every
    // round-6 boundary, so the decimal literals are engine-safe
    "q_fs_weights" ->
      """SELECT * FROM (VALUES
        |  ('g1', CAST(0.978831 AS DOUBLE), CAST(0.061342 AS DOUBLE),
        |   CAST(0.205625 AS DOUBLE)),
        |  ('g2', CAST(0.978831 AS DOUBLE), CAST(0.061342 AS DOUBLE),
        |   CAST(0.205625 AS DOUBLE))
        |) t(field, m, u, lam) ORDER BY field""".stripMargin,

    // model params (λ=0.25, m=(0.75,0.875,0.625), u=(0.125,0.25,0.375))
    // and their complements are all exact in binary, and the product tree
    // mirrors the Spark foldLeft's left-nesting — bit-identical doubles
    "q_fs_classify" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
        |    right(c_name, 2) AS n2, c_acctbal > 0 AS pos
        |  FROM customer),
        |g AS (
        |  SELECT a.id AS id1, b.id AS id2,
        |    CAST(a.seg = b.seg AS INT) AS g_seg,
        |    CAST(a.n2 = b.n2 AS INT) AS g_name2,
        |    CAST(a.pos = b.pos AS INT) AS g_bal
        |  FROM c a JOIN c b ON a.nat = b.nat AND a.id < b.id),
        |s AS (
        |  SELECT id1, id2,
        |    ((CAST(0.25 AS DOUBLE)
        |      * CASE WHEN g_seg = 1 THEN CAST(0.75 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END)
        |      * CASE WHEN g_name2 = 1 THEN CAST(0.875 AS DOUBLE) ELSE CAST(0.125 AS DOUBLE) END)
        |      * CASE WHEN g_bal = 1 THEN CAST(0.625 AS DOUBLE) ELSE CAST(0.375 AS DOUBLE) END AS pm,
        |    ((CAST(0.75 AS DOUBLE)
        |      * CASE WHEN g_seg = 1 THEN CAST(0.125 AS DOUBLE) ELSE CAST(0.875 AS DOUBLE) END)
        |      * CASE WHEN g_name2 = 1 THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.75 AS DOUBLE) END)
        |      * CASE WHEN g_bal = 1 THEN CAST(0.375 AS DOUBLE) ELSE CAST(0.625 AS DOUBLE) END AS pu
        |  FROM g)
        |SELECT id1, id2, round(pm / (pm + pu), 6) AS post
        |FROM s ORDER BY id1, id2""".stripMargin,

    // tf adjustment: f_v = CAST(cnt AS DOUBLE)/total (exact integers in,
    // one double division), clamp spelled (1.0 - 1e-6) so both engines
    // compute the identical IEEE bound; coalesce precedes the clamp
    "q_fs_tf" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
        |    right(c_name, 2) AS n2, c_acctbal > 0 AS pos
        |  FROM customer),
        |tot AS (SELECT count(*) AS total FROM c),
        |f AS (
        |  SELECT n2 AS value,
        |    CAST(count(*) AS DOUBLE) / (SELECT total FROM tot) AS tf_freq
        |  FROM c GROUP BY 1),
        |g AS (
        |  SELECT a.id AS id1, b.id AS id2, a.n2 AS n2_1,
        |    CAST(a.seg = b.seg AS INT) AS g_seg,
        |    CAST(a.n2 = b.n2 AS INT) AS g_name2,
        |    CAST(a.pos = b.pos AS INT) AS g_bal
        |  FROM c a JOIN c b ON a.nat = b.nat AND a.id < b.id),
        |j AS (
        |  SELECT g.*, f.tf_freq FROM g LEFT JOIN f ON g.n2_1 = f.value),
        |s AS (
        |  SELECT id1, id2,
        |    ((CAST(0.25 AS DOUBLE)
        |      * CASE WHEN g_seg = 1 THEN CAST(0.75 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END)
        |      * CASE WHEN g_name2 = 1 THEN CAST(0.875 AS DOUBLE) ELSE CAST(0.125 AS DOUBLE) END)
        |      * CASE WHEN g_bal = 1 THEN CAST(0.625 AS DOUBLE) ELSE CAST(0.375 AS DOUBLE) END AS pm,
        |    ((CAST(0.75 AS DOUBLE)
        |      * CASE WHEN g_seg = 1 THEN CAST(0.125 AS DOUBLE) ELSE CAST(0.875 AS DOUBLE) END)
        |      * CASE WHEN g_name2 = 1
        |          THEN greatest(least(coalesce(tf_freq, CAST(0.25 AS DOUBLE)),
        |            1.0 - 1e-6), 1e-6)
        |          ELSE CAST(0.75 AS DOUBLE) END)
        |      * CASE WHEN g_bal = 1 THEN CAST(0.375 AS DOUBLE) ELSE CAST(0.625 AS DOUBLE) END AS pu
        |  FROM j)
        |SELECT id1, id2, round(pm / (pm + pu), 6) AS post
        |FROM s ORDER BY id1, id2""".stripMargin,

    // ASCII reversed names order identically under Spark's binary UTF8
    // comparison and DuckDB's default binary collation; ties (none —
    // names are unique) break on the id
    "q_snm_pairs" ->
      """WITH r AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id,
        |    row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS rn
        |  FROM customer)
        |SELECT least(a.id, b.id) AS id1, greatest(a.id, b.id) AS id2
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn < a.rn + 5
        |ORDER BY id1, id2""".stripMargin,

    "q_dt_pairs" ->
      """SELECT a.o_orderkey AS id1, b.o_orderkey AS id2,
        |  round(coalesce(CAST(abs(epoch(a.o_orderdate) - epoch(b.o_orderdate)) AS DOUBLE)
        |    / 86400.0, 0.0), 6) AS dt_days
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        |ORDER BY id1, id2""".stripMargin,

    "q_haversine_pairs" ->
      """WITH s AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS id, s_nationkey AS nat,
        |    CAST((CAST(s_suppkey AS BIGINT) * 7) % 179 - 89 AS DOUBLE) AS lat,
        |    CAST((CAST(s_suppkey AS BIGINT) * 13) % 359 - 179 AS DOUBLE) AS lon
        |  FROM supplier)
        |SELECT a.id AS id1, b.id AS id2,
        |  round(coalesce(6371.0088 * 2.0 * asin(sqrt(least(
        |    pow(sin(radians(b.lat - a.lat) / 2), 2)
        |    + cos(radians(a.lat)) * cos(radians(b.lat))
        |      * pow(sin(radians(b.lon - a.lon) / 2), 2), 1.0))), 0.0), 4) AS km
        |FROM s a JOIN s b ON a.nat = b.nat AND a.id < b.id
        |ORDER BY id1, id2""".stripMargin,

    // latLongGrid cell key = floor(lat/30):floor(lon/30) — identical
    // float-exact arithmetic on both engines (whole-degree coordinates)
    "q_geo_grid_pairs" ->
      """WITH s AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS id,
        |    CAST((CAST(s_suppkey AS BIGINT) * 7) % 179 - 89 AS DOUBLE) AS lat,
        |    CAST((CAST(s_suppkey AS BIGINT) * 13) % 359 - 179 AS DOUBLE) AS lon
        |  FROM supplier),
        |k AS (
        |  SELECT id, CAST(floor(lat / 30.0) AS BIGINT) || ':'
        |             || CAST(floor(lon / 30.0) AS BIGINT) AS bk FROM s),
        |p AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM k a JOIN k b USING (bk) WHERE a.id < b.id)
        |SELECT p.id1, p.id2,
        |  round(coalesce(6371.0088 * 2.0 * asin(sqrt(least(
        |    pow(sin(radians(b.lat - a.lat) / 2), 2)
        |    + cos(radians(a.lat)) * cos(radians(b.lat))
        |      * pow(sin(radians(b.lon - a.lon) / 2), 2), 1.0))), 0.0), 4) AS km
        |FROM p JOIN s a ON a.id = p.id1 JOIN s b ON b.id = p.id2
        |ORDER BY id1, id2""".stripMargin,

    "q_embed_neardup" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id,
        |         CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings)
        |SELECT a.id AS id1, b.id AS id2,
        |  round(list_cosine_similarity(a.v, b.v), 5) AS cos
        |FROM e a JOIN e b ON a.id < b.id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        |ORDER BY id1, id2""".stripMargin,

    // constant fixture (derivation in the query comment): {1,2} merge → 1
    "q_canon_remap" ->
      """SELECT * FROM (VALUES
        |  (CAST(101 AS BIGINT), CAST(1 AS BIGINT)), (102, 1), (201, 1),
        |  (301, 3), (401, 4)) AS t(id, component)
        |ORDER BY id""".stripMargin,

    // independent rebuild of the plurality vote: same melt, winner via
    // first(ORDER BY cnt DESC, len DESC, v DESC), conditional-agg pivot
    "q_canon_vote" ->
      """WITH src AS (
        |  SELECT p_partkey % 200 AS entity, p_type, p_brand FROM part),
        |m AS (
        |  SELECT entity, 'p_type' AS f, p_type AS v FROM src
        |  WHERE p_type IS NOT NULL AND len(p_type) > 0
        |  UNION ALL
        |  SELECT entity, 'p_brand', p_brand FROM src
        |  WHERE p_brand IS NOT NULL AND len(p_brand) > 0),
        |c AS (SELECT entity, f, v, count(*) AS cnt FROM m GROUP BY 1, 2, 3),
        |w AS (SELECT entity, f,
        |        first(v ORDER BY cnt DESC, len(v) DESC, v DESC) AS win
        |      FROM c GROUP BY 1, 2),
        |sz AS (SELECT entity, count(*) AS cluster_size FROM src GROUP BY 1)
        |SELECT sz.entity,
        |  max(CASE WHEN f = 'p_type' THEN win END) AS p_type,
        |  max(CASE WHEN f = 'p_brand' THEN win END) AS p_brand,
        |  any_value(cluster_size) AS cluster_size
        |FROM sz LEFT JOIN w ON sz.entity = w.entity
        |GROUP BY sz.entity ORDER BY sz.entity""".stripMargin,

    // full rebuild of the confidence computation: intra-cluster edge
    // filter, incident-score UNION ALL, per-record avg, singleton 1.0
    "q_confidences" ->
      """WITH labels(id, component) AS (VALUES
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT)), (2, 1), (3, 1),
        |  (10, 10), (11, 10), (20, 20), (30, 30)),
        |sp(id1, id2, score) AS (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 0.95), (2, 3, 0.85),
        |  (1, 3, 0.60), (10, 11, 0.99), (10, 20, 0.97)),
        |e AS (
        |  SELECT sp.id1, sp.id2, sp.score FROM sp
        |  JOIN labels l1 ON l1.id = sp.id1
        |  JOIN labels l2 ON l2.id = sp.id2
        |  WHERE l1.component = l2.component),
        |inc AS (
        |  SELECT id1 AS id, score FROM e
        |  UNION ALL SELECT id2, score FROM e),
        |a AS (SELECT id, avg(score) AS confidence FROM inc GROUP BY 1)
        |SELECT l.id, l.component,
        |  round(coalesce(a.confidence, 1.0), 6) AS confidence
        |FROM labels l LEFT JOIN a USING (id)
        |ORDER BY l.id""".stripMargin,

    // independent rebuild of the weighted capped medoid: distinct
    // (value, cnt) census, 64-value lexicographic cap, cost
    // Σ cnt_j·(1−JW(substr 256)), min-cost winner with lexicographic
    // tie-break, null rows kept in cluster_size
    "q_canon_medoid" ->
      """WITH src(entity, name) AS (VALUES
        |  (CAST(1 AS BIGINT), 'johnson controls inc'),
        |  (1, 'johnson controls incorporated'),
        |  (1, 'johnson controls'),
        |  (1, 'jonson kontrols gmbh'),
        |  (2, 'acme corp'), (2, 'acme corp'), (2, 'acme corp'),
        |  (2, 'acme corporation'),
        |  (3, 'york'), (3, 'york'), (3, 'york'),
        |  (3, 'yorkshire'), (3, 'new york'), (3, NULL),
        |  (4, repeat('p', 256) || 'aaa zebra'),
        |  (4, repeat('p', 256) || 'bbb anchor'),
        |  (4, repeat('p', 256) || 'ccc anchor'),
        |  (5, NULL), (5, NULL)),
        |vals AS (
        |  SELECT entity, name AS v, count(*) AS cnt FROM src
        |  WHERE name IS NOT NULL AND len(name) > 0
        |  GROUP BY 1, 2),
        |capped AS (
        |  SELECT entity, v, cnt FROM (
        |    SELECT entity, v, cnt,
        |      row_number() OVER (PARTITION BY entity ORDER BY v) AS rk
        |    FROM vals)
        |  WHERE rk <= 64),
        |cost AS (
        |  SELECT a.entity, a.v,
        |    sum(CASE WHEN b.v = a.v THEN 0.0
        |        ELSE b.cnt * (1.0 - jaro_winkler_similarity(
        |               substr(a.v, 1, 256), substr(b.v, 1, 256))) END) AS c
        |  FROM capped a JOIN capped b USING (entity)
        |  GROUP BY 1, 2),
        |win AS (
        |  SELECT entity, first(v ORDER BY c, v) AS name FROM cost
        |  GROUP BY 1),
        |sz AS (SELECT entity, count(*) AS cluster_size FROM src GROUP BY 1)
        |SELECT sz.entity, win.name, sz.cluster_size
        |FROM sz LEFT JOIN win USING (entity)
        |ORDER BY sz.entity""".stripMargin,

    "q_event_windows" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q_sessionize" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_num
        |  FROM f)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sess_num
        |ORDER BY user_id, session_start""".stripMargin,

    // full independent rebuild of the decontamination check: same spliced
    // eval construction, tokenizer twin ([^\p{L}\p{N}]+ both engines),
    // list-slice 5-gram shingles, distinct-per-doc, >50-df boilerplate
    // anti-join, >=3-hit flag threshold
    "q_decontaminate" ->
      """WITH evals AS (
        |  SELECT e.doc_id AS doc_id,
        |         substr(e.text, 1, 80) || ' ' || substr(p.text, 1, 120) AS text
        |  FROM documents e JOIN documents p ON p.doc_id = e.doc_id + 1
        |  WHERE e.doc_id % 7 = 3),
        |tgr AS (
        |  SELECT DISTINCT doc_id AS train_id, gram FROM (
        |    SELECT doc_id,
        |      array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+4], ' ') AS gram
        |    FROM (SELECT doc_id, [x for x in
        |            regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')
        |            if length(x) > 0] AS ts FROM documents),
        |      unnest(range(1, len(ts) - 5 + 2)) AS r(i)
        |    WHERE len(ts) >= 5)),
        |egr AS (
        |  SELECT DISTINCT doc_id AS eval_id, gram FROM (
        |    SELECT doc_id,
        |      array_to_string(ts[CAST(i AS INT):CAST(i AS INT)+4], ' ') AS gram
        |    FROM (SELECT doc_id, [x for x in
        |            regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')
        |            if length(x) > 0] AS ts FROM evals),
        |      unnest(range(1, len(ts) - 5 + 2)) AS r(i)
        |    WHERE len(ts) >= 5)),
        |hot AS (SELECT gram FROM tgr GROUP BY gram HAVING count(*) > 50)
        |SELECT train_id, eval_id, count(*) AS hits
        |FROM (SELECT * FROM tgr ANTI JOIN hot USING (gram)) t
        |JOIN egr USING (gram)
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY train_id, eval_id""".stripMargin,

    // frozen expected codes (DuckDB has no phonetic fns); spot-checked
    // against published DoubleMetaphone values (4-char cap: thompson→TMPS)
    // frozen winnowing overlap similarities on the shared 5-doc fixture:
    // exactly the two true near-dup pairs surface (xxhash64 fingerprints —
    // DuckDB cannot recompute; the constant table regression-guards the
    // winnow kernel end to end, like the metaphone fixture below)
    "q_winnow_fingerprint" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(0.913043 AS DOUBLE)),
        |  (3, 4, 0.96)) AS t(id1, id2, sim)
        |ORDER BY id1, id2""".stripMargin,

    "q_metaphone_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '0:JNSN'), (1, '0:SM0'),
        |  (2, '0:TMPS'), (2, '0:XMT'),
        |  (3, '0:NT'), (3, '0:RT'),
        |  (4, '0:KNSL'), (4, '0:KRS')) AS t(id, block_key)
        |ORDER BY id, block_key""".stripMargin,

    // frozen Gotoh DP values; anchors hand-derived: identical strings →
    // (n·0.5)/(2n) = 0.25; "abc" vs "" → (1.0 + 3·0.7)/3 = 1.033333
    "q_affine_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(0.25 AS DOUBLE)),
        |  (2, 0.453846),
        |  (3, 0.416),
        |  (4, 1.033333),
        |  (5, 0.343333)) AS t(id, affine)
        |ORDER BY id""".stripMargin,

    // the whole pipeline in SQL: exact-text groups pick one rep; blocking
    // + plural/cap filter + distinct pairs mirror PairGen; the LR sigmoid
    // + threshold mirror Scoring; the recursive closure mirrors CC; members
    // re-join via raw-text equality; entity = min url per component
    "q_dedupe_e2e" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 1),
        |pages AS (
        |  SELECT 'https://docs.example/' || doc_id AS url, text FROM docs
        |  UNION ALL
        |  SELECT 'https://docs.example/' || doc_id || '-v1',
        |    regexp_replace(text, '^(\S+) ', '\1  ') || ' (c) example inc'
        |  FROM docs
        |  UNION ALL
        |  SELECT 'https://docs.example/' || doc_id || '-v2', text FROM docs),
        |rep_t AS (
        |  SELECT text, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS tn
        |  FROM (SELECT DISTINCT text FROM pages)),
        |blocks AS (
        |  SELECT text, tok AS bk FROM rep_t,
        |    unnest(regexp_split_to_array(tn, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY text, tok),
        |eligible AS (
        |  SELECT bk FROM blocks GROUP BY bk HAVING count(*) BETWEEN 2 AND 200),
        |pairs AS (
        |  SELECT DISTINCT a.text AS t1, b.text AS t2
        |  FROM blocks a JOIN blocks b ON a.bk = b.bk
        |  JOIN eligible e ON a.bk = e.bk
        |  WHERE a.text < b.text),
        |scored AS (
        |  SELECT p.t1, p.t2
        |  FROM pairs p
        |  JOIN rep_t r1 ON p.t1 = r1.text
        |  JOIN rep_t r2 ON p.t2 = r2.text
        |  WHERE 1.0/(1.0 + exp(-(-8.0
        |    + 12.0*coalesce(jaro_winkler_similarity(r1.tn, r2.tn), 0.0)))) >= 0.96),
        |edges AS (
        |  SELECT t1 AS u, t2 AS v FROM scored
        |  UNION SELECT t2, t1 FROM scored),
        |reach(id, n) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.id, e.v FROM reach r JOIN edges e ON r.n = e.u),
        |comp AS (
        |  SELECT id AS text, least(min(n), id) AS c FROM reach GROUP BY id),
        |labeled AS (
        |  SELECT p.url, coalesce(c.c, p.text) AS c
        |  FROM pages p LEFT JOIN comp c ON p.text = c.text),
        |ents AS (SELECT c, min(url) AS entity_url FROM labeled GROUP BY c)
        |SELECT l.url, e.entity_url FROM labeled l JOIN ents e USING (c)
        |ORDER BY url""".stripMargin,

    // constant-fixture oracle (see the query comment for the derivation:
    // prefix4-on-name covers all dupes at the lowest volume, then no
    // candidate adds marginal coverage, so greedy stops at one pick)
    "q_predicate_cover" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'prefix', 'name'))
        |AS t(pick, kind, field)""".stripMargin,

    // transitive closure via recursive CTE: reach(id,n) accumulates every
    // reachable node; min over (self ∪ reachable) = CC's min-id label
    "q_cc_components" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT p.id1, p.id2
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.95
        |    AND (p.id1 + p.id2) % 17 = 0),
        |edges AS (
        |  SELECT id1 AS u, id2 AS v FROM scored
        |  UNION SELECT id2, id1 FROM scored),
        |reach(id, n) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.id, e.v FROM reach r JOIN edges e ON r.n = e.u)
        |SELECT id, least(min(n), id) AS component
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,

    // bridge = far endpoint unreachable once the edge is knocked out;
    // exreach carries the excluded-edge id through the reach relation.
    // Component labels come from the full-graph reach (CC's min-id
    // contract), so the row set is the operator's exact output
    "q_bridge_edges" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT p.id1, p.id2
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.95
        |    AND (p.id1 + p.id2) % 17 = 0),
        |e AS (
        |  SELECT id1, id2, row_number() OVER (ORDER BY id1, id2) AS eid
        |  FROM scored),
        |adj AS (
        |  SELECT id1 AS u, id2 AS v FROM scored
        |  UNION ALL SELECT id2, id1 FROM scored),
        |reach(id, n) AS (
        |  SELECT u, v FROM adj
        |  UNION
        |  SELECT r.id, a.v FROM reach r JOIN adj a ON r.n = a.u),
        |comp AS (
        |  SELECT id, least(min(n), id) AS component FROM reach GROUP BY id),
        |exreach(excl, node) AS (
        |  SELECT eid, id1 FROM e
        |  UNION
        |  SELECT x.excl, a.v
        |  FROM exreach x
        |  JOIN adj a ON a.u = x.node
        |  JOIN e ed ON ed.eid = x.excl
        |  WHERE NOT ((a.u = ed.id1 AND a.v = ed.id2)
        |          OR (a.u = ed.id2 AND a.v = ed.id1)))
        |SELECT ed.id1, ed.id2, c.component
        |FROM e ed
        |JOIN comp c ON c.id = ed.id1
        |LEFT JOIN exreach x ON x.excl = ed.eid AND x.node = ed.id2
        |WHERE x.node IS NULL
        |ORDER BY ed.id1, ed.id2""".stripMargin,

    // per-source bounded-walk BFS: (src, node, d) for every walk length
    // <= 32 — UNION dedups identical triples so the set is finite; the
    // true BFS distance is min d, eccentricity max-of-min, and the
    // component stats aggregate over the full-graph reach labels
    "q_entity_shapes" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS MATERIALIZED (
        |  SELECT p.id1, p.id2
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.95
        |    AND (p.id1 + p.id2) % 17 = 0),
        |adj AS MATERIALIZED (
        |  SELECT id1 AS u, id2 AS v FROM scored
        |  UNION ALL SELECT id2, id1 FROM scored),
        |reach(id, n) AS (
        |  SELECT u, v FROM adj
        |  UNION
        |  SELECT r.id, a.v FROM reach r JOIN adj a ON r.n = a.u),
        |comp AS MATERIALIZED (
        |  SELECT id, least(min(n), id) AS component FROM reach GROUP BY id),
        |bd(src, node, d) AS (
        |  SELECT u, u, 0 FROM (SELECT DISTINCT u FROM adj) t
        |  UNION
        |  SELECT b.src, a.v, b.d + 1
        |  FROM bd b JOIN adj a ON a.u = b.node
        |  WHERE b.d < 32),
        |dist AS (
        |  SELECT src, node, min(d) AS d FROM bd GROUP BY src, node),
        |ecc AS (
        |  SELECT src, max(d) AS e FROM dist GROUP BY src),
        |stats AS (
        |  SELECT c.component, count(*) AS n_nodes,
        |         CAST(max(ecc.e) AS BIGINT) AS diameter,
        |         CAST(min(ecc.e) AS BIGINT) AS radius
        |  FROM ecc JOIN comp c ON c.id = ecc.src
        |  GROUP BY c.component),
        |ecount AS (
        |  SELECT c.component, count(*) AS n_edges
        |  FROM scored s JOIN comp c ON c.id = s.id1
        |  GROUP BY c.component)
        |SELECT s.component, s.n_nodes, e.n_edges, s.diameter, s.radius
        |FROM stats s JOIN ecount e USING (component)
        |ORDER BY s.component""".stripMargin,

    // weak-bridge set re-derived (exreach + score floor), removed, and
    // components recomputed over the kept edges; orphans label self
    "q_bridge_split" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |         jaro_winkler_similarity(r1.name, r2.name) AS jw
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.95
        |    AND (p.id1 + p.id2) % 17 = 0),
        |e AS (
        |  SELECT id1, id2, jw, row_number() OVER (ORDER BY id1, id2) AS eid
        |  FROM scored),
        |adj AS (
        |  SELECT id1 AS u, id2 AS v FROM scored
        |  UNION ALL SELECT id2, id1 FROM scored),
        |exreach(excl, node) AS (
        |  SELECT eid, id1 FROM e
        |  UNION
        |  SELECT x.excl, a.v
        |  FROM exreach x
        |  JOIN adj a ON a.u = x.node
        |  JOIN e ed ON ed.eid = x.excl
        |  WHERE NOT ((a.u = ed.id1 AND a.v = ed.id2)
        |          OR (a.u = ed.id2 AND a.v = ed.id1))),
        |weak AS (
        |  SELECT ed.id1, ed.id2
        |  FROM e ed
        |  LEFT JOIN exreach x ON x.excl = ed.eid AND x.node = ed.id2
        |  WHERE x.node IS NULL AND ed.jw < 0.97),
        |kept AS (
        |  SELECT s.id1, s.id2 FROM scored s
        |  LEFT JOIN weak w ON w.id1 = s.id1 AND w.id2 = s.id2
        |  WHERE w.id1 IS NULL),
        |kadj AS (
        |  SELECT id1 AS u, id2 AS v FROM kept
        |  UNION ALL SELECT id2, id1 FROM kept),
        |kreach(id, n) AS (
        |  SELECT u, v FROM kadj
        |  UNION
        |  SELECT r.id, a.v FROM kreach r JOIN kadj a ON r.n = a.u),
        |klab AS (
        |  SELECT id, least(min(n), id) AS component FROM kreach GROUP BY id),
        |nodes AS (
        |  SELECT DISTINCT u AS id FROM adj)
        |SELECT n.id, coalesce(k.component, n.id) AS component
        |FROM nodes n LEFT JOIN klab k ON k.id = n.id
        |ORDER BY n.id""".stripMargin,

    // cut vertex = some neighbor pair disconnected once the node is
    // knocked out: seed the reach at the node's MIN neighbor, forbid
    // arcs touching the excluded node, flag nodes with an unreached
    // neighbor. Leaves (one neighbor) can never qualify
    "q_cut_vertices" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT p.id1, p.id2
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE jaro_winkler_similarity(r1.name, r2.name) >= 0.95
        |    AND (p.id1 + p.id2) % 17 = 0),
        |adj AS (
        |  SELECT id1 AS u, id2 AS v FROM scored
        |  UNION ALL SELECT id2, id1 FROM scored),
        |reach(id, n) AS (
        |  SELECT u, v FROM adj
        |  UNION
        |  SELECT r.id, a.v FROM reach r JOIN adj a ON r.n = a.u),
        |comp AS (
        |  SELECT id, least(min(n), id) AS component FROM reach GROUP BY id),
        |seed AS (SELECT u AS x, min(v) AS s FROM adj GROUP BY u),
        |nxreach(excl, node) AS (
        |  SELECT x, s FROM seed
        |  UNION
        |  SELECT r.excl, a.v
        |  FROM nxreach r
        |  JOIN adj a ON a.u = r.node
        |  WHERE a.u <> r.excl AND a.v <> r.excl)
        |SELECT DISTINCT b.u AS id, c.component
        |FROM adj b
        |JOIN comp c ON c.id = b.u
        |LEFT JOIN nxreach r ON r.excl = b.u AND r.node = b.v
        |WHERE r.node IS NULL
        |ORDER BY id""".stripMargin,

    "q_threshold_sweep" ->
      """WITH RECURSIVE recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM blocks a JOIN blocks b USING (block_key)
        |  WHERE a.id < b.id),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |    jaro_winkler_similarity(r1.name, r2.name) AS jw
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id
        |  WHERE (p.id1 + p.id2) % 17 = 0),
        |th(theta) AS (SELECT * FROM (VALUES (0.95), (0.97), (0.99)) t(x)),
        |edges AS (
        |  SELECT th.theta, s.id1 AS u, s.id2 AS v
        |  FROM scored s JOIN th ON s.jw >= th.theta
        |  UNION
        |  SELECT th.theta, s.id2, s.id1
        |  FROM scored s JOIN th ON s.jw >= th.theta),
        |reach(theta, id, n) AS (
        |  SELECT theta, u, v FROM edges
        |  UNION
        |  SELECT r.theta, r.id, e.v
        |  FROM reach r JOIN edges e ON r.theta = e.theta AND r.n = e.u),
        |labels AS (
        |  SELECT theta, id, least(min(n), id) AS component
        |  FROM reach GROUP BY theta, id),
        |comps AS (
        |  SELECT theta, component, count(*) AS sz
        |  FROM labels GROUP BY theta, component),
        |stats AS (
        |  SELECT theta, CAST(sum(sz) AS BIGINT) AS n_nodes,
        |    count(*) AS n_components, max(sz) AS largest
        |  FROM comps GROUP BY theta)
        |SELECT th.theta, coalesce(s.n_nodes, 0) AS n_nodes,
        |  coalesce(s.n_components, 0) AS n_components,
        |  coalesce(s.largest, 0) AS largest
        |FROM th LEFT JOIN stats s USING (theta)
        |ORDER BY th.theta""".stripMargin,

    // literal fixture -> constant expected output; hand-derived in
    // CodecsSpec (rms = sqrt(exact integer sum / n) to 6 decimals,
    // channel means = exact integer sums / (w*h))
    // JPEG rows (7): constants derived under the container's JDK-bundled
    // ImageIO plugin (OpenJDK 17, com.sun.imageio JPEGImageReader) —
    // decoder identity asserted by name in CodecsSpec so a swapped
    // reader fails at the assumption, not as an opaque hash mismatch;
    // solid DC-only JPEGs roundtrip exactly under any conformant IDCT
    "q_media_decode" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(bits AS INTEGER) AS bits,
        |  CAST(sample_rate AS INTEGER) AS sample_rate,
        |  CAST(channels AS INTEGER) AS channels,
        |  CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(duration_sec AS DOUBLE) AS duration_sec,
        |  CAST(peak AS INTEGER) AS peak, CAST(rms AS DOUBLE) AS rms,
        |  CAST(zero_crossings AS BIGINT) AS zero_crossings,
        |  CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,
        |  CAST(mean_b AS DOUBLE) AS mean_b
        |FROM (VALUES
        |  (1, 'wav', NULL, NULL, 16, 8000, 1, 4, 0.0005, 1000,
        |   707.106781, 2, NULL, NULL, NULL),
        |  (2, 'wav', NULL, NULL, 16, 44100, 2, 4, 0.000045, 200,
        |   158.113883, 3, NULL, NULL, NULL),
        |  (3, 'bmp', 2, 2, 24, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   55.0, 65.0, 75.0),
        |  (4, 'bmp', 3, -1, 24, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   4.0, 5.0, 6.0),
        |  (5, 'unknown', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   NULL, NULL, NULL, NULL, NULL),
        |  (6, 'png', 2, 2, 24, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   55.0, 65.0, 75.0),
        |  (7, 'jpeg', 16, 16, 24, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   128.0, 128.0, 128.0),
        |  (8, 'avi', 9, 8, 24, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
        |   NULL, NULL, NULL))
        |  t(media_id, format, width, height, bits, sample_rate, channels,
        |    n_samples, duration_sec, peak, rms, zero_crossings,
        |    mean_r, mean_g, mean_b)
        |ORDER BY media_id""".stripMargin,

    // dHash constants derived on paper from the bit layout (row-major
    // MSB-first, bit = left box mean < right box mean): gradient → all
    // 64 bits → -1; solid → 0; alternating columns → 01010101 per row
    // → 0x5555555555555555; top-half-gradient/bottom-half-reversed →
    // bits 63..32 → -4294967296 (same constant for both BMP row
    // layouts — the decoder flips bottom-up storage); box averaging
    // (18×16) reduces to the 9×8 twin; PNG is lossless so its rows
    // share the BMP constants; sub-grid and non-image rows are null
    "q_image_dhash" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
        |  CAST(dhash AS BIGINT) AS dhash
        |FROM (VALUES
        |  (1, 'bmp', -1), (2, 'bmp', 0), (3, 'bmp', 6148914691236517205),
        |  (4, 'bmp', -1), (5, 'png', -1), (6, 'png', 0), (7, 'jpeg', 0),
        |  (8, 'unknown', NULL), (9, 'bmp', NULL),
        |  (10, 'bmp', -4294967296), (11, 'bmp', -4294967296))
        |  t(media_id, format, dhash)
        |ORDER BY media_id""".stripMargin,

    // eHash constants derived on paper from the bit layout (bit for
    // frames (k,k+1) at position 63-k, set iff meanE(k) < meanE(k+1)
    // STRICTLY): ramp → all 64 bits → -1; constant → 0; alternating
    // loud/quiet frames → 0101... per pair → 0x5555555555555555;
    // ramp-up-then-down → bits 63..32 (boundary frames equal → bit 0);
    // sub-frame, non-audio and image payloads are null
    "q_audio_ehash" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
        |  CAST(ehash AS BIGINT) AS ehash
        |FROM (VALUES
        |  (1, 'wav', 0), (2, 'wav', -1), (3, 'wav', 6148914691236517205),
        |  (4, 'wav', -4294967296), (5, 'wav', 0), (6, 'wav', NULL),
        |  (7, 'unknown', NULL), (8, 'bmp', NULL))
        |  t(media_id, format, ehash)
        |ORDER BY media_id""".stripMargin,

    // analytic constants: the q_image_dhash patterns as video frames
    // (gradient -1, solid 0, alternating 0x5555… = 6148914691236517205);
    // MJPEG solid is 0 independent of decoder (equal means, strict less)
    "q_video_vhash" ->
      """SELECT CAST(media_id AS BIGINT) AS media_id, format,
        |  CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(dhash AS BIGINT) AS dhash
        |FROM (VALUES
        |  (1, 'avi', 0, -1), (1, 'avi', 1, 0),
        |  (1, 'avi', 2, 6148914691236517205),
        |  (2, 'avi', 0, 0), (3, 'avi', 0, -1),
        |  (4, 'avi', 0, 0), (4, 'avi', 1, -1),
        |  (5, 'unknown', NULL, NULL), (6, 'wav', NULL, NULL))
        |  t(media_id, format, frame_idx, dhash)
        |ORDER BY media_id, frame_idx""".stripMargin,

    // hand-derived: one pair per modality, the cross-modality collision
    // (image dHash 0 vs audio eHash 0) absent by contract
    "q_media_neardup" ->
      """SELECT modality, CAST(id1 AS BIGINT) AS id1,
        |  CAST(id2 AS BIGINT) AS id2, CAST(hamming AS INTEGER) AS hamming,
        |  CAST(frames_matched AS BIGINT) AS frames_matched
        |FROM (VALUES
        |  ('audio', 4, 5, 0, 1), ('image', 1, 2, 0, 1),
        |  ('video', 7, 8, 0, 2))
        |  t(modality, id1, id2, hamming, frames_matched)
        |ORDER BY modality, id1""".stripMargin,

    // hand-derived fold: clips 10/20 match on both sampled frames
    // (gradient vs its 1-bit perturbation + solid vs solid at 0)
    "q_video_neardup" ->
      """SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
        |  CAST(frames_matched AS BIGINT) AS frames_matched,
        |  CAST(min_hamming AS INTEGER) AS min_hamming
        |FROM (VALUES (10, 20, 2, 0)) t(id1, id2, frames_matched, min_hamming)
        |ORDER BY id1""".stripMargin,

    // brute-force twin of the banded Hamming join: same signature
    // arithmetic (2654435761 is Knuth's 2^32 golden-ratio multiplier;
    // 65537 spreads the low half), all pairs, bit_count(xor) <= 3 —
    // the banding (4 bands of 16 bits) must lose nothing at hamming 3
    "q_hamming_neardup" ->
      """WITH base AS (
        |  SELECT i AS id,
        |    ((i * 2654435761) % 2147483648) * 4294967296
        |      + ((i * 40503 + 12345) * 65537) % 4294967296 AS sh
        |  FROM range(0, 1500) t(i)),
        |planted AS (
        |  SELECT 100000 + b AS id,
        |    xor(((b * 2654435761) % 2147483648) * 4294967296
        |          + ((b * 40503 + 12345) * 65537) % 4294967296,
        |        xor(1::BIGINT << CAST(b % 60 AS INT),
        |            1::BIGINT << CAST((b*7+13) % 60 AS INT))) AS sh
        |  FROM (SELECT j*5 AS b FROM range(0, 300) t(j)) q),
        |sigs AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.id AS id1, b.id AS id2,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM sigs a JOIN sigs b ON a.id < b.id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id1, id2""".stripMargin,

    // the decode stub is a normalized 16-bin byte histogram over the
    // UTF-8 bytes of text; the corpus is ASCII (verified), so char counts
    // == byte counts and RE2 hex classes reproduce the bins exactly
    "q_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  round(CASE WHEN length(text) = 0 THEN 0.0 ELSE 1.0 END, 6) AS feat_sum,
        |  round(CAST(length(text) - length(regexp_replace(text, '[\x00-\x0f]', '', 'g'))
        |        AS DOUBLE) / greatest(length(text), 1), 6) AS feat0,
        |  round(CAST(length(text) - length(regexp_replace(text, '[\x60-\x6f]', '', 'g'))
        |        AS DOUBLE) / greatest(length(text), 1), 6) AS feat6
        |FROM documents ORDER BY media_id""".stripMargin,

    // constant-fixture oracle: the 6-edge input is a literal, so the
    // expected refinement is a constant — this green row regression-guards
    // G3's semantics (the component with the round-1 relabeling bug)
    "q_hac_refine" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT)), (2, 1), (3, 3), (4, 3),
        |  (10, 10), (11, 10), (12, 10)) AS t(id, component)
        |ORDER BY id""".stripMargin,

    "q_one_to_one_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(10 AS BIGINT), CAST(0.9 AS DOUBLE)),
        |  (2, 11, 0.7), (3, 12, 0.95)) AS t(id1, id2, score)
        |ORDER BY id1""".stripMargin,

    // closed-form full-recompute answer: CC(batch1 ∪ batch2)'s component
    // is min custkey over the (custkey % 150) div 2 super-group — no
    // iteration needed, see the query comment for the construction
    "q_incr_cc" ->
      """SELECT c_custkey AS id,
        |  min(c_custkey) OVER (PARTITION BY (c_custkey % 150) // 2)
        |    AS component
        |FROM customer ORDER BY id""".stripMargin,

    "q_crosswalk" ->
      """WITH o AS (SELECT c_custkey AS id,
        |             c_custkey // 10 AS component_old FROM customer),
        |n AS (SELECT c_custkey AS id,
        |        (c_custkey + 3) // 10 AS component_new FROM customer),
        |ov AS (SELECT component_new, component_old, count(*) AS overlap
        |       FROM n JOIN o USING (id) GROUP BY 1, 2),
        |ns AS (SELECT component_new, count(*) AS new_size FROM n GROUP BY 1),
        |os AS (SELECT component_old, count(*) AS old_size FROM o GROUP BY 1),
        |best AS (SELECT component_new, component_old, overlap FROM (
        |  SELECT *, row_number() OVER (PARTITION BY component_new
        |    ORDER BY overlap DESC, component_old ASC) AS rn FROM ov)
        |  WHERE rn = 1),
        |b2 AS (SELECT ns.component_new, best.component_old,
        |         best.overlap AS raw_overlap,
        |         coalesce(best.overlap, 0) AS overlap, ns.new_size
        |       FROM ns LEFT JOIN best USING (component_new))
        |SELECT b2.component_new, b2.component_old, b2.overlap, b2.new_size,
        |  os.old_size,
        |  CASE WHEN b2.component_old IS NULL THEN 'new'
        |       WHEN b2.raw_overlap = b2.new_size
        |            AND b2.raw_overlap = os.old_size THEN 'stable'
        |       WHEN b2.raw_overlap = os.old_size THEN 'grown'
        |       WHEN b2.raw_overlap = b2.new_size THEN 'split'
        |       ELSE 'changed' END AS status
        |FROM b2 LEFT JOIN os ON b2.component_old = os.component_old
        |ORDER BY b2.component_new""".stripMargin,

    "q_ari" ->
      """WITH o AS (SELECT c_custkey AS id,
        |             c_custkey // 10 AS ca FROM customer),
        |n AS (SELECT c_custkey AS id,
        |        (c_custkey + 3) // 10 AS cb FROM customer),
        |cont AS (SELECT ca, cb, count(*) AS nij
        |         FROM o JOIN n USING (id) GROUP BY ca, cb),
        |sb AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_both
        |       FROM cont),
        |sa AS (SELECT CAST(sum(na * (na - 1) // 2) AS BIGINT) AS s_a,
        |         CAST(sum(na) AS BIGINT) AS n
        |       FROM (SELECT ca, sum(nij) AS na FROM cont GROUP BY ca)),
        |sbb AS (SELECT CAST(sum(nb * (nb - 1) // 2) AS BIGINT) AS s_b
        |        FROM (SELECT cb, sum(nij) AS nb FROM cont GROUP BY cb))
        |SELECT n, s_both, s_a, s_b,
        |  round(CASE WHEN CAST(n * (n - 1) // 2 AS DOUBLE) = 0.0 THEN 1.0
        |    ELSE 1.0 - (CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)
        |                - 2.0 * CAST(s_both AS DOUBLE))
        |               / CAST(n * (n - 1) // 2 AS DOUBLE) END, 6) AS ri,
        |  round(CASE WHEN (CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0
        |             = CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
        |               / CAST(n * (n - 1) // 2 AS DOUBLE) THEN 1.0
        |    ELSE (CAST(s_both AS DOUBLE)
        |          - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
        |            / CAST(n * (n - 1) // 2 AS DOUBLE))
        |         / ((CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0
        |            - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
        |              / CAST(n * (n - 1) // 2 AS DOUBLE)) END, 6) AS ari
        |FROM sb, sa, sbb""".stripMargin,

    "q_bcubed" ->
      """WITH p AS (SELECT c_custkey AS id,
        |             c_custkey // 10 AS cp FROM customer),
        |t AS (SELECT c_custkey AS id,
        |        (c_custkey + 3) // 10 AS ct FROM customer),
        |cont AS (SELECT cp, ct, count(*) AS nij
        |         FROM p JOIN t USING (id) GROUP BY cp, ct),
        |ncs AS (SELECT cp, sum(nij) AS nc FROM cont GROUP BY cp),
        |nts AS (SELECT ct, sum(nij) AS nt FROM cont GROUP BY ct),
        |cells AS (SELECT nij, nc, nt
        |          FROM cont JOIN ncs USING (cp) JOIN nts USING (ct)),
        |agg AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |  sum(CAST(round(CAST(nij AS DOUBLE) * CAST(nij AS DOUBLE)
        |        / nc * 1e6, 0) AS BIGINT)) AS pm,
        |  sum(CAST(round(CAST(nij AS DOUBLE) * CAST(nij AS DOUBLE)
        |        / nt * 1e6, 0) AS BIGINT)) AS rm FROM cells)
        |SELECT n,
        |  round(pm / (CAST(n AS DOUBLE) * 1e6), 6) AS bcubed_precision,
        |  round(rm / (CAST(n AS DOUBLE) * 1e6), 6) AS bcubed_recall,
        |  round(2.0 * (pm / (CAST(n AS DOUBLE) * 1e6))
        |        * (rm / (CAST(n AS DOUBLE) * 1e6))
        |        / (pm / (CAST(n AS DOUBLE) * 1e6)
        |           + rm / (CAST(n AS DOUBLE) * 1e6)), 6) AS bcubed_f1
        |FROM agg""".stripMargin,

    "q_stable_ids" ->
      """WITH o AS (SELECT c_custkey AS id,
        |             c_custkey // 10 AS component_old FROM customer),
        |n AS (SELECT c_custkey AS id,
        |        (c_custkey + 3) // 10 AS component_new FROM customer),
        |ov AS (SELECT component_new, component_old, count(*) AS overlap
        |       FROM n JOIN o USING (id) GROUP BY 1, 2),
        |best AS (SELECT component_new, component_old, overlap FROM (
        |  SELECT *, row_number() OVER (PARTITION BY component_new
        |    ORDER BY overlap DESC, component_old ASC) AS rn FROM ov)
        |  WHERE rn = 1),
        |winners AS (SELECT component_old AS won, component_new FROM (
        |  SELECT *, row_number() OVER (PARTITION BY component_old
        |    ORDER BY overlap DESC, component_new ASC) AS rn FROM best)
        |  WHERE rn = 1)
        |SELECT n.id, coalesce(w.won, n.component_new) AS entity,
        |  w.won IS NOT NULL AS inherited
        |FROM n LEFT JOIN winners w USING (component_new)
        |ORDER BY n.id""".stripMargin,

    // constant fixture (see the query comment): chain {1,2,3,4} with
    // cannot-link (1,4) re-clusters to {1,2},{3,4} — constrained
    // average-linkage merges (1,2) then (3,4) at d=0.1, and the remaining
    // merge would union the forbidden pair; {10,11} passes through
    "q_cannot_link_fixture" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT)), (2, 1), (3, 3), (4, 3),
        |  (10, 10), (11, 10)) AS t(id, component)
        |ORDER BY id""".stripMargin,

    "q_unicode_block" ->
      """WITH recs AS (
        |  SELECT * FROM (VALUES
        |    (CAST(1 AS BIGINT), 'café crème brûlée'),
        |    (2, 'naïve café owner'),
        |    (3, 'mötley crüe 東京 tour'),
        |    (4, 'data_pipeline über alles'),
        |    (5, 'ασπίδα δεδομένων 42')) AS v(id, name))
        |SELECT id, '0:' || tok AS block_key
        |FROM recs, unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |WHERE length(tok) > 0
        |GROUP BY id, tok
        |ORDER BY id, block_key""".stripMargin,

    "q_gazetteer_multi" ->
      """WITH recs AS (
        |  SELECT p_partkey AS id,
        |         lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))) AS name,
        |         p_brand AS brand
        |  FROM part),
        |blocks AS (
        |  SELECT id, tok AS block_key FROM recs,
        |    unnest(regexp_split_to_array(name, '[^\p{L}\p{N}]+')) AS t(tok)
        |  WHERE length(tok) > 0
        |  GROUP BY id, tok),
        |canon_blocks AS (SELECT * FROM blocks WHERE id % 2 = 0),
        |eligible AS (
        |  SELECT block_key FROM canon_blocks
        |  GROUP BY block_key HAVING count(*) <= 1000),
        |messy_blocks AS (SELECT * FROM blocks WHERE id % 2 = 1),
        |pairs AS (
        |  SELECT DISTINCT m.id AS id1, c.id AS id2
        |  FROM messy_blocks m
        |  JOIN canon_blocks c ON m.block_key = c.block_key
        |  JOIN eligible e ON c.block_key = e.block_key),
        |scored AS (
        |  SELECT p.id1, p.id2,
        |    1.0/(1.0 + exp(-(-10.0
        |      + 9.0*coalesce(jaro_winkler_similarity(r1.name, r2.name), 0.0)
        |      + 6.0*coalesce(1.0 - CAST(levenshtein(r1.name, r2.name) AS DOUBLE)
        |                     / greatest(length(r1.name), length(r2.name)), 0.0)
        |      + 1.0*coalesce(CAST(r1.brand = r2.brand AS DOUBLE), 0.0)))) AS score
        |  FROM pairs p
        |  JOIN recs r1 ON p.id1 = r1.id
        |  JOIN recs r2 ON p.id2 = r2.id),
        |ranked AS (
        |  SELECT id1, id2, score,
        |    row_number() OVER (PARTITION BY id1 ORDER BY score DESC, id2) AS rnk
        |  FROM scored WHERE score >= 0.5)
        |SELECT id1 AS messy_id, id2 AS canon_id,
        |  round(score, 6) AS score, rnk AS "rank"
        |FROM ranked WHERE rnk <= 2
        |ORDER BY messy_id, "rank"""".stripMargin,

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
