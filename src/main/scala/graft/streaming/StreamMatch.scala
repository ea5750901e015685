package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.{Dedupe, Gazetteer}

/**
 * Incremental match over a page stream (SURVEY.md §2.9): the reference has
 * no stream processing (its Redis queue is task orchestration†), but the
 * natural Spark extension of the `/match` endpoint is Structured
 * Streaming: readStream of new pages → stateless gazetteer match against
 * the broadcast canonical index → sink. No watermark needed — there is no
 * event-time aggregation; every micro-batch is an independent bulk match
 * (one code path with the batch API via foreachBatch).
 */
object StreamMatch {

  /** Deterministic one-row-per-id picks. TWO orders exist for TWO
    * different operations — do not unify them:
    *
    *  - [[latestPerId]] (warc_ts DESC): the WITHIN-batch collapse. The id
    *    is not in the index yet; the freshest crawl is the content to
    *    found the entity with. Exactly one row per id survives to be
    *    journaled/indexed, so no later site ever re-chooses among a
    *    batch's rows.
    *  - [[firstFoundedPerId]] (warc_ts ASC): the restart rebuild and
    *    compaction. The LIVE index keeps the FIRST-founded record for a
    *    re-founded id (extendIndex is first-write-wins), and a rebuild
    *    that picked anything else would flip the entity's field rows
    *    across a restart, contradicting assignments already sunk. Journal
    *    append order is not recoverable from parquet; warc_ts-ascending
    *    is the deterministic stand-in (a crawl stream founds with its
    *    earliest-crawled surviving row). Residual: two journal rows with
    *    EQUAL warc_ts tie-break on text_hash, which can differ from the
    *    live pick — documented, deterministic, bounded to same-timestamp
    *    re-founds. */
  private def onePerId(df: org.apache.spark.sql.DataFrame,
      latestFirst: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val ord =
      if (df.columns.contains("warc_ts"))
        Seq(if (latestFirst) col("warc_ts").desc_nulls_last
            else col("warc_ts").asc_nulls_first, col("text_hash"))
      else Seq(col("text_hash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(ord: _*)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
  }
  private def latestPerId(df: org.apache.spark.sql.DataFrame) =
    onePerId(df, latestFirst = true)
  private def firstFoundedPerId(df: org.apache.spark.sql.DataFrame) =
    onePerId(df, latestFirst = false)

  /**
   * @param pagesStream streaming DataFrame in pages shape
   * @param canonPrepared STATIC prepared canonical records (Dedupe.prepare)
   * @param sink called per micro-batch with the match result
   */
  def start(spark: SparkSession, pagesStream: DataFrame, canonPrepared: DataFrame,
      config: Gazetteer.Config, queryName: String)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // canon index built ONCE, persisted — every micro-batch reuses the
    // cached block map + field table (re-deriving the index and its
    // oversize-filter groupBy per 1-second batch was a per-batch full
    // recompute of the static side)
    val index = Gazetteer.buildCanonIndex(canonPrepared, config)
    pagesStream.writeStream
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prepared = Dedupe.prepare(batch)
        val matches = Gazetteer.matchAgainst(prepared, index)
        sink(matches, batchId)
      }
      .start()
  }

  /**
   * Incremental entity resolution: each micro-batch is matched against a
   * GROWING canonical index — unmatched pages found a new entity (their
   * own id) and extend the index for every later batch. The stream thus
   * maintains the same entity map a batch `Dedupe.run` would produce,
   * one arrival at a time.
   *
   * Semantics, documented:
   *  - exact duplicates WITHIN a batch collapse first (G1 pre-group), so
   *    one entity is founded per distinct text;
   *  - two distinct-but-near-dup NEW pages arriving in the SAME batch
   *    found two entities (no within-batch pairwise matching — the batch
   *    boundary is the resolution boundary; a periodic
   *    `Gazetteer.dedupeCanon` compaction merges such splits, exactly the
   *    second-stage pass the batch pipeline already ships);
   *  - per-batch sink rows: (id, url, entity, is_new) for every distinct
   *    page id of the batch, members of exact-dup groups included; a url
   *    re-crawled within one batch (same id, changed text) collapses to
   *    its latest crawl — one sink row, one index entry;
   *  - the growing index is driver-side state, NOT covered by the stream
   *    checkpoint. Pass `foundedCanonDir` to journal every founded
   *    representative to parquet as it is admitted; on restart, rebuild
   *    the index with `rebuildIndex(spark, initialCanon, journalDir,
   *    config)` (union + per-id dedup — the journal can carry an id twice
   *    when a re-crawl with changed text re-founds across batches)
   *    or already-sunk assignments contradict post-restart resolution.
   *    Index memory grows with founded entities by design — the bound is
   *    the periodic compaction above (rebuild + unpersist), not eviction.
   */
  def startIncrementalDedupe(spark: SparkSession, pagesStream: DataFrame,
      initialCanon: DataFrame, config: Gazetteer.Config, queryName: String,
      foundedCanonDir: Option[String] = None,
      // resume matching against a prebuilt index (the one
      // compactIncremental returns) instead of rebuilding from
      // initialCanon — without this the compacted index could never be
      // adopted and would rebuild from scratch on restart
      initialIndex: Option[Gazetteer.CanonIndex] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import org.apache.spark.sql.functions._
    var index = initialIndex.getOrElse(
      Gazetteer.buildCanonIndex(initialCanon, config))
    pagesStream.writeStream
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-sized frames; localCheckpoint so the multi-consumer plan
        // below (match + anti-join + index extension) runs the prepare
        // chain once and the index mutation cannot re-observe the stream.
        // html is dropped first: no operator reads it and checkpointing
        // raw payload per batch would grow the block store for nothing.
        // Same-id rows (a url re-crawled WITHIN one batch with changed
        // text) collapse to the latest crawl first: two same-id rows have
        // distinct text_hash, so both would survive the exact pre-group
        // below, both carry rep == their shared id, and an unmatched pair
        // would journal + extendIndex the same canon_id twice with
        // conflicting fields (duplicate scored rows on every later match)
        val prepared = latestPerId(Dedupe.prepare(batch).drop("html"))
          .localCheckpoint(true)
        val repMap = prepared.groupBy(col("text_hash")).agg(min(col("id")).as("rep"))
        val idToRep = prepared.select(col("id"), col("url"), col("text_hash"))
          .join(repMap, "text_hash").select(col("id"), col("url"), col("rep"))
        val reps = prepared.join(
          repMap.select(col("rep").as("id")), Seq("id"), "left_semi")
        val best = Gazetteer.matchAgainst(reps, index)
          .filter(col("rank") === 1)
          .select(col("messy_id").as("rep"), col("canon_id"))
        val assignment = idToRep.join(best, Seq("rep"), "left")
          .select(col("id"), col("url"),
            coalesce(col("canon_id"), col("rep")).as("entity"),
            col("canon_id").isNull.as("is_new"))
          .localCheckpoint(true)
        sink(assignment, batchId)
        val newbies = reps.join(
          assignment.filter(col("is_new")).select(col("id")), Seq("id"), "left_semi")
        if (!newbies.isEmpty) { // founded entities join the index for batch N+1
          foundedCanonDir.foreach(d => // restart-recovery journal
            newbies.write.mode("append").parquet(d))
          index = Gazetteer.extendIndex(index, newbies)
        }
      }
      .start()
  }

  /**
   * Restart recovery for the incremental path: rebuild the canon index
   * from the initial canon table unioned with the founded-canon journal.
   * Owns the per-id dedup the raw union needs — extendIndex's first-write-
   * wins guard is in-memory only, so a url re-crawled with changed text in
   * a later batch can be journaled twice (it re-founds when its changed
   * text no longer matches its own entity); a naive union would hand
   * buildCanonIndex two conflicting field rows for one canon_id. Parquet
   * append order is not recoverable, so the pick is the same deterministic
   * text_hash-ordered one compactIncremental uses.
   */
  def rebuildIndex(spark: SparkSession, initialCanon: DataFrame,
      foundedCanonDir: String, config: Gazetteer.Config): Gazetteer.CanonIndex = {
    import org.apache.spark.sql.functions._
    // the journal only exists once some batch has founded an entity — a
    // restart before that (every page matched the initial canon) must
    // degrade to the initial index, not throw PATH_NOT_FOUND on the
    // documented recovery path
    val journalPath = new org.apache.hadoop.fs.Path(foundedCanonDir)
    val journalFs = journalPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!journalFs.exists(journalPath))
      return Gazetteer.buildCanonIndex(initialCanon, config)
    // the journal is written from html-dropped batch frames, so union on
    // the COMMON columns — an initialCanon still carrying html (accepted
    // by buildCanonIndex, which selects only what the model needs) must
    // not make the documented recovery path throw UNRESOLVED_COLUMN
    val journalRaw = spark.read.parquet(foundedCanonDir)
    val common = initialCanon.columns.filter(journalRaw.columns.toSet)
    require(common.contains("id") && common.contains("text_hash"),
      s"journal and canon share no usable identity columns: ${common.mkString(",")}")
    val union = initialCanon.select(common.map(col).toIndexedSeq: _*)
      .unionByName(journalRaw.select(common.map(col).toIndexedSeq: _*))
    Gazetteer.buildCanonIndex(firstFoundedPerId(union), config)
  }

  /**
   * Periodic compaction for the incremental path — the documented fix for
   * its two approximations: (a) near-dup entities founded in the SAME
   * batch (no within-batch pairwise matching) and (b) oversize-filter
   * drift across index increments. Runs the second-stage pipeline
   * (`Gazetteer.dedupeCanon`) over the accumulated canon records to merge
   * split entities, then rebuilds a fresh exact-bounded index over the
   * merged representatives.
   *
   * @param accumulated every canonical record admitted so far — the
   *   initial canon unioned with the founded-canon journal (prepared
   *   shape: id + scoring/predicate fields)
   * @return (remap, index): remap = (id, component) mapping every old
   *   entity id to its merged entity (apply to already-sunk assignments);
   *   index = the compacted index to continue matching against
   */
  def compactIncremental(spark: SparkSession, accumulated: DataFrame,
      gazConfig: Gazetteer.Config, dedupeConfig: Dedupe.Config)
      : (DataFrame, Gazetteer.CanonIndex) = {
    import org.apache.spark.sql.functions._
    // the journal (and the restart recipe's canon ∪ journal union) can
    // carry one id twice (re-crawled url, changed text) — deterministic
    // per-id pick (shared with rebuildIndex/the batch collapse), or the
    // remap fans out and the index gets conflicting field rows for one
    // canon_id
    val one = firstFoundedPerId(accumulated)
    val firstMap = one.select(col("id"), col("id").as("component"))
    val canonTbl = one.select(
      col("id").as("component"), col("text_norm"), col("lang"))
    // remap feeds TWO consumers (the caller's assignment rewrite + the
    // reps semi-join below); reclaimScratch both truncates it (so the
    // second-stage pipeline doesn't re-execute per action — the frame is
    // entity-count-sized) AND deletes the inner run's scratch — a
    // long-lived streaming driver compacting periodically must not stack
    // input-sized scratch dirs until JVM exit
    val remap = Gazetteer.dedupeCanon(spark, firstMap, canonTbl, dedupeConfig,
      reclaimScratch = true)
    val reps = one.join(
      remap.filter(col("id") === col("component")).select("id"),
      Seq("id"), "left_semi")
    (remap, Gazetteer.buildCanonIndex(reps, gazConfig))
  }
}
