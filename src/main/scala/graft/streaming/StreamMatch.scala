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
}
