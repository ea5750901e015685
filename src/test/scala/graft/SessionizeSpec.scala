package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventAgg
import graft.streaming.EventAgg.Event

/** §2.9/§2.10: the streaming flatMapGroupsWithState sessionizer must agree
  * with the batch lag/cumsum twin (the DuckDB-oracled q_sessionize). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private val fixture = Seq(
    // user 1: two sessions split by a 45-min gap
    Event(1, ts(0), 1L, "view", 1.0),
    Event(2, ts(10), 1L, "click", 2.5),
    Event(3, ts(55), 1L, "view", 4.0), // 45 min after previous → new session
    // user 2: one session, events within gap
    Event(4, ts(5), 2L, "view", 1.25),
    Event(5, ts(34), 2L, "error", 0.75), // 29 min gap → same session
    // user 3: single event
    Event(6, ts(20), 3L, "view", 9.0))

  test("streaming sessionize == batch sessionize on the same events") {
    val batch = EventAgg.sessionize(
        fixture.toDF(), gapMinutes = 30)
      .orderBy("user_id", "session_start")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventAgg.sessionizeStream(
      mem.toDS().withWatermark("ts", "1 minute"), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      // advance the watermark far past every gap horizon so open sessions
      // time out and flush (the sentinel's own session stays open — drop it)
      mem.addData(Event(99, ts(59, 59), 999L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100,
        java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter(col("user_id") =!= 999L)
        .orderBy("user_id", "session_start")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSeq
      assert(streamed == batch, s"\nstream: $streamed\nbatch: $batch")
      assert(batch.length == 4) // (1: 2 sessions) + (2: 1) + (3: 1)
    } finally q.stop()
  }

  test("a deeply-late event does not kill the stream (watermark-late rows " +
      "are dropped; the timeout clamp keeps any residual horizon legal)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventAgg.sessionizeStream(
      mem.toDS().withWatermark("ts", "1 minute"), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      // advance the watermark to ~2024-01-02 10:00
      mem.addData(Event(1,
        java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 7L, "view", 1.0))
      q.processAllAvailable()
      // an event a full DAY behind the watermark: Spark's stateful operator
      // drops watermark-late input before it reaches sessionStep, so no
      // session may appear for it — and the query must NOT die (an
      // unclamped setTimeoutTimestamp at/behind the watermark throws; the
      // clamp in sessionStep keeps any such horizon strictly legal)
      mem.addData(Event(2, ts(0), 8L, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3,
        java.sql.Timestamp.valueOf("2024-01-02 11:00:00"), 7L, "view", 1.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      // late row dropped per watermark semantics: no phantom session
      assert(spark.table("sess_late").filter(col("user_id") === 8L).isEmpty)
      // user 7's first session (closed by the 11:00 event, 60-min gap) flushed
      val u7 = spark.table("sess_late").filter(col("user_id") === 7L).collect()
      assert(u7.length == 1 && u7(0).getLong(3) == 1L)
    } finally q.stop()
  }

  test("windowedCounts: tumbling windows are epoch-aligned per type") {
    val got = EventAgg.windowedCounts(fixture.toDF(), "1 hour").collect()
    // all fixture events fall in the 10:00 hour
    assert(got.forall(_.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    assert(got.map(_.getLong(2)).sum == fixture.length)
  }

  test("windowedCounts: the SAME definition runs streaming and agrees " +
      "with the batch result once the watermark closes the window") {
    val batch = EventAgg.windowedCounts(fixture.toDF(), "1 hour")
      .orderBy("ws", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventAgg.windowedCounts(
      mem.toDS().toDF().withWatermark("ts", "1 minute"), "1 hour")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      // sentinel far in the future closes the 10:00 window
      mem.addData(Event(99,
        java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 999L, "sentinel", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .filter(col("event_type") =!= "sentinel")
        .orderBy("ws", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed == batch, s"\nstream: $streamed\nbatch: $batch")
    } finally q.stop()
  }
}
