package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{Model, PredicateSpec}
import graft.pipeline.{Dedupe, Gazetteer}
import graft.streaming.StreamMatch

class StreamMatchSpec extends SparkSpec {
  import spark.implicits._

  test("incremental gazetteer match over a micro-batched page stream") {
    val model = Model(
      bias = -13.0,
      weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "text_norm")))

    val canonPages = Seq(
      ("https://c/1", "alpha beta gamma delta epsilon zeta eta theta", "en"),
      ("https://c/2", "one two three four five six seven eight", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
    val canon = Dedupe.prepare(canonPages)

    // stream source: parquet dir we drip files into
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("warc_ts", TimestampType),
      StructField("html", BinaryType), StructField("text", StringType),
      StructField("lang", StringType)))
    val messy = Seq(
      ("https://m/1", "alpha beta gamma delta epsilon zeta eta  theta", "en"),
      ("https://m/2", "nothing in common with anything at all", "fr"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
      .select("url", "warc_ts", "html", "text", "lang")
    messy.write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamMatch.start(spark, stream, canon,
      Gazetteer.Config(model, nMatches = 1), "graft_stream_test") { (batch, _) =>
        results ++= batch.select("messy_id", "canon_id").as[(Long, Long)].collect()
      }
    q.processAllAvailable()
    q.stop()

    val m1 = Dedupe.prepare(messy).filter($"url" === "https://m/1")
      .select("id").as[Long].first()
    val c1 = canon.filter($"url" === "https://c/1").select("id").as[Long].first()
    assert(results.toSet == Set((m1, c1)))
  }

  test("incremental dedupe: unmatched pages found entities that later " +
      "batches match against") {
    val model = Model(
      bias = -13.0,
      weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "text_norm")))
    val canon = Dedupe.prepare(Seq(
      ("https://c/1", "alpha beta gamma delta epsilon zeta eta theta", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary")))

    val dir = java.nio.file.Files.createTempDirectory("graft_incdd").toString
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("warc_ts", TimestampType),
      StructField("html", BinaryType), StructField("text", StringType),
      StructField("lang", StringType)))
    def pages(rows: (String, String, String)*) = rows.toSeq
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
      .select("url", "warc_ts", "html", "text", "lang")
    // batch 1: one match for the initial canon, one brand-new page,
    // and an exact duplicate of the new page (must collapse to ONE entity)
    val newText = "completely fresh subject matter here nine ten eleven"
    pages(
      ("https://m/1", "alpha beta gamma delta epsilon zeta eta  theta", "en"),
      ("https://m/2", newText, "en"),
      ("https://m/2dup", newText, "en"))
      .write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
    val q = graft.streaming.StreamMatch.startIncrementalDedupe(
      spark, stream, canon, Gazetteer.Config(model, nMatches = 1),
      "graft_incdd_test") { (batch, _) =>
        got ++= batch.select("url", "entity", "is_new")
          .as[(String, Long, Boolean)].collect()
      }
    try {
      q.processAllAvailable()
      // batch 2: a near-dup of batch 1's NEW page — must match the entity
      // that batch founded, proving the index actually grew
      pages(("https://m/3", newText + " tail", "en"))
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()

    val byUrl = got.map(r => r._1 -> r).toMap
    val c1 = canon.filter($"url" === "https://c/1").select("id").as[Long].first()
    assert(byUrl("https://m/1")._2 == c1 && !byUrl("https://m/1")._3)
    // the new page founded an entity; its exact dup shares it
    val founded = byUrl("https://m/2")._2
    assert(byUrl("https://m/2")._3 && byUrl("https://m/2dup")._2 == founded)
    assert(Set(byUrl("https://m/2")._2, byUrl("https://m/2dup")._2).size == 1)
    assert(founded != c1)
    // batch-2 near-dup resolved to the founded entity, not a fresh one
    assert(byUrl("https://m/3")._2 == founded && !byUrl("https://m/3")._3)
  }

  test("incremental dedupe restart: rebuilding from the founded-canon " +
      "journal preserves entity identity across the restart") {
    val model = Model(
      bias = -13.0,
      weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "text_norm")))
    val canon = Dedupe.prepare(Seq(
      ("https://c/1", "alpha beta gamma delta epsilon zeta eta theta", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary")))
    val base = java.nio.file.Files.createTempDirectory("graft_incdd_rs").toString
    val journal = s"$base/founded"
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("warc_ts", TimestampType),
      StructField("html", BinaryType), StructField("text", StringType),
      StructField("lang", StringType)))
    def pages(rows: (String, String, String)*) = rows.toSeq
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
      .select("url", "warc_ts", "html", "text", "lang")
    val newText = "brand new content twelve thirteen fourteen fifteen sixteen"

    // run 1: founds an entity, journals it, stops
    pages(("https://m/1", newText, "en")).write.mode("overwrite").parquet(s"$base/in")
    val got1 = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
    val q1 = graft.streaming.StreamMatch.startIncrementalDedupe(
      spark, spark.readStream.schema(schema).parquet(s"$base/in"),
      canon, Gazetteer.Config(model, nMatches = 1), "graft_incdd_rs1",
      foundedCanonDir = Some(journal)) { (b, _) =>
        got1 ++= b.select("url", "entity", "is_new").as[(String, Long, Boolean)].collect()
      }
    try q1.processAllAvailable() finally q1.stop()
    val founded = got1.find(_._1 == "https://m/1").get._2

    // restart: rebuildIndex(initial canon, journal) — the documented
    // recipe, which also owns the per-id dedup a twice-journaled id needs;
    // a near-dup of the pre-restart founded entity must resolve to it.
    // The journal deliberately gets a second copy of the founded row
    // (simulating a cross-batch re-found) to prove the rebuild dedupes.
    spark.read.parquet(journal).write.mode("append").parquet(journal + "_dup")
    spark.read.parquet(journal).write.mode("append").parquet(journal + "_dup")
    // a restart BEFORE anything was founded has no journal directory: the
    // recovery path must degrade to the initial index, not throw
    val emptyIdx = graft.streaming.StreamMatch.rebuildIndex(
      spark, canon, s"$base/never_written",
      Gazetteer.Config(model, nMatches = 1))
    assert(emptyIdx.fields.count() == 1, "initial canon only")
    // initial canon deliberately KEEPS html: the journal is written
    // html-dropped, and the rebuild must union on the common columns
    // rather than throw UNRESOLVED_COLUMN on the documented recovery path
    val idx = graft.streaming.StreamMatch.rebuildIndex(
      spark, canon, journal + "_dup",
      Gazetteer.Config(model, nMatches = 1))
    assert(idx.fields.groupBy("id2").count().filter($"count" > 1).isEmpty,
      "rebuilt index must hold one field row per canon id")
    pages(("https://m/2", newText + " tail", "en"))
      .write.mode("append").parquet(s"$base/in")
    val got2 = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
    val q2 = graft.streaming.StreamMatch.startIncrementalDedupe(
      spark, spark.readStream.schema(schema).parquet(s"$base/in"),
      canon.drop("html"), Gazetteer.Config(model, nMatches = 1), "graft_incdd_rs2",
      foundedCanonDir = Some(journal), initialIndex = Some(idx)) { (b, _) =>
        got2 ++= b.select("url", "entity", "is_new").as[(String, Long, Boolean)].collect()
      }
    try q2.processAllAvailable() finally q2.stop()
    // the fresh stream (no stream checkpoint) replays m/1 too: it must
    // NOT re-found — its id IS the journaled canon id; and m/2 matches it
    val byUrl = got2.map(r => r._1 -> r).toMap
    assert(byUrl("https://m/2")._2 == founded && !byUrl("https://m/2")._3,
      "post-restart near-dup must resolve to the pre-restart entity")
  }

  test("incremental dedupe: a url re-crawled within one batch (same id, " +
      "changed text) collapses to its latest crawl — one sink row, one " +
      "index entry") {
    val model = Model(
      bias = -13.0,
      weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "text_norm")))
    val canon = Dedupe.prepare(Seq(
      ("https://c/1", "alpha beta gamma delta epsilon zeta eta theta", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary")))
    val base = java.nio.file.Files.createTempDirectory("graft_incdd_rc").toString
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("warc_ts", TimestampType),
      StructField("html", BinaryType), StructField("text", StringType),
      StructField("lang", StringType)))
    val oldText = "crawl version one seventeen eighteen nineteen twenty"
    val newText = "completely different later crawl twenty one two three"
    // same url twice in ONE batch: older and newer crawl
    Seq(("https://m/x", java.sql.Timestamp.valueOf("2017-07-14 02:40:00"), oldText),
        ("https://m/x", java.sql.Timestamp.valueOf("2017-07-15 02:40:00"), newText))
      .toDF("url", "warc_ts", "text")
      .withColumn("html", lit(null).cast("binary"))
      .withColumn("lang", lit("en"))
      .select("url", "warc_ts", "html", "text", "lang")
      .write.mode("overwrite").parquet(s"$base/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
    val q = graft.streaming.StreamMatch.startIncrementalDedupe(
      spark, spark.readStream.schema(schema).parquet(s"$base/in"),
      canon, Gazetteer.Config(model, nMatches = 1), "graft_incdd_rc",
      foundedCanonDir = None) { (b, _) =>
        got ++= b.select("url", "entity", "is_new").as[(String, Long, Boolean)].collect()
      }
    try {
      q.processAllAvailable()
      assert(got.count(_._1 == "https://m/x") == 1,
        s"one sink row per distinct id expected, got $got")
      // batch 2: a near-dup of the LATEST text must match the entity —
      // exactly once (one field row in the index, not two conflicting)
      Seq(("https://m/y", java.sql.Timestamp.valueOf("2017-07-16 02:40:00"),
          newText + " tail"))
        .toDF("url", "warc_ts", "text")
        .withColumn("html", lit(null).cast("binary"))
        .withColumn("lang", lit("en"))
        .select("url", "warc_ts", "html", "text", "lang")
        .write.mode("append").parquet(s"$base/in")
      q.processAllAvailable()
    } finally q.stop()
    val x = got.find(_._1 == "https://m/x").get
    val y = got.find(_._1 == "https://m/y").get
    assert(x._3, "re-crawled url founds one new entity")
    assert(y._2 == x._2 && !y._3,
      "near-dup of the latest crawl resolves to the collapsed entity")
  }

  test("compaction merges entities that the batch boundary split") {
    val model = Model(
      bias = -13.0,
      weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "text_norm")))
    // two near-dup pages that arrived in ONE batch and so founded two
    // entities (the documented within-batch split), plus an unrelated one.
    // The near-dups differ by a REAL extra token (a doubled space would
    // collapse under normalize_text and only exercise the exact pre-group
    // path, not the scoring/CC merge this test exists to guard)
    val accumulated = Dedupe.prepare(Seq(
      ("https://m/a", "shared subject matter one two three four five", "en"),
      ("https://m/b", "shared subject matter one two three four five tail", "en"),
      ("https://m/c", "totally different content nine ten eleven twelve", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))).drop("html")
    val (remap, index) = graft.streaming.StreamMatch.compactIncremental(
      spark, accumulated, Gazetteer.Config(model, nMatches = 1),
      Dedupe.Config(model, collectMetrics = false))
    val ids = accumulated.select("url", "id").as[(String, Long)].collect().toMap
    val m = remap.as[(Long, Long)].collect().toMap
    assert(m(ids("https://m/a")) == m(ids("https://m/b")),
      "split near-dup entities must merge under compaction")
    assert(m(ids("https://m/c")) != m(ids("https://m/a")))
    // the compacted index holds exactly the merged representatives
    val nReps = index.fields.select("id2").distinct().count()
    assert(nReps == 2)
    index.blocks.unpersist(); index.fields.unpersist()
  }

  test("canon index is built once, persisted, and reused across batches") {
    val model = Model(
      bias = -13.0,
      weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
      threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "text_norm")))
    val canonPages = Seq(
      ("https://c/1", "alpha beta gamma delta epsilon zeta eta theta", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
    val canon = Dedupe.prepare(canonPages)
    val index = Gazetteer.buildCanonIndex(canon, Gazetteer.Config(model, nMatches = 1))
    // persisted: repeated micro-batch matches hit the cached index instead
    // of re-deriving blocking + the oversize-filter groupBy per batch
    assert(index.blocks.storageLevel.useMemory || index.blocks.storageLevel.useDisk,
      "canon block index must be persisted")
    assert(index.fields.storageLevel.useMemory || index.fields.storageLevel.useDisk,
      "canon field table must be persisted")
    // two consecutive matches against the same index agree with the
    // one-shot path
    val messy = Dedupe.prepare(Seq(
      ("https://m/1", "alpha beta gamma delta epsilon zeta eta  theta", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary")))
    val a = Gazetteer.matchAgainst(messy, index).collect().toSet
    val b = Gazetteer.matchAgainst(messy, index).collect().toSet
    assert(a == b && a.nonEmpty)
    index.blocks.unpersist(); index.fields.unpersist()
  }
}
