package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamIngest
import graft.textops.TextOps

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  // the file stream source only sees files directly under the watched
  // dir: land each batch as one flat parquet file
  private def drip(df: DataFrame, inDir: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drip")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(inDir, s"$name.parquet"))
    java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
  }

  test("streaming corpus ingestion: seed dups rejected, fresh kept, " +
      "cross-batch dups rejected, bloom rebuilt from the hash index " +
      "after a restart keeps rejecting") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest")
    val stateDir = s"$root/state"
    val inDir = s"$root/in"
    val ckDir = s"$root/ck"
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val seed = Seq((1L, "seed one"), (2L, "seed two")).toDF("id", "text")
      StreamIngest.init(spark, stateDir, seed, "text")
      val bloom0 = StreamIngest.rebuildBloom(spark, stateDir, 1000L)

      // batch 1: a seed dup, a fresh text, a within-batch dup of it
      drip(Seq((10L, "seed one"), (11L, "fresh alpha"), (12L, "fresh alpha"))
        .toDF("id", "text"), inDir, "b1")
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val verdicts = scala.collection.mutable.Map.empty[Long, Set[(Long, Boolean, Long, Boolean)]]
      q = StreamIngest.start(spark, stream, "id", "text", stateDir,
          bloom0, 1000L, queryName = "graft_ingest_t1",
          checkpointDir = ckDir) { (v, bid) =>
        verdicts(bid) = v.select("id", "in_corpus", "rep", "keep")
          .as[(Long, Boolean, Long, Boolean)].collect().toSet
      }
      q.processAllAvailable()
      assert(verdicts(0L) == Set(
        (10L, true, 10L, false),   // seed dup: corpus gate
        (11L, false, 11L, true),   // fresh winner
        (12L, false, 11L, false))) // within-batch dup: representative gate

      // batch 2: a dup of batch 1's kept text (cross-batch), plus fresh
      drip(Seq((20L, "fresh alpha"), (21L, "fresh beta"))
        .toDF("id", "text"), inDir, "b2")
      q.processAllAvailable()
      q.stop()
      assert(verdicts(1L) == Set(
        (20L, true, 20L, false),   // batch-1 kept text is corpus now
        (21L, false, 21L, true)))

      // corpus state: seed + the two kept texts, exactly once each
      val corpus = StreamIngest.corpus(spark, stateDir)
        .select("text").as[String].collect().sorted.toSeq
      assert(corpus == Seq("fresh alpha", "fresh beta", "seed one", "seed two"))

      // restart: bloom rebuilt from the durable hash index (driver state
      // lost), same checkpoint; a dup of a pre-restart text must still be
      // rejected and fresh text still admitted
      val bloom1 = StreamIngest.rebuildBloom(spark, stateDir, 1000L)
      drip(Seq((30L, "fresh beta"), (31L, "post restart"))
        .toDF("id", "text"), inDir, "b3")
      val stream2 = spark.readStream.schema(schema).parquet(inDir)
      q = StreamIngest.start(spark, stream2, "id", "text", stateDir,
          bloom1, 1000L, queryName = "graft_ingest_t1r",
          checkpointDir = ckDir) { (v, bid) =>
        verdicts(bid) = v.select("id", "in_corpus", "rep", "keep")
          .as[(Long, Boolean, Long, Boolean)].collect().toSet
      }
      q.processAllAvailable()
      q.stop()
      assert(verdicts(2L) == Set(
        (30L, true, 30L, false),
        (31L, false, 31L, true)))
      val finalCorpus = StreamIngest.corpus(spark, stateDir)
        .select("text").as[String].collect().sorted.toSeq
      assert(finalCorpus == Seq("fresh alpha", "fresh beta", "post restart",
        "seed one", "seed two"))
    } finally {
      if (q != null && q.isActive) q.stop()
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("streaming ingestion matches the batch operator verdict-for-verdict " +
      "on the same data (batch twin = the oracle-green q_incr_dedup)") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest2")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val seed = (0 until 50).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      val batchRows = Seq((100L, "doc 7"), (101L, "novel x"), (102L, "novel x"),
        (103L, "doc 23"), (104L, "novel y"))
      StreamIngest.init(spark, s"$root/state", seed, "text")
      val bloom = StreamIngest.rebuildBloom(spark, s"$root/state", 1000L)
      drip(batchRows.toDF("id", "text"), s"$root/in", "b")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long, Boolean)]
      q = StreamIngest.start(spark,
          spark.readStream.schema(schema).parquet(s"$root/in"),
          "id", "text", s"$root/state", bloom, 1000L,
          queryName = "graft_ingest_t2",
          checkpointDir = s"$root/ck") { (v, _) =>
        got ++= v.select("id", "in_corpus", "rep", "keep")
          .as[(Long, Boolean, Long, Boolean)].collect()
      }
      q.processAllAvailable()
      q.stop()
      val expected = TextOps.dedupeAgainstCorpus(
          batchRows.toDF("id", "text"), seed, "id", "text")
        .select("id", "in_corpus", "rep", "keep")
        .as[(Long, Boolean, Long, Boolean)].collect().toSet
      assert(got.toSet == expected)
    } finally {
      if (q != null && q.isActive) q.stop()
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("crash-replay guard: a replayed batch must not probe its own " +
      "half-committed index subdir (upTo bound), while rebuildBloom's " +
      "superset over the orphan stays safe") {
    val root = java.nio.file.Files.createTempDirectory("graft_ingest3")
    try {
      val stateDir = s"$root/state"
      val seed = Seq((1L, "seed one")).toDF("id", "text")
      StreamIngest.init(spark, stateDir, seed, "text")
      // simulate a crash after batch 0's index commit but before the
      // checkpoint commit: an orphan batch=1 subdir exists and batch 0
      // will be replayed
      Seq("orphan text").toDF("text")
        .select(TextOps.textHash(col("text"), strongHash = true).as("th"))
        .write.parquet(s"$stateDir/hash_index/batch=1")
      // the replayed batch 0 probes only batch <= 0: the orphan hash is
      // invisible (its own output), the seed hash is visible
      val visible = StreamIngest.hashIndex(spark, stateDir, upTo = Some(0L))
      assert(visible.count() == 1)
      val all = StreamIngest.hashIndex(spark, stateDir)
      assert(all.count() == 2)
      // a verdict computed through the guard re-admits the orphan text
      // (it was never durably committed from the checkpoint's view)
      val batch = Seq((10L, "orphan text"), (11L, "seed one"))
        .toDF("id", "text")
      val bloom = StreamIngest.rebuildBloom(spark, stateDir, 100L)
      val got = TextOps.dedupeAgainstCorpus(batch, visible, "id", "text",
          corpusBloom = Some(bloom), corpusHashCol = Some("th"))
        .select("id", "in_corpus", "rep", "keep")
        .as[(Long, Boolean, Long, Boolean)].collect().toSet
      assert(got == Set((10L, false, 10L, true), (11L, true, 11L, false)))
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }
}
