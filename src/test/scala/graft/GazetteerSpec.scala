package graft

import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.model.{Model, PredicateSpec}
import graft.pipeline.{Dedupe, Gazetteer}

class GazetteerSpec extends SparkSpec {
  import spark.implicits._

  private val model = Model(
    bias = -13.0,
    weights = Map("jw_text_norm" -> 6.0, "lev_text_norm" -> 9.0, "exact_lang" -> 0.4),
    threshold = 0.5,
    predicates = Seq(
      PredicateSpec("token", "text_norm"),
      PredicateSpec("simhash", "text", bands = 4)))

  test("matchRecords links messy variants to their canon record, top-n ranked") {
    val canonPages = Seq(
      ("https://c/1", "alpha beta gamma delta epsilon zeta eta theta", "en"),
      ("https://c/2", "one two three four five six seven eight", "en"),
      ("https://c/3", "aaa bbb ccc ddd eee fff ggg hhh", "de"))
      .toDF("url", "text", "lang")
    val messyPages = Seq(
      ("https://m/1", "alpha beta gamma delta epsilon zeta eta  theta", "en"), // near c/1
      ("https://m/2", "completely unrelated words here nothing shared", "fr"))
      .toDF("url", "text", "lang")
    val canon = Dedupe.prepare(canonPages
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary")))
    val messy = Dedupe.prepare(messyPages
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary")))

    val got = Gazetteer.matchRecords(spark, messy, canon, Gazetteer.Config(model, nMatches = 2))
    val rows = got.collect()
    // messy/1 matches canon/1 at rank 1; messy/2 matches nothing
    val m1 = messy.filter($"url" === "https://m/1").select("id").as[Long].first()
    val c1 = canon.filter($"url" === "https://c/1").select("id").as[Long].first()
    assert(rows.exists(r => r.getLong(0) == m1 && r.getLong(1) == c1 && r.getLong(3) == 1L))
    val m2 = messy.filter($"url" === "https://m/2").select("id").as[Long].first()
    assert(!rows.exists(r => r.getLong(0) == m2))
  }

  test("dedupeCanon merges entities split by first-pass blocking") {
    // two first-pass entities with near-identical canonical text
    val entityMap = Seq((10L, 100L), (11L, 100L), (20L, 200L), (30L, 300L))
      .toDF("id", "component")
    val canon = Seq(
      (100L, "alpha beta gamma delta epsilon zeta", "en"),
      (200L, "alpha beta gamma delta epsilon  zeta", "en"), // near-dup of 100
      (300L, "totally different content in every way", "en"))
      .toDF("component", "text_norm", "lang")
    val merged = Gazetteer.dedupeCanon(spark, entityMap, canon,
      Dedupe.Config(model, collectMetrics = false))
    val got = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == got(20L), "entities 100 and 200 should merge")
    assert(got(10L) == 100L, "merged id should be the min first-pass component")
    assert(got(30L) == 300L, "unrelated entity untouched")
    assert(got(10L) == got(11L))

    // reclaimScratch variant must return the same mapping (truncated
    // eagerly, inner run's scratch deleted) — the streaming-compaction
    // configuration
    val merged2 = Gazetteer.dedupeCanon(spark, entityMap, canon,
      Dedupe.Config(model, collectMetrics = false), reclaimScratch = true)
    val got2 = merged2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got, "reclaimScratch must not change the remap")
  }
}
