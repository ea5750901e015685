package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.pipeline.Dedupe

/** Stage-level timing of the flagship pipeline (scratch diagnostics, not
  * part of the driver contract). */
object CanonProfile {
  def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipe-profile")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val model = graft.SparkEntry.demoModel
    val pages = PagesGen.fromDocuments(spark, sfDir)
    // warm JIT/footers
    force(pages)

    val prepared = Dedupe.prepare(pages)
    println(s"PROFILE prepare=${timeSec(force(prepared))}")
    val repMap = prepared.groupBy(col("text_hash")).agg(min(col("id")).as("rep"))
    val reps = prepared.join(repMap.select(col("rep").as("id")), Seq("id"), "left_semi")
    println(s"PROFILE reps=${timeSec(force(reps))}")
    var blocks: DataFrame = null
    println(s"PROFILE blocks_snapshot=${timeSec {
      blocks = Dedupe.ephemeralSnapshot(spark,
        graft.block.Blocking.blockingMap(reps, model.predicates, "id"), "prof_blocks")
    }}")
    var pairs: DataFrame = null
    println(s"PROFILE pairgen=${timeSec {
      pairs = graft.pairs.PairGen.candidatePairs(blocks, 200)
      force(pairs)
    }}")
    val fields = Dedupe.requiredFields(model.featureNames)
    val attached = graft.pairs.PairGen.attachFields(pairs, reps, "id", fields)
    var scored: DataFrame = null
    println(s"PROFILE score_snapshot=${timeSec {
      scored = Dedupe.ephemeralSnapshot(spark,
        graft.score.Scoring.scorePairs(attached, model), "prof_scored")
    }}")
    val edges = scored.filter(col("score") >= model.threshold).select(col("id1"), col("id2"))
    var cc: graft.cluster.ConnectedComponents.CCResult = null
    println(s"PROFILE cc=${timeSec { cc = graft.cluster.ConnectedComponents.run(edges) }} iters=${cc.iterations}")
    val idToRep = prepared.select(col("id"), col("text_hash"))
      .join(repMap, "text_hash").select(col("id"), col("rep"))
    val repLabels = reps.select(col("id")).join(cc.labels, Seq("id"), "left")
      .select(col("id").as("rep"), coalesce(col("component"), col("id")).as("component"))
    val allLabels = idToRep.join(repLabels, "rep").select(col("id"), col("component"))
    val conf = graft.cluster.Canonicalize.confidences(
      allLabels, scored.select(col("id1"), col("id2"), col("score")))
    val entityMap = prepared.select(col("id"), col("url")).join(conf, "id")
      .select(col("id"), col("url"), col("component"), col("confidence"))
    println(s"PROFILE entity_map=${timeSec(force(entityMap.orderBy(col("url"))))}")
    val canon = graft.cluster.Canonicalize.canonTable(
      prepared.select(col("id") +: Seq("url", "text_norm", "lang").map(col): _*)
        .join(allLabels, "id"), "component", Seq("url", "text_norm", "lang"))
    println(s"PROFILE canon=${timeSec(force(canon))}")
    spark.stop()
  }
}
