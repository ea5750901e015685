package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.pipeline.Dedupe

/** Stage-level timing of q_dedupe_canon's pair generation (round-2 verdict
  * item 1). Scratch diagnostics, not part of the driver contract. */
object CanonProfile {
  def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-canon-profile")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val model = graft.SparkEntry.demoModel
    val full = PagesGen.fromDocuments(spark, sfDir)
    val subset = full.filter(pmod(xxhash64(col("url")), lit(5L)) === 0)

    for ((nm, pages) <- Seq(("subset", subset), ("full", full))) {
      val prepared = Dedupe.prepare(pages)
      val blocksLazy = graft.block.Blocking.blockingMap(prepared, model.predicates, "id")
      val tBlocks = timeSec(force(blocksLazy))
      // materialize blocks so downstream timings isolate pair-gen itself
      val blocks = Dedupe.ephemeralSnapshot(spark, blocksLazy, s"prof_blocks_$nm")
      val nBlocks = blocks.count()
      println(s"PROFILE $nm block_rows=$nBlocks blocks_s=$tBlocks")

      val sizes = blocks.groupBy("block_key").agg(count("*").as("block_size"))
      val eligible = sizes.filter(col("block_size") >= 2 && col("block_size") <= 200)
      val sumSq = eligible.agg(sum(col("block_size") * col("block_size"))).collect()(0).getLong(0)
      println(s"PROFILE $nm eligible_keys=${eligible.count()} sum_sq=$sumSq")

      val t0 = System.nanoTime()
      val pairs = graft.pairs.PairGen.candidatePairs(blocks, 200)
      val nPairs = pairs.count()
      println(s"PROFILE $nm pairs=$nPairs gen_from_snapshot_s=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
