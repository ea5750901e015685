package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gfunctions._
import graft.model.PredicateSpec

/**
 * Benchmark main — prints ONE JSON line:
 * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *  "pairs_scored":N,"scaling":{"pairs_per_sec_8":...,"pairs_per_sec_32":...,
 *  "efficiency":...}}
 *
 * Two parts:
 *  1. per-query wall times at SPARK_GRAFT_CPUS parallelism. Every query is
 *     forced through the `noop` sink — a bare count() would let Catalyst
 *     prune the comparator columns and measure nothing.
 *  2. the north-rule scaling evidence (BASELINE.json:2,14; sandbox
 *     substitute per driver instruction): the SAME pairs-scoring job on the
 *     SAME input at local[8] and local[32]; throughput at both + efficiency
 *     = (pairs/s@32 / pairs/s@8) / 4.
 */
object Bench {

  /** The headline job: token-block part names → candidate pairs → full
    * comparator + LR score. CPU-bound string similarity — the engine's
    * dominant cost at scale (dedupe's scoreDuplicates† analog). */
  private def scoredPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val recs = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
    val blocks = graft.block.Blocking.blockingMap(
      recs, Seq(PredicateSpec("token", "name")), "id")
    val pairs = graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 1000000)
    val attached = graft.pairs.PairGen.attachFields(pairs, recs, "id", Seq("name"))
    val z = lit(-8.0) +
      lit(9.0) * jaro_winkler(col("name_1"), col("name_2")) +
      lit(6.0) * levenshtein_sim(col("name_1"), col("name_2"))
    attached.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
      .select(col("id1"), col("id2"), col("score"))
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // part 1: per-query timings at the configured parallelism.
    // One untimed warm-up absorbs JIT + parquet-footer caching.
    val spark = session(cpus)
    try force(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case _: Throwable => () }
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try timeSec(force(fn(spark, sfDir))) catch { case _: Throwable => -1.0 }
      name -> t
    }
    // pair count for the throughput denominator (not timed)
    val nPairs = scoredPairs(spark, sfDir).count()
    spark.stop()

    // part 2: scaling evidence — same job, same input, 8 vs 32 threads.
    // Warm-up run at each size excluded from measurement (JIT + page cache).
    def measure(p: Int): Double = {
      val s = session(p)
      try {
        force(scoredPairs(s, sfDir)) // warm-up
        val t = timeSec(force(scoredPairs(s, sfDir)))
        nPairs / t
      } finally s.stop()
    }
    val pps8 = measure(8)
    val pps32 = measure(32)
    val eff = (pps32 / pps8) / 4.0

    val qs = queryTimes.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""pairs_scored":$nPairs,"scaling":{"pairs_per_sec_8":${"%.0f".format(pps8)},""" +
      s""""pairs_per_sec_32":${"%.0f".format(pps32)},"efficiency":${"%.3f".format(eff)}}}""")
  }
}
