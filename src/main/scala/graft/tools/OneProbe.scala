package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{Model, PredicateSpec}

/** Iteration-count/time probe for the one-to-one matcher (scratch). */
object OneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-oneprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val recs = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("id"),
        graft.gfunctions.normalize_text(col("p_name")).as("name"))
    val messy = recs.filter(col("id") % 2 === 1)
    val canon = recs.filter(col("id") % 2 === 0)
    val m = Model(bias = -8.0, weights = Map("jw_name" -> 12.0), threshold = 0.5,
      predicates = Seq(PredicateSpec("token", "name")))
    val scored = graft.pipeline.Gazetteer.matchRecords(spark, messy, canon,
        graft.pipeline.Gazetteer.Config(m, nMatches = 2, maxCanonBlockSize = 1000))
      .select(col("messy_id").as("id1"), col("canon_id").as("id2"), col("score"))
    println(s"ONEPROBE scored_pairs=${scored.count()}")
    val t0 = System.nanoTime()
    val r = graft.cluster.OneToOne.greedyMatch(scored, bipartite = true)
    val n = r.pairs.count()
    println(f"ONEPROBE matched=$n iters=${r.iterations} secs=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
