package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.block.{Blocking, MetaBlocking}
import graft.model.PredicateSpec

/** Stage-split timing for q_meta_blocking at sf0.1 (scratch diagnostic):
  * where do the ~24 bench seconds go — weight aggregate, weight snapshot,
  * WNP joins, or the final global sort? */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-metaprobe")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"METAPROBE $label=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }

    val recs = spark.read.parquet(s"$sfDir/part.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("p_partkey").as("id"), graft.gfunctions.normalize_text(col("p_name")).as("name"))
    val blocks = Blocking.blockingMap(recs, Seq(PredicateSpec("token", "name")), "id")

    val filtered = t("filterBlocks_count") {
      val f = MetaBlocking.filterBlocks(blocks, 0.75); f.count(); f
    }
    val weighted = t("weightedPairs_count") {
      val w = MetaBlocking.weightedPairs(filtered, maxBlockSize = 1000000)
      println(s"METAPROBE weighted_rows=${w.count()}"); w
    }
    t("wnp_with_snapshot") {
      println(s"METAPROBE pruned_rows=${MetaBlocking.wnpPrune(weighted).count()}")
    }
    t("wnp_no_snapshot") {
      MetaBlocking.wnpPrune(weighted, materializeWeights = false).count()
    }
    t("full_prune_ordered_noop") {
      MetaBlocking.prune(blocks, ratio = 0.75, maxBlockSize = 1000000)
        .orderBy(col("id1"), col("id2"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
