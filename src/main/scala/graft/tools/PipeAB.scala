package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.PagesGen
import graft.pipeline.Dedupe

/** A/B the materializePrepared flag on the flagship pipeline (scratch
  * diagnostics, not part of the driver contract). Interleaved runs so
  * host-steal noise hits both arms equally. */
object PipeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipe-ab")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def one(mat: Boolean): Double = {
      val pages = PagesGen.fromDocuments(spark, sfDir)
      val t0 = System.nanoTime()
      val r = Dedupe.run(spark, pages, Dedupe.Config(graft.SparkEntry.demoModel,
        collectMetrics = false, materializePrepared = mat))
      force(r.entityMap.select(col("url"), col("component"),
        round(col("confidence"), 6).as("confidence")).orderBy(col("url")))
      (System.nanoTime() - t0) / 1e9
    }
    one(true) // warm JIT + footers
    (1 to rounds).foreach { i =>
      val a = one(true); val b = one(false)
      println(f"AB round=$i mat=$a%.2f nomat=$b%.2f")
    }
    spark.stop()
  }
}
