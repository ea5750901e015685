package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gfunctions._

/** Scratch diagnostic: is the null-guard in minhashSignatures paying a
  * double shingling pass (no CSE over the custom expressions)? */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-sigprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(32).cache()
    docs.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SIGPROBE $tag=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val sh = token_shingles(tokens(lower(col("text"))), 3)
    for (_ <- 1 to 3) {
      time("raw_minhash") {
        docs.select(minhash(sh, 64).as("sig"))
          .write.format("noop").mode("overwrite").save()
      }
      time("guarded") {
        docs.select(when(size(sh) > 0, minhash(sh, 64)).as("sig"))
          .write.format("noop").mode("overwrite").save()
      }
      time("shingles_only") {
        docs.select(sh.as("s"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
