package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 isolation probe: cost of the q_isotonic-shaped consumer scan
  * over a scored snapshot, per (file layout, read split size). */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (path <- args; split <- Seq("4m", "128m")) {
      val r = spark.newSession()
      r.conf.set("spark.sql.files.maxPartitionBytes", split)
      val df = r.read.parquet(path)
      val q = df.filter(col("jw") >= 0.75 &&
          pmod(col("id1") + col("id2"), lit(31L)) === 0)
        .groupBy(round(col("jw"), 3).as("s")).agg(count(lit(1)).as("n"))
      force(q) // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => force(q))
      println(f"SCAN $path split=$split%-5s ${(System.nanoTime() - t0) / 3e9}%7.3f s/scan")
    }
    spark.stop()
  }
}
