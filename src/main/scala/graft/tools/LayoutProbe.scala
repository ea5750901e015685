package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 layout experiment: snapshot file-count x reader-split-size
  * grid, measuring (a) a cheap filter+agg consumer scan and (b) a
  * comparator-heavy consumer pass, over the same 47M-row scored data. */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(src)
    val layouts = Seq(32, 64, 128)
    layouts.foreach { n =>
      df.coalesce(n).write.mode("overwrite").parquet(s"/tmp/scored_${n}f")
    }
    def force(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    for (n <- layouts; split <- Seq("4m", "8m", "16m", "128m")) {
      val r = spark.newSession()
      r.conf.set("spark.sql.files.maxPartitionBytes", split)
      val d = r.read.parquet(s"/tmp/scored_${n}f")
      val cheap = d.filter(col("jw") >= 0.75 &&
          pmod(col("id1") + col("id2"), lit(31L)) === 0)
        .groupBy(round(col("jw"), 3).as("s")).agg(count(lit(1)).as("n"))
      // heavy stand-in: per-row fp work proportional to a comparator pass
      val heavy = d.select(
        sum(pow(col("jw") * col("lev_sim") + col("lev") % 7, 1.5)).as("x"))
      force(cheap); force(heavy)
      var t0 = System.nanoTime(); (1 to 3).foreach(_ => force(cheap))
      val ch = (System.nanoTime() - t0) / 3e9
      t0 = System.nanoTime(); (1 to 3).foreach(_ => force(heavy))
      val hv = (System.nanoTime() - t0) / 3e9
      println(f"LAYOUT files=$n%-4d split=$split%-5s cheap=${ch}%6.3f s  heavy=${hv}%6.3f s")
    }
    spark.stop()
  }
}
