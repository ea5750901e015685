package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke entry: runs SparkEntry.entry (the flagship dedupe pipeline on
  * sf0.001-derived pages) exactly like the driver does, prints row count
  * and a sample. `sbt "runMain graft.tools.Demo"` */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[demo] entry rows=$n")
    df.show(10, truncate = false)
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
