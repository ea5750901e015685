package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a contract query's full result (scratch diagnostics — used to
  * derive frozen VALUES oracles for fixture queries). */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-show")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN=1 prints the formatted physical plan instead
    // of results (plan-audit mode)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    args.foreach { n =>
      println(s"=== $n")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (explain) df.explain("formatted")
      else df.show(500, truncate = false)
    }
    spark.stop()
  }
}
