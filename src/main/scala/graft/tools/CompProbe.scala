package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gfunctions._

/** Round-6 isolation probe (guide §1.4): time the comparator variants of
  * the scored-snapshot build over an existing pairs snapshot, noop sink. */
object CompProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = spark.read.parquet(path)
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(tag: String)(df: => DataFrame): Unit = {
      force(df) // warm
      val t0 = System.nanoTime()
      force(df)
      println(f"PROBE $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("read_only")(pairs.select(col("id1"), col("id2")))
    t("jw_only")(pairs.select(col("id1"), col("id2"),
      jaro_winkler(col("name_1"), col("name_2")).as("jw")))
    t("lev_builtin_only")(pairs.select(col("id1"), col("id2"),
      levenshtein(col("name_1"), col("name_2")).cast("long").as("lev")))
    t("lev_sim_expr_only")(pairs.select(col("id1"), col("id2"),
      levenshtein_sim(col("name_1"), col("name_2")).as("lev_sim")))
    t("old_jw_lev_levsim")(pairs.select(col("id1"), col("id2"),
      jaro_winkler(col("name_1"), col("name_2")).as("jw"),
      levenshtein(col("name_1"), col("name_2")).cast("long").as("lev"),
      levenshtein_sim(col("name_1"), col("name_2")).as("lev_sim")))
    t("new_jw_lev_derived")(pairs.select(col("id1"), col("id2"),
        jaro_winkler(col("name_1"), col("name_2")).as("jw"),
        levenshtein_dist(col("name_1"), col("name_2")).cast("long").as("lev"),
        greatest(length(col("name_1")), length(col("name_2"))).as("_maxlen"))
      .select(col("id1"), col("id2"), col("jw"), col("lev"),
        when(col("_maxlen") === 0, lit(1.0))
          .otherwise(lit(1.0) -
            col("lev").cast("double") / col("_maxlen").cast("double"))
          .as("lev_sim")))
    spark.stop()
  }
}
