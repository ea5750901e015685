package graft.tools
import org.apache.spark.sql.SparkSession
object OneQ {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sf = args(1); val out = args(2)
    val spark = SparkSession.builder().master("local[8]")
      .appName("oneq").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sf)
      .write.mode("overwrite").parquet(s"$out/$name")
    val sqls = graft.SparkEntry.oracleSql
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_one.json"),
      s"""{"$name": ${ujsonEscape(sqls(name))}}""".getBytes)
    spark.stop()
  }
  def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""
}
