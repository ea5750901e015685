package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gfunctions._
import graft.model.PredicateSpec

/** Scratch profiling main (round-2 scaling-gate investigation; not part of
  * the driver contract). Measures partition counts + per-stage times of the
  * bench scoring path at a given parallelism. */
object Profile {
  def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    val recs = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("id"), normalize_text(col("p_name")).as("name"))
    val blocks = graft.block.Blocking.blockingMap(
      recs, Seq(PredicateSpec("token", "name")), "id")
    val pairs = graft.pairs.PairGen.candidatePairs(blocks, maxBlockSize = 1000000)
    val attached = graft.pairs.PairGen.attachFields(pairs, recs, "id", Seq("name"))

    val tGen = timeSec(force(attached))
    println(s"PROFILE gen_only=$tGen")

    val t0 = System.nanoTime()
    val ck = attached.localCheckpoint()
    val tCk = (System.nanoTime() - t0) / 1e9
    println(s"PROFILE localCheckpoint=$tCk partitions=${ck.rdd.getNumPartitions}")

    val snap = s"/tmp/graft_profile_pairs"
    val tW = timeSec(ck.write.mode("overwrite").parquet(snap))
    val fromParquet = spark.read.parquet(snap)
    println(s"PROFILE snapshot_write=$tW read_partitions=${fromParquet.rdd.getNumPartitions}")
    val n = fromParquet.count()
    println(s"PROFILE n_pairs=$n")

    def affine(df: DataFrame) = df.select(col("id1"), col("id2"),
      round(affine_gap(col("name_1"), col("name_2")), 6).as("affine"))
    def jwlev(df: DataFrame) = df.select(col("id1"), col("id2"),
      round(jaro_winkler(col("name_1"), col("name_2")), 6).as("jw"),
      levenshtein(col("name_1"), col("name_2")).cast("long").as("lev"))

    // warm
    force(affine(fromParquet))
    val tAffP = timeSec(force(affine(fromParquet)))
    println(s"PROFILE affine_from_parquet=$tAffP rate=${n / tAffP}")
    val tAffC = timeSec(force(affine(ck)))
    println(s"PROFILE affine_from_ckpt=$tAffC rate=${n / tAffC}")
    val tJL = timeSec(force(jwlev(fromParquet)))
    println(s"PROFILE jwlev_from_parquet=$tJL rate=${n / tJL}")

    // repartitioned variant
    val wide = fromParquet.repartition(cpus * 8)
    val t1 = System.nanoTime()
    val wideCk = wide.localCheckpoint()
    println(s"PROFILE wide_ckpt=${(System.nanoTime() - t1) / 1e9} partitions=${wideCk.rdd.getNumPartitions}")
    val tAffW = timeSec(force(affine(wideCk)))
    println(s"PROFILE affine_from_wide=$tAffW rate=${n / tAffW}")
    spark.stop()
  }
}
