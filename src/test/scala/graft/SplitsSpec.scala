package graft

import org.apache.spark.sql.functions._
import graft.textops.Splits
import graft.cluster.ConnectedComponents

/** Leakage-safe cluster-keyed splitting (textops/Splits). */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold encodes the fraction as a 32-char hex floor") {
    assert(Splits.hexThreshold(0.125) == "2" + "0" * 31)
    assert(Splits.hexThreshold(0.5) == "8" + "0" * 31)
    assert(Splits.hexThreshold(0.0) == "0" * 32)
    // 0.1 in hex is 0.1999... recurring
    assert(Splits.hexThreshold(0.1) == "1999999999999" + "0" * 19)
    intercept[IllegalArgumentException](Splits.hexThreshold(1.0))
    intercept[IllegalArgumentException](Splits.hexThreshold(-0.1))
  }

  test("no cluster straddles splits; fraction lands near target") {
    // 2000 clusters x 3 members each
    val df = spark.range(6000)
      .select(col("id"), concat(lit("c"), col("id") % 2000).as("cluster"))
    val out = Splits.splitByCluster(df, "cluster", evalFrac = 0.25)
    val straddlers = out.groupBy("cluster")
      .agg(count_distinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0)
    val evalClusters = out.filter(col("split") === "eval")
      .select("cluster").distinct().count()
    // md5 is uniform: 2000 coin flips at p=0.25 — 6 sigma ≈ 116
    assert(math.abs(evalClusters - 500L) < 120,
      s"eval clusters $evalClusters too far from 500")
  }

  test("salt re-rolls assignment; determinism within a salt") {
    val df = spark.range(500)
      .select(col("id"), concat(lit("c"), col("id")).as("cluster"))
    val a = Splits.splitByCluster(df, "cluster", 0.5, salt = "a")
      .select("id", "split").as[(Long, String)].collect().toMap
    val a2 = Splits.splitByCluster(df, "cluster", 0.5, salt = "a")
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Splits.splitByCluster(df, "cluster", 0.5, salt = "b")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == a2)
    assert(a != b) // 2^-500 false-failure odds
  }

  test("NULL cluster key yields NULL split, not a silent 'train'") {
    val out = Seq((1L, Some("x")), (2L, None)).toDF("id", "cluster")
      .select(Splits.splitLabel(col("cluster"), 0.5).as("split"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).isDefined && out(1).isEmpty)
  }

  test("near-dup guard end to end: CC entities key the split") {
    // two near-dup families (a: ids 1,2,3 / b: ids 10,11) + a singleton
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val members = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val cc = ConnectedComponents.run(edges).labels
    val keyed = members.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val out = Splits.splitByCluster(keyed, "cluster", 0.5, salt = "s")
    val straddlers = out.groupBy("cluster")
      .agg(count_distinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0)
    // family members share a side
    val byId = out.select("id", "split").as[(Long, String)].collect().toMap
    assert(byId(1L) == byId(2L) && byId(2L) == byId(3L))
    assert(byId(10L) == byId(11L))
  }
}
