package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.block.SortedNeighborhood

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("global rank equals the single-window rebuild, including on a " +
    "hot constant key that range-splits by the id tiebreak") {
    val recs = ((1 to 80).map(i => (i.toLong, "same")) ++
      (81 to 120).map(i => (i.toLong, s"k${i % 7}"))).toDF("id", "key")
    val got = SortedNeighborhood
      .withGlobalRank(recs, "id", col("key"), buckets = 8)
      .select("id", "rank")
    val expect = recs.select(col("id"),
      row_number().over(Window.orderBy(col("key"), col("id"))).cast("long").as("rank"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("pairs: each record pairs with its window-1 successors, once, " +
    "id-normalized") {
    // sort order by (key, id): c(1) < a(3) < b(2) < d(4)
    val recs = Seq((1L, "a"), (3L, "b"), (2L, "c"), (4L, "d")).toDF("id", "k")
    val got = SortedNeighborhood.pairs(recs, "id", col("k"), window = 3)
      .as[(Long, Long)].collect().toSet
    // w=3: neighbors at distance 1 and 2 in order 1,3,2,4
    assert(got == Set((1L, 3L), (1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L)))
  }

  test("multi-pass union dedups pairs shared between passes") {
    val recs = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "k1", "k2")
    val got = SortedNeighborhood
      .multiPassPairs(recs, "id", Seq(col("k1"), col("k2")), window = 2)
      .as[(Long, Long)].collect().toSet
    // both passes sort identically here → same adjacent pairs, deduped
    assert(got == Set((1L, 2L), (2L, 3L)))
  }

  test("plan: ranking uses bucket-partitioned windows only — no " +
    "partition-less WindowExec") {
    val recs = (1 to 200).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    val ranked = SortedNeighborhood.withGlobalRank(recs, "id", col("key"))
    ranked.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val bad = scala.collection.mutable.ListBuffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case w: WindowExec if w.partitionSpec.isEmpty => bad += w.toString
        case _ =>
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      kids.foreach(walk)
    }
    walk(ranked.queryExecution.executedPlan)
    assert(bad.isEmpty, s"global window in SNM rank plan:\n${bad.mkString}")
  }
}
