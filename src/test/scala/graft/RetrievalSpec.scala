package graft

import org.apache.spark.sql.functions._
import graft.textops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple apple banana"),
    (3L, "cherry date elderberry"),
    (4L, "fig grape apple"),
    (5L, "date date date date")
  ).toDF("doc_id", "text")

  test("bm25: rare-term query retrieves only matching docs, tf orders them") {
    val qs = Seq((100L, "apple"), (200L, "date")).toDF("qid", "qtext")
    val got = Retrieval
      .bm25Search(corpus, "doc_id", "text", qs, "qid", "qtext",
        k = 10, maxDfRatio = 1.0)
      .orderBy($"qid", $"rank")
      .collect()
    val apple = got.filter(_.getLong(0) == 100L).map(r => (r.getLong(1), r.getDouble(3)))
    // docs 1, 2, 4 contain "apple"; doc 2 has tf=3 but is also longer —
    // saturation still ranks it first (tf dominates at these lengths)
    assert(apple.map(_._1).toSet == Set(1L, 2L, 4L))
    assert(apple.head._1 == 2L, s"expected tf-heavy doc first, got ${apple.toSeq}")
    assert(apple.map(_._2).sameElements(apple.map(_._2).sorted.reverse))
    val date = got.filter(_.getLong(0) == 200L).map(_.getLong(1))
    assert(date.toSet == Set(3L, 5L))
    assert(date.head == 5L) // tf=4 beats tf=1
  }

  test("bm25: k cutoff keeps the top-scored docs in rank order") {
    val qs = Seq((9L, "apple date")).toDF("qid", "qtext")
    val got = Retrieval
      .bm25Search(corpus, "doc_id", "text", qs, "qid", "qtext",
        k = 2, maxDfRatio = 1.0)
      .orderBy($"rank")
      .collect()
    assert(got.length == 2)
    // hand-ranked: doc 5 ("date"×4, idf 0.875) then doc 3; the tf-heavy
    // "apple" doc 2 scores 0.816 < 0.919 and must be cut
    assert(got.map(_.getLong(1)).toSeq == Seq(5L, 3L))
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }

  test("bm25: df-prune drops the stopword term entirely") {
    // "apple" is in 3/5 docs = 0.6 > 0.5 → pruned; a pure-"apple" query
    // then matches nothing
    val qs = Seq((1L, "apple")).toDF("qid", "qtext")
    val got = Retrieval.bm25Search(corpus, "doc_id", "text", qs, "qid", "qtext",
      k = 10, maxDfRatio = 0.5)
    assert(got.count() == 0)
  }

  test("bm25: idf and saturation match a hand-computed score") {
    // one query term "cherry": df=2, N=5 → idf = ln(1 + 3.5/2.5)
    // doc 1: tf=1, dl=3; doc 3: tf=1, dl=3; avgdl = 17/5 = 3.4
    val idf = math.log(1.0 + (5.0 - 2.0 + 0.5) / (2.0 + 0.5))
    val denom = 1.0 + 1.2 * (1.0 - 0.75 + 0.75 * 3.0 / 3.4)
    // mirror the 1e-6 quantization (Spark round(double,0) = BigDecimal
    // HALF_UP on the shortest decimal repr, same as scala BigDecimal)
    val expect = BigDecimal(idf * 2.2 / denom * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 1e6
    val qs = Seq((1L, "cherry")).toDF("qid", "qtext")
    val got = Retrieval
      .bm25Search(corpus, "doc_id", "text", qs, "qid", "qtext",
        k = 10, maxDfRatio = 1.0)
      .orderBy($"rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 3L)) // tie → doc_id order
    assert(got.forall(r => math.abs(r.getDouble(3) - expect) < 1e-9),
      s"expected $expect, got ${got.map(_.getDouble(3)).toSeq}")
  }

  test("bm25 plan: scoring a persisted index broadcasts the query side " +
    "and shuffles only on (qid, doc_id) keys, never by term") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.bm25Index(corpus, "doc_id", "text", maxDfRatio = 1.0)
      .write.mode("overwrite").parquet(dir)
    val qs = Seq((1L, "apple")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(spark.read.parquet(dir), qs, "qid", "qtext", k = 5)
    out.collect() // materialize so AQE finalizes the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // every shuffle in the scoring plan is keyed on qid/doc_id (the
    // score agg + the per-query window) — none re-partitions by term.
    // walk INCLUDING AQE-wrapped subtrees (plain collect stops at
    // AdaptiveSparkPlanExec / leaf QueryStageExec)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val keys = scala.collection.mutable.ListBuffer[String]()
    def walk(p: SparkPlan): Unit = {
      p match {
        case s: ShuffleExchangeExec => keys += s.outputPartitioning.toString
        case _ =>
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      kids.foreach(walk)
    }
    walk(out.queryExecution.executedPlan)
    assert(keys.nonEmpty && keys.forall(k => !k.contains("term")),
      s"term-keyed shuffle at scoring time: $keys")
  }
}
