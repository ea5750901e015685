package graft

import org.apache.spark.sql.functions._
import graft.score.Scoring
import graft.pipeline.Dedupe

/** C6 categorical dummies + C7 interaction terms (SURVEY.md §2.5). */
class FeatureSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    // (id1, id2, seg_1, seg_2, bal_1, bal_2)
    (1L, 2L, "BUILDING", "BUILDING", Some(10.0), Some(100.0)),
    (1L, 3L, "BUILDING", "AUTOMOBILE", Some(10.0), None),
    (2L, 3L, "AUTOMOBILE", "BUILDING", None, None),
    (3L, 4L, "MACHINERY", "MACHINERY", None, Some(50.0))) // exact + missing
    .toDF("id1", "id2", "seg_1", "seg_2", "bal_1", "bal_2")

  test("categorical pair dummy fires on the unordered value pair (C6)") {
    val got = pairs.select(col("id1"), col("id2"),
      Scoring.featureColumn("cat_seg__BUILDING__AUTOMOBILE").as("ba"),
      Scoring.featureColumn("cat_seg__BUILDING__BUILDING").as("bb"))
      .orderBy("id1", "id2")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(r => (r._3, r._4)).toSeq ==
      Seq((0.0, 1.0), (1.0, 0.0), (1.0, 0.0), (0.0, 0.0)))
  }

  test("interaction term is the product of its sub-features (C7)") {
    val got = pairs.select(col("id1"), col("id2"),
      Scoring.featureColumn("exact_seg").as("e"),
      Scoring.featureColumn("missing_bal").as("m"),
      Scoring.featureColumn("inter_exact_seg__missing_bal").as("i"))
      .orderBy("id1", "id2")
      .as[(Long, Long, Double, Double, Double)].collect()
    got.foreach { r => assert(r._5 == r._3 * r._4, s"row $r") }
    assert(got.map(_._5).toSeq == Seq(0.0, 0.0, 0.0, 1.0))
  }

  test("interaction whose sub-feature name contains __ resolves (cat_ in inter_)") {
    // inter_cat_seg__BUILDING__AUTOMOBILE__missing_bal: a fixed left-split
    // at the first __ mis-parsed this; the resolver must find the split
    // point where both sides are valid features
    val got = pairs.select(col("id1"), col("id2"),
      Scoring.featureColumn("cat_seg__BUILDING__AUTOMOBILE").as("c"),
      Scoring.featureColumn("missing_bal").as("m"),
      Scoring.featureColumn("inter_cat_seg__BUILDING__AUTOMOBILE__missing_bal").as("i"))
      .orderBy("id1", "id2")
      .as[(Long, Long, Double, Double, Double)].collect()
    got.foreach { r => assert(r._5 == r._3 * r._4, s"row $r") }
    assert(got.map(_._5).toSeq == Seq(0.0, 1.0, 1.0, 0.0))
  }

  test("requiredFields resolves interaction + categorical kinds") {
    assert(Dedupe.requiredFields(Seq("inter_jw_name__exact_lang")).toSet ==
      Set("name", "lang"))
    assert(Dedupe.requiredFields(Seq("cat_seg__A__B")) == Seq("seg"))
  }

  test("scorePairs accepts a model with interaction + categorical features") {
    val m = graft.model.Model(
      bias = -1.0,
      weights = Map(
        "exact_seg" -> 1.0,
        "missing_bal" -> 0.5,
        "inter_exact_seg__missing_bal" -> -0.25,
        "cat_seg__BUILDING__AUTOMOBILE" -> 2.0),
      threshold = 0.5, predicates = Nil)
    val scored = Scoring.scorePairs(pairs, m)
    assert(scored.columns.contains("score"))
    val s = scored.orderBy("id1", "id2").select("score").as[Double].collect()
    assert(s.length == 4 && s.forall(x => x > 0.0 && x < 1.0))
  }

  test("explainPairs: contributions + bias reproduce the logit of score") {
    val m = graft.model.Model(bias = -1.5,
      weights = Map(
        "exact_seg" -> 1.0,
        "missing_bal" -> 0.5,
        "inter_exact_seg__missing_bal" -> -0.25),
      threshold = 0.5, predicates = Nil)
    val rows = Scoring.explainPairs(pairs, m).collect()
    assert(rows.length == 4 * 3) // one row per (pair, feature)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (_, rs) =>
      val z = rs.head.getDouble(6) + rs.map(_.getDouble(5)).sum
      val score = rs.head.getDouble(7)
      assert(math.abs(1.0 / (1.0 + math.exp(-z)) - score) < 1e-9)
      // weight * value == contribution on every melt row
      rs.foreach(r =>
        assert(math.abs(r.getDouble(4) * r.getDouble(3) - r.getDouble(5)) < 1e-12))
    }
  }
}
