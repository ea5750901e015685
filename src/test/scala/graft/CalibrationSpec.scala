package graft

import graft.score.Calibration
import org.apache.spark.sql.functions._

/** Isotonic calibration (score/Calibration). */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("pav: monotone input is untouched; violators pool to the mean") {
    // already isotonic
    assert(Calibration.pav(Array(1d, 1d, 1d), Array(0d, 0.5, 1d)).toSeq ==
      Seq(0d, 0.5, 1d))
    // one violator: (1.0, 0.0) pools to 0.5
    assert(Calibration.pav(Array(1d, 1d), Array(1d, 0d)).toSeq == Seq(0.5, 0.5))
    // weighted pooling: means (1.0 w=1), (0.0 w=3) -> pooled 0.25
    assert(Calibration.pav(Array(1d, 3d), Array(1d, 0d)).toSeq == Seq(0.25, 0.25))
  }

  test("pav equals the minimax characterization under fuzz") {
    val rnd = new scala.util.Random(37)
    for (round <- 0 until 200) {
      val k = 1 + rnd.nextInt(12)
      val w = Array.fill(k)((1 + rnd.nextInt(5)).toDouble)
      val ys = Array.tabulate(k)(i => rnd.nextInt(w(i).toInt + 1).toDouble)
      val fit = Calibration.pav(w, ys)
      // fit(x) = max_{i<=x} min_{j>=x} mean(y[i..j])
      def mean(i: Int, j: Int): Double =
        (i to j).map(ys).sum / (i to j).map(w).sum
      val minimax = Array.tabulate(k)(x =>
        (0 to x).map(i => (x until k).map(j => mean(i, j)).min).max)
      assert(fit.toSeq == minimax.toSeq, s"round $round: " +
        s"w=${w.toSeq} y=${ys.toSeq} fit=${fit.toSeq} mm=${minimax.toSeq}")
      // and the fit is monotone non-decreasing
      fit.sliding(2).foreach(p => if (p.length == 2) assert(p(0) <= p(1)))
    }
  }

  test("isotonicTable pools equal scores first; applyTable steps correctly") {
    val labeled = Seq(
      (0.2, 0), (0.2, 1),          // score 0.2: rate 0.5
      (0.5, 0), (0.5, 0),          // score 0.5: rate 0.0 -> violates, pools
      (0.9, 1), (0.9, 1), (0.9, 0) // score 0.9: rate 2/3
    ).toDF("s", "lbl")
    val table = Calibration.isotonicTable(labeled, "s", "lbl")
      .as[(Double, Long, Double)].collect().sortBy(_._1)
    // 0.2 (0.5) and 0.5 (0.0) pool to 1/4; 0.9 stays at 2/3
    assert(table.toSeq == Seq((0.2, 2L, 0.25), (0.5, 2L, 0.25),
      (0.9, 3L, 2.0 / 3)))
    val applied = Calibration.applyTable(
        Seq(0.1, 0.3, 0.9, 0.95).toDF("s"), table.toSeq.toDF("score", "n", "calibrated"), "s")
      .select("calibrated").as[Double].collect().toSeq
    assert(applied == Seq(0.25, 0.25, 2.0 / 3, 2.0 / 3))
  }

  test("isotonicTable fails fast on a continuous-score frame; binning fixes it") {
    // 10^6 DISTINCT scores: the PAV pool would be a corpus-sized driver
    // collect. The cap must throw BEFORE collecting...
    val n = 1000000
    val continuous = spark.range(n)
      .select((col("id").cast("double") / n).as("s"),
        (col("id") % 2).cast("int").as("lbl"))
    val e = intercept[IllegalArgumentException] {
      Calibration.isotonicTable(continuous, "s", "lbl",
        maxDistinctScores = 10000)
    }
    assert(e.getMessage.contains("binScores") ||
      e.getMessage.contains("distinct scores"), e.getMessage)
    // ...and each pre-binning helper must bring the same frame under it.
    val fixed = Calibration.fixedWidthBins(continuous, "s", bins = 100)
    assert(fixed.select("s").distinct().count() <= 100)
    val table = Calibration.isotonicTable(fixed, "s", "lbl",
      maxDistinctScores = 10000)
    assert(table.count() <= 100)
    // label rate is ~0.5 in every bin (floating bin edges shift a few
    // boundary rows) -> calibrated must be flat near 0.5
    val cal = table.select("calibrated").as[Double].collect()
    assert(cal.forall(c => math.abs(c - 0.5) < 1e-3), cal.take(5).toSeq)
    val quant = Calibration.quantileBins(continuous, "s", bins = 50)
    assert(quant.select("s").distinct().count() <= 50)
    assert(quant.count() == n) // binning must not drop or collapse rows
  }

  test("binning preserves null and NaN scores instead of fabricating lo-bin rows") {
    // greatest() skips nulls and a non-ANSI NaN->int cast is 0, so the
    // bare expressions would silently move failed-comparator rows into
    // the bottom bin with their labels — isotonicTable's isNotNull
    // filter must still see them as null (NaN stays NaN: applyTable
    // documents NaN propagation, not masking)
    val rows = Seq((Some(0.37), 1.0), (None, 1.0), (Some(Double.NaN), 1.0),
      (Some(0.92), 0.0)).toDF("s", "y")
    for (binned <- Seq(
        Calibration.fixedWidthBins(rows, "s", bins = 10),
        Calibration.quantileBins(rows, "s", bins = 2))) {
      val out = binned.select("s").collect().map(r =>
        if (r.isNullAt(0)) "null"
        else if (r.getDouble(0).isNaN) "nan" else "num")
      assert(out.count(_ == "null") == 1 && out.count(_ == "nan") == 1 &&
        out.count(_ == "num") == 2)
    }
  }

  test("quantileBins equal-mass edges under skew; scores below min clamp up") {
    // 90% of mass at 0.99, the rest spread low: fixed-width would leave
    // most bins empty; quantile edges collapse on the heavy point
    val skewed = (Seq.fill(900)(0.99) ++ (1 to 100).map(_ / 1000.0))
      .toDF("s")
    val out = Calibration.quantileBins(skewed, "s", bins = 10)
    assert(out.count() == 1000)
    assert(out.select("s").distinct().count() <= 10)
    // the heavy point must be its own bin value (exact quantiles hit it)
    assert(out.filter(col("s") === 0.99).count() >= 900)
  }
}
