package graft

import org.apache.spark.sql.functions._
import graft.expr.QuantileKey
import graft.stats.Quantiles

/** Exact distributed order statistics (stats/Quantiles) + the
  * order-preserving double key (expr.QuantileKey). */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("QuantileKey is an order isomorphism and decode inverts encode") {
    val rnd = new scala.util.Random(7)
    val xs = (Seq(0.0, -0.0, 1.0, -1.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
      Double.PositiveInfinity, Double.NegativeInfinity) ++
      Seq.fill(500)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(20) - 10)))
    for (x <- xs) {
      val u = QuantileKey.rawEncode(x)
      // bit-exact round trip (including -0.0 and infinities)
      assert(java.lang.Double.doubleToRawLongBits(QuantileKey.decode(u)) ==
        java.lang.Double.doubleToRawLongBits(x))
    }
    val sortedByKey = xs.sortBy(x => QuantileKey.rawEncode(x) ^ Long.MinValue)
    assert(sortedByKey.map(x => if (x == 0.0) 0.0 else x) ==
      xs.sorted.map(x => if (x == 0.0) 0.0 else x))
    assert(QuantileKey.encode(Double.NaN) == null)
  }

  test("kthSmallest matches a local sort on adversarial doubles") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(2000)(rnd.nextGaussian() * math.pow(10,
      rnd.nextInt(12) - 6)) ++
      Seq.fill(50)(3.25) ++ Seq(-1e300, 1e300, 0.0) // heavy duplicates + extremes
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(13)
    val sorted = vals.sorted
    val ks = Seq(1L, 2L, 777L, 1025L, 1026L, vals.size.toLong)
    val got = Quantiles.kthSmallest(df, "v", ks)
    for (k <- ks) assert(got(k) == sorted((k - 1).toInt), s"rank $k")
  }

  test("quantilesDisc ranks by ceil(q*n) and ignores null/NaN rows") {
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) ++
      Seq((200L, None), (201L, Some(Double.NaN))))
      .toDF("id", "v").repartition(5)
    val out = Quantiles.quantilesDisc(df, "v", Seq(0.01, 0.33, 0.66, 1.0))
      .orderBy("q").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 33L, 66L, 100L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 33.0, 66.0, 100.0))
  }

  test("per-group quantiles match a local per-group sort, across chunk sizes") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 9).flatMap { g =>
      // ragged group sizes incl. a singleton group
      Seq.fill(if (g == 9) 1 else g * 37)((s"g$g", rnd.nextGaussian() * g))
    }
    val df = rows.toDF("grp", "v").repartition(11)
    val qs = Seq(0.33, 0.66, 1.0)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      qs.map { q =>
        val k = math.ceil(q * sorted.size).toLong.max(1L)
        (g, q, k, sorted((k - 1).toInt))
      }
    }.sortBy(t => (t._1, t._2))
    for (chunk <- Seq(2, 64)) {
      val got = Quantiles.quantilesDiscByGroup(df, "grp", "v", qs, groupChunk = chunk)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(got == expected, s"chunk $chunk")
    }
  }

  test("weighted quantiles match a local cumulative-weight walk") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(800)((rnd.nextInt(11).toDouble / 100.0, // heavy ties
      (rnd.nextInt(50) + 1).toLong)) ++
      Seq((0.5, 3L), (-0.3, 1L), (0.07, 0L)) // extremes + zero-weight row
    val df = rows.toDF("v", "w").repartition(9)
    val valid = rows.filter(_._2 > 0L).sortBy(_._1)
    val tw = valid.map(_._2).sum
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val expected = qs.map { q =>
      val k = math.ceil(q * tw).toLong.max(1L)
      var cum = 0L
      val x = valid.find { case (_, w) => cum += w; cum >= k }.get._1
      (q, k, x)
    }
    val got = Quantiles.weightedQuantilesDisc(df, "v", "w", qs)
      .orderBy("q").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("results are partitioning-invariant") {
    val vals = (1 to 500).map(i => (i % 37).toDouble * 1.5 - 20)
    val df1 = vals.zipWithIndex.map(_.swap).toDF("id", "v").repartition(1)
    val df2 = vals.zipWithIndex.map(_.swap).toDF("id", "v").repartition(17)
    val qs = Seq(0.1, 0.5, 0.9)
    assert(Quantiles.quantilesDisc(df1, "v", qs).collect().toSeq ==
      Quantiles.quantilesDisc(df2, "v", qs).collect().toSeq)
  }
}
