package graft

import org.apache.spark.sql.functions._
import graft.textops.Mixing

/** Temperature-based source mixing (textops/Mixing). */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: 800 / 150 / 50 rows
  private def corpus = spark.range(1000).toDF("id")
    .select(col("id"),
      when(col("id") < 800, lit("big"))
        .when(col("id") < 950, lit("mid"))
        .otherwise(lit("rare")).as("src"))

  test("alpha=0.5 flattens: rare sources keep a higher rate") {
    val kept = Mixing.temperatureMix(corpus, "id", "src", targetRows = 300L)
    val rates = kept.groupBy("src").agg(first("keep_rate").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("rare") > rates("mid") && rates("mid") > rates("big"))
    // binomial sanity: total lands near the target (±5 sigma ~ ±60)
    val n = kept.count()
    assert(math.abs(n - 300L) < 80, s"kept $n, wanted ~300")
    // flattening: rare's share of the MIX exceeds its raw 5% share
    val rareShare = kept.filter(col("src") === "rare").count().toDouble / n
    assert(rareShare > 0.05, s"rare share $rareShare not flattened up")
  }

  test("alpha=1 is proportional: identical keep rate everywhere") {
    val rates = Mixing.temperatureMix(corpus, "id", "src",
        targetRows = 300L, alpha = 1.0)
      .select("keep_rate").distinct().as[Double].collect()
    assert(rates.length == 1 && math.abs(rates(0) - 0.3) < 1e-6)
  }

  test("selection is deterministic and a subset of the corpus") {
    val a = Mixing.temperatureMix(corpus, "id", "src", 300L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Mixing.temperatureMix(corpus, "id", "src", 300L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.toSet.subsetOf((0L until 1000L).toSet))
  }

  test("null sources are excluded from the mix AND the quota math") {
    // 500 attributed + 500 null-source rows: the nulls must not depress
    // the attributed quota (rate would halve if they were counted)
    val withNulls = spark.range(1000).toDF("id")
      .select(col("id"), when(col("id") < 500, lit("a")).as("src"))
    val kept = Mixing.temperatureMix(withNulls, "id", "src", targetRows = 400L)
    assert(kept.filter(col("src").isNull).count() == 0)
    val rate = kept.select("keep_rate").distinct().as[Double].collect()
    assert(rate.length == 1 && math.abs(rate(0) - 0.8) < 1e-6,
      s"quota depressed by null group: ${rate.toSeq}")
  }

  test("sampleKey: in range, spread across the modulus, negative-safe") {
    val keys = spark.range(-500, 500).toDF("id")
      .select(Mixing.sampleKey(col("id")).as("k")).as[Long].collect()
    assert(keys.forall(k => k >= 0 && k < Mixing.KeyMod))
    // two-step mixing must wrap: keys from 1000 sequential ids should
    // span most of [0, M) rather than huddle near 0 (the one-step bug)
    assert(keys.max > Mixing.KeyMod / 2, s"max key ${keys.max} not mixed")
    assert(keys.distinct.length == keys.length, "collision on tiny input")
  }
}
