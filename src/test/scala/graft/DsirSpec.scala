package graft

import org.apache.spark.sql.functions._
import graft.textops.Dsir

/** Hand-checked DSIR importance weights (textops/Dsir). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target corpus: one doc "a b" → census {a:1, b:1, "a b":1}, T = 3
  // raw corpus: "a b" + "x y"  → census {a,b,"a b",x,y,"x y" : 1}, R = 6
  // union vocabulary V = 6
  private def target = Seq((1L, "a b")).toDF("id", "text")
  private def raw = Seq((1L, "a b"), (2L, "x y")).toDF("id", "text")

  private def lp(cnt: Double, tot: Double, v: Long): Long =
    BigDecimal(math.log((cnt + 0.1) / (tot + 0.1 * v)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("log-ratio weights match hand-computed Laplace probabilities") {
    val model = Dsir.fit(target, raw, "id", "text")
    val w = model.weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.size == 6)
    // shared gram: both counts 1
    val shared = lp(1, 3, 6) - lp(1, 6, 6)
    assert(w("a") == shared && w("b") == shared && w("a b") == shared)
    // raw-only gram: target count 0
    val rawOnly = lp(0, 3, 6) - lp(1, 6, 6)
    assert(w("x") == rawOnly && w("y") == rawOnly && w("x y") == rawOnly)
    assert(shared > 0 && rawOnly < 0)
  }

  test("document scores are exact integer sums; selection prefers target-like docs") {
    val model = Dsir.fit(target, raw, "id", "text")
    val scored = Dsir.score(raw, "id", "text", model)
    val rows = scored.orderBy("id").collect()
    val shared = lp(1, 3, 6) - lp(1, 6, 6)
    val rawOnly = lp(0, 3, 6) - lp(1, 6, 6)
    assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 3 * shared)
    assert(rows(1).getLong(1) == 3L && rows(1).getLong(2) == 3 * rawOnly)
    val picked = Dsir.selectTopK(scored, "id", 1).select("id").as[Long].head()
    assert(picked == 1L)
  }

  test("grams unseen by BOTH corpora take the unseen weight") {
    val model = Dsir.fit(target, raw, "id", "text")
    val out = Dsir.score(Seq((9L, "q")).toDF("id", "text"), "id", "text", model)
      .collect().head
    assert(out.getLong(2) == lp(0, 3, 6) - lp(0, 6, 6))
  }

  test("docs with no tokens keep their row with NULL metrics") {
    val model = Dsir.fit(target, raw, "id", "text")
    val out = Dsir.score(Seq((7L, "a b"), (8L, "...")).toDF("id", "text"),
        "id", "text", model)
      .orderBy("id").collect()
    assert(out.length == 2 && !out(0).isNullAt(2) && out(1).isNullAt(2))
  }

  test("hashed-bucket estimator agrees with raw grams on a collision-free fixture") {
    val plain = Dsir.score(raw, "id", "text",
      Dsir.fit(target, raw, "id", "text"))
    val hashed = Dsir.score(raw, "id", "text",
      Dsir.fit(target, raw, "id", "text", bits = Some(16)))
    assert(plain.orderBy("id").collect().toSeq ==
      hashed.orderBy("id").collect().toSeq)
  }

  test("scores are partitioning-invariant (exact integer summation)") {
    val model = Dsir.fit(target, raw, "id", "text")
    val a = Dsir.score(raw.repartition(1), "id", "text", model)
      .orderBy("id").collect().toSeq
    val b = Dsir.score(raw.repartition(7), "id", "text", model)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
