package graft

import org.apache.spark.sql.functions._
import graft.block.Blocking
import graft.model.PredicateSpec
import graft.pairs.PairGen

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def keysFor(p: PredicateSpec, value: String): Set[String] =
    Seq(value).toDF("f")
      .select(explode(Blocking.predicateKeys(p)).as("k"))
      .as[String].collect().toSet

  test("predicate key sets (F6, mirrors dedupe predicate tests†)") {
    assert(keysFor(PredicateSpec("token", "f"), "12 east main st") ==
      Set("12", "east", "main", "st"))
    assert(keysFor(PredicateSpec("whole", "f"), "foo bar") == Set("foo bar"))
    assert(keysFor(PredicateSpec("first_token", "f"), "foo bar") == Set("foo"))
    assert(keysFor(PredicateSpec("ngram", "f", n = 4), "abcde") == Set("abcd", "bcde"))
    assert(keysFor(PredicateSpec("prefix", "f", n = 3), "abcdef") == Set("abc"))
    assert(keysFor(PredicateSpec("acronym", "f"), "main east") == Set("em"))
    assert(keysFor(PredicateSpec("fingerprint", "f"), "b a b") == Set("ab"))
    assert(keysFor(PredicateSpec("shingle", "f", n = 2), "a b c") ==
      Set("a b", "b c"))
    assert(keysFor(PredicateSpec("integer", "f"), "call 555 ext 12") ==
      Set("555", "12"))
    assert(keysFor(PredicateSpec("exists", "f"), "x") == Set("1"))
    assert(keysFor(
      PredicateSpec("compound", "", sub = Seq(
        PredicateSpec("first_token", "f"), PredicateSpec("prefix", "f", n = 1))),
      "foo bar") == Set("foo:f"))
  }

  test("B10 numeric predicate family key sets") {
    assert(keysFor(PredicateSpec("first_integer", "f"), "12 east 34") == Set("12"))
    assert(keysFor(PredicateSpec("first_integer", "f"), "east 34") == Set())
    assert(keysFor(PredicateSpec("near_integer", "f"), "call 10") ==
      Set("9", "10", "11"))
    assert(keysFor(PredicateSpec("hundred_integer", "f"), "1234 and 56") ==
      Set("1200", "0"))
    assert(keysFor(PredicateSpec("order_of_magnitude", "f"), "950") == Set("3"))
    assert(keysFor(PredicateSpec("order_of_magnitude", "f"), "0") == Set())
    assert(keysFor(PredicateSpec("round_to_1", "f"), "1234") == Set("1000"))
    assert(keysFor(PredicateSpec("round_to_1", "f"), "0") == Set("0"))
  }

  test("B13 set predicates over array columns") {
    def setKeys(p: PredicateSpec, value: Seq[String]): Set[String] =
      Seq(Tuple1(value)).toDF("f")
        .select(explode(Blocking.predicateKeys(p)).as("k"))
        .as[String].collect().toSet
    val v = Seq("c", "a", "b", "a")
    assert(setKeys(PredicateSpec("whole_set", "f"), v) == Set("a b c"))
    assert(setKeys(PredicateSpec("common_set", "f"), v) == Set("a", "b", "c"))
    assert(setKeys(PredicateSpec("first_set_element", "f"), v) == Set("a"))
    assert(setKeys(PredicateSpec("last_set_element", "f"), v) == Set("c"))
    assert(setKeys(PredicateSpec("common_set_2", "f"), v) ==
      Set("a b", "a c", "b c"))
    assert(setKeys(PredicateSpec("common_set_3", "f"), Seq("d", "a", "c", "b")) ==
      Set("a b c", "a b d", "a c d", "b c d"))
    assert(setKeys(PredicateSpec("magnitude_cardinality", "f"),
      (1 to 95).map(_.toString)) == Set("2"))
  }

  test("B14 latLongGrid: cell key from f_lat/f_lon; null side → no key") {
    val df = Seq(
      (41.88, -87.63),   // Chicago → cell (4, -9) at 10°
      (41.01, -87.99),   // same cell
      (51.51, -0.13),    // London → (5, -1)
      (-33.87, 151.21)   // Sydney → (-4, 15): floor(-33.87/10) = -4
    ).toDF("loc_lat", "loc_lon")
    val keys = df.select(explode(
      Blocking.predicateKeys(PredicateSpec("latlong_grid", "loc", n = 10))).as("k"))
      .as[String].collect().toSeq
    assert(keys == Seq("4:-9", "4:-9", "5:-1", "-4:15"))
    val withNull = Seq((Some(41.88), Option.empty[Double]))
      .toDF("loc_lat", "loc_lon")
      .select(Blocking.predicateKeys(PredicateSpec("latlong_grid", "loc", n = 10)).as("ks"))
      .select(size(col("ks"))).as[Int].collect()
    assert(withNull(0) == 0)
  }

  test("simhash banding: identical text shares all bands, unrelated none") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq")).toDF("id", "f")
    val p = Seq(PredicateSpec("simhash", "f", bands = 4))
    val blocks = Blocking.blockingMap(df, p, "id")
    val pairs = PairGen.candidatePairs(blocks)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("blockingMap prefixes keys per predicate; no cross-predicate collision") {
    val df = Seq((1L, "x"), (2L, "x")).toDF("id", "f")
    val preds = Seq(PredicateSpec("whole", "f"), PredicateSpec("token", "f"))
    val keys = Blocking.blockingMap(df, preds, "id")
      .select("block_key").as[String].collect().toSet
    assert(keys == Set("0:x", "1:x"))
  }

  test("a null field nulls ONE predicate's keys, never the whole record") {
    // flatten() returns NULL when any element array is NULL — without the
    // per-predicate coalesce, a page with null text_norm lost its url
    // keys too and its duplicates became unfindable (review finding)
    import spark.implicits._
    val recs = Seq(
      (1L, null.asInstanceOf[String], "https://a/x"),
      (2L, null.asInstanceOf[String], "https://a/x"),
      (3L, "real text here", "https://b/y")).toDF("id", "text_norm", "url")
    val preds = Seq(PredicateSpec("token", "text_norm"), PredicateSpec("whole", "url"))
    val keys = Blocking.blockingMap(recs, preds, "id")
    // null-text records still carry their url key and still pair up
    assert(keys.filter(col("id") === 1).count() == 1)
    assert(keys.filter(col("block_key").isNull).count() == 0)
    val pairs = PairGen.candidatePairs(keys, 100)
    assert(pairs.select("id1", "id2").as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("simhash bands=1 keeps the full 64-bit key (shift-mod-64 mask guard)") {
    import spark.implicits._
    val recs = Seq((1L, "alpha beta gamma"), (2L, "totally different words here"))
      .toDF("id", "t")
    val keys = Blocking.blockingMap(recs, Seq(PredicateSpec("simhash", "t", bands = 1)), "id")
    // two unrelated texts must NOT share the single degenerate key 0
    assert(keys.select("block_key").distinct().count() == 2)
  }

  test("simhash_combo: pigeonhole guarantee — hashes within hamming k " +
      "share a key; random hashes share none (fuzz)") {
    val rnd = new scala.util.Random(7)
    // planted: flip <= 3 random bits
    val near = (1 to 200).map { _ =>
      val h = rnd.nextLong()
      val flips = rnd.shuffle((0 until 64).toList).take(1 + rnd.nextInt(3))
      (h, flips.foldLeft(h)((x, b) => x ^ (1L << b)))
    }
    // far: independent random hashes (expected hamming 32)
    val far = (1 to 200).map(_ => (rnd.nextLong(), rnd.nextLong()))
    def sharing(pairs: Seq[(Long, Long)]): Long =
      pairs.toDF("h1", "h2").select(
        arrays_overlap(
          array(Blocking.simhashComboKeys(col("h1"), 6, 3): _*),
          array(Blocking.simhashComboKeys(col("h2"), 6, 3): _*)).as("s"))
        .filter(col("s")).count()
    assert(sharing(near) == 200L,
      "every pair within hamming 3 must share a combo key (pigeonhole)")
    assert(sharing(far) == 0L,
      ">=31-bit keys: random hashes must essentially never collide")
    // C(6,3)=20 keys per hash, subset-prefixed
    val ks = keysFor(PredicateSpec("simhash_combo", "f", n = 3, bands = 6),
      "some web page text about spark")
    assert(ks.size == 20 && ks.map(_.takeWhile(_ != '#')).size == 20)
    // the case-class default bands=4 must floor to 2k=6 blocks — b=4,k=3
    // would degenerate to four single 16-bit blocks (plain banding)
    val ksDefault = keysFor(PredicateSpec("simhash_combo", "f"),
      "some web page text about spark")
    assert(ksDefault == ks,
      "default spec must use the 2k-block combo construction, not plain bands")
    // null field → null keys, never degenerate shared buckets: a batch of
    // null-field records must emit ZERO non-null combo keys
    val nullKeys = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "f")
      .select(explode(Blocking.predicateKeys(
        PredicateSpec("simhash_combo", "f", n = 3, bands = 6))).as("k"))
      .filter(col("k").isNotNull)
    assert(nullKeys.isEmpty,
      "null-field records must not share combo blocking keys")
  }

  test("pair-gen: plural filter, ordering, dedup, cap") {
    val blocks = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), // block of 3 → 3 pairs
      (1L, "b"), (2L, "b"), // shares pair (1,2) → must not duplicate
      (9L, "solo"), // singleton → nothing
      (10L, "big"), (11L, "big"), (12L, "big"), (13L, "big") // capped at 3
    ).toDF("id", "block_key")
    val pairs = PairGen.candidatePairs(blocks, maxBlockSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val m = PairGen.blockMetrics(blocks, maxBlockSize = 3)
    assert(m.totalKeys == 4 && m.pluralKeys == 3 && m.cappedKeys == 1
      && m.droppedRows == 4 && m.maxBlockSize == 4)
  }

  test("attachFields prunes to requested columns") {
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val recs = Seq((1L, "a", "junk1"), (2L, "b", "junk2")).toDF("id", "name", "junk")
    val got = PairGen.attachFields(pairs, recs, "id", Seq("name"))
    assert(got.columns.toSet == Set("id1", "id2", "name_1", "name_2"))
    val r = got.collect()(0)
    assert(r.getAs[String]("name_1") == "a" && r.getAs[String]("name_2") == "b")
  }
}
