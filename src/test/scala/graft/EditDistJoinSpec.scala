package graft

import graft.pairs.EditDistJoin

class EditDistJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int) =
    (for ((i, a) <- rows; (j, b) <- rows if i < j; d = lev(a, b) if d <= k)
      yield (i, j, d.toLong)).toSet

  private def run(rows: Seq[(Long, String)], k: Int, q: Int = 2) =
    EditDistJoin.selfJoin(rows.toDF("id", "s"), k, q)
      .as[(Long, Long, Long)].collect().toSet

  test("selfJoin equals brute force on a mixed corpus (k=1,2; q=2,3)") {
    val rows: Seq[(Long, String)] = Seq(
      1L -> "red widget", 2L -> "red widgets", 3L -> "rad widget",
      4L -> "blue bolt", 5L -> "blue belt", 6L -> "glue belt",
      7L -> "completely different", 8L -> "red widget")
    for (k <- Seq(1, 2); q <- Seq(2, 3))
      assert(run(rows, k, q) == brute(rows, k), s"k=$k q=$q")
  }

  test("short strings (fewer grams than k*q) are not lost") {
    // with k=2, q=2 every string here has <= 4 distinct 2-grams, so the
    // prefix theorem is vacuous and only the short-record path finds them
    val rows: Seq[(Long, String)] = Seq(
      1L -> "ab", 2L -> "cd", 3L -> "ad", 4L -> "a", 5L -> "", 6L -> "abc")
    for (k <- Seq(1, 2))
      assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("short-vs-long boundary pairs survive") {
    // "abcd" (3 grams > k*q for k=1,q=2... ng=3 > 2) long; "abc" short
    val rows: Seq[(Long, String)] = Seq(
      1L -> "abc", 2L -> "abcd", 3L -> "abcde", 4L -> "zzzz")
    assert(run(rows, 1) == brute(rows, 1))
  }

  test("k=0 returns exactly the identical-string pairs") {
    val rows: Seq[(Long, String)] =
      Seq(1L -> "same", 2L -> "same", 3L -> "not")
    assert(run(rows, 0) == Set((1L, 2L, 0L)))
  }

  test("randomized fuzz vs brute force") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val rows = (1L to 60L).map { i =>
      i -> (0 until (rnd.nextInt(8) + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (k <- Seq(1, 2))
      assert(run(rows, k) == brute(rows, k), s"k=$k")
  }
}
