package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Sim

/** Kernel spot-values mirror dedupe's predicate/comparator unit tests†
  * (SURVEY.md §5.1, FIXTURES.md F6) plus DuckDB-parity values verified
  * against DuckDB 1.0 (the driver's oracle engine). Property checks use
  * seeded random strings (scalatestplus isn't in the offline cache). */
class SimSpec extends AnyFunSuite {

  private def randStrings(n: Int, maxLen: Int, seed: Long): Seq[String] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.alphanumeric.take(r.nextInt(maxLen + 1)).mkString)
  }

  test("jaro-winkler spot values (DuckDB 1.0 parity)") {
    assert(math.abs(Sim.jaroWinkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(Sim.jaroWinkler("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    // below the 0.7 boost threshold: JW == Jaro despite 4-char common prefix
    assert(math.abs(Sim.jaroWinkler("abcdxxxxxxxxxx", "abcdyyyyyyyyyy")
      - 0.5238095238095238) < 1e-12)
    assert(Sim.jaroWinkler("a", "") == 0.0)
    assert(Sim.jaroWinkler("", "") == 0.0) // DuckDB convention
    assert(Sim.jaroWinkler("same", "same") == 1.0)
    // exclusive-window convention probes (all verified vs DuckDB 1.0)
    assert(math.abs(Sim.jaro("red widget", "new widget") - 0.8250000000000001) < 1e-12)
    assert(math.abs(Sim.jaro("abcd", "badc") - 0.8333333333333334) < 1e-12)
    assert(math.abs(Sim.jaro("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
    assert(math.abs(Sim.jaro("DIXON", "DICKSONX") - 0.7666666666666666) < 1e-12)
    assert(math.abs(Sim.jaro("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(Sim.jaro("ab", "ba") == 0.0)
    assert(math.abs(Sim.jaro("aaa bbb", "bbb aaa") - 0.5079365079365079) < 1e-12)
  }

  test("jaro-winkler properties: range + symmetry + identity") {
    val ss = randStrings(200, 12, seed = 7)
    for (a <- ss.take(40); b <- ss.take(40)) {
      val x = Sim.jaroWinkler(a, b)
      assert(x >= 0.0 && x <= 1.0, s"range: '$a' '$b' -> $x")
      assert(x == Sim.jaroWinkler(b, a), s"symmetry: '$a' '$b'")
    }
    for (a <- ss if a.nonEmpty) assert(Sim.jaroWinkler(a, a) == 1.0)
  }

  test("levenshtein spot values + properties") {
    assert(Sim.levenshtein("kitten", "sitting") == 3)
    assert(Sim.levenshtein("", "abc") == 3)
    assert(Sim.levenshtein("abc", "abc") == 0)
    val ss = randStrings(60, 10, seed = 11)
    for (a <- ss; b <- ss.take(20)) {
      assert(Sim.levenshtein(a, b) == Sim.levenshtein(b, a))
      assert(Sim.levenshtein(a, b) <= math.max(a.length, b.length))
    }
  }

  test("bit-parallel levenshtein == classic DP (single-word + blocked + unicode)") {
    def dp(s: String, t: String): Int = {
      val n = s.length; val m = t.length
      val prev = Array.tabulate(m + 1)(identity)
      val cur = new Array[Int](m + 1)
      for (i <- 1 to n) {
        cur(0) = i
        for (j <- 1 to m) {
          val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        }
        Array.copy(cur, 0, prev, 0, m + 1)
      }
      prev(m)
    }
    val r = new scala.util.Random(23)
    val alphabets = Seq("ab", "abcde", "abcdefghij klmnop", "日本語テキストと漢字", "aé日b ")
    for (trial <- 1 to 400) {
      val alpha = alphabets(trial % alphabets.size)
      // lengths straddle every dispatch boundary: ≤12 scalar, ≤64
      // single-word Myers, >64 blocked (incl. exact multiples of 64)
      def rnd(): String = {
        val len = Seq(0, 5, 12, 13, 31, 63, 64, 65, 128, 129, 200, 300)(r.nextInt(12)) +
          r.nextInt(4)
        (1 to len).map(_ => alpha.charAt(r.nextInt(alpha.length))).mkString
      }
      val a = rnd(); val b = rnd()
      assert(Sim.levenshtein(a, b) == dp(a, b),
        s"mismatch len=(${a.length},${b.length}) alpha='$alpha'")
    }
    // near-identical long strings (the hot dedupe case)
    val base = (1 to 500).map(_ => "abcdefgh"(r.nextInt(8))).mkString
    val mutated = base.updated(100, 'z').updated(400, 'q') + "tail"
    assert(Sim.levenshtein(base, mutated) == dp(base, mutated))
  }

  test("O(n+m) ascii jaro matcher == classic windowed scan (long strings)") {
    // reference: the classic greedy O(n·window) matcher
    def classicJaro(s: String, t: String): Double = {
      val n = s.length; val m = t.length
      if (n == 0 || m == 0) return 0.0
      if (s == t) return 1.0
      val window = math.max(0, math.max(n, m) / 2 - 1)
      val sm = new Array[Boolean](n); val tm = new Array[Boolean](m)
      var matches = 0
      for (i <- 0 until n) {
        val lo = math.max(0, i - window); val hi = math.min(m - 1, i + window)
        var j = lo; var done = false
        while (j <= hi && !done) {
          if (!tm(j) && s.charAt(i) == t.charAt(j)) {
            sm(i) = true; tm(j) = true; matches += 1; done = true
          }
          j += 1
        }
      }
      if (matches == 0) return 0.0
      var transpositions = 0; var k = 0
      for (i <- 0 until n) if (sm(i)) {
        while (!tm(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      val mm = matches.toDouble
      (mm / n + mm / m + (mm - (transpositions / 2)) / mm) / 3.0
    }
    val r = new scala.util.Random(41)
    val alphas = Seq("ab", "abcdefgh", "abcdefghijklmnop qrstuvwxyz0123456789")
    for (trial <- 1 to 300) {
      val alpha = alphas(trial % alphas.size)
      def rnd(minLen: Int, maxLen: Int) = {
        val len = minLen + r.nextInt(maxLen - minLen + 1)
        (1 to len).map(_ => alpha.charAt(r.nextInt(alpha.length))).mkString
      }
      // straddle the >64 dispatch boundary; include near-identical pairs
      val a = rnd(50, 300)
      val b = if (trial % 3 == 0) a.updated(a.length / 2, 'z') + "xy"
              else rnd(50, 300)
      assert(Sim.jaro(a, b) == classicJaro(a, b),
        s"len=(${a.length},${b.length}) alpha='$alpha'")
    }
    // non-ascii falls back to the classic path — still equal
    val u1 = "日本語テキスト" * 20; val u2 = "日本語テキヌト" * 20
    assert(Sim.jaro(u1, u2) == classicJaro(u1, u2))
  }

  test("char n-grams (F6)") {
    assert(Sim.charNGrams("abcde", 4).toSeq == Seq("abcd", "bcde"))
    assert(Sim.charNGrams("abc", 4).isEmpty)
    assert(Sim.charNGrams("abcd", 4).toSeq == Seq("abcd"))
  }

  test("token shingles") {
    assert(Sim.tokenShingles(Array("a", "b", "c"), 2).toSeq == Seq("a b", "b c"))
    assert(Sim.tokenShingles(Array("a"), 2).isEmpty)
  }

  test("suffixes") {
    assert(Sim.suffixes("abcdef", 3, 10).toSeq ==
      Seq("abcdef", "bcdef", "cdef", "def"))
    assert(Sim.suffixes("ab", 3, 10).isEmpty)
    assert(Sim.suffixes("abcdef", 3, 2).toSeq == Seq("abcdef", "bcdef"))
  }

  test("simhash: identical inputs agree, near inputs near") {
    val a = "the quick brown fox jumps over the lazy dog".split(" ")
    val b = "the quick brown fox jumps over the lazy cat".split(" ")
    val c = "completely different words entirely unrelated text".split(" ")
    assert(Sim.simhash64(a) == Sim.simhash64(a.clone()))
    val near = Sim.hamming64(Sim.simhash64(a), Sim.simhash64(b))
    val far = Sim.hamming64(Sim.simhash64(a), Sim.simhash64(c))
    assert(near < far)
    assert(Sim.simhash64(Array.empty[String]) == 0L)
  }

  test("minhash: containment raises agreement; order-invariant") {
    val a = (1 to 50).map(i => s"tok$i").toArray
    val b = (1 to 45).map(i => s"tok$i").toArray ++ Array("x1", "x2", "x3", "x4", "x5")
    val c = (100 to 150).map(i => s"tok$i").toArray
    val (sa, sb, sc) = (Sim.minhash(a, 64), Sim.minhash(b, 64), Sim.minhash(c, 64))
    def agree(x: Array[Long], y: Array[Long]) = x.zip(y).count(p => p._1 == p._2)
    assert(agree(sa, sb) > agree(sa, sc))
    assert(agree(sa, Sim.minhash(a.reverse, 64)) == 64)
  }

  test("preProcess: nfkc, lowercase, whitespace collapse, empty→null") {
    assert(Sim.preProcess("  Foo   BAR \t baz ") == "foo bar baz")
    assert(Sim.preProcess("") == null)
    assert(Sim.preProcess("   ") == null)
    assert(Sim.preProcess(null) == null)
    assert(Sim.preProcess("ＡＢ") == "ab") // fullwidth AB → ab (NFKC)
  }

  test("ngramJaccard: packed fast path == hash-set general path") {
    val r = new scala.util.Random(17)
    def rnd(maxLen: Int) = r.alphanumeric.take(r.nextInt(maxLen)).mkString
    def slow(a: String, b: String, n: Int): Double = {
      val sa = (0 to a.length - n).map(i => a.substring(i, i + n)).toSet
      val sb = (0 to b.length - n).map(i => b.substring(i, i + n)).toSet
      if (sa.isEmpty && sb.isEmpty) 1.0
      else sa.intersect(sb).size.toDouble / (sa.size + sb.size - sa.intersect(sb).size)
    }
    for (_ <- 1 to 300; n <- Seq(1, 2, 3, 4)) {
      // lengths straddle the 132-char fast-path boundary
      val a = rnd(150); val b = rnd(150)
      assert(Sim.ngramJaccard(a, b, n) == slow(a, b, n), s"'$a' '$b' n=$n")
    }
    // n=5 uses the general path
    assert(Sim.ngramJaccard("abcdef", "abcdef", 5) == 1.0)
  }

  test("doc fingerprint deterministic") {
    val t = "some reasonably long text for fingerprinting windows"
    assert(Sim.docFingerprint(t, 16) == Sim.docFingerprint(t, 16))
    assert(Sim.docFingerprint(t, 16) != Sim.docFingerprint(t + " changed early? no", 64))
  }

  test("mapDot: two-cursor merge == brute-force dot, sorted AND unsorted " +
      "(unsorted exercises the quadratic fallback)") {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    def mapOf(entries: Seq[(String, Double)]) =
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
        new GenericArrayData(entries.map(e => java.lang.Double.valueOf(e._2)).toArray[Any]))
    def brute(a: Seq[(String, Double)], b: Seq[(String, Double)]): Double = {
      val bm = b.toMap
      a.iterator.map { case (k, v) => v * bm.getOrElse(k, 0.0) }.sum
    }
    val r = new scala.util.Random(13)
    for (trial <- 1 to 300) {
      val vocab = Seq.tabulate(30)(i => s"t${r.alphanumeric.take(1 + r.nextInt(6)).mkString}$i")
      def vec() = r.shuffle(vocab).take(1 + r.nextInt(20))
        .map(k => k -> (0.01 + r.nextDouble()))
      val a = vec(); val b = vec()
      val sortedGot = graft.expr.ExprKernels2.mapDot(
        mapOf(a.sortBy(_._1)), mapOf(b.sortBy(_._1)))
      assert(math.abs(sortedGot - brute(a, b)) < 1e-12, s"sorted trial $trial")
      val unsortedGot = graft.expr.ExprKernels2.mapDot(mapOf(a), mapOf(b))
      assert(math.abs(unsortedGot - brute(a, b)) < 1e-12, s"unsorted trial $trial")
    }
    // empty / disjoint edges
    assert(graft.expr.ExprKernels2.mapDot(mapOf(Nil), mapOf(Seq("a" -> 1.0))) == 0.0)
    assert(graft.expr.ExprKernels2.mapDot(
      mapOf(Seq("a" -> 2.0)), mapOf(Seq("b" -> 3.0))) == 0.0)
  }

  test("damerau-levenshtein: spot values (DuckDB parity) + variant " +
      "discrimination") {
    // the published case separating unrestricted DL from restricted OSA:
    // ca → ac → abc is 2 edits iff edits may follow a transposition
    assert(Sim.damerau("ca", "abc") == 2) // OSA would say 3
    assert(Sim.damerau("abcd", "acbd") == 1) // one adjacent transposition
    assert(Sim.damerau("ab", "ba") == 1)
    assert(Sim.damerau("kitten", "sitting") == 3) // no transpositions → == lev
    assert(Sim.damerau("", "abc") == 3)
    assert(Sim.damerau("abc", "") == 3)
    assert(Sim.damerau("", "") == 0)
    assert(Sim.damerau("same", "same") == 0)
  }

  test("damerau-levenshtein: fuzz vs independent clean-room DP") {
    // independent reference: textbook Lowrance-Wagner with a fresh 2-D
    // matrix and a HashMap last-occurrence table per call — shares no
    // code with the scratch-buffer kernel
    def ref(a: String, b: String): Int = {
      val n = a.length; val m = b.length
      val inf = n + m
      val d = Array.fill(n + 2, m + 2)(0)
      val da = scala.collection.mutable.HashMap.empty[Char, Int]
      d(0)(0) = inf
      for (i <- 0 to n) { d(i + 1)(0) = inf; d(i + 1)(1) = i }
      for (j <- 0 to m) { d(0)(j + 1) = inf; d(1)(j + 1) = j }
      for (i <- 1 to n) {
        var db = 0
        for (j <- 1 to m) {
          val k = da.getOrElse(b(j - 1), 0)
          val l = db
          val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
          d(i + 1)(j + 1) = Seq(
            d(i)(j) + cost, d(i + 1)(j) + 1, d(i)(j + 1) + 1,
            d(k)(l) + (i - k - 1) + 1 + (j - l - 1)).min
        }
        da(a(i - 1)) = i
      }
      d(n + 1)(m + 1)
    }
    val r = new scala.util.Random(29)
    // small alphabet → dense repeats and transposition opportunities
    def rs(): String = Seq.fill(r.nextInt(12))(('a' + r.nextInt(4)).toChar).mkString
    for (trial <- 1 to 2000) {
      val a = rs(); val b = rs()
      val got = Sim.damerau(a, b)
      assert(got == ref(a, b), s"trial $trial: '$a' vs '$b'")
      assert(got == Sim.damerau(b, a), s"symmetry trial $trial")
      assert(got <= Sim.levenshtein(a, b), s"DL <= Lev trial $trial")
    }
    // wider alphabet incl. a non-ASCII char exercises the stamp table
    def rs2(): String = Seq.fill(r.nextInt(20))(
      if (r.nextInt(10) == 0) 'é' else ('a' + r.nextInt(26)).toChar).mkString
    for (trial <- 1 to 500) {
      val a = rs2(); val b = rs2()
      assert(Sim.damerau(a, b) == ref(a, b), s"wide trial $trial: '$a' '$b'")
    }
  }

  test("smith-waterman: spot values, bounds, fuzz vs full-matrix reference") {
    // raw local score: best pair of substrings, +2 match / -1 mismatch+gap
    assert(Sim.smithWaterman("abc", "abc") == 1.0)
    assert(Sim.smithWaterman("aa", "aaaa") == 1.0)   // substring → perfect
    assert(Sim.smithWaterman("abc", "xbz") == 2.0 / 6)
    assert(Sim.smithWaterman("a", "b") == 0.0)
    assert(Sim.smithWaterman("", "abc") == 0.0)
    // the embedded-name case: local alignment ignores the flanks
    assert(Sim.smithWaterman("j smith", "dr j smith jr esq") == 1.0)
    // full-matrix reference (no rolling rows) for the fuzz
    def ref(a: String, b: String): Int = {
      val h = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length) {
        h(i)(j) = Seq(0,
          h(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 2 else -1),
          h(i - 1)(j) - 1, h(i)(j - 1) - 1).max
        best = math.max(best, h(i)(j))
      }
      best
    }
    val r = new scala.util.Random(31)
    def rs(): String = Seq.fill(r.nextInt(15))(('a' + r.nextInt(4)).toChar).mkString
    for (trial <- 1 to 2000) {
      val a = rs(); val b = rs()
      if (a.nonEmpty && b.nonEmpty) {
        val got = Sim.smithWatermanChars(a.toCharArray, a.length, b.toCharArray, b.length)
        assert(got == ref(a, b), s"trial $trial: '$a' vs '$b'")
        val sim = Sim.smithWaterman(a, b)
        assert(sim == Sim.smithWaterman(b, a), s"symmetry trial $trial")
        assert(sim >= 0.0 && sim <= 1.0, s"bounds trial $trial")
      }
    }
  }
}
