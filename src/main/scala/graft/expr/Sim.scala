package graft.expr

/**
 * Pure, allocation-conscious similarity / hashing kernels.
 *
 * These are plain static methods so that both the interpreted path
 * (`nullSafeEval`) and the whole-stage-codegen path (`doGenCode` emits a
 * static call) of the Catalyst expressions in [[Exprs]] execute the exact
 * same code. Keeping the kernel out of the Expression class keeps the
 * generated code tiny (one `invokestatic`) and the codegen span unbroken.
 *
 * Semantics notes (reference: fgregg/dedupe-api — see SURVEY.md §0 for the
 * citation legend; the mount is empty so loci are public-knowledge†):
 *  - Jaro-Winkler replaces the reference's affine-gap comparator
 *    (`affinegap†`, SURVEY.md §2.5 C1) per the north rule (BASELINE.json:6).
 *    The variant implemented here matches DuckDB/rapidfuzz: prefix boost
 *    (p=0.1, max 4 chars) applied only when jaro > 0.7, and
 *    sim(s, "") == sim("", "") == 0.0 — verified empirically against
 *    DuckDB 1.0 so the driver's oracle hash-compare agrees bit-for-bit.
 *  - simhash64 is the scale substitute for the reference's TF-IDF canopy
 *    index predicates (`dedupe:index/tfidf†`, SURVEY.md §2.3 B15).
 */
/**
 * Shared per-thread char buffers: every pairwise comparator call converts
 * its two inputs into these (String.getChars / ASCII byte copy — NO
 * String/char[] allocation on the hot path). The scoring stage runs the
 * kernels 10^7-10^8 times per pass; the per-call `UTF8String.toString`
 * conversions were ~560M allocations/pass, and the resulting GC ran "for
 * free" on idle cores at local[8] while competing with the workers at
 * local[32] — a direct scaling-efficiency tax.
 */
private[expr] object CharScratch {
  private val tlA = new ThreadLocal[Array[Char]] {
    override def initialValue(): Array[Char] = new Array[Char](256)
  }
  private val tlB = new ThreadLocal[Array[Char]] {
    override def initialValue(): Array[Char] = new Array[Char](256)
  }
  def bufA(min: Int): Array[Char] = grow(tlA, min)
  def bufB(min: Int): Array[Char] = grow(tlB, min)
  private def grow(tl: ThreadLocal[Array[Char]], min: Int): Array[Char] = {
    var b = tl.get()
    if (b.length < min) { b = new Array[Char](math.max(2 * min, 256)); tl.set(b) }
    b
  }
  def fillA(s: String): Array[Char] = {
    val b = bufA(s.length); s.getChars(0, s.length, b, 0); b
  }
  def fillB(s: String): Array[Char] = {
    val b = bufB(s.length); s.getChars(0, s.length, b, 0); b
  }
}

object Sim {

  // per-thread scratch: the pairwise kernels run 10^7-10^8 times per stage;
  // per-call array allocation is pure GC pressure (measured: a 47M-pair
  // scoring stage spent most of its time in GC before this)
  private val boolScratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](256)
  }
  private def boolBuf(n: Int): Array[Boolean] = {
    var buf = boolScratch.get()
    if (buf.length < n) {
      buf = new Array[Boolean](math.max(2 * n, 256))
      boolScratch.set(buf)
    } else {
      java.util.Arrays.fill(buf, 0, n, false)
    }
    buf
  }

  // per-char position-cursor scratch for the O(n+m) Jaro matcher
  private val jaroCnt = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](129)
  }
  private val jaroCur = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](129)
  }
  private val jaroPos = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }

  private def isAscii(s: Array[Char], n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (s(i) >= 128) return false
      i += 1
    }
    true
  }

  private def eqChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Boolean = {
    if (n != m) return false
    var i = 0
    while (i < n) {
      if (s(i) != t(i)) return false
      i += 1
    }
    true
  }

  /**
   * Jaro match phase in O(n+m) for ASCII inputs: per-character sorted
   * position lists with forward-only cursors. EXACTLY the classic greedy
   * semantics — for each i, take the leftmost UNMATCHED j in
   * [i-window, i+window] with s(i)==t(j):
   * positions before a char's cursor are consumed or permanently below
   * every future window (lo is non-decreasing in i), so the cursor's
   * position IS the leftmost available candidate. The classic scan is
   * O(n·window) — ~2M char-ops per pair on multi-KB crawl texts, the
   * dominant cost of the page-dedupe pipeline before this.
   * Sets match flags in `buf` (s at [0,n), t at [n,n+m)); returns matches.
   */
  private def jaroMatchAscii(s: Array[Char], n: Int, t: Array[Char], m: Int,
      window: Int, buf: Array[Boolean]): Int = {
    val cnt = jaroCnt.get()
    val cur = jaroCur.get()
    java.util.Arrays.fill(cnt, 0, 129, 0)
    var j = 0
    while (j < m) { cnt(t(j) + 1) += 1; j += 1 }
    var c = 1
    while (c < 129) { cnt(c) += cnt(c - 1); c += 1 } // cnt(c) = end offset of char c-1... cumulative
    var pos = jaroPos.get()
    if (pos.length < m) { pos = new Array[Int](2 * m); jaroPos.set(pos) }
    System.arraycopy(cnt, 0, cur, 0, 129) // fill cursors: cur(c) = start of char c
    j = 0
    while (j < m) { val ch = t(j); pos(cur(ch)) = j; cur(ch) += 1; j += 1 }
    System.arraycopy(cnt, 0, cur, 0, 129) // reset: cur(c) = first candidate index
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window < m - 1) i + window else m - 1
      val ch = s(i)
      val end = cnt(ch + 1)
      var k = cur(ch)
      while (k < end && pos(k) < lo) k += 1
      cur(ch) = k
      if (k < end && pos(k) <= hi) {
        buf(i) = true
        buf(n + pos(k)) = true
        matches += 1
        cur(ch) = k + 1
      }
      i += 1
    }
    matches
  }

  /** Jaro similarity in [0,1]; 0.0 if either side is empty (DuckDB parity). */
  def jaro(s: String, t: String): Double =
    jaroChars(CharScratch.fillA(s), s.length, CharScratch.fillB(t), t.length)

  /** Char-buffer core (zero-allocation hot path; see [[CharScratch]]). */
  def jaroChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Double = {
    if (n == 0 || m == 0) return 0.0
    if (eqChars(s, n, t, m)) return 1.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val buf = boolBuf(n + m)
    // sMatched = buf[0, n); tMatched = buf[n, n+m)
    var matches = 0
    if (math.max(n, m) > 64 && isAscii(s, n) && isAscii(t, m)) {
      matches = jaroMatchAscii(s, n, t, m, window, buf)
    } else {
      var i = 0
      while (i < n) {
        val lo = math.max(0, i - window)
        val hi = math.min(m - 1, i + window)
        var j = lo
        var done = false
        while (j <= hi && !done) {
          if (!buf(n + j) && s(i) == t(j)) {
            buf(i) = true
            buf(n + j) = true
            matches += 1
            done = true
          }
          j += 1
        }
        i += 1
      }
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of order
    var transpositions = 0
    var k = 0
    var i = 0
    while (i < n) {
      if (buf(i)) {
        while (!buf(n + k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    // strcmp95/DuckDB convention: transpositions = mismatched flagged
    // positions halved with INTEGER division (floor), not exact /2 — this
    // is the original Winkler C code's `T /= 2` and what DuckDB/rapidfuzz
    // reproduce (verified: ("red widget","new widget") → 0.825 requires
    // floor; exact halving gives 0.8042).
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - (transpositions / 2)) / mm) / 3.0
  }

  /** Jaro-Winkler with p=0.1, 4-char prefix cap, 0.7 boost threshold. */
  def jaroWinkler(s: String, t: String): Double =
    jaroWinklerChars(CharScratch.fillA(s), s.length, CharScratch.fillB(t), t.length)

  def jaroWinklerChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Double = {
    val j = jaroChars(s, n, t, m)
    if (j <= 0.7) return j
    var prefix = 0
    val cap = math.min(4, math.min(n, m))
    while (prefix < cap && s(prefix) == t(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** Normalized Levenshtein similarity in [0,1]: 1 - dist/max(len). */
  def levenshteinSim(s: String, t: String): Double =
    levenshteinSimChars(CharScratch.fillA(s), s.length, CharScratch.fillB(t), t.length)

  def levenshteinSimChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Double = {
    val maxLen = math.max(n, m)
    if (maxLen == 0) 1.0
    else 1.0 - levenshteinChars(s, n, t, m).toDouble / maxLen
  }

  private val intScratchA = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val intScratchB = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private def intBuf(tl: ThreadLocal[Array[Int]], n: Int): Array[Int] = {
    var buf = tl.get()
    if (buf.length < n) { buf = new Array[Int](2 * n); tl.set(buf) }
    buf
  }

  /** Levenshtein distance (matches Spark/DuckDB exactly).
    *
    * Dispatch: classic two-row DP for short strings; Myers' bit-parallel
    * algorithm (Myers 1999 / Hyyrö 2002 — public algorithm) beyond that —
    * O(⌈m/64⌉·n) instead of O(m·n). On the crawl-page pipeline the model
    * compares multi-KB `text_norm` fields: the scalar DP is millions of
    * cells per pair; bit-parallel is ~64× fewer word ops. Both paths
    * return the exact distance, so oracle hashes are unaffected. */
  def levenshtein(s: String, t: String): Int =
    levenshteinChars(CharScratch.fillA(s), s.length, CharScratch.fillB(t), t.length)

  def levenshteinChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Int = {
    if (n == 0) return m
    if (m == 0) return n
    if (math.min(n, m) > 12) {
      // pattern = shorter side → fewest 64-bit blocks
      return if (n <= m) {
        if (n <= 64) myersLev1(s, n, t, m) else myersLevBlocked(s, n, t, m)
      } else {
        if (m <= 64) myersLev1(t, m, s, n) else myersLevBlocked(t, m, s, n)
      }
    }
    var prev = intBuf(intScratchA, m + 1)
    var cur = intBuf(intScratchB, m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      val sc = s(i - 1)
      j = 1
      while (j <= m) {
        val cost = if (sc == t(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  // per-thread Peq table for ASCII chars (128 × blocks longs, grown on
  // demand); non-ASCII chars fall back to a per-call HashMap (rare in
  // normalized crawl text, and only allocated when actually present)
  private val peqScratch = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }
  private def peqBuf(size: Int): Array[Long] = {
    var buf = peqScratch.get()
    if (buf.length < size) { buf = new Array[Long](2 * size); peqScratch.set(buf) }
    java.util.Arrays.fill(buf, 0, size, 0L)
    buf
  }

  /** Single-word Myers (pattern length ≤ 64). */
  private def myersLev1(p: Array[Char], m: Int, t: Array[Char], n: Int): Int = {
    val peq = peqBuf(128)
    // value type must be the BOXED java.lang.Long: with scala.Long the
    // map erases the same but get()'s null return unboxes silently to 0L
    // and the null guards below become dead code (compiler warning)
    var extra: java.util.HashMap[Character, java.lang.Long] = null
    var i = 0
    while (i < m) {
      val c = p(i)
      if (c < 128) peq(c) |= 1L << i
      else {
        if (extra == null) extra = new java.util.HashMap[Character, java.lang.Long]()
        val prev = extra.get(c)
        extra.put(c, (if (prev == null) 0L else prev.longValue()) | (1L << i))
      }
      i += 1
    }
    var pv = -1L
    var mv = 0L
    var score = m
    val mask = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val c = t(j)
      val eq =
        if (c < 128) peq(c)
        else if (extra != null) { val v = extra.get(c); if (v == null) 0L else v.longValue() }
        else 0L
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & mask) != 0L) score += 1
      else if ((mh & mask) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }

  /** Blocked Myers (Hyyrö's generalization) for patterns > 64 chars. */
  private def myersLevBlocked(p: Array[Char], m: Int, t: Array[Char], n: Int): Int = {
    val W = 64
    val blocks = (m + W - 1) / W
    val peq = peqBuf(128 * blocks)
    var extra: java.util.HashMap[Character, Array[Long]] = null
    var i = 0
    while (i < m) {
      val c = p(i)
      if (c < 128) peq(c * blocks + i / W) |= 1L << (i % W)
      else {
        if (extra == null) extra = new java.util.HashMap[Character, Array[Long]]()
        var arr = extra.get(c)
        if (arr == null) { arr = new Array[Long](blocks); extra.put(c, arr) }
        arr(i / W) |= 1L << (i % W)
      }
      i += 1
    }
    val pvs = new Array[Long](blocks)
    val mvs = new Array[Long](blocks)
    java.util.Arrays.fill(pvs, -1L)
    var score = m
    val lastMask = 1L << ((m - 1) % W)
    var j = 0
    while (j < n) {
      val c = t(j)
      val extraArr = if (c < 128 || extra == null) null else extra.get(c)
      var hin = 1
      var b = 0
      while (b < blocks) {
        var eq =
          if (c < 128) peq(c * blocks + b)
          else if (extraArr != null) extraArr(b)
          else 0L
        val pv = pvs(b); val mv = mvs(b)
        val xv = eq | mv
        if (hin < 0) eq |= 1L
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        val mask = if (b == blocks - 1) lastMask else 1L << 63
        var hout = 0
        if ((ph & mask) != 0L) hout = 1
        else if ((mh & mask) != 0L) hout = -1
        ph = ph << 1
        mh = mh << 1
        if (hin < 0) mh |= 1L
        else if (hin > 0) ph |= 1L
        pvs(b) = mh | ~(xv | ph)
        mvs(b) = ph & xv
        hin = hout
        b += 1
      }
      score += hin
      j += 1
    }
    score
  }

  /**
   * n-gram set Jaccard computed directly from the two strings — no
   * intermediate arrays. The `array_intersect(char_ngrams(a), ...)`
   * formulation allocates hundreds of objects per pair (measured: 1003 s
   * for 47M pairs at sf0.1; this kernel replaces it). Semantics are
   * identical: distinct n-gram sets, |∩| / |∪|, both-empty → 1.0.
   */
  def ngramJaccard(a: String, b: String, n: Int): Double =
    ngramJaccardChars(CharScratch.fillA(a), a.length, CharScratch.fillB(b), b.length, n)

  def ngramJaccardChars(a: Array[Char], la: Int, b: Array[Char], lb: Int,
      n: Int): Double = {
    // zero-allocation fast path: an n-gram of up to 4 UTF-16 chars packs
    // into one long (4x16 bits); distinct grams live in thread-local
    // arrays with insertion-scan dedupe (gram counts are tiny for names).
    // The HashSet<String> version allocated ~40 objects/pair — measured
    // 531 s for 47M pairs; this path is allocation-free.
    if (n <= 4 && la <= 132 && lb <= 132) {
      val bufA = longBuf(longScratchA, math.max(la, 1))
      val bufB = longBuf(longScratchB, math.max(lb, 1))
      val na = packGrams(a, la, n, bufA)
      val nb = packGrams(b, lb, n, bufB)
      if (na == 0 && nb == 0) return 1.0
      var inter = 0
      var i = 0
      while (i < nb) {
        var j = 0
        var found = false
        while (j < na && !found) {
          if (bufA(j) == bufB(i)) found = true
          j += 1
        }
        if (found) inter += 1
        i += 1
      }
      return inter.toDouble / (na + nb - inter)
    }
    // general path (long texts / large n): hash sets of gram strings
    val as = new String(a, 0, la)
    val bs = new String(b, 0, lb)
    val sa = new java.util.HashSet[String]()
    var i = 0
    while (i + n <= la) { sa.add(as.substring(i, i + n)); i += 1 }
    val sb = new java.util.HashSet[String]()
    i = 0
    while (i + n <= lb) { sb.add(bs.substring(i, i + n)); i += 1 }
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val uni = sa.size + sb.size - inter
    inter.toDouble / uni
  }

  private val longScratchA = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }
  private val longScratchB = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }
  private def longBuf(tl: ThreadLocal[Array[Long]], n: Int): Array[Long] = {
    var buf = tl.get()
    if (buf.length < n) { buf = new Array[Long](2 * n); tl.set(buf) }
    buf
  }

  /** Pack distinct n-grams (n<=4) of s as longs into buf; returns count. */
  private def packGrams(s: Array[Char], len: Int, n: Int, buf: Array[Long]): Int = {
    var count = 0
    var i = 0
    while (i + n <= len) {
      // n<=4 UTF-16 chars pack uniquely into 16n <= 64 bits; all grams in
      // one call share n, so no cross-length collision is possible
      var g = 0L
      var k = 0
      while (k < n) { g = (g << 16) | s(i + k); k += 1 }
      var j = 0
      var dup = false
      while (j < count && !dup) {
        if (buf(j) == g) dup = true
        j += 1
      }
      if (!dup) { buf(count) = g; count += 1 }
      i += 1
    }
    count
  }

  /** Character n-grams of `s` (sliding window, stride 1). Mirrors
    * `dedupe:cpredicates (fn ngrams)†` (SURVEY.md §2.2 P5). */
  def charNGrams(s: String, n: Int): Array[String] = {
    if (s == null || s.length < n) return Array.empty
    val out = new Array[String](s.length - n + 1)
    var i = 0
    while (i + n <= s.length) { out(i) = s.substring(i, i + n); i += 1 }
    out
  }

  /** Word shingles of size n over a pre-tokenized array.
    * Mirrors `dedupe:predicates (commonTwoTokens/commonThreeTokens)†`. */
  def tokenShingles(tokens: Array[String], n: Int): Array[String] = {
    if (tokens == null || tokens.length < n) return Array.empty
    val out = new Array[String](tokens.length - n + 1)
    var i = 0
    while (i + n <= tokens.length) {
      out(i) = tokens.slice(i, i + n).mkString(" ")
      i += 1
    }
    out
  }

  /** All suffixes of length >= minLen, capped at `cap` longest-first.
    * Mirrors `dedupe:predicates (suffixArray)†` (SURVEY.md §2.3 B7). */
  def suffixes(s: String, minLen: Int, cap: Int): Array[String] = {
    if (s == null || s.length < minLen) return Array.empty
    val k = math.min(s.length - minLen + 1, cap)
    val out = new Array[String](k)
    var i = 0
    while (i < k) { out(i) = s.substring(i); i += 1 }
    out
  }

  /** FNV-1a 64-bit hash of a string — stable, seedable, dependency-free. */
  def fnv1a64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i) & 0xffffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /**
   * 64-bit SimHash over a token array (Charikar). Each token hashes to 64
   * bits; bit-votes are summed; sign of each vote gives the output bit.
   * Scale substitute for TF-IDF canopies (BASELINE.json:6 "simhash-of-text").
   */
  def simhash64(tokens: Array[String]): Long = {
    if (tokens == null || tokens.length == 0) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = fnv1a64(tokens(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /**
   * MinHash signature: k independent permutations approximated by
   * k seeded FNV hashes; signature(i) = min hash over tokens.
   * Foundation for LSH band-bucket near-dup detection.
   */
  def minhash(tokens: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (tokens == null) return sig
    var i = 0
    while (i < tokens.length) {
      val base = fnv1a64(tokens(i), 0L)
      var j = 0
      while (j < k) {
        // cheap independent-ish family: mix base with per-row odd multiplier
        val h = (base ^ (0x9e3779b97f4a7c15L * (j + 1))) * 0xff51afd7ed558ccdL
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** NFKC-normalize + lowercase + collapse whitespace + trim; null if empty.
    * Mirrors `dedupe-api:api/utils/helpers.py (fn preProcess)†` (§2.2 P1). */
  def preProcess(s: String): String = {
    if (s == null) return null
    val nfkc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    val out = nfkc.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim
    if (out.isEmpty) null else out
  }

  /** Rolling-hash (Rabin-Karp style) document fingerprint: min `keep`
    * window-hashes of the char stream (winnowing-lite), xor-folded. */
  def docFingerprint(s: String, window: Int): Long = {
    if (s == null || s.length < window) return fnv1a64(if (s == null) "" else s, 7L)
    var pow = 1L
    var i = 1
    while (i < window) { pow *= 257L; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = h * 257L + s.charAt(i); i += 1 }
    var minH = h
    i = window
    while (i < s.length) {
      h = (h - s.charAt(i - window) * pow) * 257L + s.charAt(i)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  // ---- unrestricted Damerau-Levenshtein ------------------------------
  // full-matrix scratch; beyond ~16 MB of cells a plain heap array is
  // used instead (same answer, one GC'd allocation) so a stray long
  // input can't pin a giant thread-local forever
  private val dlScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](4096)
  }
  // last-row-where-char-occurred table, O(1)-reset via generation stamps
  // (filling 64k ints per call would dwarf the DP on short fields)
  private val dlLastVal = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](65536)
  }
  private val dlLastGen = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](65537)
  }

  /** Unrestricted Damerau-Levenshtein distance (Lowrance & Wagner 1975†,
    * the last-occurrence-table DP) — an adjacent transposition costs 1
    * and the transposed pair MAY be edited again afterwards, so
    * dl("ca","abc") = 2 where the restricted OSA variant answers 3.
    * Matches DuckDB's `damerau_levenshtein` (verified on both published
    * discriminating cases and oracle-hashed at corpus scale by
    * q_damerau_pairs). Intended for short fields (names, titles): the
    * transposition recurrence needs the FULL O(n·m) matrix — page-length
    * texts should stay on [[levenshtein]]'s bit-parallel path. */
  def damerau(s: String, t: String): Int =
    damerauChars(CharScratch.fillA(s), s.length, CharScratch.fillB(t), t.length)

  def damerauChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Int = {
    if (n == 0) return m
    if (m == 0) return n
    val w = m + 2
    val need = (n + 2) * w
    val d = if (need <= (1 << 22)) intBuf(dlScratch, need) else new Array[Int](need)
    val last = dlLastVal.get()
    val stamp = dlLastGen.get()
    if (stamp(65536) == Int.MaxValue) { // stamp wrap: hard reset once per 2^31 calls
      java.util.Arrays.fill(stamp, 0); stamp(65536) = 0
    }
    stamp(65536) += 1
    val gen = stamp(65536)
    val inf = n + m
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      val sc = s(i - 1)
      val rowI = (i + 1) * w
      val rowIm1 = i * w
      j = 1
      while (j <= m) {
        val tc = t(j - 1)
        val k = if (stamp(tc) == gen) last(tc) else 0
        val l = db
        var cost = 1
        if (sc == tc) { cost = 0; db = j }
        var best = d(rowIm1 + j) + cost              // substitute / match
        val ins = d(rowI + j) + 1                    // insert into s
        if (ins < best) best = ins
        val del = d(rowIm1 + j + 1) + 1              // delete from s
        if (del < best) best = del
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tra < best) best = tra
        d(rowI + j + 1) = best
        j += 1
      }
      stamp(sc) = gen; last(sc) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  /** Smith–Waterman local alignment score (Smith & Waterman 1981†) with
    * the simple integer scheme match=+2, mismatch=-1, linear gap=-1: the
    * best-scoring pair of SUBSTRINGS, so a shared fragment scores high
    * even when the fields around it diverge completely — the comparator
    * for embedded names ("j smith" inside "dr j smith jr, esq") where
    * global-alignment distances (Levenshtein, affine-gap) drown the
    * match in flank penalties. Two-row DP on thread-local int scratch,
    * zero allocation; O(n·m) — short fields only, like [[damerau]]. */
  def smithWatermanChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Int = {
    if (n == 0 || m == 0) return 0
    var prev = intBuf(intScratchA, m + 1)
    var cur = intBuf(intScratchB, m + 1)
    java.util.Arrays.fill(prev, 0, m + 1, 0)
    var best = 0
    var i = 1
    while (i <= n) {
      cur(0) = 0
      val sc = s(i - 1)
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (sc == t(j - 1)) 2 else -1)
        var h = if (sub > 0) sub else 0
        val up = prev(j) - 1
        if (up > h) h = up
        val left = cur(j - 1) - 1
        if (left > h) h = left
        cur(j) = h
        if (h > best) best = h
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    best
  }

  /** Normalized Smith–Waterman similarity in [0, 1]: raw score over the
    * perfect-local-match ceiling 2·min(n, m) (Christen 2012, Data
    * Matching†). Either side empty → 0.0. */
  def smithWaterman(s: String, t: String): Double = {
    val n = s.length; val m = t.length
    if (n == 0 || m == 0) 0.0
    else smithWatermanChars(CharScratch.fillA(s), n, CharScratch.fillB(t), m)
      .toDouble / (2.0 * math.min(n, m))
  }
}
