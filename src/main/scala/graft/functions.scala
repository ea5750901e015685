package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr._

/**
 * Public column-function facade for the engine's custom Catalyst
 * expressions plus a few composed built-ins. Mirrors the role of
 * `org.apache.spark.sql.functions` for graft.
 */
object gfunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def x(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftBridge.expression(col)

  /** Jaro-Winkler similarity in [0,1] (DuckDB-parity variant). */
  def jaro_winkler(a: Column, b: Column): Column = c(JaroWinklerExpr(x(a), x(b)))

  /** Normalized Levenshtein similarity 1 - dist/maxLen. */
  def levenshtein_sim(a: Column, b: Column): Column = c(LevenshteinSimExpr(x(a), x(b)))

  /** Levenshtein distance (int) — value-identical to Spark's builtin
    * `levenshtein` on BMP strings, faster kernel (see LevenshteinDistExpr). */
  def levenshtein_dist(a: Column, b: Column): Column = c(LevenshteinDistExpr(x(a), x(b)))

  /** Character n-grams → array<string>. */
  def char_ngrams(s: Column, n: Int): Column = c(CharNGramsExpr(x(s), n))

  /** Step-function lookup over a sorted (scores, values) table — the
    * codegen'd isotonic-calibration apply. */
  def step_lookup(s: Column, scores: Array[Double],
      values: Array[Double]): Column = c(StepLookupExpr(x(s), scores, values))

  /** n-token shingles over an array<string> column → array<string>. */
  def token_shingles(tokens: Column, n: Int): Column = c(TokenShinglesExpr(x(tokens), n))

  /** Suffixes of length >= minLen, longest-first, capped. */
  def suffixes(s: Column, minLen: Int = 3, cap: Int = 32): Column =
    c(SuffixesExpr(x(s), minLen, cap))

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column = c(SimHash64Expr(x(tokens)))

  /** MinHash signature (k seeded hashes) → array<long>. */
  def minhash(tokens: Column, k: Int): Column = c(MinHashExpr(x(tokens), k))

  /** Order-preserving unsigned-radix key of a double (NaN → null);
    * drives stats.Quantiles' exact distributed selection. */
  def double_ordered_bits(x0: Column): Column = c(DoubleOrderedBitsExpr(x(x0)))

  /** Apply ordered BPE merge rules to an array<string> symbol sequence
    * (textops.Bpe train/encode kernel). */
  def bpe_apply(syms: Column, merges: Seq[(String, String)]): Column =
    c(BpeApplyExpr(x(syms), merges))

  /** NFKC-normalize + lowercase + collapse whitespace; empty → null. */
  def normalize_text(s: Column): Column = c(NormalizeNFKCExpr(x(s)))

  /** Rolling-hash doc fingerprint (min window hash). */
  def doc_fingerprint(s: Column, window: Int = 16): Column =
    c(DocFingerprintExpr(x(s), window))

  /** Hamming distance between two int64 simhashes. */
  def hamming64(a: Column, b: Column): Column = c(Hamming64Expr(x(a), x(b)))

  /** Double-metaphone code per token (phonetic blocking, B12). */
  def metaphone_tokens(tokens: Column): Column = c(MetaphoneTokensExpr(x(tokens)))

  /** Normalized affine-gap distance (optional reference comparator C1). */
  def affine_gap(a: Column, b: Column): Column = c(AffineGapExpr(x(a), x(b)))

  /** Unrestricted Damerau-Levenshtein distance (DuckDB-parity). */
  def damerau_levenshtein(a: Column, b: Column): Column = c(DamerauExpr(x(a), x(b)))

  /** Normalized Smith-Waterman local-alignment similarity (best
    * matching substrings; embedded-name comparator). */
  def smith_waterman(a: Column, b: Column): Column = c(SmithWatermanExpr(x(a), x(b)))

  /** Haversine great-circle distance in km (reference C4 comparator). */
  def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    // clamp: sin²+cos·cos·sin² can exceed 1.0 by an ulp for near-antipodal
    // points, and asin(1+ε) is NaN
    lit(6371.0088) * lit(2.0) * asin(sqrt(least(h, lit(1.0))))
  }

  /** Whitespace/punct tokenizer used consistently across blocking/scoring —
    * mirrors `dedupe:predicates (words)†`. The split class is an explicit
    * Unicode one, `[^\p{L}\p{N}]+`, NOT `\W+`: Java's `\w` without
    * UNICODE_CHARACTER_CLASS is ASCII-only, which would shred multilingual
    * crawl text ("café" → "caf") and silently diverge from any oracle
    * engine with different `\w` semantics. `\p{L}\p{N}` means the same
    * thing in Java regex and RE2 (DuckDB), so blocking-key parity holds on
    * non-ASCII input too (round-2 verdict item: unicode tokenizer parity). */
  def tokens(s: Column): Column =
    filter(split(s, "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** One-pass intra-document repetition stats → array<double> of
    * [dup_line_frac, dup_line_char_frac, top2_frac, top3_frac, dup5_frac]
    * (Gopher repetition filters; see RepetitionStatsExpr). */
  def repetition_stats(text: Column): Column = c(RepetitionStatsExpr(x(text)))

  /** Cosine similarity between two float/double array columns (same
    * length). One-pass Catalyst kernel — value-identical to the zip_with
    * dot composition (ExprKernels2.arrayCosine), without its per-pair
    * intermediate arrays. */
  def cosine_sim(a: Column, b: Column): Column =
    c(ArrayCosineExpr(x(a), x(b)))

  /** Distinct-element intersection count of two array<string> columns
    * (integer-exact set-similarity verification). */
  def set_intersect_count(a: Column, b: Column): Column =
    c(SetIntersectExpr(x(a), x(b)))

  /** Monge-Elkan hybrid similarity: mean over a's tokens of the best
    * Jaro-Winkler match among b's tokens (asymmetric; null on empty). */
  def monge_elkan(aTokens: Column, bTokens: Column): Column =
    c(MongeElkanExpr(x(aTokens), x(bTokens)))

  /** Soft-TFIDF hybrid similarity (Cohen et al. 2003) over two
    * L2-normalized TF-IDF map vectors: Σ w_a(t)·w_b(u*)·jw(t,u*) over a's
    * terms whose best Jaro-Winkler match u* in b clears theta
    * (asymmetric; null on empty). */
  def soft_tfidf(a: Column, b: Column, theta: Double): Column =
    c(SoftTfidfExpr(x(a), x(b), theta))

  /** SQL-expression registration so the same functions are usable from
    * spark.sql strings: graft_jaro_winkler(a,b), graft_simhash64(arr), ... */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_jaro_winkler", es => JaroWinklerExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_levenshtein_sim", es => LevenshteinSimExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash64", es => SimHash64Expr(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_normalize", es => NormalizeNFKCExpr(es(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_damerau", es => DamerauExpr(es(0), es(1)), "built-in")
  }
}
