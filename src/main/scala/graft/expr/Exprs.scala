package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions for the dedupe engine. Every expression:
 *  - is null-intolerant (null in → null out; Catalyst can then prune),
 *  - delegates the kernel to a static method on [[Sim]] or [[ExprKernels]]
 *    and emits a single static call in `doGenCode`, keeping whole-stage
 *    codegen spans intact (SURVEY.md §2.10; BASELINE.json:6 "fused into
 *    vectorized Catalyst expressions").
 */
object ExprKernels {
  // UTF8String → shared per-thread char buffers, NO allocation for ASCII
  // input (byte copy) and one transient String only for non-ASCII. The
  // previous per-call `toString` pair was ~560M allocations per 47M-pair
  // scoring pass — pure GC pressure that taxed 32-thread scaling.
  /** Fill side-A/B char buffer from a UTF8String; returns the char count
    * (UTF-16 units — identical to what `.toString.length` would give).
    * Retrieve the buffer afterwards with CharScratch.bufA(0)/bufB(0). */
  private[expr] def fillA(u: UTF8String): Int = fill(u, isA = true)
  private[expr] def fillB(u: UTF8String): Int = fill(u, isA = false)
  private def fill(u: UTF8String, isA: Boolean): Int = {
    val nb = u.numBytes()
    val buf = if (isA) CharScratch.bufA(nb) else CharScratch.bufB(nb)
    var i = 0
    while (i < nb) {
      val b = u.getByte(i)
      if (b < 0) { // non-ASCII byte: decode properly (allocates once)
        val s = u.toString
        val buf2 = if (isA) CharScratch.bufA(s.length) else CharScratch.bufB(s.length)
        s.getChars(0, s.length, buf2, 0)
        return s.length
      }
      buf(i) = b.toChar
      i += 1
    }
    nb
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val la = fillA(a); val lb = fillB(b)
    Sim.jaroWinklerChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb)
  }

  def levSim(a: UTF8String, b: UTF8String): Double = {
    val la = fillA(a); val lb = fillB(b)
    Sim.levenshteinSimChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb)
  }

  def levDist(a: UTF8String, b: UTF8String): Int = {
    val la = fillA(a); val lb = fillB(b)
    Sim.levenshteinChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb)
  }

  def charNGrams(s: UTF8String, n: Int): ArrayData = {
    val grams = Sim.charNGrams(s.toString, n)
    new GenericArrayData(grams.map(g => UTF8String.fromString(g): Any))
  }

  def tokenShingles(arr: ArrayData, n: Int): ArrayData = {
    val toks = toStringArray(arr)
    new GenericArrayData(Sim.tokenShingles(toks, n).map(g => UTF8String.fromString(g): Any))
  }

  def suffixes(s: UTF8String, minLen: Int, cap: Int): ArrayData =
    new GenericArrayData(Sim.suffixes(s.toString, minLen, cap).map(g => UTF8String.fromString(g): Any))

  def simhash64(arr: ArrayData): Long = Sim.simhash64(toStringArray(arr))

  def minhash(arr: ArrayData, k: Int): ArrayData =
    new GenericArrayData(Sim.minhash(toStringArray(arr), k))

  def nfkcNorm(s: UTF8String): UTF8String = {
    val out = Sim.preProcess(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  def docFingerprint(s: UTF8String, window: Int): Long =
    Sim.docFingerprint(s.toString, window)

  def hamming64(a: Long, b: Long): Int = Sim.hamming64(a, b)

  /** Largest-step-≤ binary search over a sorted step table (the
    * isotonic-calibration apply kernel): value of the largest fitted
    * score ≤ s; clamps below the smallest step, propagates NaN (a
    * broken upstream ratio must surface, not masquerade as a
    * confidently-low probability). */
  def stepLookup(s: Double, scores: Array[Double], values: Array[Double]): Double = {
    if (java.lang.Double.isNaN(s)) return Double.NaN
    if (s <= scores(0)) return values(0)
    var lo = 0; var hi = scores.length - 1
    while (lo < hi) { // largest index with scores(idx) <= s
      val mid = (lo + hi + 1) >>> 1
      if (scores(mid) <= s) lo = mid else hi = mid - 1
    }
    values(lo)
  }

  private def toStringArray(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      out(i) = if (u == null) "" else u.toString
      i += 1
    }
    out
  }
}

/** Step-function lookup (the isotonic-calibration apply): value of the
  * largest fitted score ≤ the input over a plan-shipped sorted table.
  * A native expression rather than a Scala UDF so the corpus-sized
  * calibrate stage stays inside whole-stage codegen — the table rides
  * the task binary via `addReferenceObj` (review-sized by the isotonic
  * cap), and the generated code calls the same static kernel
  * `nullSafeEval` uses. */
case class StepLookupExpr(child: Expression, scores: Array[Double],
    values: Array[Double]) extends UnaryExpression {
  require(scores.nonEmpty && scores.length == values.length,
    s"step table shape: ${scores.length} scores vs ${values.length} values")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_step_lookup"
  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.stepLookup(s.asInstanceOf[Double], scores, values)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("stepScores", scores, "double[]")
    val vRef = ctx.addReferenceObj("stepValues", values, "double[]")
    defineCodeGen(ctx, ev, s => s"graft.expr.ExprKernels.stepLookup($s, $sRef, $vRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Jaro-Winkler similarity in [0,1] (DuckDB/rapidfuzz variant; §2.5 C1). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Normalized Levenshtein similarity 1 - dist/maxLen in [0,1]. */
case class LevenshteinSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_levenshtein_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.levSim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels.levSim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain Levenshtein distance through the same dispatch kernel (classic
  * two-row DP short, Myers bit-parallel long) — value-identical to
  * Spark's builtin `levenshtein` (and DuckDB's) on BMP strings, ~2.3x
  * faster measured on 47M short-name pairs (the builtin allocates its
  * DP rows per call; this kernel reuses thread-local scratch). */
case class LevenshteinDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_levenshtein_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.levDist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels.levDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Character n-grams (§2.2 P5; predicate B5). */
case class CharNGramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "ngram size must be positive")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_char_ngrams_$n"
  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.charNGrams(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.ExprKernels.charNGrams($s, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Token shingles of size n over an array<string> column (predicate B4). */
case class TokenShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_token_shingles_$n"
  override protected def nullSafeEval(a: Any): Any =
    ExprKernels.tokenShingles(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.ExprKernels.tokenShingles($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Suffixes >= minLen, capped (predicate B7). */
case class SuffixesExpr(child: Expression, minLen: Int, cap: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_suffixes"
  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.suffixes(s.asInstanceOf[UTF8String], minLen, cap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.ExprKernels.suffixes($s, $minLen, $cap)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over array<string> tokens (P6; blocking key family B15'). */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(a: Any): Any =
    ExprKernels.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.ExprKernels.simhash64($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature (k hashes) over array<string> tokens. */
case class MinHashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "minhash size must be positive")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"graft_minhash_$k"
  override protected def nullSafeEval(a: Any): Any =
    ExprKernels.minhash(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.ExprKernels.minhash($a, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** NFKC + lowercase + whitespace-collapse + trim; empty → null (P1).
  * Applied ONLY to derived columns — `text` itself is never rewritten
  * (byte-identity invariant, BASELINE.json:6,15). */
case class NormalizeNFKCExpr(child: Expression)
    extends UnaryExpression {
  // NOT null-intolerant in effect (empty → null), but input null → null holds.
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_normalize"
  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.nfkcNorm(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.expr.ExprKernels.nfkcNorm($s);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Rolling-hash document fingerprint (winnowing-lite min window hash). */
case class DocFingerprintExpr(child: Expression, window: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_doc_fingerprint"
  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.docFingerprint(s.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.ExprKernels.docFingerprint($s, $window)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two int64 simhashes. */
case class Hamming64Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sim.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Order-preserving unsigned-radix key of a double: u(x1) < u(x2) as
  * UNSIGNED 64-bit integers iff x1 < x2 as doubles (IEEE total order
  * with -0.0 < +0.0). Non-negatives set the sign bit (upper half),
  * negatives bitwise-complement (magnitude order reversed into value
  * order). NaN → null, so order statistics see only comparable values.
  * Digit extraction over this key drives stats/Quantiles' exact
  * distributed selection; [[QuantileKey.decode]] inverts it. */
case class DoubleOrderedBitsExpr(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_ordered_bits"
  override protected def nullSafeEval(a: Any): Any =
    QuantileKey.encode(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if (Double.isNaN($a)) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.expr.QuantileKey.rawEncode($a); }""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object QuantileKey {
  /** null for NaN (interpreted eval path). */
  def encode(x: Double): Any =
    if (java.lang.Double.isNaN(x)) null else java.lang.Long.valueOf(rawEncode(x))
  /** Codegen path — caller has already excluded NaN. */
  def rawEncode(x: Double): Long = {
    val bits = java.lang.Double.doubleToRawLongBits(x)
    if (bits >= 0L) bits ^ java.lang.Long.MIN_VALUE else ~bits
  }
  def decode(u: Long): Double = {
    val bits = if ((u & java.lang.Long.MIN_VALUE) != 0L)
      u ^ java.lang.Long.MIN_VALUE else ~u
    java.lang.Double.longBitsToDouble(bits)
  }
}
