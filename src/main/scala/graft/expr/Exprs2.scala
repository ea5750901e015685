package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object ExprKernels2 {
  // commons-codec ships in /opt/spark/jars (verified); DoubleMetaphone's
  // encode path is stateless per call → one shared instance is thread-safe.
  private val dm = new org.apache.commons.codec.language.DoubleMetaphone

  def metaphoneTokens(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      val code = if (u == null) "" else dm.doubleMetaphone(u.toString)
      out(i) = UTF8String.fromString(if (code == null) "" else code)
      i += 1
    }
    new GenericArrayData(out)
  }

  def affineGap(a: UTF8String, b: UTF8String): Double = {
    val la = ExprKernels.fillA(a); val lb = ExprKernels.fillB(b)
    AffineGap.normalizedChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb)
  }

  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val la = ExprKernels.fillA(a); val lb = ExprKernels.fillB(b)
    Sim.ngramJaccardChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb, n)
  }

  def damerau(a: UTF8String, b: UTF8String): Int = {
    val la = ExprKernels.fillA(a); val lb = ExprKernels.fillB(b)
    Sim.damerauChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb)
  }

  def smithWaterman(a: UTF8String, b: UTF8String): Double = {
    val la = ExprKernels.fillA(a); val lb = ExprKernels.fillB(b)
    if (la == 0 || lb == 0) 0.0
    else Sim.smithWatermanChars(CharScratch.bufA(0), la, CharScratch.bufB(0), lb)
      .toDouble / (2.0 * math.min(la, lb))
  }

  /** One-pass cosine over two numeric arrays. IEEE-identical to the
    * composed `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` with
    * cast-to-double zip_with dots: the three accumulators add the same
    * terms in the same index order, just in one traversal — and without
    * the six intermediate arrays the composition allocates per pair.
    * Mirrors the composition's null semantics: unequal lengths or a null
    * element poison the result (zip_with pads/propagates null). */
  def arrayCosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Allocation-free dot product of two numeric arrays (same parity
    * contract as [[arrayCosine]]). */
  def arrayDot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  private def isKeySorted(k: ArrayData, n: Int): Boolean = {
    var i = 1
    while (i < n) {
      if (k.getUTF8String(i).compareTo(k.getUTF8String(i - 1)) <= 0) return false
      i += 1
    }
    true
  }

  /** Reference/fallback kernel: O(|a|·|b|) scan over a's keys. Summation
    * order = a's entry order. */
  private[expr] def mapDotScan(a: org.apache.spark.sql.catalyst.util.MapData,
      b: org.apache.spark.sql.catalyst.util.MapData): Double = {
    val ak = a.keyArray(); val av = a.valueArray()
    val bk = b.keyArray(); val bv = b.valueArray()
    val na = a.numElements(); val nb = b.numElements()
    var acc = 0.0
    var i = 0
    while (i < na) {
      val k = ak.getUTF8String(i)
      var j = 0
      var hit = -1
      while (j < nb && hit < 0) {
        if (k.equals(bk.getUTF8String(j))) hit = j
        j += 1
      }
      if (hit >= 0) acc += av.getDouble(i) * bv.getDouble(hit)
      i += 1
    }
    acc
  }

  /** Dot product of two map<string,double> vectors over the key union
    * (missing → 0). When BOTH maps are key-ascending — the TF-IDF builder
    * sorts entries (Scoring.withTfidfVectors) — a two-cursor merge does it
    * in O(|a|+|b|) byte comparisons; otherwise it falls back to the
    * quadratic [[mapDotScan]] (an O(n+m) up-front sortedness check, so the
    * fallback costs one extra pass, never a wrong answer). Summation order
    * is key order under the merge vs a's entry order under the scan; all
    * matched products are the same non-negative terms either way and the
    * q_tfidf_cosine oracle stays hash-green at 6 decimals. */
  def mapDot(a: org.apache.spark.sql.catalyst.util.MapData,
      b: org.apache.spark.sql.catalyst.util.MapData): Double = {
    val ak = a.keyArray(); val av = a.valueArray()
    val bk = b.keyArray(); val bv = b.valueArray()
    val na = a.numElements(); val nb = b.numElements()
    if (!isKeySorted(ak, na) || !isKeySorted(bk, nb)) return mapDotScan(a, b)
    var acc = 0.0
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val c = ak.getUTF8String(i).compareTo(bk.getUTF8String(j))
      if (c == 0) {
        acc += av.getDouble(i) * bv.getDouble(j)
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  def setJaccard(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < b.numElements()) { sb.add(b.getUTF8String(i)); i += 1 }
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Distinct-element intersection count of two array<string> columns —
    * the integer the set-similarity join's verification compares in exact
    * arithmetic (q·|∩| ≥ p·(|a|+|b|−|∩|), no floating Jaccard on either
    * engine). Inputs are already-distinct token arrays in the join path,
    * but the kernel dedups defensively so it matches DuckDB's
    * `len(list_intersect(...))` on any input. */
  def setIntersect(a: ArrayData, b: ArrayData): Long = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    var inter = 0L
    val seen = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < b.numElements()) {
      val u = b.getUTF8String(i)
      if (sa.contains(u) && seen.add(u)) inter += 1
      i += 1
    }
    inter
  }

  /** Monge-Elkan hybrid similarity (Monge & Elkan, KDD 1996†; secondary
    * comparator = the engine's DuckDB-parity Jaro-Winkler): mean over a's
    * tokens of the best JW match among b's tokens. Asymmetric by
    * definition (me(a,b) ≠ me(b,a)); null when either side has no tokens
    * (mirrors DuckDB's avg-over-empty-list = NULL, so the oracle twin
    * agrees without a special case). Each token is materialized to a
    * String ONCE per row (|a|+|b| conversions, not |a|·|b|) and the inner
    * comparisons run on the zero-alloc char-scratch JW kernel. */
  def mongeElkan(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return null
    val bs = new Array[String](m)
    var j = 0
    while (j < m) { bs(j) = b.getUTF8String(j).toString; j += 1 }
    var sum = 0.0
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i).toString
      var best = 0.0
      j = 0
      while (j < m) {
        val s = Sim.jaroWinkler(ai, bs(j))
        if (s > best) best = s
        j += 1
      }
      sum += best
      i += 1
    }
    sum / n
  }

  /** Soft-TFIDF hybrid similarity (Cohen, Ravikumar & Fienberg, IIWeb
    * 2003†; secondary comparator = the engine's DuckDB-parity
    * Jaro-Winkler): over a's TF-IDF entries, Σ w_a(t)·w_b(u*)·jw(t,u*)
    * where u* is t's best-JW token in b, contributing only when
    * jw ≥ theta. Ties on the max JW resolve to the LARGEST weight among
    * the argmax tokens — a total, token-order-independent rule (the
    * contribution uses only the sim and the weight, so equal-weight ties
    * are value-identical however broken). Asymmetric like [[mongeElkan]];
    * null when either side is empty. Inputs are the same L2-normalized
    * key-ascending map<string,double> vectors [[mapDot]] consumes
    * (Scoring.withTfidfVectors), so summation runs in key order —
    * bit-reproducible against a term-ordered SQL twin. b's tokens
    * materialize to String ONCE per row; the O(|a|·|b|) inner loop runs
    * on the zero-alloc char-scratch JW kernel, bounded by the vector
    * builder's top-k cap (64²). */
  def softTfidf(a: org.apache.spark.sql.catalyst.util.MapData,
      b: org.apache.spark.sql.catalyst.util.MapData, theta: Double): Any = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return null
    val ak = a.keyArray(); val av = a.valueArray()
    val bk = b.keyArray(); val bv = b.valueArray()
    val bs = new Array[String](m)
    var j = 0
    while (j < m) { bs(j) = bk.getUTF8String(j).toString; j += 1 }
    var sum = 0.0
    var i = 0
    while (i < n) {
      val ai = ak.getUTF8String(i).toString
      var best = -1.0; var wbBest = 0.0
      j = 0
      while (j < m) {
        val s = Sim.jaroWinkler(ai, bs(j))
        if (s > best) { best = s; wbBest = bv.getDouble(j) }
        else if (s == best && bv.getDouble(j) > wbBest) wbBest = bv.getDouble(j)
        j += 1
      }
      if (best >= theta) sum += av.getDouble(i) * wbBest * best
      i += 1
    }
    sum
  }
}

/**
 * Affine-gap string distance (SURVEY.md §2.5 C1) — the reference's default
 * String comparator (`affinegap (fn normalizedAffineGapDistance)†`).
 * Gotoh alignment with the affinegap library's published default weights†:
 * match 1, mismatch 11, gap-open 10, gap-extend 7 (integer tenths of the
 * float defaults .5/1.1/1.0/.7 scaled — we keep the float scale directly).
 * Normalization: distance / (len(a) + len(b)). Reconstructed from public
 * knowledge; the empty reference mount precludes bit-level verification
 * (SURVEY.md §0), so this ships as an OPTIONAL comparator — the north
 * rule's required comparators are JW/Levenshtein/TF-IDF (BASELINE.json:6).
 */
object AffineGap {
  val matchWeight = 0.5
  val mismatchWeight = 1.1
  val gapWeight = 1.0 // open
  val spaceWeight = 0.7 // extend

  // thread-local DP rows: this kernel runs 10^7+ times per scoring stage;
  // 4 arrays per call was measured GC pressure (514 s for 47M pairs)
  private val scratch = new ThreadLocal[Array[Array[Double]]] {
    override def initialValue(): Array[Array[Double]] =
      Array.fill(4)(new Array[Double](256))
  }

  def distance(s: String, t: String): Double =
    distanceChars(CharScratch.fillA(s), s.length, CharScratch.fillB(t), t.length)

  def distanceChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Double = {
    if (n == 0 && m == 0) return 0.0
    if (n == 0) return gapWeight + spaceWeight * m
    if (m == 0) return gapWeight + spaceWeight * n
    val INF = Double.MaxValue / 4
    var rows = scratch.get()
    if (rows(0).length < m + 1) {
      rows = Array.fill(4)(new Array[Double](2 * (m + 1)))
      scratch.set(rows)
    }
    // D = cost ending in match/mismatch; V = min overall; I/J gap states
    var prevV = rows(0)
    var prevI = rows(1) // gap in s (consuming t)
    var curV = rows(2)
    var curI = rows(3)
    prevV(0) = 0.0
    prevI(0) = INF
    var j = 1
    while (j <= m) {
      prevV(j) = gapWeight + spaceWeight * j
      prevI(j) = prevV(j)
      j += 1
    }
    var i = 1
    while (i <= n) {
      curV(0) = gapWeight + spaceWeight * i
      var curJgap = INF // gap in t (consuming s chars) along this row
      curI(0) = INF
      j = 1
      while (j <= m) {
        val sub = prevV(j - 1) +
          (if (s(i - 1) == t(j - 1)) matchWeight else mismatchWeight)
        curI(j) = math.min(prevI(j) + spaceWeight, prevV(j) + gapWeight + spaceWeight)
        curJgap = math.min(curJgap + spaceWeight, curV(j - 1) + gapWeight + spaceWeight)
        curV(j) = math.min(sub, math.min(curI(j), curJgap))
        j += 1
      }
      val t1 = prevV; prevV = curV; curV = t1
      val t2 = prevI; prevI = curI; curI = t2
      i += 1
    }
    prevV(m)
  }

  /** Normalized to [0, ~1]: distance over combined length. */
  def normalized(s: String, t: String): Double = {
    val denom = s.length + t.length
    if (denom == 0) 0.0 else distance(s, t) / denom
  }

  def normalizedChars(s: Array[Char], n: Int, t: Array[Char], m: Int): Double = {
    val denom = n + m
    if (denom == 0) 0.0 else distanceChars(s, n, t, m) / denom
  }
}

/** metaphone codes of each token — predicate B12 (phonetic blocking). */
case class MetaphoneTokensExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_metaphone_tokens"
  override protected def nullSafeEval(a: Any): Any =
    ExprKernels2.metaphoneTokens(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.ExprKernels2.metaphoneTokens($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** one-pass cosine similarity of two numeric array columns (ANN hot path;
  * see ExprKernels2.arrayCosine for the composition-parity argument). */
case class ArrayCosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.arrayCosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left); val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosResult") // see MongeElkanExpr: fixed names collide across siblings
      s"""
      Object $r = graft.expr.ExprKernels2.arrayCosine($a, $b, $lf, $rf);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** allocation-free dot product of two numeric array columns. */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.arrayDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left); val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult") // see MongeElkanExpr: fixed names collide across siblings
      s"""
      Object $r = graft.expr.ExprKernels2.arrayDot($a, $b, $lf, $rf);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot product of two map<string,double> TF-IDF vectors (direct kernel —
  * see ExprKernels2.mapDot for the built-in-parity argument). */
case class MapDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_map_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.mapDot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.mapDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** exact set Jaccard of two array<string> columns (direct kernel — the
  * array_distinct/array_intersect composition allocates per pair). */
case class SetJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_set_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.setJaccard(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.setJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** distinct-element intersection count of two array<string> columns
  * (set-similarity join verification — see ExprKernels2.setIntersect). */
case class SetIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_set_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.setIntersect(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.setIntersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Monge-Elkan hybrid token-set similarity over two array<string> columns
  * (see ExprKernels2.mongeElkan; null when either side is empty). */
case class MongeElkanExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_monge_elkan"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.mongeElkan(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: nullSafeExec emits no scoping braces for non-nullable
      // children, so a fixed local name would collide with a sibling
      // kernel expression in the same codegen scope (janino error ->
      // silent interpreted fallback)
      val r = ctx.freshName("meResult")
      s"""
      Object $r = graft.expr.ExprKernels2.mongeElkan($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Soft-TFIDF hybrid similarity over two L2-normalized key-ascending
  * map<string,double> TF-IDF vectors (see ExprKernels2.softTfidf; null
  * when either side is empty). */
case class SoftTfidfExpr(left: Expression, right: Expression, theta: Double)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_soft_tfidf"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.softTfidf(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData], theta)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: see MongeElkanExpr — fixed names collide across siblings
      val r = ctx.freshName("stfResult")
      s"""
      Object $r = graft.expr.ExprKernels2.softTfidf($a, $b, $theta);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** direct char-n-gram Jaccard similarity of two strings. */
case class NGramJaccardExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"graft_ngram_jaccard_$n"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.ngramJaccard($a, $b, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Intra-document repetition statistics (Gopher quality filters, Rae et
 * al. 2021†, §A1.1 "repetition removal") in ONE pass per document —
 * array<double> of
 *   [0] dup_line_frac       duplicate line occurrences / total lines
 *   [1] dup_line_char_frac  chars inside duplicate line occurrences / total line chars
 *   [2] top2_frac           occurrences of the most frequent word 2-gram / total 2-grams
 *   [3] top3_frac           same for 3-grams
 *   [4] dup5_frac           occurrences of all repeated word 5-grams / total 5-grams
 * The gram metrics are the word-OCCURRENCE-fraction variant of Gopher's
 * character-fraction originals (exact-SQL-twinnable; same monotone
 * repetition signal). A kernel, not explode+groupBy: at corpus scale the
 * per-document hashmap stays executor-local — no (doc, gram) shuffle, the
 * stats fuse into the scan projection. Tokenizer identical to
 * gfunctions.tokens: lower → split [^\p{L}\p{N}]+ → drop empties; lines
 * split on \n, empties dropped.
 */
object RepetitionStats {
  def compute(s: UTF8String): ArrayData = {
    val text = s.toString
    var dupLines = 0; var dupChars = 0L; var totChars = 0L; var nLines = 0
    val seen = new java.util.HashSet[String]
    var start = 0
    val tl = text.length
    while (start <= tl) {
      var end = text.indexOf('\n', start)
      if (end < 0) end = tl
      if (end > start) {
        val line = text.substring(start, end)
        // code points, not UTF-16 units — matches the documented "chars"
        // semantics (and SQL length()) on supplementary-plane text
        val cp = line.codePointCount(0, line.length)
        nLines += 1; totChars += cp
        if (!seen.add(line)) { dupLines += 1; dupChars += cp }
      }
      start = end + 1
    }
    val dlf = if (nLines == 0) 0.0 else dupLines.toDouble / nLines
    val dlcf = if (totChars == 0L) 0.0 else dupChars.toDouble / totChars
    // same tokenizer as gfunctions.tokens (lower + [^\p{L}\p{N}]+ split)
    val toks = s.toLowerCase.toString.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    def gramStats(n: Int): (Double, Double) = {
      val total = toks.length - n + 1
      if (total <= 0) return (0.0, 0.0)
      val counts = new java.util.HashMap[String, Integer]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        counts.merge(sb.toString, Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
        i += 1
      }
      var top = 0; var dupOcc = 0
      val it = counts.values.iterator()
      while (it.hasNext) {
        val c = it.next().intValue
        if (c > top) top = c
        if (c > 1) dupOcc += c
      }
      (top.toDouble / total, dupOcc.toDouble / total)
    }
    val t2 = gramStats(2)._1
    val t3 = gramStats(3)._1
    val d5 = gramStats(5)._2
    new GenericArrayData(Array[Any](dlf, dlcf, t2, t3, d5))
  }
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"
  override protected def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.RepetitionStats.compute($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner†) — the
  * transposition-aware comparator Spark lacks (built-in `levenshtein`
  * only); DuckDB-parity verified by the q_damerau_pairs oracle. */
case class DamerauExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.damerau($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Normalized Smith–Waterman local-alignment similarity (Smith &
  * Waterman 1981†; match +2 / mismatch −1 / linear gap −1, score over
  * 2·min(len)) — the best-matching-SUBSTRINGS comparator for embedded
  * names; oracle-twinned by q_sw_pairs' two-diagonal recursive-CTE DP. */
case class SmithWatermanExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_smith_waterman"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.smithWaterman(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.smithWaterman($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** normalized affine-gap distance — optional comparator C1. */
case class AffineGapExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_affine_gap"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels2.affineGap(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels2.affineGap($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
