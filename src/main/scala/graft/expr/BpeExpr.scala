package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Apply an ordered list of BPE merge rules to a symbol sequence
 * (array<string>) — the classic left-to-right greedy merge of Sennrich
 * et al. ACL 2016†: for each rule (a, b) in order, every non-overlapping
 * adjacent occurrence of a followed by b becomes the single symbol a+b.
 * One rule per training iteration (textops.Bpe.train) or the whole
 * learned list at encode time (textops.Bpe.encode). The rule list rides
 * as expression metadata — vocabulary-sized (tens of thousands), the
 * same broadcast-as-literal footprint as GradLR's fitted weights;
 * stored as a flat UTF8String stride-3 array [a, b, a+b, …] so the
 * codegen call stays generics-free for Janino.
 *
 * The per-rule scan is the reference algorithm's O(rules · len) shape†;
 * a production encoder's priority-queue pairing is an optimization with
 * identical output, so correctness fixtures pin THIS semantics.
 */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_bpe_apply_${merges.length}"
  @transient private lazy val rules: Array[UTF8String] =
    merges.flatMap { case (a, b) =>
      Seq(UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray
  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.merge(v.asInstanceOf[ArrayData], rules)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRules", rules,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, v => s"graft.expr.BpeKernel.merge($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeKernel {
  /** Greedy left-to-right merge of each stride-3 rule in order. The
    * in-place compaction is safe: the write cursor never passes the
    * read cursor, and both operands are read before the write. */
  def merge(syms: ArrayData, rules: Array[UTF8String]): ArrayData = {
    var cur = new Array[UTF8String](syms.numElements())
    var n = cur.length
    var i = 0
    while (i < n) { cur(i) = syms.getUTF8String(i); i += 1 }
    var r = 0
    while (r < rules.length) {
      val a = rules(r); val b = rules(r + 1); val ab = rules(r + 2)
      var out = 0
      var in = 0
      while (in < n) {
        if (in + 1 < n && cur(in).equals(a) && cur(in + 1).equals(b)) {
          cur(out) = ab; in += 2
        } else {
          cur(out) = cur(in); in += 1
        }
        out += 1
      }
      n = out
      r += 3
    }
    if (n < cur.length) cur = java.util.Arrays.copyOf(cur, n)
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }
}
