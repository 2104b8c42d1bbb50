package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two `array<float>` columns.
  *
  * This is the hot scalar of the engine: the ε-similarity join of the
  * incremental clusterer (reference: cosine distances in
  * `business_logic/stream_consumer/clustering.py:53-85`) and the ANN /
  * near-dup operators all reduce to dot products over L2-normalized
  * vectors. A native Expression keeps it inside whole-stage codegen;
  * a Scala UDF here would box every array on every pair.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 norm of an `array<float>` column. */
case class FloatVectorNormSq(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_norm_sq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVectorNormSq =
    copy(child = newChild)
}

/** Codegen'd sparse dot product over two SORTED (key, value) array pairs:
  * a single merge scan, O(|a| + |b|) per pair.
  *
  * This is the scale shape for TF-IDF similarity (J5, reference notebook
  * `remove_dup_article`): the naive inverted-index formulation self-joins
  * on the term column, which explodes on hot terms (a stopword shared by
  * k docs in a cluster contributes k² join rows). Collapsing each
  * document to one sorted term-vector row first makes the pair join an
  * equi-join on the cluster key and the dot a linear merge — per-pair
  * cost is bounded by document length, independent of term frequency
  * skew.
  *
  * Contract: both key arrays are sorted ascending (binary UTF8 order,
  * i.e. `array_sort` output) and duplicate-free; values align by index.
  */
case class SortedTermDot(keysA: Expression, valsA: Expression,
                         keysB: Expression, valsB: Expression)
    extends QuaternaryExpression {

  override def first: Expression = keysA
  override def second: Expression = valsA
  override def third: Expression = keysB
  override def fourth: Expression = valsB

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_term_dot"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val ka = a.asInstanceOf[ArrayData]; val va = b.asInstanceOf[ArrayData]
    val kb = c.asInstanceOf[ArrayData]; val vb = d.asInstanceOf[ArrayData]
    val n = ka.numElements(); val m = kb.numElements()
    var i = 0; var j = 0; var s = 0.0
    while (i < n && j < m) {
      val cmp = ka.getUTF8String(i).compareTo(kb.getUTF8String(j))
      if (cmp == 0) { s += va.getDouble(i) * vb.getDouble(j); i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, va, kb, vb) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $ka.numElements();
         |int $m = $kb.numElements();
         |int $i = 0; int $j = 0;
         |double $s = 0.0;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $ka.getUTF8String($i).compareTo($kb.getUTF8String($j));
         |  if ($cmp == 0) { $s += $va.getDouble($i) * $vb.getDouble($j); $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SortedTermDot =
    copy(keysA = newFirst, valsA = newSecond, keysB = newThird, valsB = newFourth)
}

/** Codegen'd intersection size of two SORTED duplicate-free string
  * arrays — one O(n+m) merge scan per pair.
  *
  * Verification step of set-similarity joins (n-gram Jaccard, D2): the
  * candidate pairs come from a prefix-filtered inverted index; the exact
  * overlap is then counted here without re-exploding either side.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
