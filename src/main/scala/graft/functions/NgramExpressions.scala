package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Adjacent-token bigrams of a token array as `array<struct<w1,w2>>` —
  * one expression evaluation per document, replacing the
  * `zip_with(slice(t,1,n-1), slice(t,2,n-1), struct)` higher-order-
  * function chain (t12's original formulation). The HOF chain is
  * semantically identical but evaluates interpreted (HOFs are
  * CodegenFallback in Spark) AND materializes two sliced copies of the
  * token array plus a per-element lambda frame before the zip — on a
  * cold JVM that tripled t12's runtime. Here the bigram array is built
  * in a single pass over the backing ArrayData with no intermediate
  * copies; this expression is itself eval-only, but it is ONE flat loop
  * per row rather than a lambda interpreter, which is what the cold
  * path pays for.
  *
  * Emits max(size-1, 0) bigrams in order; rows with < 2 tokens emit an
  * empty array (callers keep or filter them — t12 filters).
  */
case class TokenBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "token_bigrams"

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val n = math.max(sz - 1, 0)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // copy() the UTF8Strings: ArrayData may be backed by reused
      // unsafe buffers, and these references outlive this eval call
      out(i) = InternalRow(
        toks.getUTF8String(i).copy(), toks.getUTF8String(i + 1).copy())
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenBigrams =
    copy(child = newChild)
}
