package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Codegen'd Morton (Z-order) bit interleave of two dimension columns.
  *
  * THE data-layout lever for multi-dimensional scan pruning at 100 TB:
  * sort (or range-partition) a table by z = interleave(x, y) and rows
  * close in BOTH dimensions land in the same file/row-group, so
  * per-file min/max statistics prune selective predicates on EITHER
  * dimension — where a lexicographic sort on (x, y) only ever prunes
  * on x. This expression is the kernel; writer-side it feeds
  * `sortWithinPartitions`/`repartitionByRange`, query-side a z-bucket
  * (z div 2^(2k)) is a 2^k × 2^k tile of the key space whose extent
  * bounds are provable (ZOrderSpec pins them; the m6 catalog query
  * reports them per bucket as the pruning evidence).
  *
  * Semantics are pure int64 bit arithmetic (the classic mask-shift
  * bit spread), so any engine replays z exactly — the DuckDB oracle
  * recomputes it with the identical mask chain. The domain is
  * [0, 2^32) PER DIMENSION: negatives would interleave the sign
  * extension, values ≥ 2^32 would be truncated to their low 32 bits —
  * both are rejected in eval to fail loudly rather than silently
  * scramble the curve (callers with wider keys bucket/shift them into
  * the 32-bit domain first).
  *
  * A native Expression (with doGenCode) rather than a composed column
  * graph: the 12-op mask chain per dimension would be a 24-node
  * Catalyst tree per call site, and a Scala UDF would box every row;
  * this stays one generated static call inside whole-stage codegen.
  */
case class ZInterleaveExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_interleave"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType ||
        e.dataType == ShortType || e.dataType == ByteType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleaveExpr.interleave(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZInterleaveExpr.interleave((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleaveExpr =
    copy(left = newLeft, right = newRight)
}

object ZInterleaveExpr {

  /** Spread the low 32 bits of `v` onto the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Largest key the 2×32-bit curve can represent per dimension. */
  val MaxInput: Long = 0xFFFFFFFFL

  /** z-value: bits of `a` on even positions, bits of `b` on odd.
    * Domain is [0, 2^32) per dimension — inputs outside it are rejected
    * (a negative input would interleave the sign extension; one ≥ 2^32
    * would be truncated to its low 32 bits by spread()) so an
    * out-of-domain key fails loudly rather than silently scrambling the
    * curve (ADVICE r10 #2).
    */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || b < 0 || a > MaxInput || b > MaxInput)
      throw new IllegalArgumentException(
        s"z_interleave requires inputs in [0, 4294967295], got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }

  /** The identical mask chain as portable SQL (the oracle side).
    * NOTE: the SQL form has no domain guard — like spread(), it keeps
    * only the LOW 32 bits of `e`. Oracle call sites must feed the same
    * [0, 2^32) domain interleave() enforces, or the two sides diverge.
    */
  def spreadSql(e: String): String = {
    var x = s"(($e) & 4294967295)"
    x = s"(($x | ($x << 16)) & 281470681808895)"
    x = s"(($x | ($x << 8)) & 71777214294589695)"
    x = s"(($x | ($x << 4)) & 1085102592571150095)"
    x = s"(($x | ($x << 2)) & 3689348814741910323)"
    x = s"(($x | ($x << 1)) & 6148914691236517205)"
    x
  }

  def interleaveSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Column-API form. */
  def apply(a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(ZInterleaveExpr(
      org.apache.spark.sql.GraftShims.expression(a),
      org.apache.spark.sql.GraftShims.expression(b)))
}
