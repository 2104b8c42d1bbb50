package graft.sources.v2

import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse => V2AlwaysFalse, AlwaysTrue => V2AlwaysTrue, And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** STRICT V2-Predicate → V1-Filter conversion for row-MUTATING
  * commands (SQL `DELETE FROM`).
  *
  * Why Spark's own `PredicateUtils.toV1` is not usable here: it serves
  * SCAN pushdown, where handing the source a WEAKER filter is always
  * sound because Spark re-evaluates the full predicate on the returned
  * rows. A DELETE condition has no row re-evaluation — the filter IS
  * the semantics — and the pushdown-grade conversion can degrade a
  * predicate without tripping `SupportsDelete`'s count check (measured
  * on Spark 4.1: an `OR` with one untranslatable arm converts to the
  * OTHER ARM ALONE, so `a OR b` deletes only the `b` rows, silently).
  *
  * `strict` therefore converts ONLY what V1 filters express exactly —
  * single-column comparisons against literals, IN, null tests, and
  * their boolean closure — and returns None for anything else
  * (subexpressions like `%`, functions, EqualNullSafe, struct
  * references). A None answer makes `canDeleteWhere` refuse, which
  * routes the statement to the row-level ReplaceData rewrite: slower,
  * never wrong. Literal values are rendered to the EXTERNAL types the
  * V1 Filter contract carries (String, not UTF8String; java.sql.Date,
  * not epoch-day int).
  */
private[graft] object V2Filters {

  /** All-or-nothing conversion: every predicate converts or the whole
    * array refuses (a dropped conjunct would widen the delete). */
  def strictAll(predicates: Array[Predicate]): Option[Array[Filter]] = {
    val converted = predicates.map(strict)
    if (converted.forall(_.isDefined)) Some(converted.map(_.get)) else None
  }

  def strict(p: Predicate): Option[Filter] = p match {
    case and: V2And =>
      for (l <- strict(and.left()); r <- strict(and.right())) yield And(l, r)
    case or: V2Or =>
      for (l <- strict(or.left()); r <- strict(or.right())) yield Or(l, r)
    case not: V2Not => strict(not.child()).map(Not)
    case _: V2AlwaysTrue => Some(AlwaysTrue)
    case _: V2AlwaysFalse => Some(AlwaysFalse)
    case _ =>
      val kids = p.children()
      (p.name(), kids) match {
        case ("IS_NULL", Array(c)) => colOf(c).map(IsNull)
        case ("IS_NOT_NULL", Array(c)) => colOf(c).map(IsNotNull)
        case ("IN", _) if kids.length >= 1 =>
          for {
            c <- colOf(kids.head)
            vs <- traverse(kids.tail.toSeq)(litOf)
          } yield In(c, vs.toArray)
        case (op @ ("=" | "<>" | "<" | "<=" | ">" | ">="), Array(l, r)) =>
          // accept column-vs-literal either way around; flip the
          // comparison when the literal is on the left
          val straight = for (c <- colOf(l); v <- litOf(r)) yield (c, v, op)
          val flipped = for (c <- colOf(r); v <- litOf(l)) yield
            (c, v, op match {
              case "<" => ">"; case "<=" => ">="
              case ">" => "<"; case ">=" => "<="
              case other => other
            })
          straight.orElse(flipped).map {
            case (c, v, "=") => EqualTo(c, v)
            case (c, v, "<>") => Not(EqualTo(c, v))
            case (c, v, "<") => LessThan(c, v)
            case (c, v, "<=") => LessThanOrEqual(c, v)
            case (c, v, ">") => GreaterThan(c, v)
            case (c, v, _) => GreaterThanOrEqual(c, v)
          }
        case _ => None
      }
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] =
    xs.foldLeft(Option(Vector.empty[B])) { (acc, x) =>
      for (a <- acc; b <- f(x)) yield a :+ b
    }

  private def colOf(e: V2Expression): Option[String] = e match {
    case n: NamedReference if n.fieldNames().length == 1 =>
      Some(n.fieldNames().head)
    case _ => None
  }

  /** Literal → the EXTERNAL value class V1 filters carry. Types outside
    * the engine's column surface refuse (None), never miscarry. */
  private def litOf(e: V2Expression): Option[Any] = e match {
    case l: V2Literal[_] =>
      val v = l.value()
      if (v == null) return None // NULL literals: comparisons are never
      // TRUE in SQL, but V1 filters model null via IsNull only — refuse
      l.dataType() match {
        case BooleanType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType => Some(v)
        case StringType => Some(v.toString)
        case BinaryType => Some(v)
        case DateType => Some(java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)))
        case TimestampType => Some(java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plus(v.asInstanceOf[Long],
            java.time.temporal.ChronoUnit.MICROS)))
        case _ => None
      }
    case _ => None
  }
}
