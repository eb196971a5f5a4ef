package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.10): a bounded top-k heap as an
  * `Aggregator`. Per-group state is O(k) regardless of group size and
  * merges associatively, so Catalyst runs it partial+final: map-side
  * combine reduces each partition's group to k rows before the shuffle
  * — the scale alternative to a window row_number over fully shuffled,
  * fully sorted groups (compare w03).
  *
  * Generic over the element type: supply an `Ordering` where SMALLER
  * means ranked-first (scala Orderings are Serializable, so the
  * ordering ships to executors with the aggregator). The ordering must
  * be a deterministic total order for the result to be oracle-checkable
  * — break value ties with a unique key, as `TopKByPrice` does.
  */
class TopK[T](k: Int)(implicit ord: Ordering[T], enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] with Serializable {

  private def bound(xs: Seq[T]): Seq[T] = xs.sorted(ord).take(k)

  override def zero: Seq[T] = Vector.empty
  override def reduce(buf: Seq[T], x: T): Seq[T] = bound(buf :+ x)
  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = bound(a ++ b)
  override def finish(buf: Seq[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[Seq[T]] = enc
  override def outputEncoder: Encoder[Seq[T]] = enc
}

case class PricedKey(price: Double, key: Long)

/** The v05 instantiation: top-k orders per customer, ranked by
  * (price DESC, key ASC) — the same deterministic total order the
  * window formulation (w03) uses, which is what makes it
  * oracle-checkable against DuckDB. */
class TopKByPrice(k: Int) extends TopK[PricedKey](k)(
  Ordering.by((p: PricedKey) => (-p.price, p.key)),
  ExpressionEncoder())
