package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.10): a bounded top-k heap as an
  * `Aggregator`. Per-group state is O(k) regardless of group size and
  * merges associatively, so Catalyst runs it partial+final: map-side
  * combine reduces each partition's group to k rows before the shuffle
  * — the scale alternative to a window row_number over fully shuffled,
  * fully sorted groups (compare w03). Ordering is (price DESC, key ASC)
  * — the same deterministic total order the window formulation uses,
  * which is what makes it oracle-checkable.
  */
case class PricedKey(price: Double, key: Long)

class TopKByPrice(k: Int)
    extends Aggregator[PricedKey, Seq[PricedKey], Seq[PricedKey]]
    with Serializable {

  private def better(a: PricedKey, b: PricedKey): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  private def bound(xs: Seq[PricedKey]): Seq[PricedKey] =
    xs.sortWith(better).take(k)

  override def zero: Seq[PricedKey] = Vector.empty
  override def reduce(buf: Seq[PricedKey], x: PricedKey): Seq[PricedKey] =
    bound(buf :+ x)
  override def merge(a: Seq[PricedKey], b: Seq[PricedKey]): Seq[PricedKey] =
    bound(a ++ b)
  override def finish(buf: Seq[PricedKey]): Seq[PricedKey] = buf

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[PricedKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[PricedKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
