package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One candidate for the bounded top-k: a two-component descending sort
  * key. For the latest-events use the key is `(unix_micros(ts),
  * event_id)` — a TOTAL order whenever the second component is a unique
  * id, which is what makes the result deterministic under any
  * partitioning and merge order.
  */
final case class TopKItem(ord1: Long, ord2: Long)

/** Bounded-state grouped top-k as a typed [[Aggregator]] — the scale
  * sibling of the window-function form ([[graft.operators.RefOps
  * .topKPerKey]], `row_number() <= k`).
  *
  * Why two forms of the same operator: the window form shuffles EVERY
  * row of a key to one task and sorts it there — correct, and fine when
  * keys are balanced, but a hot key (one device emitting 10⁹ events)
  * lands entire on one task. This aggregator form is map-side
  * combinable: Spark plans ObjectHashAggregate partial→final, each
  * partition holds at most k items PER KEY as plain JVM state, and the
  * exchange moves at most `k × partitions` rows per key no matter how
  * hot the key is — top-k is a mergeable summary, so skew dissolves
  * into partial aggregation instead of needing salting.
  *
  * Determinism: the comparator is the full (ord1, ord2) descending
  * lexicographic order; with a unique ord2 (an id) there are no ties,
  * so the kept set and its order are independent of merge order —
  * hash-exact against a QUALIFY row_number oracle.
  *
  * State: a sorted-descending Vector of ≤ k items per group per
  * partition; insert is O(k) for the small k this is for (top-N-per-
  * device dashboards). Items beyond k are dropped at every step, so
  * buffers never grow with input size.
  */
final class BoundedTopK(k: Int)
    extends Aggregator[TopKItem, Seq[TopKItem], Seq[TopKItem]] {
  require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")

  private val desc: Ordering[TopKItem] =
    Ordering.by[TopKItem, (Long, Long)](i => (-i.ord1, -i.ord2))

  override def zero: Seq[TopKItem] = Vector.empty

  override def reduce(b: Seq[TopKItem], x: TopKItem): Seq[TopKItem] =
    if (b.length == k && desc.lteq(b.last, x)) b
    else ((b :+ x).sorted(desc)).take(k)

  override def merge(a: Seq[TopKItem], b: Seq[TopKItem]): Seq[TopKItem] = {
    // both inputs are sorted; a linear merge keeps this O(k)
    val out = Vector.newBuilder[TopKItem]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && desc.lteq(a(i), b(j)))
      out += (if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) })
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[TopKItem]): Seq[TopKItem] = b

  override def bufferEncoder: Encoder[Seq[TopKItem]] = BoundedTopK.seqEnc
  override def outputEncoder: Encoder[Seq[TopKItem]] = BoundedTopK.seqEnc
}

object BoundedTopK {
  private val seqEnc: Encoder[Seq[TopKItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKItem]]()

  /** Column-API entry: `bounded_topk(k)(unix_micros(ts), event_id)`. */
  def apply(k: Int)(ord1: Column, ord2: Column): Column =
    udaf(new BoundedTopK(k), Encoders.product[TopKItem]).apply(ord1, ord2)
}
