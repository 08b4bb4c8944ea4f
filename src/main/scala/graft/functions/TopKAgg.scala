package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** One candidate row for [[TopKAgg]]: `ns` is the negated similarity
  * (so ascending struct order = best-first), tie-broken by neighbor id
  * — the same comparator `array_sort(collect_list(struct(ns, id,
  * sim)))` applies, so swapping the aggregates cannot change output. */
final case class TopKCand(ns: Double, neighborId: Long, sim: Double)

/** Aggregation buffer wrapper (Seq alone is not a Product, and the
  * buffer must ride a product encoder into the state store). */
final case class TopKBuf(items: Seq[TopKCand])

/** Bounded top-k aggregate: the buffer — which IS the streaming state
  * for a windowed agg — holds at most 2k candidates at any time, and
  * at most k after each truncation, instead of every joined candidate
  * the way `collect_list` does. With ~9/256 of the corpus probing per
  * query (the SRP multi-probe rate), an unbounded list is millions of
  * structs of RocksDB state per hot query window at corpus scale; this
  * is k of them. Top-k survives truncation because every cut keeps the
  * k best: top-k(A ++ B) = top-k(top-k(A) ++ top-k(B)). */
class TopKAgg(k: Int) extends Aggregator[TopKCand, TopKBuf, TopKBuf] {
  require(k >= 1, s"k must be >= 1, got $k")
  @transient private lazy val ord: Ordering[TopKCand] =
    Ordering.by((c: TopKCand) => (c.ns, c.neighborId, c.sim))
  private def bound(s: Seq[TopKCand]): Seq[TopKCand] = s.sorted(ord).take(k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)
  override def reduce(b: TopKBuf, a: TopKCand): TopKBuf = {
    val appended = b.items :+ a
    // amortize the sort: truncate on reaching 2k, never exceed it
    TopKBuf(if (appended.length >= 2 * k) bound(appended) else appended)
  }
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(bound(b1.items ++ b2.items))
  override def finish(b: TopKBuf): TopKBuf = TopKBuf(bound(b.items))
  override def bufferEncoder: org.apache.spark.sql.Encoder[TopKBuf] =
    org.apache.spark.sql.Encoders.product[TopKBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[TopKBuf] =
    org.apache.spark.sql.Encoders.product[TopKBuf]
}
