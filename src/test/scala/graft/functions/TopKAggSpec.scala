package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded accumulator must equal full-sort-take-k under any
  * reduce/merge interleaving — truncation keeps every candidate that
  * can still matter. */
class TopKAggSpec extends AnyFunSuite {

  private def brute(xs: Seq[TopKCand], k: Int): Seq[TopKCand] =
    xs.sortBy(c => (c.ns, c.neighborId, c.sim)).take(k)

  test("reduce-only stream equals brute-force top-k (incl. ties)") {
    val k = 5
    val agg = new TopKAgg(k)
    val rng = new scala.util.Random(42)
    val xs = (1 to 500).map { i =>
      val sim = (rng.nextInt(40) / 10.0) - 2.0 // coarse → many ties
      TopKCand(-sim, i.toLong, sim)
    }
    val acc = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(acc).items == brute(xs, k))
  }

  test("arbitrary merge trees equal brute-force top-k") {
    val k = 3
    val agg = new TopKAgg(k)
    val rng = new scala.util.Random(7)
    val xs = (1 to 200).map(i => TopKCand(rng.nextDouble() - 0.5, i.toLong, 0.0))
    // partition into uneven partials, reduce each, merge pairwise
    val parts = xs.grouped(17).toSeq
      .map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged = parts.reduce(agg.merge)
    assert(agg.finish(merged).items == brute(xs, k))
    // buffer bound holds at every stage
    assert(parts.forall(_.items.length < 2 * k + 17))
    assert(merged.items.length <= k)
  }

  test("fewer candidates than k returns all, sorted") {
    val agg = new TopKAgg(10)
    val xs = Seq(TopKCand(-0.9, 2L, 0.9), TopKCand(-0.95, 1L, 0.95))
    val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).items
    assert(out == brute(xs, 10))
    assert(out.head.neighborId == 1L)
  }
}
