package graft.streaming

import graft.SparkSuite

/** The bounded LM-model contract (the r7 judge's one scale finding):
  * CorpusStream.lmModel must never collect an unbounded corpus-derived
  * table — count-threshold prune + deterministic top-K cap, with c1
  * keeping EXACT full-corpus totals for retained leading words. These
  * tests pin the contract on a hand-built corpus where every bound
  * bites; the defaults-keep-everything replay (bit-identity with q93)
  * stays in CorpusStreamSpec, and the oracle-graded version is q103.
  */
class LmModelSpec extends SparkSuite {

  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("count-threshold prune drops rare bigrams; c1 keeps full totals") {
    // counts: (a,b)=3, (b,x)=(b,y)=(b,z)=1, (a,c)=1, (d,e)=2
    val docs = corpus("a b x", "a b y", "a b z", "a c", "d e", "d e")
    val m = CorpusStream.lmModel(docs, minCount = 2L)
    assert(m.c2 == Map(("a", "b") -> 3L, ("d", "e") -> 2L))
    // c1("a") = 4: the pruned (a,c) still counts toward the context
    // total, so a retained bigram's denominator never drifts from q93's
    assert(m.c1 == Map("a" -> 4L, "d" -> 2L))
    assert(m.v == 8L) // a b x y z c d e
  }

  test("top-K cap keeps the highest-count bigrams, ties (w1,w2) ascending") {
    // counts: (a,b)=2, (b,a)=2, (c,c)=2, (x,y)=1 — cap 2 of the 3 tied
    // survivors must pick (a,b) and (b,a) by the (w1, w2) tie-break
    val docs = corpus("a b a b a", "c c", "c c", "x y")
    val m = CorpusStream.lmModel(docs, minCount = 2L, maxEntries = 2)
    assert(m.c2 == Map(("a", "b") -> 2L, ("b", "a") -> 2L))
    assert(m.c1.keySet == Set("a", "b"))
    // cap bound holds by construction on both tables
    assert(m.c2.size <= 2 && m.c1.size <= 2)
  }

  test("pruned-model scoring: retained exact, pruned floors, dropped-w1 floor") {
    val docs = corpus("a b x", "a b y", "a b z", "a c", "d e", "d e")
    val m = CorpusStream.lmModel(docs, minCount = 2L, maxEntries = 1)
    // only (a,b) retained; c1("a")=4 (full), v=8
    assert(m.c2 == Map(("a", "b") -> 3L) && m.c1 == Map("a" -> 4L))
    val scored = CorpusStream.lmScore(corpus("a b", "a c", "d e"), m)
      .select("doc_id", "sum_p").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(0L) == (3L + 1.0) / (4L + 8L)) // retained: exact
    assert(scored(1L) == (0L + 1.0) / (4L + 8L)) // pruned bigram, kept w1
    assert(scored(2L) == (0L + 1.0) / (0L + 8L)) // dropped leading word
  }

  test("defaults prune nothing: model equals the exhaustive counts") {
    val docs = corpus("a b x", "a c", "d e a b")
    val m = CorpusStream.lmModel(docs)
    assert(m.c2 == Map(("a", "b") -> 2L, ("b", "x") -> 1L, ("a", "c") -> 1L,
      ("d", "e") -> 1L, ("e", "a") -> 1L))
    assert(m.c1 == Map("a" -> 3L, "b" -> 1L, "d" -> 1L, "e" -> 1L))
    assert(m.v == 6L)
  }
}
