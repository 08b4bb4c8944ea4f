package graft.queries

import graft.SparkSuite

/** Physical-plan alternatives of the text near-dup operators must agree
  * exactly — the size switch picks a plan, never a different answer. */
class TextOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("q35 chunk-blocked pair join equals the broadcast all-pairs scan") {
    val broadcastRows = TextOps.q35SimhashBroadcast(spark, sf).collect().toSeq
    val blockedRows = TextOps.q35SimhashBlocked(spark, sf).collect().toSeq
    assert(broadcastRows.nonEmpty)
    assert(blockedRows == broadcastRows)
    // the dispatcher picks the broadcast plan below the size threshold
    assert(TextOps.q35Simhash(spark, sf).collect().toSeq == broadcastRows)
  }

  test("q35 blocked plan pairs via a hash equi-join, not an all-pairs scan") {
    val p = TextOps.q35SimhashBlocked(spark, sf)
      .queryExecution.executedPlan.toString
    // candidates must come from chunk-key equality (hash or sort-merge —
    // the small-side broadcast of a tiny signature table is a legitimate
    // size-based choice; at scale the same logical plan shuffle-joins),
    // never from the quadratic nested-loop scan
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }
}
