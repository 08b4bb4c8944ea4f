package graft

/** The driver's smoke contract: entry() returns rows on sf0.001, and
  * every declared query has either an oracle or a documented rows-only
  * reason. */
class EntrySpec extends SparkSuite {

  test("entry flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map covers every query except the documented rows-only set") {
    // q39/q49: approximate by construction (recall measured in
    // VectorsSpec). q50 graduated to a hash-matched window-SQL oracle in
    // round 3; q29 to a SQL-pairing + pinned-key-lookup oracle in round 5.
    val rowsOnly = Set("q39_ann_ivf", "q49_ann_lsh")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly, s"unexpected rows-only queries: $missing")
    // no orphan oracle entries
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
