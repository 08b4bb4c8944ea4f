package graft

/** The driver's smoke contract: entry() returns rows on sf0.001, and
  * every declared query has either an oracle or a documented rows-only
  * reason. */
class EntrySpec extends SparkSuite {

  test("entry flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("EVERY query has an oracle — the rows-only set is empty") {
    // q50 graduated to a hash-matched window-SQL oracle in round 3; q29
    // to a SQL-pairing + pinned-key-lookup oracle in round 5; q39/q49 —
    // the last rows-only pair — to algorithm-restating oracles in round 6
    // (the IVF and SRP-LSH constructions are deterministic, so the
    // DuckDB SQL states the ALGORITHM, not exact search; recall vs exact
    // stays pinned in VectorsSpec).
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    // no orphan oracle entries
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
