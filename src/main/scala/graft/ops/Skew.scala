package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB toolbox the build rules call
  * for: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; the
  * explicit salt is for the cases AQE can't touch — aggregations over a
  * hot key, and shuffle-hash joins against a small-but-not-broadcastable
  * side. Both utilities are semantics-preserving (proved in SkewSpec).
  *
  * Salts are derived from ROW CONTENT (xxhash64 over every hashable —
  * i.e. map-free — column),
  * never from position (`monotonically_increasing_id`, `rand`,
  * `spark_partition_id`): positional salts change when a lost map task
  * recomputes a differently-fetch-ordered partition, so a stage retry
  * re-salts rows some reducers already consumed — duplicated or lost
  * rows, the SPARK-23207 class. Content hashing is retry-stable by
  * construction. The trade, documented: rows IDENTICAL in every column
  * share a salt. For the aggregate that is free (identical rows combine
  * in the map-side partial anyway — they never pile on a reducer); for
  * the join it means a key whose hot side is millions of byte-identical
  * rows still lands on one task — distinct-content skew, the case that
  * occurs in practice, spreads fully.
  */
object Skew {

  /** The columns a content salt may hash: Spark's hash expressions
    * reject MapType anywhere in the type (map iteration order is
    * undefined, so a map hash would not even be retry-stable) — a frame
    * carrying parsed props/tags maps must salt from its other columns
    * instead of throwing AnalysisException. */
  private def saltSource(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(e, _) => hashable(e)
      case StructType(fs) => fs.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.collect {
      case f if hashable(f.dataType) => col(f.name)
    }.toSeq
    require(cols.nonEmpty,
      "no hashable (map-free) columns to derive a retry-stable salt from")
    cols
  }

  /** Salted two-phase aggregation: count/sum-style aggregates over a
    * skewed key. Phase 1 aggregates on (key, salt) — spreading one hot
    * key over `salts` reducers — phase 2 merges the partials.
    *
    * Correct for any algebraic aggregate; exposed here for counts+sums
    * (the common hot-key shapes). */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df.withColumn("__salt",
        pmod(xxhash64(saltSource(df): _*), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Salted join: replicate the small side `salts` times, salt the big
    * side's key — the one hot key now lands on `salts` tasks instead of
    * one. Use when the small side is too big to broadcast but small
    * enough to replicate `salts`×. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int): DataFrame = {
    // require, don't degrade: salts = 0 would make pmod NULL for every
    // big row and sequence(0, -1) replicate bogus salts — a silently
    // EMPTY join result instead of an error
    require(salts > 0, s"salts must be positive, got $salts")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(saltSource(big): _*), lit(salts)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
