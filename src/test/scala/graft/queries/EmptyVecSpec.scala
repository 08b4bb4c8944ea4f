package graft.queries

import graft.SparkSuite

/** Degenerate embedding rows are in-domain (an upstream encoder CAN
  * emit a null, an empty vector, or an all-zero vector) but the
  * driver's generator never has — the embeddings twin of EmptyDocSpec.
  * Pins the conventions the review fixed on q37 (null rows carry no
  * geometry and join nothing, matching the oracle's NULL-cosine
  * predicate; zero-norm pairs score NaN and are KEPT, matching both
  * DuckDB's total order and Spark SQL's nanSafeCompare that q61's
  * identical threshold uses) and on q59 (empty vector → all-NULL row
  * on both engines). */
class EmptyVecSpec extends SparkSuite {
  import spark.implicits._

  /** embeddings-shaped dir: 1/2 parallel unit-ish vectors, 3 all-zero,
    * 4 empty array, 5 null embedding. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-emptyvec").toString
    Seq(
      (1L, 0L, Some(Array(1.0f, 0.0f, 0.0f, 0.0f))),
      (2L, 0L, Some(Array(2.0f, 0.0f, 0.0f, 0.0f))),
      (3L, 1L, Some(Array(0.0f, 0.0f, 0.0f, 0.0f))),
      (4L, 1L, Some(Array.empty[Float])),
      (5L, 1L, Option.empty[Array[Float]]))
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q37 drops null/empty embeddings, keeps NaN (zero-norm) pairs, scores the rest") {
    val rows = Vectors.q37CosineNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // vec 4 (empty, dimension-corrupt) and vec 5 (null) join NOTHING —
    // and neither NPEs nor index-crashes the fixed-width kernel
    assert(!rows.keys.exists(k => Set(k._1, k._2).exists(Set(4L, 5L))),
      rows.keys.toString)
    // the parallel pair scores exactly 1.0 and is kept
    assert(rows((1L, 2L)) == 1.0)
    // pairs touching the all-zero vector are NaN and KEPT — the
    // !(sim < 0.4) convention both engines share
    Seq((1L, 3L), (2L, 3L)).foreach { p =>
      assert(rows.contains(p) && rows(p).isNaN, s"$p should be a kept NaN pair")
    }
    assert(rows.size == 3, rows.toString)
  }

  test("q59 emits all-NULL stats for empty and null embeddings") {
    val rows = Vectors.q59QuantizeAudit(spark, dir).collect()
    assert(rows.length == 5)
    Seq(4L, 5L).foreach { id =>
      val r = rows.find(_.getLong(0) == id).get
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
        s"vec $id must be all-NULL (oracle: list_min/max of [] are NULL, " +
          "mae guarded by len = 0)")
    }
    val normal = rows.find(_.getLong(0) == 2L).get
    assert(normal.getDouble(1) == 0.0 && normal.getDouble(2) == 2.0)
    assert(normal.getDouble(3) == 0.0) // exact reconstruction: flat + one step
  }
}
