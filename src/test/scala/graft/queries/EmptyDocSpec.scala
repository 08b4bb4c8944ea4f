package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Empty documents are in-domain (a scraper CAN emit one) but the
  * driver's generator never has — so nothing in the parity gate
  * exercises the ANSI edges an empty text hits: `element_at` on an
  * empty (non-null) pixel array throws INVALID_ARRAY_INDEX, and a
  * zero `length(text)` divisor throws DIVIDE_BY_ZERO, both verified
  * live on this Spark build. This fixture pins the guards so a future
  * regeneration (or a real corpus) with empty docs cannot fail whole
  * queries. */
class EmptyDocSpec extends SparkSuite {
  import spark.implicits._

  /** documents-shaped dir: doc_id 3 is EMPTY text and lands on the
    * image media route (3 % 3 == 0 → 0x0 BMP → empty pixels array). */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-emptydoc").toString
    Seq(
      (1L, "the quick brown fox jumps", "en", "src1", 25L),
      (2L, "a b c d e f g", "en", "src1", 13L),
      (3L, "", "en", "src2", 0L),
      (4L, "la la la the the", "en", "src2", 16L),
      (5L, "one two three four five six", "en", "src3", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q30 text stats survive an empty document (zero-length divisor)") {
    val rows = TextOps.q30TextStats(spark, dir).collect()
    assert(rows.length == 5)
    val empty = rows.find(_.getLong(0) == 3L).get
    // split('', ' ') = [''] → 1 token; the alpha-ratio term guards to 0
    assert(empty.getLong(1) == 1L, "n_tokens")
    assert(empty.getLong(3) == 0L, "n_chars_computed")
    assert(!empty.getDouble(7).isNaN && !empty.getDouble(7).isInfinite)
  }

  test("q81 code detect survives an empty document") {
    val rows = TextOps.q81CodeDetect(spark, dir).collect()
    val empty = rows.find(_.getLong(0) == 3L).get
    assert(empty.getLong(1) == 0L && empty.getDouble(2) == 0.0)
    assert(!empty.getBoolean(3))
  }

  test("q101 classifier scores an empty document as zero, keep=true") {
    val rows = TextOps.q101QualityClassifier(spark, dir).collect()
    val empty = rows.find(_.getLong(0) == 3L).get
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L)
    assert(empty.getDouble(3) == 0.0 && empty.getBoolean(4))
  }

  test("q93/q103 LM scores: an empty document emits no row, the rest score") {
    val q93 = TextOps.q93LmScore(spark, dir).collect()
    assert(q93.map(_.getLong(0)).toSet == Set(1L, 2L, 4L, 5L)) // <2 tokens → no bigrams
    assert(q93.forall(r => !r.getDouble(2).isNaN))
    val q103 = TextOps.q103LmScorePruned(spark, dir).collect()
    assert(q103.map(_.getLong(0)).toSet == Set(1L, 2L, 4L, 5L))
    // on this tiny corpus only the repeated bigrams survive the c>=2
    // prune; every fallback is still a finite add-one floor
    assert(q103.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(q103.forall(r => !r.getDouble(3).isNaN && r.getDouble(5) > 0.0))
  }

  test("q104/q105 train and score through an empty document (bias-only features)") {
    TextOps.clearTrainMemo() // other suites may have trained other dirs
    val steps = TextOps.q104ClassifierTrain(spark, dir).collect()
    assert(steps.length == 12 * 65)
    val lastWrong = steps.filter(_.getLong(0) == 12L).head.getLong(3)
    assert(lastWrong <= 5L)
    val inf = TextOps.q105ClassifierLearned(spark, dir).collect()
    assert(inf.length == 5)
    val empty = inf.find(_.getLong(0) == 3L).get
    // the empty doc carries only the bias feature: its score IS the
    // learned bias weight, its teacher label +1 (score-0 convention)
    val bias = steps.filter(r => r.getLong(0) == 12L && r.getLong(1) == 64L)
      .head.getLong(2)
    assert(empty.getLong(3) == bias, "empty doc must score the bias weight")
    assert(empty.getLong(2) == 1L)
  }

  test("q104 on a ZERO-document corpus: weights stay 0, n_wrong is NULL") {
    // the oracle's per-epoch error count is SUM over an empty residual
    // set → NULL; the driver-resident trainer must mirror that, not
    // default to 0 (review-found parity edge on the r8 rewrite)
    val d = java.nio.file.Files.createTempDirectory("graft-zerodoc").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    TextOps.clearTrainMemo()
    try {
      val steps = TextOps.q104ClassifierTrain(spark, d).collect()
      assert(steps.length == 12 * 65)
      assert(steps.forall(_.getLong(2) == 0L), "weights must stay 0")
      assert(steps.forall(_.isNullAt(3)), "n_wrong must be NULL, not 0")
    } finally TextOps.clearTrainMemo() // don't leak the zero-doc model
  }

  test("q40 media decode survives a 0x0 image (empty non-null pixels)") {
    val rows = Media.q40MediaDecode(spark, dir).collect()
    assert(rows.length == 5)
    val img0 = rows.find(_.getLong(0) == 3L).get
    // 0x0 BMP decodes clean: empty pixels, features guard to 0
    assert(img0.getString(1) == "image")
    assert(img0.getInt(3) == 0 && img0.getInt(4) == 0) // width, height
    assert(img0.getDouble(7) == 0.0 && img0.getDouble(8) == 0.0) // f_len, f_first
  }
}
