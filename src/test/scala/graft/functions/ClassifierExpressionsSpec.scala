package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The native classifier kernels (WordBucket / ClassifierScore) must be
  * bit-compatible with the SQL column program they replaced — that SQL
  * form mirrors the DuckDB oracle fold verbatim, so these pins are what
  * lets the q101/q104/q105 oracles keep hash-matching after the swap
  * (the CharGrams precedent: kernel == SQL twin, multibyte included). */
class ClassifierExpressionsSpec extends SparkSuite {
  import spark.implicits._

  // adversarial word set: ascii, 2/3/4-byte codepoints, the fold's
  // modulus edges (long runs), and the empty string — which is NOT the
  // seed case: sequence(1, 0) is [1, 0] (Spark steps −1 when start >
  // stop) and ascii('') is 0, so the SQL fold of '' is 6727, which the
  // kernel replicates literally (ClassifierFoldKernel.EmptySqlFold;
  // at 64 buckets 6727 and 7 coincide because 31² ≡ 1 mod 64, but the
  // kernel must not depend on that) — plus a
  // seeded-random batch over the full assignable codepoint range
  // (surrogate-pair codepoints included), so the pin does not depend
  // on anyone's imagination of which codepoint breaks first
  private val words: Seq[String] = {
    val fixed = Seq(
      "", "a", "the", "supercalifragilisticexpialidocious",
      "héllo", "wörld", "日本語", "テスト", "😀", "a😀b", "€uro",
      "x" * 500, "aé𝄞b", "ASCII-with-punct!?", "123456789")
    val rnd = new scala.util.Random(0x5eed)
    def randCp(): Int = {
      // assignable, non-surrogate codepoints across all widths
      val r = rnd.nextInt(4) match {
        case 0 => 0x21 + rnd.nextInt(0x5e)          // 1-byte printable
        case 1 => 0x80 + rnd.nextInt(0x780)          // 2-byte
        case 2 => 0x800 + rnd.nextInt(0xF800)        // 3-byte
        case _ => 0x10000 + rnd.nextInt(0x10000)     // 4-byte
      }
      if (r >= 0xD800 && r <= 0xDFFF) 0x3042 else r  // skip surrogates
    }
    val random = (1 to 300).map { _ =>
      val sb = new java.lang.StringBuilder
      (0 until 1 + rnd.nextInt(12)).foreach(_ => sb.appendCodePoint(randCp()))
      sb.toString
    }
    fixed ++ random
  }

  test("WordBucket equals the SQL aggregate fold, multibyte included") {
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
    val sqlTwin = expr(
      """pmod(aggregate(sequence(1, length(w)), CAST(7 AS BIGINT),
        |  (a, i) -> pmod(a * 31 + ascii(substring(w, i, 1)), 1048573)), 64)"""
        .stripMargin)
    val rows = df.select(col("id"),
        GraftFunctions.wordBucket(col("w")).as("k"), sqlTwin.as("s"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"word id=${r.getLong(0)}"))
  }

  test("ClassifierScore equals the SQL column program row-for-row (incl. NULL and empty)") {
    // fixed shapes + seeded-random texts assembled from the word pool
    // (space-joined, sometimes with runs of spaces)
    val rnd = new scala.util.Random(0xd0c5)
    val randomTexts = (1 to 100).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    val texts = (Seq(
      "",                         // no words → score 0, n_tokens 0
      "   ",                      // only spaces → same
      "one two three",
      "  leading and   multiple    spaces  ",
      "héllo wörld ünïcode tëxt",
      "日本語の テキスト です",
      "a😀b 😀 c😀d",
      ("lorem ipsum " * 200).trim, // many words
      null.asInstanceOf[String])   // NULL propagates on BOTH sides
      ++ randomTexts)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val native = graft.queries.TextOps.classifierScored(df)
      .select("doc_id", "n_tokens", "score", "mean_weight", "keep")
      .collect().sortBy(_.getLong(0)).toSeq
    val sql = graft.queries.TextOps.classifierScoredSql(df)
      .select("doc_id", "n_tokens", "score", "mean_weight", "keep")
      .collect().sortBy(_.getLong(0)).toSeq
    assert(native == sql)
  }

  test("q101 output is unchanged by the native kernel at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.queries.TextOps.q101QualityClassifier(spark, sf)
      .collect().toSeq
    assert(a.nonEmpty)
    val b = graft.queries.TextOps.classifierScoredSql(
        graft.Tables.documents(spark, sf))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        col("mean_weight"), col("keep"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }

  test("fold strides MALFORMED UTF-8 the way UTF8String does (r14 ADVICE)") {
    // A stray continuation byte (0x80-0xBF) or invalid lead (0xF8-0xFF)
    // must be a width-1 step decoded as b & 0x7F — what
    // UTF8String.numBytesForFirstByte + codePointFrom produce — not a
    // 4-byte sequence lead swallowing the following characters. Pinned
    // against a codePointFrom-based reference walk, since malformed
    // bytes cannot be produced through a DataFrame string literal.
    // (The one stated precondition stays: no multibyte sequence
    // TRUNCATED by the end of the slice — codePointFrom itself reads
    // out of bounds there, so there is no canonical answer to pin.)
    import org.apache.spark.unsafe.types.UTF8String
    def refBucket(bytes: Array[Byte]): Long = {
      val u = UTF8String.fromBytes(bytes)
      var a = 7L
      var i = 0
      while (i < bytes.length) {
        a = (a * 31L + u.codePointFrom(i)) % 1048573L
        i += UTF8String.numBytesForFirstByte(bytes(i))
      }
      a % 64L
    }
    val vectors: Seq[Array[Byte]] = Seq(
      Array(0x80, 'a', 'b', 'c'),             // stray continuation, lead pos
      Array('a', 0xBF, 'b'),                  // stray continuation, mid
      Array(0xFF, 0xFE, 'x'),                 // invalid leads
      Array(0xF8, 'a', 'b', 'c', 'd'),        // 5-byte-lead byte (invalid)
      Array('a', 0x80, 0x80, 'b'),            // continuation run
      Array(0xC3, 0xA9, 0x80, 'z'),           // valid é then stray cont
      Array(0xE2, 'a', 'b', 'c')              // 3-byte lead, non-cont follow
    ).map(_.map(_.toByte))
    vectors.zipWithIndex.foreach { case (bs, i) =>
      assert(ClassifierFoldKernel.bucket(UTF8String.fromBytes(bs)) == refBucket(bs),
        s"vector $i: ${bs.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
    }
  }

  test("registered in SQL as graft_word_bucket / graft_classifier_score") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_word_bucket('hello'), graft_classifier_score('a b c').score")
      .collect().head
    val expected = spark.sql(
      """SELECT pmod(aggregate(sequence(1, length('hello')), CAST(7 AS BIGINT),
        |  (a, i) -> pmod(a * 31 + ascii(substring('hello', i, 1)), 1048573)), 64)"""
        .stripMargin).collect().head.getLong(0)
    assert(r.getLong(0) == expected)
    assert(!r.isNullAt(1))
  }
}
