package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the hashed-feature classifier family
  * (q101/q104/q105 + the streaming twin) — the "hot-kernel upgrade"
  * q101's scaladoc promised for real scale.
  *
  * The SQL form is a nested higher-order `aggregate`:
  *
  *   score = aggregate(filter(split(text,' '), w -> w <> ''), 0L,
  *     (acc, w) -> acc + pmod(pmod(aggregate(sequence(1, length(w)), 7L,
  *         (a, i) -> pmod(a*31 + ascii(substring(w, i, 1)), 1048573)),
  *       64) * 2654435761, 17) - 8)
  *
  * Catalyst interprets HOF lambdas (no codegen), and
  * `substring(w, i, 1)` re-locates codepoint i by scanning from byte 0
  * — the same per-element tax (plus boxing garbage) the CharGrams
  * kernel removed from q99. Measured on q104's training path: the two
  * corpus-wide fold passes (features + labels) ran as 0.61 s + 0.56 s
  * single-task stages at bench SF, and SPREADING them did not help —
  * 32 concurrently interpreting tasks inflated taskSum to 26 CPU-s
  * with ~1 s of GC for work one core does in 1.1 s (StageClock, r13).
  * The fix is the kernel itself, not the width.
  *
  * Bit-compatibility contract (property-pinned against the SQL twin in
  * ClassifierExpressionsSpec, multibyte included): `length`/`substring`
  * are codepoint-indexed and `ascii` yields the full Unicode codepoint
  * (verified against Spark: ascii('€') = 8364, ascii('𝄞') = 119070),
  * so the kernels decode codepoints straight off the UTF-8 bytes (the
  * CharGramsKernel zero-copy discipline — no per-row String decode);
  * words are maximal runs between U+0020 spaces exactly as
  * `filter(split(text, ' '), w -> w <> '')` produces them. All
  * arithmetic stays in the SQL form's nonneg ranges (a < 2^20,
  * a*31 + cp ≤ 31·(2^20−5) + 0x10FFFF < 2^26, bucket·2654435761
  * < 2^38), so plain `%` equals `pmod`. */
object ClassifierFoldKernel {
  private final val FoldSeed = 7L
  private final val FoldMod = 1048573L
  private final val Buckets = 64L
  private final val Mix = 2654435761L
  /** What the SQL fold computes on the EMPTY string — NOT the seed:
    * `sequence(1, length(w))` is `sequence(1, 0)` = [1, 0] (Spark's
    * default step is −1 when start > stop), and `ascii('')` is 0, so
    * the fold runs twice over cp = 0: ((7·31) % M · 31) % M = 6727.
    * Replicated literally so the kernel matches the SQL twin for ANY
    * bucket modulus — at Buckets = 64 the two happen to agree even
    * without this (31² = 961 ≡ 1 mod 64), which is exactly the kind of
    * coincidence a modulus change would silently break (r13 review). */
  private final val EmptySqlFold = ((FoldSeed * 31L) % FoldMod * 31L) % FoldMod

  /** One codepoint-at-a-time fold over UTF-8 bytes [start, end) —
    * stride and decode mirror `UTF8String.codePointFrom`
    * (`numBytesForFirstByte` picks the width; the lead byte is masked
    * by width and continuation bytes OR in 6 bits each), so on valid
    * UTF-8 this is bit-identical to Spark's ascii/substring walk, and
    * on MALFORMED bytes it strides the same way Spark does: a stray
    * continuation or invalid lead byte (0x80-0xBF, 0xF8-0xFF) is a
    * width-1 step decoded as `b & 0x7F` — NOT a 4-byte sequence lead
    * (r13 ADVICE: the hand-rolled stride diverged from the SQL twin
    * there; the sibling CharGrams kernel already used the canonical
    * stride). Residual precondition, stated for the contract: a
    * multibyte sequence TRUNCATED by the end of the word is decoded
    * from the bytes present (Spark would read past the slice), which
    * valid UTF-8 cannot produce — split(' ') cuts on whole codepoints. */
  private def foldCodepoints(bytes: Array[Byte], start: Int, end: Int): Long = {
    var a = FoldSeed
    var i = start
    while (i < end) {
      val b0 = bytes(i) & 0xFF
      val n = UTF8String.numBytesForFirstByte(bytes(i))
      var cp =
        if (n == 1) b0 & 0x7F
        else if (n == 2) b0 & 0x1F
        else if (n == 3) b0 & 0x0F
        else b0 & 0x07
      var k = 1
      while (k < n && i + k < end) {
        cp = (cp << 6) | (bytes(i + k) & 0x3F)
        k += 1
      }
      a = (a * 31L + cp) % FoldMod
      i += n
    }
    a
  }

  /** The per-word 64-bucket char fold — `classifierFeatures`' bucket
    * column. Input is one word (no spaces); spaces, if present, are
    * folded like any other codepoint, matching the SQL twin applied to
    * the same string. */
  def bucket(w: UTF8String): Long = {
    val bytes = w.getBytes
    val a = if (bytes.length == 0) EmptySqlFold
      else foldCodepoints(bytes, 0, bytes.length)
    a % Buckets
  }

  private val scoreSchema = StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
  def schema: StructType = scoreSchema

  /** Whole-text stand-in score + token count in ONE pass: per word,
    * weight = pmod(bucket * 2654435761, 17) - 8, summed; n_tokens =
    * the non-empty word count (what `size(filter(split(...)))`
    * returns). Empty text → (0, 0), matching `aggregate` over an empty
    * array returning its seed. */
  def score(s: UTF8String): InternalRow = {
    // byte-level word scan: U+0020 is a single byte in UTF-8 and can
    // never appear inside a multibyte sequence (continuation bytes all
    // have the high bit set), so splitting on the 0x20 byte is exact
    val bytes = s.getBytes
    val n = bytes.length
    var score = 0L
    var nTok = 0L
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) i += 1
      else {
        val start = i
        while (i < n && bytes(i) != 0x20) i += 1
        nTok += 1L
        score += (foldCodepoints(bytes, start, i) % Buckets) * Mix % 17L - 8L
      }
    }
    new GenericInternalRow(Array[Any](score, nTok))
  }
}

/** [[ClassifierFoldKernel.bucket]] as a codegen'd unary expression —
  * the feature-build kernel (q104/q105 training). Null-propagating,
  * like the SQL fold it replaces. */
case class WordBucket(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_word_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    ClassifierFoldKernel.bucket(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ClassifierFoldKernel.bucket($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[ClassifierFoldKernel.score]] as a codegen'd unary expression —
  * the whole-text inference kernel (q101, labels, the streaming
  * classify twin). Returns struct(score BIGINT, n_tokens BIGINT);
  * null-propagating, matching the SQL program's behavior on NULL text
  * (split → filter → aggregate/size all propagate NULL under ANSI). */
case class ClassifierScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ClassifierFoldKernel.schema
  override def prettyName: String = "graft_classifier_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    ClassifierFoldKernel.score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ClassifierFoldKernel.score($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
