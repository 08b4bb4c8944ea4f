package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * The Spark-side machinery — schema, size-aware partitioning, batch-shaped
  * decode, feature columns — is real and tested; the pixel/sample decoding
  * itself is a clearly-marked DETERMINISTIC STUB (`decodeStub`), because
  * this container ships no image/audio libraries. Swapping in a real
  * decoder is a one-function change: keep the signature
  * `binary → struct(width, height, channels, n_frames, features)`.
  *
  * Scale notes (100 TB of media):
  *   - media rows are orders of magnitude wider than metadata rows — always
  *     project metadata-only queries BEFORE touching the binary column so
  *     parquet column pruning skips the blobs entirely;
  *   - decode is per-row map work; partition by byte size
  *     (`repartitionByRange` on `octet_length`) so one straggler partition
  *     doesn't hold 10 GB of video while others hold thumbnails;
  *   - a real decoder batches per-partition (the JNI/FFmpeg analog of
  *     mapInPandas): `mapPartitions` with a reusable decoder instance, not
  *     a per-row UDF, when decode has setup cost.
  */
object Multimodal {

  /** Synthesize a media table from `documents`: UTF-8 bytes stand in for
    * the blob; type assigned round-robin. Real pipelines read
    * `spark.read.format("binaryFile")` or parquet with a binary column. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("declared_bytes")).as("metadata"))

  /** 1-based byte accessor on the (ASCII-synthesized) binary column. */
  private def byteAt(media: Column, pos1: Column): Column =
    ascii(decode(media, "UTF-8").substr(pos1, lit(1))).cast("long")

  /** Byte-sum as a pure column fold (codegen-friendly, no UDF). */
  private def byteSum(media: Column): Column =
    aggregate(
      transform(sequence(lit(1), octet_length(media)), i => byteAt(media, i)),
      lit(0L), (acc, b) => acc + b)

  /** DETERMINISTIC STUB decode — stands in for the real image/audio
    * decoder. Width/height derive from the first two bytes, frames from
    * 256-byte chunks; features are [total bytes, first byte, last byte,
    * byte-sum mod 997] — all cheap column programs, all oracle-verifiable. */
  def decodeStub(media: Column): Column = struct(
    (byteAt(media, lit(1)) % 64 + 1).cast("int").as("width"),
    (byteAt(media, lit(2)) % 64 + 1).cast("int").as("height"),
    lit(3).as("channels"),
    ceil(octet_length(media) / lit(256.0)).cast("int").as("n_frames"),
    array(
      octet_length(media).cast("double"),
      byteAt(media, lit(1)).cast("double"),
      byteAt(media, octet_length(media).cast("long")).cast("double"),
      pmod(byteSum(media), lit(997L)).cast("double")).as("features"))

  /** DETERMINISTIC STUB perceptual hash — the pHash shape over the stub
    * byte domain: split the blob into 32 BALANCED chunks (boundaries
    * ⌊c·L/32⌋, so lengths differ by at most one byte — a fixed-size last
    * chunk would bias its bit for every blob at once), bit c = 1 iff
    * chunk c's byte-sum exceeds the per-chunk mean (compared as
    * `sum_c · 32 > total`, all integer — no FP anywhere). Robust to
    * small local edits the way a real pHash is robust to re-encoding:
    * one changed byte moves one chunk sum slightly, not 32 bits. A real
    * implementation swaps THIS function for DCT-over-pixels with the
    * same `binary → long` signature; everything downstream (bucketing,
    * hamming verify) is representation-agnostic. JIT'd one-pass kernel
    * (the declarative form would fold the blob 33×). */
  def phashBytes(media: Array[Byte]): Long =
    if (media == null || media.isEmpty) 0L
    else {
      val L = media.length
      val sums = new Array[Long](32)
      var total = 0L
      var c = 0
      while (c < 32) {
        var i = (c * L) / 32
        val end = ((c + 1) * L) / 32
        while (i < end) {
          val b = media(i) & 0xffL
          sums(c) += b
          total += b
          i += 1
        }
        c += 1
      }
      var ph = 0L
      c = 0
      while (c < 32) {
        if (sums(c) * 32 > total) ph |= (1L << c)
        c += 1
      }
      ph
    }

  val phashStub = udf { (media: Array[Byte]) => phashBytes(media) }

  /** DETERMINISTIC STUB audio framing: the blob's bytes stand in for PCM
    * samples; frame w covers bytes [w·frameLen, min((w+1)·frameLen, L)).
    * Emits one row per frame with its exact integer energy Σ sample² —
    * the windowed-feature shape (RMS/energy/VAD) every audio pipeline
    * starts with. A real decoder replaces the byte accessor with PCM
    * decode at the same frame boundaries; the explode/aggregate plumbing
    * downstream is representation-agnostic. */
  def audioFrames(media: DataFrame, frameLen: Int): DataFrame = {
    val t = decode(col("media"), "UTF-8")
    media
      .withColumn("t", t)
      .withColumn("win",
        explode(sequence(lit(0),
          ceil(length(col("t")) / lit(frameLen.toDouble)).cast("int") - 1)))
      .withColumn("seg", expr(s"substring(t, win * $frameLen + 1, $frameLen)"))
      .withColumn("n_bytes", length(col("seg")).cast("long"))
      .withColumn("energy", aggregate(
        transform(sequence(lit(1), length(col("seg"))),
          i => {
            val c = ascii(col("seg").substr(i, lit(1))).cast("long")
            c * c
          }),
        lit(0L), (acc, x) => acc + x))
      .withColumn("win", col("win").cast("long"))
  }

  /** Stub "resize": halve stub dimensions — metadata-only transform. */
  def resizeStub(decoded: Column): Column =
    decoded
      .withField("width", greatest((decoded("width") / 2).cast("int"), lit(1)))
      .withField("height", greatest((decoded("height") / 2).cast("int"), lit(1)))

  /** Frame sampling for "video" rows: every k-th 256-byte chunk index. */
  def frameSample(decoded: Column, k: Int): Column =
    filter(sequence(lit(0), decoded("n_frames") - 1), i => i % k === 0)
}
