package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (BASELINE.json north star).
  *
  * The Spark-side machinery — schema, size-aware partitioning, batch-shaped
  * decode, feature columns — is real and tested, and so are the container
  * parsers for every format with an honest pure-JVM decode:
  * [[WavCodec]] (RIFF/PCM16 audio, q73), [[BmpCodec]] (24-bit still
  * image, q40), [[Y4mCodec]] (YUV4MPEG2 video, q41) — all exposed in SQL
  * as `graft_*_decode` with row-level error strings. The clearly-marked
  * DETERMINISTIC STUB (`decodeStub`) remains only for compressed formats
  * (JPEG/MP3/H.264...), since this environment ships no codec libraries;
  * swapping one in is a one-function change: keep the signature
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
    * `spark.read.format("binaryFile")` or parquet with a binary column.
    *
    * Pinned to the session width (r12, StageClock): the decode work
    * downstream is CPU-dense per-row map work, and it must not inherit
    * the SCAN's byte-based partitioning — a bench-SF documents parquet
    * is one ~0.5 MB file, i.e. ONE input partition, and q40's whole
    * codec pipeline ran as a single task at 3% core utilization (twice:
    * its sort's sample pass re-executes the child). The same r5 lesson
    * the text family's `shingled` pin encodes. One narrow exchange of
    * the text bytes; GATED since r13 (Tables.cpuWidthPin): once the
    * table's estimated row groups reach session width the scan
    * parallelizes naturally and the pin withholds itself — the 100 TB
    * plan never pays the exchange at all. */
  def mediaTable(documents: DataFrame): DataFrame =
    graft.Tables.cpuWidthPin(documents, col("doc_id")).select(
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

  /** Integer 8×32 DCT-II basis, T(u,x) = round(2^14·cos(π(2x+1)u/64)),
    * flattened u·32+x. A LITERAL table (not runtime `math.cos`) so the
    * DuckDB oracle can embed the IDENTICAL constants — cross-engine
    * equality never depends on libm rounding. */
  private[graft] val DctT: Array[Long] = Array(
    16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384,
    16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384,
    16364, 16207, 15893, 15426, 14811, 14053, 13160, 12140, 11003, 9760, 8423, 7005, 5520, 3981, 2404, 804,
    -804, -2404, -3981, -5520, -7005, -8423, -9760, -11003, -12140, -13160, -14053, -14811, -15426, -15893, -16207, -16364,
    16305, 15679, 14449, 12665, 10394, 7723, 4756, 1606, -1606, -4756, -7723, -10394, -12665, -14449, -15679, -16305,
    -16305, -15679, -14449, -12665, -10394, -7723, -4756, -1606, 1606, 4756, 7723, 10394, 12665, 14449, 15679, 16305,
    16207, 14811, 12140, 8423, 3981, -804, -5520, -9760, -13160, -15426, -16364, -15893, -14053, -11003, -7005, -2404,
    2404, 7005, 11003, 14053, 15893, 16364, 15426, 13160, 9760, 5520, 804, -3981, -8423, -12140, -14811, -16207,
    16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069, -16069, -13623, -9102, -3196, 3196, 9102, 13623, 16069,
    16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069, -16069, -13623, -9102, -3196, 3196, 9102, 13623, 16069,
    15893, 12140, 5520, -2404, -9760, -14811, -16364, -14053, -8423, -804, 7005, 13160, 16207, 15426, 11003, 3981,
    -3981, -11003, -15426, -16207, -13160, -7005, 804, 8423, 14053, 16364, 14811, 9760, 2404, -5520, -12140, -15893,
    15679, 10394, 1606, -7723, -14449, -16305, -12665, -4756, 4756, 12665, 16305, 14449, 7723, -1606, -10394, -15679,
    -15679, -10394, -1606, 7723, 14449, 16305, 12665, 4756, -4756, -12665, -16305, -14449, -7723, 1606, 10394, 15679,
    15426, 8423, -2404, -12140, -16364, -13160, -3981, 7005, 14811, 15893, 9760, -804, -11003, -16207, -14053, -5520,
    5520, 14053, 16207, 11003, 804, -9760, -15893, -14811, -7005, 3981, 13160, 16364, 12140, 2404, -8423, -15426)

  /** REAL perceptual hash — the classic pHash recipe (32×32 grid → 2D
    * DCT → 8×8 low-frequency block → bits vs median), pure-JVM integer
    * arithmetic end to end so the DuckDB oracle reproduces it
    * bit-identically:
    *
    *   1. grid: the blob's bytes fold into a 32×32 grid by balanced
    *      chunking — cell i (row-major) sums bytes
    *      [⌊i·L/1024⌋, ⌊(i+1)·L/1024⌋), clamped at 2^24 (the "synthetic
    *      byte grid": for a real image this step is
    *      grayscale-resize-to-32×32; everything after is
    *      representation-agnostic);
    *   2. 2D DCT-II via the integer basis [[DctT]] (separable:
    *      coef = T·G·Tᵀ), keeping the 8×8 lowest-frequency block — all
    *      int64, no FP anywhere. The cell clamp is what makes that
    *      sound: each pass multiplies by ≤ 32·2^14 = 2^19, so
    *      |coef| ≤ 2^24·2^38 = 2^62 < Long.MaxValue for ANY blob size,
    *      where the unclamped sum (≈ L/4 per cell) would silently wrap
    *      the JVM accumulator — and diverge from the 128-bit DuckDB
    *      oracle — past ~128 MB. The clamp only engages above ~64 MB
    *      per blob (cells > 2^24 need > 65k bytes each) and is
    *      mirrored verbatim in the q57 oracle (LEAST), so cross-engine
    *      equality holds at every size;
    *   3. the 63 AC coefficients (DC excluded — it is the overall
    *      "brightness" and always dominates) compare against their lower
    *      median: bit k = 1 iff ac(k) > med, k ∈ [0, 63) — so hashes fit
    *      non-negative in a long.
    *
    * Robust to small local edits exactly as pHash is robust to
    * re-encoding: one changed byte perturbs one grid cell slightly, which
    * perturbs every DCT coefficient by ≤ one part in ~cell-total — bits
    * only flip where a coefficient sat at the median boundary. */
  def phashBytes(media: Array[Byte]): Long =
    if (media == null || media.isEmpty) 0L
    else {
      val L = media.length
      // 1. balanced-chunk 32×32 grid (row-major)
      val g = new Array[Long](1024)
      var i = 0
      while (i < 1024) {
        var p = (i.toLong * L / 1024).toInt
        val end = ((i + 1).toLong * L / 1024).toInt
        var sum = 0L
        while (p < end) { sum += media(p) & 0xffL; p += 1 }
        g(i) = math.min(sum, 1L << 24) // overflow headroom, see scaladoc
        i += 1
      }
      // 2a. row pass: r(x,v) = Σ_y g(x,y)·T(v,y)
      val r = new Array[Long](32 * 8)
      var x = 0
      while (x < 32) {
        var v = 0
        while (v < 8) {
          var acc = 0L
          var y = 0
          while (y < 32) { acc += g(x * 32 + y) * DctT(v * 32 + y); y += 1 }
          r(x * 8 + v) = acc
          v += 1
        }
        x += 1
      }
      // 2b. column pass: coef(u,v) = Σ_x T(u,x)·r(x,v)
      val coef = new Array[Long](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0L
          var x2 = 0
          while (x2 < 32) { acc += DctT(u * 32 + x2) * r(x2 * 8 + v); x2 += 1 }
          coef(u * 8 + v) = acc
          v += 1
        }
        u += 1
      }
      // 3. 63 AC coefficients vs their lower median
      val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
      val sorted = ac.clone()
      java.util.Arrays.sort(sorted)
      val med = sorted(31)
      var ph = 0L
      var k = 0
      while (k < 63) {
        if (ac(k) > med) ph |= (1L << k)
        k += 1
      }
      ph
    }

  val phash = udf { (media: Array[Byte]) => phashBytes(media) }

  /** Fixture-side WAV synthesis: wrap each blob byte as one PCM16 sample
    * (value = the unsigned byte) in a VALID minimal RIFF/PCM16 container,
    * so the audio path exercises the REAL parser ([[WavCodec.decode]])
    * end to end while the sample values stay oracle-mirrorable from the
    * source text. */
  val wavFromBytes = udf { (blob: Array[Byte]) =>
    if (blob == null) null else WavCodec.encode(blob.map(b => b & 0xff))
  }

  /** Fixture-side BMP synthesis: the blob's bytes become one row of gray
    * pixels (r = g = b = byte) in a VALID minimal 24-bit BMP, so the
    * image path exercises the REAL parser ([[BmpCodec.decode]]) end to
    * end while pixel values stay oracle-mirrorable from the source
    * text. */
  val bmpFromBytes = udf { (blob: Array[Byte]) =>
    if (blob == null) null
    else BmpCodec.encode(blob.map(b => b & 0xff), blob.length)
  }

  /** Real BMP container parse as a column:
    * `binary → struct(width, height, channels, pixels, error)` —
    * same row-level error contract as [[wavDecode]]. */
  val bmpDecode = udf { (blob: Array[Byte]) => BmpCodec.decode(blob) }

  /** Real-decode twin of [[decodeStub]] for still images: the SAME
    * output struct shape (width, height, channels, n_frames, features),
    * but every value derives from the PARSED pixel data — n_frames is 1
    * (a still image), features are [n_pixels, first, last, sum mod 997]
    * over decoded gray values. */
  def decodeBmpStruct(blob: Column): Column = {
    val d = bmpDecode(blob)
    struct(
      d("width").as("width"),
      d("height").as("height"),
      d("channels").as("channels"),
      lit(1).as("n_frames"),
      array(
        size(d("pixels")).cast("double"),
        // size guard, not bare coalesce: ANSI element_at THROWS on an
        // empty (non-null) array — a 0x0 image is in-domain (the L=0
        // oracle case) and must yield 0, not INVALID_ARRAY_INDEX
        when(size(d("pixels")) > 0, element_at(d("pixels"), 1))
          .otherwise(lit(0)).cast("double"),
        when(size(d("pixels")) > 0, element_at(d("pixels"), -1))
          .otherwise(lit(0)).cast("double"),
        pmod(aggregate(d("pixels"), lit(0L), (a, x) => a + x.cast("long")),
          lit(997L)).cast("double")).as("features"))
  }

  final case class ResizedImage(
      width: Int, height: Int, pixels: Array[Int], error: String)

  /** Real pixel resample: nearest-neighbor resize of a decoded 24-bit
    * BMP to `outW`×`outH` gray pixels (top-down row-major) — the
    * normalize-to-model-input step every vision pipeline runs before
    * featurization. Pixel-center mapping
    * `src = ⌊(dst + 0.5)·srcDim/outDim⌋`: all-integer result, no FP
    * filter kernel to diverge between engines, exact for both up- and
    * down-sampling. ROW-LOCAL (map-only): at 100 TB this is pure scan
    * bandwidth — no shuffle, error rows flow through as data. */
  val bmpResize = udf { (blob: Array[Byte], outW: Int, outH: Int) =>
    val d = BmpCodec.decode(blob)
    if (d.error != null) ResizedImage(0, 0, null, d.error)
    // outW·outH compared in Long: 46341×46341 wraps Int negative and
    // would throw NegativeArraySizeException from the UDF instead of
    // producing the contract's error row
    else if (outW <= 0 || outH <= 0 || d.width <= 0 || d.height <= 0 ||
        outW.toLong * outH > Int.MaxValue)
      ResizedImage(0, 0, null, "bad_resize_target")
    else {
      val out = new Array[Int](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = math.min(((y + 0.5) * d.height / outH).toInt, d.height - 1)
        var x = 0
        while (x < outW) {
          val sx = math.min(((x + 0.5) * d.width / outW).toInt, d.width - 1)
          out(y * outW + x) = d.pixels(sy * d.width + sx)
          x += 1
        }
        y += 1
      }
      ResizedImage(outW, outH, out, null)
    }
  }

  final case class ResampledAudio(
      nSamples: Int, samples: Array[Int], error: String)

  /** Real sample-rate conversion: nearest-neighbor resample of a
    * decoded WAV clip to exactly `outN` samples — the audio twin of
    * [[bmpResize]] (fix every clip to the model's input length before
    * featurization). Same all-integer pixel-center index mapping, same
    * row-local/map-only scale shape, same error-rows-as-data contract.
    * Empty clips surface `bad_resample_target` (there is nothing to
    * pick a nearest sample FROM). */
  val wavResample = udf { (blob: Array[Byte], outN: Int) =>
    val d = WavCodec.decode(blob)
    if (d.error != null) ResampledAudio(0, null, d.error)
    else if (outN <= 0 || d.samples == null || d.samples.isEmpty)
      ResampledAudio(0, null, "bad_resample_target")
    else {
      val n = d.samples.length
      val out = new Array[Int](outN)
      var i = 0
      while (i < outN) {
        out(i) = d.samples(math.min(((i + 0.5) * n / outN).toInt, n - 1))
        i += 1
      }
      ResampledAudio(outN, out, null)
    }
  }

  /** Fixture-side Y4M synthesis: the blob's bytes become the luma planes
    * of 4×2 4:2:0 frames (8 luma bytes per frame, zero-padded tail,
    * neutral chroma) in a VALID YUV4MPEG2 container, so the video path
    * exercises the REAL parser ([[Y4mCodec.decode]]) end to end while
    * per-frame luma sums stay oracle-mirrorable from the source text. */
  val y4mFromBytes = udf { (blob: Array[Byte]) =>
    if (blob == null) null else Y4mCodec.encode(blob.map(b => b & 0xff))
  }

  /** Real Y4M container parse as a column:
    * `binary → struct(width, height, nFrames, lumaSums, error)` —
    * same row-level error contract as [[wavDecode]]/[[bmpDecode]]. */
  val y4mDecode = udf { (blob: Array[Byte]) => Y4mCodec.decode(blob) }

  /** Real WAV container parse as a column:
    * `binary → struct(sampleRate, channels, nSamples, samples, error)`.
    * Malformed blobs yield an error STRING next to null samples — the
    * PhyParser.py:10-12 row-level error contract (same as q26's packet
    * decode). A per-row Scala UDF is the right shape here: container
    * decode is inherently opaque byte work (the mapInPandas analog), and
    * the surrounding plumbing stays declarative. */
  val wavDecode = udf { (blob: Array[Byte]) => WavCodec.decode(blob) }

  /** Audio framing over REAL decoded PCM: parse the WAV container, then
    * window the interleaved samples at `frameLen` with exact integer
    * energy Σ sample² per frame. Good clips emit one row per frame
    * (`error` NULL); failed decodes emit ONE row with win = −1 and the
    * parser's error string — decode failure is row data, not an
    * exception (PhyParser.py:10-12). */
  def audioFramesWav(media: DataFrame, frameLen: Int): DataFrame = {
    // ONE decode per blob: the former good/bad filter-union shape planned
    // two scans over the input, running the container parser (and any
    // fixture encode upstream) twice per row. Here each row builds its
    // frame array in a single projection — error rows as a one-element
    // [-1, 0, 0, error] array, good rows one struct per window — and a
    // single explode routes both. (CollapseProject keeps `dec` its own
    // projection: a ScalaUDF alias referenced more than once is not
    // "cheap", so the parser still runs once per row, not per reference.)
    val decoded = media.withColumn("dec", wavDecode(col("media")))
    val nwin =
      ceil(size(col("dec.samples")) / lit(frameLen.toDouble)).cast("int")
    val seg = (w: Column) =>
      slice(col("dec.samples"), w * frameLen + 1, lit(frameLen))
    val goodFrames = transform(
      // zero-sample clips emit zero frames (sequence(0,-1) would descend)
      when(nwin > 0, sequence(lit(0), nwin - 1))
        .otherwise(array().cast("array<int>")),
      w => struct(
        w.cast("long").as("win"),
        size(seg(w)).cast("long").as("n_samples"),
        aggregate(seg(w), lit(0L),
          (acc, x) => acc + x.cast("long") * x.cast("long")).as("energy"),
        lit(null).cast("string").as("error")))
    val frames = when(col("dec.error").isNotNull,
        array(struct(lit(-1L).as("win"), lit(0L).as("n_samples"),
          lit(0L).as("energy"), col("dec.error").as("error"))))
      .otherwise(goodFrames)
    decoded
      .select(col("media_id"), explode(frames).as("f"))
      .select(col("media_id"), col("f.win").as("win"),
        col("f.n_samples").as("n_samples"), col("f.energy").as("energy"),
        col("f.error").as("error"))
  }

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
      // Empty blobs produce zero frames (ceil(0/len)-1 = -1 would otherwise
      // make sequence(0,-1) DESCEND and emit two spurious rows).
      .filter(octet_length(col("media")) > 0)
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

}
