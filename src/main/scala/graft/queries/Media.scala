package graft.queries

import graft.Tables._
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary media synthesized from `documents`,
  * decoded with the deterministic stub (Multimodal.scala), feature values
  * oracle-checked from the same source text. */
object Media {

  /** q40: decode + feature-extract over the media table. Image rows
    * route through the REAL BMP parser (each blob wrapped as a valid
    * one-row 24-bit BMP — BmpCodec round-trips the bytes as gray
    * pixels, so features are computed from PARSED pixel data); audio
    * rows get their real parse in q73 (WAV); video keeps the labeled
    * deterministic stub (no pure-JVM container is honest for video). */
  def q40MediaDecode(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
      .withColumn("bmp", Multimodal.bmpFromBytes(col("media")))
    val dec = when(col("media_type") === "image",
        Multimodal.decodeBmpStruct(col("bmp")))
      .otherwise(Multimodal.decodeStub(col("media")))
    media.select(
        col("media_id"), col("media_type"),
        col("metadata")("declared_bytes").as("declared_bytes"),
        dec("width").as("width"), dec("height").as("height"),
        dec("channels").as("channels"), dec("n_frames").as("n_frames"),
        dec("features")(0).as("f_len"), dec("features")(1).as("f_first"),
        dec("features")(2).as("f_last"), dec("features")(3).as("f_sum"))
      .orderBy(col("media_id"))
  }

  /** q41: the video path over REAL Y4M parsing — each video blob is
    * wrapped as a valid YUV4MPEG2 stream (4×2 4:2:0 frames, 8 luma
    * bytes each, the oracle-mirrorable fixture) and routed through the
    * frame-walking parser (Y4mCodec.decode). Emits the decoded frame
    * count, the every-2nd-frame sample size, halved decoded dimensions,
    * and the summed luma of the SAMPLED frames — the
    * frame-sample-then-feature shape a video training pipeline runs,
    * with every value derived from parsed frame data. */
  def q41VideoFrames(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
      .filter(col("media_type") === "video")
      .withColumn("dec", Multimodal.y4mDecode(Multimodal.y4mFromBytes(col("media"))))
    media.select(
        col("media_id"),
        col("dec.nFrames").as("n_frames"),
        // even frame indices in [0, n): exactly (n+1)/2 of them
        ((col("dec.nFrames") + 1) / 2).cast("int").as("n_sampled"),
        greatest((col("dec.width") / 2).cast("int"), lit(1)).as("resized_w"),
        greatest((col("dec.height") / 2).cast("int"), lit(1)).as("resized_h"),
        aggregate(
          filter(expr("transform(dec.lumaSums, (x, i) -> struct(x AS x, i AS i))"),
            s0 => s0("i") % 2 === 0),
          lit(0L), (acc, s0) => acc + s0("x")).as("sampled_luma"))
      .orderBy(col("media_id"))
  }

  /** q57: perceptual-hash near-duplicate media — the multimodal twin of
    * text near-dup (q33-q35): a REAL 63-bit DCT pHash per blob
    * (Multimodal.phash — 32×32 byte grid → integer 2D DCT → 8×8 block
    * vs median, no native deps, oracle-exact), pairs at hamming ≤ 2.
    *
    * Candidates come from a pigeonhole equi-join, NOT an all-pairs scan:
    * the 63 bits split into 3 chunks of 21, and two hashes within
    * hamming 2 must agree exactly on at least one chunk — so both sides
    * shuffle only on (chunk index, chunk value) buckets, the q35-blocked
    * shape that survives a corpus too big to broadcast. `distinct`
    * dedups pairs colliding in several chunks before the exact popcount
    * verify. */
  def q57MediaPhashDedup(s: SparkSession, d: String): DataFrame = {
    val base = Multimodal.mediaTable(documents(s, d))
      .select(col("media_id"), col("media"))
    // Deterministic "re-encode twins": every 20th blob re-appears with
    // one mid-blob byte nudged within the printable range — the aligned
    // byte-noise a real corpus gets from media re-encoding (the
    // perturbation a DCT pHash is FOR; near-dup *text* shifts every
    // chunk boundary and rightly hashes far). The twin construction is
    // pure string surgery, reproduced verbatim in the oracle.
    val p = (length(col("t")) / 2 + 1).cast("int")
    // twin id = -(id + 1): injective and DISJOINT from real ids at ANY
    // corpus size (a fixed +1e6 offset collides with real doc_ids once
    // the corpus passes 1M documents, making ORDER BY (media_a,
    // media_b) non-total and conflating two distinct blobs)
    val twins = base.filter(col("media_id") % 20 === 0 && octet_length(col("media")) > 0)
      .withColumn("t", decode(col("media"), "UTF-8"))
      .select((-col("media_id") - 1L).as("media_id"),
        encode(concat(
          col("t").substr(lit(1), p - 1),
          char((ascii(col("t").substr(p, lit(1))) + 64) % 95 + 32),
          col("t").substr(p + 1, length(col("t")))), "UTF-8").as("media"))
    val hashed = base.union(twins)
      .select(col("media_id"), Multimodal.phash(col("media")).as("ph"))
      .repartition(col("media_id"))
    val keyed = hashed.select(col("media_id"), col("ph"),
        explode(expr("""array(
          struct(0 AS ci, ph & 2097151 AS cv),
          struct(1 AS ci, shiftright(ph, 21) & 2097151 AS cv),
          struct(2 AS ci, shiftright(ph, 42) & 2097151 AS cv))""")).as("k"))
      .select(col("media_id"), col("ph"), col("k.ci").as("ci"), col("k.cv").as("cv"))
    keyed.as("a").join(keyed.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.ph").as("ha"), col("b.ph").as("hb"))
      .distinct()
      .filter(expr("bit_count(ha ^ hb)") <= 2)
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .select(col("media_a"), col("media_b"), col("hamming"))
      .orderBy(col("media_a"), col("media_b"))
  }

  /** q73: the audio path over REAL WAV parsing — each audio blob is
    * wrapped in a valid RIFF/PCM16 container (one int16 sample per source
    * byte, the oracle-mirrorable fixture), every (10k+7)th clip is
    * truncated to 10 bytes (a torn upload), and the whole table routes
    * through the pure-JVM chunk-walking parser (WavCodec.decode). Good
    * clips emit one row per 64-sample frame with exact integer energy
    * Σ sample²; failed decodes emit one win = −1 row carrying the
    * parser's error string (PhyParser.py:10-12 semantics — decode
    * failure is row data). Integer samples, so the oracle is exact. */
  def q73AudioWindows(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
      .filter(col("media_type") === "audio")
      .withColumn("wav", Multimodal.wavFromBytes(col("media")))
      .withColumn("media", when(col("media_id") % 10 === 7,
        expr("substring(wav, 1, 10)")).otherwise(col("wav")))
    Multimodal.audioFramesWav(media, 64)
      .orderBy(col("media_id"), col("win"))
  }

  /** q90: REAL pixel resample — every image blob (the one-row gray BMP
    * fixture, so the source pixels ARE the text bytes) routes through
    * the container parser and [[Multimodal.bmpResize]]'s
    * nearest-neighbor kernel down to a fixed 8×1 "model input". The
    * normalize-to-input-size step a vision pipeline runs at corpus
    * scale: row-local, all-integer (pixel-center mapping
    * ⌊(x+0.5)·L/8⌋), so the oracle restates the index math exactly.
    * Empty blobs surface the kernel's bad_resize_target error row —
    * decode/resize failure is row data, never an exception
    * (PhyParser.py:10-12 semantics). */
  def q90MediaResize(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
      .filter(col("media_type") === "image")
      .withColumn("r", Multimodal.bmpResize(
        Multimodal.bmpFromBytes(col("media")), lit(8), lit(1)))
    media.select(
        col("media_id"),
        col("r.width").as("resized_w"), col("r.height").as("resized_h"),
        coalesce(element_at(col("r.pixels"), 1), lit(-1)).cast("long").as("p_first"),
        coalesce(element_at(col("r.pixels"), -1), lit(-1)).cast("long").as("p_last"),
        coalesce(aggregate(col("r.pixels"), lit(0L), (a, x) => a + x),
          lit(-1L)).as("p_sum"),
        col("r.error").as("error"))
      .orderBy(col("media_id"))
  }

  /** q91: REAL sample-rate conversion — every audio clip (the
    * one-sample-per-byte WAV fixture) routes through the RIFF parser
    * and [[Multimodal.wavResample]]'s nearest-neighbor kernel to a
    * fixed 16-sample "model input" (the resample-to-16kHz analog).
    * Torn uploads (media_id % 10 = 7, the q73 convention) surface the
    * parser's short_header error row; empty clips surface the kernel's
    * bad_resample_target — failure is row data, never an exception. */
  def q91AudioResample(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
      .filter(col("media_type") === "audio")
      .withColumn("wav", Multimodal.wavFromBytes(col("media")))
      .withColumn("clip", when(col("media_id") % 10 === 7,
        expr("substring(wav, 1, 10)")).otherwise(col("wav")))
      .withColumn("r", Multimodal.wavResample(col("clip"), lit(16)))
    media.select(
        col("media_id"),
        col("r.nSamples").as("n_samples"),
        coalesce(element_at(col("r.samples"), 1), lit(-1)).cast("long").as("s_first"),
        coalesce(element_at(col("r.samples"), -1), lit(-1)).cast("long").as("s_last"),
        coalesce(aggregate(col("r.samples"), lit(0L), (a, x) => a + x),
          lit(-1L)).as("s_sum"),
        col("r.error").as("error"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_decode" -> (q40MediaDecode _),
    "q41_video_frames" -> (q41VideoFrames _),
    "q57_media_phash"  -> (q57MediaPhashDedup _),
    "q73_audio_windows" -> (q73AudioWindows _),
    "q90_media_resize" -> (q90MediaResize _),
    "q91_audio_resample" -> (q91AudioResample _),
  )

  val oracle: Map[String, String] = Map(
    // the WAV fixture stores one PCM16 sample per source byte, so the
    // decoded sample values ARE the ascii codes — the oracle frames the
    // text directly; the truncated clips (media_id % 10 = 7) mirror the
    // parser's short_header error row (win = −1)
    "q73_audio_windows" ->
      """WITH a AS (SELECT doc_id AS media_id, text AS t FROM documents
        |  WHERE doc_id % 3 = 1),
        |w AS (SELECT media_id, t,
        |    unnest(range(0, CAST(ceil(length(t) / 64.0) AS BIGINT))) AS win
        |  FROM a WHERE media_id % 10 <> 7),
        |seg AS (SELECT media_id, win, substring(t, CAST(win * 64 + 1 AS BIGINT), 64) AS s
        |  FROM w),
        |rows_all AS (
        |  SELECT media_id, win, CAST(length(s) AS BIGINT) AS n_samples,
        |    CAST(COALESCE(list_sum(list_transform(string_split(s, ''),
        |      c -> ascii(c) * ascii(c))), 0) AS BIGINT) AS energy,
        |    CAST(NULL AS VARCHAR) AS error
        |  FROM seg
        |  UNION ALL
        |  SELECT media_id, CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), 'short_header'
        |  FROM a WHERE media_id % 10 = 7)
        |SELECT media_id, win, n_samples, energy, error
        |FROM rows_all ORDER BY media_id, win""".stripMargin,
    // the SAME integer DCT pipeline as Multimodal.phashBytes, constant
    // table included verbatim (DctT below) — every step is int64-exact
    // so the hash matches Spark's bit-for-bit. The pair join is the
    // pigeonhole restatement the engine runs (hamming <= 2 over 63 bits
    // forces >= 1 of 3 disjoint 21-bit chunks equal — lossless), so the
    // oracle stays sub-quadratic at sf0.1
    "q57_media_phash" ->
      s"""WITH m0 AS (SELECT doc_id AS media_id, text,
         |    CAST(length(text) AS BIGINT) AS L
         |  FROM documents),
         |m AS (
         |  SELECT media_id, text, L FROM m0
         |  UNION ALL
         |  SELECT -media_id - 1,
         |    substring(text, 1, CAST(L//2 AS BIGINT))
         |      || chr(((ascii(substring(text, CAST(L//2 + 1 AS BIGINT), 1)) + 64) % 95) + 32)
         |      || substring(text, CAST(L//2 + 2 AS BIGINT)),
         |    L
         |  FROM m0 WHERE media_id % 20 = 0 AND L > 0),
         |bl AS (SELECT media_id, L,
         |    [CAST(ascii(c) AS BIGINT) for c in string_split_regex(text, '')] AS bs
         |  FROM m),
         |g AS (SELECT media_id,
         |    [LEAST(COALESCE(list_sum(bs[CAST((i*L)//1024 + 1 AS BIGINT)
         |        : CAST(((i+1)*L)//1024 AS BIGINT)]), 0), 16777216)
         |     for i in range(0, 1024)] AS gr
         |  FROM bl),
         |tt AS (SELECT ${Multimodal.DctT.mkString("[", ", ", "]")} AS T),
         |rw AS (SELECT media_id,
         |    [list_sum([gr[(i//8)*32 + y + 1] * T[(i%8)*32 + y + 1]
         |       for y in range(0, 32)]) for i in range(0, 256)] AS r
         |  FROM g, tt),
         |cf AS (SELECT media_id,
         |    [list_sum([T[(j//8)*32 + x + 1] * r[x*8 + (j%8) + 1]
         |       for x in range(0, 32)]) for j in range(0, 64)] AS coefs
         |  FROM rw, tt),
         |ac AS (SELECT media_id, coefs[2:64] AS acs,
         |    list_sort(coefs[2:64])[32] AS med FROM cf),
         |h AS (SELECT media_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    [CASE WHEN acs[k+1] > med THEN CAST(1 AS BIGINT)<<k
         |          ELSE CAST(0 AS BIGINT) END for k in range(0, 63)]),
         |    (a, b) -> a + b) AS ph FROM ac),
         |ch AS (SELECT media_id,
         |  unnest([(ph >> 0) & 2097151, (ph >> 21) & 2097151,
         |          (ph >> 42) & 2097151]) AS cv,
         |  unnest([0, 1, 2]) AS ci FROM h),
         |cand AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
         |  FROM ch a JOIN ch b
         |    ON a.ci = b.ci AND a.cv = b.cv AND a.media_id < b.media_id)
         |SELECT cand.media_a, cand.media_b,
         |  CAST(bit_count(xor(ha.ph, hb.ph)) AS BIGINT) AS hamming
         |FROM cand JOIN h ha ON ha.media_id = cand.media_a
         |          JOIN h hb ON hb.media_id = cand.media_b
         |WHERE bit_count(xor(ha.ph, hb.ph)) <= 2
         |ORDER BY media_a, media_b""".stripMargin,
    // image rows (doc_id % 3 = 0) mirror the REAL BMP parse: the fixture
    // wraps the bytes as one row of gray pixels, so decoded width = byte
    // count, height = 1 (0 for an empty blob), n_frames = 1; the
    // feature values are identical either way because the parser
    // round-trips the bytes as pixel values
    "q40_media_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  n_chars AS declared_bytes,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN length(text)
        |       ELSE ascii(substring(text, 1, 1)) % 64 + 1 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |       THEN CASE WHEN length(text) > 0 THEN 1 ELSE 0 END
        |       ELSE ascii(substring(text, 2, 1)) % 64 + 1 END AS INTEGER) AS height,
        |  3 AS channels,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
        |       ELSE ceil(length(text) / 256.0) END AS INTEGER) AS n_frames,
        |  CAST(length(text) AS DOUBLE) AS f_len,
        |  CAST(ascii(substring(text, 1, 1)) AS DOUBLE) AS f_first,
        |  CAST(ascii(substring(text, length(text), 1)) AS DOUBLE) AS f_last,
        |  CAST(list_sum(list_transform(string_split_regex(text, ''),
        |    c -> ascii(c))) % 997 AS DOUBLE) AS f_sum
        |FROM documents ORDER BY media_id""".stripMargin,
    // mirrors the REAL Y4M parse: 8 luma bytes per 4x2 frame, so
    // n_frames = ceil(L/8), decoded dims are the fixture's constant 4x2
    // (resized 2x1), and sampled_luma sums the text bytes landing in
    // even-indexed frames (zero padding adds nothing)
    "q41_video_frames" ->
      """WITH v AS (SELECT doc_id AS media_id, text AS t FROM documents
        |  WHERE doc_id % 3 = 2),
        |w AS (SELECT media_id, t,
        |    unnest(range(0, CAST(ceil(length(t) / 8.0) AS BIGINT))) AS win
        |  FROM v),
        |sl AS (SELECT media_id,
        |    SUM(CASE WHEN win % 2 = 0 THEN
        |      COALESCE(list_sum(list_transform(string_split(
        |        substring(t, CAST(win * 8 + 1 AS BIGINT), 8), ''),
        |        c -> ascii(c))), 0) ELSE 0 END) AS s
        |  FROM w GROUP BY media_id)
        |SELECT v.media_id AS media_id,
        |  CAST(ceil(length(v.t) / 8.0) AS INTEGER) AS n_frames,
        |  CAST((CAST(ceil(length(v.t) / 8.0) AS BIGINT) + 1) // 2 AS INTEGER) AS n_sampled,
        |  2 AS resized_w, 1 AS resized_h,
        |  CAST(COALESCE(sl.s, 0) AS BIGINT) AS sampled_luma
        |FROM v LEFT JOIN sl ON v.media_id = sl.media_id
        |ORDER BY v.media_id""".stripMargin,
    // the image fixture is one row of gray pixels = the text bytes, so
    // the resize oracle restates the nearest-neighbor index math:
    // src = floor((x + 0.5) * L / 8), 8 taps, 1-based substring
    "q90_media_resize" ->
      """WITH i AS (SELECT doc_id AS media_id, text AS t, length(text) AS L
        |  FROM documents WHERE doc_id % 3 = 0),
        |r AS (SELECT media_id, L,
        |    CASE WHEN L > 0 THEN list_transform(range(0, 8),
        |      x -> ascii(substring(t,
        |        CAST(floor((x + 0.5) * L / 8) AS BIGINT) + 1, 1))) END AS px
        |  FROM i)
        |SELECT media_id,
        |  CAST(CASE WHEN L > 0 THEN 8 ELSE 0 END AS INTEGER) AS resized_w,
        |  CAST(CASE WHEN L > 0 THEN 1 ELSE 0 END AS INTEGER) AS resized_h,
        |  CAST(COALESCE(px[1], -1) AS BIGINT) AS p_first,
        |  CAST(COALESCE(px[8], -1) AS BIGINT) AS p_last,
        |  CAST(COALESCE(list_sum(px), -1) AS BIGINT) AS p_sum,
        |  CASE WHEN L = 0 THEN 'bad_resize_target' END AS error
        |FROM r ORDER BY media_id""".stripMargin,
    // the WAV fixture stores one sample per source byte, so the
    // resample oracle restates the same nearest-neighbor index math
    // over the text; torn clips (media_id % 10 = 7) mirror the
    // parser's short_header error row, empty clips the kernel's
    // bad_resample_target
    "q91_audio_resample" ->
      """WITH a AS (SELECT doc_id AS media_id, text AS t, length(text) AS L
        |  FROM documents WHERE doc_id % 3 = 1),
        |r AS (SELECT media_id, L,
        |    CASE WHEN media_id % 10 != 7 AND L > 0 THEN
        |      list_transform(range(0, 16),
        |        x -> ascii(substring(t,
        |          CAST(floor((x + 0.5) * L / 16) AS BIGINT) + 1, 1))) END AS sm
        |  FROM a)
        |SELECT media_id,
        |  CAST(CASE WHEN media_id % 10 = 7 OR L = 0 THEN 0 ELSE 16 END AS INTEGER) AS n_samples,
        |  CAST(COALESCE(sm[1], -1) AS BIGINT) AS s_first,
        |  CAST(COALESCE(sm[16], -1) AS BIGINT) AS s_last,
        |  CAST(COALESCE(list_sum(sm), -1) AS BIGINT) AS s_sum,
        |  CASE WHEN media_id % 10 = 7 THEN 'short_header'
        |       WHEN L = 0 THEN 'bad_resample_target' END AS error
        |FROM r ORDER BY media_id""".stripMargin,
  )
}
