package graft.queries

import graft.Tables._
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary media synthesized from `documents`,
  * decoded with the deterministic stub (Multimodal.scala), feature values
  * oracle-checked from the same source text. */
object Media {

  /** q40: decode + feature-extract over the media table. */
  def q40MediaDecode(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
    val dec = Multimodal.decodeStub(col("media"))
    media.select(
        col("media_id"), col("media_type"),
        col("metadata")("declared_bytes").as("declared_bytes"),
        dec("width").as("width"), dec("height").as("height"),
        dec("channels").as("channels"), dec("n_frames").as("n_frames"),
        dec("features")(0).as("f_len"), dec("features")(1).as("f_first"),
        dec("features")(2).as("f_last"), dec("features")(3).as("f_sum"))
      .orderBy(col("media_id"))
  }

  /** q41: the video path — frame sampling (k=2) + stub resize. */
  def q41VideoFrames(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaTable(documents(s, d))
      .filter(col("media_type") === "video")
    val dec = Multimodal.decodeStub(col("media"))
    val resized = Multimodal.resizeStub(Multimodal.decodeStub(col("media")))
    media.select(
        col("media_id"),
        dec("n_frames").as("n_frames"),
        size(Multimodal.frameSample(dec, 2)).as("n_sampled"),
        resized("width").as("resized_w"),
        resized("height").as("resized_h"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_decode" -> (q40MediaDecode _),
    "q41_video_frames" -> (q41VideoFrames _),
  )

  val oracle: Map[String, String] = Map(
    "q40_media_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  n_chars AS declared_bytes,
        |  CAST(ascii(substring(text, 1, 1)) % 64 + 1 AS INTEGER) AS width,
        |  CAST(ascii(substring(text, 2, 1)) % 64 + 1 AS INTEGER) AS height,
        |  3 AS channels,
        |  CAST(ceil(length(text) / 256.0) AS INTEGER) AS n_frames,
        |  CAST(length(text) AS DOUBLE) AS f_len,
        |  CAST(ascii(substring(text, 1, 1)) AS DOUBLE) AS f_first,
        |  CAST(ascii(substring(text, length(text), 1)) AS DOUBLE) AS f_last,
        |  CAST(list_sum(list_transform(string_split_regex(text, ''),
        |    c -> ascii(c))) % 997 AS DOUBLE) AS f_sum
        |FROM documents ORDER BY media_id""".stripMargin,
    "q41_video_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(ceil(length(text) / 256.0) AS INTEGER) AS n_frames,
        |  CAST(ceil(ceil(length(text) / 256.0) / 2.0) AS INTEGER) AS n_sampled,
        |  CAST(greatest((ascii(substring(text, 1, 1)) % 64 + 1) // 2, 1) AS INTEGER) AS resized_w,
        |  CAST(greatest((ascii(substring(text, 2, 1)) % 64 + 1) // 2, 1) AS INTEGER) AS resized_h
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
  )
}
