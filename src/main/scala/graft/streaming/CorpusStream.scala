package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the training-corpus batch operators — documents
  * arriving as a stream (crawl output, ingestion queue) instead of a
  * table at rest.
  *
  * Scale notes (100 TB stream): both operators keep PER-KEY state, so
  * the state store — RocksDB, like the rest of the engine's stateful
  * ops — is the limiting resource. Bounding that state is the design
  * decision each function documents.
  */
object CorpusStream {

  /** Streaming exact dedup — the streaming twin of q32: the FIRST
    * document per content digest passes, replays and later copies are
    * suppressed.
    *
    * `dropDuplicatesWithinWatermark` rather than `dropDuplicates`: the
    * classic unbounded variant keeps every digest ever seen (state grows
    * with the corpus — a 100 TB stream eventually evicts or dies), while
    * the watermark variant expires a digest once the event-time horizon
    * passes it, so state is bounded by horizon × ingest rate. The
    * trade-off is explicit: a duplicate arriving after the horizon
    * re-emits, which for corpus building is the right failure mode
    * (downstream batch dedup — q32 — catches stragglers). */
  def dedupByContent(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_md5", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Streaming per-source quota — the streaming twin of q44's per-source
    * cap: count documents per (source, event-time window) and emit each
    * window's count once it closes, flagging sources that exceeded the
    * cap in that window (the signal a crawler uses to throttle a
    * domain). Windowed, so state per source is one counter per open
    * window — bounded by the horizon, not the stream length. */
  def sourceQuota(docs: DataFrame, cap: Long, window_ : String = "1 hour",
                  horizon: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), window_), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), (col("n_docs") > cap).as("over_cap"))
}
