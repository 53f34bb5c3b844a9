package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming forms of the engine's event-time operators. AFEC is
  * batch-only, but its stateful pieces (frame windows, gap sessionization,
  * forward-looking-free scans — SURVEY.md §2.5) map directly onto streaming
  * primitives; these transforms work unchanged on `readStream` inputs.
  *
  * Scale notes: both are single-shuffle stateful aggregations keyed by the
  * entity; watermarks bound state so a 100 TB/day stream holds only the
  * open-window state per key. Late data beyond the watermark is dropped
  * deterministically.
  */
object StreamOps {

  /** Gap-based sessionization with `session_window` — the streaming
    * equivalent of the batch gaps-and-islands sessionizer
    * ([[graft.core.Windows.sessionId]]); same gap semantics. */
  def sessionize(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_cents"))

  /** Tumbling frame aggregation on the token clock: pos → event time via
    * `timestamp_micros`, hop-sized tumbling windows — the streaming analog
    * of the batch framing (`window($"ts", frame, hop)` would give the
    * sliding variant). */
  def frameAgg(tokens: DataFrame, hopMicros: Long, watermark: String): DataFrame =
    tokens
      .withColumn("ts", timestamp_micros(col("pos")))
      .withWatermark("ts", watermark)
      .groupBy(col("doc_id"), window(col("ts"), s"$hopMicros microseconds"))
      .agg(count(lit(1)).as("n_samp"),
        sum(expr("CAST(token AS BIGINT) * token")).as("fsumsq"),
        max(abs(col("token"))).as("peak"))
      .select(col("doc_id"),
        col("window.start").cast("long").as("frame_start_s"),
        col("n_samp"), col("fsumsq"), col("peak"))
}
