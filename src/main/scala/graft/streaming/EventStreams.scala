package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-first event aggregation (new-scope — the reference
  * is strictly batch; SURVEY §2.3). The SAME transform serves both a
  * streaming frame (`readStream` + watermark + append-mode windows) and a
  * batch frame (the correctness/backfill path) — the batch/stream-unified
  * dataflow Spark's incrementalizer is designed around.
  */
object EventStreams {

  /** Tumbling-window per-type aggregation over (ts TIMESTAMP, event_type
    * STRING, value DOUBLE): count + sum(value) per (window, type).
    *
    * Streaming input: pass `watermark` (e.g. "10 minutes") — state for a
    * window is dropped once the watermark passes its end, bounding state
    * size; late rows beyond it are discarded (append output mode works).
    * Batch input: leave watermark None; identical results over the full set.
    */
  def windowAgg(events: DataFrame, windowDur: String = "1 hour",
                watermark: Option[String] = None,
                tsCol: String = "ts", typeCol: String = "event_type",
                valueCol: String = "value"): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src
      .groupBy(window(col(tsCol), windowDur).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(typeCol),
        col("n"), col("sum_value"))
  }

  /** Per-user sessionization by inactivity gap (session window). Streaming:
    * same call with a watermark. Demonstrates the state-merge window family.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: Option[String] = None,
                 tsCol: String = "ts", userCol: String = "user_id",
                 valueCol: String = "value"): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src
      .groupBy(session_window(col(tsCol), gap).as("w"), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col(userCol), col("n_events"), col("sum_value"))
  }
}
