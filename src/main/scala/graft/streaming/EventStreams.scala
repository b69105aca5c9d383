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

  /** Streaming exact deduplication on `keyCols` — the continuous-ingestion
    * analogue of [[graft.ext.Dedup.dropExactDups]]: the first arrival of a
    * key wins, duplicates are dropped.
    *
    * Streaming input with `watermark`: uses `dropDuplicatesWithinWatermark`,
    * so per-key state is dropped once the watermark passes — bounded state,
    * the only shape that survives an unbounded stream (an unwatermarked
    * streaming dropDuplicates grows state forever). Duplicates separated by
    * more than the watermark delay re-emit, by design.
    * Batch input: plain `dropDuplicates` over the full frame.
    *
    * Output is restricted to `keyCols` only: WHICH duplicate row survives
    * is arrival-order-dependent in a stream, so only the key columns are
    * deterministic — exposing survivors' payloads (or timestamps) would
    * bake nondeterminism into the contract (callers wanting payloads join
    * back on the key).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: Option[String] = None,
                  tsCol: String = "ts"): DataFrame =
    watermark match {
      case Some(w) =>
        // keyCols may legitimately include tsCol (exact-replay dedup keyed
        // on event time) — appending it again would make every later
        // reference to tsCol AMBIGUOUS and fail analysis
        val cols = if (keyCols.contains(tsCol)) keyCols else keyCols :+ tsCol
        events.select(cols.map(col): _*)
          .withWatermark(tsCol, w).dropDuplicatesWithinWatermark(keyCols)
          .select(keyCols.map(col): _*)
      case None =>
        // batch/backfill: tsCol is unused — don't require it to exist
        events.select(keyCols.map(col): _*).dropDuplicates(keyCols)
    }

  /** Stream-stream interval join: every (left, right) pair in the same
    * `keys` group with `right.ts` in left's trailing `window` — the
    * continuous-enrichment analogue of [[graft.ext.Joins.rangeJoin]]
    * ("the clicks in the 6 hours before each purchase", maintained as the
    * events arrive). Right payload columns come back `rightPrefix`-prefixed
    * plus `<rightPrefix><tsCol>`, same contract as the batch operator.
    *
    * Streaming input: pass `watermark` — both sides are watermarked and the
    * join condition carries BOTH event-time bounds, which is exactly what
    * Spark's stream-stream join needs to prune state: a buffered right row
    * is dropped once the watermark passes `ts + window`, so state stays
    * proportional to the window, not the stream. INNER semantics (matches
    * only).
    * Batch input: leave watermark None — delegates to the bucketed-equi-join
    * lowering of [[graft.ext.Joins.rangeJoin]] (a raw inequality join would
    * plan as a nested loop in batch; the streaming executor, by contrast,
    * evaluates the range predicate against its keyed state store, so the
    * direct form is the right one there).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   window: String, watermark: Option[String] = None,
                   tsCol: String = "ts", rightPayload: Seq[String] = Seq.empty,
                   rightPrefix: String = "r_"): DataFrame = watermark match {
    case None =>
      graft.ext.Joins.rangeJoin(left, right, keys, window, tsCol, rightPayload, rightPrefix)
    case Some(wm) =>
      require(keys.nonEmpty, "keys must be non-empty")
      val payload =
        if (rightPayload.nonEmpty) rightPayload
        else right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
      val rTs = s"$rightPrefix$tsCol"
      val l = left.withWatermark(tsCol, wm)
      val r = right.select(
          keys.map(col) ++ (payload :+ tsCol).map(c => col(c).as(s"$rightPrefix$c")): _*)
        .withWatermark(rTs, wm)
      val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
        r(rTs) <= l(tsCol) && r(rTs) >= l(tsCol) - expr(s"INTERVAL $window")
      l.join(r, cond, "inner")
        .select(left.columns.map(l(_)) ++ (payload :+ tsCol).map(c => r(s"$rightPrefix$c")): _*)
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
