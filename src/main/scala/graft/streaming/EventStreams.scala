package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

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

  /** Per-key TRAILING event-time rolling aggregate: every event row gains
    * `n_window` / `sum_window` over the key's events in `[ts − window, ts]`
    * (inclusive; equal-timestamp peers are all in frame — the RANGE-frame
    * convention both engines share). The per-event sibling of [[windowAgg]]:
    * a moving activity/velocity feature ("purchases in the 6 h before this
    * event") rather than a tumbling report.
    *
    * Scale: one hash shuffle on the key + per-key sort; the RANGE frame is
    * evaluated incrementally by the window operator (two moving frame
    * pointers — never a per-row rescan of the trailing window). Batch-only:
    * the continuous analogue is the stream-stream [[intervalJoin]].
    */
  def rollingAgg(events: DataFrame, keys: Seq[String], window: String,
                 tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(window))
    require(iv.months == 0, "rollingAgg window must be a fixed-length interval")
    val us = iv.days * 86400000000L + iv.microseconds
    require(us > 0, "rollingAgg window must be positive")
    // working column rides on the caller's frame: collision-free name
    val tsUs = graft.ext.WorkingColumns.fresh(events, "__ts_us")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsUs))
      .rangeBetween(-us, 0)
    events.withColumn(tsUs, unix_micros(col(tsCol)))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window", sum(col(valueCol)).over(w))
      .drop(tsUs)
  }

  /** Per-window top-`k` heavy hitters: within each tumbling `window`, the
    * `k` most frequent `keyCols` groups by event count (rank 1-based by
    * count desc, then the key columns asc — a deterministic cut) — the
    * "who dominates this hour" dashboard next to [[rateAnomalies]]'
    * "is this key spiking".
    *
    * Scale: ONE map-side-combined (window, keys) count agg; the rank window
    * runs over the aggregated frame and lowers to WindowGroupLimit k-heaps
    * — no per-event window function, no global sort. In streaming, compose
    * over [[windowAgg]] per batch via foreachBatch.
    */
  def windowTopK(events: DataFrame, keyCols: Seq[String], window: String = "1 hour",
                 k: Int = 10, tsCol: String = "ts"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k >= 1, "k >= 1")
    val counts = events
      .groupBy(keyCols.map(col) :+ org.apache.spark.sql.functions
        .window(col(tsCol), window).getField("start").as("window_start"): _*)
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n").desc +: keyCols.map(c => col(c).asc_nulls_last): _*)
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Event-rate anomaly detection: per key, tumbling-`window` counts scored
    * against the mean/stddev of that key's `trailing` PRIOR windows — the
    * pipeline-monitoring query ("this event type is spiking") as one
    * declarative frame. A window is anomalous when its z-score, ROUNDED to
    * 6 decimals (rounding first keeps the flag bit-stable across engines —
    * an ulp-level z at the threshold must not flip it), is ≥ `threshold`;
    * windows with fewer than `minTrailing` priors or ~zero variance score
    * NULL (no verdict, not a false negative).
    *
    * Semantics note: the baseline uses OBSERVED windows only — a key
    * silent for an hour contributes no zero-count row. That is the
    * standard sparse event-monitoring convention; densify upstream if
    * empty windows should drag the baseline.
    *
    * Output: (keys…, window_start, n, baseline_mean, baseline_std, z,
    * is_anomaly).
    *
    * Scale: ONE map-side-combined (keys, window) count agg — the window
    * functions then run over the aggregated frame (windows-per-key rows,
    * not events). In streaming, compose the same scoring over
    * [[windowAgg]]'s per-batch output via foreachBatch.
    */
  def rateAnomalies(events: DataFrame, keys: Seq[String],
                    window: String = "1 hour", trailing: Int = 24,
                    minTrailing: Int = 3, threshold: Double = 3.0,
                    tsCol: String = "ts"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(trailing >= minTrailing && minTrailing >= 1, "trailing >= minTrailing >= 1")
    val counts = events
      .groupBy(keys.map(col) :+ org.apache.spark.sql.functions
        .window(col(tsCol), window).getField("start").as("window_start"): _*)
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("window_start"))
      .rowsBetween(-trailing, -1)
    val scored = counts
      .withColumn("baseline_mean", avg(col("n")).over(w))
      .withColumn("baseline_std", stddev_pop(col("n")).over(w))
      .withColumn("__m", count(lit(1)).over(w))
    scored
      .withColumn("z",
        when(col("__m") >= minTrailing && col("baseline_std") > 1e-9,
          round((col("n") - col("baseline_mean")) / col("baseline_std"), 6)))
      .withColumn("is_anomaly", coalesce(col("z") >= threshold, lit(false)))
      .drop("__m")
  }

  /** Batch funnel report: per user, the GREEDY-EARLIEST completion of the
    * ordered step sequence — t1 = first `steps(0)` event, t_i = first
    * `steps(i-1)` event strictly after t_{i-1} — kept only when the chain
    * completes within `within` of t1 (None = no time bound). This is the
    * standard funnel-analytics convention: conversion is measured from the
    * user's FIRST entry into the funnel, so a user who dawdles past the
    * window on their first attempt counts as un-converted even if a later
    * attempt was faster.
    *
    * Output: (user, t_1..t_n, duration_us). Deterministic: chains are
    * unique by construction (each t_i is a min).
    *
    * Scale: step i touches ONLY `event_type = steps(i)` rows (predicate
    * pushed to the scan) joined against the per-user chain frame (one row
    * per user still in the funnel — shrinking monotonically), so each of
    * the n−1 hops is a skinny map-side-combined agg over a single step's
    * events, never a per-user collect_list that buffers a hot user's whole
    * history.
    */
  /** Retention cohort matrix: users grouped by the period of their FIRST
    * event (cohort), then counted per (cohort, periods-elapsed) cell over
    * their active periods — the standard "week-0 signup, how many return
    * in week k" triangle. Output (cohort_start TIMESTAMP, period_offset
    * BIGINT, n_users BIGINT, cohort_size BIGINT, retention DOUBLE);
    * offset 0 rows carry the cohort size itself (retention 1.0 by
    * construction). `unit` is any `date_trunc` field (week, day, month).
    *
    * Scale: one user-keyed aggregate for first-seen (map-side combined),
    * one distinct over (user, period) — skinny rows — and one
    * (cohort, offset) count; the cohort-size join rides the already-
    * aggregated (small) matrix. No event ever carries payload past the
    * first projection. Month offsets are calendar-aware
    * (months_between); day/week offsets are day-arithmetic.
    */
  def retentionCohorts(events: DataFrame, unit: String = "week",
                       tsCol: String = "ts",
                       userCol: String = "user_id"): DataFrame = {
    require(Seq("day", "week", "month").contains(unit),
      s"unit must be day|week|month: $unit")
    val per = date_trunc(unit, col(tsCol))
    val active = events.select(col(userCol).as("u"), per.as("p")).distinct()
    val cohort = active.groupBy(col("u")).agg(min(col("p")).as("c"))
    val offset = unit match {
      case "month" => round(months_between(col("p"), col("c"))).cast("long")
      case "week"  => (datediff(col("p"), col("c")) / 7).cast("long")
      case "day"   => datediff(col("p"), col("c")).cast("long")
    }
    val cells = active.join(cohort, "u")
      .groupBy(col("c").as("cohort_start"), offset.as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.filter(col("period_offset") === 0)
      .select(col("cohort_start"), col("n_users").as("cohort_size"))
    cells.join(sizes, "cohort_start")
      .select(col("cohort_start"), col("period_offset"), col("n_users"),
        col("cohort_size"),
        (col("n_users").cast("double") / col("cohort_size")).as("retention"))
  }

  /** SCD-2 intervalization: collapse a (key, ts, value) event history into
    * validity intervals — one row per CHANGE of value per key, with
    * `valid_from` = the change instant and `valid_to` = the next change
    * (NULL while current). Consecutive equal values merge into one
    * interval; ties on the same (key, ts) break deterministically by
    * `tieCol` ascending, last write wins. The change-data-capture shape a
    * warehouse dimension load needs from an event log.
    *
    * Scale: one hash shuffle on the key + per-key sort shared by BOTH
    * window passes (lag to find change points, lead to close intervals —
    * Spark chains the two window operators on one exchange); output is
    * bounded by the number of changes, not events.
    */
  def scd2(events: DataFrame, keyCol: String, valueCol: String,
           tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = graft.ext.WorkingColumns.fresh(events, "__prev")
    val prevSeen = graft.ext.WorkingColumns.fresh(events, "__prev_seen")
    val toCol = graft.ext.WorkingColumns.fresh(events, "__to")
    // change points: value differs from the previous row (NULL-safe — a
    // NULL value is a state like any other)
    val marked = events
      .withColumn(prev, lag(col(valueCol), 1).over(byKey))
      .withColumn(prevSeen, lag(lit(1), 1).over(byKey))
      .filter(col(prevSeen).isNull || !(col(valueCol) <=> col(prev)))
    val byKeyChanges = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    marked
      .withColumn(toCol, lead(col(tsCol), 1).over(byKeyChanges))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col(toCol).as("valid_to"),
        col(toCol).isNull.as("is_current"))
  }

  def funnel(events: DataFrame, steps: Seq[String],
             within: Option[String] = None, tsCol: String = "ts",
             userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    var i = 2
    steps.tail.foreach { s =>
      val prevCols = col(userCol) +: (1 until i).map(j => col(s"t$j"))
      acc = events.filter(col(typeCol) === s)
        .join(acc, Seq(userCol))
        .filter(col(tsCol) > col(s"t${i - 1}"))
        .groupBy(prevCols: _*)
        .agg(min(col(tsCol)).as(s"t$i"))
      i += 1
    }
    val n = steps.size
    val dur = (unix_micros(col(s"t$n")) - unix_micros(col("t1"))).as("duration_us")
    val bounded = within.fold(acc)(w =>
      acc.filter(col(s"t$n") <= col("t1") + expr(s"INTERVAL $w")))
    bounded.select(col(userCol) +: (1 to n).map(j => col(s"t$j")) :+ dur: _*)
  }

  /** Streaming sibling of [[funnel]] via `flatMapGroupsWithState` — the
    * per-key custom-state family. Per user the state is the greedy chain so
    * far (n timestamps + a done flag — O(steps) bytes, NOT the user's event
    * history), advanced as micro-batches arrive; a completion emits ONCE,
    * when the last step lands (inside `within` of the chain head, if set).
    *
    * Same greedy-earliest convention as [[funnel]]: equal results when each
    * user's events arrive in event-time order across micro-batches (the
    * in-order log-ingest case; WITHIN a micro-batch arrival order never
    * matters — the group sorts by event time before advancing). Works on a
    * batch Dataset too (Spark runs the same function with empty state),
    * which is how the spec pins stream ≡ batch ≡ [[funnel]].
    */
  def funnelStateful(events: DataFrame, steps: Seq[String],
                     within: Option[String] = None, tsCol: String = "ts",
                     userCol: String = "user_id",
                     typeCol: String = "event_type",
                     watermark: Option[String] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.size
    val withinMicros: Option[Long] = within.map { w =>
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      require(iv.months == 0, "funnel `within` must be a fixed-length interval")
      iv.days * 86400000000L + iv.microseconds
    }
    // watermark AFTER the shaping select: a cast on the watermarked column
    // would silently drop the watermark tag and fail the timeout analysis
    val shaped = events.select(col(userCol).cast("long").as("user_id"),
      col(tsCol).cast("timestamp").as("ts"),
      col(typeCol).cast("string").as("event_type"))
    val ds = watermark.fold(shaped)(w => shaped.withWatermark("ts", w))
      .as[FunnelEvent]
    val stepsArr = steps.toIndexedSeq
    // State hygiene on an unbounded stream: (a) users who never enter the
    // funnel store NO state at all; (b) with watermark + within set, state
    // expires via EventTimeTimeout once the watermark passes chain-head +
    // within — a blown-window chain can never convert, so it is dead
    // weight, and a completed chain needs no more suppression once no
    // admissible late event can re-fire it. After an expiry a fresh chain
    // MAY start from a later event — the documented per-active-window
    // divergence from batch greedy that an unbounded stream requires.
    val timeout =
      if (watermark.isDefined && withinMicros.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, (Long, Long, Long)](
        OutputMode.Append, timeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(FunnelState(Seq.empty, done = false))
            if (st.done) Iterator.empty
            else {
              var chain = st.chain
              var emitted: Option[(Long, Long, Long)] = None
              // event-time order within the batch; micros for exact arithmetic
              val sorted = it.map(e => (e.ts.getTime * 1000L +
                (e.ts.getNanos / 1000L) % 1000L, e.event_type)).toArray.sortBy(_._1)
              var k = 0
              while (k < sorted.length && emitted.isEmpty) {
                val (ts, tpe) = sorted(k)
                if (chain.size < n && tpe == stepsArr(chain.size) &&
                  (chain.isEmpty || ts > chain.last)) {
                  chain = chain :+ ts
                  if (chain.size == n && withinMicros.forall(chain.last - chain.head <= _))
                    emitted = Some((uid, chain.head, chain.last))
                }
                k += 1
              }
              if (chain.nonEmpty) {
                state.update(FunnelState(chain, done = chain.size == n))
                if (timeout == GroupStateTimeout.EventTimeTimeout)
                  state.setTimeoutTimestamp((chain.head + withinMicros.get) / 1000L + 1L)
              }
              emitted.iterator
            }
          }
      }
      .toDF("user_id", "t_first_us", "t_last_us")
      .select(col("user_id"), timestamp_micros(col("t_first_us")).as("t_first"),
        timestamp_micros(col("t_last_us")).as("t_last"))
  }

  /** Per-window token-distribution drift against a FIXED reference — the
    * streaming arm of [[graft.ext.TextStats.tokenDistributionDrift]]: each
    * tumbling window's token histogram over the reference vocabulary
    * (out-of-vocab lumped into one bucket whose reference mass is
    * 1 − Σ reference) is scored with Jensen–Shannon divergence. Emits
    * (window_start, window_end, n_tokens, js) — the continuous "is this
    * feed drifting off the training mixture" monitor. `reference` is a
    * monitored vocabulary (top-k tokens of the target mixture), CLOSED and
    * small by design — it rides the plan as literals.
    *
    * Scale/streaming shape: explode → vocab-index lookup → ONE windowed
    * groupBy carrying a [[graft.functions.IndexHistogramAgg]] long-array
    * buffer per window (a groupBy(window, token) would need a second
    * aggregation, which streaming append mode cannot chain); state =
    * (windows in watermark) × (|vocab|+1) longs. The JS finisher runs over
    * the ≤ |vocab|+1 histogram entries per WINDOW row (interpreted HOF —
    * irrelevant at one row per window). Batch input: same call, no
    * watermark.
    */
  def driftStream(docs: DataFrame, reference: Seq[(String, Double)],
                  windowLen: String = "1 hour", watermark: Option[String] = None,
                  tsCol: String = "ts", contentCol: String = "content"): DataFrame = {
    require(reference.nonEmpty, "reference vocabulary must be non-empty")
    require(reference.map(_._1).distinct.size == reference.size, "reference tokens must be unique")
    require(reference.forall(_._2 >= 0), "reference probabilities must be >= 0")
    val qs = reference.map(_._2)
    require(qs.sum <= 1.0 + 1e-9, "reference probabilities must sum to <= 1")
    val qArr = array((qs :+ math.max(0.0, 1.0 - qs.sum)).map(lit): _*)
    val v = reference.size
    val idxMap = map(reference.zipWithIndex.flatMap {
      case ((t, _), i) => Seq(lit(t), lit(i))
    }: _*)
    val src = watermark.fold(docs)(w => docs.withWatermark(tsCol, w))
    val idx = src.select(window(col(tsCol), windowLen).as("__w"),
        explode(graft.functions.TextFunctions.tokens(col(contentCol))).as("__t"))
      .select(col("__w"), coalesce(element_at(idxMap, col("__t")), lit(v)).as("__i"))
    val agg = idx.groupBy(col("__w"))
      .agg(graft.functions.VectorAgg.indexHistogram(col("__i"), v + 1).as("__c"))
      .withColumn("n_tokens", aggregate(col("__c"), lit(0L), (a, x) => a + x))
    def half(p: org.apache.spark.sql.Column,
             m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(p > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0))
    agg.select(col("__w.start").as("window_start"), col("__w.end").as("window_end"),
      col("n_tokens"),
      when(col("n_tokens") === 0, lit(0.0)).otherwise(
        aggregate(zip_with(col("__c"), qArr, (c, q) => {
          val p = c.cast("double") / col("n_tokens")
          val m = (p + q) / lit(2.0)
          half(p, m) + half(q, m)
        }), lit(0.0), (a, x) => a + x)).as("js"))
  }

  /** Streaming per-key admission cap: admit a row iff its key has admitted
    * fewer than `cap` rows SO FAR — the ingest-edge quota (per-domain crawl
    * caps, per-source ingest budgets) maintained continuously, the
    * streaming sibling of [[graft.ext.Web.capPerDomain]]. Emits the
    * admitted (keyCol, idCol) pairs; payloads join back on the id (the
    * dedupStream output contract — see there for why).
    *
    * Determinism: WITHIN each micro-batch a key's rows are admitted in
    * md5(id) rank order, so batch-mode input (Spark runs the same function
    * with empty state) reproduces the batch cap's survivor set EXACTLY;
    * across micro-batches, arrival order governs (first batches claim the
    * quota), so the cross-batch deterministic contract is the admitted
    * COUNT per key: least(cap, arrivals).
    *
    * Scale: state per key is ONE long (the admitted count), never rows —
    * O(#keys) state total, the only shape an unbounded stream tolerates.
    * One groupByKey shuffle per micro-batch; a key's per-batch rows are
    * buffered for the in-batch sort (micro-batch-bounded, as funnelStateful
    * buffers its per-user batch slice).
    */
  def capPerKeyStream(rows: DataFrame, keyCol: String, idCol: String,
                      cap: Int): DataFrame = {
    require(cap >= 1, "cap >= 1")
    val spark = rows.sparkSession
    import spark.implicits._
    // admission rank computed as a codegen'd column BEFORE the stateful
    // hop — a MessageDigest per comparator call would dominate the scan
    val ds = rows.select(col(keyCol).cast("string").as("key"),
      col(idCol).cast("string").as("id"),
      md5(col(idCol).cast("string").cast("binary")).as("r")).as[CapEvent]
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CapState, (String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CapEvent], state: GroupState[CapState]) =>
          val admitted = state.getOption.map(_.admitted).getOrElse(0L)
          if (admitted >= cap) Iterator.empty
          else {
            val take = it.toSeq.sortBy(e => (e.r, e.id))
              .take(cap - admitted.toInt)
            state.update(CapState(admitted + take.size))
            take.map(e => (e.key, e.id)).iterator
          }
      }
      .toDF(keyCol, idCol)
  }
}

/** Typed row of [[EventStreams.funnelStateful]]'s input (public: Spark's
  * encoder codegen instantiates it from generated classes).
  */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

/** Per-user funnel state: greedy chain (epoch micros) + completion flag. */
case class FunnelState(chain: Seq[Long], done: Boolean)

/** Typed row of [[EventStreams.capPerKeyStream]]'s input (`r` = the
  * precomputed md5 admission rank). */
case class CapEvent(key: String, id: String, r: String)

/** Per-key quota state: rows admitted so far (one long, never the rows). */
case class CapState(admitted: Long)
