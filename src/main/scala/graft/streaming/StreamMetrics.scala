package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming observability for the continuous arms (streamIngest,
  * streamQuery, streamVectorSearch, the dedup/quota/drift streams): a
  * [[StreamingQueryListener]] that accumulates every micro-batch's
  * progress — rows in, processing latency, rates — and serves the history
  * as a snapshot DataFrame an operator can join, window, or alert on with
  * the same engine that runs the pipelines. The reference has no streaming
  * surface at all (strictly request/response over SQLite/PG); this is the
  * ops counterpart its deployments get from the database's monitoring.
  *
  * Driver-side by design: progress events are emitted once per micro-batch
  * on the driver (a few hundred bytes each), so the buffer grows with
  * batches, not data — `maxEvents` ring-bounds it for long-lived streams
  * (drop-oldest, like a metrics scrape window).
  *
  * Usage: `val m = StreamMetrics.attach(spark)` BEFORE `start()`, then
  * `m.snapshot()` any time; `m.detach()` when done. Events arrive on the
  * listener bus asynchronously — a just-finished batch may take a moment
  * to appear ([[awaitBatches]] covers test/polling callers).
  */
final class StreamMetrics private (spark: SparkSession, maxEvents: Int)
    extends StreamingQueryListener {

  // single-writer (listener bus) / multi-reader; deque for ring eviction.
  // size is tracked in a counter: ConcurrentLinkedDeque.size() is an O(n)
  // traversal, and the listener bus thread is latency-sensitive (slow
  // listeners make Spark drop events)
  private val buf =
    new java.util.concurrent.ConcurrentLinkedDeque[StreamMetrics.BatchProgress]()
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.addLast(StreamMetrics.BatchProgress(
      query = Option(p.name).getOrElse(p.id.toString),
      batchId = p.batchId,
      timestamp = p.timestamp,
      inputRows = p.numInputRows,
      inputRowsPerSec = p.inputRowsPerSecond,
      processedRowsPerSec = p.processedRowsPerSecond,
      // triggerExecution spans the whole batch (addBatch + commit included)
      batchDurationMs =
        Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L),
      stateRows = p.stateOperators.map(_.numRowsTotal).sum))
    count.incrementAndGet()
    while (count.get() > maxEvents && buf.pollFirst() != null)
      count.decrementAndGet()
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** The accumulated per-batch counters as a frame: (query, batch_id,
    * timestamp, input_rows, input_rows_per_sec, processed_rows_per_sec,
    * batch_duration_ms, state_rows). Bounded by `maxEvents` rows — a
    * driver-local frame, cheap to snapshot repeatedly.
    */
  def snapshot(): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq.toDF()
      .select($"query", $"batchId".as("batch_id"), $"timestamp",
        $"inputRows".as("input_rows"),
        $"inputRowsPerSec".as("input_rows_per_sec"),
        $"processedRowsPerSec".as("processed_rows_per_sec"),
        $"batchDurationMs".as("batch_duration_ms"),
        $"stateRows".as("state_rows"))
  }

  /** Block (≤ `timeoutMs`) until ≥ `n` progress events for `query` have
    * landed — the listener bus is async, so a caller that just ran
    * `processAllAvailable()` polls here before reading [[snapshot]].
    * Returns the number seen.
    */
  def awaitBatches(query: String, n: Int, timeoutMs: Long = 30000L): Int = {
    import scala.jdk.CollectionConverters._
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var seen = 0
    while ({
      seen = buf.iterator().asScala.count(_.query == query)
      seen < n && System.nanoTime() < deadline
    }) Thread.sleep(20)
    seen
  }

  /** Remove this listener from the session (the buffer stays readable). */
  def detach(): Unit = spark.streams.removeListener(this)
}

object StreamMetrics {
  private[streaming] final case class BatchProgress(
      query: String, batchId: Long, timestamp: String, inputRows: Long,
      inputRowsPerSec: Double, processedRowsPerSec: Double,
      batchDurationMs: Long, stateRows: Long)

  /** Create + register a collector on the session's listener bus. */
  def attach(spark: SparkSession, maxEvents: Int = 10000): StreamMetrics = {
    val m = new StreamMetrics(spark, maxEvents)
    spark.streams.addListener(m)
    m
  }
}
