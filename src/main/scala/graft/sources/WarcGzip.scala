package graft.sources

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

/** X134b/X134c: member-gzip WARC source — the format Common Crawl actually
  * ships (`.warc.gz`, one gzip MEMBER per record, members concatenated).
  * Completes the crawl story [[Warc]] opened: `Warc.read` handles
  * uncompressed streams via the Hadoop-delimiter split; this reader
  * handles the compressed archival form with BYTE-exact framing.
  *
  * Why member gzip is splittable by design: every record is its own gzip
  * member, and a member's start is findable by scanning for the gzip magic
  * (`1f 8b 08`) and VALIDATING the candidate — inflate the member, check
  * its CRC32/ISIZE trailer, and require the decompressed payload to start
  * with a `WARC/1.x\r\n` version line (the whole 1.x family: Common Crawl
  * is 1.0, ISO 28500:2017 / modern wget emit 1.1 — the version is
  * surfaced as the `warc_version` column). A false-positive magic inside
  * compressed data fails one of the three checks and the scan moves on
  * one byte; a gzip file whose members VALIDATE but are not WARC records
  * fails loudly (see [[scanRange]]) instead of reading as empty. So a
  * 100 TB crawl splits like any other file source: the driver plans
  * (file, start, end) ranges; each task scans ITS range for member starts
  * (a member beginning before `end` is owned by this split even when its
  * bytes run past it — the standard Hadoop split contract), inflates, and
  * parses. No driver-side I/O beyond the listing; memory per task is the
  * range plus one member overrun.
  *
  * Framing fixes over the lite reader, possible because each member is one
  * whole record in byte[] form:
  *   - Content-Length is HONORED: the payload is sliced to exactly the
  *     declared octet count, so a body carrying the literal bytes
  *     `WARC/1.0\r\n` cannot mis-split and the inter-record separator is
  *     never confused with payload (Warc.scala's documented marker-split
  *     limits);
  *   - binary payloads survive: `body_bytes` is the exact octet slice
  *     (the `body` string column is its UTF-8 decode with replacement,
  *     for text pipelines);
  *   - folded WARC headers (ISO 28500 LWS continuations) are unfolded
  *     before header extraction.
  *
  * Reference provenance: the reference has no sources at all (core.py
  * reads nothing but its own SQLite/Postgres tables); crawl-native
  * ingestion is new-scope for the training-data pipeline.
  */
object WarcGzip {

  /** One parsed record of a member-gzip WARC file. `body_bytes` is the
    * exact payload octet slice (after HTTP headers when present; transfer/
    * content decoded unless `decodeBody=false`); `body`/`record` are UTF-8
    * decodes (replacement on invalid sequences) for the text-pipeline
    * path. `warc_version` is the record's version line (`WARC/1.0`,
    * `WARC/1.1`, …); `warc_truncated` the `WARC-Truncated` reason when the
    * archiver cut the capture short (Common Crawl flags large payloads
    * with `length` — pipelines gate on it). `content_encoding` is the
    * capture's DECLARED `Content-Encoding` header (lowercased; NULL when
    * absent or no HTTP block) and `body_decoded` whether `body`/
    * `body_bytes` are the identity-coded DOCUMENT octets — false when a
    * transfer/content coding could not be (or was asked not to be)
    * removed: a `br`/`zstd` body this reader cannot decode, a malformed
    * chunked framing, or a `decodeBody=false` read of a coded capture.
    * Pipelines MUST gate on it before text extraction — an undecoded body
    * is compressed bytes, not HTML. Decode success is only knowable by
    * decoding, so the DSv2 scan FORCES the byte path whenever
    * `body_decoded` is projected; only a [[fetch]] with
    * `needBody=needBodyBytes=false` leaves it NULL.
    * `file`/`offset`/`length` are the member's archival coordinates —
    * exactly what a CDX index records (`warc_filename`/
    * `warc_record_offset`/`warc_record_length`), so a pruned projection
    * of them IS an index build, and [[fetch]] accepts them back for
    * random access.
    */
  final case class GzRecord(
      warc_type: Option[String],
      target_uri: Option[String],
      warc_date: Option[String],
      record_id: Option[String],
      warc_version: Option[String],
      warc_truncated: Option[String],
      refers_to: Option[String],
      payload_digest: Option[String],
      http_status: Option[Int],
      content_type: Option[String],
      content_encoding: Option[String],
      body: Option[String],
      body_bytes: Option[Array[Byte]],
      body_decoded: Option[Boolean],
      record: String,
      file: String,
      offset: Long,
      length: Long)

  /** Read `.warc.gz` files (a file, directory, or glob) into parsed
    * records. `splitBytes` bounds the per-task scan range — members
    * STARTING inside a range belong to it. `decodeBody` (default true)
    * decodes `Transfer-Encoding: chunked` and `Content-Encoding:
    * gzip/deflate` HTTP payloads to document octets (what warcio-class
    * readers do — real crawls carry raw captures); set false for the raw
    * capture bytes.
    */
  def read(spark: SparkSession, path: String,
           splitBytes: Long = 128L * 1024 * 1024,
           decodeBody: Boolean = true): DataFrame = {
    require(splitBytes > 0, "splitBytes > 0")
    // the range buffer is a JVM array: one split (plus one member overrun)
    // must stay addressable — and well under it for sane task memory.
    // MEMBER-SIZE contract: per-task memory is splitBytes + the largest
    // single member overrunning the range (compressed) + that member's
    // decompressed bytes — a pathological member larger than the task
    // heap OOMs that task; size executors for the archive's max record
    // (Common Crawl truncates payloads at 1 MiB, flagged WARC-Truncated)
    require(splitBytes <= (1L << 30), "splitBytes must be <= 1 GiB")
    // the DSv2 source (so Catalyst prunes columns INTO the parse: a
    // count(*) never decodes payloads, a body-only projection never builds
    // record strings)
    spark.read.format(classOf[WarcGzTableProvider].getName)
      .option("splitBytes", splitBytes.toString)
      .option("decodeBody", decodeBody.toString)
      .load(path)
  }

  /** Structured-streaming form of [[read]]: a drop-directory of
    * `.warc.gz` files as an unbounded record stream — the crawl-native
    * continuous-ingestion source for the COMPRESSED archival layout
    * (the sibling of [[Warc.readStream]]'s uncompressed text arm).
    * Each trigger ingests exactly the files that appeared since the
    * last offset (immutable-once-present drop convention, as Spark's
    * file stream source assumes), split and parsed by the same
    * validated-member scanner as the batch reader. Compose with
    * `Collection.streamIngest` or the [[graft.streaming]] operators.
    *
    * `maxFileAgeMs` bounds checkpoint-offset growth on long-lived drops:
    * files older than (newest mtime − maxFileAgeMs) roll out of the
    * offset's explicit file list into a watermark and are treated as
    * already seen — Spark's own file source `maxFileAge` semantics,
    * including its caveat: files already older than the horizon when
    * first listed are never read. Unset (the default), every seen file
    * stays in the offset forever — exact, but the offset JSON grows with
    * the drop directory.
    */
  def readStream(spark: SparkSession, path: String,
                 splitBytes: Long = 128L * 1024 * 1024,
                 decodeBody: Boolean = true,
                 maxFileAgeMs: Option[Long] = None): DataFrame = {
    require(splitBytes > 0 && splitBytes <= (1L << 30),
      "splitBytes must be in (0, 1 GiB]")
    require(maxFileAgeMs.forall(_ > 0), "maxFileAgeMs must be > 0")
    val r = spark.readStream.format(classOf[WarcGzTableProvider].getName)
      .option("splitBytes", splitBytes.toString)
      .option("decodeBody", decodeBody.toString)
    maxFileAgeMs.foreach(a => r.option("maxFileAgeMs", a.toString))
    r.load(path)
  }

  /** X141: member index build — (target_uri, record_id, warc_type,
    * warc_date, file, offset, length), one row per record: the CDX-shaped
    * pointer frame (Common Crawl's index carries exactly these as
    * `warc_filename`/`warc_record_offset`/`warc_record_length`). A pruned
    * projection of the DSv2 read, so the build is a HEADER-ONLY pass —
    * no body decode, no record strings. Persist it as parquet next to
    * the crawl: every later query [[fetch]]es its records selectively
    * instead of re-scanning the archive — the difference between
    * touching kilobytes and touching 100 TB.
    */
  def index(spark: SparkSession, path: String,
            splitBytes: Long = 128L * 1024 * 1024): DataFrame =
    read(spark, path, splitBytes)
      .select("target_uri", "record_id", "warc_type", "warc_date",
        "file", "offset", "length")

  /** X141: random-access fetch — read ONLY the records a pointer frame
    * names: (file, offset) rows, e.g. a filtered [[index]] or a parsed
    * CDX sidecar. Pointers repartition by file and sort by offset, so
    * each task opens its files once and seeks FORWARD through them; one
    * Inflater (and body decoder) per task, the batch reader's member
    * validation and parse per pointer. Extra pointer columns are
    * dropped (join the result back on (file, offset) to recover them).
    *
    * Pointers are CLAIMS, so failure is LOUD: a pointer that does not
    * address a valid WARC member raises with its coordinates — a silent
    * skip would be silent data loss against an index the caller trusts.
    * A pointer row with a NULL file or offset (what [[Cdx.read]]'s
    * documented malformed-line degrade produces) raises the same way,
    * naming the offending row — filter `offset IS NOT NULL` first to
    * fetch only the well-formed subset.
    *
    * `needRecord`/`needBody`/`needBodyBytes` are the batch reader's
    * pruning flags, surfaced as parameters because a Dataset transform
    * has no Catalyst pruning to hand them over: a skipped output comes
    * back NULL. `needRecord` defaults OFF — the full-record string is
    * the one output a fetch-by-pointer pipeline almost never reads, and
    * it doubles per-record decode cost.
    *
    * `subSplitBytes` lifts the parallelism floor off #files: pointers
    * bucket by (file, offset range) instead of file alone, so a fetch
    * concentrated in FEW files (one hot segment) spreads across tasks —
    * each bucket still opens its file once and seeks forward, and
    * duplicate pointers still collapse (same offset ⇒ same bucket). The
    * default (512 MiB of archive span per bucket) sub-splits only
    * CC-file-sized-and-up archives; pass `Long.MaxValue` for the strict
    * one-task-per-file layout.
    */
  def fetch(spark: SparkSession, pointers: DataFrame,
            decodeBody: Boolean = true,
            needRecord: Boolean = false,
            needBody: Boolean = true,
            needBodyBytes: Boolean = true,
            subSplitBytes: Long = 512L * 1024 * 1024): DataFrame = {
    require(subSplitBytes > 0, "subSplitBytes must be > 0")
    val confThunk = Bridge.serializableConf(spark.sessionState.newHadoopConf())
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, concat, lit, raise_error, when}
    // pointers are CLAIMS and failure must be LOUD *with coordinates* —
    // including a NULL file/offset (exactly what Cdx.read's documented
    // malformed-line degrade produces): without this guard the row dies
    // in the tuple encoder with an opaque null-field error
    val badPtr = col("file").isNull || col("offset").isNull
    val ptrs = pointers
      .select(
        when(badPtr, raise_error(concat(
          lit("fetch pointer with NULL coordinates (filter malformed index "),
          lit("rows with 'offset IS NOT NULL'): file="),
          coalesce(col("file").cast("string"), lit("NULL")),
          lit(" offset="),
          coalesce(col("offset").cast("string"), lit("NULL")))))
          .otherwise(col("file").cast("string")).as("file"),
        col("offset").cast("long").as("offset"))
      .as[(String, Long)]
    ptrs
      // partition by (file, offset bucket): several buckets landing in one
      // task stay correct — the per-partition (file, offset) sort keeps
      // each file's pointers contiguous and forward-seeking. The partition
      // COUNT is explicit: pointer rows are bytes but each one is a seek+
      // inflate downstream, and AQE's small-shuffle coalescing would
      // otherwise collapse the tiny pointer shuffle into ONE task
      // (measured: a 100k-pointer hot-file fetch ran single-threaded)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        org.apache.spark.sql.functions.col("file"),
        (org.apache.spark.sql.functions.col("offset") / subSplitBytes)
          .cast("long"))
      .sortWithinPartitions(
        org.apache.spark.sql.functions.col("file"),
        org.apache.spark.sql.functions.col("offset"))
      .mapPartitions { it =>
        val conf = confThunk()
        val inflater = new java.util.zip.Inflater(true)
        val decoder = if (decodeBody) new BodyDecoder(inflater) else null
        var curFile: String = null
        var in: FSDataInputStream = null
        var fileLen = 0L
        def closeIn(): Unit = if (in != null) {
          try in.close() catch { case _: Throwable => () }
          in = null
        }
        // lazily-consumed output: the stream and native zlib state must
        // survive until the LAST row is pulled — release at task end
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
          new org.apache.spark.util.TaskCompletionListener {
            override def onTaskCompletion(ctx: org.apache.spark.TaskContext): Unit = {
              try inflater.end() catch { case _: Throwable => () }
              try { if (decoder != null) decoder.close() } catch { case _: Throwable => () }
              closeIn()
            }
          }))
        var lastFile: String = null
        var lastOff = -1L
        it.flatMap { case (f, off) =>
          // duplicate pointers collapse (they are adjacent after the
          // repartition-by-file + offset sort): a whole-file-gzip index
          // emits ONE coordinate pair for ALL its records, so a filtered
          // index naturally carries duplicates — re-inflating the member
          // per duplicate would be quadratic output
          if (f == lastFile && off == lastOff) Iterator.empty
          else {
          lastFile = f; lastOff = off
          if (f != curFile) {
            closeIn()
            val p = new Path(f)
            val fs = p.getFileSystem(conf)
            fileLen = fs.getFileStatus(p).getLen
            in = fs.open(p)
            curFile = f
          }
          in.seek(off)
          val win = new ByteWindow(in, off, fileLen)
          val isMember = win.byteAt(off) == 0x1f && win.byteAt(off + 1) == 0x8b &&
            win.byteAt(off + 2) == 0x08
          val parsed = if (!isMember) MemberInvalid else inflateMember(win, off, inflater)
          parsed match {
            case MemberWarc(rec, memberLen) =>
              // flatMap: a whole-file-gzip member holds EVERY record —
              // the member is the addressable unit
              memberRecords(rec, needRecord, needBody, needBodyBytes,
                decoder, f, off, memberLen)
            case _ => throw new IllegalArgumentException(
              s"pointer $f:$off does not address a valid member-gzip WARC record")
          }
          }
        }
      }
      .toDF()
  }

  /** The matched (file uri, length, mtime) triples of a path — a file,
    * directory, or glob; hidden/_ files skipped. ONE listing
    * implementation for the batch planner and the streaming source (a
    * divergence here would silently make batch and streaming ingest
    * different file sets from the same drop directory). `allowMissing`
    * is the streaming contract: a watched path that does not exist YET
    * is an empty listing, not an error. The mtime is the streaming
    * source's compaction horizon input (`maxFileAgeMs`); the batch
    * planner ignores it.
    */
  private[sources] def matchedFiles(hconf: org.apache.hadoop.conf.Configuration,
                                    path: String,
                                    allowMissing: Boolean = false): Seq[(String, Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val matched: Seq[FileStatus] = Option(fs.globStatus(p)) match {
      case Some(g) if g.nonEmpty => g.toSeq
      case _ =>
        if (allowMissing && !fs.exists(p)) Seq.empty
        else Seq(fs.getFileStatus(p))
    }
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(f =>
          f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
      else Seq(st)
    }.map(st => (st.getPath.toUri.toString, st.getLen, st.getModificationTime))
  }

  /** (file, start, end) scan ranges for explicit (file, length) pairs —
    * shared by the batch planner and the streaming source's per-trigger
    * planning. */
  private[sources] def splitRanges(files: Seq[(String, Long)],
                                   splitBytes: Long): Seq[(String, Long, Long)] =
    files.flatMap { case (uri, len) =>
      (0L until math.max(len, 1L) by splitBytes)
        .map(s => (uri, s, math.min(s + splitBytes, len)))
    }

  /** Driver-side split planning: [[matchedFiles]] → [[splitRanges]]. */
  private[sources] def planSplits(hconf: org.apache.hadoop.conf.Configuration,
                                  path: String,
                                  splitBytes: Long): Seq[(String, Long, Long)] =
    splitRanges(matchedFiles(hconf, path).map { case (f, l, _) => (f, l) },
      splitBytes)

  // --- range scanning ------------------------------------------------------

  /** A growable forward window over one file: absolute positions, refilled
    * from the stream on demand. Memory = the split range plus whatever the
    * final member overruns (one member's compressed bytes).
    */
  private final class ByteWindow(in: FSDataInputStream, base: Long,
                                 fileLen: Long) {
    private var buf = new Array[Byte](1 << 16)
    private var have = 0L // bytes of [base, base+have) loaded

    /** Ensure [base, upTo) is loaded (clamped to fileLen); returns the
      * absolute exclusive end actually available. */
    def ensure(upTo: Long): Long = {
      val want = math.min(upTo, fileLen) - base
      if (want > have) {
        if (want > buf.length) {
          var cap = buf.length.toLong
          while (cap < want) cap *= 2
          buf = java.util.Arrays.copyOf(buf, math.min(cap, Int.MaxValue).toInt)
        }
        while (have < want) {
          val n = in.read(buf, have.toInt, (want - have).toInt)
          if (n < 0) return base + have // short file (listing raced a writer)
          have += n
        }
      }
      base + have
    }

    /** Byte at absolute pos, or -1 past EOF. */
    def byteAt(pos: Long): Int =
      if (ensure(pos + 1) <= pos) -1
      else buf((pos - base).toInt) & 0xff

    /** Exact slice [from, until) — caller must have ensured it. */
    def slice(from: Long, until: Long): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, (from - base).toInt, (until - base).toInt)

    def available: Long = base + have
  }

  /** Scan one (file, start, end) range: find, validate, inflate, and parse
    * every member starting in [start, end).
    *
    * FAIL-LOUD contract: a gzip member at FILE OFFSET 0 that fully
    * validates (inflate + CRC32/ISIZE) but whose payload is not a WARC
    * record is evidence the file is NOT member-gzip WARC at all (the
    * format's first member is always a record) — if the offset-0 range
    * ends having seen that and ZERO records, it raises instead of
    * silently contributing an empty slice (the unsupported-format trap: a
    * plain `.gz` or a WARC/2.x must be distinguishable from an empty
    * archive). Offset 0 ONLY, deliberately: a `Content-Encoding: gzip`
    * HTTP body inside a member is often emitted VERBATIM by the outer
    * deflate (incompressible input → stored blocks), so mid-file ranges
    * of legitimate crawls routinely contain embedded valid-gzip non-WARC
    * members — those are skipped whole, never an error.
    */
  private[sources] def scanRange(conf: org.apache.hadoop.conf.Configuration,
                                 file: String, start: Long, end: Long,
                                 needRecord: Boolean = true,
                                 needBody: Boolean = true,
                                 needBodyBytes: Boolean = true,
                                 decodeBody: Boolean = true,
                                 keepTypes: Set[String] = null,
                                 keepStatuses: Set[Int] = null,
                                 uriPrefixes: Seq[String] = null): Iterator[GzRecord] = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    in.seek(start)
    val win = new ByteWindow(in, start, fileLen)
    // ONE Inflater per range, reset() per member: Inflater holds native
    // zlib state — per-member construction was the dominant cost of a
    // 2M-member read. The body decoder shares it (member inflation and
    // body decode never overlap) plus a lazily-created zlib-wrapped one
    // for Content-Encoding: deflate.
    val inflater = new java.util.zip.Inflater(true)
    val decoder = if (decodeBody) new BodyDecoder(inflater) else null
    // a task abandoned mid-iteration (limit, failure) must still release
    // the stream and the native zlib state
    Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
      new org.apache.spark.util.TaskCompletionListener {
        override def onTaskCompletion(ctx: org.apache.spark.TaskContext): Unit = {
          try inflater.end() catch { case _: Throwable => () }
          try { if (decoder != null) decoder.close() } catch { case _: Throwable => () }
          try in.close() catch { case _: Throwable => () }
        }
      }))
    // LAZY iterator — records parse as the consumer pulls, so a task never
    // buffers its whole range's records and downstream work pipelines with
    // the scan (the window still holds the range bytes; that is the task's
    // documented memory bound)
    new Iterator[GzRecord] {
      private var pos = start
      private var pending: Iterator[GzRecord] = Iterator.empty
      private var closed = false
      private var warcMembers = 0L
      private var nonWarcAtFileStart = false
      private def close(): Unit = if (!closed) {
        closed = true
        inflater.end()
        if (decoder != null) decoder.close()
        in.close()
      }
      private def advance(): Unit = {
        while (!pending.hasNext && pos < end && pos < fileLen) {
          if (win.byteAt(pos) == 0x1f && win.byteAt(pos + 1) == 0x8b &&
              win.byteAt(pos + 2) == 0x08) {
            inflateMember(win, pos, inflater) match {
              case MemberWarc(rec, memberLen) =>
                // memberRecords, not a single parse: a whole-file-gzip
                // archive is ONE member holding EVERY record
                val rs = memberRecords(rec, needRecord, needBody,
                  needBodyBytes, decoder, file, pos, memberLen, keepTypes,
                  keepStatuses, uriPrefixes)
                // the fail-loud evidence counter counts WARC MEMBERS, not
                // emitted rows: a pushed type filter skipping every record
                // of a legitimate file must not fabricate format evidence
                warcMembers += 1
                pending = rs.iterator
                pos += memberLen
              case MemberNonWarc(memberLen) =>
                // a VALID gzip member whose payload is not a WARC record:
                // flagged for the fail-loud check when it is the FILE's
                // first member, then skipped whole (its interior cannot
                // contain a record start)
                if (pos == 0L) nonWarcAtFileStart = true
                pos += memberLen
              case MemberInvalid =>
                pos += 1
            }
          } else pos += 1
        }
        if (!pending.hasNext) {
          close()
          if (warcMembers == 0L && nonWarcAtFileStart)
            throw new IllegalStateException(
              s"$file is not member-gzip WARC: its first gzip member is " +
                "valid but its payload does not start with a 'WARC/1.x' " +
                "version line. This reader supports the WARC/1.x " +
                "member-gzip layout (one record per gzip member, Common " +
                "Crawl's .warc.gz); for uncompressed WARC use Warc.read.")
        }
      }
      override def hasNext: Boolean = {
        if (!pending.hasNext && !closed) advance()
        pending.hasNext
      }
      override def next(): GzRecord = {
        if (!hasNext) throw new NoSuchElementException("scanRange")
        pending.next()
      }
    }
  }

  private sealed trait MemberResult
  /** A validated member whose payload is a WARC record. */
  private final case class MemberWarc(data: Array[Byte], memberLen: Long)
      extends MemberResult
  /** A validated gzip member (inflate + CRC32/ISIZE pass) whose payload is
    * NOT a WARC record — evidence of a non-WARC gzip file. */
  private final case class MemberNonWarc(memberLen: Long) extends MemberResult
  /** Not a gzip member at all (false-positive magic). */
  private case object MemberInvalid extends MemberResult

  /** Try to inflate one gzip member at absolute `off` (magic already
    * matched). [[MemberWarc]] when the member validates (inflate succeeds,
    * CRC32/ISIZE trailer matches) AND its payload starts with a
    * `WARC/1.x\r\n` version line; [[MemberNonWarc]] when it validates but
    * the payload is not a WARC record; [[MemberInvalid]] on malformed
    * header, inflate error, or trailer mismatch — the three-way validation
    * that makes magic-scanning safe against false positives in compressed
    * data.
    *
    * Residual risk, documented: the validation is not information-
    * theoretically airtight. An adversarial member built from STORED
    * (type-0) deflate blocks can embed a complete valid member verbatim,
    * so a split starting inside the enclosing member could emit the
    * embedded record as a phantom. Real compressors never emit such
    * blocks for WARC-shaped data, members in the wild are chain-
    * contiguous, and the enclosing member's own range still parses its
    * full content — the trap requires deliberately crafted input, and the
    * cost of closing it (chain-only trust after the first member) would
    * break legitimate recovery over corrupt regions.
    */
  private def inflateMember(win: ByteWindow, off: Long,
                            inflater0: java.util.zip.Inflater): MemberResult = {
    // gzip header: magic(2) cm(1) flg(1) mtime(4) xfl(1) os(1) [+optionals]
    val flg = win.byteAt(off + 3)
    if (flg < 0) return MemberInvalid
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      val lo = win.byteAt(p); val hi = win.byteAt(p + 1)
      if (lo < 0 || hi < 0) return MemberInvalid
      p += 2 + (lo | (hi << 8))
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      var b = win.byteAt(p)
      while (b > 0) { p += 1; b = win.byteAt(p) }
      if (b < 0) return MemberInvalid
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      var b = win.byteAt(p)
      while (b > 0) { p += 1; b = win.byteAt(p) }
      if (b < 0) return MemberInvalid
      p += 1
    }
    if ((flg & 2) != 0) p += 2 // FHCRC
    val inflater = inflater0 // nowrap raw-deflate, caller-owned
    inflater.reset()
    try {
      val outBuf = new java.io.ByteArrayOutputStream(64 * 1024)
      val chunkOut = new Array[Byte](64 * 1024)
      // first input chunk small (typical members are a few hundred bytes —
      // feeding the whole loaded window tail per member measured as GBs of
      // redundant copying at 2M members), refills larger for big members
      var chunkIn = 8 * 1024
      var inPos = p
      var done = false
      while (!done) {
        if (inflater.needsInput()) {
          val availEnd = math.min(win.ensure(inPos + chunkIn), inPos + chunkIn)
          if (availEnd <= inPos) return MemberInvalid // truncated member
          inflater.setInput(win.slice(inPos, availEnd))
          inPos = availEnd
          chunkIn = 256 * 1024
        }
        val n = inflater.inflate(chunkOut)
        if (n > 0) {
          outBuf.write(chunkOut, 0, n)
          // a member's decompressed form must fit one JVM array (2 GiB);
          // approaching the limit, fail LOUD and actionable instead of
          // grinding toward an opaque OutOfMemoryError. Legitimate large
          // single records up to ~1.9 GiB still read — only the hard
          // platform ceiling raises (typically the whole-file-gzip
          // misformat on an archive too large for one-member recovery).
          if (outBuf.size() < 0 || outBuf.size() > Int.MaxValue - (128 << 20))
            throw new IllegalStateException(
              "gzip member decompresses past the JVM's 2 GiB array limit. " +
                "If this is a whole-file-gzip archive (gzip file.warc), " +
                "recompress it member-per-record (WarcGzip.writeGzip) or " +
                "decompress it and read with Warc.read.")
        }
        else if (inflater.finished()) done = true
        else if (inflater.needsDictionary()) return MemberInvalid
        else if (!inflater.needsInput()) return MemberInvalid // no progress
      }
      val data = outBuf.toByteArray
      val compLen = inflater.getBytesRead
      val trailerOff = p + compLen
      if (win.ensure(trailerOff + 8) < trailerOff + 8) return MemberInvalid
      val t = win.slice(trailerOff, trailerOff + 8)
      def le32(b: Array[Byte], i: Int): Long =
        (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      if (le32(t, 0) != crc.getValue) return MemberInvalid
      if (le32(t, 4) != (data.length & 0xffffffffL)) return MemberInvalid
      // marker check LAST, after the member proved gzip-valid — a valid
      // member with a non-WARC payload is the fail-loud signal upstream
      if (versionLineLength(data) < 0) MemberNonWarc(trailerOff + 8 - off)
      else MemberWarc(data, trailerOff + 8 - off)
    } catch {
      case _: java.util.zip.DataFormatException => MemberInvalid
    }
  }

  private val MarkerPrefix =
    "WARC/1.".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Length of the record's version line INCLUDING its CRLF when `data`
    * at `from` starts with `WARC/1.<digits>\r\n` (the WARC/1.x family —
    * ISO 28500:2017 is 1.1, Common Crawl is 1.0), else -1. Family match,
    * not the literal 1.0: a WARC/1.1 archive silently reading as zero
    * records was the exact trap this validation exists to avoid.
    */
  private[sources] def versionLineLength(data: Array[Byte], from: Int = 0): Int = {
    if (data.length - from < MarkerPrefix.length + 3) return -1
    var i = 0
    while (i < MarkerPrefix.length) {
      if (data(from + i) != MarkerPrefix(i)) return -1
      i += 1
    }
    var j = from + i
    val digitsStart = j
    while (j < data.length && data(j) >= '0' && data(j) <= '9') j += 1
    if (j == digitsStart || j + 1 >= data.length) return -1
    if (data(j) != '\r' || data(j + 1) != '\n') return -1
    j + 2 - from
  }

  /** All records of one decompressed member. The archival member-gzip
    * layout has exactly one record per member, but the common MISFORMAT
    * `gzip file.warc` (whole-file gzip) inflates as ONE member holding
    * the whole archive — reading only its first record would be silent
    * data loss of the rest. The walk finds every record: from a known
    * start, frame by Content-Length, skip the inter-record separator,
    * and require the next bytes to be a version line; a record without
    * Content-Length (or trailing non-record bytes) ends the walk with
    * the remainder owned by the last record. The walk and the parse
    * share work: the walk's (header-end, unfolded headers,
    * Content-Length) feed [[parseMemberRecord]] as hints, so the
    * archival one-record case costs exactly what a direct parse did (no
    * copies, no duplicate header scan). Multi-record members slice per
    * record and share the member's (file, offset, length) coordinates:
    * the member is the addressable unit, fetch on it returns all its
    * records.
    */
  private[graft] def memberRecords(data: Array[Byte],
                                     needRecord: Boolean, needBody: Boolean,
                                     needBodyBytes: Boolean,
                                     decoder: BodyDecoder,
                                     file: String, offset: Long,
                                     memberLen: Long,
                                     keepTypes: Set[String] = null,
                                     keepStatuses: Set[Int] = null,
                                     uriPrefixes: Seq[String] = null): Seq[GzRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[GzRecord]
    var p = 0
    var more = true
    while (more) {
      val hdrEnd = indexOfCrlfCrlf(data, p, data.length)
      val hdrs =
        if (hdrEnd < 0) // truncated: ALL headers — decode them for the walk
          unfold(new String(data, p, data.length - p, Utf8))
        else unfold(new String(data, p, hdrEnd - p, Utf8))
      val cl: Long =
        header(hdrs, "Content-Length")
          .flatMap(s => scala.util.Try(s.trim.toLong).toOption).getOrElse(-1L)
      // next record start: past the framed payload + inter-record CRLFCRLF,
      // and only when a version line actually begins there. cl is bounded
      // by the member FIRST: a lying near-Long.MaxValue Content-Length
      // would overflow nx, slip past the >= length guard wrapped, and
      // either loop this walk forever (next == p) or make copyOfRange
      // throw — the degrade contract demands it ends the walk instead
      val next: Int =
        if (hdrEnd < 0 || cl < 0 || cl > data.length.toLong) -1
        else {
          val nx = hdrEnd.toLong + 4 + cl + 4
          if (nx <= p || nx >= data.length || versionLineLength(data, nx.toInt) < 0) -1
          else nx.toInt
        }
      // pushed WARC-Type gate (the DSv2 filter hook): a record whose type
      // does not match is skipped BEFORE any slice/decode/body work — on a
      // real mixed archive (request+response+metadata per capture) a
      // response-only read never touches the other records' payloads. The
      // walk above still advances by Content-Length regardless. A NULL
      // type never matches (SQL equality semantics; Spark re-applies the
      // filter post-scan anyway — this gate only SKIPS work).
      val keep = (keepTypes == null ||
          header(hdrs, "WARC-Type").exists(keepTypes.contains)) &&
        (uriPrefixes == null ||
          // conjunctive prefixes all apply; a NULL uri never matches (SQL
          // startsWith semantics, re-checked post-scan anyway)
          header(hdrs, "WARC-Target-URI").exists(u => uriPrefixes.forall(u.startsWith)))
      if (keep) {
        val slice =
          if (p == 0 && next < 0) data
          else java.util.Arrays.copyOfRange(data, p, if (next < 0) data.length else next)
        val r = parseMemberRecord(slice, needRecord, needBody, needBodyBytes,
          decoder, file, offset, memberLen,
          hdrEndHint = if (hdrEnd < 0) -1 else hdrEnd - p,
          warcHeadersHint = hdrs,
          contentLengthHint = cl,
          keepStatuses = keepStatuses)
        if (r != null) out += r
      }
      if (next < 0) more = false else p = next
    }
    out.toSeq
  }

  // --- record parsing (Content-Length framing, byte-exact) ----------------

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val lim = math.min(until, b.length) - 3
    while (i <= lim) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // fixed header set → patterns compiled ONCE per JVM (a compile per
  // record per header dominated the 2M-member parse)
  private val headerPatterns: Map[String, java.util.regex.Pattern] =
    Seq("WARC-Type", "WARC-Target-URI", "WARC-Date", "WARC-Record-ID",
      "WARC-Truncated", "WARC-Refers-To", "WARC-Payload-Digest",
      "Content-Length", "Content-Type",
      "Transfer-Encoding", "Content-Encoding").map { name =>
      name -> java.util.regex.Pattern.compile(
        s"(?im)^${java.util.regex.Pattern.quote(name)}:[ \\t]*(.*?)\\r?$$")
    }.toMap

  private def header(headers: String, name: String): Option[String] = {
    val m = headerPatterns(name).matcher(headers)
    if (m.find()) Some(m.group(1)).filter(_.nonEmpty) else None
  }

  private val statusPattern =
    java.util.regex.Pattern.compile("^HTTP/[0-9.]+[ \\t]+(\\d{3})")

  /** Parse one whole record (the decompressed member). Content-Length
    * frames the payload exactly when present; a record without it (or a
    * truncated one) degrades to the remaining bytes with one trailing
    * record separator stripped — never an error, matching the lite
    * reader's degrade-don't-throw contract.
    *
    * `needRecord`/`needBody`/`needBodyBytes` skip the corresponding
    * output's construction (the DSv2 column pruning hooks — a `count(*)`
    * over a crawl must not UTF-8-decode 100 TB of payloads); skipped
    * fields come back None/null and must not be projected by the caller.
    *
    * When `decoder` is non-null, an HTTP payload declaring
    * `Transfer-Encoding: chunked` is dechunked and one declaring
    * `Content-Encoding: gzip|deflate` is decompressed, so `body_bytes`
    * are the DOCUMENT octets (what downstream `htmlToText` must see —
    * real crawls store raw captures); a malformed encoding degrades to
    * the raw capture bytes, never an error.
    */
  /** `keepStatuses` is the pushed http_status gate: a record whose
    * status is absent or not in the set returns NULL (only possible when
    * the gate is set — the fetch/default paths never pass one), skipping
    * its body slice+decode; Spark re-applies the filter post-scan. */
  private[graft] def parseMemberRecord(rec: Array[Byte],
                                         needRecord: Boolean = true,
                                         needBody: Boolean = true,
                                         needBodyBytes: Boolean = true,
                                         decoder: BodyDecoder = null,
                                         file: String = "",
                                         offset: Long = 0L,
                                         length: Long = 0L,
                                         hdrEndHint: Int = -2,
                                         warcHeadersHint: String = null,
                                         contentLengthHint: Long = -2L,
                                         keepStatuses: Set[Int] = null): GzRecord = {
    val recStr = if (needRecord) new String(rec, Utf8) else null
    val verLen = versionLineLength(rec)
    val version =
      if (verLen < 0) None
      else Some(new String(rec, 0, verLen - 2, java.nio.charset.StandardCharsets.US_ASCII))
    // hints: [[memberRecords]]'s boundary walk already found the header
    // end, unfolded the headers, and extracted Content-Length — redoing
    // them per record was a measured regression on the 2M read
    val hdrEnd =
      if (hdrEndHint != -2) hdrEndHint
      else indexOfCrlfCrlf(rec, 0, rec.length)
    if (hdrEnd < 0) { // truncated: all headers, no payload
      if (keepStatuses != null) return null // no HTTP block => no status
      val hdrs =
        if (warcHeadersHint != null) warcHeadersHint
        else unfold(if (recStr != null) recStr else new String(rec, Utf8))
      return GzRecord(
        header(hdrs, "WARC-Type"),
        header(hdrs, "WARC-Target-URI"),
        header(hdrs, "WARC-Date"),
        header(hdrs, "WARC-Record-ID"),
        version,
        header(hdrs, "WARC-Truncated"),
        header(hdrs, "WARC-Refers-To"),
        header(hdrs, "WARC-Payload-Digest"),
        None, None, None, None, None, None, recStr, file, offset, length)
    }
    // ISO 28500 LWS unfolding: a continuation line (CRLF + SP/HT) is part
    // of the previous header's value. Without a hint, when the full record
    // string exists it is re-sliced (same logical boundary as the
    // byte-level hdrEnd — a second byte decode of every record measured
    // as real cost at 2M members); under pruning only the header bytes
    // decode.
    val warcHeaders =
      if (warcHeadersHint != null) warcHeadersHint
      else unfold(
        if (recStr != null)
          recStr.substring(0, recStr.indexOf("\r\n\r\n") match {
            case -1 => recStr.length; case i => i
          })
        else new String(rec, 0, hdrEnd, Utf8))
    val payloadStart = hdrEnd + 4
    val contentLength =
      if (contentLengthHint != -2L) (if (contentLengthHint < 0) None else Some(contentLengthHint))
      else header(warcHeaders, "Content-Length")
        .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    val payloadEnd = contentLength match {
      case Some(n) => math.min(payloadStart + n, rec.length.toLong).toInt
      case None => // no framing: strip one trailing separator if present
        if (rec.length >= payloadStart + 4 &&
            rec(rec.length - 4) == '\r' && rec(rec.length - 3) == '\n' &&
            rec(rec.length - 2) == '\r' && rec(rec.length - 1) == '\n')
          rec.length - 4
        else rec.length
    }
    // HTTP block: only when the payload leads with a status line AND the
    // block is blank-line-terminated within the payload (the lite reader's
    // consistent-parse contract: a truncated HTTP head is raw body)
    val isHttp = payloadEnd - payloadStart >= 5 &&
      rec(payloadStart) == 'H' && rec(payloadStart + 1) == 'T' &&
      rec(payloadStart + 2) == 'T' && rec(payloadStart + 3) == 'P' &&
      rec(payloadStart + 4) == '/'
    val httpEnd = if (isHttp) indexOfCrlfCrlf(rec, payloadStart, payloadEnd) else -1
    val (status, ctype, bodyStart, chunked, encoding) =
      if (httpEnd >= 0) {
        val httpHeaders = unfold(new String(rec, payloadStart, httpEnd - payloadStart, Utf8))
        val st = statusPattern.matcher(httpHeaders)
        // chunked is the FINAL Transfer-Encoding token per RFC 9112 §6.1
        val te = header(httpHeaders, "Transfer-Encoding")
          .exists(_.trim.toLowerCase(java.util.Locale.ROOT).endsWith("chunked"))
        val ce = header(httpHeaders, "Content-Encoding")
          .map(_.trim.toLowerCase(java.util.Locale.ROOT))
        (if (st.find()) Some(st.group(1).toInt) else None,
          header(httpHeaders, "Content-Type"),
          httpEnd + 4, te, ce)
      } else (None, None, payloadStart, false, None)
    // pushed http_status gate: skip BEFORE body work (a NULL status never
    // matches — SQL equality semantics, re-checked post-scan anyway)
    if (keepStatuses != null && !status.exists(keepStatuses.contains))
      return null
    val (bodyBytes, decoded) =
      if (needBody || needBodyBytes) {
        val raw = java.util.Arrays.copyOfRange(
          rec, bodyStart, math.max(bodyStart, payloadEnd))
        if (decoder == null)
          // raw read: the body is document octets iff no coding was declared
          (raw, Some(!chunked && encoding.forall(_ == "identity")))
        else {
          val (out, ok) = decoder.decode(raw, chunked, encoding)
          (out, Some(ok))
        }
      } else (null, None)
    GzRecord(
      header(warcHeaders, "WARC-Type"),
      header(warcHeaders, "WARC-Target-URI"),
      header(warcHeaders, "WARC-Date"),
      header(warcHeaders, "WARC-Record-ID"),
      version,
      header(warcHeaders, "WARC-Truncated"),
      header(warcHeaders, "WARC-Refers-To"),
      header(warcHeaders, "WARC-Payload-Digest"),
      status,
      // HTTP-block Content-Type when present, else the WARC-level header
      // (conversion/WET records describe their payload there)
      ctype.orElse(header(warcHeaders, "Content-Type")),
      encoding,
      if (needBody) Some(new String(bodyBytes, Utf8)) else None,
      if (needBodyBytes) Some(bodyBytes) else None,
      decoded,
      recStr, file, offset, length)
  }

  // --- HTTP body decoding (transfer + content codings) ---------------------

  /** Decodes raw HTTP capture bytes to document octets: `Transfer-
    * Encoding: chunked` dechunking, then `Content-Encoding: gzip/deflate`
    * decompression — the layering RFC 9110/9112 define and warcio-class
    * readers apply. One instance per scan range: the raw Inflater is the
    * RANGE's (member inflation and body decode never overlap; both
    * reset() before use), and the zlib-wrapped one for `deflate` is
    * created lazily once. Every failure degrades to the input bytes —
    * a truncated or lying capture yields its raw form, never an error —
    * and [[decode]]'s second result says whether the output IS document
    * octets (every declared layer removed): false for a failed dechunk/
    * decompress AND for codings this reader has no decoder for (`br`,
    * `zstd`), where the bytes pass through still compressed.
    */
  private[sources] final class BodyDecoder(raw: java.util.zip.Inflater) {
    private var zlib: java.util.zip.Inflater = _
    def close(): Unit = if (zlib != null) { zlib.end(); zlib = null }

    def decode(body: Array[Byte], chunked: Boolean,
               encoding: Option[String]): (Array[Byte], Boolean) = {
      // each helper returns ITS INPUT (reference-same) exactly on failure,
      // so `eq` is the success test — success always allocates fresh output
      val dechunked = if (chunked) dechunk(body) else body
      val chunkOk = !chunked || !(dechunked eq body)
      encoding match {
        case Some("gzip") | Some("x-gzip") =>
          val out = gunzip(dechunked)
          (out, chunkOk && !(out eq dechunked))
        case Some("deflate") =>
          val out = inflate(dechunked)
          (out, chunkOk && !(out eq dechunked))
        case Some("identity") | None => (dechunked, chunkOk)
        case Some(_) => (dechunked, false) // br/zstd/unknown: still coded
      }
    }

    /** RFC 9112 §7.1 chunked decoding: hex size line (chunk extensions
      * after `;` ignored), chunk data, CRLF, …, terminated by a 0-size
      * chunk (trailer headers dropped). Malformed → raw input.
      */
    private def dechunk(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(b.length)
      var i = 0
      while (true) {
        // parse the hex chunk size
        var size = 0L
        var digits = 0
        var c = if (i < b.length) b(i) & 0xff else -1
        while (c >= 0 && java.lang.Character.digit(c, 16) >= 0 && digits <= 15) {
          size = size * 16 + java.lang.Character.digit(c, 16)
          digits += 1; i += 1
          c = if (i < b.length) b(i) & 0xff else -1
        }
        if (digits == 0 || digits > 15) return b
        // skip chunk extensions to the CRLF
        while (i < b.length && b(i) != '\r') i += 1
        if (i + 1 >= b.length || b(i + 1) != '\n') return b
        i += 2
        if (size == 0) return out.toByteArray // trailer section dropped
        if (i + size > b.length) return b // truncated chunk
        out.write(b, i, size.toInt)
        i += size.toInt
        // the CRLF closing the chunk data
        if (i + 1 >= b.length || b(i) != '\r' || b(i + 1) != '\n') return b
        i += 2
      }
      b // unreachable
    }

    /** gzip header walk: the deflate-data start offset for a member at
      * `start`, or -1 when malformed/truncated. */
    private def skipGzipHeader(b: Array[Byte], start: Int): Int = {
      if (b.length - start < 18 || (b(start) & 0xff) != 0x1f ||
          (b(start + 1) & 0xff) != 0x8b || b(start + 2) != 8) return -1
      val flg = b(start + 3) & 0xff
      var p = start + 10
      try {
        if ((flg & 4) != 0) {
          p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
        }
        if ((flg & 8) != 0) { while (b(p) != 0) p += 1; p += 1 }
        if ((flg & 16) != 0) { while (b(p) != 0) p += 1; p += 1 }
        if ((flg & 2) != 0) p += 2
      } catch {
        case _: ArrayIndexOutOfBoundsException => return -1
      }
      if (p >= b.length) -1 else p
    }

    /** gzip member(s) → bytes via the range's raw Inflater. ALL members
      * decode (legal gzip is any number of concatenated members, and
      * some servers emit multi-member bodies — decoding only the first
      * would truncate the document invisibly); trailing non-gzip bytes
      * after a decoded stream are ignored (server junk, the browser
      * convention). Trailer CRCs are TRUSTED (the WARC member's own CRC
      * already covered these bytes). A malformed FIRST member degrades
      * to the raw input; a malformed LATER member yields the decoded
      * prefix.
      */
    private def gunzip(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 3))
      val buf = new Array[Byte](64 * 1024)
      var p = 0
      var members = 0
      while (p >= 0 && p + 18 <= b.length && (b(p) & 0xff) == 0x1f &&
             (b(p + 1) & 0xff) == 0x8b && b(p + 2) == 8) {
        val dataStart = skipGzipHeader(b, p)
        if (dataStart < 0) p = -1
        else {
          raw.reset()
          raw.setInput(b, dataStart, b.length - dataStart)
          val memberOut = new java.io.ByteArrayOutputStream(64 * 1024)
          try {
            var ok = true
            while (ok && !raw.finished()) {
              val n = raw.inflate(buf)
              if (n > 0) memberOut.write(buf, 0, n)
              else if (raw.needsInput() || raw.needsDictionary()) ok = false
            }
            if (ok) {
              memberOut.writeTo(out)
              members += 1
              p = dataStart + raw.getBytesRead.toInt + 8 // + CRC32/ISIZE trailer
            } else p = -1
          } catch {
            case _: java.util.zip.DataFormatException => p = -1
          }
        }
      }
      if (members == 0) b else out.toByteArray
    }

    /** `deflate` content coding: zlib-wrapped per RFC 9110 §8.4.1.2, but
      * some servers send raw deflate — try zlib first, fall back raw.
      */
    private def inflate(b: Array[Byte]): Array[Byte] = {
      if (zlib == null) zlib = new java.util.zip.Inflater(false)
      inflateWith(zlib, b, 0).orElse(inflateWith(raw, b, 0)).getOrElse(b)
    }

    private def inflateWith(inf: java.util.zip.Inflater, b: Array[Byte],
                            from: Int): Option[Array[Byte]] = {
      inf.reset()
      inf.setInput(b, from, b.length - from)
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
      val buf = new Array[Byte](64 * 1024)
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
          else if (inf.needsInput() || inf.needsDictionary()) return None // truncated
        }
        Some(out.toByteArray)
      } catch {
        case _: java.util.zip.DataFormatException => None
      }
    }
  }

  private val unfoldPattern = java.util.regex.Pattern.compile("\r?\n[ \t]+")

  /** LWS unfolding: CRLF (or LF) followed by SP/HT joins the previous
    * line, per ISO 28500 §4 / RFC 822 folding.
    */
  private def unfold(headers: String): String =
    unfoldPattern.matcher(headers).replaceAll(" ")

  // --- write side ----------------------------------------------------------

  /** Write record strings as a member-gzip WARC: ONE gzip member per
    * record (Common Crawl's layout — what keeps the output splittable),
    * one `.warc.gz` part file per partition. `records` must be a single
    * string column of full record strings, version marker included
    * ([[Warc.formatResponse]] output). Overwrites `path`.
    *
    * Commit protocol: each task writes an ATTEMPT-SCOPED hidden temp file
    * (`.part-<pid>-attempt-<taskAttemptId>.tmp` — hidden names are also
    * invisible to [[planSplits]]) and renames it into place only on
    * success — a speculative or retried attempt racing a zombie can never
    * interleave bytes into the final file, and a mid-job failure leaves
    * only temp files a re-run's overwrite removes, never a truncated
    * part the reader would silently parse short. First rename wins;
    * the loser deletes its temp (both attempts produce identical bytes).
    */
  def writeGzip(records: DataFrame, path: String): Unit = {
    require(records.schema.fields.length == 1 &&
      records.schema.fields(0).dataType == org.apache.spark.sql.types.StringType,
      "writeGzip expects exactly one STRING column of full record strings")
    val spark = records.sparkSession
    val confThunk = Bridge.serializableConf(spark.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    import spark.implicits._
    records.as[String].foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val ctx = org.apache.spark.TaskContext.get()
        val pid = ctx.partitionId()
        val taskFs = new Path(path).getFileSystem(confThunk())
        val tmp = new Path(f"$path/.part-$pid%05d-attempt-${ctx.taskAttemptId()}.tmp")
        val dest = new Path(f"$path/part-$pid%05d.warc.gz")
        val out = new java.io.BufferedOutputStream(taskFs.create(tmp, true), 1 << 20)
        var committed = false
        // ONE Deflater per partition, reset() per member, gzip framing
        // written by hand — a GZIPOutputStream per record allocates native
        // zlib state per member (measured as ~all of a 2M-member write)
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        val crc = new java.util.zip.CRC32()
        val buf = new Array[Byte](64 * 1024)
        // header: magic, CM=deflate, FLG=0, MTIME=0, XFL=0, OS=unknown
        val header = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)
        def le32(v: Long): Array[Byte] = Array[Byte](
          (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
        try {
          it.foreach { rec =>
            val bytes = rec.getBytes(Utf8)
            out.write(header)
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            while (!deflater.finished()) {
              val n = deflater.deflate(buf)
              if (n > 0) out.write(buf, 0, n)
            }
            crc.reset()
            crc.update(bytes)
            out.write(le32(crc.getValue))
            out.write(le32(bytes.length & 0xffffffffL))
          }
          out.close()
          // commit: rename into place. A false return means another
          // attempt already committed the partition — identical bytes,
          // drop ours.
          committed = taskFs.rename(tmp, dest) || taskFs.exists(dest)
          if (!committed)
            throw new java.io.IOException(s"rename $tmp -> $dest failed")
        } finally {
          deflater.end()
          try out.close() catch { case _: Throwable => () }
          if (!committed) {
            try taskFs.delete(tmp, false) catch { case _: Throwable => () }
          } else if (taskFs.exists(tmp)) {
            // the rename raced: dest existed, our temp remains — clean it
            try taskFs.delete(tmp, false) catch { case _: Throwable => () }
          }
        }
      }
    }
  }
}
