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
  * with `WARC/1.0\r\n`. A false-positive magic inside compressed data
  * fails one of the three checks and the scan moves on one byte. So a
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
    * exact payload octet slice (after HTTP headers when present);
    * `body`/`record` are UTF-8 decodes (replacement on invalid sequences)
    * for the text-pipeline path.
    */
  final case class GzRecord(
      warc_type: Option[String],
      target_uri: Option[String],
      warc_date: Option[String],
      record_id: Option[String],
      http_status: Option[Int],
      content_type: Option[String],
      body: Option[String],
      body_bytes: Option[Array[Byte]],
      record: String)

  /** Read `.warc.gz` files (a file, directory, or glob) into parsed
    * records. `splitBytes` bounds the per-task scan range — members
    * STARTING inside a range belong to it.
    */
  def read(spark: SparkSession, path: String,
           splitBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(splitBytes > 0, "splitBytes > 0")
    // the range buffer is a JVM array: one split (plus one member overrun)
    // must stay addressable — and well under it for sane task memory
    require(splitBytes <= (1L << 30), "splitBytes must be <= 1 GiB")
    // the DSv2 source (so Catalyst prunes columns INTO the parse: a
    // count(*) never decodes payloads, a body-only projection never builds
    // record strings)
    spark.read.format(classOf[WarcGzTableProvider].getName)
      .option("splitBytes", splitBytes.toString)
      .load(path)
  }

  /** Driver-side split planning: (file, start, end) ranges over every
    * matched file — a file, directory, or glob; hidden/_ files skipped.
    */
  private[sources] def planSplits(hconf: org.apache.hadoop.conf.Configuration,
                                  path: String,
                                  splitBytes: Long): Seq[(String, Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val matched: Seq[FileStatus] = Option(fs.globStatus(p)) match {
      case Some(g) if g.nonEmpty => g.toSeq
      case _ => Seq(fs.getFileStatus(p))
    }
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(f =>
          f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
      else Seq(st)
    }
    files.flatMap { st =>
      val len = st.getLen
      val uri = st.getPath.toUri.toString
      (0L until math.max(len, 1L) by splitBytes)
        .map(s => (uri, s, math.min(s + splitBytes, len)))
    }
  }

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
    */
  private[sources] def scanRange(conf: org.apache.hadoop.conf.Configuration,
                                 file: String, start: Long, end: Long,
                                 needRecord: Boolean = true,
                                 needBody: Boolean = true,
                                 needBodyBytes: Boolean = true): Iterator[GzRecord] = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val fileLen = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    in.seek(start)
    val win = new ByteWindow(in, start, fileLen)
    // ONE Inflater per range, reset() per member: Inflater holds native
    // zlib state — per-member construction was the dominant cost of a
    // 2M-member read
    val inflater = new java.util.zip.Inflater(true)
    // a task abandoned mid-iteration (limit, failure) must still release
    // the stream and the native zlib state
    Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
      new org.apache.spark.util.TaskCompletionListener {
        override def onTaskCompletion(ctx: org.apache.spark.TaskContext): Unit = {
          try inflater.end() catch { case _: Throwable => () }
          try in.close() catch { case _: Throwable => () }
        }
      }))
    // LAZY iterator — records parse as the consumer pulls, so a task never
    // buffers its whole range's records and downstream work pipelines with
    // the scan (the window still holds the range bytes; that is the task's
    // documented memory bound)
    new Iterator[GzRecord] {
      private var pos = start
      private var nextRec: GzRecord = _
      private var closed = false
      private def close(): Unit = if (!closed) {
        closed = true
        inflater.end()
        in.close()
      }
      private def advance(): Unit = {
        while (nextRec == null && pos < end && pos < fileLen) {
          if (win.byteAt(pos) == 0x1f && win.byteAt(pos + 1) == 0x8b &&
              win.byteAt(pos + 2) == 0x08) {
            inflateMember(win, pos, inflater) match {
              case Some((rec, memberLen)) =>
                nextRec = parseMemberRecord(rec, needRecord, needBody, needBodyBytes)
                pos += memberLen
              case None =>
                pos += 1
            }
          } else pos += 1
        }
        if (nextRec == null) close()
      }
      override def hasNext: Boolean = {
        if (nextRec == null && !closed) advance()
        nextRec != null
      }
      override def next(): GzRecord = {
        if (!hasNext) throw new NoSuchElementException("scanRange")
        val r = nextRec
        nextRec = null
        r
      }
    }
  }

  /** Try to inflate one gzip member at absolute `off` (magic already
    * matched). Returns (decompressed record bytes, total member length) or
    * None when the candidate is not a WARC-record member: malformed
    * header, inflate error, CRC32/ISIZE trailer mismatch, or a payload not
    * starting with `WARC/1.0\r\n` — the three-way validation that makes
    * magic-scanning safe against false positives in compressed data.
    */
  private def inflateMember(win: ByteWindow, off: Long,
                            inflater0: java.util.zip.Inflater): Option[(Array[Byte], Long)] = {
    // gzip header: magic(2) cm(1) flg(1) mtime(4) xfl(1) os(1) [+optionals]
    val flg = win.byteAt(off + 3)
    if (flg < 0) return None
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      val lo = win.byteAt(p); val hi = win.byteAt(p + 1)
      if (lo < 0 || hi < 0) return None
      p += 2 + (lo | (hi << 8))
    }
    if ((flg & 8) != 0) { // FNAME: NUL-terminated
      var b = win.byteAt(p)
      while (b > 0) { p += 1; b = win.byteAt(p) }
      if (b < 0) return None
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
      var b = win.byteAt(p)
      while (b > 0) { p += 1; b = win.byteAt(p) }
      if (b < 0) return None
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
          if (availEnd <= inPos) return None // truncated member
          inflater.setInput(win.slice(inPos, availEnd))
          inPos = availEnd
          chunkIn = 256 * 1024
        }
        val n = inflater.inflate(chunkOut)
        if (n > 0) outBuf.write(chunkOut, 0, n)
        else if (inflater.finished()) done = true
        else if (inflater.needsDictionary()) return None
        else if (!inflater.needsInput()) return None // no progress
      }
      val data = outBuf.toByteArray
      // fast reject before the trailer math: must be a WARC record
      if (!startsWithMarker(data)) return None
      val compLen = inflater.getBytesRead
      val trailerOff = p + compLen
      if (win.ensure(trailerOff + 8) < trailerOff + 8) return None
      val t = win.slice(trailerOff, trailerOff + 8)
      def le32(b: Array[Byte], i: Int): Long =
        (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      if (le32(t, 0) != crc.getValue) return None
      if (le32(t, 4) != (data.length & 0xffffffffL)) return None
      Some((data, trailerOff + 8 - off))
    } catch {
      case _: java.util.zip.DataFormatException => None
    }
  }

  private val Marker = "WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def startsWithMarker(data: Array[Byte]): Boolean = {
    if (data.length < Marker.length) return false
    var i = 0
    while (i < Marker.length) {
      if (data(i) != Marker(i)) return false
      i += 1
    }
    true
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
      "Content-Length", "Content-Type").map { name =>
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
    */
  private[sources] def parseMemberRecord(rec: Array[Byte],
                                         needRecord: Boolean = true,
                                         needBody: Boolean = true,
                                         needBodyBytes: Boolean = true): GzRecord = {
    val recStr = if (needRecord) new String(rec, Utf8) else null
    val hdrEnd = indexOfCrlfCrlf(rec, 0, rec.length)
    if (hdrEnd < 0) { // truncated: all headers, no payload
      val hdrs = unfold(if (recStr != null) recStr else new String(rec, Utf8))
      return GzRecord(
        header(hdrs, "WARC-Type"),
        header(hdrs, "WARC-Target-URI"),
        header(hdrs, "WARC-Date"),
        header(hdrs, "WARC-Record-ID"),
        None, None, None, None, recStr)
    }
    // ISO 28500 LWS unfolding: a continuation line (CRLF + SP/HT) is part
    // of the previous header's value. When the full record string exists
    // it is re-sliced (same logical boundary as the byte-level hdrEnd — a
    // second byte decode of every record measured as real cost at 2M
    // members); under pruning only the header bytes decode.
    val warcHeaders = unfold(
      if (recStr != null)
        recStr.substring(0, recStr.indexOf("\r\n\r\n") match {
          case -1 => recStr.length; case i => i
        })
      else new String(rec, 0, hdrEnd, Utf8))
    val payloadStart = hdrEnd + 4
    val contentLength = header(warcHeaders, "Content-Length")
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
    val (status, ctype, bodyStart) =
      if (httpEnd >= 0) {
        val httpHeaders = unfold(new String(rec, payloadStart, httpEnd - payloadStart, Utf8))
        val st = statusPattern.matcher(httpHeaders)
        (if (st.find()) Some(st.group(1).toInt) else None,
          header(httpHeaders, "Content-Type"),
          httpEnd + 4)
      } else (None, None, payloadStart)
    val bodyBytes =
      if (needBody || needBodyBytes)
        java.util.Arrays.copyOfRange(rec, bodyStart, math.max(bodyStart, payloadEnd))
      else null
    GzRecord(
      header(warcHeaders, "WARC-Type"),
      header(warcHeaders, "WARC-Target-URI"),
      header(warcHeaders, "WARC-Date"),
      header(warcHeaders, "WARC-Record-ID"),
      status,
      // HTTP-block Content-Type when present, else the WARC-level header
      // (conversion/WET records describe their payload there)
      ctype.orElse(header(warcHeaders, "Content-Type")),
      if (needBody) Some(new String(bodyBytes, Utf8)) else None,
      if (needBodyBytes) Some(bodyBytes) else None,
      recStr)
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
        val pid = org.apache.spark.TaskContext.get().partitionId()
        val p = new Path(f"$path/part-$pid%05d.warc.gz")
        val out = new java.io.BufferedOutputStream(
          p.getFileSystem(confThunk()).create(p, true), 1 << 20)
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
        } finally {
          deflater.end()
          out.close()
        }
      }
    }
  }
}
