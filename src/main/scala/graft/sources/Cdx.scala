package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** X142: CDX-J index sidecars — the pointer format Common Crawl actually
  * publishes next to its archives (`cc-index`, one line per capture:
  * `<urlkey SURT> <timestamp> <json>` where the JSON carries `url`,
  * `filename`, `offset`, `length`, `status`, `mime`, `digest`). Real
  * users do not need to [[WarcGzip.index]] a crawl they already have an
  * index for: [[Cdx.read]] parses the sidecar straight into the pointer
  * frame [[WarcGzip.fetch]] accepts, and [[Cdx.format]] writes one for
  * archives this library produces — index once, publish, fetch
  * selectively forever.
  *
  * Everything is builtin-function composition (regexp split + from_json
  * + casts) — codegen'd, zero UDFs, and a 300-file index reads as an
  * ordinary partitioned text scan (gzipped CDX files read through the
  * Hadoop codec; non-splittable per file, parallel across files — the
  * layout CC ships).
  *
  * Reference provenance: the reference has no sources (core.py reads
  * only its own tables); CDX is new-scope for the crawl story.
  */
object Cdx {

  /** The JSON block's fields (CC's cdx-j dialect; numbers arrive as JSON
    * strings there, so everything parses as string then casts). */
  private val JsonSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("filename", StringType),
    StructField("offset", StringType),
    StructField("length", StringType),
    StructField("status", StringType),
    StructField("mime", StringType),
    StructField("digest", StringType)))

  /** Parse CDX-J lines into (urlkey, timestamp, url, status, mime,
    * digest, file, offset, length). `warcRoot` resolves the JSON's
    * relative `filename` against the archive root (CC filenames are
    * paths relative to the crawl bucket); absent, `file` is the filename
    * verbatim. Malformed lines yield NULL fields, never an error (an
    * index row with a NULL offset cannot fetch — filter on
    * `offset IS NOT NULL` to gate). Feed the result (or any filtered
    * subset) to [[WarcGzip.fetch]].
    */
  def read(spark: SparkSession, path: String,
           warcRoot: Option[String] = None): DataFrame =
    parseLines(spark.read.text(path), warcRoot)

  /** The CDX-J line parse behind [[read]] and [[lookup]]: a one-STRING-
    * column frame (`value`) of raw lines → the pointer schema. */
  private def parseLines(lines: DataFrame,
                         warcRoot: Option[String]): DataFrame = {
    val line = col("value")
    val urlkey = regexp_extract(line, "^(\\S+) ", 1)
    val ts = regexp_extract(line, "^\\S+ (\\S+) ", 1)
    val jsonStr = regexp_extract(line, "^\\S+ \\S+ (.*)$", 1)
    val j = from_json(jsonStr, JsonSchema)
    val file = warcRoot match {
      case Some(root) => concat(lit(root.stripSuffix("/") + "/"),
        j.getField("filename"))
      case None => j.getField("filename")
    }
    def nn(c: Column): Column = when(c === "", lit(null)).otherwise(c)
    lines
      .filter(length(line) > 0)
      .select(
        nn(urlkey).as("urlkey"),
        nn(ts).as("timestamp"),
        j.getField("url").as("url"),
        j.getField("status").cast("int").as("status"),
        j.getField("mime").as("mime"),
        j.getField("digest").as("digest"),
        file.as("file"),
        j.getField("offset").cast("long").as("offset"),
        j.getField("length").cast("long").as("length"))
  }

  /** SURT-lite urlkey — the sort key CDX indexes order by (host labels
    * reversed and comma-joined, NON-DEFAULT port kept, `)/` separator,
    * path + query lowercased): `https://www.Example.com/A/b?x=1` →
    * `com,example)/a/b?x=1`, `https://h.org:8080/x` → `org,h:8080)/x`.
    * The host:port extraction is deliberately NOT [[graft.ext.Web.hostOf]]
    * (which strips the port — captures on different ports of one host
    * must NOT collide under one key, real SURT keeps them apart). Scope
    * cuts, documented: the leading `www.` strips (the pywb canonical
    * form), but session-param stripping and full SURT percent-decoding
    * are out of contract — this key collates same-host entries together,
    * which is what CDX range lookups need. NULL/unparseable urls yield
    * NULL. Pure builtin composition (codegen'd).
    */
  def surtKey(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // authority minus userinfo, lowercased; port kept
    val hostport = regexp_replace(lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)", 1)), "^www\\.", "")
    val port = regexp_extract(hostport, ":(\\d+)$", 1)
    val host = regexp_replace(hostport, ":\\d+$", "")
    // a non-default port stays in the key (real-SURT semantics)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rev = concat(
      concat_ws(",", reverse(split(host, "\\."))),
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")))
    // path + query, lowercased; absent path → "/"
    val tail0 = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1))
    val tail = when(tail0 === "", lit("/")).otherwise(tail0)
    when(hostport.isNull || hostport === "", lit(null).cast("string"))
      // the key must stay ONE whitespace-free token (CDX lines are
      // space-delimited): a sloppy URI with a raw space would otherwise
      // shift the line's fields and make the entry silently unfetchable
      // on Cdx.read — percent-encode any whitespace (%20, the collation-
      // key convention; the JSON block keeps the original url verbatim)
      .otherwise(regexp_replace(concat(rev, lit(")"), tail), "\\s", "%20"))
  }

  /** Format an index frame ([[WarcGzip.index]] output shape + optional
    * status/mime/digest columns) as CDX-J lines, one string column —
    * write through `df.write.text` (or gzip per CC's layout). `filename`
    * is the `file` column's basename (CDX carries archive-relative
    * names); the urlkey is [[surtKey]] — falling back to the lowercased
    * raw url when the SURT parse fails (the pywb convention), so a weird
    * URI still gets a fetchable line rather than silently vanishing from
    * the index — and the timestamp is the 14-digit `WARC-Date`
    * compaction (`0`-padded when absent). Records with NO target URI at
    * all (warcinfo) are excluded BY CONTRACT: CDX indexes captures, and
    * CC's own index carries no warcinfo entries. Lines sort by (urlkey,
    * timestamp) when written sorted — the caller controls ordering (CC
    * shards + sorts; `sortWithinPartitions("urlkey")` before the write
    * reproduces it).
    */
  def format(index: DataFrame): DataFrame = {
    val cols = index.columns.toSet
    def opt(name: String): Column =
      if (cols.contains(name)) col(name).cast("string") else lit(null).cast("string")
    val ts0 = regexp_replace(col("warc_date"), "[^0-9]", "").substr(1, 14)
    val ts = when(ts0.isNull || ts0 === "", lit("00000000000000")).otherwise(ts0)
    // JSON string escaping for every field that can carry crawl junk
    // (backslash first, then quote — order matters; real Content-Type
    // headers contain quoted charset parameters)
    def esc(c: Column): Column = regexp_replace(
      regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    def jfield(k: String, v: Column): Column =
      when(v.isNull, lit("")).otherwise(
        concat(lit(", \"" + k + "\": \""), esc(v), lit("\"")))
    val json = concat(
      lit("{\"url\": \""), esc(col("target_uri")),
      lit("\", \"filename\": \""),
      regexp_extract(col("file"), "([^/]+)$", 1),
      lit("\", \"offset\": \""), col("offset").cast("string"),
      lit("\", \"length\": \""), col("length").cast("string"), lit("\""),
      jfield("status", opt("status")),
      jfield("mime", opt("mime")),
      jfield("digest", opt("digest")),
      lit("}"))
    index
      .filter(col("target_uri").isNotNull)
      .select(concat(
        // the fallback key must stay one whitespace-free token (the line
        // format is space-delimited) — percent-encode interior whitespace
        coalesce(surtKey(col("target_uri")),
          regexp_replace(lower(col("target_uri")), "\\s", "%20")),
        lit(" "), ts, lit(" "), json).as("value"))
  }

  // --- X143: zipnum sharding + block-pruned lookup -------------------------

  /** X143: write a CDX index in the ZIPNUM layout Common Crawl publishes —
    * the whole point of a published index is that a key lookup reads a few
    * KILOBYTES, not the index: lines globally sorted by key, packed into
    * gzip members ("blocks") of `blockLines` lines each, members
    * concatenated into one `cdx-NNNNN.gz` part per partition, plus ONE
    * tiny `cluster.idx` secondary (`<first key>\t<part>\t<offset>\t
    * <length>\t<seq>` per block, sorted) that [[lookup]] prunes blocks
    * with. The global sort is a real shuffle — the one the format exists
    * to pay ONCE at publish time (CC sorts its index the same way); after
    * it, range partitioning makes partition p's keys precede p+1's, so
    * per-partition block runs concatenate into one sorted index.
    *
    * Commit protocol: [[WarcGzip.writeGzip]]'s — attempt-scoped hidden
    * temps renamed into place, first rename wins (identical bytes either
    * way). `cluster.idx` is written LAST, by the driver, from the block
    * coordinates the tasks report — it is nLines/blockLines entries, tiny
    * by construction (CC's own cluster.idx is one driver-sized file for a
    * 300 GB index).
    */
  def writeZipnum(lines: DataFrame, path: String, blockLines: Int = 3000): Unit = {
    require(lines.schema.fields.length == 1 &&
      lines.schema.fields(0).dataType == StringType,
      "writeZipnum expects exactly one STRING column of CDX lines")
    require(blockLines > 0, "blockLines > 0")
    val spark = lines.sparkSession
    val confThunk = Bridge.serializableConf(spark.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    import spark.implicits._
    val sorted = lines.toDF("value").sort(col("value")).as[String]
    val blockRows: Array[(String, String, Long, Long)] =
      sorted.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val ctx = org.apache.spark.TaskContext.get()
          val pid = ctx.partitionId()
          val name = f"cdx-$pid%05d.gz"
          val taskFs = new Path(path).getFileSystem(confThunk())
          val tmp = new Path(f"$path/.cdx-$pid%05d-attempt-${ctx.taskAttemptId()}.tmp")
          val dest = new Path(s"$path/$name")
          val out = new java.io.BufferedOutputStream(taskFs.create(tmp, true), 1 << 20)
          // ONE Deflater per partition, reset() per block (the writeGzip
          // lesson: native zlib state per member dominates otherwise)
          val deflater = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          val crc = new java.util.zip.CRC32()
          val gzHeader = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)
          def le32(v: Long): Array[Byte] = Array[Byte](
            (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
          val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
          val block = new scala.collection.mutable.ArrayBuffer[String](blockLines)
          var offset = 0L
          var committed = false
          def flush(): Unit = if (block.nonEmpty) {
            val bytes = (block.mkString("\n") + "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val member = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
            member.write(gzHeader)
            deflater.reset(); deflater.setInput(bytes); deflater.finish()
            val buf = new Array[Byte](64 * 1024)
            while (!deflater.finished()) {
              val n = deflater.deflate(buf)
              if (n > 0) member.write(buf, 0, n)
            }
            crc.reset(); crc.update(bytes)
            member.write(le32(crc.getValue))
            member.write(le32(bytes.length & 0xffffffffL))
            val m = member.toByteArray
            out.write(m)
            // the secondary's key is the block's first (urlkey, timestamp)
            // pair — NOT the whole line (the JSON tail is per-entry noise)
            val head = block.head
            val sp2 = head.indexOf(' ', head.indexOf(' ') + 1)
            entries += (((if (sp2 > 0) head.substring(0, sp2) else head),
              name, offset, m.length.toLong))
            offset += m.length
            block.clear()
          }
          try {
            it.foreach { line => block += line; if (block.size >= blockLines) flush() }
            flush()
            out.close()
            committed = taskFs.rename(tmp, dest) || taskFs.exists(dest)
            if (!committed)
              throw new java.io.IOException(s"rename $tmp -> $dest failed")
          } finally {
            deflater.end()
            try out.close() catch { case _: Throwable => () }
            if (!committed || taskFs.exists(tmp)) {
              try taskFs.delete(tmp, false) catch { case _: Throwable => () }
            }
          }
          entries.iterator
        }
      }.collect()
    val idxOut = fs.create(new Path(path.stripSuffix("/") + "/cluster.idx"), true)
    try {
      val w = new java.io.BufferedOutputStream(idxOut, 1 << 20)
      blockRows.sortBy(r => (r._1, r._2, r._3)).zipWithIndex.foreach {
        case ((k, f, o, l), i) =>
          w.write(s"$k\t$f\t$o\t$l\t${i + 1}\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      w.flush()
    } finally idxOut.close()
  }

  /** X143: block-pruned key lookup over a [[writeZipnum]] index — the
    * access pattern the layout exists for: entries whose `urlkey` starts
    * with `surtPrefix` (build one with [[surtKey]] semantics, e.g.
    * `com,example)/docs/`), in [[read]]'s pointer schema, reading ONLY
    * the gzip blocks whose key span can intersect the prefix range.
    *
    * Block selection is sorted-order arithmetic on the tiny secondary:
    * block i holds lines in [key_i, key_{i+1}), so the candidates are the
    * blocks from the LAST key <= prefix (its span may straddle the range
    * start) up to key < prefix+U+FFFF — one max() aggregate plus a
    * filter, no window, no driver materialization of the secondary.
    * Candidate blocks then group by part file so each task opens its file
    * once and seeks forward ([[WarcGzip.fetch]]'s pattern); a lookup that
    * matches nothing reads zero blocks.
    */
  def lookup(spark: SparkSession, path: String, surtPrefix: String,
             warcRoot: Option[String] = None): DataFrame = {
    require(surtPrefix.nonEmpty, "surtPrefix must be non-empty")
    blockLines(spark, path, surtPrefix, surtPrefix + "\uffff", warcRoot)
      .filter(col("urlkey").startsWith(surtPrefix))
  }

  /** X143: explicit key-RANGE lookup — entries with `fromKey <= urlkey <
    * untilKey` (the pywb from/to access form; [[lookup]] is the
    * prefix-shaped special case). Same block-pruned read: only gzip
    * blocks whose key span can intersect the range decompress.
    */
  def lookupRange(spark: SparkSession, path: String,
                  fromKey: String, untilKey: String,
                  warcRoot: Option[String] = None): DataFrame = {
    require(fromKey.nonEmpty && fromKey < untilKey,
      "need a non-empty fromKey < untilKey")
    blockLines(spark, path, fromKey, untilKey, warcRoot)
      .filter(col("urlkey") >= fromKey && col("urlkey") < untilKey)
  }

  /** The shared block-pruned read behind [[lookup]]/[[lookupRange]]: the
    * parsed entries of every cluster.idx block whose key span can
    * intersect [loKey, hiKey) — callers re-apply their exact predicate
    * (boundary blocks carry out-of-range neighbors).
    */
  private def blockLines(spark: SparkSession, path: String,
                         loKey: String, hiKey: String,
                         warcRoot: Option[String]): DataFrame = {
    val confThunk = Bridge.serializableConf(spark.sessionState.newHadoopConf())
    import spark.implicits._
    val root = path.stripSuffix("/")
    // the secondary is a CLAIM like fetch pointers: a malformed line
    // raises with its content, not an opaque encoder null-field (or, under
    // ANSI, cast) error — hence the regex gate BEFORE any throwing cast
    val offS = col("f").getItem(2)
    val lenS = col("f").getItem(3)
    val wellFormed = coalesce(
      offS.rlike("^\\d+$") && lenS.rlike("^\\d+$"), lit(false))
    val idx = spark.read.text(root + "/cluster.idx")
      .filter(length(col("value")) > 0)
      .select(col("value"), split(col("value"), "\t").as("f"))
      .select(col("f").getItem(0).as("key"), col("f").getItem(1).as("file"),
        when(!wellFormed,
          raise_error(concat(lit("malformed cluster.idx line: "), col("value"))))
          .otherwise(offS.cast("long")).as("offset"),
        // the length cast hides behind the same gate: projection
        // evaluation order is unspecified, and an ANSI cast failure here
        // would preempt the offset projection's loud raise
        when(!wellFormed,
          raise_error(concat(lit("malformed cluster.idx line: "), col("value"))))
          .otherwise(lenS.cast("long")).as("length"))
    // the range start: the last block key <= loKey (NULL when the range
    // start precedes every block — then the first block is the start).
    // Full-key compare is sound here: the first matching entry's block
    // either IS that max block or starts past loKey entirely.
    val startKey = idx.filter(col("key") <= loKey)
      .agg(max(col("key"))).head().getString(0)
    // the range end compares the key's URLKEY part, not the full
    // "urlkey timestamp" key: hiKey is urlkey-grained, and a block whose
    // first entry is EXACTLY the range's last urlkey has full key
    // "urlkey <ts>" > hiKey — a full-key compare would drop it (caught
    // by the exact-single-key range spec). Urlkeys are whitespace-free
    // by construction, so urlkey order is line order and a block with
    // first urlkey >= hiKey cannot contain a match.
    val cands = idx
      .filter(substring_index(col("key"), " ", 1) < hiKey &&
        (if (startKey == null) lit(true) else col("key") >= startKey))
      .select(col("file"), col("offset"), col("length"))
      .as[(String, Long, Long)]
    val lines = cands
      // explicit partition count: candidate rows are bytes but each one is
      // a seek+read+gunzip of a whole block downstream — AQE's small-
      // shuffle coalescing would collapse a broad (many-block) lookup
      // into one task (the fetch lesson, BENCH_scale_400x_r19hot.json)
      .repartition(spark.sessionState.conf.numShufflePartitions, col("file"))
      .sortWithinPartitions(col("file"), col("offset"))
      .mapPartitions { it =>
        val conf = confThunk()
        var curFile: String = null
        var in: FSDataInputStream = null
        def closeIn(): Unit = if (in != null) {
          try in.close() catch { case _: Throwable => () }
          in = null
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener(
            new org.apache.spark.util.TaskCompletionListener {
              override def onTaskCompletion(
                  ctx: org.apache.spark.TaskContext): Unit = closeIn()
            }))
        it.flatMap { case (f, off, len) =>
          require(len > 0 && len <= (1L << 30),
            s"cluster.idx block $f:$off has implausible length $len")
          if (f != curFile) {
            closeIn()
            val p = new Path(s"$root/$f")
            in = p.getFileSystem(conf).open(p)
            curFile = f
          }
          in.seek(off)
          val buf = new Array[Byte](len.toInt)
          in.readFully(buf)
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(buf))
          val outB = new java.io.ByteArrayOutputStream(math.max(64, buf.length * 4))
          val tmp = new Array[Byte](64 * 1024)
          var n = gz.read(tmp)
          while (n > 0) { outB.write(tmp, 0, n); n = gz.read(tmp) }
          new String(outB.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").iterator.filter(_.nonEmpty)
        }
      }
    parseLines(lines.toDF("value"), warcRoot)
  }
}
