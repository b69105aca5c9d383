package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of [[WarcGzip]] — the member-gzip WARC reader as a
  * first-class Spark source:
  *
  * {{{ spark.read.format(classOf[WarcGzTableProvider].getName)
  *       .option("splitBytes", "134217728").load(crawlGlob) }}}
  *
  * Why DSv2 and not the RDD wrapper it replaced: REQUIRED-COLUMN PRUNING
  * reaches the parser. Catalyst hands the scan its pruned schema, and the
  * reader skips constructing what the query never reads — `count(*)` over
  * a 100 TB crawl decodes no payload bytes at all, a `body`-only
  * projection never builds full record strings, and only the projected
  * fields are converted to row storage. Split planning is the same
  * validated-member-scan contract as [[WarcGzip.planSplits]]: one input
  * partition per (file, start, end) range; a member STARTING inside a
  * range belongs to it.
  *
  * Options: `splitBytes` (default 128 MiB, ≤ 1 GiB — the range buffer is
  * a JVM array).
  */
class WarcGzTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcGzTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcGzTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] object WarcGzTable {
  val Schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("record_id", StringType),
    StructField("warc_version", StringType),
    StructField("warc_truncated", StringType),
    StructField("refers_to", StringType),
    StructField("payload_digest", StringType),
    StructField("http_status", IntegerType),
    StructField("content_type", StringType),
    StructField("content_encoding", StringType),
    StructField("body", StringType),
    StructField("body_bytes", BinaryType),
    StructField("body_decoded", BooleanType),
    StructField("record", StringType),
    StructField("file", StringType),
    StructField("offset", LongType),
    StructField("length", LongType)))
}

private[sources] class WarcGzTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "warcgz source requires a path")
    p
  }
  private val splitBytes = {
    val sb = Option(options.get("splitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    require(sb > 0 && sb <= (1L << 30), "splitBytes must be in (0, 1 GiB]")
    sb
  }
  private val decodeBody =
    Option(options.get("decodeBody")).forall(_.toBoolean)
  private val maxFileAgeMs = {
    val a = Option(options.get("maxFileAgeMs")).map(_.toLong)
    require(a.forall(_ > 0), "maxFileAgeMs must be > 0")
    a
  }

  override def name(): String = s"warcgz:$path"
  override def schema(): StructType = WarcGzTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new WarcGzScanBuilder(path, splitBytes, decodeBody, maxFileAgeMs)
}

private[sources] class WarcGzScanBuilder(path: String, splitBytes: Long,
                                         decodeBody: Boolean,
                                         maxFileAgeMs: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}

  private var required: StructType = WarcGzTable.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** WARC-Type and http_status filters push INTO the record walk: a
    * `warc_type = 'response'` read skips request/metadata records before
    * any slice/decode/body work — on a real mixed archive that is most
    * of the records — and an `http_status IN (200)` read (curateCrawl's
    * second gate) skips non-matching captures' body decode. EVERY filter
    * is also returned as a post-scan filter (Spark re-applies it), so
    * the pushdown can only skip work, never change results — the
    * conservative DSv2 contract.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("warc_type", v: String) => v != null
      case In("warc_type", vs) => vs.nonEmpty && vs.forall(_.isInstanceOf[String])
      case EqualTo("http_status", _: Integer) => true
      case In("http_status", vs) => vs.nonEmpty && vs.forall(_.isInstanceOf[Integer])
      // the read-one-domain pattern: a target_uri prefix skips every
      // other capture's body work
      case StringStartsWith("target_uri", p) => p != null && p.nonEmpty
      case _ => false
    }
    filters // all re-applied post-scan: the gate only SKIPS, never decides
  }

  override def pushedFilters(): Array[Filter] = pushed

  // several conjunctive filters on one column intersect
  // (WHERE t = 'a' AND t IN (...))
  private def gateSets[T](column: String, of: Any => Option[T]): Option[Set[T]] = {
    val sets = pushed.toSeq.collect {
      case EqualTo(`column`, v) => of(v).toSet
      case In(`column`, vs) => vs.iterator.flatMap(of(_)).toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  private def keepTypes: Option[Set[String]] =
    gateSets[String]("warc_type", { case s: String => Some(s); case _ => None })

  private def keepStatuses: Option[Set[Int]] =
    gateSets[Int]("http_status", { case i: Integer => Some(i.intValue); case _ => None })

  // conjunctive prefixes all apply (a record must satisfy every one)
  private def uriPrefixes: Seq[String] =
    pushed.toSeq.collect { case StringStartsWith(_, p) => p }

  override def build(): Scan =
    new WarcGzScan(path, splitBytes, decodeBody, required, maxFileAgeMs,
      keepTypes, keepStatuses, uriPrefixes)
}

private[sources] class WarcGzScan(path: String, splitBytes: Long,
                                  decodeBody: Boolean,
                                  required: StructType,
                                  maxFileAgeMs: Option[Long] = None,
                                  keepTypes: Option[Set[String]] = None,
                                  keepStatuses: Option[Set[Int]] = None,
                                  uriPrefixes: Seq[String] = Nil)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warcgz $path (splitBytes=$splitBytes, columns=${required.fieldNames.mkString(",")}" +
      keepTypes.map(t => s", keepTypes=${t.toSeq.sorted.mkString("|")}").getOrElse("") +
      keepStatuses.map(t => s", keepStatuses=${t.toSeq.sorted.mkString("|")}").getOrElse("") +
      (if (uriPrefixes.isEmpty) "" else s", uriPrefixes=${uriPrefixes.sorted.mkString("|")}") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    WarcGzip.planSplits(hconf, path, splitBytes)
      .map { case (f, s, e) => WarcGzInputPartition(f, s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confThunk = Bridge.serializableConf(
      SparkSession.active.sessionState.newHadoopConf())
    WarcGzReaderFactory(confThunk, required.fieldNames, decodeBody,
      keepTypes, keepStatuses, uriPrefixes)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcGzMicroBatchStream(path, splitBytes, decodeBody, required,
      maxFileAgeMs, keepTypes, keepStatuses, uriPrefixes)
}

/** X140: streaming `.warc.gz` ingest — the DROP-DIRECTORY micro-batch
  * source over the member scanner: each trigger lists the path (file,
  * dir, or glob), an offset is the set of (file, length, mtime) triples
  * seen so far, and a batch reads exactly the NEW files (planned into the
  * same validated-member-scan ranges as the batch reader — splittable
  * inside one trigger). Files are the archival drop convention: IMMUTABLE
  * once present (a file is read at the length first observed; later
  * growth is ignored) — the same contract as Spark's file stream source,
  * which this mirrors for a format the text/binary sources cannot split.
  * Offsets serialize as a JSON array of `"<length>:<mtime>:<path>"`
  * strings (plus a `"w:<watermark>"` head when compaction is on), so a
  * restarted query resumes from its checkpoint without re-reading.
  *
  * X145: `maxFileAgeMs` bounds offset growth — without it, a real
  * crawl's millions of drop files would serialize into EVERY checkpoint
  * offset forever. With it, files older than (newest listed mtime −
  * maxFileAgeMs) roll out of the explicit list into the offset's
  * WATERMARK: a listed file absent from the start offset is read only
  * when its mtime is at or past the start watermark; older files are
  * assumed already ingested (Spark file-source `maxFileAge` semantics —
  * with its documented caveat that files already older than the horizon
  * at first listing are never read). Under the drop convention (mtime =
  * arrival time) this keeps exactly-once for the active window while the
  * offset stays O(files-per-window).
  */
private[sources] class WarcGzMicroBatchStream(
    path: String, splitBytes: Long, decodeBody: Boolean,
    required: StructType, maxFileAgeMs: Option[Long] = None,
    keepTypes: Option[Set[String]] = None,
    keepStatuses: Option[Set[Int]] = None,
    uriPrefixes: Seq[String] = Nil)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val hconf = SparkSession.active.sessionState.newHadoopConf()
  private val confThunk = Bridge.serializableConf(hconf)

  override def initialOffset(): Offset = WarcGzOffset(Map.empty)

  override def latestOffset(): Offset = {
    val all = WarcGzip.matchedFiles(hconf, path, allowMissing = true)
    maxFileAgeMs match {
      case Some(age) if all.nonEmpty =>
        val wm = all.map(_._3).max - age
        WarcGzOffset(
          all.collect { case (f, l, m) if m >= wm => f -> ((l, m)) }.toMap, wm)
      case _ =>
        WarcGzOffset(all.map { case (f, l, m) => f -> ((l, m)) }.toMap)
    }
  }

  override def deserializeOffset(json: String): Offset = WarcGzOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startOff = start.asInstanceOf[WarcGzOffset]
    val seen = startOff.files.keySet
    val now = end.asInstanceOf[WarcGzOffset].files
    // fresh = listed, not explicitly seen, and not past the start
    // offset's compaction horizon (older mtime => assumed already
    // ingested before its entry was rolled into the watermark)
    val fresh = now.toSeq
      .filterNot { case (f, (_, m)) => seen.contains(f) || m < startOff.watermark }
      .sortBy(_._1).map { case (f, (l, _)) => f -> l }
    WarcGzip.splitRanges(fresh, splitBytes)
      .map { case (f, s, e) => WarcGzInputPartition(f, s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WarcGzReaderFactory(confThunk, required.fieldNames, decodeBody,
      keepTypes, keepStatuses, uriPrefixes)
}

/** The stream's position: every (file, (length, mtime)) not yet rolled
  * into the compaction `watermark`; `Long.MinValue` = no compaction.
  */
private[graft] case class WarcGzOffset(files: Map[String, (Long, Long)],
                                       watermark: Long = Long.MinValue)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val head =
      if (watermark == Long.MinValue) Nil else Seq("\"w:" + watermark + "\"")
    (head ++ files.toSeq.sortBy(_._1).map { case (p, (l, m)) =>
      "\"" + WarcGzOffset.esc(s"$l:$m:$p") + "\""
    }).mkString("[", ",", "]")
  }
}

private[graft] object WarcGzOffset {
  private[graft] def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Parse [[WarcGzOffset.json]] output (a flat JSON string array).
    * Accepts the pre-compaction 2-field `"<length>:<path>"` entries too
    * (mtime 0, no watermark) — an old checkpoint resumes cleanly: with
    * watermark MinValue no mtime comparison can ever skip a file.
    */
  private[graft] def parse(json: String): WarcGzOffset = {
    val out = Map.newBuilder[String, (Long, Long)]
    var wm = Long.MinValue
    var i = 0
    val n = json.length
    while (i < n) {
      if (json.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        while (json.charAt(i) != '"') {
          if (json.charAt(i) == '\\') {
            json.charAt(i + 1) match {
              case 'u' =>
                sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c => sb.append(c); i += 2
            }
          } else { sb.append(json.charAt(i)); i += 1 }
        }
        i += 1
        val s = sb.toString
        if (s.startsWith("w:")) wm = s.substring(2).toLong
        else {
          val c1 = s.indexOf(':')
          val c2 = s.indexOf(':', c1 + 1)
          val mid = if (c2 > c1) s.substring(c1 + 1, c2) else ""
          if (mid.nonEmpty && mid.forall(_.isDigit))
            out += s.substring(c2 + 1) -> ((s.substring(0, c1).toLong, mid.toLong))
          else // legacy "<length>:<path>" entry (paths are URIs — their
               // scheme segment is never all-digits, so this is unambiguous)
            out += s.substring(c1 + 1) -> ((s.substring(0, c1).toLong, 0L))
        }
      } else i += 1
    }
    WarcGzOffset(out.result(), wm)
  }
}

private[sources] case class WarcGzInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

private[sources] case class WarcGzReaderFactory(
    confThunk: () => org.apache.hadoop.conf.Configuration,
    columns: Array[String],
    decodeBody: Boolean,
    keepTypes: Option[Set[String]] = None,
    keepStatuses: Option[Set[Int]] = None,
    uriPrefixes: Seq[String] = Nil) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcGzInputPartition]
    val cols = columns
    val it = WarcGzip.scanRange(confThunk(), p.file, p.start, p.end,
      needRecord = cols.contains("record"),
      needBody = cols.contains("body"),
      // body_decoded is only knowable by decoding — projecting it forces
      // the byte path even when body/body_bytes are pruned away
      needBodyBytes = cols.contains("body_bytes") || cols.contains("body_decoded"),
      decodeBody = decodeBody,
      keepTypes = keepTypes.orNull,
      keepStatuses = keepStatuses.orNull,
      uriPrefixes = if (uriPrefixes.isEmpty) null else uriPrefixes)
    new PartitionReader[InternalRow] {
      private var current: WarcGzip.GzRecord = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = {
        val values = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) {
          values(i) = cols(i) match {
            case "warc_type" => utf8(current.warc_type)
            case "target_uri" => utf8(current.target_uri)
            case "warc_date" => utf8(current.warc_date)
            case "record_id" => utf8(current.record_id)
            case "warc_version" => utf8(current.warc_version)
            case "warc_truncated" => utf8(current.warc_truncated)
            case "refers_to" => utf8(current.refers_to)
            case "payload_digest" => utf8(current.payload_digest)
            case "http_status" => current.http_status.map(Int.box).orNull
            case "content_type" => utf8(current.content_type)
            case "content_encoding" => utf8(current.content_encoding)
            case "body" => utf8(current.body)
            case "body_bytes" => current.body_bytes.orNull
            case "body_decoded" => current.body_decoded.map(Boolean.box).orNull
            case "record" =>
              if (current.record == null) null else UTF8String.fromString(current.record)
            case "file" => UTF8String.fromString(current.file)
            case "offset" => Long.box(current.offset)
            case "length" => Long.box(current.length)
            case other => throw new IllegalArgumentException(s"unknown column: $other")
          }
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = () // the scan iterator closes at EOF /
      // via its task-completion listener on abandonment
      private def utf8(o: Option[String]): UTF8String =
        o.map(UTF8String.fromString).orNull
    }
  }
}
