package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X134: WARC-lite source — the crawl-native input format (Common Crawl
  * WARC/1.0) as a distributed reader, completing the crawl story:
  * Warc.read → [[graft.ext.Html.htmlToText]] / `extractMetadata` →
  * [[graft.ext.Web]] curation.
  *
  * Record splitting is the classic Hadoop-delimiter technique: the text
  * input format's record delimiter is set to the `WARC/1.0\r\n` version
  * marker, so SPLITS are computed by the input format (block-aligned,
  * mid-record splits handled by Hadoop's line-reader semantics) and no
  * driver-side parsing ever happens — a 100 TB crawl reads as ordinary
  * partitioned records. Everything after the split is codegen'd column
  * work: WARC headers, the HTTP status line, HTTP headers, and the body
  * are `regexp_extract` projections over each record string.
  *
  * Documented limits of the lite TEXT reader — each lifted by the
  * member-gzip reader [[WarcGzip]], which is the right tool whenever they
  * matter:
  *   - UNCOMPRESSED WARC only. Common Crawl's `.warc.gz` is per-record
  *     gzip (member-concatenated) — use [[WarcGzip.read]], the splittable
  *     member scanner.
  *   - Marker-based splitting, not Content-Length framing: a BODY that
  *     contains the exact bytes `WARC/1.0\r\n` mis-splits (vanishingly
  *     rare in practice; [[WarcGzip]] honors Content-Length exactly).
  *   - Binary payloads survive only as far as UTF-8 decoding allows
  *     (Hadoop Text replaces invalid sequences) — for text payloads
  *     (text/plain, text/html, the target use) this is lossless;
  *     [[WarcGzip]]'s `body_bytes` is byte-exact.
  *   - Header continuation lines (ISO 28500 LWS folding) are not
  *     unfolded: a folded value truncates at its first line. Folded
  *     headers are rare in crawl output; [[WarcGzip]] unfolds them.
  */
object Warc {

  /** The record marker — also the Hadoop record delimiter. */
  val VersionMarker = "WARC/1.0\r\n"

  /** Read an uncompressed WARC stream into parsed records:
    * (warc_type, target_uri, warc_date, record_id, refers_to,
    * payload_digest, http_status, content_type, body, record) — NULL for
    * fields a record does not carry (a `warcinfo` record has no target
    * URI; a `request` record's payload has no HTTP status line).
    * `refers_to`/`payload_digest` make the frame composable with
    * [[graft.ext.CrawlPipeline.resolveRevisits]], same as the gz
    * reader's. `body` is the payload after the HTTP header block for
    * records that have one (else the raw payload), with exactly one
    * inter-record separator unit stripped.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    // the text DATASOURCE carries the custom delimiter (lineSep accepts a
    // multi-char separator): same Hadoop line-reader split semantics as a
    // hand-rolled newAPIHadoopFile, but with file listing, metrics, and
    // the DataFrame path for free. Records split this way still carry the
    // inter-record separator on their tails — trimSeparator strips it.
    parseRecords(spark.read.option("lineSep", VersionMarker).text(path)
      .withColumnRenamed("value", "record")
      .filter(length(col("record")) > 0), // the piece before the first marker
      trimSeparator = true)

  /** Structured-streaming form of [[read]]: a drop-directory of WARC files
    * as an unbounded record stream (the crawl-native continuous-ingestion
    * source — compose with `Collection.streamIngest` or the
    * [[graft.streaming]] operators). Same split + parse as the batch
    * reader; the text file-stream source tracks arrivals.
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.readStream.option("lineSep", VersionMarker).text(path)
      .withColumnRenamed("value", "record")
      .filter(length(col("record")) > 0),
      trimSeparator = true)

  /** A WARC named header value (case-insensitive, first occurrence),
    * NULL when absent. */
  private def warcHeader(headers: org.apache.spark.sql.Column, name: String) = {
    val v = regexp_extract(headers, s"(?im)^${name}:[ \\t]*(.*?)\\r?$$", 1)
    when(v === "", lit(null).cast("string")).otherwise(v)
  }

  /** Parse a frame of raw record strings (version marker already
    * stripped by the reader). Exposed for tests and for streams that
    * arrive pre-split.
    *
    * `trimSeparator` — set when records were split out of a separator-
    * joined stream (the [[read]] path), where each record's tail still
    * carries exactly one inter-record separator unit to strip. Leave
    * UNSET for pre-split records that never carried a separator: there a
    * payload legitimately ending in a bare `\n` or `\r\n\r\n` owns those
    * bytes and must keep them.
    */
  def parseRecords(raw: DataFrame, trimSeparator: Boolean = false): DataFrame = {
    // WARC header block = up to the first blank line; payload = the rest.
    // A record with NO blank line (truncated) is ALL headers, payload NULL.
    val hdr = regexp_extract(col("record"), "(?s)^(.*?)\\r\\n\\r\\n", 1)
    val warcHeaders = when(hdr === "", col("record")).otherwise(hdr)
    val payload = when(hdr === "", lit(null).cast("string"))
      .otherwise(col("record").substr(
        length(col("__headers")) + lit(5), length(col("record"))))
    // the HTTP block must be BLANK-LINE-TERMINATED to be recognized: a
    // truncated "HTTP/1.1 200 OK\r\nContent-Type: x" tail record parses
    // as status NULL + raw body, never as a status with headers leaking
    // into the body (the consistent-parse contract)
    val httpHeaders = regexp_extract(col("__payload"), "(?s)^(HTTP/.*?)\\r\\n\\r\\n", 1)
    val httpStatus0 = regexp_extract(col("__http_headers"), "^HTTP/[0-9.]+[ \\t]+(\\d{3})", 1)
    // body: payload minus the HTTP header block when one exists, with
    // EXACTLY ONE inter-record separator unit stripped from the tail
    // (\r\n\r\n + the text-writer newline, or either alone) — a payload-
    // owned trailing newline BEFORE the separator survives, so the
    // formatResponse → read roundtrip is lossless for newline-terminated
    // bodies
    val body0 = when(col("__http_headers") === "", col("__payload"))
      .otherwise(col("__payload").substr(
        length(col("__http_headers")) + lit(5), length(col("__payload"))))
    val body =
      if (trimSeparator) regexp_replace(body0, "(\\r\\n\\r\\n\\n?|\\n)$", "")
      else body0
    raw
      .withColumn("__headers", warcHeaders)
      .withColumn("__payload", payload)
      .withColumn("__http_headers", httpHeaders)
      .select(
        warcHeader(col("__headers"), "WARC-Type").as("warc_type"),
        warcHeader(col("__headers"), "WARC-Target-URI").as("target_uri"),
        warcHeader(col("__headers"), "WARC-Date").as("warc_date"),
        warcHeader(col("__headers"), "WARC-Record-ID").as("record_id"),
        warcHeader(col("__headers"), "WARC-Refers-To").as("refers_to"),
        warcHeader(col("__headers"), "WARC-Payload-Digest").as("payload_digest"),
        when(httpStatus0 === "", lit(null).cast("int"))
          .otherwise(httpStatus0.cast("int")).as("http_status"),
        // HTTP-block Content-Type when present, else the WARC-level header
        // (conversion/WET records describe their payload there)
        coalesce(
          warcHeader(col("__http_headers"), "Content-Type"),
          warcHeader(col("__headers"), "Content-Type")).as("content_type"),
        body.as("body"),
        col("record"))
  }

  /** Format (uri, date, contentType, htmlBody) rows as WARC response
    * records — one record string per row, version marker included, ready
    * for `df.write.text` (the writer's `\n` row separator lands after
    * each record's closing CRLFs and is stripped by the reader's body
    * trim). The write side of the lite roundtrip; Content-Length is the
    * HTTP payload's UTF-8 BYTE count (octet_length — the ISO 28500
    * octet semantics), which [[WarcGzip]]'s Content-Length-framing reader
    * honors exactly and external consumers can frame by.
    */
  def formatResponse(uri: org.apache.spark.sql.Column,
                     date: org.apache.spark.sql.Column,
                     contentType: org.apache.spark.sql.Column,
                     body: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val http = concat(lit("HTTP/1.1 200 OK\r\nContent-Type: "), contentType,
      lit("\r\n\r\n"), body)
    concat(
      lit(VersionMarker),
      lit("WARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
  }

  /** Format a WARCINFO record — the self-describing record real archives
    * OPEN with (ISO 28500 §6.2; Common Crawl files carry one per file):
    * no target URI, `application/warc-fields` payload of `name: value`
    * lines (software, robots policy, …). Union ONE ahead of a file's
    * records before [[WarcGzip.writeGzip]] / `write.text` for the
    * standard layout; both readers parse it as an ordinary record
    * (warc_type `warcinfo`, NULL target_uri/status), and the curation
    * pipeline's `warc_type === response` gate passes it over.
    */
  def formatWarcinfo(filename: org.apache.spark.sql.Column,
                     date: org.apache.spark.sql.Column,
                     fields: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit(VersionMarker),
      lit("WARC-Type: warcinfo\r\nWARC-Filename: "), filename,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Type: application/warc-fields\r\nContent-Length: "),
      octet_length(fields).cast("string"),
      lit("\r\n\r\n"), fields, lit("\r\n\r\n"))

  /** Format a METADATA record — the WAT-style sidecar record (ISO 28500
    * §6.6; Common Crawl's WAT files carry one `application/json` metadata
    * record per capture, `WARC-Refers-To` naming the capture it
    * describes). `json` is the payload verbatim (compose with
    * `to_json(struct(...))` — see
    * [[graft.ext.CrawlPipeline.toWat]] for the head-metadata product
    * call); a NULL `refersTo` omits its header. Write through
    * [[WarcGzip.writeGzip]] next to [[formatWarcinfo]]/
    * [[formatConversion]] output for the CC product triple
    * (WARC/WAT/WET).
    */
  def formatMetadata(uri: org.apache.spark.sql.Column,
                     date: org.apache.spark.sql.Column,
                     json: org.apache.spark.sql.Column,
                     refersTo: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit(VersionMarker),
      lit("WARC-Type: metadata\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      when(refersTo.isNull, lit(""))
        .otherwise(concat(lit("\r\nWARC-Refers-To: "), refersTo)),
      lit("\r\nContent-Type: application/json\r\nContent-Length: "),
      octet_length(json).cast("string"),
      lit("\r\n\r\n"), json, lit("\r\n\r\n"))

  /** Format a REVISIT record — the archival URL-dedup convention (ISO
    * 28500 §6.7.2, the `identical-payload-digest` profile Common Crawl
    * and Heritrix emit): when a crawler re-fetches a URL and the payload
    * digest matches an earlier capture, it stores a body-less revisit
    * pointing at the original instead of duplicating the bytes.
    * `refersTo` (the original's WARC-Record-ID), `refersToUri`, and
    * `payloadDigest` are each optional — a NULL column omits its header
    * (real crawlers vary: Heritrix emits Refers-To, CC's newer segments
    * carry only the digest). Resolve them back with
    * [[graft.ext.CrawlPipeline.resolveRevisits]].
    */
  def formatRevisit(uri: org.apache.spark.sql.Column,
                    date: org.apache.spark.sql.Column,
                    refersTo: org.apache.spark.sql.Column,
                    refersToUri: org.apache.spark.sql.Column,
                    payloadDigest: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def opt(name: String, v: org.apache.spark.sql.Column) =
      when(v.isNull, lit("")).otherwise(concat(lit("\r\n" + name + ": "), v))
    concat(
      lit(VersionMarker),
      lit("WARC-Type: revisit\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      opt("WARC-Refers-To", refersTo),
      opt("WARC-Refers-To-Target-URI", refersToUri),
      opt("WARC-Payload-Digest", payloadDigest),
      lit("\r\nWARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"),
      lit("\r\nContent-Length: 0\r\n\r\n\r\n\r\n"))
  }

  /** Format (uri, date, text) rows as WARC CONVERSION records — the WET
    * layout (Common Crawl's extracted-text sidecar files): no HTTP block,
    * the payload is the extracted text itself, Content-Type carried as a
    * WARC header. Write through `df.write.text` or (member-per-record,
    * splittable) [[WarcGzip.writeGzip]] — the "extract once, persist as
    * WET, re-read everywhere" intermediate of a crawl pipeline.
    */
  def formatConversion(uri: org.apache.spark.sql.Column,
                       date: org.apache.spark.sql.Column,
                       text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit(VersionMarker),
      lit("WARC-Type: conversion\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
      octet_length(text).cast("string"),
      lit("\r\n\r\n"), text, lit("\r\n\r\n"))
}
