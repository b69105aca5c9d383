package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
           warcRoot: Option[String] = None): DataFrame = {
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
    spark.read.text(path)
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
}
