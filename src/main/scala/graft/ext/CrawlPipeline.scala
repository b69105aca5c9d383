package graft.ext

import graft.sources.WarcGzip
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl→corpus→shards pipeline as ONE library call — the composition
  * the x135 flagship entry pins cross-engine, packaged for users: member-
  * gzip WARC read → response/status gate → robots hygiene → HTML→text →
  * URL dedup → blocklist → optional language gate → corpus line dedup →
  * near-dedup → sequence packing + shuffle shards.
  *
  * Stage discipline: each multi-consumer boundary is persist()ed and
  * materialized before the previous stage releases — the library-scale
  * form of the entry's local freeze (an unpersisted 8-deep lazy chain
  * re-evaluates upstream stages multiplicatively; measured ~50× on the
  * composed-pipeline fixture). The returned frame is PERSISTED — the
  * caller unpersists when done.
  *
  * The reference has no pipeline surface at all (core.py reads only its
  * own tables); this is the product composition of the crawl story.
  */
object CrawlPipeline {

  /** A robots.txt capture's URI — ONE pattern for both its uses (the
    * rules-source selection and the corpus exclusion): drift between the
    * two would leak robots bodies into the corpus or feed pages into the
    * rules. */
  private val RobotsUriPattern = "(?i)://[^/]+/robots\\.txt$"

  /** Curation knobs. `idFrom` overrides document-id minting (default:
    * md5 over record identity — WARC-Record-ID + url + content, NUL-
    * joined); pipelines that carry provenance inside the content (the
    * x135 fixture) derive ids from it instead. `dropTruncated` drops
    * records the ARCHIVER cut short (`WARC-Truncated` present — partial
    * HTML extracts as broken text; Common Crawl flags large payloads
    * this way). `stagePath` switches stage boundaries from executor-
    * storage `persist()` to DURABLE temp parquet under that directory —
    * at 100 TB the persisted form depends on executor storage headroom,
    * and a failed long run loses everything; the parquet form's
    * completed boundaries survive on disk for a caller to read back
    * (resume is manual — a fresh run recomputes; see `stage`).
    */
  final case class CrawlConfig(
      splitBytes: Long = 128L * 1024 * 1024,
      keepHttpStatus: Set[Int] = Set(200),
      dropTruncated: Boolean = true,
      dropNoindexPages: Boolean = true,
      blockedDomains: Seq[String] = Nil,
      blockedPhrases: Seq[String] = Nil,
      keepLang: Option[String] = None,
      lineDedup: Boolean = true,
      nearDedup: Boolean = true,
      nearDedupThreshold: Double = 0.8,
      idFrom: Option[Column] = None,
      stagePath: Option[String] = None,
      robotsTxt: Option[DataFrame] = None,
      robotsFromCrawl: Boolean = false,
      robotsAgent: String = "*")

  /** Materialize `df` at a stage boundary, then release `prev`.
    * Default: persist() + count (executor storage). With `stagePath`:
    * write temp parquet `stage-<n>` and read it back — durable: after a
    * failed long run the completed boundaries survive as real parquet a
    * caller can read back directly (resume is MANUAL — this call always
    * recomputes and overwrites, because silently trusting a stage dir
    * left by a run with a DIFFERENT config would be wrong results, the
    * worse failure). Both modes return a frame whose consumers never
    * re-evaluate the upstream chain (the multi-consumer boundary
    * contract).
    */
  private def stage(df: DataFrame, prev: Option[DataFrame],
                    stagePath: Option[String], n: Int): DataFrame =
    stagePath match {
      case None =>
        val p = df.persist()
        p.count()
        prev.foreach(_.unpersist())
        p
      case Some(root) =>
        val dir = s"$root/stage-$n"
        df.write.mode("overwrite").parquet(dir)
        df.sparkSession.read.parquet(dir)
    }

  /** `.warc.gz` path → curated corpus (id, url, content), materialized
    * at its last stage boundary (persist() by default — the caller
    * unpersists — or durable parquet under `stagePath`). Records that
    * are not responses with an accepted status are dropped, as are
    * archiver-truncated captures when `dropTruncated`; `noindex` pages
    * are dropped before extraction (their html never parses further);
    * the rest is the x135 stage order: extract+id → [robots.txt gate] →
    * URL dedup → blocklist → [language gate] → [line dedup] →
    * [near-dedup].
    *
    * REVISIT records (the archival URL-dedup convention — body-less
    * pointers at an earlier identical-payload capture) are DROPPED here
    * by the `warc_type === response` gate, by design: a training corpus
    * wants each payload once, and the original capture already
    * contributes it. A caller who wants the duplication SIGNAL (re-crawl
    * frequency, URL aliasing for X124/X30) runs [[resolveRevisits]] on
    * the same read and joins its output — resolve or drop is the
    * caller's choice, never an implicit merge.
    */
  def curateCrawl(spark: SparkSession, warcGzPath: String,
                  cfg: CrawlConfig = CrawlConfig()): DataFrame = {
    require(!(cfg.robotsFromCrawl && cfg.robotsTxt.nonEmpty),
      "robotsFromCrawl and an explicit robotsTxt frame conflict - " +
        "silently preferring one would gate with rules the caller did " +
        "not configure; set exactly one")
    val read0 = WarcGzip.read(spark, warcGzPath, cfg.splitBytes)
      .filter(col("warc_type") === "response")
      .filter(col("http_status").isin(cfg.keepHttpStatus.toSeq.map(Int.box): _*))
    val read1 =
      if (cfg.dropTruncated) read0.filter(col("warc_truncated").isNull)
      else read0
    // with robotsFromCrawl the robots.txt captures feed the RULES arm and
    // must not also become corpus documents (NULL uri keeps — it cannot
    // be a robots capture)
    val read2 =
      if (cfg.robotsFromCrawl)
        read1.filter(!coalesce(
          col("target_uri").rlike(RobotsUriPattern), lit(false)))
      else read1
    // respread a narrow archive read before the HTML→text extraction —
    // a handful of .warc.gz members otherwise serializes the heaviest
    // per-row kernel of the pipeline onto as many cores as there are
    // files; identity at real scale (guide §2)
    val read = WorkingColumns.respread(read2)
    val indexable =
      if (cfg.dropNoindexPages) Web.dropNoindex(read, htmlCol = "body") else read
    val extracted = indexable.select(
      col("target_uri").as("url"), col("record_id"),
      Html.htmlToText(col("body")).as("content"))
    val id = cfg.idFrom.getOrElse(
      md5(concat_ws("\u0000",
        coalesce(col("record_id"), lit("")),
        coalesce(col("url"), lit("")),
        coalesce(col("content"), lit("")))))
    // read → extract+id → url dedup → blocklist → [lang] is ONE
    // single-reference lazy chain: each operator makes one pass over its
    // input, so the whole prefix evaluates exactly once when the first
    // multi-consumer boundary materializes — persisting the intermediate
    // steps would only add memory and jobs
    val withId = extracted.select(id.as("id"), col("url"), col("content"))
    // per-domain robots.txt hygiene (X139): rules parse once (per-host-
    // small frame) and broadcast onto the corpus — still one scan pass.
    // `robotsFromCrawl` derives the rules from the CRAWL's OWN robots.txt
    // captures (real segments archive them alongside the pages) — a
    // second pruned pass over the archive for the few robots responses,
    // collapsing to a per-host-small rules frame before the broadcast;
    // an explicit `robotsTxt` frame skips that pass.
    // only CLEAN captures feed the rules: a 403/404/challenge body
    // containing "Disallow: /" would wipe the host's whole corpus, and
    // an archiver-truncated robots.txt can keep a Disallow while losing
    // its Allow carve-out — both silent over-drops
    val robotsSrc: Option[DataFrame] =
      if (cfg.robotsFromCrawl) Some(
        WarcGzip.read(spark, warcGzPath, cfg.splitBytes)
          .filter(col("warc_type") === "response")
          .filter(col("http_status") === 200)
          .filter(col("warc_truncated").isNull)
          .filter(col("target_uri").rlike(RobotsUriPattern))
          .select(col("target_uri").as("url"), col("body").as("content")))
      else cfg.robotsTxt
    val robotsGated = robotsSrc match {
      case Some(r) =>
        Web.dropDisallowed(withId, Web.robotsRules(r, cfg.robotsAgent))
      case None => withId
    }
    val clean = Web.filterByBlocklist(Web.dedupByUrl(robotsGated),
      blockedDomains = cfg.blockedDomains,
      blockedPhrases = cfg.blockedPhrases)
    val gated = cfg.keepLang match {
      case Some(lang) =>
        TextStats.langId(clean).filter(col("pred_lang") === lang).drop("pred_lang")
      case None => clean
    }
    // first multi-consumer boundary: the line-dedup stage (and the url
    // rejoin) reference their input several times — materialize from here
    val s4 = stage(gated, None, cfg.stagePath, 0)
    val s5 =
      if (!cfg.lineDedup) s4
      else stage(
        Dedup.dedupLinesCorpus(s4.select("id", "content"))
          .select(col("id"), col("content_dedup").as("content"))
          .join(s4.select("id", "url"), Seq("id")),
        Some(s4), cfg.stagePath, 1)
    if (!cfg.nearDedup) s5
    else stage(
      Dedup.dedupCorpus(s5.select("id", "content"),
          threshold = cfg.nearDedupThreshold)
        .join(s5.select("id", "url"), Seq("id"))
        .select("id", "url", "content"),
      Some(s5), cfg.stagePath, 2)
  }

  /** X144: resolve REVISIT records back to their original captures — the
    * duplication signal real Common Crawl segments carry (a revisit has
    * no body; un-resolved it is just a dropped row, losing the re-crawl/
    * URL-aliasing evidence X124's URL dedup and X30's cluster audit can
    * use). Input: a WARC records frame ([[WarcGzip.read]] output — needs
    * `warc_type`, `target_uri`, `warc_date`, `record_id`, `refers_to`,
    * `payload_digest`). Output: one row per revisit —
    * (url, capture_ts, record_id, original_id, original_uri,
    * original_date, matched_by) — matched by `WARC-Refers-To` record id
    * when the revisit carries one (Heritrix), else by payload digest
    * (CC's newer segments); unmatched revisits keep NULL originals and a
    * NULL `matched_by` (dangling pointers are data, not errors — the
    * caller drops or reports).
    *
    * Determinism: several originals can share a digest (true content
    * dups); the canonical original is the EARLIEST (warc_date,
    * record_id, target_uri) — a min(struct) aggregate, so the digest arm
    * joins ONE row per digest (no skew amplification from popular
    * payloads). Scale: both join sides are skinny header projections —
    * the record bodies never shuffle; revisits are a small fraction of a
    * real segment, originals collapse to one row per id/digest.
    */
  def resolveRevisits(records: DataFrame): DataFrame = {
    val originals = records.filter(col("warc_type") === "response")
      .select(col("record_id"), col("target_uri"), col("warc_date"),
        col("payload_digest"))
    val byId = originals.filter(col("record_id").isNotNull)
      .groupBy(col("record_id").as("__rid"))
      .agg(min(struct(col("warc_date"), col("target_uri"))).as("__o"))
    val byDigest = originals.filter(col("payload_digest").isNotNull)
      .groupBy(col("payload_digest").as("__pd"))
      .agg(min(struct(col("warc_date"), col("record_id"),
        col("target_uri"))).as("__od"))
    records.filter(col("warc_type") === "revisit")
      .select(col("target_uri").as("url"), col("warc_date").as("capture_ts"),
        col("record_id"), col("refers_to"),
        col("payload_digest").as("__pd"))
      .join(byId, col("refers_to") === col("__rid"), "left")
      .join(byDigest, Seq("__pd"), "left")
      .select(
        col("url"), col("capture_ts"), col("record_id"),
        when(col("__rid").isNotNull, col("refers_to"))
          .otherwise(col("__od").getField("record_id")).as("original_id"),
        when(col("__rid").isNotNull, col("__o").getField("target_uri"))
          .otherwise(col("__od").getField("target_uri")).as("original_uri"),
        when(col("__rid").isNotNull, col("__o").getField("warc_date"))
          .otherwise(col("__od").getField("warc_date")).as("original_date"),
        when(col("__rid").isNotNull, lit("refers_to"))
          .when(col("__od").isNotNull, lit("digest")).as("matched_by"))
  }

  /** X146: WAT-style metadata sidecar — one `application/json` WARC
    * metadata record per response capture, carrying the X128b head
    * metadata (title, canonical url, meta description, declared lang,
    * robots directives), `WARC-Refers-To` naming the described capture
    * when it has a record id. Completes the CC product triple next to
    * the WET conversion flow (x136): WARC (captures) / WAT (metadata) /
    * WET (extracted text). Output is one record-string column — write
    * with [[WarcGzip.writeGzip]]. NULL metadata fields are OMITTED from
    * the JSON (`to_json`'s default — WAT's sparse convention: an absent
    * title is no key, not `"title": null`). Zero-shuffle: extraction and
    * formatting are one projection over the records scan.
    */
  def toWat(records: DataFrame): DataFrame = {
    val resp = records
      .filter(col("warc_type") === "response" && col("target_uri").isNotNull)
      .select(col("target_uri"), col("warc_date"), col("record_id"),
        col("body").as("html"))
    Html.extractMetadata(resp)
      .select(graft.sources.Warc.formatMetadata(
        col("target_uri"), col("warc_date"),
        to_json(struct(col("title"), col("canonical_url"),
          col("meta_description"), col("declared_lang"), col("robots"))),
        col("record_id")).as("rec"))
  }

  /** Curated corpus → training layout: X18 sequence packing (pack_shard /
    * n_tokens / offset / bin under `budget`) joined with X31 shuffle
    * shards (shard / pos) — one row per surviving document, content
    * passed through for the sink.
    */
  def toShards(curated: DataFrame, budget: Long = 2048, packShards: Int = 256,
               numShards: Int = 256, seed: Long = 0L): DataFrame = {
    val packed = Pipeline.packSequences(curated, budget = budget, shards = packShards)
      .select(col("id"), col("shard").as("pack_shard"), col("n_tokens"),
        col("offset"), col("bin"))
    val sharded = Pipeline.shuffleShards(curated, numShards = numShards, seed = seed)
      .select(col("id"), col("shard"), col("pos"))
    curated.join(sharded, Seq("id")).join(packed, Seq("id"))
      .select("id", "url", "shard", "pos", "pack_shard", "n_tokens",
        "offset", "bin", "content")
  }
}
