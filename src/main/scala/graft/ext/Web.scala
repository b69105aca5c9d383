package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Web-corpus provenance operators: registrable-domain extraction, per-domain
  * composition reports, and per-domain document caps — the URL-level curation
  * steps a C4/RefinedWeb-style pretraining pipeline runs before content
  * filters (cap the mega-domains so no single site dominates the mixture;
  * report the domain composition so the mixture is auditable). The reference
  * has no web-provenance surface (documents carry only free-form metadata,
  * core.py:90-99); this is new-scope for the training-data pipeline.
  *
  * Everything here is built-in-function composition — fully codegen'd, zero
  * UDFs, and the domain derivation is deterministic so retries/re-runs keep
  * identical outputs.
  */
object Web {

  /** Multi-part public suffixes recognized by the LITE registrable-domain
    * rule: when a host's last two labels are one of these, the registrable
    * domain takes three labels (bbc.co.uk, not co.uk). A deliberate small
    * documented subset of the Mozilla public-suffix list — the full list is
    * data, pluggable via [[registrableDomain]]'s `extraSuffixes`.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "or.jp", "ne.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "com.ar", "com.tr", "co.za", "com.sg", "com.hk")

  /** Lowercased hostname of a URL (port and userinfo stripped), NULL for
    * unparseable values — try_parse_url, because under ANSI (the Spark 4
    * default) parse_url THROWS on a malformed URL and one bad row in 100 TB
    * would kill the corpus scan. */
  def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  /** Registrable domain (public-suffix-lite): last two host labels, or three
    * when the last two are a recognized multi-part suffix. A bare or
    * single-label host passes through unchanged; NULL host stays NULL.
    * For real-PSL behavior (github.io, co.kr, wildcard TLDs) load the
    * public-suffix list file with [[loadSuffixes]] and use the
    * [[SuffixRules]] overload.
    */
  def registrableDomain(url: Column, extraSuffixes: Seq[String] = Nil): Column = {
    val host = hostOf(url)
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val take = when(last2.isin(MultiPartSuffixes ++ extraSuffixes: _*), lit(3)).otherwise(lit(2))
    when(host.isNull || size(labels) <= lit(2), host)
      .otherwise(concat_ws(".", slice(labels, -take, take)))
  }

  /** Parsed public-suffix rules, grouped by rule depth (label count):
    * `exact` plain rules with >= 2 labels (single-label rules like `com`
    * are the take-2 default already), `wildcardBases` the bases of `*.`
    * rules (rule `*.ck` -> base `ck` at depth 1: ANY 2-label suffix under
    * it), `exceptions` the `!` rules (the exception rule ITSELF is the
    * registrable domain). Depths are data-driven — 3- and 4-label PSL
    * rules (`pvt.k12.ma.us`) work without code changes.
    */
  final case class SuffixRules(exact: Map[Int, Seq[String]],
                               wildcardBases: Map[Int, Seq[String]],
                               exceptions: Map[Int, Seq[String]]) {
    def isEmpty: Boolean =
      exact.isEmpty && wildcardBases.isEmpty && exceptions.isEmpty
  }

  /** Parse a file in the Mozilla public-suffix list format (the REAL list
    * is data, not code — https://publicsuffix.org/list/, one rule per
    * line, `//` comments, rule text ends at the first whitespace,
    * `*.`-prefixed wildcard rules, `!`-prefixed exceptions). Driver-side
    * read: the list is a ~240 KB config file, and the rules become literal
    * `isin` sets inside one codegen'd expression — nothing shuffles.
    * Unicode rules are kept as written (match against the lowercased
    * host); punycode variants are the caller's concern, as in the PSL
    * spec's normalization note.
    */
  def loadSuffixes(path: String): SuffixRules = {
    import scala.jdk.CollectionConverters._
    val rules = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
      .asScala.iterator
      .map(_.trim.takeWhile(!_.isWhitespace))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toSeq
    def depth(r: String): Int = r.count(_ == '.') + 1
    val (excs, rest) = rules.partition(_.startsWith("!"))
    val (wilds, plains) = rest.partition(_.startsWith("*."))
    SuffixRules(
      exact = plains.filter(depth(_) >= 2).distinct.groupBy(depth),
      wildcardBases = wilds.map(_.stripPrefix("*.")).filter(_.nonEmpty)
        .distinct.groupBy(depth),
      exceptions = excs.map(_.stripPrefix("!")).filter(depth(_) >= 2)
        .distinct.groupBy(depth))
  }

  /** [[registrableDomain]] under LOADED public-suffix rules. PSL
    * semantics, longest-match: an exception rule wins outright (the rule
    * itself is the registrable domain), else the deepest matching suffix
    * rule — exact rule of depth d -> take d+1 labels, wildcard base of
    * depth b (rule depth b+1) -> take b+2 — else the take-2 default. A
    * host no longer than its matched take passes through whole (it IS a
    * public suffix or shorter — same convention as the lite rule's
    * single-label pass-through). Still one pure codegen'd expression:
    * the rules compile to literal isin sets over the last-k label joins.
    */
  def registrableDomain(url: Column, rules: SuffixRules): Column = {
    val host = hostOf(url)
    val labels = split(host, "\\.")
    def lastK(k: Int): Column = concat_ws(".", slice(labels, -k, k))
    // precedence: exceptions first (they beat any suffix rule), then
    // suffix families ordered by the depth of the suffix they assert,
    // deepest first (PSL longest-match)
    val arms: Seq[(Int, Column, Column)] =
      rules.exceptions.toSeq.map { case (d, rs) =>
        // exception beats every suffix rule regardless of depth
        (Int.MaxValue, lastK(d).isin(rs: _*), lit(d))
      } ++
      rules.exact.toSeq.map { case (d, rs) =>
        (d, lastK(d).isin(rs: _*), lit(d + 1))
      } ++
      rules.wildcardBases.toSeq.map { case (b, rs) =>
        (b + 1, lastK(b).isin(rs: _*), lit(b + 2))
      }
    val take = arms.sortBy(-_._1).foldRight(lit(2): Column) {
      case ((_, cond, t), els) => when(cond, t).otherwise(els)
    }
    when(host.isNull || size(labels) <= take, host)
      .otherwise(concat_ws(".", slice(labels, -take, take)))
  }

  /** Tracking parameter NAMES stripped by [[canonicalizeUrl]] — ONLY the
    * unambiguous click-tracking names (utm_* by prefix, the ad-click ids).
    * Deliberately excludes `ref`: on many sites it is resource-SELECTING
    * (GitHub's `?ref=branch`), and stripping it would collapse distinct
    * resources onto one canonical key, silently dropping real documents in
    * [[dedupByUrl]]. One source for both derived patterns below.
    */
  private val TrackingNames = "utm_[^=&]*|gclid|fbclid|msclkid"

  /** Token-level form: matches a FULL `name[=value]` query token, with a
    * `(=|$)` tail so a name never swallows a longer one (`gclid` vs
    * `gclid_extra=1`).
    */
  val TrackingParamPattern: String = s"^($TrackingNames)(=|$$)"

  /** Whole-query-string form: removes each tracking token PLUS exactly one
    * of its delimiters (the trailing `&`, or end-of-string — a leftover
    * leading/doubled `&` becomes an empty token and is dropped by the
    * `array_remove` in [[canonicalizeUrl]]). The `(?<=&)` lookbehind
    * anchors token starts without consuming the previous token's
    * delimiter, so adjacent tracking params all match (Java lookbehind
    * inspects the original input, including characters consumed by an
    * earlier match).
    */
  val TrackingParamStringPattern: String =
    s"(?:^|(?<=&))(?:$TrackingNames)(?:=[^&]*)?(?:&|$$)"

  /** Canonical form of a URL — the crawl-dedup key (two fetches of the same
    * resource under cosmetically different URLs must collide):
    *   - fragment dropped (`#…` never reaches the server);
    *   - scheme and host lowercased (userinfo case-PRESERVED — it is
    *     case-sensitive per RFC 3986; merging case-distinct credentials
    *     would collapse distinct resources); the scheme's default port
    *     stripped (`:80` for http, `:443` for https — repeated, so
    *     malformed `host:80:80` junk can't defeat idempotence);
    *   - ALL trailing `/` stripped from the path (`/p//` ≡ `/p` — one-slash
    *     stripping left `/p/`, whose re-canonicalization differed);
    *   - tracking parameters removed ([[TrackingParamPattern]]), remaining
    *     `name=value` tokens SORTED (param order is almost never
    *     significant; sorting is what makes `?a=1&b=2` ≡ `?b=2&a=1`), the
    *     bare `?` dropped when nothing survives.
    * A value without `://` passes through fragment-stripped only (not a
    * fetchable URL — no structure to normalize); NULL stays NULL. Pure
    * built-in composition (split/regexp/sort_array) — codegen'd, zero
    * UDFs. The DuckDB oracle replays it at RULE level (an independent
    * derivation per synthesized case — [[TrackingParamStringPattern]]'s
    * Java lookbehind has no RE2 equivalent, so a literal string-algebra
    * replay is not portable), and ExtSpec pins the expression
    * byte-for-byte against a plain-Scala reference over fuzzed URL soup.
    *
    * IDEMPOTENT on arbitrary strings — `canonicalizeUrl(canonicalizeUrl(x))
    * ≡ canonicalizeUrl(x)` (ExtSpec fuzzes this over adversarial URL
    * soup): a canonical key that re-canonicalizes to a different key would
    * silently split dedup groups between a raw corpus and one that stored
    * canonical URLs.
    */
  def canonicalizeUrl(url: Column): Column = {
    val base = substring_index(url, "#", 1)
    val scheme = substring_index(base, "://", 1)
    val rest = base.substr(length(scheme) + lit(4), length(base))
    val hostport = regexp_extract(rest, "^([^/?]*)", 1)
    val tail0 = rest.substr(length(hostport) + lit(1), length(rest))
    // userinfo (up to the LAST '@') keeps its case — it is case-sensitive
    // per RFC 3986, and lowercasing it would merge case-distinct
    // credentials into one dedup key; only the host[:port] part lowercases.
    // (?s) so crawl junk with line terminators in the authority can't make
    // the extract fail and silently DELETE the userinfo from the key
    val userinfo = regexp_extract(hostport, "^((?s:.)*@)", 1)
    val host0 = lower(substring_index(hostport, "@", -1))
    val hostStripped =
      when(lower(scheme) === "http", regexp_replace(host0, "(:80)+$", ""))
      .when(lower(scheme) === "https", regexp_replace(host0, "(:443)+$", ""))
      .otherwise(host0)
    val host = concat(userinfo, hostStripped)
    val path = regexp_replace(regexp_extract(tail0, "^([^?]*)", 1), "/+$", "")
    val qs = when(instr(tail0, "?") > 0,
      tail0.substr(instr(tail0, "?") + lit(1), length(tail0))).otherwise(lit(""))
    // string-level tracking removal + array_remove instead of a filter()
    // lambda: higher-order functions are CodegenFallback (interpreted per
    // row), and this projection is the 100 TB crawl-hygiene scan path —
    // these four are all natively codegen'd
    val q2 = array_join(sort_array(array_remove(
      split(regexp_replace(qs, TrackingParamStringPattern, ""), "&"), "")), "&")
    when(url.isNull, lit(null).cast("string"))
      .when(!base.contains("://"), base)
      .otherwise(concat(lower(scheme), lit("://"), host, path,
        when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
  }

  /** URL-level dedup: one document per [[canonicalizeUrl]] key, selected by
    * md5(id) rank (deterministic across reruns/retries, like
    * [[capPerDomain]]); documents whose canonical key is NULL (no URL)
    * cannot be URL-deduped and all pass through.
    *
    * Scale: the input plan evaluates ONCE (a split-union pass-through arm
    * would re-execute the whole upstream plan — joins, UDF columns — for
    * the NULL stratum; Spark does not dedupe common subplans), the
    * canonicalization computes once, and the survivor pick keeps the same
    * WindowGroupLimit shape as [[capPerDomain]] — a bounded 1-heap per key
    * on the map side, only one row per (partition, key) reaches the
    * shuffle (the rank filter must stay a PURE `rn = 1` for that lowering
    * — an OR'd NULL bypass defeats the rule). NULL-canonical rows ride the
    * same window under per-ROW synthetic keys (`monotonically_increasing_
    * id`, unique per row by construction, so every NULL row ranks 1 and
    * passes even under duplicate ids; the `isNull` flag column in the
    * partition key isolates them from any real canonical value, and the
    * output is deterministic because those rows are kept UNCONDITIONALLY —
    * the id's run-dependent VALUES never influence which rows survive).
    */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "id"): DataFrame = {
    val canon = WorkingColumns.fresh(docs, "__canon")
    val rn = WorkingColumns.fresh(docs, "__rn")
    val rowid = WorkingColumns.fresh(docs, "__rowid")
    val w = Window
      .partitionBy(col(canon).isNull,
        coalesce(col(canon), col(rowid).cast("string")))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs.withColumn(rowid, monotonically_increasing_id())
      .withColumn(canon, canonicalizeUrl(col(urlCol)))
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(canon, rn, rowid)
  }

  /** Per-domain composition report: (domain, n_docs, n_chars, share) sorted
    * by mass — the corpus-provenance audit. NULL domain (unparseable URL)
    * is its own reported bucket, never silently dropped.
    *
    * Scale: one (domain) hash shuffle over a skinny (domain, chars)
    * projection with map-side partial aggregation; the 1-row corpus total
    * joins back as a broadcast scalar (no second scan — computed from the
    * aggregated per-domain frame, O(#domains)).
    */
  def domainReport(docs: DataFrame, urlCol: String = "url",
                   contentCol: String = "content"): DataFrame = {
    val per = docs
      .select(registrableDomain(col(urlCol)).as("domain"),
        length(col(contentCol)).cast("long").as("__chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__chars")).as("n_chars"))
    val total = per.agg(sum(col("n_docs")).as("__total"))
    per.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("n_chars"),
        (col("n_docs").cast("double") / col("__total")).as("share"))
      .orderBy(col("n_docs").desc, col("domain").asc_nulls_last)
  }

  /** Per-domain document cap: keep at most `maxPerDomain` docs per
    * registrable domain, selected by md5(id) rank (deterministic — a rerun
    * or a retried partition keeps the SAME docs, unlike rand()-based
    * sampling). Docs with an unparseable URL share the NULL-domain bucket
    * and are capped like any other.
    *
    * Scale: the [[Pipeline.topKPerGroup]] shape — row_number over a
    * (domain) window that Spark lowers to WindowGroupLimit, so the map side
    * keeps a bounded k-heap per domain and only ≤ cap rows per (partition,
    * domain) reach the shuffle. The corpus is never fully sorted.
    */
  def capPerDomain(docs: DataFrame, urlCol: String = "url",
                   idCol: String = "id", maxPerDomain: Int = 1000): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain >= 1")
    val dom = WorkingColumns.fresh(docs, "__dom")
    val rn = WorkingColumns.fresh(docs, "__rn")
    val w = Window.partitionBy(col(dom))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs.withColumn(dom, registrableDomain(col(urlCol)))
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= maxPerDomain)
      .drop(dom, rn)
  }

  /** One alternation regex for a phrase blocklist: each phrase lowercased,
    * regex-quoted (`\Q…\E` — supported by Java AND RE2, so the x129 oracle
    * replays the IDENTICAL pattern string), the whole alternation
    * word-bounded (`\b`): "ad" never blocks "adapter", multi-word phrases
    * match their exact spacing.
    */
  private[graft] def phrasePattern(phrases: Seq[String]): String =
    "\\b(?:" +
      phrases.map(p => java.util.regex.Pattern.quote(
        p.toLowerCase(java.util.Locale.ROOT))).mkString("|") +
      ")\\b"

  /** X129: blocklist curation — the C4/UT1-style hard filter: classify a
    * doc `'domain'` when its registrable domain is on the domain blocklist,
    * else `'phrase'` when its content matches the phrase blocklist, else
    * NULL (clean). [[filterByBlocklist]] keeps the NULLs; this form keeps
    * every row so the drop is auditable (the x82 facet / x99 report
    * machinery can aggregate the reasons).
    *
    * Semantics: domains match the [[registrableDomain]] of the URL
    * case-insensitively — pass `rules` for real-PSL bucketing; phrases
    * match case-insensitively on word boundaries via ONE compiled
    * alternation regex ([[phrasePattern]]). NULL pass-through: a NULL or
    * unparseable URL cannot domain-block (its domain is NULL — `isin` and
    * the join both miss), and NULL content cannot phrase-block — a missing
    * field never silently drops a doc.
    *
    * Scale: both tests are per-row predicates inside the scan projection —
    * zero shuffle, zero extra scans. The literal domain list compiles to a
    * codegen'd InSet (O(1)/row; practical to ~100k literals, beyond which
    * the plan itself bloats); the phrases to one alternation regex below
    * `phraseAutomatonAt` entries, and to a native Aho-Corasick expression
    * ([[graft.functions.MultiPhraseContains]] — O(content chars) regardless
    * of phrase count, the same `\b` semantics, spec-diff-fuzzed against
    * the regex arm) at or above it, which carries million-phrase UT1-class
    * lists. For UT1-scale domain lists (millions of rows) pass
    * `blockedDomainsDf` (any single-column frame of domains) instead: a
    * broadcast LEFT join marks hits without materializing a giant literal
    * plan — still no shuffle of the corpus side.
    */
  def blocklistTag(docs: DataFrame, urlCol: String = "url",
                   contentCol: String = "content",
                   blockedDomains: Seq[String] = Nil,
                   blockedPhrases: Seq[String] = Nil,
                   rules: Option[SuffixRules] = None,
                   blockedDomainsDf: Option[DataFrame] = None,
                   reasonCol: String = "block_reason",
                   phraseAutomatonAt: Int = 256): DataFrame = {
    require(blockedPhrases.forall(_.nonEmpty),
      "empty phrases are not allowed: the \\b-bounded empty alternation " +
        "branch would match at EVERY word edge and block the whole corpus")
    val dom = rules match {
      case Some(r) => registrableDomain(col(urlCol), r)
      case None    => registrableDomain(col(urlCol))
    }
    val domHitLit: Column =
      if (blockedDomains.isEmpty) lit(false)
      else dom.isin(blockedDomains.map(_.toLowerCase(java.util.Locale.ROOT)): _*)
    val phraseHit: Column =
      if (blockedPhrases.isEmpty) lit(false)
      else if (blockedPhrases.size >= phraseAutomatonAt)
        graft.functions.PhraseMatch.containsAnyPhrase(col(contentCol), blockedPhrases)
      else lower(col(contentCol)).rlike(phrasePattern(blockedPhrases))
    def tag(domainHit: Column, frame: DataFrame): DataFrame =
      frame.withColumn(reasonCol,
        when(domainHit, lit("domain"))
          .when(phraseHit, lit("phrase"))
          .otherwise(lit(null).cast("string")))
    blockedDomainsDf match {
      case None => tag(domHitLit, docs)
      case Some(bdf) =>
        val dcol = WorkingColumns.fresh(docs, "__blocked_dom")
        val blocked = broadcast(
          bdf.select(lower(col(bdf.columns.head)).as(dcol)).distinct())
        val domName = WorkingColumns.fresh(docs, "__dom")
        tag(col(dcol).isNotNull || domHitLit,
          docs.withColumn(domName, dom)
            .join(blocked, col(domName) === col(dcol), "left"))
          .drop(domName, dcol)
    }
  }

  /** [[blocklistTag]]'s curation form: the surviving corpus, schema
    * passthrough. */
  def filterByBlocklist(docs: DataFrame, urlCol: String = "url",
                        contentCol: String = "content",
                        blockedDomains: Seq[String] = Nil,
                        blockedPhrases: Seq[String] = Nil,
                        rules: Option[SuffixRules] = None,
                        blockedDomainsDf: Option[DataFrame] = None,
                        phraseAutomatonAt: Int = 256): DataFrame = {
    val reason = WorkingColumns.fresh(docs, "__block_reason")
    blocklistTag(docs, urlCol, contentCol, blockedDomains, blockedPhrases,
      rules, blockedDomainsDf, reason, phraseAutomatonAt)
      .filter(col(reason).isNull).drop(reason)
  }

  /** X139: robots.txt rules — parse robots.txt captures (the per-domain
    * sibling of X137's per-page robots meta) into a joinable (host, rule,
    * path_prefix) frame, per the REP conventions RFC 9309 standardized and
    * C4-class crawl pipelines honor:
    *   - `field: value` lines, `#` comments stripped, names case-folded;
    *   - a GROUP is one or more consecutive `User-agent` lines followed by
    *     its `Allow`/`Disallow` rules; rules before any group are ignored;
    *   - group selection (RFC 9309 §2.2.1 most-specific match, the
    *     googlebot rule): a group matches when its product token is a
    *     case-insensitive PREFIX of `agent` (`googlebot` governs
    *     `googlebot-news` unless a more specific group exists); among
    *     matching groups only those with the LONGEST token apply (ties
    *     combine — same token, split groups), and the `*` groups apply
    *     only when no specific group matches;
    *   - an EMPTY `Disallow:` value means allow-everything and yields no
    *     rule; rule patterns must start with `/` or `*` (RFC 9309's
    *     path-pattern grammar) — anything else is malformed and dropped;
    *   - `*`/`$` wildcards (RFC 9309 §2.2.3) are IN contract: `*` matches
    *     any character run, a TRAILING `$` anchors the pattern at the end
    *     of the URL — real robots files lean on both (a `Disallow:` of
    *     `/&#42;.pdf$` or `/&#42;?sessionid=`), and treating them as
    *     literals would silently leak disallowed pages into the corpus. A
    *     non-trailing `$` is an ordinary character (the googlebot
    *     convention). The emitted `path_prefix` column carries the RAW
    *     pattern; wildcard lowering happens in [[dropDisallowed]].
    * Rules are HOST-scoped (robots.txt governs its own authority, RFC
    * 9309 §2.3), so the key is [[hostOf]], not the registrable domain.
    * When several captures exist per host (a crawl revisits — such
    * captures share the SAME url, so the tiebreak must reach the
    * content), the (md5(url), url, md5(content))-ranked first is used —
    * deterministic across reruns even for revisit duplicates.
    *
    * Scale: one per-host window over exploded LINES of kilobyte-sized
    * robots bodies — tiny rows, massively parallel across hosts; the
    * output frame is per-host-small by construction (broadcastable into
    * [[dropDisallowed]]).
    */
  def robotsRules(robots: DataFrame, agent: String = "*",
                  urlCol: String = "url",
                  contentCol: String = "content"): DataFrame =
    selectedGroupRows(
      robotsLineFrame(robots, urlCol, contentCol,
        Seq("user-agent", "allow", "disallow")),
      agent.toLowerCase(java.util.Locale.ROOT))
      .filter(col("__value").startsWith("/") || col("__value").startsWith("*"))
      .select(col("__host").as("host"), col("__field").as("rule"),
        col("__value").as("path_prefix"))
      .distinct()

  /** The shared robots.txt line parse: one deterministic capture per host
    * (the (md5(url), url, md5(content)) rank), exploded to
    * (__host, __pos, __field, __value) rows — comments stripped, field
    * names lowercased, restricted to `fields`. */
  private def robotsLineFrame(robots: DataFrame, urlCol: String,
                              contentCol: String,
                              fields: Seq[String]): DataFrame = {
    val one = Window.partitionBy(col("__host")).orderBy(
      md5(col(urlCol)), col(urlCol),
      md5(coalesce(col(contentCol), lit(""))))
    robots
      .select(hostOf(col(urlCol)).as("__host"), col(urlCol), col(contentCol))
      .filter(col("__host").isNotNull)
      .withColumn("__rn", row_number().over(one))
      .filter(col("__rn") === 1)
      .select(col("__host"),
        posexplode(split(col(contentCol), "\n")).as(Seq("__pos", "__line")))
      .select(col("__host"), col("__pos"),
        trim(regexp_replace(col("__line"), "#.*$", "")).as("__line"))
      .select(col("__host"), col("__pos"),
        lower(trim(regexp_extract(col("__line"), "^([A-Za-z-]+)\\s*:", 1))).as("__field"),
        trim(regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("__value"))
      .filter(col("__field").isin(fields: _*))
  }

  /** The shared RFC 9309 §2.2.1 group selection over a
    * [[robotsLineFrame]] (which must include the `user-agent` lines):
    * groups of consecutive UA heads + their following rows, a group's
    * match strength = the longest product token that PREFIX-matches the
    * agent, longest wins (ties combine), `*` groups only when no
    * specific group matches. Returns the SELECTED groups' non-UA rows.
    */
  private def selectedGroupRows(lines: DataFrame, agentLc: String): DataFrame = {
    val w = Window.partitionBy(col("__host")).orderBy(col("__pos"))
    val isUa = col("__field") === "user-agent"
    val grouped = lines
      // a group starts at a user-agent line NOT preceded by another
      // user-agent line (consecutive UA lines share one group head)
      .withColumn("__g", sum(
        (isUa && !coalesce(lag(isUa, 1).over(w), lit(false))).cast("long")).over(w))
      .filter(col("__g") > 0) // rows before any group: ignored
    // a group's match strength = the longest of its product tokens that
    // PREFIX-matches the agent (NULL when none; empty tokens are
    // malformed and never match — startsWith("") would match everything)
    val groups = grouped.groupBy(col("__host"), col("__g"))
      .agg(
        max(when(isUa && col("__value") =!= "*" && length(col("__value")) > 0
            && lit(agentLc).startsWith(lower(col("__value"))),
          length(col("__value")))).as("__spec_len"),
        max(when(isUa && col("__value") === "*", true)
          .otherwise(false)).as("__star_hit"))
    val hostBest = groups.groupBy(col("__host"))
      .agg(max(col("__spec_len")).as("__best_len"))
    grouped.filter(!isUa)
      .join(groups, Seq("__host", "__g"))
      .join(hostBest, Seq("__host"))
      .filter(when(col("__best_len").isNotNull,
          col("__spec_len") === col("__best_len"))
        .otherwise(col("__star_hit")))
  }

  /** X147: the robots.txt directives BEYOND allow/disallow that a crawl
    * pipeline consumes — (host, field, value) rows:
    *   - `sitemap`: GROUP-INDEPENDENT per the sitemaps.org protocol (a
    *     Sitemap line applies regardless of user-agent, and commonly
    *     appears before any group) — every non-empty Sitemap value of
    *     the host's robots.txt, verbatim (absolute URLs by contract;
    *     this parser does not resolve relative ones);
    *   - `crawl-delay`: GROUP-SCOPED (the de-facto extension Bing/Yandex
    *     honor) — only values from the groups [[robotsRules]]'s agent
    *     selection picks, so the delay you read is the delay that
    *     governs the agent you crawl as.
    * Same deterministic per-host capture pick and comment stripping as
    * [[robotsRules]]; same per-host-small output (broadcastable next to
    * the rules frame into a scheduler).
    */
  def robotsDirectives(robots: DataFrame, agent: String = "*",
                       urlCol: String = "url",
                       contentCol: String = "content"): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val sitemaps = robotsLineFrame(robots, urlCol, contentCol, Seq("sitemap"))
      .filter(col("__value") =!= "")
      .select(col("__host").as("host"), lit("sitemap").as("field"),
        col("__value").as("value"))
    val delays = selectedGroupRows(
      robotsLineFrame(robots, urlCol, contentCol,
        Seq("user-agent", "crawl-delay")),
      agentLc)
      .filter(col("__field") === "crawl-delay" && col("__value") =!= "")
      .select(col("__host").as("host"), lit("crawl-delay").as("field"),
        col("__value").as("value"))
    sitemaps.unionByName(delays).distinct()
  }

  /** X139: drop documents a host's robots.txt disallows for the crawled
    * agent — RFC 9309 evaluation over [[robotsRules]] output: among the
    * host's rules matching the doc's URL path?query, the one with the
    * LONGEST PATTERN wins (the RFC's most-specific rule, measured in
    * pattern octets — googlebot's priority); `allow` wins length ties; no
    * host rules / no matching rule / unparseable URL → keep (the X129
    * missing-field convention). Rules match against the URL's path PLUS
    * query (fragment excluded) — RFC 9309 §2.2.2's target, and the only
    * reading under which the common `Disallow: /search?q=` form can ever
    * match.
    *
    * Wildcard semantics (RFC 9309 §2.2.3): `*` in a pattern matches any
    * character run and a TRAILING `$` anchors at the end of the target;
    * both lower to an anchored Java regex (everything else literal-
    * quoted) HERE, on the skinny pre-broadcast rules frame. Plain-prefix
    * rules — the overwhelming majority in real robots files — keep the
    * codegen'd `startsWith` arm (their compiled regex column stays NULL),
    * so per-row regex evaluation is paid only for rules that need it.
    *
    * Scale: the rules frame aggregates to ONE skinny array row per host
    * and broadcast-joins onto the corpus — the corpus never shuffles; the
    * longest-match evaluation is per-row array math over a robots-file-
    * sized list (HOF lambdas run interpreted, but over ≤ dozens of
    * elements per row — measured noise next to the scan).
    */
  def dropDisallowed(docs: DataFrame, rules: DataFrame,
                     urlCol: String = "url"): DataFrame = {
    val hostRules = WorkingColumns.fresh(docs, "__rules")
    val hcol = WorkingColumns.fresh(docs, "__host")
    // wildcard lowering, per rule, on the tiny rules frame: strip one
    // trailing '$' (the anchor), regex-quote every metachar EXCEPT '*',
    // then '*' -> '.*'; anchored '^' prefix, '$' suffix only when the raw
    // pattern ended with it. A pattern with neither '*' nor trailing '$'
    // stays a plain prefix (rx NULL -> the startsWith arm).
    val pat = col("path_prefix")
    val endsDollar = pat.endsWith("$")
    val core = when(endsDollar, pat.substr(lit(1), length(pat) - 1)).otherwise(pat)
    val quoted = regexp_replace(core, "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1")
    val rx = when(pat.contains("*") || endsDollar,
      concat(lit("^"), regexp_replace(quoted, "\\*", ".*"),
        when(endsDollar, lit("$")).otherwise(lit(""))))
    val perHost = broadcast(rules.groupBy(col("host"))
      .agg(collect_list(struct(
        col("path_prefix"),
        (col("rule") === "allow").as("allow"),
        length(col("path_prefix")).as("plen"),
        rx.as("rx"))).as(hostRules))
      .withColumnRenamed("host", hcol))
    // path + query (fragment excluded), absent path -> "/"
    val path0 = regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val matched = filter(col(hostRules), r =>
      when(r.getField("rx").isNull, path.startsWith(r.getField("path_prefix")))
        .otherwise(regexp_like(path, r.getField("rx"))))
    val best = aggregate(matched,
      lit(null).cast("struct<path_prefix:string,allow:boolean,plen:int,rx:string>"),
      (acc, r) => when(acc.isNull, r)
        .when(r.getField("plen") > acc.getField("plen"), r)
        .when(r.getField("plen") === acc.getField("plen")
          && r.getField("allow") && !acc.getField("allow"), r)
        .otherwise(acc))
    docs.withColumn(hcol, hostOf(col(urlCol)))
      .join(perHost, Seq(hcol), "left")
      .filter(col(hostRules).isNull || best.isNull || best.getField("allow"))
      .drop(hcol, hostRules)
  }

  /** X137: robots-meta hygiene — drop documents whose
    * `<meta name="robots">` directives carry the `noindex` token (the page
    * told crawlers not to index it; C4-class pipelines honor that before
    * training). Pages declaring no robots meta (or NULL html) PASS — the
    * X129 missing-field convention. Token match, not substring:
    * `noindex,nofollow` blocks, a hypothetical `nonoindexed` value does
    * not. Zero-shuffle filter over the raw html column.
    */
  def dropNoindex(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    docs.filter(!coalesce(
      // pre-gate on a cheap substring scan: the robots extraction is a
      // multi-regex chain (comment/container strip + head bound + element
      // match), and a page without the literal string "robots" anywhere
      // cannot carry the meta — measured 1.8× on the 2M crawl e2e pass
      when(lower(col(htmlCol)).contains("robots"),
        graft.ext.Html.metaRobotsOf(col(htmlCol)))
        .rlike("\\bnoindex\\b"),
      lit(false)))
}
