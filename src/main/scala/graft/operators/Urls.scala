package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and canonical-URL dedup — the first dedup pass of
  * every web-crawl curation pipeline (the same page is fetched under
  * `HTTP://Example.COM:80/a?utm_source=x&b=1#top` and
  * `http://example.com/a?b=1`; byte-level text dedup only catches it
  * after the far more expensive fetch+extract).
  *
  * Canonical form, applied in order:
  *   1. fragment dropped (`#…` never reaches the server);
  *   2. scheme and host lowercased (case-insensitive per RFC 3986);
  *   3. default port stripped (`:80` for http, `:443` for https);
  *   4. empty path → `/`;
  *   5. tracking parameters removed ([[defaultTrackingParams]], or the
  *      caller's list);
  *   6. remaining query parameters sorted bytewise (param order is
  *      almost never semantic; sorting merges permuted duplicates).
  *
  * Everything is built from codegen'd string/array builtins — no UDF, no
  * shuffle: canonicalization is a pure per-row projection that runs
  * inside whole-stage codegen at scan speed. [[dedupByCanonical]] adds
  * the single hash exchange any exact dedup needs, keyed on the
  * canonical string.
  */
object Urls {

  /** Parameters stripped as tracking noise by default: the `utm_`
    * campaign namespace plus the Facebook/Google click ids — params that
    * NEVER select content. An entry ending in `*` matches by prefix;
    * anything else matches the whole name. Bare `ref` is deliberately
    * NOT here (dropped round 12): many real sites use it semantically
    * (GitHub's `?ref=<branch>` selects a different page), and stripping
    * it would merge genuinely distinct documents into one canonical
    * identity — silent content loss in [[dedupByCanonical]]. Corpora
    * where `ref` is referral-only opt in per call:
    * `canonicalize(u, defaultTrackingParams :+ "ref")`.
    */
  val defaultTrackingParams: Seq[String] = Seq("utm_*", "fbclid", "gclid")

  /** `^(alt|alt|…)(=|$)` over quoted names; `*` suffix → prefix match. */
  private def trackingRegex(params: Seq[String]): String = {
    val alts = params.map { p =>
      if (p.endsWith("*")) java.util.regex.Pattern.quote(p.dropRight(1)) + "[^=]*"
      else java.util.regex.Pattern.quote(p)
    }
    if (alts.isEmpty) "^(?!)" // match nothing: strip no parameters
    else s"^(${alts.mkString("|")})(=|$$)"
  }

  /** The lowercased `host[:port]` of the authority, userinfo stripped —
    * ONE definition shared by [[canonicalize]] and [[host]], so the
    * dedup identity and the per-domain cap can never disagree about what
    * the host of a URL is. Userinfo (`user:pass@`) is dropped: the same
    * page crawled with and without credentials is the same page, and
    * leaving it in would both split the domain key and leak credentials
    * into canonical identities.
    */
  private def authorityHostPort(url: Column): Column =
    lower(regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^[^@]*@", ""))

  /** Canonical form of `url` (see object doc). Rows that do not look like
    * an absolute `scheme://…` URL canonicalize to NULL — the quarantine
    * convention: filter `canonical IS NULL` to audit them, never a throw
    * mid-corpus.
    */
  def canonicalize(url: Column): Column =
    canonicalize(url, defaultTrackingParams)

  /** [[canonicalize]] with a caller-chosen tracking-parameter list (same
    * `*`-suffix prefix convention as [[defaultTrackingParams]]; pass
    * `Nil` to strip nothing and only normalize case/port/path/order).
    */
  def canonicalize(url: Column, trackingParams: Seq[String]): Column = {
    val trackingParam = trackingRegex(trackingParams)
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = authorityHostPort(noFrag)
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val afterHost = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val rawPath = regexp_extract(afterHost, "^([^?]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(afterHost, "^[^?]*\\?(.*)$", 1)
    val kept = array_sort(filter(
      split(query, "&"),
      p => !(p.rlike(trackingParam)) && p =!= ""))
    val queryPart = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(scheme === "" || hostPort === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, queryPart))
  }

  /** Lowercased host of an absolute URL, userinfo and ports stripped —
    * the DOMAIN identity for per-source quotas: feed this to
    * [[Partitioning.sampleNPerKey]] to cap docs per site, or to
    * [[Frequency]]/[[Ranking.vocabStats]] for per-domain statistics.
    * Non-absolute rows are NULL (same quarantine as [[canonicalize]]).
    */
  def host(url: Column): Column = {
    val noPort = regexp_replace(authorityHostPort(url), ":[0-9]+$", "")
    when(noPort === "", lit(null).cast("string")).otherwise(noPort)
  }

  /** One row per canonical URL: the keeper (minimum `idCol` — the usual
    * earliest-crawl winner), the duplicate count, and the canonical
    * string. Unparseable rows (canonical NULL) are EXCLUDED — they have
    * no identity to merge on; recover them via [[canonicalize]]'s NULL
    * quarantine. Exactly one hash exchange on the canonical key, partial
    * aggregation map-side — the A2 exact-dedup shape.
    *
    * `trackingParams` is the merge aggressiveness knob: every stripped
    * parameter widens the set of URLs that collapse to one keeper, and a
    * semantic parameter in the list (the bare-`ref` hazard —
    * [[defaultTrackingParams]]) DROPS distinct pages, not just noise.
    */
  def dedupByCanonical(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      trackingParams: Seq[String] = defaultTrackingParams): DataFrame =
    df.select(canonicalize(col(urlCol), trackingParams).as("canonical_url"), col(idCol))
      .where(col("canonical_url").isNotNull)
      .groupBy("canonical_url")
      .agg(
        min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_dups"))

  /** URI path of an absolute URL, query and fragment excluded; empty
    * path normalizes to `/` (RFC 3986 — a request for `http://h` is a
    * request for `/`). Non-absolute rows are NULL (the [[canonicalize]]
    * quarantine). Robots rules match against [[pathQuery]], not this.
    */
  def path(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(host(url).isNull, lit(null).cast("string"))
      .otherwise(when(p === "", lit("/")).otherwise(p))
  }

  /** [[path]] plus the query string (`?…`, fragment excluded) — the
    * string robots rules actually match against: RFC 9309's match
    * target is path-and-query, so a rule like `Disallow: /search?q=`
    * (or an anchored `/p/1$` against a URL that carries a query) must
    * see the query or it can never fire.
    */
  def pathQuery(url: Column): Column =
    when(host(url).isNull, lit(null).cast("string"))
      .otherwise(concat(
        path(url),
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*(\\?[^#]*)", 1)))

  /** Regex whitespace trim — Spark's `trim()` strips only ASCII space
    * 0x20 (SPARK-17299), which leaves `\r` on CRLF-split lines and
    * `\n`/`\t` padding inside pretty-printed XML; every parser in this
    * module trims with THIS.
    */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** ROBOTS-EXCLUSION compliance filter (RFC 9309 — the Robots Exclusion
    * Protocol, public spec; rule semantics restated): given a parsed
    * rules table `(host, path_prefix, allow)`, annotate every URL with
    * the verdict of its MOST SPECIFIC matching rule — longest matching
    * prefix wins, and on equal length `allow` beats `disallow`
    * (§2.2.2). A host with no matching rule (or no rules at all) is
    * allowed: REP is opt-out. Output: the input plus `allowed` and the
    * winning `matched_prefix` (NULL when the default-allow fired).
    * Unparseable URLs (NULL host) quarantine as `allowed = false` with
    * NULL prefix — a crawler that cannot tell which host a URL belongs
    * to cannot claim permission for it.
    *
    * Scale contract: rules aggregate to ONE row per host holding its
    * precedence-sorted rule array (robots tables are MB-scale against a
    * 100 TB corpus), and that per-host table broadcasts — the corpus
    * side is a zero-shuffle projection: broadcast hash join + an array
    * scan per row, no exchange, no window. Precedence is baked into the
    * array ORDER at build time (sort by (−len, allow-first, prefix) —
    * a total order, so ties replay identically), making the per-row
    * verdict "first matching element".
    */
  def robotsFilter(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame,
      hostCol: String = "host",
      prefixCol: String = "path_prefix",
      allowCol: String = "allow"): DataFrame = {
    Seq("allowed", "matched_prefix").foreach { c =>
      require(!urls.columns.contains(c),
        s"input already has a '$c' column — rename it before filtering")
    }
    val ruleRec = struct(
      (-length(col(prefixCol))).as("neg_len"),
      when(col(allowCol), lit(0)).otherwise(lit(1)).as("disallow_rank"),
      col(prefixCol).as("prefix"),
      col(allowCol).as("allow"))
    val perHost = rules
      .filter(col(hostCol).isNotNull && col(prefixCol).isNotNull &&
        col(allowCol).isNotNull)
      .groupBy(col(hostCol).as("__rhost"))
      .agg(sort_array(collect_list(ruleRec)).as("__rules"))
    val urlHost = host(col(urlCol))
    val target = pathQuery(col(urlCol)) // RFC 9309 match target: path AND query
    urls
      .join(broadcast(perHost), urlHost === col("__rhost"), "left")
      .withColumn("__m",
        filter(col("__rules"), r => target.startsWith(r.getField("prefix"))))
      .withColumn("__win",
        when(coalesce(size(col("__m")), lit(0)) > 0, element_at(col("__m"), 1)))
      .withColumn("allowed",
        when(urlHost.isNull, lit(false))
          .otherwise(coalesce(col("__win.allow"), lit(true))))
      .withColumn("matched_prefix", col("__win.prefix"))
      .drop("__rhost", "__rules", "__m", "__win")
  }

  /** Parse raw `robots.txt` BODIES into the `(host, path_prefix, allow)`
    * rules table [[robotsFilter]] consumes — the missing link between a
    * crawl dump (which contains the robots fetches) and compliance
    * verdicts. Implements RFC 9309's group model for one crawler
    * identity `userAgent`:
    *
    *   - lines strip `#` comments and whitespace; `key: value` splits on
    *     the FIRST colon; keys are case-insensitive;
    *   - consecutive `User-agent` lines open ONE group that owns the
    *     `Allow`/`Disallow` lines after them; rules before any group are
    *     invalid and dropped;
    *   - group selection is most-specific-only: if ANY group in the file
    *     names `userAgent` (case-insensitive), exactly those groups
    *     apply; otherwise the `*` groups; otherwise no rules (default
    *     allow downstream);
    *   - empty rule values are no-ops (`Disallow:` = disallow nothing);
    *   - a TRAILING `*` is prefix-equivalent and stripped; rules still
    *     containing `*` or `$` (mid-path wildcards / end anchors) are
    *     EXCLUDED — [[robotsFilter]]'s matcher is prefix-only by
    *     contract, and silently treating a wildcard pattern as a
    *     literal prefix would claim permission the site never granted.
    *     Corpora where such rules matter need a wildcard matcher, not a
    *     quiet reinterpretation.
    *
    * Output: `(host, path_prefix, allow)`, distinct. Scale shape: one
    * explode over lines, two HOST-partitioned windows (group numbering
    * rides lag + running sum — never a global window), one host+group
    * join; robots bodies are KB each, so everything is proportional to
    * the robots corpus, not the page corpus.
    */
  def parseRobots(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      userAgent: String): DataFrame =
    selectedRuleLines(robots, hostCol, bodyCol, userAgent)
      .withColumn("path_prefix", regexp_replace(col("value"), "\\*$", ""))
      .filter(!col("path_prefix").rlike("[*$]"))
      .select(col("host"), col("path_prefix"), col("allow"))
      .distinct()

  /** [[parseRobots]] without the prefix-only reduction: rule values
    * survive VERBATIM as `rule_path` (wildcards, anchors and all) for
    * [[robotsFilterWildcard]]'s full RFC 9309 matcher. The distinct
    * column name is deliberate — a raw pattern fed to the prefix-only
    * [[robotsFilter]] would match as a literal and claim permission the
    * site never granted.
    */
  def parseRobotsRaw(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      userAgent: String): DataFrame =
    selectedRuleLines(robots, hostCol, bodyCol, userAgent)
      .select(col("host"), col("value").as("rule_path"), col("allow"))
      .distinct()

  /** Shared group-model front half of the robots parsers: line split,
    * comment strip, group numbering, most-specific group selection —
    * emits `(host, value, allow)` for the selected groups' non-empty
    * rule lines.
    */
  private def selectedRuleLines(
      robots: DataFrame,
      hostCol: String,
      bodyCol: String,
      userAgent: String): DataFrame = {
    require(userAgent.nonEmpty && userAgent != "*",
      "userAgent must be a concrete crawler identity; '*' groups apply as the fallback automatically")
    import org.apache.spark.sql.expressions.Window
    val ua = userAgent.toLowerCase
    val lines = robots
      .filter(col(hostCol).isNotNull && col(bodyCol).isNotNull)
      .select(
        col(hostCol).as("host"),
        // \r?\n: real robots.txt is routinely CRLF, and Spark's trim()
        // would NOT remove a stray \r (it strips 0x20 only)
        posexplode(split(col(bodyCol), "\r?\n")).as(Seq("idx", "raw")))
      .withColumn("clean", wsTrim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(col("clean") =!= "")
      .withColumn("key", lower(wsTrim(regexp_extract(col("clean"), "^([^:]+):", 1))))
      .withColumn("value", wsTrim(regexp_extract(col("clean"), "^[^:]*:(.*)$", 1)))
    val w = Window.partitionBy("host").orderBy("idx")
    val grouped = lines
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("gid",
        sum(when(col("is_ua") &&
          !coalesce(lag(col("is_ua"), 1).over(w), lit(false)), 1L)
          .otherwise(0L)).over(w))
      .filter(col("gid") > 0L)
    val groups = grouped
      .filter(col("is_ua"))
      .groupBy("host", "gid")
      .agg(
        max(when(lower(col("value")) === ua, true).otherwise(false)).as("named"),
        max(when(col("value") === "*", true).otherwise(false)).as("star"))
      .withColumn("has_named",
        max(col("named")).over(Window.partitionBy("host")))
      .filter(col("named") || (col("star") && !col("has_named")))
      .select("host", "gid")
    grouped
      .filter(col("key").isin("allow", "disallow") && col("value") =!= "")
      .join(groups, Seq("host", "gid"))
      .select(col("host"), col("value"), (col("key") === "allow").as("allow"))
  }

  /** Full RFC 9309 matcher over RAW robots rule patterns — `*` matches
    * any character run, a TRAILING `$` anchors the end, everything else
    * is literal; without `$` the rule is a prefix pattern. Precedence is
    * the spec's most-octets rule generalized the same way as
    * [[robotsFilter]]: longest RAW rule string wins, `allow` beats
    * `disallow` on equal length, no match → allowed, NULL host →
    * quarantined disallowed. Output schema matches [[robotsFilter]] with
    * `matched_rule` in place of `matched_prefix`.
    *
    * Each rule translates ONCE (at per-host aggregation time) to an
    * anchored regular expression — metacharacters quoted, `*` → `.*` —
    * and rows test `regexp_like` against their host's pre-sorted rule
    * array. Same zero-corpus-shuffle broadcast shape as the prefix
    * matcher, but each row pays regex evaluation per candidate rule:
    * keep the prefix matcher for the bulk corpus and reserve this for
    * hosts whose robots actually use wildcards (parseRobots vs
    * parseRobotsRaw splits exactly that way).
    */
  def robotsFilterWildcard(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame,
      hostCol: String = "host",
      ruleCol: String = "rule_path",
      allowCol: String = "allow"): DataFrame = {
    Seq("allowed", "matched_rule").foreach { c =>
      require(!urls.columns.contains(c),
        s"input already has a '$c' column — rename it before filtering")
    }
    val raw = col(ruleCol)
    val anchored = raw.endsWith("$")
    val core = when(anchored, raw.substr(lit(1), length(raw) - 1)).otherwise(raw)
    val quoted = regexp_replace(core, "([.^$+?(){}\\[\\]\\\\|])", "\\\\$1")
    val rx = concat(
      lit("^"),
      regexp_replace(quoted, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    val ruleRec = struct(
      (-length(raw)).as("neg_len"),
      when(col(allowCol), lit(0)).otherwise(lit(1)).as("disallow_rank"),
      raw.as("rule"),
      rx.as("rx"),
      col(allowCol).as("allow"))
    val perHost = rules
      .filter(col(hostCol).isNotNull && raw.isNotNull && col(allowCol).isNotNull)
      .groupBy(col(hostCol).as("__rhost"))
      .agg(sort_array(collect_list(ruleRec)).as("__rules"))
    val urlHost = host(col(urlCol))
    val target = pathQuery(col(urlCol)) // RFC 9309 match target: path AND query
    urls
      .join(broadcast(perHost), urlHost === col("__rhost"), "left")
      .withColumn("__m",
        filter(col("__rules"), r => regexp_like(target, r.getField("rx"))))
      .withColumn("__win",
        when(coalesce(size(col("__m")), lit(0)) > 0, element_at(col("__m"), 1)))
      .withColumn("allowed",
        when(urlHost.isNull, lit(false))
          .otherwise(coalesce(col("__win.allow"), lit(true))))
      .withColumn("matched_rule", col("__win.rule"))
      .drop("__rhost", "__rules", "__m", "__win")
  }

  /** Parse sitemap XML bodies into discovered URLs — the other half of
    * the crawl-frontier handshake (sitemaps.org protocol, public spec):
    * robots says where a crawler may NOT go, the sitemap says where the
    * site WANTS it to go. Extraction is deliberately regex-scoped
    * rather than a full XML parse: each `<url>…</url>` block yields its
    * `<loc>` (required — blocks without one are dropped) and optional
    * `<lastmod>` (NULL when absent), whitespace-trimmed, entity-decoded
    * for the five XML built-ins (`&amp;` MUST decode in URLs — query
    * separators arrive escaped in conformant sitemaps). `(?s)` scoping
    * keeps multi-line blocks intact.
    *
    * One explode per sitemap, zero shuffles; bodies are capped at 50 MB
    * by the protocol, so per-row work is bounded by spec.
    */
  def parseSitemap(
      sitemaps: DataFrame,
      hostCol: String,
      bodyCol: String): DataFrame =
    sitemapBlocks(sitemaps, hostCol, bodyCol, "url")

  /** Shared `<loc>`/`<lastmod>` extraction over the given block tag —
    * [[parseSitemap]] reads `<url>` blocks, [[parseSitemapIndex]] reads
    * `<sitemap>` blocks, identical semantics otherwise.
    */
  private def sitemapBlocks(
      df: DataFrame, hostCol: String, bodyCol: String, tag: String): DataFrame = {
    def decodeEntities(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        c, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&apos;", "'"), "&amp;", "&")
    val blocks = regexp_extract_all(
      col(bodyCol), lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))
    df
      .filter(col(hostCol).isNotNull && col(bodyCol).isNotNull)
      .select(col(hostCol).as("host"), explode(blocks).as("__b"))
      .select(
        col("host"),
        decodeEntities(wsTrim(regexp_extract(col("__b"), "(?s)<loc>(.*?)</loc>", 1)))
          .as("url"),
        when(regexp_extract(col("__b"), "(?s)<lastmod>(.*?)</lastmod>", 1) === "",
          lit(null).cast("string"))
          .otherwise(wsTrim(regexp_extract(col("__b"), "(?s)<lastmod>(.*?)</lastmod>", 1)))
          .as("lastmod"))
      .filter(col("url") =!= "")
  }

  /** Resolve a URI reference against a base URL — RFC 3986 §5 (the
    * merge + dot-segment-removal algorithm, restated for the cases a
    * crawler meets). Returns the ABSOLUTE target, fragment stripped:
    *
    *   - absolute refs (`scheme://…`) pass through;
    *   - protocol-relative `//host/…` take the base's scheme;
    *   - root-relative `/…` replace the base path;
    *   - query-only `?…` replace the base query;
    *   - fragment-only (`#…`) and empty refs resolve to NULL — a link
    *     to the same document is not a frontier edge;
    *   - everything else merges with the base DIRECTORY and runs
    *     dot-segment removal (`./` dropped, `segment/../` collapsed —
    *     a bounded 16-round fold, so ≥16 levels of adversarial `..`
    *     nesting leave residual dots rather than loop; `..` above the
    *     root clamps to the root per spec).
    *
    * Pure codegen'd string projection, zero shuffle, NULL-quarantining
    * like the rest of this module (non-absolute base → NULL).
    */
  def resolve(base: Column, ref: Column): Column = {
    val r = regexp_replace(wsTrim(ref), "#.*$", "")
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath = path(base)
    val baseDir = regexp_replace(basePath, "/[^/]*$", "/")
    def removeDots(p: Column): Column =
      aggregate(sequence(lit(1), lit(16)), p, (acc, _) => {
        val noCur = regexp_replace(regexp_replace(acc, "/\\./", "/"), "/\\.$", "/")
        val noUp = regexp_replace(noCur,
          // a parent-collapse must not consume a '..' segment itself
          "/(?!\\.\\.(?:/|$))[^/]+/\\.\\.(/|$)", "/")
        regexp_replace(noUp, "^/\\.\\.(/|$)", "/") // '..' above root clamps
      })
    when(base.isNull || origin === "" || r.isNull, lit(null).cast("string"))
      .when(r === "", lit(null).cast("string"))
      // ANY ref with a scheme component is absolute (RFC 3986 §4.1) —
      // not just scheme://: mailto:/javascript:/tel: refs merged as
      // relative paths would mint fake crawlable URLs
      .when(r.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), r)
      .when(r.startsWith("//"), concat(scheme, lit(":"), r))
      .when(r.startsWith("/"), concat(origin, removeDots(r)))
      .when(r.startsWith("?"), concat(origin, basePath, r))
      .otherwise(concat(origin, removeDots(concat(baseDir, r))))
  }

  /** Extract and resolve the hyperlinks of an HTML-ish text column: every
    * `href="…"` / `href='…'` value resolves against `baseCol` via
    * [[resolve]]; fragment-only and unresolvable refs drop. Output:
    * `(idCol, link)`, one row per surviving link — the raw edge list of
    * the crawl link graph ([[graft.operators.Graphs.pageRankInt]]'s
    * food). One explode, zero shuffles.
    */
  def resolveLinks(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      baseCol: String): DataFrame = {
    val refs = concat(
      regexp_extract_all(col(htmlCol), lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1)),
      regexp_extract_all(col(htmlCol), lit("(?i)href\\s*=\\s*'([^']*)'"), lit(1)))
    docs
      .filter(col(htmlCol).isNotNull)
      .select(col(idCol), col(baseCol).as("__base"), explode(refs).as("__ref"))
      .select(col(idCol), resolve(col("__base"), col("__ref")).as("link"))
      // the frontier is an http(s) graph: resolve passes mailto:/tel:/
      // javascript: refs through as the absolute URIs they are (RFC 3986
      // §4.1), and those are dropped HERE, not mangled into fake paths
      .filter(col("link").isNotNull && col("link").rlike("^https?://"))
  }

  /** POLITENESS schedule for a crawl frontier: one fetch queue per host
    * (the unit politeness is owed to), FIFO by `(priority, url)` — the
    * url tie-break keeps equal priorities a total order, so the
    * schedule is byte-reproducible — with each host's queue spaced
    * `perHostDelaySec` apart and hosts routed to `workers` fetchers by
    * a stable hash (the md5 bridge, so an external engine reproduces
    * the routing). Output: input plus `host`, `worker`, `slot` (1-based
    * position in the host's queue), `eta_sec = (slot−1)·delay` — the
    * earliest polite fetch time relative to queue start. NULL-host rows
    * are dropped: un-routable URLs have no queue to wait in (recover
    * them via [[canonicalize]]'s NULL quarantine first).
    *
    * URLs must be UNIQUE within a host — schedule the output of
    * [[dedupByCanonical]], not a raw frontier: rows tying on the whole
    * `(priority, url)` key would take engine-arbitrary slots, and a
    * frontier that fetches the same URL twice is the bug dedup exists
    * to remove (caught by q150's oracle when tried against the raw
    * colliding corpus).
    *
    * Scale shape: ONE exchange on host (the window key — per-host
    * partitions, never a global sort); worker assignment is a pure
    * projection. Host-level skew (one giant site) is inherent to
    * politeness itself — a million-page host IS one serial queue, and
    * its `eta_sec` tail says so honestly rather than hiding it.
    */
  def frontierSchedule(
      urls: DataFrame,
      urlCol: String,
      priorityCol: String,
      workers: Int,
      perHostDelaySec: Long): DataFrame = {
    require(workers > 0, "workers must be positive")
    require(perHostDelaySec >= 0, "perHostDelaySec must be non-negative")
    Seq("host", "worker", "slot", "eta_sec").foreach { c =>
      require(!urls.columns.contains(c),
        s"input already has a '$c' column — rename it before scheduling")
    }
    import org.apache.spark.sql.expressions.Window
    val h = host(col(urlCol))
    // NULL priority fails per row: engines disagree on NULL sort position
    // (Spark first, DuckDB last), so a NULL would silently break the
    // byte-reproducible-schedule contract (the curriculumSchedule rule)
    val prio = when(col(priorityCol).isNull,
      raise_error(concat(
        lit("frontierSchedule: NULL priority for url "), col(urlCol)))
        .cast(urls.schema(priorityCol).dataType))
      .otherwise(col(priorityCol))
    val w = Window.partitionBy("host").orderBy(prio, col(urlCol))
    urls
      .withColumn("host", h)
      .filter(col("host").isNotNull)
      .withColumn("worker",
        (conv(substring(md5(col("host")), 1, 12), 16, 10).cast("long") % workers)
          .cast("int"))
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("eta_sec", (col("slot") - 1L) * perHostDelaySec)
  }

  /** Parse sitemap INDEX bodies (`<sitemapindex>` of `<sitemap>` blocks —
    * how a site larger than the 50k-URL/50MB per-file cap ships its URL
    * set): same extraction contract as [[parseSitemap]] — required
    * `<loc>`, optional `<lastmod>`, regex trim, entity decode — but the
    * output URLs are FURTHER SITEMAPS to fetch, not pages. Chain:
    * index → fetch children → [[parseSitemap]] → frontier.
    */
  def parseSitemapIndex(
      indexes: DataFrame,
      hostCol: String,
      bodyCol: String): DataFrame =
    sitemapBlocks(indexes, hostCol, bodyCol, "sitemap")
      .withColumnRenamed("url", "sitemap_url")

  /** Per-DOMAIN quality report — the C4/RefinedWeb curation move: judge
    * sites, not just documents (a spam domain's individually-plausible
    * pages evade per-doc filters; its aggregate gives it away). One
    * host-keyed exchange over `(host, n_docs, score_sum, blocked)`;
    * `blocked` = the host has ≥ `minDocs` scored docs AND mean score
    * < `minMeanNum / minMeanDen` — evaluated as the EXACT rational
    * comparison `score_sum · den < num · n_docs` in decimal(38,0), no
    * float mean, no division (a mean threshold as a double would make
    * block decisions order-dependent at the boundary). `minDocs` is the
    * evidence floor: a 2-doc domain's mean is noise, not a verdict.
    * Integral scores only (the quantileNormalize precondition — quantize
    * first); NULL-score docs carry no evidence and NULL-host docs have
    * no domain, both excluded from the report.
    */
  def domainQualityReport(
      docs: DataFrame,
      urlCol: String,
      scoreCol: String,
      minMeanNum: Long,
      minMeanDen: Long = 1L,
      minDocs: Long = 2L): DataFrame = {
    require(minMeanDen > 0L, "threshold denominator must be positive")
    require(minDocs >= 1L, "minDocs must be at least 1")
    docs.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"domainQualityReport needs an INTEGRAL score column (got $scoreCol: " +
          s"${other.catalogString}); quantize first, e.g. floor(score * 1000)")
    }
    docs
      .select(host(col(urlCol)).as("host"), col(scoreCol).cast("long").as("__s"))
      .where(col("host").isNotNull && col("__s").isNotNull)
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), sum(col("__s")).as("score_sum"))
      .withColumn("blocked",
        col("n_docs") >= minDocs &&
          col("score_sum").cast("decimal(38,0)") * lit(minMeanDen) <
            col("n_docs").cast("decimal(38,0)") * lit(minMeanNum))
  }

  /** Drop every document whose domain [[domainQualityReport]] blocks —
    * the blocklist application face. The blocklist is host-cardinality
    * (broadcast by hint); docs with an unparseable URL are KEPT (no
    * domain evidence is not negative evidence — quarantine them via
    * [[canonicalize]]'s NULL stream if they need separate handling), as
    * are docs on domains below the evidence floor.
    */
  def filterByDomainQuality(
      docs: DataFrame,
      urlCol: String,
      scoreCol: String,
      minMeanNum: Long,
      minMeanDen: Long = 1L,
      minDocs: Long = 2L): DataFrame = {
    val blocked = domainQualityReport(docs, urlCol, scoreCol, minMeanNum, minMeanDen, minDocs)
      .where(col("blocked"))
      .select(col("host").as("__blocked_host"))
    docs.join(
      broadcast(blocked),
      host(col(urlCol)) === col("__blocked_host"),
      "left_anti")
  }
}
