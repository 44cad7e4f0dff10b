package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation operators (SURVEY §7.2 M4) — the web-corpus
  * hygiene stage every crawl-derived training set runs before text-level
  * dedup: canonicalize URLs, key documents by registered domain, drop
  * re-crawls of the same page (C4 dedupes exact URLs; RefinedWeb §3.1
  * canonicalizes then dedupes; Dolma/CCNet cap and score per domain).
  *
  * Scale design (the 100 TB contract):
  *  - [[normalizeUrl]] / [[urlHost]] / [[registeredDomain]] are pure
  *    builtin Column chains (regexp_extract / regexp_replace / split /
  *    higher-order filter) — whole-stage codegen'd, no UDFs, embarrassingly
  *    parallel, no shuffle;
  *  - [[urlDedup]] is [[Dedup.exact]] on the canonical form — ONE
  *    hash-partitioned groupBy+semi-join (AQE reuses the exchange);
  *  - [[domainStats]] is one keyed aggregation on the registered domain —
  *    domains are the natural skew unit of a crawl (a few giant hosts), so
  *    the count/sum aggregates here are all partial-aggregatable (map-side
  *    combine absorbs the skew); per-domain CAPS compose with
  *    [[Sampling.capPerGroup]] on the `domain` column this emits.
  *
  * Normalization semantics (deliberately the C4/RefinedWeb canonical
  * subset — documented so the DuckDB oracle can derive the canonical form
  * independently by arithmetic, not by re-running this chain):
  *  1. scheme and authority lowercased (path/query case preserved), any
  *     `userinfo@` prefix dropped from the authority;
  *  2. fragment stripped;
  *  3. default port stripped (`:80` for http, `:443` for https);
  *  4. leading `www.` stripped from the host;
  *  5. tracking query parameters removed (`utm_*`, `fbclid`, `gclid`,
  *     `ref`), the `?` dropped when nothing survives;
  *  6. trailing slashes stripped from the path.
  * Strings with no `scheme://` prefix pass through unchanged (total
  * function — a malformed url never throws, mirroring the media decoders'
  * ok-flag posture).
  */
object UrlCuration {

  private val SchemeRe   = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
  private val HostRe     = "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)"
  private val PathRe     = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)"
  // anchored so a '?' inside the fragment is not mistaken for a query
  private val QueryRe    = "^[^?#]*\\?([^#]*)"
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

  /** Two-level public suffixes recognized by [[registeredDomain]]. A
    * pragmatic constant subset of the PSL (the full list is data, not
    * code — swap in a broadcast lookup to extend); covers the suffix
    * shapes the gates exercise. */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "org.uk", "gov.uk", "co.jp", "ac.jp",
    "com.au", "co.in", "com.br", "co.nz")

  /** Authority with any `userinfo@` prefix removed. RFC 3986 restricts
    * '@' in the authority to the userinfo separator, so stripping up to
    * the LAST '@' is exact — and load-bearing for hygiene: without it,
    * 'http://trusted.com@evil.net/x' reports registered domain
    * 'com@evil.net', letting crafted URLs evade [[domainBlocklistFilter]]
    * and split url-dedup keys. */
  private def dropUserinfo(authority: Column): Column =
    regexp_replace(authority, "^[^/]*@", "")

  /** Lowercased host with userinfo and any port stripped; '' for non-URL
    * strings. Userinfo and port strips ride ONE regexp_replace (they
    * cannot overlap) — these chains inline many times per projection in
    * scalar position, and every saved node keeps the generated code
    * under the 64 KB codegen limit. */
  def urlHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)),
      "^[^/]*@|:[0-9]+$", "")

  /** [[urlHost]] with the leading `www.` stripped — the canonical host
    * [[normalizeUrl]] emits. */
  def canonicalHost(url: Column): Column =
    regexp_replace(urlHost(url), "^www\\.", "")

  /** Registered (pay-level) domain of a host column: one label above the
    * public suffix, with the two-level suffixes in [[TwoLevelSuffixes]]
    * recognized (`blog.site.co.uk` → `site.co.uk`, `blog.site.com` →
    * `site.com`, bare `localhost` → itself). Pure split/element_at
    * arithmetic — codegen'd, no UDF. */
  def registeredDomainOfHost(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last1 = element_at(parts, -1)
    val last2 = element_at(parts, -2)
    val last3 = element_at(parts, -3)
    val suffix2 = concat_ws(".", last2, last1)
    // IP-literal hosts have no registered domain: an IPv4 host must pass
    // through whole ('192.0.2.1', not '2.1' — last-two-octets grouping
    // would merge unrelated IP hosts into one pseudo-domain in
    // domain_stats/blocklists), and bracketed IPv6 likewise. Same
    // PSL-subset pragmatism as [[TwoLevelSuffixes]].
    val isIpLiteral = host.rlike("^(\\[.*|[0-9]+(\\.[0-9]+)*)$")
    when(isIpLiteral, host)
      .when(n >= 3 && suffix2.isin(TwoLevelSuffixes: _*),
        concat_ws(".", last3, last2, last1))
      .when(n >= 2, suffix2)
      .otherwise(host)
  }

  /** Registered domain straight from a url column (canonical host first,
    * so `www.` never leaks into the domain). */
  def registeredDomain(url: Column): Column =
    registeredDomainOfHost(canonicalHost(url))

  /** Canonicalize a url column per the semantics in the object doc. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    // userinfo is dropped from the canonical form (rule 1a): it never
    // names a different resource on the crawl side, and keeping it would
    // let 'http://x@site.com/p' and 'http://site.com/p' dedup apart
    val hostport = lower(dropUserinfo(regexp_extract(url, HostRe, 1)))
    val hostNoPort = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val path = regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    val query = regexp_extract(url, QueryRe, 1)
    val keptQuery = array_join(
      filter(split(query, "&"),
        t => length(t) > 0 && !t.rlike(TrackingRe)),
      "&")
    val rebuilt = concat(scheme, lit("://"), host, path,
      when(keptQuery === "", lit("")).otherwise(concat(lit("?"), keptQuery)))
    when(regexp_extract(url, SchemeRe, 1) === "", url).otherwise(rebuilt)
  }

  /** (id, url_norm, host, domain) per row — the relation the SQL surface
    * `url_normalize(rel)` returns; host/domain derive from the CANONICAL
    * form, so the three columns are mutually consistent. */
  def normalize(df0: DataFrame, urlCol: String = "url",
                idCol: String = "doc_id"): DataFrame = {
    val df = Par.widen(df0, idCol) // r15 opt: same single-split story as urlDedup
    val norm = normalizeUrl(col(urlCol))
    df.select(col(idCol).as("id"), norm.as("url_norm"),
      canonicalHost(col(urlCol)).as("host"),
      registeredDomain(col(urlCol)).as("domain"))
  }

  /** URL-exact dedup: keep the lowest-id row per canonical URL — C4's
    * url-dedup with RefinedWeb's canonicalization in front. Returns the
    * surviving rows of `df` with a `url_norm` column appended. ONE keyed
    * shuffle ([[Dedup.exact]]'s groupBy + semi-join on the same key). */
  def urlDedup(df: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame =
    // r15 opt: widen BELOW the normalizer — the canonicalization kernel
    // (a dozen regexes per row) must not serialize on a one-split scan;
    // no-op when the scan already parallelizes (guide §2.5 input skew)
    Dedup.exact(Par.widen(df, idCol)
        .withColumn("url_norm", normalizeUrl(col(urlCol))),
      Seq("url_norm"), idCol)

  /** Per-registered-domain corpus stats: page count, distinct canonical
    * hosts, mean document length when a `textCol` is present — the
    * domain-level scoreboard curation rules key on (blocklists, per-domain
    * caps, "domain contributes >x% of corpus" audits). One partial-agg
    * shuffle on `domain`. */
  def domainStats(df: DataFrame, urlCol: String = "url",
                  textCol: Option[String] = None): DataFrame = {
    val base = df.withColumn("domain", registeredDomain(col(urlCol)))
      .withColumn("__host", canonicalHost(col(urlCol)))
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      countDistinct(col("__host")).as("n_hosts")) ++
      textCol.map(t => avg(length(col(t))).as("mean_len")).toSeq
    base.groupBy(col("domain")).agg(aggs.head, aggs.tail: _*)
  }

  // ------------------------------------------------------------------
  // deterministic synthetic URLs (gate fixture — the media-synth pattern:
  // every canonical component is pure doc_id arithmetic, so the DuckDB
  // oracle derives the EXPECTED canonical form independently, without
  // re-running the normalizer)
  // ------------------------------------------------------------------

  /** Suffix for a synthetic id: spans one-level and two-level public
    * suffixes so [[registeredDomain]]'s PSL branch is exercised. */
  private def synthTld(id: Column): Column =
    when(id % 5 === 0, "com").when(id % 5 === 1, "org")
      .when(id % 5 === 2, "co.uk").when(id % 5 === 3, "net")
      .otherwise("ac.jp")

  /** The registered domain of [[synthUrl]] — `site{id%37}.{tld}`. */
  def synthDomain(id: Column): Column =
    concat(lit("site"), (id % 37).cast("string"), lit("."), synthTld(id))

  /** The canonical host of [[synthUrl]] — the domain plus a real
    * subdomain on every 8th id (which normalization must KEEP and
    * domain extraction must STRIP). */
  def synthHost(id: Column): Column =
    concat(when(id % 8 === 0, "blog.").otherwise(""), synthDomain(id))

  /** A deterministic messy URL per id: lowercase-canonical core plus the
    * noise families [[normalizeUrl]] must remove — `www.` prefix (id%3=0),
    * full-authority uppercasing (id%9=0), the scheme's default port
    * (id%7=0), a trailing slash (id%4=0), tracking query params
    * (id%6∈{0,1,3}) and a fragment (id%6=4). Pure Column arithmetic —
    * the fixture itself is codegen'd, no UDF. */
  def synthUrl(id: Column): Column = {
    val scheme = when(id % 2 === 0, "https").otherwise("http")
    val auth0 = concat(
      when(id % 3 === 0, "www.").otherwise(""),
      synthHost(id),
      when(id % 7 === 0,
        when(id % 2 === 0, ":443").otherwise(":80")).otherwise(""))
    val auth = when(id % 9 === 0, upper(auth0)).otherwise(auth0)
    val path = concat(lit("/p/"), (id % 11).cast("string"),
      when(id % 4 === 0, "/").otherwise(""))
    val q = (id % 13).cast("string")
    val query =
      when(id % 6 === 0, concat(lit("?utm_source=feed&q="), q, lit("&ref=tw")))
        .when(id % 6 === 1, concat(lit("?q="), q, lit("&utm_campaign=x")))
        .when(id % 6 === 2, concat(lit("?q="), q))
        .when(id % 6 === 3, concat(lit("?fbclid=a"), q))
        .otherwise("")
    val frag = when(id % 6 === 4,
      concat(lit("#sec"), (id % 3).cast("string"))).otherwise("")
    concat(scheme, lit("://"), auth, path, query, frag)
  }

  /** What [[normalizeUrl]] must produce for [[synthUrl]] — the
    * independent arithmetic derivation the specs assert against. */
  def synthCanonicalUrl(id: Column): Column =
    concat(when(id % 2 === 0, "https").otherwise("http"), lit("://"),
      synthHost(id), lit("/p/"), (id % 11).cast("string"),
      when(id % 6 <= 2, concat(lit("?q="), (id % 13).cast("string")))
        .otherwise(""))

  /** (doc_id, url) fixture table over a documents relation. Widened
    * (r15 opt): consumers run url kernels straight over this frame, and a
    * one-split documents scan would serialize them on one core. */
  def synthUrls(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    Par.widen(docs.select(col(idCol)), idCol)
      .select(col(idCol), synthUrl(col(idCol)).as("url"))

  /** Domain-disjoint train/test split — the web-corpus leakage guard:
    * membership is decided per REGISTERED DOMAIN, never per page, so two
    * pages of one site can never straddle the eval boundary (near-dup
    * and templated pages cluster within sites — an id-hashed split leaks
    * them across; [[Sampling.leakageSafeSplit]] closes the same bug by
    * CONTENT, this closes it by PROVENANCE). Assignment is
    * content-addressed on md5 of the domain string with exact integer
    * arithmetic (bucket/65536 < pct/100), so it is engine-portable
    * (DuckDB recomputes the full assignment), deterministic across runs
    * and stable as the corpus grows. Pure projection — no shuffle.
    * Output: input columns + (domain, split). */
  def domainDisjointSplit(df: DataFrame, testPercent: Int,
                          urlCol: String = "url"): DataFrame = {
    require(testPercent >= 0 && testPercent <= 100, "testPercent in [0,100]")
    val domain = registeredDomain(col(urlCol))
    val bucket = conv(substring(md5(domain), 1, 4), 16, 10).cast("long")
    df.withColumn("domain", domain)
      .withColumn("split",
        when(bucket * 100 < lit(testPercent.toLong * 65536L), "test")
          .otherwise("train"))
  }

  /** Drop rows whose registered domain is on a blocklist. The list is a
    * driver-side constant (blocklists are config, thousands of entries at
    * most) — compiled to a codegen'd isin / broadcast-semantics filter,
    * never a shuffle. */
  def domainBlocklistFilter(df: DataFrame, blocklist: Seq[String],
                            urlCol: String = "url"): DataFrame =
    df.where(!registeredDomain(col(urlCol)).isin(blocklist: _*))
}
