package graft

import graft.operators.{Dedup, UrlCuration}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL/domain curation semantics (M4 round 12): every canonical component
  * of the synthetic fixture is pure doc_id arithmetic, so these specs (and
  * the q129/q130/x114 oracles) derive the EXPECTED form independently of
  * the normalizer chain under test. */
class UrlCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private lazy val docs: DataFrame = TestSpark.session.catalog.relation("documents")

  test("normalizeUrl(synthUrl) equals the arithmetic canonical form on 600 ids") {
    val ids = spark.range(0, 600).toDF("id")
    val bad = ids.select(
        UrlCuration.normalizeUrl(UrlCuration.synthUrl(col("id"))).as("got"),
        UrlCuration.synthCanonicalUrl(col("id")).as("want"))
      .where(col("got") =!= col("want"))
    assert(bad.count() === 0L)
  }

  test("host and registered domain match their arithmetic derivations") {
    val ids = spark.range(0, 600).toDF("id")
    val u = UrlCuration.synthUrl(col("id"))
    val bad = ids.select(
        UrlCuration.canonicalHost(u).as("h"),
        UrlCuration.synthHost(col("id")).as("hw"),
        UrlCuration.registeredDomain(u).as("d"),
        UrlCuration.synthDomain(col("id")).as("dw"))
      .where(col("h") =!= col("hw") || col("d") =!= col("dw"))
    assert(bad.count() === 0L)
  }

  test("normalization families: case, ports, www, tracking, fragment, slash") {
    val cases = Seq(
      // lowercase scheme+authority, path case preserved
      ("HTTP://WWW.Example.COM/Path/X", "http://example.com/Path/X"),
      // default port stripped per scheme; non-default kept
      ("https://a.com:443/x", "https://a.com/x"),
      ("http://a.com:80/x", "http://a.com/x"),
      ("http://a.com:8080/x", "http://a.com:8080/x"),
      ("https://a.com:80/x", "https://a.com:80/x"), // 80 is not https's default
      // tracking-only query drops the '?'; mixed query keeps the rest
      ("http://a.com/x?utm_source=s&fbclid=1", "http://a.com/x"),
      ("http://a.com/x?a=1&utm_medium=m&b=2", "http://a.com/x?a=1&b=2"),
      // ref= is tracking, but prefix matches must not overreach: refid= kept
      ("http://a.com/x?ref=tw&refid=7", "http://a.com/x?refid=7"),
      // fragment stripped even when it contains a '?'
      ("http://a.com/x#frag?notquery", "http://a.com/x"),
      // trailing slashes collapse; root path becomes empty
      ("http://a.com/x///", "http://a.com/x"),
      ("http://a.com/", "http://a.com"),
      // non-URL strings pass through untouched
      ("not a url", "not a url"),
      ("", ""))
    val out = cases.toDF("url", "want")
      .select(UrlCuration.normalizeUrl(col("url")).as("got"), col("want"), col("url"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"url=${r.getString(2)}"))
  }

  test("null url normalizes to null, host/domain of non-urls are empty") {
    val d = Seq[(java.lang.Long, String)]((1L, null), (2L, "plain text"))
      .toDF("id", "url")
    val rows = d.select(UrlCuration.normalizeUrl(col("url")).as("n"),
        UrlCuration.canonicalHost(col("url")).as("h"),
        UrlCuration.registeredDomainOfHost(
          UrlCuration.canonicalHost(col("url"))).as("dom"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getString(1) === "")
  }

  test("registeredDomain: PSL two-level suffixes, bare hosts, deep subdomains") {
    val cases = Seq(
      ("http://blog.site.co.uk/x", "site.co.uk"),
      ("http://a.b.c.site.ac.jp/x", "site.ac.jp"),
      ("http://blog.site.com/x", "site.com"),
      ("http://www.site.org/x", "site.org"), // www stripped before domain
      ("http://site.net/x", "site.net"),
      ("http://localhost/x", "localhost"))
    cases.toDF("url", "want")
      .select(UrlCuration.registeredDomain(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("userinfo in the authority never pollutes host/domain/canonical form") {
    // the adversarial crawl-hygiene case: 'trusted.com@evil.net' must
    // resolve to evil.net (blocklist evasion otherwise), and the
    // canonical form drops the userinfo so dedup keys match
    val cases = Seq(
      ("http://trusted.com@evil.net/x",
        "evil.net", "evil.net", "http://evil.net/x"),
      ("https://user:pw@www.site.co.uk:443/p?utm_x=1",
        "site.co.uk", "site.co.uk", "https://site.co.uk/p"),
      ("http://a@b@site.com/x", // '@' in userinfo: host is after the LAST
        "site.com", "site.com", "http://site.com/x"))
    cases.toDF("url", "wantHost", "wantDom", "wantNorm")
      .select(UrlCuration.canonicalHost(col("url")).as("h"),
        UrlCuration.registeredDomain(col("url")).as("d"),
        UrlCuration.normalizeUrl(col("url")).as("n"),
        col("wantHost"), col("wantDom"), col("wantNorm"))
      .collect()
      .foreach { r =>
        assert(r.getString(0) === r.getString(3), s"host of ${r}")
        assert(r.getString(1) === r.getString(4), s"domain of ${r}")
        assert(r.getString(2) === r.getString(5), s"norm of ${r}")
      }
  }

  test("IP-literal hosts pass through registeredDomain whole") {
    val cases = Seq(
      ("http://192.0.2.1/x", "192.0.2.1"),
      ("http://192.0.2.1:8080/x", "192.0.2.1"),
      ("http://10.0.0.7/x", "10.0.0.7"), // not '0.7'
      ("http://[2001:db8::2]/x", "[2001:db8::2]"),
      ("http://[::1]:8080/x", "[::1]"))
    cases.toDF("url", "want")
      .select(UrlCuration.registeredDomain(col("url")).as("got"), col("want"))
      .collect()
      .foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("urlDedup collapses canonically-equal variants, keeps min id per family") {
    // 3-variant families over the real corpus ids: variant bytes differ
    // (www + fragment / appended tracking param) but canonicalize to the
    // leader's form — the image/audio family-fixture pattern on URLs
    val leader = col("doc_id") - col("doc_id") % 3
    val canon = UrlCuration.synthCanonicalUrl(leader)
    val url = when(col("doc_id") % 3 === 0, canon)
      .when(col("doc_id") % 3 === 1,
        concat(regexp_replace(canon, "://", "://www."),
          lit("#v"), col("doc_id").cast("string")))
      .otherwise(when(instr(canon, "?") > 0, concat(canon, lit("&utm_campaign=y")))
        .otherwise(concat(canon, lit("?utm_source=x"))))
    val d = docs.select(col("doc_id"), url.as("url"))
    val kept = UrlCuration.urlDedup(d, "url", "doc_id")
    val expect = d.groupBy((col("doc_id") - col("doc_id") % 3).as("fam"))
      .agg(min("doc_id").as("doc_id"))
    assert(kept.count() === expect.count())
    assert(kept.join(expect, Seq("doc_id"), "left_anti").count() === 0L)
    // and the survivors carry the canonical url
    assert(kept.where(col("url_norm") =!= UrlCuration.synthCanonicalUrl(
      col("doc_id") - col("doc_id") % 3)).count() === 0L)
  }

  test("domainStats counts docs and distinct hosts per registered domain") {
    val d = UrlCuration.synthUrls(docs)
    val got = UrlCuration.domainStats(d, "url")
    // independent arithmetic recompute: domain = f(id%37, id%5), host adds
    // a blog. subdomain on id%8=0
    val want = docs.select(col("doc_id"),
        UrlCuration.synthDomain(col("doc_id")).as("domain"),
        UrlCuration.synthHost(col("doc_id")).as("host"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("host")).as("n_hosts"))
    assert(got.join(want, Seq("domain"))
      .where(got("n_docs") =!= want("n_docs") || got("n_hosts") =!= want("n_hosts"))
      .count() === 0L)
    assert(got.count() === want.count())
  }

  test("property: normalization is idempotent over 2000 random messy URLs") {
    // canonicalization must be a projection (f∘f = f) — a second pass
    // finding more to strip would mean dedup keys depend on HOW MANY
    // times a pipeline stage ran
    val rnd = new scala.util.Random(20260816L)
    def seg(n: Int) = (1 to n).map(_ =>
      "abcdefghijklmnopqrstuvwxyz0123456789"(rnd.nextInt(36))).mkString
    val urls = (0 until 2000).map { _ =>
      val scheme = Seq("http", "HTTP", "https", "HtTpS", "ftp")(rnd.nextInt(5))
      val www = Seq("", "www.", "WWW.")(rnd.nextInt(3))
      val host = (seg(1 + rnd.nextInt(8)) + "." +
        Seq("com", "org", "co.uk", "ac.jp", "net")(rnd.nextInt(5)))
      val hostCase = if (rnd.nextBoolean()) host.toUpperCase else host
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/", s"/${seg(3)}", s"/${seg(2)}/${seg(4)}///")(rnd.nextInt(4))
      val query = Seq("", s"?q=${seg(2)}", s"?utm_source=${seg(3)}",
        s"?a=1&ref=${seg(2)}&b=2", s"?fbclid=${seg(5)}&gclid=x")(rnd.nextInt(5))
      val frag = Seq("", s"#${seg(3)}", "#?notaquery")(rnd.nextInt(3))
      s"$scheme://$www$hostCase$port$path$query$frag"
    } ++ Seq("", "not a url", "http//missing.colon", "weird:%%%")
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val once = UrlCuration.normalizeUrl(col("url"))
    val bad = df.select(once.as("n1"),
        UrlCuration.normalizeUrl(once).as("n2"), col("url"))
      .where(col("n1") =!= col("n2"))
    assert(bad.count() === 0L,
      bad.limit(3).collect().mkString("; "))
  }

  test("domainDisjointSplit: domains never straddle, fraction tracks pct, deterministic") {
    val d = UrlCuration.synthUrls(docs)
    val s25 = UrlCuration.domainDisjointSplit(d, 25)
    // provenance guarantee: every domain lands wholly on one side
    assert(s25.groupBy("domain")
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1).count() === 0L)
    // the test fraction tracks 25% (domains are the sampling unit — wide
    // tolerance at 185 domains)
    val nd = s25.select("domain").distinct().count().toDouble
    val ndTest = s25.where(col("split") === "test")
      .select("domain").distinct().count().toDouble
    assert(ndTest / nd > 0.10 && ndTest / nd < 0.40, s"test frac ${ndTest / nd}")
    // deterministic across runs; 0 and 100 are total
    val again = UrlCuration.domainDisjointSplit(d, 25)
    assert(s25.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() === 0L)
    assert(UrlCuration.domainDisjointSplit(d, 0)
      .where(col("split") === "test").count() === 0L)
    assert(UrlCuration.domainDisjointSplit(d, 100)
      .where(col("split") === "train").count() === 0L)
  }

  test("domainBlocklistFilter drops exactly the listed domains") {
    val d = UrlCuration.synthUrls(docs)
    val block = Seq("site0.com", "site7.co.uk")
    val out = UrlCuration.domainBlocklistFilter(d, block, "url")
    val expected = docs.where(!UrlCuration.synthDomain(col("doc_id"))
      .isin(block: _*)).count()
    assert(out.count() === expected)
    assert(out.where(UrlCuration.registeredDomain(col("url"))
      .isin(block: _*)).count() === 0L)
  }
}
