package graft

import graft.operators.WebArchive
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC ingest kernel (r13): round-trip over the deterministic fixture,
  * gzip member handling, and the total-function posture on malformed
  * bytes. The x121/x122 driver gates prove the full-corpus round trip
  * against DuckDB; these specs pin the byte-level edges the gates can't
  * reach (corrupt files, plain vs gzip, foreign record ids). */
class WebArchiveSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (2L, "http://a.com/x", "two body with some words here"),
    (1L, "http://b.org/y", "one body\nwith a newline and ünïcode"),
    (50L, "http://c.net/z", "this text is replaced by the 404 body"),
    (7L, "http://d.ac.jp/w", "seven"))
    .toDF("doc_id", "url", "text")

  test("round trip: parse(synthesize(docs)) recovers ids, urls, dates, bodies") {
    val parsed = WebArchive.responses(WebArchive.synthesizeWarc(corpus))
      .orderBy("record_id").collect()
    assert(parsed.length === 4)
    val byId = parsed.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getString(1) === "http://a.com/x")
    assert(byId(2L).getInt(3) === 200)
    assert(byId(2L).getString(5) === "two body with some words here")
    // UTF-8 body survives the byte round trip exactly
    assert(byId(1L).getString(5) === "one body\nwith a newline and ünïcode")
    // 404 substitution: status + error body, original text gone
    assert(byId(50L).getInt(3) === 404)
    assert(byId(50L).getString(5) === "not found")
    // deterministic date arithmetic
    assert(byId(7L).getString(2) === WebArchive.synthWarcDate(7L))
    assert(byId(7L).getString(2) === "2024-01-08T07:49:31Z")
    assert(parsed.forall(_.getString(4) === WebArchive.SynthMime))
  }

  test("record mix: warcinfo + request + response all scan; only responses surface") {
    val all = WebArchive.parseWarc(WebArchive.synthesizeWarc(corpus)).collect()
    val byType = all.groupBy(_.warc_type).map { case (k, v) => k -> v.length }
    // one warcinfo per file (partition count may vary), 4 requests, 4 responses
    assert(byType("request") === 4 && byType("response") === 4)
    assert(byType.getOrElse("warcinfo", 0) >= 1)
    assert(all.forall(_.ok))
    // request records carry the numeric id too (urn:graft:req:N)
    assert(all.filter(_.warc_type == "request").map(_.record_id).sorted.toSeq
      === Seq(1L, 2L, 7L, 50L))
  }

  test("gzip members: payload is multi-member gzip; plain mode parses identically") {
    // Par.widen may spread the 4 docs over several files; every file is
    // warcinfo + (request+response) per doc = at least 3 gzip members
    val files = WebArchive.synthesizeWarc(corpus).select("payload")
      .collect().map(_.getAs[Array[Byte]](0))
    assert(files.nonEmpty)
    files.foreach { gz =>
      assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte)
      val magics = gz.indices.count(i =>
        i + 1 < gz.length && gz(i) == 0x1f.toByte && gz(i + 1) == 0x8b.toByte)
      assert(magics >= 3, s"expected one gzip member per record, found $magics")
    }
    val plain = WebArchive.responses(
      WebArchive.synthesizeWarc(corpus, gzipMembers = false))
      .orderBy("record_id").collect().map(r => (r.getLong(0), r.getString(5)))
    val zipped = WebArchive.responses(WebArchive.synthesizeWarc(corpus))
      .orderBy("record_id").collect().map(r => (r.getLong(0), r.getString(5)))
    assert(plain.toSeq === zipped.toSeq)
  }

  test("malformed bytes never throw: ok=false row, scan stops, earlier records kept") {
    // one hand-assembled plain file (partitioning-independent): 3 docs
    val good = WebArchive.synthRecordPair(2L, "http://a.com/x", "alpha beta") ++
      WebArchive.synthRecordPair(7L, "http://d.ac.jp/w", "gamma delta") ++
      WebArchive.synthRecordPair(9L, "http://e.com/q", "epsilon")
    // corrupt the tail: truncate mid-record so the last Content-Length lies
    val truncated = good.take(good.length - 20).toArray
    val rows = WebArchive.parseWarc(
      Seq(("t.warc", truncated)).toDF("warc_file", "payload")).collect()
    assert(rows.exists(!_.ok), "expected a malformed marker row")
    assert(rows.count(r => r.ok && r.warc_type == "response") === 2,
      "records before the corruption must survive")
    // garbage that is not WARC at all
    val junk = WebArchive.parseWarc(
      Seq(("j.warc", "HELLO WORLD\r\nnot a warc".getBytes("UTF-8")))
        .toDF("warc_file", "payload")).collect()
    assert(junk.length === 1 && !junk.head.ok &&
      junk.head.warc_type.startsWith("malformed:version"))
    // corrupt gzip header (magic present, stream broken)
    val badGz = Array[Byte](0x1f.toByte, 0x8b.toByte, 9, 9, 9, 9, 9, 9)
    val gzRows = WebArchive.parseWarc(
      Seq(("g.warc.gz", badGz)).toDF("warc_file", "payload")).collect()
    assert(gzRows.length === 1 && !gzRows.head.ok &&
      gzRows.head.warc_type.startsWith("malformed:gzip"))
  }

  test("foreign record ids degrade to -1; null payload yields no rows") {
    val rec =
      "WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:uuid:ab-12-cd>\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n"
    val rows = WebArchive.parseWarc(
      Seq(("f.warc", rec.getBytes("UTF-8"))).toDF("warc_file", "payload")).collect()
    assert(rows.length === 1 && rows.head.ok && rows.head.record_id === -1L &&
      rows.head.text === "hi")
    val nul = WebArchive.parseWarc(
      Seq(("n.warc", null.asInstanceOf[Array[Byte]]))
        .toDF("warc_file", "payload")).collect()
    assert(nul.isEmpty)
  }
}
