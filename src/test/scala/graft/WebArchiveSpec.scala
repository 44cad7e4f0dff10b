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

  // ---- member-offset splitting (r14): one big .warc.gz becomes many
  // byte-range tasks; the split parse must be record-identical to the
  // whole-file parse ----

  private def bigCorpus(n: Int) = spark.range(1, n + 1).selectExpr(
    "id as doc_id",
    "concat('http://site', cast(id % 13 as string), '.com/p/', cast(id as string)) as url",
    // ~660 INCOMPRESSIBLE chars each (md5 hex) so the gzip members stay
    // fat enough for a few hundred docs to clear the 64 KiB min target
    "array_join(transform(sequence(1, 20), i -> md5(concat(cast(id as string), ':', cast(i as string)))), ' ') as text")

  /** One big on-disk WARC: the synthesized per-partition files
    * concatenated (legal for both multi-member gzip and plain records).
    * Returns (path, bytes, expected record count incl. per-partition
    * warcinfo heads). */
  private def writeOneWarc(dir: java.nio.file.Path, gz: Boolean): (String, Array[Byte], Int) = {
    val payloads = WebArchive.synthesizeWarc(bigCorpus(400), gzipMembers = gz)
      .select("payload").collect().map(_.getAs[Array[Byte]](0))
    assert(payloads.nonEmpty)
    val all = payloads.reduce(_ ++ _)
    val f = dir.resolve(if (gz) "big.warc.gz" else "big.warc")
    java.nio.file.Files.write(f, all)
    (f.toString, all, 800 + payloads.length)
  }

  test("split parse: many member-aligned ranges, records ≡ whole-file parse") {
    val dir = java.nio.file.Files.createTempDirectory("warcsplit_")
    val (path, payload, nRecs) = writeOneWarc(dir, gz = true)
    assert(payload.length > 3 * 65536, s"fixture too small: ${payload.length}")
    val idx = WebArchive.indexWarcMembers(
      Seq(path).toDF("path"), targetBytes = 65536).collect()
    assert(idx.length > 2, s"expected several ranges, got ${idx.length}")
    // ranges tile the file exactly: sorted starts chain into ends
    val sorted = idx.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(sorted.head._1 === 0L && sorted.last._2 === payload.length.toLong)
    sorted.sliding(2).foreach { case Array((_, e), (s2, _)) => assert(e === s2)
      case _ => }
    val split = WebArchive.parseWarcSplit(
      Seq(path).toDF("path"), targetBytes = 65536)
    assert(split.rdd.getNumPartitions === idx.length,
      "one task per range is the whole point")
    def key(r: WebArchive.WarcRecord) =
      (r.warc_type, r.record_id, r.url, r.warc_date, r.status, r.mime,
        r.text, r.n_bytes, r.ok)
    val whole = WebArchive.parseWarc(
      Seq(("big.warc.gz", payload)).toDF("warc_file", "payload"))
      .collect().map(key).sortBy(_.toString)
    val ranged = split.collect().map(key).sortBy(_.toString)
    assert(ranged.length === nRecs) // per-partition warcinfo + 2 × 400
    assert(ranged.toSeq === whole.toSeq,
      "split parse must be record-identical to whole-file parse")
  }

  test("split parse: plain (non-gzip) file degrades to one full range") {
    val dir = java.nio.file.Files.createTempDirectory("warcsplitp_")
    val (path, payload, nRecs) = writeOneWarc(dir, gz = false)
    val idx = WebArchive.indexWarcMembers(
      Seq(path).toDF("path"), targetBytes = 65536).collect()
    assert(idx.length === 1 && idx.head.getLong(1) === 0L &&
      idx.head.getLong(2) === payload.length.toLong)
    val rows = WebArchive.parseWarcSplit(Seq(path).toDF("path"),
      targetBytes = 65536).collect()
    assert(rows.length === nRecs && rows.forall(_.ok))
  }

  /** Gzip one member per SLICE of `bytes` (size `slice`), ignoring record
    * boundaries — the record-spans-members layout the split path must
    * not trust. */
  private def gzipSliced(bytes: Array[Byte], slice: Int): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(bytes.length)
    bytes.grouped(slice).foreach { chunk =>
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(chunk); gz.finish(); gz.close()
    }
    bo.toByteArray
  }

  test("misaligned members (records span slices): index drops every cut, output ≡ whole-file parse") {
    val dir = java.nio.file.Files.createTempDirectory("warcmis_")
    // plain record stream, then re-gzipped in fixed 10 KiB slices: no
    // member after the first opens on a record boundary
    val (_, plain, nRecs) = writeOneWarc(dir, gz = false)
    val sliced = gzipSliced(plain, 10240)
    val f = dir.resolve("sliced.warc.gz")
    java.nio.file.Files.write(f, sliced)
    assert(sliced.length > 2 * 65536, s"fixture too small: ${sliced.length}")
    // every candidate cut fails record-alignment verification → 1 range
    val idx = WebArchive.indexWarcMembers(
      Seq(f.toString).toDF("path"), targetBytes = 65536).collect()
    assert(idx.length === 1 && idx.head.getLong(1) === 0L &&
      idx.head.getLong(2) === sliced.length.toLong,
      s"expected whole-file degrade, got ${idx.length} ranges")
    def key(r: WebArchive.WarcRecord) =
      (r.warc_type, r.record_id, r.url, r.status, r.text, r.ok)
    val whole = WebArchive.parseWarc(
      Seq(("sliced.warc.gz", sliced)).toDF("warc_file", "payload"))
      .collect().map(key).sortBy(_.toString)
    val split = WebArchive.parseWarcSplit(Seq(f.toString).toDF("path"),
      targetBytes = 65536).collect().map(key).sortBy(_.toString)
    assert(whole.length === nRecs && split.toSeq === whole.toSeq,
      "fallback must be record-identical to the whole-file parse")
  }

  test("multi-record members (records per member, aligned): split still splits, output ≡ whole-file") {
    val dir = java.nio.file.Files.createTempDirectory("warcmulti_")
    // 5 record-PAIRS per gzip member: member boundaries are record
    // boundaries (alignment holds) but members hold many records
    val pairs = (1 to 400).map { id =>
      // incompressible bodies (seeded hex) so the gzip members stay fat
      val rnd = new scala.util.Random(id)
      WebArchive.synthRecordPair(id.toLong, s"http://m.com/$id",
        (1 to 40).map(_ => rnd.nextLong().toHexString).mkString(" "))
    }
    val bo = new java.io.ByteArrayOutputStream()
    pairs.grouped(5).foreach { g =>
      val gz = new java.util.zip.GZIPOutputStream(bo)
      g.foreach(gz.write); gz.finish(); gz.close()
    }
    val payload = bo.toByteArray
    val f = dir.resolve("multi.warc.gz")
    java.nio.file.Files.write(f, payload)
    assert(payload.length > 2 * 65536, s"fixture too small: ${payload.length}")
    val idx = WebArchive.indexWarcMembers(
      Seq(f.toString).toDF("path"), targetBytes = 65536).collect()
    assert(idx.length > 2, s"aligned multi-record members must still split, got ${idx.length}")
    def key(r: WebArchive.WarcRecord) =
      (r.warc_type, r.record_id, r.url, r.status, r.text, r.ok)
    val whole = WebArchive.parseWarc(
      Seq(("multi.warc.gz", payload)).toDF("warc_file", "payload"))
      .collect().map(key).sortBy(_.toString)
    assert(whole.length === 800 && whole.forall(_._6))
    val split = WebArchive.parseWarcSplit(Seq(f.toString).toDF("path"),
      targetBytes = 65536).collect().map(key).sortBy(_.toString)
    assert(split.toSeq === whole.toSeq)
  }

  test("hand-fed misaligned range: marker rows, never silent loss") {
    val dir = java.nio.file.Files.createTempDirectory("warchand_")
    val (_, plain, _) = writeOneWarc(dir, gz = false)
    val sliced = gzipSliced(plain, 10240)
    val f = dir.resolve("hand.warc.gz")
    java.nio.file.Files.write(f, sliced)
    // cut at the 3rd member's magic — a REAL member whose content is
    // mid-record (records span the 10 KiB slices)
    val cutAt = {
      var found = List.empty[Int]
      var i = 1
      while (i < sliced.length - 3 && found.length < 2) {
        if (sliced(i) == 0x1f.toByte && sliced(i + 1) == 0x8b.toByte &&
            sliced(i + 2) == 8) found = found :+ i
        i += 1
      }
      found.last.toLong
    }
    val ranges = Seq((f.toString, 0L, cutAt),
      (f.toString, cutAt, sliced.length.toLong)).toDF("path", "start", "end")
    val rows = WebArchive.parseWarcRanges(ranges).collect()
    assert(rows.exists(r => !r.ok &&
      r.warc_type.startsWith("malformed:misaligned")),
      s"expected a misaligned marker, got ${rows.filterNot(_.ok).map(_.warc_type).toSeq}")
  }

  test("split parse: truncated tail costs a marker row, earlier ranges survive") {
    val dir = java.nio.file.Files.createTempDirectory("warcsplitt_")
    val (path, payload, _) = writeOneWarc(dir, gz = true)
    val cut = payload.length - payload.length / 10
    val tf = dir.resolve("trunc.warc.gz")
    java.nio.file.Files.write(tf, payload.take(cut))
    val rows = WebArchive.parseWarcSplit(Seq(tf.toString).toDF("path"),
      targetBytes = 65536).collect()
    val (good, bad) = rows.partition(_.ok)
    assert(bad.nonEmpty && bad.forall(_.warc_type.startsWith("malformed:")))
    assert(good.length > 700, s"earlier records must survive, got ${good.length}")
    assert(good.forall(r => r.warc_type == "warcinfo" ||
      r.record_id >= 1L))
  }
}
