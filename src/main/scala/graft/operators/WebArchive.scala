package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive) ingest — the real entry point of every web-scale
  * curation pipeline: CommonCrawl publishes `.warc.gz` files, and
  * C4/RefinedWeb/Dolma all start by turning those into (url, date, mime,
  * payload) rows before any text-level stage runs.
  *
  * Format implemented (public spec, ISO 28500 / WARC 1.x, same shape the
  * reference's file sources would feed): a WARC file is a sequence of
  * records; each record is
  * {{{
  *   WARC/1.0\r\n
  *   <name>: <value>\r\n ...          (header block)
  *   \r\n
  *   <Content-Length bytes of content>
  *   \r\n\r\n                          (record separator)
  * }}}
  * `response` records carry an HTTP/1.1 message as content (status line,
  * headers, blank line, body). CommonCrawl convention compresses each
  * record as its OWN gzip member, so readers can split files at member
  * boundaries; `java.util.zip.GZIPInputStream` reads concatenated
  * members natively, which is all the decompression this needs.
  *
  * Scale design:
  *  - [[parseWarc]] is a mapPartitions byte kernel (the Multimodal codec
  *    posture — container parsing has no Catalyst expression fit): one
  *    pass over each file's bytes, no shuffle, output rows stream out per
  *    record. Files are the parallelism unit, exactly like a 1000-executor
  *    job listing a CommonCrawl prefix.
  *  - [[synthesizeWarc]] is the deterministic test fixture (the x13
  *    discipline): every header and byte of the synthesized records is
  *    pure arithmetic of the doc id, so a DuckDB oracle recomputes the
  *    parsed rows WITHOUT parsing any container. One warcinfo record per
  *    file, then a request+response pair per document (the CommonCrawl
  *    record mix), each record its own gzip member.
  *  - Total function: malformed bytes never throw — the parser emits an
  *    `ok = false` row naming the byte offset and stops scanning that
  *    file (a truncated crawl file costs its tail, not the job).
  */
object WebArchive {

  /** One parsed WARC record. For `response` records the HTTP message is
    * unwrapped: `status`/`mime`/`text` come from the HTTP block;
    * other record types carry status = -1 and the raw content as text.
    * `record_id` is the numeric tail of `WARC-Record-ID:
    * <urn:graft:N>` (-1 when absent/foreign), `n_bytes` the content
    * length BEFORE http unwrapping. */
  final case class WarcRecord(
      warc_file: String, warc_type: String, record_id: Long, url: String,
      warc_date: String, status: Int, mime: String, text: String,
      n_bytes: Long, ok: Boolean)

  // ---------------------------------------------------------------- parse

  private val Gzip0 = 0x1f.toByte
  private val Gzip1 = 0x8b.toByte

  /** Inflate (possibly multi-member) gzip, or pass plain bytes through. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != Gzip0 || bytes(1) != Gzip1) return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    // capacity HINT only — clamp so a >512 MB member (real CommonCrawl
    // files run ~1 GB) can't overflow `length * 4` negative and throw
    val cap = math.max(64 * 1024L,
      math.min(bytes.length.toLong * 4, Int.MaxValue - 8L)).toInt
    val out = new java.io.ByteArrayOutputStream(cap)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Index of `\r\n` at/after `from`, or -1. */
  private def crlfAt(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one header block starting at `from`; returns (headers,
    * offset-after-blank-line) or None if no terminating blank line. */
  private def headerBlock(b: Array[Byte], from: Int): Option[(Map[String, String], Int)] = {
    var i = from
    val h = scala.collection.mutable.Map.empty[String, String]
    while (true) {
      val e = crlfAt(b, i)
      if (e < 0) return None
      if (e == i) return Some((h.toMap, e + 2)) // blank line = end of block
      val line = ascii(b, i, e)
      val c = line.indexOf(':')
      if (c > 0) h(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)) =
        line.substring(c + 1).trim
      i = e + 2
    }
    None // unreachable
  }

  private val RecordIdNum = """.*[:(]([0-9]+)[)>]?$""".r

  /** Scan every record in one (already inflated) WARC file. */
  private def scanRecords(file: String, b: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var dead = false
      private var pending: WarcRecord = _

      private def bad(reason: String): WarcRecord = {
        dead = true
        WarcRecord(file, s"malformed:$reason@$pos", -1L, "", "", -1, "", "",
          (b.length - pos).toLong, ok = false)
      }

      private def advance(): Unit = {
        pending = null
        if (dead) return
        // tolerate extra CRLF padding between records
        while (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') pos += 2
        if (pos >= b.length) return
        val ver = crlfAt(b, pos)
        if (ver < 0 || !ascii(b, pos, math.min(ver, pos + 5)).startsWith("WARC/")) {
          pending = bad("version"); return
        }
        headerBlock(b, ver + 2) match {
          case None => pending = bad("headers")
          case Some((h, bodyAt)) =>
            val len = h.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
            if (len < 0 || bodyAt + len > b.length) { pending = bad("length"); return }
            val wtype = h.getOrElse("warc-type", "")
            val url = h.getOrElse("warc-target-uri", "")
            val date = h.getOrElse("warc-date", "")
            val rid = h.getOrElse("warc-record-id", "") match {
              case RecordIdNum(n) => n.toLong
              case _ => -1L
            }
            val end = bodyAt + len.toInt
            val rec =
              if (wtype == "response") {
                // unwrap the HTTP message inside the record content
                val st = crlfAt(b, bodyAt)
                val status =
                  if (st < 0 || st > end) -1
                  else ascii(b, bodyAt, st).split(" ") match {
                    case parts if parts.length >= 2 && parts(0).startsWith("HTTP/") =>
                      parts(1).toIntOption.getOrElse(-1)
                    case _ => -1
                  }
                headerBlock(b, if (st < 0) bodyAt else st + 2) match {
                  case Some((hh, httpBody)) if status >= 0 && httpBody <= end =>
                    val body = new String(b, httpBody, end - httpBody,
                      java.nio.charset.StandardCharsets.UTF_8)
                    WarcRecord(file, wtype, rid, url, date, status,
                      hh.getOrElse("content-type", ""), body, len, ok = true)
                  case _ =>
                    WarcRecord(file, wtype, rid, url, date, -1, "",
                      "", len, ok = false)
                }
              } else {
                WarcRecord(file, wtype, rid, url, date, -1, "",
                  new String(b, bodyAt, len.toInt,
                    java.nio.charset.StandardCharsets.UTF_8), len, ok = true)
              }
            pos = end
            pending = rec
        }
      }

      advance()
      override def hasNext: Boolean = pending != null
      override def next(): WarcRecord = {
        val r = pending; advance(); r
      }
    }

  /** Parse a relation of WARC files — (`nameCol` string, `payloadCol`
    * binary) — into one row per record. mapPartitions kernel, no shuffle;
    * gzip (single- or multi-member) is auto-detected per file. */
  def parseWarc(warcs: DataFrame, payloadCol: String = "payload",
                nameCol: String = "warc_file"): Dataset[WarcRecord] = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col(nameCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (name, payload) =>
        if (payload == null) Iterator.empty
        else {
          val inflated =
            try gunzipAll(payload)
            catch { case scala.util.control.NonFatal(_) => null }
          if (inflated == null)
            Iterator.single(WarcRecord(name, "malformed:gzip@0", -1L, "", "",
              -1, "", "", payload.length.toLong, ok = false))
          else scanRecords(name, inflated)
        }
      })
  }

  /** The rows a curation pipeline starts from: well-formed `response`
    * records only, HTTP unwrapped. */
  def responses(warcs: DataFrame, payloadCol: String = "payload",
                nameCol: String = "warc_file"): DataFrame =
    parseWarc(warcs, payloadCol, nameCol).toDF()
      .where(col("warc_type") === "response" && col("ok"))
      .select(col("record_id"), col("url"), col("warc_date"),
        col("status"), col("mime"), col("text"), col("n_bytes"))

  // ----------------------------------------- member-offset range splitting
  //
  // parseWarc parallelizes by FILE; real CommonCrawl files are ~1 GB with
  // thousands of gzip members, so one-file-one-task is a straggler at
  // 100 TB. The split path cuts each file into ~targetBytes byte ranges
  // ALIGNED to gzip member boundaries and parses ranges independently:
  //
  //  1. [[indexWarcMembers]] streams each file once (no decompression)
  //     scanning for gzip member magic, and emits (path, start, end)
  //     rows with every cut on a candidate boundary. This is the poor
  //     man's .wat/.cdx; when a crawl publishes real offset sidecars,
  //     feed those as the ranges instead.
  //  2. [[parseWarcRanges]] inflates, per range, exactly the members
  //     whose START offset lies in [start, end) — a straddling final
  //     member is read past `end` to completion, and a range whose
  //     `start` turns out to be a magic FALSE POSITIVE (the 4-byte
  //     check can fire inside compressed data) scans forward to the
  //     first offset that inflates to a full CRC-valid member, so every
  //     true member is parsed exactly once across all ranges.
  //
  // CommonCrawl's layout has records member-aligned; files where a
  // RECORD spans gzip members are NOT trusted to be: every candidate
  // cut is VERIFIED at index time (the member at the cut must inflate
  // CRC-valid and its content must open with a WARC/1.x version line,
  // i.e. the cut is record-aligned, not merely member-aligned).
  // Unverifiable cuts are dropped — the neighboring ranges merge, and a
  // file whose members never open on a record boundary degrades to ONE
  // whole-file range, which parses multi-member records correctly
  // (members concatenate in order before the record scan). As defense
  // for hand-fed ranges, [[parseWarcRanges]] additionally emits a
  // `malformed:misaligned` marker row (never silence) when it meets a
  // CRC-valid member that does not open a record.
  //
  // Both executor closures use the SESSION's Hadoop configuration
  // (serialized into the task, as Spark's own file sources do) — the
  // `spark.hadoop.*` credentials/endpoints this path needs on the
  // remote object stores it exists for.

  /** Gzip member magic + deflate-method + reserved-flag-bits sanity. */
  private def magicAt(b: Array[Byte], off: Int): Boolean =
    off + 3 < b.length && b(off) == Gzip0 && b(off + 1) == Gzip1 &&
      b(off + 2) == 8 && (b(off + 3) & 0xe0) == 0

  private final case class Member(status: Int, content: Array[Byte], end: Int)
  private val MemberOk = 0; private val MemberTruncated = 1
  private val MemberInvalid = 2

  /** Inflate exactly ONE gzip member at `b(off)`: full header parse
    * (FEXTRA/FNAME/FCOMMENT/FHCRC), raw-deflate inflate, CRC32 + ISIZE
    * trailer validation. Truncated = the member continues past the end
    * of `b` (caller extends the window); Invalid = `off` is not a real
    * member start (magic false positive or corrupt bytes). */
  private def inflateMember(b: Array[Byte], off: Int): Member = {
    val inv = Member(MemberInvalid, null, 0)
    val trunc = Member(MemberTruncated, null, 0)
    var i = off
    def u8(): Int = if (i < b.length) { val v = b(i) & 0xff; i += 1; v } else -1
    if (off + 10 > b.length) return trunc
    if (u8() != 0x1f || u8() != 0x8b || u8() != 8) return inv
    val flg = u8()
    if ((flg & 0xe0) != 0) return inv
    i += 6 // mtime(4) + xfl + os
    if ((flg & 4) != 0) { // FEXTRA
      val x1 = u8(); val x2 = u8(); if (x2 < 0) return trunc
      i += (x1 | (x2 << 8)); if (i > b.length) return trunc
    }
    if ((flg & 8) != 0) { var c = u8(); while (c > 0) c = u8(); if (c < 0) return trunc }
    if ((flg & 16) != 0) { var c = u8(); while (c > 0) c = u8(); if (c < 0) return trunc }
    if ((flg & 2) != 0) { i += 2; if (i > b.length) return trunc }
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, i, b.length - i)
      val out = new java.io.ByteArrayOutputStream(64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      val crc = new java.util.zip.CRC32
      while (!inf.finished()) {
        if (inf.needsDictionary()) return inv // never legal in gzip deflate
        if (inf.needsInput()) return trunc    // consumed the whole window
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return inv }
        if (n > 0) { out.write(buf, 0, n); crc.update(buf, 0, n) }
      }
      val end = i + (b.length - i - inf.getRemaining)
      if (end + 8 > b.length) return trunc
      def le32(p: Int): Long =
        ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      val content = out.toByteArray
      if (le32(end) != crc.getValue || le32(end + 4) != (content.length & 0xffffffffL))
        return inv
      Member(MemberOk, content, end + 8)
    } finally inf.end()
  }

  /** Verify a candidate cut at `off`: the gzip member there must inflate
    * to a full CRC-valid member whose content OPENS a WARC record — the
    * record-alignment proof that makes [[parseWarcRanges]]' slicing safe
    * on files where records span members. Window grows geometrically
    * (64 KiB → 2× per retry) so a fat member costs O(size) inflation,
    * not O(size²). */
  private def verifiedCut(in: org.apache.hadoop.fs.FSDataInputStream,
                          len: Long, off: Long): Boolean = {
    var cap = 1 << 16
    var done = false
    var ok = false
    while (!done) {
      val n = math.min(cap.toLong, len - off).toInt
      val win = new Array[Byte](n)
      in.readFully(off, win, 0, n)
      val m = inflateMember(win, 0)
      if (m.status == MemberOk) {
        ok = new String(m.content, 0, math.min(5, m.content.length),
          java.nio.charset.StandardCharsets.US_ASCII).startsWith("WARC/")
        done = true
      } else if (m.status == MemberInvalid || n.toLong >= len - off ||
                 cap >= Int.MaxValue - 8) {
        done = true // false-positive magic, EOF-truncated, or un-windowable
      } else {
        cap = math.min(cap.toLong * 2, Int.MaxValue - 8L).toInt
      }
    }
    ok
  }

  /** Byte-range index over a relation of WARC file PATHS (`pathCol`):
    * one streaming magic scan per file (bytes-linear, no decompression),
    * ranges cut at member-boundary candidates every ~`targetBytes`, then
    * each candidate VERIFIED record-aligned (one member inflate per cut
    * — ~len/targetBytes members per file) and dropped if not. Plain
    * (non-gzip) files and files below the target emit one full range.
    * Output: (path, start, end). */
  def indexWarcMembers(files: DataFrame, targetBytes: Long = 8L << 20,
                       pathCol: String = "path"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    require(targetBytes >= (1L << 16), s"targetBytes too small: $targetBytes")
    val tb = targetBytes
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    files.select(col(pathCol).cast("string")).as[String].flatMap { path =>
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(hconf.value)
      val len = fs.getFileStatus(p).getLen
      val in = fs.open(p)
      try {
        val head = new Array[Byte](4)
        val cuts = scala.collection.mutable.ArrayBuffer[Long]()
        in.readFully(0L, head, 0, math.min(4, len).toInt)
        if (len > tb && magicAt(head, 0)) {
          // chunked scan with a 3-byte overlap so boundary magic is seen
          val buf = new Array[Byte](1 << 20)
          var base = 0L
          var carry = new Array[Byte](0)
          var nextCut = tb
          while (base < len && cuts.length < ((len / tb) + 2).toInt) {
            val n = math.min(buf.length.toLong, len - base).toInt
            in.readFully(base, buf, 0, n)
            val win = carry ++ buf.take(n)
            val winBase = base - carry.length
            var j = 0
            while (j < win.length - 3) {
              val abs = winBase + j
              if (abs >= nextCut && abs > 0 && magicAt(win, j) &&
                  verifiedCut(in, len, abs)) {
                cuts += abs; nextCut = abs + tb
              }
              j += 1
            }
            carry = win.takeRight(3)
            base += n
          }
        }
        val bounds = (0L +: cuts.toSeq) :+ len
        bounds.sliding(2).collect {
          case Seq(s, e) if e > s => (path, s, e)
        }.toSeq
      } finally in.close()
    }.toDF("path", "start", "end")
  }

  /** Parse (path, start, end) byte ranges into WARC records — the
    * post-index kernel of the split path. Each range inflates only the
    * members starting inside it; decompressed bytes are range-sized
    * (target + one straddling member), never file-sized. */
  def parseWarcRanges(ranges: DataFrame): Dataset[WarcRecord] = {
    val spark = ranges.sparkSession
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    ranges.select(col("path").cast("string"), col("start").cast("long"),
      col("end").cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions(_.flatMap { case (path, start, end) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(hconf.value)
        val len = fs.getFileStatus(p).getLen
        val in = fs.open(p)
        try {
          val rangeBytes = math.min(end, len) - start
          if (rangeBytes > Int.MaxValue - 8L) {
            // a >2 GB range can't window into one array: marker row, not
            // a NegativeArraySizeException-dead task (a plain file over
            // 2 GB always arrives as one full-file range)
            Iterator.single(WarcRecord(path, s"malformed:range-bomb@$start",
              -1L, "", "", -1, "", "", rangeBytes, ok = false))
          } else {
          // window = the range, extended while a member straddles `end`;
          // growth is GEOMETRIC (1 MiB, then doubling) so a single fat
          // straddling member re-inflates O(log) times, not O(size/1MiB)
          var win = new Array[Byte](rangeBytes.toInt)
          in.readFully(start, win, 0, win.length)
          var winEnd = start + win.length // absolute
          var step = 1L << 20
          def extend(): Boolean = {
            if (winEnd >= len) return false
            val room = (Int.MaxValue - 8L) - win.length
            if (room <= 0) return false // un-windowable; caller degrades
            val add = math.min(math.min(step, len - winEnd), room).toInt
            val grown = java.util.Arrays.copyOf(win, win.length + add)
            in.readFully(winEnd, grown, win.length, add)
            win = grown; winEnd += add
            step = math.min(step * 2, 1L << 30)
            true
          }
          if (start == 0 && !magicAt(win, 0)) {
            // plain (uncompressed) file: single full range by construction
            while (winEnd < len && extend()) ()
            if (winEnd < len)
              // >2 GB plain file: the window cap stopped growth — flag
              // the unparsed remainder rather than scan a torn buffer
              Iterator.single(WarcRecord(path, s"malformed:range-bomb@0",
                -1L, "", "", -1, "", "", len, ok = false))
            else scanRecords(path, win)
          } else {
            val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
            val bad = scala.collection.mutable.ArrayBuffer[WarcRecord]()
            // first verified member start >= `start`: scan candidates and
            // demand a full CRC-valid inflate (false positives can't
            // pass). A CRC-valid member whose content does NOT open a
            // WARC record is record/member MISALIGNMENT (a record
            // spanning members, cut here by the range) — index-time cut
            // verification prevents this for indexed ranges; hand-fed
            // ranges get a marker row, never silent loss, and the scan
            // resumes AFTER the foreign member
            var rel = 0
            var pos = -1L // absolute offset of the NEXT member in the chain
            var scanning = true
            while (scanning && rel >= 0 && start + rel < end) {
              if (magicAt(win, rel)) {
                var m = inflateMember(win, rel)
                while (m.status == MemberTruncated && extend())
                  m = inflateMember(win, rel)
                if (m.status == MemberOk &&
                    new String(m.content, 0, math.min(5, m.content.length),
                      java.nio.charset.StandardCharsets.US_ASCII).startsWith("WARC/")) {
                  parts += m.content
                  pos = start + m.end
                  scanning = false
                } else if (m.status == MemberOk) {
                  // misaligned: real member, mid-record content
                  bad += WarcRecord(path, s"malformed:misaligned@${start + rel}",
                    -1L, "", "", -1, "", "", m.content.length.toLong,
                    ok = false)
                  rel = m.end - 1 // resume after the member (+1 below)
                } else if (m.status == MemberTruncated) {
                  // file ends mid-member: the tail costs a marker row,
                  // never silence (total-function posture)
                  bad += WarcRecord(path, s"malformed:member@${start + rel}",
                    -1L, "", "", -1, "", "", len - start - rel, ok = false)
                  scanning = false
                }
              }
              if (scanning) {
                rel += 1
                var hunting = true
                while (hunting) {
                  while (rel < win.length - 3 && !magicAt(win, rel)) rel += 1
                  if (rel < win.length - 3) hunting = false
                  else if (start + rel < end && winEnd < len && extend()) ()
                  else { rel = -1; hunting = false } // true tail: give up
                }
              }
            }
            // chain: members sit back-to-back at exact offsets from here
            while (pos >= 0 && pos < end) {
              val r = (pos - start).toInt
              var m = inflateMember(win, r)
              while (m.status == MemberTruncated && extend())
                m = inflateMember(win, r)
              if (m.status == MemberOk) { parts += m.content; pos = start + m.end }
              else {
                bad += WarcRecord(path, s"malformed:member@$pos", -1L, "", "",
                  -1, "", "", end - pos, ok = false)
                pos = -2
              }
            }
            val total = parts.map(_.length.toLong).sum
            if (total > Int.MaxValue - 8)
              Iterator.single(WarcRecord(path, s"malformed:range-bomb@$start",
                -1L, "", "", -1, "", "", total, ok = false))
            else {
              val concat = new Array[Byte](total.toInt)
              var o = 0
              parts.foreach { c =>
                System.arraycopy(c, 0, concat, o, c.length); o += c.length
              }
              scanRecords(path, concat) ++ bad.iterator
            }
          }
          }
        } finally in.close()
      })
  }

  /** One-call split path: index member boundaries, spread ranges across
    * the cluster, parse. The ranges count (not the file count) is the
    * parallelism unit — a single 1 GB .warc.gz becomes ~128 tasks at the
    * default target. */
  def parseWarcSplit(files: DataFrame, targetBytes: Long = 8L << 20,
                     pathCol: String = "path"): Dataset[WarcRecord] = {
    // localCheckpoint: the index scan runs ONCE (count + parse reuse it)
    val idx = indexWarcMembers(files, targetBytes, pathCol).localCheckpoint()
    val n = idx.count()
    parseWarcRanges(idx.repartition(math.max(1L, math.min(n, 4096L)).toInt))
  }

  /** [[responses]] over file PATHS via the member-offset split parse —
    * the dialect's crawl entry point at CommonCrawl scale (`warc_scan`):
    * one ~1 GB `.warc.gz` becomes ~`targetBytes` tasks instead of one
    * straggler. NOTE: constructing this frame runs the index scan (a
    * count over the member index) eagerly. */
  def responsesSplit(files: DataFrame, targetBytes: Long = 8L << 20,
                     pathCol: String = "path"): DataFrame =
    parseWarcSplit(files, targetBytes, pathCol).toDF()
      .where(col("warc_type") === "response" && col("ok"))
      .select(col("record_id"), col("url"), col("warc_date"),
        col("status"), col("mime"), col("text"), col("n_bytes"))

  // ----------------------------------------------------- deterministic fixture

  private def asciiBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Deterministic WARC-Date per id — recomputable as DuckDB lpad/mod
    * arithmetic: day 1+id%28, hour id%24, minute (id*7)%60, second
    * (id*13)%60, all in January 2024. */
  def synthWarcDate(id: Long): String =
    f"2024-01-${1 + id % 28}%02dT${id % 24}%02d:${(id * 7) % 60}%02d:${(id * 13) % 60}%02dZ"

  /** Every 50th id is a 404 (its text replaced by the error body) — the
    * status mix a pipeline must filter on. */
  def synthStatus(id: Long): Int = if (id % 50 == 0) 404 else 200

  val SynthMime = "text/plain; charset=UTF-8"

  private def record(headers: Seq[(String, String)], content: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(content.length).append("\r\n\r\n")
    val head = asciiBytes(sb.toString)
    val out = new Array[Byte](head.length + content.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(content, 0, out, head.length, content.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(bytes); gz.finish(); gz.close()
    bo.toByteArray
  }

  /** The request+response record pair for one document — every byte a
    * function of (id, url, text). Concatenated form (spec convenience);
    * [[synthesizeWarc]] emits the two records as separate gzip members. */
  def synthRecordPair(id: Long, url: String, text: String): Array[Byte] = {
    val (req, resp) = synthRecords(id, url, text)
    req ++ resp
  }

  /** (request record, response record) for one document. */
  def synthRecords(id: Long, url: String, text: String): (Array[Byte], Array[Byte]) = {
    val date = synthWarcDate(id)
    val req = record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> s"<urn:graft:req:$id>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http; msgtype=request"),
      asciiBytes(s"GET /p HTTP/1.1\r\nHost: graft\r\n\r\n"))
    val status = synthStatus(id)
    val body = (if (status == 404) "not found" else text)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val statusLine = if (status == 404) "HTTP/1.1 404 Not Found" else "HTTP/1.1 200 OK"
    val httpHead = asciiBytes(
      s"$statusLine\r\nContent-Type: $SynthMime\r\nContent-Length: ${body.length}\r\n\r\n")
    val http = new Array[Byte](httpHead.length + body.length)
    System.arraycopy(httpHead, 0, http, 0, httpHead.length)
    System.arraycopy(body, 0, http, httpHead.length, body.length)
    val resp = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:$id>",
      "WARC-Date" -> date,
      "WARC-Target-URI" -> url,
      "Content-Type" -> "application/http; msgtype=response"), http)
    (req, resp)
  }

  /** Deterministic WARC files over a (id, url, text) relation: one file
    * per non-empty input partition (zero shuffle — the grouping does not
    * matter because the PARSED row set is partition-invariant), a
    * `warcinfo` head record, then the request+response pair per document,
    * each record its own gzip member (`gzipMembers = false` writes plain
    * concatenated records). Returns (warc_file, payload, n_records). */
  def synthesizeWarc(docs: DataFrame, urlCol: String = "url",
                     idCol: String = "doc_id", textCol: String = "text",
                     gzipMembers: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Par.widen(docs, idCol)
      .select(col(idCol).cast("long"), col(urlCol), col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val bo = new java.io.ByteArrayOutputStream(1 << 20)
          def emit(rec: Array[Byte]): Unit =
            bo.write(if (gzipMembers) gzipMember(rec) else rec)
          emit(record(Seq(
            "WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> "<urn:graft:warcinfo:0>",
            "WARC-Date" -> "2024-01-01T00:00:00Z",
            "Content-Type" -> "application/warc-fields"),
            asciiBytes("software: graft\r\nformat: WARC file version 1.0\r\n")))
          var n = 0L
          var minId = Long.MaxValue
          while (it.hasNext) {
            val (id, url, text) = it.next()
            val (req, resp) = synthRecords(id, url, text)
            emit(req); emit(resp)
            n += 2
            if (id < minId) minId = id
          }
          Iterator.single((s"graft-$minId.warc" + (if (gzipMembers) ".gz" else ""),
            bo.toByteArray, n + 1))
        }
      }
      .toDF("warc_file", "payload", "n_records")
  }
}
