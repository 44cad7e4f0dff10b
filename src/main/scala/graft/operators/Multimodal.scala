package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.2 M4): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, batch-decoded per
  * partition. CONTAINER decode is REAL for all three synthetic mimes —
  * `javax.imageio` (JDK-bundled) parses PNG/JPEG pixels, the RIFF walker
  * reads the WAV fmt/data chunks (sample rate, frames, channels), and the
  * ISO-BMFF walker reads the MP4 tkhd box (track width/height) — no
  * external codec library anywhere. WAV decode is SAMPLE-level: PCM-16 is
  * uncompressed, so the data chunk IS the audio, and [[Decoded.pcm_checksum]]
  * (sum of all interleaved int16 samples) proves the decoder read the
  * content, not just the header. Video picture decode would need codecs
  * this container doesn't ship; the deterministic stub remains only for
  * unknown mimes, and corrupt payloads of known mimes report ok=false
  * instead of throwing.
  *
  * The decode path mirrors the `mapInPandas` batch model: one iterator of
  * rows per partition, decode amortized across the batch, typed output
  * schema declared up front. Swap the kernel for a JNI/FFM codec call
  * without touching the plumbing.
  */
object Multimodal {

  /** Media row: payload + metadata the pipeline carries for pruning. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType)))

  /** Deterministic dimensions for the synthetic PNGs: small (8..31 px per
    * side) so encoding 1/3 of the corpus costs microseconds per row, and
    * pure functions of media_id so an external oracle can recompute the
    * EXPECTED decode output without parsing a byte of PNG. */
  def synthPngWidth(id: Long): Int = 8 + (id % 24).toInt
  def synthPngHeight(id: Long): Int = 8 + ((id * 7) % 24).toInt

  /** A real PNG payload: solid-color TYPE_INT_RGB image of the synthetic
    * dimensions, encoded by the JDK's ImageIO PNG writer. */
  def synthPngBytes(id: Long): Array[Byte] = {
    val w = synthPngWidth(id)
    val h = synthPngHeight(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 31) % 256)).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic WAV parameters for the synthetic audio rows — pure
    * functions of media_id so an external oracle recomputes the EXPECTED
    * decode output without parsing a byte of RIFF. */
  def synthWavRate(id: Long): Int = 8000 + (id % 8).toInt * 1000
  def synthWavChannels(id: Long): Int = 1 + (id % 2).toInt
  def synthWavFrames(id: Long): Int = 16 + (id % 32).toInt

  /** Deterministic PCM sample i (interleaved index across channels) of
    * the synthetic WAV for media_id `id` — a pure arithmetic formula an
    * external oracle can recompute per sample, full int16 range. */
  def synthWavSample(id: Long, i: Int): Short =
    (((id * 131 + i.toLong * 17) % 65536) - 32768).toShort

  /** Sum of all interleaved samples of the synthetic WAV — the expected
    * [[Decoded.pcm_checksum]] for the row, recomputable by the oracle as
    * SUM over generate_series without parsing RIFF. */
  def synthWavChecksum(id: Long): Long = {
    val n = synthWavFrames(id) * synthWavChannels(id)
    var s = 0L
    var i = 0
    while (i < n) { s += synthWavSample(id, i); i += 1 }
    s
  }

  /** A real RIFF/WAVE payload: canonical 44-byte header (PCM fmt chunk,
    * 16-bit) + [[synthWavFrames]] frames of [[synthWavSample]] PCM — a
    * genuine non-silent waveform, so the decoder's sample-level checksum
    * proves it read the audio CONTENT, not just the header. Any standard
    * WAV reader parses it. */
  def synthWavBytes(id: Long): Array[Byte] = {
    val rate = synthWavRate(id)
    val ch = synthWavChannels(id)
    val frames = synthWavFrames(id)
    val bits = 16
    val dataSize = frames * ch * (bits / 8)
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * bits / 8)
      .putShort((ch * bits / 8).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    val n = frames * ch
    while (i < n) { bb.putShort(synthWavSample(id, i)); i += 1 }
    bb.array()
  }

  /** Deterministic MP4 track dimensions for the synthetic video rows. */
  def synthMp4Width(id: Long): Int = 160 + (id % 32).toInt * 8
  def synthMp4Height(id: Long): Int = 120 + ((id * 5) % 32).toInt * 8

  /** mdat content formulas for the synthetic video rows — the video
    * analog of the WAV sample formulas (r12): the mdat payload is what a
    * demuxer hands the codec, so a checksum match proves the box walker
    * read the media DATA, not just the moov metadata. */
  def synthMp4MdatLen(id: Long): Int = 24 + (id % 48).toInt
  def synthMp4MdatByte(id: Long, j: Int): Int = ((id * 131 + j * 17) % 256).toInt
  def synthMp4MdatChecksum(id: Long): Long = {
    var s = 0L; var j = 0; val n = synthMp4MdatLen(id)
    while (j < n) { s += synthMp4MdatByte(id, j); j += 1 }
    s
  }

  /** A real (minimal) MP4 container: `ftyp` + `moov(mvhd, trak(tkhd))` +
    * `mdat` boxes, big-endian sizes, tkhd width/height in 16.16 fixed
    * point — the standard box grammar any MP4 demuxer walks. The mdat
    * carries [[synthMp4MdatLen]] deterministic content bytes
    * ([[synthMp4MdatByte]]) so the decoder's content checksum is
    * oracle-recomputable. */
  def synthMp4Bytes(id: Long): Array[Byte] = {
    val w = synthMp4Width(id)
    val h = synthMp4Height(id)
    def ascii(s: String) = s.getBytes("US-ASCII")
    val ftyp = java.nio.ByteBuffer.allocate(20)
    ftyp.putInt(20).put(ascii("ftyp")).put(ascii("isom")).putInt(0)
      .put(ascii("isom"))
    val mvhd = java.nio.ByteBuffer.allocate(108)
    mvhd.putInt(108).put(ascii("mvhd")).putInt(0) // v0 + flags
      .putInt(0).putInt(0)         // creation, modification
      .putInt(1000)                // timescale
      .putInt(0)                   // duration (no samples)
      .putInt(0x00010000)          // rate 1.0
      .putShort(0x0100.toShort)    // volume 1.0
      .putShort(0.toShort).putInt(0).putInt(0) // reserved(10)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(v => { mvhd.putInt(v); () })        // identity matrix
    (0 until 6).foreach(_ => mvhd.putInt(0)) // pre_defined
    mvhd.putInt(2)                 // next track id
    val tkhd = java.nio.ByteBuffer.allocate(92)
    tkhd.putInt(92).put(ascii("tkhd")).putInt(0x00000007) // v0, enabled
      .putInt(0).putInt(0)         // creation, modification
      .putInt(1)                   // track id
      .putInt(0)                   // reserved
      .putInt(0)                   // duration
      .putInt(0).putInt(0)         // reserved(8)
      .putShort(0.toShort).putShort(0.toShort) // layer, alternate_group
      .putShort(0.toShort).putShort(0.toShort) // volume (video), reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(v => { tkhd.putInt(v); () })        // identity matrix
    tkhd.putInt(w << 16).putInt(h << 16) // 16.16 fixed
    val trakSize = 8 + 92
    val moovSize = 8 + 108 + trakSize
    val nMdat = synthMp4MdatLen(id)
    val out = java.nio.ByteBuffer.allocate(20 + moovSize + 8 + nMdat)
    out.put(ftyp.array())
    out.putInt(moovSize).put(ascii("moov"))
    out.put(mvhd.array())
    out.putInt(trakSize).put(ascii("trak"))
    out.put(tkhd.array())
    out.putInt(8 + nMdat).put(ascii("mdat"))
    var j = 0
    while (j < nMdat) { out.put(synthMp4MdatByte(id, j).toByte); j += 1 }
    out.array()
  }

  /** Deterministic synthetic media table derived from `documents`: every
    * mime carries a REAL container — PNG bytes ([[synthPngBytes]]), RIFF
    * WAV ([[synthWavBytes]]), MP4 ftyp+moov ([[synthMp4Bytes]]) — with
    * dimensions/rates that are pure functions of media_id, so decode
    * output is oracle-checkable without the oracle parsing any container.
    * Payload synthesis is a mapPartitions kernel, not a per-row UDF,
    * matching the decode side's batch shape. */
  def synthesize(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Par.widen(docs, "doc_id").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no executor-disk scratch
        it.map { case (id, _) =>
          val (mime, payload) =
            if (id % 3 == 0) ("image/png", synthPngBytes(id))
            else if (id % 3 == 1) ("audio/wav", synthWavBytes(id))
            else ("video/mp4", synthMp4Bytes(id))
          (id, payload, mime, payload.length.toLong)
        }
      }
      .toDF("media_id", "payload", "mime", "n_bytes")
  }

  /** content_checksum is the per-mime CONTENT proof (r12): sum of every
    * int16 PCM sample for WAV, unsigned-byte sum of the mdat media data
    * for MP4, 0 for images (whose pixels the dHash gates prove). */
  final case class Decoded(media_id: Long, mime: String, width: Int,
                           height: Int, channels: Int, ok: Boolean,
                           content_checksum: Long = 0L)

  /** STUB decode kernel for UNKNOWN mimes and corrupt payloads: derives
    * deterministic pseudo-dimensions from payload bytes so the
    * distributed plumbing stays testable for mimes with no parser. */
  private def decodeStub(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    val w = 64 + (n % 960)          // 64..1023 "pixels"
    val h = 64 + ((n * 31) % 960)
    val c = if (mime != null && mime.startsWith("audio")) 1 else 3
    (w, h, c)
  }

  /** REAL WAV decode: walk the RIFF chunk list (ids ASCII, sizes little-
    * endian), read the PCM `fmt ` chunk and the `data` chunk — pure JDK
    * byte parsing, no codec library. Returns (sample_rate,
    * frames_per_channel, channels, pcm_checksum) with the first three
    * mapped onto the (width, height, channels) metadata columns; the
    * checksum is the sum of all interleaved int16 samples actually
    * present in the data chunk (0 for non-16-bit formats), a sample-
    * level proof the decoder read the audio CONTENT. None on anything
    * malformed. */
  private def decodeWav(p: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      if (p == null || p.length < 44) None
      else {
        val bb = java.nio.ByteBuffer.wrap(p)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(off: Int) = new String(p, off, 4, "US-ASCII")
        if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") None
        else {
          var off = 12
          var fmt: Option[(Int, Int, Int)] = None // (rate, bits, channels)
          var dataSize = -1L
          var dataOff = -1
          var bad = false
          while (!bad && off + 8 <= p.length && (fmt.isEmpty || dataSize < 0)) {
            val id = fourcc(off)
            val sz = bb.getInt(off + 4).toLong & 0xffffffffL
            if (id == "fmt ") {
              if (sz < 16 || off + 8 + 16 > p.length) bad = true
              else fmt = Some((bb.getInt(off + 12),
                bb.getShort(off + 22) & 0xffff, bb.getShort(off + 10) & 0xffff))
            } else if (id == "data") { dataSize = sz; dataOff = off + 8 }
            off += (8L + sz + (sz & 1L)).toInt // chunks are word-aligned
            if (off < 0) bad = true            // overflowed size field
          }
          if (bad) None
          else fmt.flatMap { case (rate, bits, ch) =>
            if (rate <= 0 || bits < 8 || bits % 8 != 0 || ch <= 0 ||
                dataSize < 0) None
            else {
              // sum int16 samples actually present (truncated payloads
              // sum what exists rather than reading out of bounds)
              var cksum = 0L
              if (bits == 16 && dataOff >= 0) {
                val end = math.min(dataOff + dataSize, p.length.toLong).toInt
                var i = dataOff
                while (i + 2 <= end) { cksum += bb.getShort(i); i += 2 }
              }
              Some((rate, (dataSize / (ch.toLong * (bits / 8))).toInt, ch,
                cksum))
            }
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL MP4 decode: walk the ISO-BMFF box tree (big-endian sizes) down
    * `moov` → `trak` → `tkhd` and read the track's 16.16-fixed width and
    * height (version 0 and 1 layouts) — pure JDK byte parsing. Returns
    * (width, height, 3); None on anything malformed. */
  private def decodeMp4(p: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      if (p == null || p.length < 16) None
      else {
        val bb = java.nio.ByteBuffer.wrap(p) // big-endian by default
        def fourcc(off: Int) = new String(p, off, 4, "US-ASCII")
        // unsigned byte sum over every top-level mdat's content — the
        // media DATA a demuxer hands the codec. Lenient like the WAV
        // walker: a declared size past the buffer sums what exists (a
        // truncated tail must not zero the whole file's evidence); no
        // mdat (a legal zero-sample video) sums to 0.
        def mdatSum: Long = {
          var off = 0; var s = 0L
          while (off + 8 <= p.length) {
            val sz = bb.getInt(off)
            if (sz < 8) off = p.length // malformed size: stop walking
            else {
              if (fourcc(off + 4) == "mdat") {
                val end = math.min(off.toLong + sz, p.length.toLong).toInt
                var j = off + 8
                while (j < end) { s += (p(j) & 0xff); j += 1 }
              }
              off = if (off.toLong + sz > p.length) p.length else off + sz
            }
          }
          s
        }
        // first child box of `typ` inside [start, end): (contentStart, contentEnd)
        def findBox(start: Int, end: Int, typ: String): Option[(Int, Int)] = {
          var off = start
          var found: Option[(Int, Int)] = None
          while (found.isEmpty && off + 8 <= end) {
            val sz = bb.getInt(off)
            if (sz < 8 || off + sz > end) off = end // malformed: stop
            else {
              if (fourcc(off + 4) == typ) found = Some((off + 8, off + sz))
              off += sz
            }
          }
          found
        }
        for {
          (ms, me) <- findBox(0, p.length, "moov")
          (ts, te) <- findBox(ms, me, "trak")
          (ks, ke) <- findBox(ts, te, "tkhd")
          version = p(ks) & 0xff
          whOff = ks + (if (version == 1) 88 else 76)
          if ke >= whOff + 8
          w = bb.getInt(whOff) >>> 16
          h = bb.getInt(whOff + 4) >>> 16
          if w > 0 && h > 0
        } yield (w, h, 3, mdatSum)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image decode: ImageIO (JDK) parses the payload; None when the
    * bytes aren't a decodable image (decoder missing or payload corrupt),
    * which the caller reports as ok=false rather than throwing — one bad
    * file must not kill a 100 TB scan. */
  private def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else Some((img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-parallel batch decode: binary payload → typed metadata.
    * Image mimes decode for REAL via ImageIO, audio/wav parses the RIFF
    * fmt chunk, video/mp4 walks the box tree to tkhd — all pure-JDK.
    * Only unknown mimes fall back to the deterministic stub; a KNOWN
    * mime whose payload fails its parser reports ok=false (with stub
    * dims for schema stability) rather than throwing — one bad file
    * must not kill a 100 TB scan. mapPartitions (not per-row UDF) so
    * decoder setup amortizes across the batch — the Scala analog of
    * mapInPandas. */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "mime")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init
        it.map { case (id, payload, mime) =>
          val m = Option(mime).getOrElse("")
          val known = m.startsWith("image/") || m == "audio/wav" ||
            m == "audio/x-wav" || m == "video/mp4"
          val parsed =
            if (m.startsWith("image/")) decodeImage(payload).map {
              case (w, h, c) => (w, h, c, 0L) }
            else if (m == "audio/wav" || m == "audio/x-wav") decodeWav(payload)
            else if (m == "video/mp4") decodeMp4(payload)
            else None
          parsed match {
            case Some((w, h, c, ck)) => Decoded(id, mime, w, h, c, ok = true, ck)
            case None =>
              val (w, h, c) = decodeStub(payload, mime)
              // a KNOWN mime that failed its real parser is a decode
              // failure even when bytes are present; unknown mimes keep
              // the stub contract (ok when there is a payload at all)
              Decoded(id, mime, w, h, c,
                ok = !known && payload != null && payload.nonEmpty)
          }
        }
      }
  }

  /** Per-file audio sample statistics: silence / clipping / energy over
    * the PCM-16 data chunk. */
  final case class AudioStatsRow(media_id: Long, ok: Boolean,
                                 n_samples: Long, sum_sq: Long,
                                 n_silent: Long, n_clipped: Long)

  /** |sample| below this (of 32768) counts as silence — ~3% full scale,
    * the classic "digital near-silence" gate. */
  val SilenceThreshold = 1024

  /** Audio QUALITY SIGNALS for a corpus filter: walk the WAV data chunk
    * and count per file (a) total samples, (b) energy (sum of squares —
    * exact integer, so an oracle recomputes it bit-for-bit), (c) near-
    * silent samples (|s| < [[SilenceThreshold]]) and (d) clipped samples
    * (s at the int16 rails). A pipeline drops files that are mostly
    * silence (dead recordings) or heavily clipped (distorted) the way
    * Gopher rules drop degenerate text. Same batch kernel shape as
    * [[decode]]: mapPartitions, one pass over the payload, no shuffle;
    * non-WAV or malformed rows report ok=false with zeroed stats rather
    * than throwing — one bad file must not kill a 100 TB scan. */
  def audioStats(media: DataFrame): Dataset[AudioStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "mime")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, p, mime) =>
          val m = Option(mime).getOrElse("")
          val wav = (m == "audio/wav" || m == "audio/x-wav") && p != null &&
            p.length >= 44 && new String(p, 0, 4, "US-ASCII") == "RIFF" &&
            new String(p, 8, 4, "US-ASCII") == "WAVE"
          if (!wav) AudioStatsRow(id, ok = false, 0L, 0L, 0L, 0L)
          else {
            val bb = java.nio.ByteBuffer.wrap(p)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            // chunk walk (same discipline as decodeWav): find fmt + data
            var off = 12
            var bits = -1
            var dataOff = -1
            var dataSize = -1L
            var bad = false
            while (!bad && off + 8 <= p.length && (bits < 0 || dataSize < 0)) {
              val cid = new String(p, off, 4, "US-ASCII")
              val sz = bb.getInt(off + 4).toLong & 0xffffffffL
              if (cid == "fmt ") {
                if (sz < 16 || off + 8 + 16 > p.length) bad = true
                else bits = bb.getShort(off + 22) & 0xffff
              } else if (cid == "data") { dataSize = sz; dataOff = off + 8 }
              off += (8L + sz + (sz & 1L)).toInt
              if (off < 0) bad = true
            }
            if (bad || bits != 16 || dataOff < 0)
              AudioStatsRow(id, ok = false, 0L, 0L, 0L, 0L)
            else {
              val end = math.min(dataOff + dataSize, p.length.toLong).toInt
              var i = dataOff
              var n = 0L; var sq = 0L; var silent = 0L; var clipped = 0L
              while (i + 2 <= end) {
                val s = bb.getShort(i).toInt
                n += 1; sq += s.toLong * s
                if (math.abs(s) < SilenceThreshold) silent += 1
                if (s == 32767 || s == -32768) clipped += 1
                i += 2
              }
              AudioStatsRow(id, ok = true, n, sq, silent, clipped)
            }
          }
        }
      }
  }

  /** Deterministic "recording" for the audio-dedup gates: 650 samples
    * (65 exact 10-sample windows) of a per-window constant envelope
    * a_w = 4·(250 + (mix64(leader, w) mod 7000)), divided by
    * `gainDiv` ∈ {1, 2, 4}. The splitmix-style bit mix makes the
    * adjacent-window comparison pattern effectively random PER LEADER
    * (a plain linear congruence shares wrap patterns across leaders and
    * collides fingerprints — found by the x112 oracle preflight). Every
    * window amplitude is a multiple of 4, so the gain variants divide
    * EXACTLY: the energy-envelope comparisons — hence
    * [[audioFingerprint]] — are bit-identical across volumes while the
    * payload bytes all differ (the family structure an external oracle
    * recomputes as pure id arithmetic). */
  def synthToneWavBytes(leader: Long, gainDiv: Int): Array[Byte] = {
    require(gainDiv == 1 || gainDiv == 2 || gainDiv == 4,
      s"gainDiv must be 1, 2 or 4, got $gainDiv")
    val n = 650
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000)
      .putInt(8000 * 2).putShort(2.toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) {
      val w = i / 10
      var h = leader * 0x9E3779B97F4A7C15L + w * 0xBF58476D1CE4E5B9L
      h ^= (h >>> 31)
      h *= 0x94D049BB133111EBL
      h ^= (h >>> 29)
      val a = 4 * (250 + java.lang.Math.floorMod(h, 7000L).toInt)
      bb.putShort((a / gainDiv).toShort)
      i += 1
    }
    bb.array()
  }

  /** Volume-invariant perceptual AUDIO fingerprint — the audio analog of
    * [[dHash]] (chromaprint's energy-difference idea reduced to one
    * band): parse the WAV PCM, partition the sample stream into 65 equal
    * time windows, bit i of the 64-bit fingerprint = (mean |amplitude|
    * of window i) > (mean of window i+1). The envelope SHAPE survives
    * what byte-hash dedup cannot: the same material re-recorded at a
    * different gain scales every window mean by the same factor and
    * preserves every comparison, so volume-shifted copies collide —
    * feed the output to [[Dedup.hammingCandidatesFromSig]] exactly like
    * image signatures (`sh` column convention via `.as("sh")`).
    * Output (id, afp, ok); non-WAV, unparseable, non-PCM-16, or
    * shorter-than-65-sample rows are (id, 0, false) — one bad file must
    * not kill a 100 TB scan. Same batch kernel shape as [[decode]]:
    * mapPartitions, one pass, no shuffle. */
  def audioFingerprint(media: DataFrame, payloadCol: String = "payload",
                       idCol: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val idType = media.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"audioFingerprint: id column '$idCol' must be numeric, got ${idType.simpleString}")
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(java.lang.Long, Array[Byte])](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.LONG,
          org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (idBoxed, p) =>
          if (idBoxed == null) throw new IllegalArgumentException(
            s"audioFingerprint: NULL id in column '$idCol' — ids must be non-null")
          val id = idBoxed.longValue
          val fp: Option[Long] =
            try {
              if (p == null || p.length < 44 ||
                  new String(p, 0, 4, "US-ASCII") != "RIFF" ||
                  new String(p, 8, 4, "US-ASCII") != "WAVE") None
              else {
                val bb = java.nio.ByteBuffer.wrap(p)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                var off = 12
                var bits = -1
                var dataOff = -1
                var dataSize = -1L
                var bad = false
                while (!bad && off + 8 <= p.length && (bits < 0 || dataSize < 0)) {
                  val cid = new String(p, off, 4, "US-ASCII")
                  val sz = bb.getInt(off + 4).toLong & 0xffffffffL
                  if (cid == "fmt ") {
                    if (sz < 16 || off + 8 + 16 > p.length) bad = true
                    else bits = bb.getShort(off + 22) & 0xffff
                  } else if (cid == "data") { dataSize = sz; dataOff = off + 8 }
                  off += (8L + sz + (sz & 1L)).toInt
                  if (off < 0) bad = true
                }
                val end =
                  if (dataOff < 0) -1
                  else math.min(dataOff + dataSize, p.length.toLong).toInt
                val n = if (end < 0) 0 else (end - dataOff) / 2
                if (bad || bits != 16 || n < 65) None
                else {
                  // 65 equal windows of mean |amplitude| → 64 gradient bits
                  val means = new Array[Double](65)
                  var w = 0
                  while (w < 65) {
                    val s0 = (w.toLong * n / 65).toInt
                    val s1 = math.max(((w + 1).toLong * n / 65).toInt, s0 + 1)
                    var sum = 0.0
                    var i = s0
                    while (i < s1) {
                      sum += math.abs(bb.getShort(dataOff + 2 * i).toInt)
                      i += 1
                    }
                    means(w) = sum / (s1 - s0)
                    w += 1
                  }
                  var h = 0L
                  var b = 0
                  while (b < 64) {
                    if (means(b) > means(b + 1)) h |= (1L << b)
                    b += 1
                  }
                  Some(h)
                }
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          fp match {
            case Some(h) => (id, h, true)
            case None => (id, 0L, false)
          }
        }
      }
      .toDF("id", "afp", "ok")
  }

  /** "Frame sampling": deterministic byte-range slices of the payload —
    * the partitioning/batching shape of real video frame extraction.
    * Emits `frames` slices of `frameBytes` bytes each (fewer when the
    * payload is short), as (media_id, frame_no, frame). */
  def sampleFrames(media: DataFrame, frames: Int = 4, frameBytes: Int = 16): DataFrame = {
    // stride computed ONCE and reused by the filter and the slice offset
    media.select(col("media_id"), col("payload"), col("n_bytes"),
        greatest((col("n_bytes") / frames).cast("int"), lit(1)).as("__stride"),
        explode(sequence(lit(0), lit(frames - 1))).as("frame_no"))
      .where(col("frame_no") * col("__stride") < col("n_bytes"))
      .select(col("media_id"), col("frame_no"),
        // binary slice via substring (1-based) — codegen'd, no UDF
        expr(s"substring(payload, frame_no * __stride + 1, $frameBytes)").as("frame"))
  }

  final case class Featured(media_id: Long, feature: Array[Float])

  /** STUB feature extraction: payload → `dim`-dimensional L2-normalized
    * byte-histogram vector (a real kernel would run a vision/audio model
    * here). Same batch shape as [[decode]]: mapPartitions so model/session
    * init amortizes per partition; output is a typed `Array[Float]` column
    * ready for the Similarity/Dedup embedding operators. Empty payloads
    * yield the zero vector. */
  def features(media: DataFrame, dim: Int = 16): Dataset[Featured] = {
    require(dim > 0, "dim must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model init would go here
        it.map { case (id, payload) =>
          val hist = new Array[Float](dim)
          if (payload != null)
            payload.foreach(b => hist(java.lang.Byte.toUnsignedInt(b) % dim) += 1f)
          val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
          val out = if (norm == 0) hist else hist.map(x => (x / norm).toFloat)
          Featured(id, out)
        }
      }
  }

  final case class Inferred(media_id: Long, emb: Array[Float], batch_n: Int)

  /** Batched-inference plumbing: each partition's rows are grouped into
    * fixed-size batches and the kernel runs once per BATCH — the shape a
    * model server / GPU worker wants (the Scala analog of `mapInPandas`
    * with a batch size; a real kernel would be one RPC/JNI call per
    * batch). The stub kernel is the [[features]] byte histogram, computed
    * batch-at-a-time; `batch_n` records each row's actual batch size so
    * downstream can assert the shape (every batch full except ≤1 straggler
    * per partition). Rows never leave their partition — no shuffle; model
    * init amortizes per partition, kernel cost per batch. */
  def batchedInfer(media: DataFrame, batchSize: Int = 8,
                   dim: Int = 16): Dataset[Inferred] = {
    require(batchSize > 0, "batchSize must be positive")
    require(dim > 0, "dim must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model/session init would go here
        it.grouped(batchSize).flatMap { batch =>
          // one kernel invocation per batch (stub: vectorized histogram)
          val outs = batch.map { case (_, payload) =>
            val hist = new Array[Float](dim)
            if (payload != null)
              payload.foreach(b => hist(java.lang.Byte.toUnsignedInt(b) % dim) += 1f)
            val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
            if (norm == 0) hist else hist.map(x => (x / norm).toFloat)
          }
          batch.lazyZip(outs).map { case ((id, _), emb) =>
            Inferred(id, emb, batch.length)
          }
        }
      }
  }

  /** "Resize" stub: metadata-level transform (target dims recorded, the
    * pixel kernel would run in the decode batch). */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    decoded.select(col("media_id"), col("width"), col("height"),
      round(col("width") * scale).cast("int").as("out_width"),
      round(col("height") * scale).cast("int").as("out_height"))
  }

  /** Structured pattern PNG for perceptual-hash work: a 9×8 grid of
    * macro-blocks, each block a solid luma decided by one bit of a
    * multiplicative hash of (key, block) — so the image's [[dHash]] is a
    * pure function of `key` alone, while `blockSize` controls the pixel
    * resolution. Re-encoding the SAME key at a different blockSize yields
    * different bytes (different dimensions) but the identical dHash —
    * the near-duplicate class byte-level dedup cannot see. */
  def synthPatternPngBytes(key: Long, blockSize: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9 * blockSize, 8 * blockSize, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 9) {
        // murmur-style finalizer: a LINEAR v (key·A + block·B) leaves
        // single-bit block patterns correlated across nearby keys (100
        // leaders collapsed to ~28 distinct hashes before mixing)
        var v = key * 6364136223846793005L +
          (by * 9 + bx) * 1442695040888963407L
        v ^= v >>> 33; v *= 0xff51afd7ed558ccdL; v ^= v >>> 33
        val luma = if ((v & 1L) == 1L) 220 else 35
        val rgb = (luma << 16) | (luma << 8) | luma
        var y = by * blockSize
        while (y < (by + 1) * blockSize) {
          var x = bx * blockSize
          while (x < (bx + 1) * blockSize) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference hash (dHash) over decoded pixels — the perceptual
    * image-dedup signature: box-average the luma onto a 9×8 grid, then
    * bit (y, x) = mean(x+1, y) > mean(x, y), packed into one long.
    * Catches re-encoded / resized copies whose BYTES differ (md5/sha
    * dedup misses them) while distinct content lands ~32 bits apart.
    * Same mapPartitions batch-kernel shape as [[decode]]; undecodable
    * payloads report ok=false with hash 0, never a thrown task. Feed the
    * output to `Dedup.hammingCandidatesFromSig` for banded near-dup
    * candidate pairs (the SimHash machinery, reused). */
  def dHash(media: DataFrame, payloadCol: String = "payload",
            idCol: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // a non-numeric id would cast to NULL and a NULL would decode as 0L
    // in the primitive-tuple Dataset, silently collapsing rows onto id 0
    // and corrupting every downstream candidate pair — fail eagerly on
    // the type and loudly (boxed decode + throw) on null values (r11)
    val idType = media.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"dHash: id column '$idCol' must be numeric, got ${idType.simpleString}")
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(java.lang.Long, Array[Byte])](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.LONG,
          org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (idBoxed, payload) =>
          if (idBoxed == null) throw new IllegalArgumentException(
            s"dHash: NULL id in column '$idCol' — ids must be non-null")
          val id = idBoxed.longValue
          val img =
            try {
              if (payload == null || payload.isEmpty) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
            } catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < 1 || img.getHeight < 1)
            (id, 0L, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            // box means on the 9×8 grid: block (gx, gy) covers pixel
            // columns [gx·w/9, (gx+1)·w/9) — exact for multiples, a
            // deterministic partition for any size
            val means = Array.ofDim[Double](8, 9)
            var gy = 0
            while (gy < 8) {
              var gx = 0
              while (gx < 9) {
                val x0 = gx * w / 9; val x1 = math.max((gx + 1) * w / 9, x0 + 1)
                val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
                var sum = 0.0; var n = 0
                var y = y0
                while (y < y1 && y < h) {
                  var x = x0
                  while (x < x1 && x < w) {
                    val rgb = img.getRGB(x, y)
                    sum += 0.299 * ((rgb >> 16) & 0xFF) +
                      0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                    n += 1; x += 1
                  }
                  y += 1
                }
                means(gy)(gx) = if (n == 0) 0.0 else sum / n
                gx += 1
              }
              gy += 1
            }
            var hash = 0L
            var i = 0
            while (i < 64) {
              val gy = i / 8; val gx = i % 8
              if (means(gy)(gx + 1) > means(gy)(gx)) hash |= (1L << i)
              i += 1
            }
            (id, hash, true)
          }
        }
      }
      .toDF("id", "phash", "ok")
  }
}
