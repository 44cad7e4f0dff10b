package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Malformed-media fuzz (r12): at 100 TB a corpus WILL contain truncated
  * uploads, bit-rotted blocks, mislabeled mimes, and adversarial
  * containers — every media kernel's contract is "classify (ok=false),
  * never throw". Seeded random payloads across five malformation
  * families, driven through all four kernels (decode, audioStats,
  * audioFingerprint, dHash) in one Spark pass each; any task exception
  * fails the suite. Valid-payload controls are interleaved so a kernel
  * that "passes" by rejecting EVERYTHING is caught too. */
class MediaFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("600 malformed payloads: every kernel classifies, never throws; controls stay ok") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    def flip(p: Array[Byte], n: Int): Array[Byte] = {
      val c = p.clone()
      (0 until n).foreach { _ =>
        val i = rnd.nextInt(c.length)
        c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      c
    }
    val rows = (0 until 600).map { i =>
      val id = i.toLong
      val fam = i % 6
      val (payload, mime, valid) = fam match {
        case 0 => // random garbage under a known mime
          val p = new Array[Byte](rnd.nextInt(200))
          rnd.nextBytes(p)
          (p, Seq("image/png", "audio/wav", "video/mp4")(i % 3), false)
        case 1 => // truncated valid containers (cut anywhere, incl. header)
          val full = if (i % 2 == 0) Multimodal.synthWavBytes(id)
            else Multimodal.synthPngBytes(id)
          (full.take(rnd.nextInt(full.length)),
            if (i % 2 == 0) "audio/wav" else "image/png", false)
        case 2 => // bit-flipped valid containers: must CLASSIFY either way
          // (a flip in the data chunk still parses; a flip in a header
          // field may not) — the contract under test is only never-throw
          val full = Multimodal.synthToneWavBytes(id, 1)
          (flip(full, 1 + rnd.nextInt(8)), "audio/wav", false)
        case 3 => // mislabeled: valid bytes of ANOTHER mime
          (Multimodal.synthPngBytes(id), "audio/wav", false)
        case 4 => // adversarial sizes: RIFF/moov headers with huge or
          // negative chunk/box size fields
          val p = Multimodal.synthWavBytes(id)
          val bb = java.nio.ByteBuffer.wrap(p)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.putInt(16, Seq(Int.MaxValue, -1, Int.MinValue)(i % 3)) // fmt size
          (p, "audio/wav", false)
        case _ => // valid control row
          (Multimodal.synthToneWavBytes(id - id % 3, 1 << (id % 3).toInt),
            "audio/wav", true)
      }
      (id, payload, mime, valid)
    }
    val media = rows.map { case (id, p, m, _) => (id, p, m, Option(p).map(_.length.toLong).getOrElse(0L)) }
      .toDF("media_id", "payload", "mime", "n_bytes")
    val validIds = rows.collect { case (id, _, _, true) => id }.toSet

    // decode: one pass, no exception, controls ok=true
    val dec = Multimodal.decode(media).collect()
    assert(dec.length == 600)
    validIds.foreach(id => assert(dec.find(_.media_id == id).get.ok,
      s"control $id must decode"))

    // audioStats: controls report the full 650 samples
    val st = Multimodal.audioStats(media).collect()
    assert(st.length == 600)
    validIds.foreach { id =>
      val r = st.find(_.media_id == id).get
      assert(r.ok && r.n_samples == 650L, s"control $id stats: $r")
    }

    // audioFingerprint: controls collapse onto their volume family
    val fp = Multimodal.audioFingerprint(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(fp.size == 600)
    validIds.foreach(id => assert(fp(id)._2, s"control $id must fingerprint"))
    validIds.groupBy(id => id - id % 3).values.foreach { fam =>
      assert(fam.map(id => fp(id)._1).size >= 1 &&
        fam.map(id => fp(id)._1).toSet.size == 1,
        s"family $fam must share one fingerprint")
    }

    // dHash: never throws on any payload (PNG controls are in family 1's
    // untruncated complement — use fresh valid PNGs as its control)
    val withPng = media.union(Seq(
      (9001L, Multimodal.synthPngBytes(7L), "image/png", 0L),
      (9002L, Multimodal.synthPngBytes(8L), "image/png", 0L))
      .toDF("media_id", "payload", "mime", "n_bytes"))
    val dh = Multimodal.dHash(withPng).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(dh.size == 602 && dh(9001L) && dh(9002L))
  }
}
