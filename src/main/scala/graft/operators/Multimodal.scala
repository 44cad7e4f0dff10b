package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.2 M4): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, batch-decoded per
  * partition. IMAGE decode is REAL — `javax.imageio` (JDK-bundled, no
  * external library) parses the PNG/JPEG payload on the executor and the
  * decoded width/height/channels are what the gate oracles check. The
  * audio/video kernels remain deterministic stubs (no codec libraries in
  * this container), kept as the fallback for unknown mimes, so the
  * plumbing — schema, partition-parallel batch decode, pushdown-friendly
  * metadata columns — is exercised end-to-end either way.
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

  /** Deterministic synthetic media table derived from `documents`: the
    * image/png rows carry REAL PNG bytes ([[synthPngBytes]] — dimensions
    * a pure function of media_id, so decode output is oracle-checkable);
    * audio/video rows carry the utf8 text bytes (stand-in payloads for
    * the stub kernels). Payload synthesis is a mapPartitions kernel, not
    * a per-row UDF, matching the decode side's batch shape. */
  def synthesize(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Par.widen(docs, "doc_id").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no executor-disk scratch
        it.map { case (id, text) =>
          val mime =
            if (id % 3 == 0) "image/png"
            else if (id % 3 == 1) "audio/wav"
            else "video/mp4"
          val payload: Array[Byte] =
            if (id % 3 == 0) synthPngBytes(id)
            else Option(text).getOrElse("").getBytes("UTF-8")
          (id, payload, mime, payload.length.toLong)
        }
      }
      .toDF("media_id", "payload", "mime", "n_bytes")
  }

  final case class Decoded(media_id: Long, mime: String, width: Int,
                           height: Int, channels: Int, ok: Boolean)

  /** STUB decode kernel for the codec-less mimes (audio/video): a real
    * implementation would parse the container header (WAV fmt / MP4
    * moov). The stub derives deterministic pseudo-dimensions from payload
    * bytes so the distributed plumbing is testable end-to-end. */
  private def decodeStub(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    val w = 64 + (n % 960)          // 64..1023 "pixels"
    val h = 64 + ((n * 31) % 960)
    val c = if (mime != null && mime.startsWith("audio")) 1 else 3
    (w, h, c)
  }

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
    * Image mimes decode for REAL via ImageIO; other mimes fall back to
    * the deterministic stub. mapPartitions (not per-row UDF) so decoder
    * setup amortizes across the batch — the Scala analog of mapInPandas. */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "mime")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init
        it.map { case (id, payload, mime) =>
          val isImage = mime != null && mime.startsWith("image/")
          (if (isImage) decodeImage(payload) else None) match {
            case Some((w, h, c)) => Decoded(id, mime, w, h, c, ok = true)
            case None =>
              val (w, h, c) = decodeStub(payload, mime)
              // an IMAGE that failed real decode is a decode failure even
              // when bytes are present; stub mimes keep the old contract
              Decoded(id, mime, w, h, c,
                ok = !isImage && payload != null && payload.nonEmpty)
          }
        }
      }
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
}
