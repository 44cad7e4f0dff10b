package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.2 M4): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, batch-decoded per
  * partition. The decode kernels are STUBS — this container has no
  * image/audio libraries — but everything Spark-side is real: schema,
  * partition-parallel batch decode, pushdown-friendly metadata columns.
  *
  * The decode path mirrors the `mapInPandas` batch model: one iterator of
  * rows per partition, decode amortized across the batch, typed output
  * schema declared up front. Swap `decodeStub` for a JNI/FFM image kernel
  * without touching the plumbing.
  */
object Multimodal {

  /** Media row: payload + metadata the pipeline carries for pruning. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType)))

  /** Deterministic synthetic media table derived from `documents` —
    * payload = utf8 bytes of the text (a stand-in for image bytes). */
  def synthesize(docs: DataFrame): DataFrame =
    Par.widen(docs, "doc_id").select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  final case class Decoded(media_id: Long, mime: String, width: Int,
                           height: Int, channels: Int, ok: Boolean)

  /** STUB decode kernel: a real implementation would parse the container
    * header (PNG IHDR / WAV fmt / MP4 moov). The stub derives deterministic
    * pseudo-dimensions from payload bytes so the distributed plumbing is
    * testable end-to-end. */
  private def decodeStub(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    val w = 64 + (n % 960)          // 64..1023 "pixels"
    val h = 64 + ((n * 31) % 960)
    val c = if (mime != null && mime.startsWith("audio")) 1 else 3
    (w, h, c)
  }

  /** Partition-parallel batch decode: binary payload → typed metadata.
    * mapPartitions (not per-row UDF) so a real decoder can amortize
    * codec/context setup across the batch — the Scala analog of
    * mapInPandas. */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "mime")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts etc.)
        it.map { case (id, payload, mime) =>
          val (w, h, c) = decodeStub(payload, mime)
          Decoded(id, mime, w, h, c, ok = payload != null && payload.nonEmpty)
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
