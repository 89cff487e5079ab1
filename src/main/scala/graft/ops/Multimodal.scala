package graft.ops

import java.nio.ByteBuffer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in bounded batches.
  *
  * The actual codecs (JPEG decode, resampling, frame extraction) are STUBBED
  * behind [[FakeCodec]] — this container has no image/audio libraries — but
  * everything Spark-side is real and tested: the binary schema, the
  * partition-wise batch shape (mapPartitions ≈ mapInPandas batches: decode
  * state is amortized per partition, not per row), metadata structs, and the
  * partitioning. Swapping FakeCodec for JNI/javacv changes no plan shape.
  *
  * Scale notes: blobs never pass through a shuffle here — derivation is
  * per-row/per-partition; when a shuffle is unavoidable, ship (id, metadata)
  * and re-join blobs by id afterward.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, n_bytes: Long)
  final case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long, frame_sha: String)

  /** Deterministic fake media codec: a "GRFT" container whose header encodes
    * width/height/frames derived from the seed id; payload is seeded bytes.
    */
  object FakeCodec {
    val Magic = 0x47524654 // "GRFT"

    def encode(id: Long): Array[Byte] = {
      val width = 16 + (id % 64).toInt
      val height = 16 + (id % 48).toInt
      val frames = 1 + (id % 8).toInt
      val payload = new Array[Byte]((width * height / 8) * frames)
      var x = id * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < payload.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        payload(i) = (x >>> 56).toByte
        i += 1
      }
      val buf = ByteBuffer.allocate(16 + payload.length)
      buf.putInt(Magic).putInt(width).putInt(height).putInt(frames)
      buf.put(payload)
      buf.array()
    }

    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      val buf = ByteBuffer.wrap(bytes)
      require(buf.getInt() == Magic, "not a GRFT container")
      MediaMeta(id, buf.getInt(), buf.getInt(), buf.getInt(), bytes.length.toLong)
    }

    /** Resize stub: deterministic payload downsample to (w, h) per frame. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val buf = ByteBuffer.wrap(bytes)
      require(buf.getInt() == Magic, "not a GRFT container")
      val (w0, h0, frames) = (buf.getInt(), buf.getInt(), buf.getInt())
      val inFrame = w0 * h0 / 8
      val outFrame = w * h / 8
      val out = ByteBuffer.allocate(16 + outFrame * frames)
      out.putInt(Magic).putInt(w).putInt(h).putInt(frames)
      var f = 0
      while (f < frames) {
        var i = 0
        while (i < outFrame) {
          // nearest source byte (the stub's stand-in for pixel sampling)
          val src = 16 + f * inFrame + (i.toLong * inFrame / math.max(1, outFrame)).toInt
          out.put(bytes(math.min(src, bytes.length - 1)))
          i += 1
        }
        f += 1
      }
      out.array()
    }

    /** Feature stub: per-frame sha256 → first `dim` bytes as floats in
      * [-1, 1), mean-pooled across frames.
      */
    def features(md: java.security.MessageDigest, bytes: Array[Byte], dim: Int): Array[Float] = {
      val buf = ByteBuffer.wrap(bytes)
      require(buf.getInt() == Magic, "not a GRFT container")
      val (w, h, frames) = (buf.getInt(), buf.getInt(), buf.getInt())
      val frameSize = w * h / 8
      val acc = new Array[Float](dim)
      var f = 0
      while (f < frames) {
        md.reset()
        md.update(bytes, 16 + f * frameSize, frameSize)
        val d = md.digest()
        var i = 0
        while (i < dim) {
          acc(i) += (d(i % d.length) & 0xff).toFloat / 128f - 1f
          i += 1
        }
        f += 1
      }
      acc.map(_ / frames)
    }

    /** Frame sampling stub: every `stride`-th frame's offset + digest. */
    def sampleFrames(id: Long, bytes: Array[Byte], stride: Int): Seq[Frame] = {
      val m = decodeMeta(id, bytes)
      val frameSize = m.width * m.height / 8
      (0 until m.n_frames by stride).map { f =>
        val off = 16L + f.toLong * frameSize
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.update(bytes, off.toInt, frameSize)
        Frame(id, f, off, md.digest().map("%02x".format(_)).mkString)
      }
    }
  }

  /** Attach a synthesized media blob to each row (stand-in for reading real
    * blobs from object storage).
    */
  def withFakeMedia(df: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => FakeCodec.encode(id))
    df.withColumn("media", enc(col(idCol)))
  }

  /** Decode metadata per partition (batched decode, real plan shape). */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => FakeCodec.decodeMeta(id, bytes) } }
  }

  /** Frame-sample stub over video-like blobs (1 row → N frame rows). */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => FakeCodec.sampleFrames(id, bytes, stride) }
  }

  /** Resize stub: re-encode every blob at (w, h), deterministic nearest-
    * neighbor-ish downsample of the payload bytes. The Spark shape is the
    * real one — binary in, binary out, per-partition batches, blobs never
    * shuffled — so swapping in a real scaler changes no plan.
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => (id, FakeCodec.resize(bytes, w, h)) }
      }
      .toDF(idCol, "media")
  }

  /** Feature-extraction stub: blob → dense `dim`-float embedding. Features
    * are derived per frame then mean-pooled — the batch shape a real vision
    * encoder would use (amortized model state per PARTITION, not per row),
    * and the output column is the same `array<float>` the similarity ops
    * (Similarity/DedupOps) consume, so ANN over extracted features is one
    * `.transform` away.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      dim: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model" state: one digest instance reused
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) => (id, FakeCodec.features(md, bytes, dim)) }
      }
      .toDF(idCol, "features")
  }
}
