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
}
