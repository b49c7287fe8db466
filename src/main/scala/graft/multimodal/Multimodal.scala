package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, processed per-partition in
  * iterator (batch) shape — the Scala analogue of an Arrow-batched
  * `mapInPandas` stage.
  *
  * The container has no image/audio codecs, so the DECODE INNARDS ARE A
  * DETERMINISTIC FAKE (documented stub): payloads carry a real 24-byte
  * header that [[decode]] genuinely parses byte-by-byte, and a pseudo-random
  * body standing in for compressed media. Everything Spark-side — schemas,
  * binary round-trip, partition-streaming iterator shape, explode of
  * sampled frames, feature vectors feeding the similarity operators — is
  * real and tested. Swapping the stub for a codec changes only the body
  * functions, not the plumbing.
  *
  * Header layout (little-endian): magic int ('GMM0'), media_type byte
  * (0=image 1=audio 2=video), width int, height int, channels byte,
  * duration_ms int, body_len int, pad to 24.
  *
  * Metadata fields derive arithmetically from doc_id (width =
  * 64+32*(id%16), …), so the DuckDB oracle can verify the Spark-side
  * encode→decode round-trip from the `documents` table without seeing any
  * bytes.
  */
object Multimodal {

  val Magic: Int = 0x474d4d30 // "GMM0"
  val HeaderLen: Int = 24

  final case class Media(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte])

  final case class DecodedMeta(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      channels: Int,
      duration_ms: Int,
      body_len: Int)

  private val typeNames = Array("image", "audio", "video")

  // --- deterministic metadata derivations (mirrored by the SQL oracle) ---
  def widthOf(id: Long): Int = 64 + 32 * (id % 16).toInt
  def heightOf(id: Long): Int = 64 + 32 * (id % 9).toInt
  def channelsOf(id: Long): Int = 1 + (id % 4).toInt
  def durationOf(id: Long): Int = 1000 + 500 * (id % 60).toInt
  def typeOf(id: Long): String = typeNames((id % 3).toInt)
  def bodyLenOf(id: Long, nChars: Long): Int = (16 + nChars % 240).toInt

  /** xorshift64* — deterministic body bytes standing in for compressed
    * media (public-domain PRNG, Vigna 2016).
    */
  private def fakeBody(seed: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var x = if (seed == 0) 0x9e3779b97f4a7c15L else seed
    var i = 0
    while (i < len) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      out(i) = ((x * 0x2545f4914f6cdd1dL) >>> 56).toByte
      i += 1
    }
    out
  }

  def encodeOne(id: Long, nChars: Long): Array[Byte] = {
    val bodyLen = bodyLenOf(id, nChars)
    val buf = ByteBuffer.allocate(HeaderLen + bodyLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.put((id % 3).toByte)
    buf.putInt(widthOf(id))
    buf.putInt(heightOf(id))
    buf.put(channelsOf(id).toByte)
    buf.putInt(durationOf(id))
    buf.putInt(bodyLen)
    buf.put(0.toByte) // pad to 24
    buf.put(fakeBody(id, bodyLen))
    buf.array()
  }

  def decodeOne(payload: Array[Byte]): Option[DecodedMeta] = {
    if (payload == null || payload.length < HeaderLen) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.getInt() != Magic) return None
    val t = buf.get()
    val w = buf.getInt()
    val h = buf.getInt()
    val c = buf.get()
    val d = buf.getInt()
    val bl = buf.getInt()
    if (payload.length != HeaderLen + bl) return None
    Some(DecodedMeta(-1L, typeNames(t.toInt), w, h, c.toInt, d, bl))
  }

  /** Synthesize the media table from `documents`: one binary payload per
    * doc. Runs as a partition-streaming map (no shuffle; the encode is
    * embarrassingly parallel, exactly how a 100 TB decode stage must run).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        Media(id, typeOf(id), encodeOne(id, nChars))
      })
  }

  /** Decode stage: binary → typed metadata, iterator-shaped per partition
    * (rows stream through; nothing materializes a whole partition).
    * Undecodable payloads are dropped, mirroring a skip-on-error decode.
    */
  def decode(media: Dataset[Media]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeOne(m.payload).map(_.copy(doc_id = m.doc_id))
    })
  }

  /** Feature extraction stub: payload body → dim-length float vector
    * (per-byte accumulation into banded sums, L2-normalized). Stands in for
    * an embedding model; output feeds the similarity/dedup operators
    * unchanged (same ARRAY<FLOAT> shape as the embeddings table).
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val body = m.payload.drop(HeaderLen)
      val acc = new Array[Float](dim)
      var i = 0
      while (i < body.length) {
        acc(i % dim) += (body(i) & 0xff) / 255.0f
        i += 1
      }
      val nrm = math.sqrt(acc.map(v => v.toDouble * v).sum)
      val unit =
        if (nrm == 0) acc else acc.map(v => (v / nrm).toFloat)
      (m.doc_id, m.media_type, unit)
    }).toDF("doc_id", "media_type", "features")
  }

  /** Resize stage: rewrites the header dims (the stub's stand-in for pixel
    * resampling) and re-derives a body scaled to the new area — metadata
    * and payload stay consistent, so a resize→decode round-trip is
    * verifiable.
    */
  def resize(media: Dataset[Media], newWidth: Int, newHeight: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      decodeOne(m.payload) match {
        case Some(meta) if m.media_type == "image" =>
          val buf = ByteBuffer.allocate(HeaderLen + meta.body_len)
            .order(ByteOrder.LITTLE_ENDIAN)
          buf.putInt(Magic).put(0.toByte)
            .putInt(newWidth).putInt(newHeight)
            .put(meta.channels.toByte)
            .putInt(meta.duration_ms).putInt(meta.body_len).put(0.toByte)
          buf.put(fakeBody(m.doc_id, meta.body_len))
          m.copy(payload = buf.array())
        case _ => m
      }
    })
  }

  /** Frame sampling: one row per sampled frame of each video, frame
    * timestamps every `everyMs`. The explode happens on the typed side
    * (iterator flatMap), so a long video streams frames without
    * materializing them all.
    */
  def sampleFrames(media: Dataset[Media], everyMs: Int = 1000): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeOne(m.payload) match {
        case Some(meta) if meta.media_type == "video" =>
          (0 until meta.duration_ms by everyMs).iterator.map { t =>
            // frame payload: a body slice keyed by (doc, t) — stub for a
            // decoded frame image
            (m.doc_id, t, fakeBody(m.doc_id ^ t.toLong, 32))
          }
        case _ => Iterator.empty
      }
    }).toDF("doc_id", "frame_ms", "frame")
  }

  // ---- oracle-checked query surface ----

  /** Decode round-trip stats: encode → decode on the Spark side; the
    * oracle computes the same aggregates arithmetically from doc_id. Proves
    * header serialization both ways.
    */
  def decodeStats(spark: SparkSession, sfDir: String): DataFrame =
    decode(mediaTable(spark, sfDir))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n"),
        sum("width").as("sum_width"),
        sum("height").as("sum_height"),
        sum("channels").as("sum_channels"),
        sum("duration_ms").as("sum_duration_ms"),
        sum("body_len").as("sum_body_len"))
      .orderBy("media_type")

  /** Sampled-frame counts per video: frame count = ceil(duration/everyMs),
    * SQL-expressible for the oracle.
    */
  def frameCounts(spark: SparkSession, sfDir: String, everyMs: Int = 1000): DataFrame =
    sampleFrames(mediaTable(spark, sfDir), everyMs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        max(col("frame_ms").cast("long")).as("last_frame_ms"))
      .orderBy("doc_id")

  /** Resize round-trip: resize all images to 224×224, decode, aggregate —
    * images report the new dims, audio/video pass through untouched.
    */
  def resizeStats(spark: SparkSession, sfDir: String): DataFrame =
    decode(resize(mediaTable(spark, sfDir), 224, 224))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n"),
        sum("width").as("sum_width"),
        sum("height").as("sum_height"))
      .orderBy("media_type")
}
