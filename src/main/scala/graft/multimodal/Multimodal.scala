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
  * All payloads are REAL formats, pure-JVM byte parsing (no library),
  * one per media type: 24-bit uncompressed BMP
  * ([[encodeBmp]]/[[decodeBmp]] — BITMAPFILEHEADER + BITMAPINFOHEADER,
  * bottom-up rows, BGR byte order, 4-byte row padding), PCM-16 mono WAV
  * ([[encodeWav]]/[[decodeWav]] — RIFF chunk walk tolerating unknown
  * chunks), and uncompressed AVI video ([[encodeAvi]]/[[decodeAvi]] —
  * RIFF 'AVI ' tree: avih/strh/strf headers, '00db' DIB frames, idx1
  * index). The generic plumbing ([[mediaTable]]/[[decode]]/[[resize]]/
  * [[sampleFrames]]/[[extractFeatures]]) runs on the same real payloads:
  * [[decode]] sniffs the container magic and walks the actual format,
  * [[resize]] genuinely resamples pixels (nearest-neighbor) and
  * re-encodes, [[sampleFrames]] decodes real AVI frames and emits each
  * kept frame as a real BMP. Real pixels/samples/frames also reduce to
  * oracle-checked features (integer BT.601 luminance mass, sample
  * energy, per-frame sampled luminance: [[bmpLuminance]], [[wavEnergy]],
  * [[aviFrameLuminance]]).
  *
  * Every payload derives arithmetically from doc_id (dims, sample
  * values, pixel channels are affine mod forms), so the DuckDB oracle
  * can verify Spark-side encode→decode round-trips from the `documents`
  * table without seeing any bytes — while the Spark side genuinely
  * parses them byte-by-byte.
  */
object Multimodal {

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

  def typeOf(id: Long): String = typeNames((id % 3).toInt)

  /** The real payload for a doc: BMP image (doc_id%3=0), PCM-16 WAV
    * audio (=1), uncompressed AVI video (=2) — the same id→type mapping
    * the codec-specific queries filter on.
    */
  def encodeOne(id: Long): Array[Byte] = (id % 3).toInt match {
    case 0 => encodeBmp(id)
    case 1 => encodeWav(id)
    case _ => encodeAvi(id)
  }

  /** Sniff the container magic and parse the REAL format into typed
    * metadata: BMP → dims + 3 channels + pixel-data mass; WAV → sample
    * rate-derived duration + PCM byte mass; AVI → dims + frame-derived
    * duration + frame byte mass. Unknown/corrupt bytes → None.
    */
  def decodeOne(payload: Array[Byte]): Option[DecodedMeta] = {
    if (payload == null || payload.length < 12) return None
    def fourcc(at: Int): String =
      new String(payload.slice(at, at + 4), "US-ASCII")
    if (payload(0) == 'B' && payload(1) == 'M')
      decodeBmp(payload).map { img =>
        val rowSize = (img.width * 3 + 3) / 4 * 4
        DecodedMeta(-1L, "image", img.width, img.height, 3, 0,
          rowSize * img.height)
      }
    else if (fourcc(0) == "RIFF" && fourcc(8) == "WAVE")
      decodeWav(payload).map { c =>
        DecodedMeta(-1L, "audio", 0, 0, 1,
          c.samples.length * 1000 / c.sampleRate, 2 * c.samples.length)
      }
    else if (fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      decodeAvi(payload).map { c =>
        val rowSize = (c.width * 3 + 3) / 4 * 4
        DecodedMeta(-1L, "video", c.width, c.height, 3,
          c.frames.length * c.msPerFrame,
          c.frames.length * rowSize * c.height)
      }
    else None
  }

  /** Synthesize the media table from `documents`: one real binary payload
    * per doc. Runs as a partition-streaming map (no shuffle; the encode is
    * embarrassingly parallel, exactly how a 100 TB decode stage must run).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        Media(id, typeOf(id), encodeOne(id))
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

  /** Feature extraction stub: payload bytes → dim-length float vector
    * (per-byte accumulation into banded sums, L2-normalized). Stands in for
    * an embedding model; output feeds the similarity/dedup operators
    * unchanged (same ARRAY<FLOAT> shape as the embeddings table).
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val body = m.payload
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

  /** Resize stage: REAL nearest-neighbor pixel resampling for images —
    * decode the BMP, sample source pixels at (r·h/newH, c·w/newW),
    * re-encode. Audio/video pass through untouched. Row-local
    * (partition-streaming map, no shuffle), and the output is a valid BMP
    * any decoder re-reads — so a resize→decode round-trip is verifiable.
    */
  def resize(media: Dataset[Media], newWidth: Int, newHeight: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.media_type != "image") m
      else decodeBmp(m.payload) match {
        case Some(img) =>
          val px = new Array[Int](newWidth * newHeight)
          var r = 0
          while (r < newHeight) {
            val sr = r * img.height / newHeight
            var c = 0
            while (c < newWidth) {
              val sc = c * img.width / newWidth
              px(r * newWidth + c) = img.pixels(sr * img.width + sc)
              c += 1
            }
            r += 1
          }
          m.copy(payload = encodeBmpFromPixels(newWidth, newHeight, px))
        case None => m
      }
    })
  }

  /** Frame sampling: decode each video's REAL AVI frames and keep every
    * `step`-th one (the sampling stage of a video-curation pipeline),
    * emitting the kept frame as a real BMP payload with its
    * frame-period-derived timestamp. The explode happens on the typed
    * side (iterator flatMap), so a long video streams frames without
    * materializing them all.
    */
  def sampleFrames(media: Dataset[Media], step: Int = AviSampleStep): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.media_type != "video") Iterator.empty
      else decodeAvi(m.payload) match {
        case Some(clip) =>
          clip.frames.iterator.zipWithIndex
            .filter(_._2 % step == 0)
            .map { case (fpx, f) =>
              (m.doc_id, f * clip.msPerFrame,
                encodeBmpFromPixels(clip.width, clip.height, fpx))
            }
        case None => Iterator.empty
      }
    }).toDF("doc_id", "frame_ms", "frame")
  }

  // ---- real codecs: BMP (24-bit uncompressed) and WAV (PCM-16 mono) ----

  /** Fixture image dims — small (≤16×10) so the per-pixel oracle stays
    * cheap; the decode path is identical at any size.
    */
  def bmpWidthOf(id: Long): Int = 8 + (id % 9).toInt
  def bmpHeightOf(id: Long): Int = 4 + (id % 7).toInt

  /** Deterministic pixel channels (each mod-256 of an affine form the SQL
    * oracle reproduces): blue/green/red vary per (row, col).
    */
  def pixelOf(id: Long, r: Int, c: Int): (Int, Int, Int) = (
    ((id * 3 + r + c) % 256).toInt, // red
    ((id * 2 + r + c) % 256).toInt, // green
    ((id + r + c) % 256).toInt) // blue

  /** A REAL 24-bit uncompressed BMP: 14-byte BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER + bottom-up pixel rows in BGR order, each row padded
    * to a 4-byte boundary (the format as published; decodable by any image
    * viewer).
    */
  def encodeBmp(id: Long): Array[Byte] = {
    val w = bmpWidthOf(id); val h = bmpHeightOf(id)
    val px = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val (red, green, blue) = pixelOf(id, r, c)
        px(r * w + c) = (red << 16) | (green << 8) | blue
        c += 1
      }
      r += 1
    }
    encodeBmpFromPixels(w, h, px)
  }

  /** Serialize row-major top-down 0xRRGGBB pixels as a real 24-bit BMP
    * (shared by [[encodeBmp]], [[resize]], and [[sampleFrames]]'s
    * frame-image emission).
    */
  def encodeBmpFromPixels(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putShort(0).putShort(0).putInt(54) // file header
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0) // info header
    var fileRow = 0
    while (fileRow < h) {
      val r = h - 1 - fileRow // bottom-up: first stored row is the last
      var c = 0
      while (c < w) {
        val p = px(r * w + c)
        buf.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte)
          .put(((p >> 16) & 0xff).toByte)
        c += 1
      }
      var pad = w * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    buf.array()
  }

  final case class BmpImage(width: Int, height: Int,
                            pixels: Array[Int] /* row-major 0xRRGGBB */)

  /** Parse a 24-bit uncompressed BMP byte-by-byte: honors the pixel-data
    * offset field, positive (bottom-up) or negative (top-down) height,
    * BGR order, and row padding. Returns row-major top-down pixels.
    */
  def decodeBmp(payload: Array[Byte]): Option[BmpImage] = {
    if (payload == null || payload.length < 54) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get(0) != 'B' || buf.get(1) != 'M') return None
    val offset = buf.getInt(10)
    val w = buf.getInt(18)
    val rawH = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (bpp != 24 || compression != 0 || w <= 0 || rawH == 0) return None
    val bottomUp = rawH > 0
    val h = math.abs(rawH)
    val rowSize = (w * 3 + 3) / 4 * 4
    if (payload.length < offset + rowSize * h) return None
    val px = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      val fileRow = if (bottomUp) h - 1 - r else r
      var base = offset + fileRow * rowSize
      var c = 0
      while (c < w) {
        val blue = payload(base) & 0xff
        val green = payload(base + 1) & 0xff
        val red = payload(base + 2) & 0xff
        px(r * w + c) = (red << 16) | (green << 8) | blue
        base += 3
        c += 1
      }
      r += 1
    }
    Some(BmpImage(w, h, px))
  }

  /** Fixture audio length — ≤163 samples for oracle cost; real clips just
    * take longer to walk.
    */
  def wavSamplesOf(id: Long): Int = 64 + (id % 100).toInt

  /** Deterministic PCM-16 sample i (full int16 range, SQL-reproducible). */
  def sampleOf(id: Long, i: Int): Int =
    ((id * 31 + i.toLong * 7) % 65536).toInt - 32768

  /** A REAL PCM-16 mono WAV: RIFF header, canonical fmt chunk (PCM,
    * 1 channel, 8 kHz, 16-bit), data chunk of little-endian int16 samples.
    */
  def encodeWav(id: Long): Array[Byte] = {
    val n = wavSamplesOf(id)
    val dataLen = 2 * n
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sampleOf(id, i).toShort); i += 1 }
    buf.array()
  }

  final case class WavClip(sampleRate: Int, samples: Array[Int])

  /** Walk the RIFF chunk list (skipping unknown chunks — the tolerance a
    * real-world WAV needs for LIST/INFO metadata), require canonical
    * PCM-16 mono, return the decoded samples.
    */
  def decodeWav(payload: Array[Byte]): Option[WavClip] = {
    if (payload == null || payload.length < 12) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String =
      new String(payload.slice(at, at + 4), "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var pos = 12
    var sampleRate = 0
    var pcm16Mono = false
    while (pos + 8 <= payload.length) {
      val id = fourcc(pos)
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > payload.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = buf.getShort(pos + 8)
          val channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          pcm16Mono = audioFormat == 1 && channels == 1 && bits == 16
        case "data" =>
          if (!pcm16Mono) return None
          val n = len / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(pos + 8 + 2 * i).toInt; i += 1 }
          return Some(WavClip(sampleRate, out))
        case _ => // skip unknown chunk (word-aligned)
      }
      pos += 8 + len + (len & 1)
    }
    None
  }

  // ---- real video: uncompressed AVI ('00db' DIB frames) ----

  /** Fixture video geometry — small dims / few frames so the per-pixel
    * oracle stays cheap; the container walk is identical at any size.
    */
  def aviWidthOf(id: Long): Int = 8 + (id % 5).toInt
  def aviHeightOf(id: Long): Int = 4 + (id % 4).toInt
  def aviFramesOf(id: Long): Int = 2 + (id % 5).toInt

  /** Per-video frame period in ms (avih dwMicroSecPerFrame / 1000; kept a
    * whole ms so frame timestamps stay integer-exact for the oracle).
    */
  def aviMsPerFrameOf(id: Long): Int = 20 + (id % 30).toInt

  /** Deterministic frame pixel (id, frame, row, col) → (R, G, B); affine
    * mod-256 forms the SQL oracle reproduces. Varies per FRAME so a
    * decoder that misorders or repeats frames flips the hash.
    */
  def framePixelOf(id: Long, f: Int, r: Int, c: Int): (Int, Int, Int) = (
    ((id * 3 + f * 5 + r + c) % 256).toInt, // red
    ((id * 2 + f * 3 + r + c) % 256).toInt, // green
    ((id + f + r + c) % 256).toInt) // blue

  /** A REAL uncompressed AVI (the format as published; plays in any
    * player): RIFF 'AVI ' with a LIST hdrl (avih main header + LIST strl
    * holding a 'vids'/'DIB ' strh and a BITMAPINFOHEADER strf), a LIST
    * movi of one '00db' chunk per frame (bottom-up BGR DIB rows, 4-byte
    * row padding — the BMP pixel layout inside a video container), and a
    * trailing idx1 index the decoder must tolerate.
    */
  def encodeAvi(id: Long): Array[Byte] = {
    val w = aviWidthOf(id); val h = aviHeightOf(id)
    val nf = aviFramesOf(id); val msPf = aviMsPerFrameOf(id)
    val rowSize = (w * 3 + 3) / 4 * 4
    val frameSize = rowSize * h
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + nf * (8 + frameSize)
    val idx1Size = 16 * nf
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(msPf * 1000) // dwMicroSecPerFrame
      .putInt(frameSize * 1000 / msPf) // dwMaxBytesPerSec
      .putInt(0).putInt(0x10) // padding, AVIF_HASINDEX
      .putInt(nf).putInt(0).putInt(1).putInt(frameSize) // frames, initial, streams, bufsize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, initial
      .putInt(msPf).putInt(1000) // dwScale/dwRate: fps = rate/scale... (rate=1000, scale=msPf)
      .putInt(0).putInt(nf).putInt(frameSize).putInt(-1).putInt(0) // start, length, bufsize, quality, samplesize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0) // BITMAPINFOHEADER, BI_RGB
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    val frameOffsets = new Array[Int](nf)
    var f = 0
    while (f < nf) {
      // idx1 offsets are measured from the 'movi' fourcc (first frame = 4)
      frameOffsets(f) = buf.position() - (12 + 8 + hdrlSize + 8)
      fourcc("00db"); buf.putInt(frameSize)
      var fileRow = 0
      while (fileRow < h) {
        val r = h - 1 - fileRow // bottom-up like BMP
        var c = 0
        while (c < w) {
          val (red, green, blue) = framePixelOf(id, f, r, c)
          buf.put(blue.toByte).put(green.toByte).put(red.toByte)
          c += 1
        }
        var pad = w * 3
        while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
        fileRow += 1
      }
      f += 1
    }
    fourcc("idx1"); buf.putInt(idx1Size)
    f = 0
    while (f < nf) {
      fourcc("00db")
      buf.putInt(0x10).putInt(frameOffsets(f)).putInt(frameSize) // AVIIF_KEYFRAME
      f += 1
    }
    buf.array()
  }

  final case class AviClip(width: Int, height: Int, msPerFrame: Int,
                           frames: Array[Array[Int]] /* row-major 0xRRGGBB */)

  /** Walk a RIFF AVI back: verify the 'AVI ' form, find LIST hdrl and read
    * the avih main header (frame period, declared frame count, dims),
    * require an uncompressed 24-bit strf, then iterate the LIST movi
    * '00db'/'00dc' chunks decoding each DIB frame (bottom-up BGR, padded
    * rows). Unknown chunks (idx1, JUNK, INFO) are skipped word-aligned —
    * the same tolerance discipline as [[decodeWav]].
    */
  def decodeAvi(payload: Array[Byte]): Option[AviClip] = {
    if (payload == null || payload.length < 12) return None
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String =
      new String(payload.slice(at, at + 4), "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var w = 0; var h = 0; var msPf = 0; var declaredFrames = -1
    var fmtOk = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    def decodeFrame(at: Int, len: Int): Option[Array[Int]] = {
      val rowSize = (w * 3 + 3) / 4 * 4
      if (w <= 0 || h <= 0 || len < rowSize * h) return None
      val px = new Array[Int](w * h)
      var r = 0
      while (r < h) {
        var base = at + (h - 1 - r) * rowSize
        var c = 0
        while (c < w) {
          val blue = payload(base) & 0xff
          val green = payload(base + 1) & 0xff
          val red = payload(base + 2) & 0xff
          px(r * w + c) = (red << 16) | (green << 8) | blue
          base += 3
          c += 1
        }
        r += 1
      }
      Some(px)
    }
    // walk one chunk run [from, until); returns false on a malformed chunk
    def walk(from: Int, until: Int): Boolean = {
      var pos = from
      while (pos + 8 <= until) {
        val id = fourcc(pos)
        val len = buf.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > until) return false
        id match {
          case "LIST" if len >= 4 =>
            val listType = fourcc(pos + 8)
            if (listType == "hdrl" || listType == "strl" || listType == "movi") {
              if (!walk(pos + 12, pos + 8 + len)) return false
            } // other list types (INFO…) skipped
          case "avih" if len >= 40 =>
            msPf = buf.getInt(pos + 8) / 1000
            declaredFrames = buf.getInt(pos + 24)
            w = buf.getInt(pos + 40)
            h = buf.getInt(pos + 44)
          case "strf" if len >= 40 =>
            // BITMAPINFOHEADER: require uncompressed 24-bit (BI_RGB)
            fmtOk = buf.getShort(pos + 8 + 14) == 24 && buf.getInt(pos + 8 + 16) == 0
          case "00db" | "00dc" =>
            if (!fmtOk) return false
            decodeFrame(pos + 8, len) match {
              case Some(px) => frames += px
              case None => return false
            }
          case _ => // skip unknown chunk (strh, idx1, JUNK, …)
        }
        pos += 8 + len + (len & 1)
      }
      true
    }
    if (!walk(12, payload.length)) return None
    if (w <= 0 || h <= 0 || frames.isEmpty) return None
    if (declaredFrames >= 0 && declaredFrames != frames.length) return None
    Some(AviClip(w, h, msPf, frames.toArray))
  }

  // ---- oracle-checked query surface ----

  /** Decode round-trip stats over the REAL codecs: encode → sniff →
    * format-walk decode on the Spark side; the oracle computes the same
    * aggregates arithmetically from doc_id (dims, sample counts, frame
    * geometry are affine mod forms). Proves container serialization both
    * ways for all three formats at once.
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

  /** Sampled-frame counts per video over REAL AVI decode: kept frames =
    * ceil(n_frames/step), last timestamp = last kept index × frame
    * period — both affine in doc_id, SQL-expressible for the oracle.
    */
  def frameCounts(spark: SparkSession, sfDir: String, step: Int = AviSampleStep): DataFrame =
    sampleFrames(mediaTable(spark, sfDir), step)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        max(col("frame_ms").cast("long")).as("last_frame_ms"))
      .orderBy("doc_id")

  /** Resize round-trip: nearest-neighbor-resample all images to 224×224,
    * decode the re-encoded BMPs, aggregate — images report the new dims,
    * audio/video pass through untouched.
    */
  def resizeStats(spark: SparkSession, sfDir: String): DataFrame =
    decode(resize(mediaTable(spark, sfDir), 224, 224))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n"),
        sum("width").as("sum_width"),
        sum("height").as("sum_height"))
      .orderBy("media_type")

  /** REAL image decode end-to-end: every image doc encodes to a genuine
    * 24-bit BMP whose bytes the decoder re-reads (offset field, bottom-up
    * rows, BGR channel order, 4-byte row padding), reduced to the integer
    * BT.601 luminance mass Σ(299R+587G+114B). The DuckDB oracle computes
    * the same bucketed sums arithmetically per pixel — a decoder that
    * misreads row order, channel order, padding, or the offset flips the
    * hash. Encode+decode are row-local (partition-streaming map, no
    * shuffle until the bucket rollup), the 100 TB decode-stage shape.
    */
  def bmpLuminance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions(_.map { id =>
        val img = decodeBmp(encodeBmp(id)).get
        var luma = 0L
        img.pixels.foreach { p =>
          luma += 299L * ((p >> 16) & 0xff) +
            587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        }
        (id % 10, img.width.toLong * img.height, luma)
      })
      .toDF("bucket", "px", "luma")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_images"),
        sum("px").as("sum_pixels"),
        sum("luma").as("sum_luma_milli"))
      .orderBy("bucket")
  }

  /** Every `AviSampleStep`-th frame is kept by [[aviFrameLuminance]];
    * interpolated into the oracle SQL so the two sides cannot drift.
    */
  val AviSampleStep: Int = 2

  /** REAL video decode end-to-end: every video doc encodes to a genuine
    * uncompressed AVI whose RIFF tree the decoder walks back (avih frame
    * period + declared frame count, strf format gate, per-'00db' DIB
    * decode, idx1 skipped), then samples every [[AviSampleStep]]-th frame
    * — the frame-sampling stage of a video-curation pipeline — reducing
    * each to integer BT.601 luminance mass. The oracle recomputes every
    * sampled frame's pixels arithmetically AND the avih-derived timestamp
    * sum, so frame order, frame count, frame period, and pixel layout are
    * all pinned. Encode+decode+sample are row-local (partition-streaming
    * flatMap, no shuffle until the bucket rollup).
    */
  def aviFrameLuminance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions(_.flatMap { id =>
        val clip = decodeAvi(encodeAvi(id)).get
        clip.frames.iterator.zipWithIndex
          .filter(_._2 % AviSampleStep == 0)
          .map { case (fpx, f) =>
            var luma = 0L
            fpx.foreach { p =>
              luma += 299L * ((p >> 16) & 0xff) +
                587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
            }
            (id, f.toLong * clip.msPerFrame, fpx.length.toLong, luma)
          }
      })
      .toDF("doc_id", "frame_ms", "px", "luma")
      .groupBy((col("doc_id") % 10).cast("long").as("bucket"))
      .agg(countDistinct(col("doc_id")).as("n_videos"),
        count(lit(1)).as("n_frames"),
        sum("frame_ms").as("sum_frame_ms"),
        sum("px").as("sum_pixels"),
        sum("luma").as("sum_luma_milli"))
      .orderBy("bucket")
  }

  /** dHash sample-grid edge: [[imageDhash]] samples an 8×8 luminance
    * grid and compares horizontal neighbours — 8 rows × 7 comparisons =
    * 56 bits, deliberately < 63 so the fingerprint never touches the
    * BIGINT sign bit in either engine. Interpolated into the oracle.
    */
  val DhashGridRows: Int = 8
  val DhashGridCols: Int = 8 // comparisons per row = DhashGridCols - 1

  /** [[imageNearDups]] keeps pairs within this Hamming distance. With 7
    * byte-bands over the 56-bit fingerprint, pigeonhole makes the band
    * join EXACT for ≤ 6 differing bits (6 errors cannot dirty all 7
    * bands) — the [[graft.ops.Dedup.simhashPairs]] calculus.
    */
  val DhashMaxHamming: Int = 6

  /** Perceptual difference-hash per image (public aHash/dHash method:
    * sample a fixed grid of luminances from the decoded image, set bit
    * (r,c) iff grid(r,c) > grid(r,c+1) — brightness-gradient signs,
    * robust to uniform brightness shifts and resizing): the REAL BMP
    * bytes are decoded (offset field, bottom-up BGR rows, padding) and
    * the grid is nearest-neighbor sampled exactly like [[resize]]
    * (sr = r·h/8, sc = c·w/8, integer floor). All-integer — the oracle
    * recomputes every sampled pixel arithmetically from doc_id, so a
    * misread row order, channel order, or sample index flips the hash.
    * Row-local (partition-streaming map, no shuffle) — the 100 TB
    * fingerprint-stage shape.
    */
  def imageDhash(spark: SparkSession, sfDir: String): DataFrame =
    dhashCache.getOrElseUpdate((spark, sfDir),
      imageDhashUncached(spark, sfDir).localCheckpoint(true))

  /** [[imageDhash]] memoized per (session, sfDir) — the fingerprint
    * frame serves both the near-dup audit and the survivor action, so
    * one bench pass decodes each image's BMP once ([[graft.ops.Memo]]
    * drops the state between timed passes, keeping timings honest).
    */
  private val dhashCache = graft.ops.Memo.registry[(SparkSession, String)]

  /** dHash of ONE image id through the full codec path (encode → real
    * BMP decode → grid sample → gradient signs) — the per-row kernel
    * [[imageDhash]] maps over the corpus and the streaming probe maps
    * over each micro-batch, extracted so the two cannot drift. */
  def dhashOfId(id: Long): Long = {
    val img = decodeBmp(encodeBmp(id)).get
    gridDhash(img.pixels, img.width, img.height)
  }

  /** The dHash kernel over one decoded pixel plane (row-major 0xRRGGBB)
    * — shared by the image fingerprint ([[dhashOfId]]) and the
    * per-frame hashes of the video signature ([[videoDhash]]) so the
    * grid sampling and gradient-sign rules cannot drift between
    * modalities. */
  private[graft] def gridDhash(px: Array[Int], w: Int, h: Int): Long = {
    val rows = DhashGridRows; val cols = DhashGridCols
    def lum(r: Int, c: Int): Long = {
      val p = px(r * w + c)
      299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
        114L * (p & 0xff)
    }
    var hash = 0L
    var r = 0
    while (r < rows) {
      val sr = r * h / rows
      var c = 0
      while (c < cols - 1) {
        val sc = c * w / cols
        val sc2 = (c + 1) * w / cols
        if (lum(sr, sc) > lum(sr, sc2))
          hash |= 1L << (r * (cols - 1) + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  private def imageDhashUncached(spark: SparkSession,
                                 sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions(_.map(id => (id, dhashOfId(id))))
      .toDF("doc_id", "dhash")
  }

  /** Perceptual image near-dup audit — the multimodal × dedup
    * composition: [[imageDhash]] fingerprints banded into 7 bytes and
    * self-joined Hamming-≤[[DhashMaxHamming]] via the pigeonhole band
    * calculus of [[graft.ops.Dedup.simhashPairs]] (any qualifying pair
    * agrees on ≥ 1 band; each pair emitted ONLY at its lowest agreeing
    * band, so no distinct over the pair set). The synthetic gradient
    * images are honestly near-identical under any perceptual hash
    * (most share one fingerprint), so the report is the bucketed pair
    * rollup, not the O(corpus²) pair list: per doc_id%10 bucket —
    * pair count, exact-dup (Hamming 0) count, Hamming mass, max
    * Hamming. All integers; the oracle brute-forces the same pairs.
    *
    * Scale shape: candidates come only from band-bucket agreement
    * (gram-index discipline, never all-pairs); degenerate hot bands
    * (like this fixture's) are exactly the skew AQE's skew-join
    * handling splits.
    */
  def imageNearDups(spark: SparkSession, sfDir: String,
                    maxHamming: Int = DhashMaxHamming): DataFrame =
    hammingBandRollup(imageDhash(spark, sfDir), "dhash",
      hashBits = DhashGridRows * (DhashGridCols - 1),
      maxHamming = maxHamming)

  /** Shared 56-bit-fingerprint near-dup machinery, indexed over
    * DISTINCT fingerprints (the [[graft.streaming.StreamAssembly]]
    * image-probe fold generalized to the per-pair bucket rollup): the
    * band self-join — the only super-linear step — runs over distinct
    * hash values, not per-doc rows, so a dup-dense corpus (the sf1
    * replicate has 10 exact twins per image; the gradient fixture
    * mostly shares ONE fingerprint) costs distinct² band work instead
    * of corpus². Matched fingerprint pairs (Hamming ≤ maxHamming,
    * found at their lowest agreeing band — [[graft.ops.Dedup
    * .simhashPairs]]'s pigeonhole calculus, exact for
    * `maxHamming < nBands`) then fold back to exact per-pair bucket
    * stats WITHOUT materializing doc pairs: within one window
    * partition per fingerprint f — holding f's own docs plus every
    * matched partner g's docs — a descending running aggregate at doc
    * a yields |{b > a}| per class, which is precisely the number of
    * pairs whose smaller element (the bucket key doc) is a. Identical
    * output by construction; work is O(docs × (1 + match degree)),
    * never O(pairs). Serves the image ([[imageNearDups]]), audio
    * ([[audioNearDups]]) and video ([[videoNearDups]]) fingerprints
    * identically.
    */
  /** Doc-range width (2^shift) for [[hammingBandRollup]]'s two-level
    * fold: fine window partitions hold at most this many rows. */
  private val RangeShift: Int = 12

  private def hammingBandRollup(fp: DataFrame, hashCol: String,
                                hashBits: Int, maxHamming: Int): DataFrame = {
    val nBands = (hashBits + 7) / 8
    require(nBands * 8 >= hashBits,
      "bands must cover the full hash width or high-bit-only " +
        "differences silently escape the band join")
    require(maxHamming < nBands, "pigeonhole exactness needs h < bands")
    val banded = fp.select(col(hashCol).as("fhash")).distinct()
      .select(col("fhash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("bandidx"))
      .withColumn("bandval", expr("(fhash >> (bandidx * 8)) & 255"))
    val firstAgreeingBand = (0 until nBands - 1).map(j =>
        col("a.bandidx") <= j ||
          (shiftright(col("a.fhash").bitwiseXOR(col("b.fhash")),
            8 * j).bitwiseAND(255) =!= 0))
      .reduce(_ && _)
    // matched DISTINCT-fingerprint pairs; Hamming ≥ 1 here (equal
    // hashes are the within-group case, handled by the self rows)
    val half = banded.as("a")
      .join(banded.as("b"),
        col("a.bandidx") === col("b.bandidx") &&
          col("a.bandval") === col("b.bandval") &&
          col("a.fhash") < col("b.fhash"))
      .filter(firstAgreeingBand)
      .select(col("a.fhash").as("f"), col("b.fhash").as("g"),
        expr("bit_count(a.fhash ^ b.fhash)").cast("int").as("h"))
      .filter(col("h") <= maxHamming)
    val matched = half.union(
      half.select(col("g").as("f"), col("f").as("g"), col("h")))
    // scan frame for partition f: f's own docs (self, Hamming 0 to
    // each other) ∪ each matched g's docs carrying Hamming(f, g)
    val selfRows = fp.select(col(hashCol).as("f"), col("doc_id"),
      lit(0).as("h"), lit(true).as("self"))
    val partnerRows = fp.select(col(hashCol).as("g"), col("doc_id"))
      .join(matched, "g")
      .select(col("f"), col("doc_id"), col("h"), lit(false).as("self"))
    // at doc a (a self row of partition f), the docs b > a that pair
    // with a — with a then min(a, b), the pair's bucket key — are
    // counted in TWO levels so no single task ever scans a dominant
    // fingerprint's whole membership (the r12 shape put all of f's
    // docs in ONE window partition — linear, but a billion-doc
    // fingerprint would serialize on one task): (1) a coarse per-
    // (f, doc-range) aggregate + suffix fold over ranges (range =
    // doc_id >> RangeShift, so a range partition never exceeds
    // 2^RangeShift rows and the suffix frame is membership/4096 —
    // raise the shift or nest another level if a fingerprint's RANGE
    // COUNT ever rivals a task), and (2) the running fold within
    // (f, range) only. Same integers by construction: strictly-greater
    // docs = strictly-greater ranges' totals + strictly-preceding rows
    // in range.
    val W = org.apache.spark.sql.expressions.Window
    val rows = selfRows.union(partnerRows)
      .withColumn("rng", expr(s"doc_id >> $RangeShift"))
    val wR = W.partitionBy("f").orderBy(col("rng").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val roff = rows.groupBy("f", "rng")
      .agg(sum(when(col("self"), 1L).otherwise(0L)).as("r_exact"),
        sum(when(!col("self"), 1L).otherwise(0L)).as("r_cross"),
        sum(when(!col("self"), col("h").cast("long")).otherwise(0L))
          .as("r_sum_h"),
        max(when(!col("self"), col("h"))).as("r_max_h"))
      .select(col("f"), col("rng"),
        coalesce(sum("r_exact").over(wR), lit(0L)).as("o_exact"),
        coalesce(sum("r_cross").over(wR), lit(0L)).as("o_cross"),
        coalesce(sum("r_sum_h").over(wR), lit(0L)).as("o_sum_h"),
        max("r_max_h").over(wR).as("o_max_h"))
    val wF = W.partitionBy("f", "rng").orderBy(col("doc_id").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    rows.join(roff, Seq("f", "rng"))
      .withColumn("n_exact_d", col("o_exact") +
        coalesce(sum(when(col("self"), 1L).otherwise(0L)).over(wF), lit(0L)))
      .withColumn("n_cross_d", col("o_cross") +
        coalesce(sum(when(!col("self"), 1L).otherwise(0L)).over(wF), lit(0L)))
      .withColumn("sum_h_d", col("o_sum_h") +
        coalesce(sum(when(!col("self"), col("h").cast("long"))
          .otherwise(0L)).over(wF), lit(0L)))
      .withColumn("max_h_d",
        greatest(col("o_max_h"), max(when(!col("self"), col("h"))).over(wF)))
      .filter(col("self") && (col("n_exact_d") + col("n_cross_d")) > 0)
      .groupBy((col("doc_id") % 10).cast("long").as("bucket"))
      .agg(sum(col("n_exact_d") + col("n_cross_d")).as("n_pairs"),
        sum(col("n_exact_d")).as("n_exact"),
        sum(col("sum_h_d")).cast("long").as("sum_hamming"),
        max(greatest(col("max_h_d"),
          when(col("n_exact_d") > 0, 0))).as("max_hamming"))
      .orderBy("bucket")
  }

  /** The dedup ACTION to [[imageNearDups]]'s audit: exact-perceptual
    * dedup — images grouped by their full [[imageDhash]] fingerprint
    * (Hamming 0 ⇔ equal 56-bit hash, so no pair/CC machinery is
    * needed: the groupBy IS the clustering), keeping the lowest doc_id
    * per fingerprint (the keep-first survivor rule of
    * [[graft.ops.Dedup]]'s survivors query). Per doc_id%10 bucket:
    * image count, survivor count, dropped count — the shrink report a
    * media curation stage signs off on.
    *
    * Scale shape: one hash-keyed aggregate builds the (hash →
    * survivor) map, re-joined to the fingerprint frame on the hash key
    * (never a per-hash member list — a hot fingerprint like this
    * fixture's dominant gradient hash would funnel its whole cluster
    * through one task; as a skewed hash join it is exactly what AQE
    * skew-split handles), then one bucket rollup.
    */
  def imageDedupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = imageDhash(spark, sfDir) // memoized + checkpointed

    val surv = fp.groupBy("dhash").agg(min(col("doc_id")).as("survivor"))
    fp.join(surv, Seq("dhash"))
      .groupBy((col("doc_id") % 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_images"),
        sum(when(col("doc_id") === col("survivor"), 1L).otherwise(0L))
          .as("n_survivors"),
        sum(when(col("doc_id") =!= col("survivor"), 1L).otherwise(0L))
          .as("n_dropped"))
      .orderBy("bucket")
  }

  /** [[audioAhash]] splits each clip into this many contiguous blocks;
    * consecutive-block energy comparisons give blocks−1 = 56 bits —
    * the same sign-bit-free 56-bit/7-band geometry as the image dHash.
    */
  val AudioHashBlocks: Int = 57

  /** Acoustic fingerprint per audio clip (public energy-delta method —
    * the 1-D analogue of dHash, the shape of Haitsma-Kalker-style
    * audio fingerprinting): the REAL WAV bytes are decoded (RIFF walk,
    * fmt gate, int16 samples), the clip splits into
    * [[AudioHashBlocks]] contiguous blocks (sample j → block
    * j·57/n, every block non-empty since n ≥ 64), and bit b is the
    * sign of the consecutive block ENERGY delta (Σs² exact integers).
    * Robust to uniform gain flips the way dHash is to brightness.
    * Row-local map; the oracle recomputes every sample arithmetically.
    */
  def audioAhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nb = AudioHashBlocks
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions(_.map { id =>
        val clip = decodeWav(encodeWav(id)).get
        val n = clip.samples.length
        val e = new Array[Long](nb)
        var j = 0
        while (j < n) {
          val s = clip.samples(j).toLong
          e(j * nb / n) += s * s
          j += 1
        }
        var hash = 0L
        var b = 0
        while (b < nb - 1) {
          if (e(b) > e(b + 1)) hash |= 1L << b
          b += 1
        }
        (id, hash)
      })
      .toDF("doc_id", "ahash")
  }

  /** Acoustic near-dup audit — multimodal × dedup on the AUDIO tier:
    * [[audioAhash]] fingerprints through the same 7-byte-band
    * pigeonhole rollup as [[imageNearDups]]. Unlike the degenerate
    * gradient images, the clips' energy-delta signs vary per id, so
    * the fixture exercises a sparse (~3%) near-dup regime — the two
    * queries pin both ends of the selectivity spectrum.
    */
  def audioNearDups(spark: SparkSession, sfDir: String,
                    maxHamming: Int = DhashMaxHamming): DataFrame =
    hammingBandRollup(
      audioCache.getOrElseUpdate((spark, sfDir),
        audioAhash(spark, sfDir).localCheckpoint(true)),
      "ahash", hashBits = AudioHashBlocks - 1, maxHamming = maxHamming)

  private val audioCache = graft.ops.Memo.registry[(SparkSession, String)]

  /** Perceptual clip signature per video: every REAL decoded AVI frame
    * (RIFF walk, '00db' DIB decode) hashes through the SAME 56-bit
    * grid-dHash kernel as the images ([[gridDhash]]), and the frame
    * hashes fold to one clip signature by per-bit STRICT MAJORITY over
    * frames (bit j set iff more than half the frames set it) — the
    * order-insensitive fold standard video fingerprinting uses atop
    * per-frame perceptual hashes (an XOR fold would cancel twin frames;
    * majority is robust to a missing or extra frame the way dHash is to
    * brightness). All-integer; the oracle recomputes every sampled
    * pixel, every frame bit, and the majority vote arithmetically from
    * doc_id. Row-local map (codec work), no shuffle.
    */
  def videoDhash(spark: SparkSession, sfDir: String): DataFrame =
    videoCache.getOrElseUpdate((spark, sfDir),
      videoDhashUncached(spark, sfDir).localCheckpoint(true))

  private val videoCache = graft.ops.Memo.registry[(SparkSession, String)]

  private def videoDhashUncached(spark: SparkSession,
                                 sfDir: String): DataFrame = {
    import spark.implicits._
    val bits = DhashGridRows * (DhashGridCols - 1)
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val clip = decodeAvi(encodeAvi(id)).get
        val nf = clip.frames.length
        val counts = new Array[Int](bits)
        clip.frames.foreach { fpx =>
          val fh = gridDhash(fpx, clip.width, clip.height)
          var j = 0
          while (j < bits) {
            if (((fh >> j) & 1L) == 1L) counts(j) += 1
            j += 1
          }
        }
        var sig = 0L
        var j = 0
        while (j < bits) {
          if (2 * counts(j) > nf) sig |= 1L << j
          j += 1
        }
        (id, sig)
      })
      .toDF("doc_id", "vhash")
  }

  /** Perceptual VIDEO near-dup audit — completes the fingerprint family
    * (image dHash, audio energy-delta, video majority-dHash) through
    * the shared distinct-fingerprint band rollup: clip signatures
    * banded into 7 bytes, matched Hamming-≤[[DhashMaxHamming]] by the
    * pigeonhole calculus, folded to the per-bucket pair report without
    * materializing doc pairs. Same scale shape as [[imageNearDups]].
    */
  def videoNearDups(spark: SparkSession, sfDir: String,
                    maxHamming: Int = DhashMaxHamming): DataFrame =
    hammingBandRollup(videoDhash(spark, sfDir), "vhash",
      hashBits = DhashGridRows * (DhashGridCols - 1),
      maxHamming = maxHamming)

  /** Block-luminance feature vectors from REAL decoded pixels — the
    * media-side analogue of the `embeddings` table: each image reduces
    * to a 4×4 grid of block luminance SUMS (pixel (r,c) belongs to
    * block (r·4/h, c·4/w), nearest-neighbor floor indexing), emitted as
    * ARRAY<DOUBLE> in row-major block order. Sums are exact integers
    * (≤ ~4·10⁷, far inside the 2⁵³ double-exact range), so every
    * downstream dot product is the same IEEE sequence in both engines.
    * Row-local map, no shuffle — the embedding-extraction stage shape.
    */
  def imageBlockVectors(spark: SparkSession, sfDir: String): DataFrame =
    vecCache.getOrElseUpdate((spark, sfDir),
      imageBlockVectorsUncached(spark, sfDir).localCheckpoint(true))

  /** [[imageBlockVectors]] memoized per (session, sfDir): the vector
    * frame serves the ANN query and its recall audit — one decode pass
    * (same discipline as the fingerprint memo above).
    */
  private val vecCache = graft.ops.Memo.registry[(SparkSession, String)]

  private def imageBlockVectorsUncached(spark: SparkSession,
                                        sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions(_.map { id =>
        val img = decodeBmp(encodeBmp(id)).get
        val acc = new Array[Double](16)
        var r = 0
        while (r < img.height) {
          val br = r * 4 / img.height
          var c = 0
          while (c < img.width) {
            val bc = c * 4 / img.width
            val p = img.pixels(r * img.width + c)
            acc(br * 4 + bc) += 299L * ((p >> 16) & 0xff) +
              587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
            c += 1
          }
          r += 1
        }
        (id, acc)
      })
      .toDF("doc_id", "vec")
  }

  /** Cell/probe/k constants for [[mediaAnnTopK]], interpolated into its
    * oracle (the KmeansK anti-drift pattern). Centroids are the first
    * [[MmAnnCells]] image docs (doc_id < 3·cells with doc_id%3=0) — the
    * `sim_ivf` fixed-seed cell scheme.
    */
  val MmAnnCells: Int = 8
  val MmAnnProbe: Int = 3
  val MmAnnK: Int = 10

  /** Similarity search over MEDIA content end-to-end — decoded pixels →
    * [[imageBlockVectors]] features → the IVF discipline of
    * [[graft.ops.Similarity.ivfTopK]]: every image vector is
    * argmax-assigned to its nearest of [[MmAnnCells]] coarse centroids
    * (broadcast; shuffle-free `max(struct)` argmax), the query image
    * (doc 0) probes its top [[MmAnnProbe]] cells, and the cells'
    * members rank by exact cosine for the top [[MmAnnK]]. Closes the
    * multimodal × similarity loop: ANN runs on what the codec actually
    * decoded, not a pre-made embedding table. Cosines hash
    * bit-identically via the vec_dot/list_sum fold precedent; the
    * oracle recomputes the vectors arithmetically per pixel.
    *
    * Scale shape: identical to ivfTopK — corpus never pairwise-joined,
    * centroids broadcast, probe bounded by nProbe cells.
    */
  def mediaAnnTopK(spark: SparkSession, sfDir: String,
                   queryId: Long = 0L, k: Int = MmAnnK,
                   nCells: Int = MmAnnCells,
                   nProbe: Int = MmAnnProbe): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.ops.Similarity.{dot, norm2}
    val v = imageBlockVectors(spark, sfDir)
      .select(col("doc_id"), col("vec"), norm2(col("vec")).as("nrm"))
    val cents = v.filter(col("doc_id") < 3L * nCells)
      .select(col("doc_id").as("cid"), col("vec").as("c_vec"),
        col("nrm").as("c_nrm"))
    val scored = v.crossJoin(broadcast(cents))
      .withColumn("ccos",
        dot(col("vec"), col("c_vec")) / (col("nrm") * col("c_nrm")))
    val assigned = scored.groupBy("doc_id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("best"),
        first("vec").as("vec"), first("nrm").as("nrm"))
      .select(col("doc_id"), (-col("best.ncid")).as("cell"),
        col("vec"), col("nrm"))
    val qCells = scored.filter(col("doc_id") === queryId)
      .orderBy(desc("ccos"), asc("cid"))
      .limit(nProbe)
      .select(col("cid").as("probe_cell"))
    val q = v.filter(col("doc_id") === queryId)
      .select(col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    assigned.filter(col("doc_id") =!= queryId)
      .join(broadcast(qCells), col("cell") === col("probe_cell"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        (dot(col("vec"), col("q_vec")) /
          (col("nrm") * col("q_nrm"))).as("cosine"))
      .orderBy(desc("cosine"), asc("doc_id"))
      .limit(k)
  }

  /** The approximation audit for [[mediaAnnTopK]] — the media-tier
    * sibling of [[graft.ops.Similarity.ivfRecall]]: IVF top-k ∩ exact
    * brute-force top-k over the same block vectors, recall as an exact
    * ppm integer. Brute force over the bounded image corpus IS the
    * audit (documented sampled-stratum at scale, like every recall
    * audit in the similarity tier); the vector frame is memoized so
    * the audit shares the ANN query's single decode pass.
    */
  def mediaAnnRecall(spark: SparkSession, sfDir: String,
                     queryId: Long = 0L, k: Int = MmAnnK,
                     nCells: Int = MmAnnCells,
                     nProbe: Int = MmAnnProbe): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.ops.Similarity.{dot, norm2}
    val v = imageBlockVectors(spark, sfDir)
      .select(col("doc_id"), col("vec"), norm2(col("vec")).as("nrm"))
    val q = v.filter(col("doc_id") === queryId)
      .select(col("vec").as("q_vec"), col("nrm").as("q_nrm"))
    val bf = v.filter(col("doc_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        (dot(col("vec"), col("q_vec")) /
          (col("nrm") * col("q_nrm"))).as("cosine"))
      .orderBy(desc("cosine"), asc("doc_id"))
      .limit(k)
      .select("doc_id")
    mediaAnnTopK(spark, sfDir, queryId, k, nCells, nProbe)
      .select("doc_id")
      .join(bf, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k.toLong).as("k"), col("n_overlap"),
        expr(s"n_overlap * 1000000 div $k").as("recall_ppm"))
  }

  /** REAL audio decode end-to-end: every audio doc encodes to a genuine
    * PCM-16 mono WAV whose RIFF chunks the decoder walks back (fmt parse,
    * unknown-chunk skip, int16 little-endian samples), reduced to exact
    * integer energy Σ s² and the fmt-read sample rate. Same oracle
    * discipline and plan shape as [[bmpLuminance]].
    */
  def wavEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, sfDir).select(col("doc_id")))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions(_.map { id =>
        val clip = decodeWav(encodeWav(id)).get
        var sq = 0L
        clip.samples.foreach(s => sq += s.toLong * s)
        (id % 10, clip.samples.length.toLong, sq, clip.sampleRate.toLong)
      })
      .toDF("bucket", "n", "sq", "rate")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_clips"),
        sum("n").as("sum_samples"),
        sum("sq").as("sum_energy"),
        sum("rate").as("sum_rate"))
      .orderBy("bucket")
  }
}
