package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Media, DecodedMeta}

/** Multimodal binary plumbing: header round-trip, corrupt-payload
  * handling, feature shape, frame sampling, resize consistency.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("encode→decode round-trips every header field") {
    for (id <- Seq(0L, 1L, 2L, 17L, 59L, 12345L)) {
      val m = Multimodal.decodeOne(Multimodal.encodeOne(id, 100)).get
      assert(m.media_type === Multimodal.typeOf(id))
      assert(m.width === Multimodal.widthOf(id))
      assert(m.height === Multimodal.heightOf(id))
      assert(m.channels === Multimodal.channelsOf(id))
      assert(m.duration_ms === Multimodal.durationOf(id))
      assert(m.body_len === Multimodal.bodyLenOf(id, 100))
    }
  }

  test("corrupt payloads decode to None (bad magic, truncation, null)") {
    val ok = Multimodal.encodeOne(7L, 50)
    assert(Multimodal.decodeOne(null).isEmpty)
    assert(Multimodal.decodeOne(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeOne(ok.take(ok.length - 1)).isEmpty)
    val badMagic = ok.clone(); badMagic(0) = 0
    assert(Multimodal.decodeOne(badMagic).isEmpty)
  }

  test("corrupt rows are dropped by the decode stage, valid rows survive") {
    val ds = Seq(
      Media(1L, "image", Multimodal.encodeOne(1L, 80)),
      Media(2L, "audio", Array[Byte](9, 9)),
      Media(3L, "video", null)).toDS()
    val out = Multimodal.decode(ds).collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L))
  }

  test("features are unit-norm ARRAY<FLOAT> of the requested dim") {
    graft.functions.GraftFunctions.register(spark)
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf), dim = 16)
    val r = feats.select(
      size(col("features")).as("d"),
      graft.ops.Similarity.norm2(col("features")).as("nrm"))
    assert(r.filter(col("d") =!= 16).count() === 0)
    assert(r.filter(abs(col("nrm") - 1.0) > 1e-5).count() === 0)
  }

  test("frame sampling yields ceil(duration/interval) frames, videos only") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    val joined = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(Multimodal.decode(media).toDF(), "doc_id")
    assert(joined.filter(col("media_type") =!= "video").count() === 0)
    assert(joined.filter(
      col("n") =!= ceil(col("duration_ms") / 1000.0)).count() === 0)
  }

  test("resize rewrites image dims only and keeps payloads decodable") {
    val resized = Multimodal.decode(
      Multimodal.resize(Multimodal.mediaTable(spark, sf), 224, 224))
    val images = resized.filter(_.media_type == "image")
    val others = resized.filter(_.media_type != "image")
    assert(images.filter(m => m.width != 224 || m.height != 224).count() === 0)
    // non-images keep their ORIGINAL derived dims (some are natively
    // 224×224 — 64+32·5 — so compare against the derivation, not 224)
    assert(others.filter(m =>
      m.width != Multimodal.widthOf(m.doc_id) ||
      m.height != Multimodal.heightOf(m.doc_id)).count() === 0)
    // nothing dropped: decode succeeded for every resized payload
    assert(resized.count() === Multimodal.mediaTable(spark, sf).count())
  }

  test("BMP codec: bottom-up rows, BGR order, and 4-byte padding decode " +
       "back to the exact encoded pixels") {
    // id=5 → w=13 (13*3=39, padded to 40 — exercises real padding), h=9
    val id = 5L
    val img = Multimodal.decodeBmp(Multimodal.encodeBmp(id)).get
    assert(img.width === Multimodal.bmpWidthOf(id))
    assert(img.height === Multimodal.bmpHeightOf(id))
    for (r <- 0 until img.height; c <- 0 until img.width) {
      val (red, green, blue) = Multimodal.pixelOf(id, r, c)
      val p = img.pixels(r * img.width + c)
      assert(((p >> 16) & 0xff) === red, s"red at ($r,$c)")
      assert(((p >> 8) & 0xff) === green, s"green at ($r,$c)")
      assert((p & 0xff) === blue, s"blue at ($r,$c)")
    }
    // a hand-built TOP-DOWN bmp (negative height) decodes identically
    val bu = Multimodal.encodeBmp(id)
    val rowSize = (img.width * 3 + 3) / 4 * 4
    val td = bu.clone()
    val hBytes = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-img.height).array()
    System.arraycopy(hBytes, 0, td, 22, 4)
    for (r <- 0 until img.height) // reverse the stored row order
      System.arraycopy(bu, 54 + (img.height - 1 - r) * rowSize,
        td, 54 + r * rowSize, rowSize)
    assert(Multimodal.decodeBmp(td).get.pixels.toSeq === img.pixels.toSeq)
    // corrupt magic / truncated payloads are rejected, not mis-decoded
    assert(Multimodal.decodeBmp("XX".getBytes ++ bu.drop(2)).isEmpty)
    assert(Multimodal.decodeBmp(bu.dropRight(1)).isEmpty)
  }

  test("WAV codec: RIFF chunk walk survives an inserted unknown chunk and " +
       "recovers exact int16 samples + fmt sample rate") {
    val id = 7L
    val wav = Multimodal.encodeWav(id)
    val clip = Multimodal.decodeWav(wav).get
    assert(clip.sampleRate === 8000)
    assert(clip.samples.length === Multimodal.wavSamplesOf(id))
    clip.samples.zipWithIndex.foreach { case (s, i) =>
      assert(s === Multimodal.sampleOf(id, i), s"sample $i")
    }
    // splice an unknown odd-length chunk between fmt and data (word-aligned
    // skip): decode must step over it
    val junk = java.nio.ByteBuffer.allocate(8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5, 0))
    val spliced = wav.take(36) ++ junk.array() ++ wav.drop(36)
    val buf2 = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.putInt(4, spliced.length - 8) // fix RIFF size
    assert(Multimodal.decodeWav(spliced).get.samples.toSeq
      === clip.samples.toSeq)
    // stereo/8-bit fmt is rejected (decoder requires canonical PCM-16 mono)
    val stereo = wav.clone()
    java.nio.ByteBuffer.wrap(stereo)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(22, 2.toShort)
    assert(Multimodal.decodeWav(stereo).isEmpty)
  }

  test("AVI codec: RIFF tree walk recovers exact per-frame pixels, frame " +
       "period, and declared frame count; idx1/JUNK skipped") {
    for (id <- Seq(2L, 5L, 11L, 12344L)) {
      val avi = Multimodal.encodeAvi(id)
      val clip = Multimodal.decodeAvi(avi).get
      assert(clip.width === Multimodal.aviWidthOf(id))
      assert(clip.height === Multimodal.aviHeightOf(id))
      assert(clip.msPerFrame === Multimodal.aviMsPerFrameOf(id))
      assert(clip.frames.length === Multimodal.aviFramesOf(id))
      for (f <- clip.frames.indices; r <- 0 until clip.height;
           c <- 0 until clip.width) {
        val (red, green, blue) = Multimodal.framePixelOf(id, f, r, c)
        val p = clip.frames(f)(r * clip.width + c)
        assert(((p >> 16) & 0xff) === red, s"R f=$f r=$r c=$c")
        assert(((p >> 8) & 0xff) === green, s"G f=$f r=$r c=$c")
        assert((p & 0xff) === blue, s"B f=$f r=$r c=$c")
      }
    }
  }

  test("AVI decoder tolerates an inserted JUNK chunk and rejects " +
       "compressed strf, frame-count mismatch, truncation") {
    val id = 8L
    val avi = Multimodal.encodeAvi(id)
    val base = Multimodal.decodeAvi(avi).get
    // splice a JUNK chunk between hdrl and movi (top-level unknown chunk)
    val hdrlLen = java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(16)
    val at = 12 + 8 + hdrlLen
    val junk = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("JUNK".getBytes("US-ASCII")).putInt(6)
      .put(Array[Byte](9, 9, 9, 9, 9, 9))
    val spliced = avi.take(at) ++ junk.array() ++ avi.drop(at)
    java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, spliced.length - 8)
    val re = Multimodal.decodeAvi(spliced).get
    assert(re.frames.length === base.frames.length)
    assert(re.frames.head.toSeq === base.frames.head.toSeq)
    // compressed strf (biCompression != 0) is rejected before any frame
    val compressed = avi.clone()
    // strf data begins after RIFF(12) + LIST hdr(8+4) + avih(8+56) +
    // LIST strl hdr(8+4) + strh(8+56) + strf hdr(8): biCompression at +16
    val strfData = 12 + 12 + 64 + 12 + 64 + 8
    java.nio.ByteBuffer.wrap(compressed)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(strfData + 16, 1)
    assert(Multimodal.decodeAvi(compressed).isEmpty)
    // declared-frame-count mismatch is rejected (avih dwTotalFrames)
    val mismatched = avi.clone()
    java.nio.ByteBuffer.wrap(mismatched)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 12 + 8 + 16, Multimodal.aviFramesOf(id) + 1)
    assert(Multimodal.decodeAvi(mismatched).isEmpty)
    assert(Multimodal.decodeAvi(avi.take(40)).isEmpty)
    assert(Multimodal.decodeAvi(null).isEmpty)
  }
}
