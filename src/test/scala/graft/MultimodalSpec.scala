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

  test("encode→sniff→decode round-trips typed metadata for all 3 real formats") {
    for (id <- Seq(0L, 1L, 2L, 17L, 59L, 12345L)) {
      val m = Multimodal.decodeOne(Multimodal.encodeOne(id)).get
      assert(m.media_type === Multimodal.typeOf(id))
      (id % 3).toInt match {
        case 0 => // BMP
          val w = Multimodal.bmpWidthOf(id); val h = Multimodal.bmpHeightOf(id)
          assert(m.width === w)
          assert(m.height === h)
          assert(m.channels === 3)
          assert(m.duration_ms === 0)
          assert(m.body_len === (w * 3 + 3) / 4 * 4 * h)
        case 1 => // WAV (PCM-16 mono @8kHz)
          val n = Multimodal.wavSamplesOf(id)
          assert(m.width === 0)
          assert(m.channels === 1)
          assert(m.duration_ms === n * 1000 / 8000)
          assert(m.body_len === 2 * n)
        case _ => // AVI
          val w = Multimodal.aviWidthOf(id); val h = Multimodal.aviHeightOf(id)
          val nf = Multimodal.aviFramesOf(id)
          assert(m.width === w)
          assert(m.height === h)
          assert(m.channels === 3)
          assert(m.duration_ms === nf * Multimodal.aviMsPerFrameOf(id))
          assert(m.body_len === nf * ((w * 3 + 3) / 4 * 4) * h)
      }
    }
  }

  test("corrupt payloads decode to None (bad magic, truncation, null)") {
    val ok = Multimodal.encodeOne(7L) // 7%3=1 → WAV
    assert(Multimodal.decodeOne(null).isEmpty)
    assert(Multimodal.decodeOne(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeOne(ok.take(ok.length - 1)).isEmpty)
    val badMagic = ok.clone(); badMagic(0) = 0
    assert(Multimodal.decodeOne(badMagic).isEmpty)
  }

  test("corrupt rows are dropped by the decode stage, valid rows survive") {
    val ds = Seq(
      Media(0L, "image", Multimodal.encodeOne(0L)),
      Media(2L, "audio", Array[Byte](9, 9)),
      Media(3L, "video", null)).toDS()
    val out = Multimodal.decode(ds).collect()
    assert(out.map(_.doc_id).toSeq === Seq(0L))
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

  test("frame sampling keeps every step-th REAL AVI frame as a decodable BMP") {
    val media = Multimodal.mediaTable(spark, sf)
    val step = Multimodal.AviSampleStep
    val frames = Multimodal.sampleFrames(media, step)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_._1)
    byDoc.foreach { case (id, fs) =>
      assert(id % 3 === 2, s"non-video doc $id emitted frames")
      val nf = Multimodal.aviFramesOf(id)
      val msPf = Multimodal.aviMsPerFrameOf(id)
      assert(fs.length === (nf + step - 1) / step, s"doc $id frame count")
      assert(fs.map(_._2).sorted.toSeq ===
        (0 until nf by step).map(_ * msPf), s"doc $id timestamps")
      // each emitted frame is a valid BMP with the clip dims and the
      // exact per-frame pixels the AVI encoder wrote
      val f0 = fs.minBy(_._2)
      val img = Multimodal.decodeBmp(f0._3).get
      assert(img.width === Multimodal.aviWidthOf(id))
      assert(img.height === Multimodal.aviHeightOf(id))
      val (red, green, blue) = Multimodal.framePixelOf(id, 0, 0, 0)
      val p = img.pixels(0)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((red, green, blue)))
    }
  }

  test("resize nearest-neighbor-resamples images only; payloads stay decodable") {
    val resized = Multimodal.decode(
      Multimodal.resize(Multimodal.mediaTable(spark, sf), 224, 224))
    val images = resized.filter(_.media_type == "image")
    val others = resized.filter(_.media_type != "image")
    assert(images.filter(m => m.width != 224 || m.height != 224).count() === 0)
    // non-images pass through with their ORIGINAL codec-derived dims
    assert(others.filter(m => m.media_type == "video" &&
      (m.width != Multimodal.aviWidthOf(m.doc_id) ||
       m.height != Multimodal.aviHeightOf(m.doc_id))).count() === 0)
    assert(others.filter(m => m.media_type == "audio" &&
      (m.width != 0 || m.height != 0)).count() === 0)
    // nothing dropped: decode succeeded for every resized payload
    assert(resized.count() === Multimodal.mediaTable(spark, sf).count())
  }

  test("resize samples source pixels at (r·h/newH, c·w/newW)") {
    val id = 3L // image: w=8+3%9=11, h=4+3%7=7
    val ds = Seq(Media(id, "image", Multimodal.encodeBmp(id))).toDS()
    val out = Multimodal.resize(ds, 5, 4).collect().head
    val src = Multimodal.decodeBmp(Multimodal.encodeBmp(id)).get
    val img = Multimodal.decodeBmp(out.payload).get
    assert(img.width === 5 && img.height === 4)
    for (r <- 0 until 4; c <- 0 until 5) {
      val expected = src.pixels(r * src.height / 4 * src.width + c * src.width / 5)
      assert(img.pixels(r * 5 + c) === expected, s"pixel ($r,$c)")
    }
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

  test("video clip signature is the strict per-bit majority over the " +
       "per-frame grid dHashes, deterministic across runs") {
    val got = Multimodal.videoDhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got.keySet.forall(_ % 3 == 2))
    // independent recomputation straight from the codec, frame by frame
    got.foreach { case (id, sig) =>
      val clip = Multimodal.decodeAvi(Multimodal.encodeAvi(id)).get
      val bits = Multimodal.DhashGridRows * (Multimodal.DhashGridCols - 1)
      val expected = (0 until bits).map { j =>
        val votes = clip.frames.count(fpx =>
          ((Multimodal.gridDhash(fpx, clip.width, clip.height) >> j) & 1L) == 1L)
        if (2 * votes > clip.frames.length) 1L << j else 0L
      }.sum
      assert(sig === expected, s"doc $id")
    }
    val again = Multimodal.videoDhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }
}
