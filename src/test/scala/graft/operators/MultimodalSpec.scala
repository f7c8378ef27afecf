package graft.operators

import graft.SparkSpecBase
import java.security.MessageDigest

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decodeMeta produces size/dimension/fingerprint per payload") {
    val docs = Seq((1L, "hello world"), (2L, "x" * 1000)).toDF("doc_id", "text")
    val out = Multimodal.decodeMeta(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d = MessageDigest.getInstance("MD5").digest("hello world".getBytes("UTF-8"))
    val fp = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val r1 = out(1L)
    assert(r1.getLong(1) == 11L && r1.getLong(2) == 12L && r1.getLong(3) == 12L &&
      r1.getLong(4) == 3L && r1.getLong(5) == fp)
    val r2 = out(2L)
    assert(r2.getLong(1) == 1000L && r2.getLong(2) == 361L && r2.getLong(3) == 41L)
  }

  test("aHash8: equal images equal, brightness-shift invariant, inversion flips") {
    def pgm(px: Array[Byte], w: Int, h: Int): Array[Byte] =
      s"P5\n$w $h\n255\n".getBytes("ISO-8859-1") ++ px
    val base = Array.tabulate(256)(i => ((i / 16) * 15).toByte) // 16x16 gradient
    val h1 = Multimodal.aHash8(pgm(base, 16, 16)).get
    assert(Multimodal.aHash8(pgm(base.clone(), 16, 16)).get == h1)
    // +20 uniform brightness (clamped range avoided): mean shifts with cells
    val brighter = base.map(b => ((b & 0xff) + 20).toByte)
    assert(Multimodal.aHash8(pgm(brighter, 16, 16)).get == h1)
    // inversion flips the above/below-mean relation
    val inverted = base.map(b => (255 - (b & 0xff)).toByte)
    assert(Multimodal.aHash8(pgm(inverted, 16, 16)).get != h1)
    // undecodable -> None
    assert(Multimodal.aHash8("not an image".getBytes).isEmpty)
  }

  test("imageDupGroups: identical text collapses, keeper is min id, total over non-images") {
    val docs = Seq(
      (5L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 5 -> keeper 2
      (3L, "completely different content here")).toDF("doc_id", "text")
    val got = Multimodal.imageDupGroups(
      Multimodal.withPgmPayload(docs, "text", "payload"), "doc_id", "payload")
      .as[(Boolean, Long, Long, Long)].collect().map(r => r._4 -> r._3).toMap
    assert(got(2L) == 2L) // group of {2, 5}, keeper = 2
    assert(got(3L) == 1L) // singleton
    assert(got.size == 2)
  }

  test("imageDupGroups: aHash and md5-fallback domains never merge") {
    // one decodable P5 image and one raw (undecodable) blob: even if the
    // hash VALUES collided, is_image in the group key keeps them apart
    val img = (1L, ("P5\n8 4\n255\n" + "abcx" * 8).getBytes("ISO-8859-1"))
    val blob = (2L, "not an image".getBytes("UTF-8"))
    val docs = Seq(img, blob).toDF("doc_id", "payload")
    val rows = Multimodal.imageDupGroups(docs, "doc_id", "payload")
      .as[(Boolean, Long, Long, Long)].collect()
    assert(rows.length == 2)
    assert(rows.map(_._1).toSet == Set(true, false))
    assert(rows.forall(_._3 == 1L)) // each is its own singleton group
  }

  test("withPgmPayload synthesizes REAL decodable P5 images from text") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val payload = Multimodal.withPgmPayload(docs, "text", "payload", 8, 4)
      .select("payload").as[Array[Byte]].head()
    val Some((w, h, c, px)) = Multimodal.decodePnm(payload)
    assert((w, h, c) == ((8, 4, 1)))
    assert(px.length == 32)
    // gray values are the text bytes (+ sentinel) cycled
    assert(new String(px, "ISO-8859-1") == "abcx" * 8)
  }

  test("resize emits fixed-size pixel buffers") {
    val docs = Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.resize(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload", 4, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("pixels")).toMap
    assert(out(1L).length == 12 && out(2L).length == 12)
    assert(out(1L).take(6).toSeq == "abcdef".getBytes("UTF-8").toSeq) // cyclic resample
    assert(out(1L)(6) == 'a'.toByte)
  }

  test("sampleFrames explodes payloads into strided frame rows") {
    val docs = Seq((1L, "0123456789ab")).toDF("doc_id", "text") // 12 bytes = 6 frames of 2
    val out = Multimodal.sampleFrames(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload",
      frameBytes = 2, stride = 2)
      .collect().map(r => (r.getLong(1), new String(r.getAs[Array[Byte]]("frame"))))
    assert(out.sortBy(_._1).toSeq == Seq((0L, "01"), (2L, "45"), (4L, "89")))
  }

  test("null payloads are dropped, not NPE'd") {
    val docs = Seq((1L, Some("abc")), (2L, None)).toDF("doc_id", "text")
    val withP = Multimodal.withPayload(docs, "text", "payload")
    assert(Multimodal.decodeMeta(withP, "doc_id", "payload").count() == 1)
    assert(Multimodal.resize(withP, "doc_id", "payload", 2, 2).count() == 1)
    val frames = Multimodal.sampleFrames(withP, "doc_id", "payload", 1, 1)
    assert(frames.count() == 3 && frames.select("doc_id").distinct().count() == 1)
  }

  test("decodeMeta batch iteration covers every row exactly once") {
    val docs = spark.range(0, 999).toDF("doc_id")
      .selectExpr("doc_id", "repeat('a', CAST(doc_id % 50 AS INT)) AS text")
    val out = Multimodal.decodeMeta(
      Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload", batchSize = 64)
    assert(out.count() == 999)
    assert(out.select("doc_id").distinct().count() == 999)
  }
  test("PNM payloads decode for REAL: header dims, pixels, nearest-neighbour resize") {
    // a 4x2 P6 RGB image: left half red, right half blue
    val header = "P6\n# test image\n4 2\n255\n".getBytes("US-ASCII")
    val px = Array(
      255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255,
      255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255).map(_.toByte)
    val img = header ++ px
    // direct decode
    val Some((w, h, c, pixels)) = Multimodal.decodePnm(img)
    assert(w == 4 && h == 2 && c == 3 && pixels.sameElements(px))
    // through the Spark pipeline: real dimensions (not the size stub)
    val df = Seq((1L, img), (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val metaRows = Multimodal.decodeMeta(df, "doc_id", "payload")
      .select("doc_id", "width", "height", "channels")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(metaRows(1L) == ((4L, 2L, 3L)))
    assert(metaRows(2L) == (("not an image".length % 640 + 1).toLong,
      ("not an image".length % 480 + 1).toLong, 3L)) // codec fallback
    // real 2x2 nearest-neighbour downsample: picks columns 0 and 2
    val rs = Multimodal.resize(df.filter($"doc_id" === 1L), "doc_id", "payload", 2, 2)
      .select("pixels").as[Array[Byte]].head()
    val expected = Array(255, 0, 0, 0, 0, 255, 255, 0, 0, 0, 0, 255).map(_.toByte)
    assert(rs.sameElements(expected))
  }

  test("PNG payloads decode for REAL via the JDK: exact pixels through the Spark pipeline") {
    // 4x2 RGB: left half red, right half blue — same fixture as the PNM test
    val px = Array(
      255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255,
      255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255).map(_.toByte)
    val png = Multimodal.encodeJdk(px, 4, 2, 3, "png")
    assert(png.length > 8 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    // PNG is lossless: direct decode returns the exact raster
    val Some((w, h, c, pixels)) = Multimodal.decodeJdk(png)
    assert(w == 4 && h == 2 && c == 3 && pixels.sameElements(px))
    // through the Spark pipeline: real dimensions + real resampled pixels
    val df = Seq((1L, png)).toDF("doc_id", "payload")
    val meta = Multimodal.decodeMeta(df, "doc_id", "payload")
      .select("width", "height", "channels").head()
    assert((meta.getLong(0), meta.getLong(1), meta.getLong(2)) == ((4L, 2L, 3L)))
    val rs = Multimodal.resize(df, "doc_id", "payload", 2, 2)
      .select("pixels").as[Array[Byte]].head()
    val expected = Array(255, 0, 0, 0, 0, 255, 255, 0, 0, 0, 0, 255).map(_.toByte)
    assert(rs.sameElements(expected))
  }

  test("JPEG payloads decode for REAL: dimensions exact, pixels near the original") {
    val px = Array.tabulate[Byte](8 * 8 * 3)(i => if ((i / 3) % 8 < 4) 200.toByte else 40.toByte)
    val jpg = Multimodal.encodeJdk(px, 8, 8, 3, "jpg")
    assert(jpg.length > 2 && (jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // SOI marker
    val df = Seq((1L, jpg)).toDF("doc_id", "payload")
    val meta = Multimodal.decodeMeta(df, "doc_id", "payload")
      .select("width", "height", "channels").head()
    assert((meta.getLong(0), meta.getLong(1), meta.getLong(2)) == ((8L, 8L, 3L)))
    // lossy codec: assert the decoded raster is close, not bit-equal
    val Some((_, _, _, dec)) = Multimodal.decodeJdk(jpg)
    val maxErr = dec.zip(px).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 64, s"JPEG round-trip drifted too far: $maxErr")
  }

  test("grayscale PNG decodes to a 1-channel raster") {
    val px = Array.tabulate[Byte](6 * 3)(i => (i * 10).toByte)
    val png = Multimodal.encodeJdk(px, 6, 3, 1, "png")
    val Some((w, h, c, dec)) = Multimodal.decodeJdk(png)
    assert(w == 6 && h == 3 && c == 1 && dec.sameElements(px))
  }

  test("animated GIF payloads explode into REAL decoded frames") {
    // build a 2-frame animated GIF with the JDK writer: frame 0 all-red, frame 1 all-blue
    import javax.imageio.{ImageIO, IIOImage}
    val bos = new java.io.ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    Seq(0xffff0000, 0xff0000ff).foreach { argb =>
      val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 3, 2, Array.fill(6)(argb), 0, 3)
      writer.writeToSequence(new IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); writer.dispose(); out.close()
    val gif = bos.toByteArray

    val df = Seq((7L, gif)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload", frameBytes = 1, stride = 1)
      .collect().map(r => r.getLong(1) -> r.getAs[Array[Byte]]("frame")).toMap
    assert(frames.keySet == Set(0L, 1L))
    assert(frames(0L).length == 3 * 2 * 3)
    // frame 0 red, frame 1 blue (GIF palette is exact for primary colors)
    assert((frames(0L)(0) & 0xff) >= 200 && (frames(0L)(2) & 0xff) <= 50)
    assert((frames(1L)(2) & 0xff) >= 200 && (frames(1L)(0) & 0xff) <= 50)
    // stride skips frames
    val strided = Multimodal.sampleFrames(df, "doc_id", "payload", frameBytes = 1, stride = 2)
    assert(strided.count() == 1)
  }

  test("WAV audio payloads decode for REAL: header, duration, windowed RMS + ZCR") {
    // 16-bit PCM mono WAV, 8 kHz, 0.5 s of a 400 Hz sine at amplitude 0.5
    val rate = 8000; val n = 4000; val freq = 400.0; val amp = 0.5
    val pcm = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / rate) * 32767).toShort)
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    pcm.foreach(bb.putShort)
    val wav = bb.array()

    val df = Seq((3L, wav), (4L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val meta = Multimodal.audioMeta(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(3L).getLong(2) == rate && meta(3L).getLong(3) == 1)
    assert(meta(3L).getLong(4) == n && meta(3L).getLong(5) == 500) // 0.5 s
    assert(meta(4L).isNullAt(2), "non-audio payloads carry null audio metadata")

    // windows of 800 samples (= 40 full sine periods): RMS = amp/sqrt(2),
    // ZCR = 2 crossings per period = 2*freq/rate per adjacent pair
    val feats = Multimodal.audioFeatures(df, "doc_id", "payload", windowSamples = 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(feats.forall(_._1 == 3L) && feats.length == 5) // non-WAV yields no rows
    feats.foreach { case (_, _, rms, zcr) =>
      assert(math.abs(rms - amp / math.sqrt(2.0)) < 0.005, s"rms $rms")
      assert(math.abs(zcr - 2.0 * freq / rate) < 0.01, s"zcr $zcr")
    }
  }

  test("corrupt RIFF payloads terminate safely: hostile 32-bit sizes, truncated fmt") {
    def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // declared chunk size >= 2^31: as a signed Int this is negative and
    // would walk the chunk pointer BACKWARDS (infinite executor loop)
    val hostileWav = cc("RIFF") ++ le32(0xfffffff0L) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(0xfffffff0L) ++ new Array[Byte](32)
    assert(Multimodal.decodeWav(hostileWav).isEmpty)
    // fmt declares 16 body bytes but only 4 are present: must not read past the array
    val truncatedFmt = cc("RIFF") ++ le32(20) ++ cc("WAVE") ++
      cc("fmt ") ++ le32(16) ++ new Array[Byte](4)
    assert(Multimodal.decodeWav(truncatedFmt).isEmpty)
    // same hostile size through the AVI walker (LIST and frame chunk)
    val hostileAvi = cc("RIFF") ++ le32(0xfffffff0L) ++ cc("AVI ") ++
      cc("LIST") ++ le32(0xfffffff0L) ++ cc("movi") ++
      cc("00dc") ++ le32(0xfffffff0L) ++ new Array[Byte](8)
    assert(Multimodal.decodeAviMjpegFrames(hostileAvi).isEmpty)
    // audioMeta is documented total over arbitrary blobs — the corrupt
    // payloads flow through the Spark pass as null-metadata rows
    val df = Seq((1L, hostileWav), (2L, truncatedFmt), (3L, hostileAvi))
      .toDF("doc_id", "payload")
    val rows = Multimodal.audioMeta(df, "doc_id", "payload").collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(2)))
  }

  test("MJPEG-AVI video payloads explode into REAL decoded frames") {
    // build a 4-frame MJPEG AVI: JPEG-encode solid-colour frames with the
    // JDK, wrap them in a RIFF container (hdrl stub + movi list with
    // 00dc chunks + even-byte padding) — a structurally real AVI of the
    // kind motion-JPEG cameras write, decodable with zero codecs
    import javax.imageio.ImageIO
    def jpegOf(argb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 4, 2, Array.fill(8)(argb), 0, 4)
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(0xffcc0000, 0xff00cc00, 0xff0000cc, 0xffcccc00).map(jpegOf)
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(cc.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array() // trailing pad byte stays zero when length is odd
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = chunk("RIFF", body).take(8) ++ body // RIFF header wraps the body

    val df = Seq((9L, avi)).toDF("doc_id", "payload")
    val got = Multimodal.sampleFrames(df, "doc_id", "payload", frameBytes = 1, stride = 1)
      .collect().map(r => r.getLong(1) -> r.getAs[Array[Byte]]("frame")).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    got.values.foreach(f => assert(f.length == 4 * 2 * 3)) // decoded rasters
    // JPEG is lossy: dominant channel per frame survives with tolerance
    assert((got(0L)(0) & 0xff) >= 150 && (got(0L)(1) & 0xff) <= 80)  // red-ish
    assert((got(1L)(1) & 0xff) >= 150 && (got(1L)(0) & 0xff) <= 80)  // green-ish
    assert((got(2L)(2) & 0xff) >= 150 && (got(2L)(0) & 0xff) <= 80)  // blue-ish
    // stride samples every other frame
    val strided = Multimodal.sampleFrames(df, "doc_id", "payload", frameBytes = 1, stride = 2)
    assert(strided.select("frame_idx").collect().map(_.getLong(0)).toSet == Set(0L, 2L))
    // a non-AVI payload still falls back to byte-slice framing
    val junk = Seq((1L, Array.tabulate[Byte](64)(_.toByte))).toDF("doc_id", "payload")
    assert(Multimodal.sampleFrames(junk, "doc_id", "payload", 16, 1).count() == 4)
  }
}
