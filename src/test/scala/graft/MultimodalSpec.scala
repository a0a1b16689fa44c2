package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark, sf0001)

  test("binary payload plumbing: features are deterministic and well-shaped") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.features.length === Multimodal.FeatureDim)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // L1-normalized histogram
      assert(f.nBytes > 0 && f.checksum > 0)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).sorted.toSeq === again.map(_.checksum).sorted.toSeq)
  }

  test("real image decode: a generated PNG round-trips through " +
    "decodeImage + extractImageFeatures; undecodable payloads fall back") {
    import spark.implicits._
    // 8x8 grayscale gradient PNG, generated with the JVM's own imageio
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = ((y * 8 + x) * 255) / 63
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // decodeImage recovers the exact plane
    val Some((w, h, plane)) = Multimodal.decodeImage(png)
    assert(w === 8 && h === 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = (((y * 8 + x) * 255) / 63) / 255f
      assert(math.abs(plane(y * 8 + x) - v) < 1e-6,
        s"pixel ($x,$y): ${plane(y * 8 + x)} vs $v")
    }
    // through the Dataset path: PNG row decodes (checksum -1, 4x4 resize of
    // the plane); garbage row falls back to the byte-histogram stand-in
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, 8, 8, 0),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3, 4), 0, 0, 0))
    val feats = Multimodal.extractImageFeatures(rows.toDS())
      .collect().sortBy(_.id)
    assert(feats(0).checksum === -1L)
    assert(feats(0).features.toSeq ===
      Multimodal.resizeNearest(plane, 8, 8, 4, 4).toSeq)
    assert(feats(1).checksum === 10L) // 1+2+3+4: the stand-in's byte sum
    assert(feats(1).features.toSeq ===
      Multimodal.fakeDecode(Array[Byte](1, 2, 3, 4)).toSeq)
  }

  test("real audio decode: a generated WAV round-trips through " +
    "decodeAudio + extractAudioFeatures; undecodable payloads fall back") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // 16-bit signed mono PCM, 800 samples: first half amplitude 16384
    // (=0.5) square, second half silence — RMS profile is analytic
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val v: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // decodeAudio recovers rate + the exact quantized samples
    val Some((rate, samples)) = Multimodal.decodeAudio(wav)
    assert(rate === 16000f && samples.length === n)
    assert(samples(0) === 16384 / 32768f && samples(1) === -16384 / 32768f)
    assert(samples(n - 1) === 0f)
    // analytic RMS: segments 0..7 all |0.5|, segments 8..15 all 0
    val prof = Multimodal.rmsProfile(samples, Multimodal.FeatureDim)
    for (s <- 0 until 8) assert(math.abs(prof(s) - 0.5f) < 1e-6, s"seg $s")
    for (s <- 8 until 16) assert(prof(s) === 0f, s"seg $s")
    // through the Dataset path: WAV row decodes (checksum -1); garbage row
    // falls back to the byte-histogram stand-in
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 0, 0, 16000),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 9), 0, 0, 0))
    val feats = Multimodal.extractAudioFeatures(rows.toDS())
      .collect().sortBy(_.id)
    assert(feats(0).checksum === -1L)
    assert(feats(0).features.toSeq === prof.toSeq)
    assert(feats(1).checksum === 18L)
    assert(feats(1).features.toSeq ===
      Multimodal.fakeDecode(Array[Byte](9, 9)).toSeq)
    // stereo averaging: L = +0.5, R = -0.5 → mono 0
    val st = new Array[Byte](8)
    st(0) = 0; st(1) = 0x40; st(2) = 0; st(3) = 0xc0.toByte
    st(4) = 0; st(5) = 0x40; st(6) = 0; st(7) = 0xc0.toByte
    val fmt2 = new AudioFormat(8000f, 16, 2, true, false)
    val bos2 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(st), fmt2, 2L),
      AudioFileFormat.Type.WAVE, bos2)
    val Some((_, mono)) = Multimodal.decodeAudio(bos2.toByteArray)
    assert(mono.toSeq === Seq(0f, 0f))
  }

  test("fakeDecode is a unit-normalized 16-bin histogram") {
    val f = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("frame sampling strides video payloads into n frames") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    val perVideo = frames.groupBy(_.id)
    assert(perVideo.nonEmpty)
    perVideo.foreach { case (_, fs) =>
      assert(fs.map(_.frameNo).sorted.toSeq === Seq(0, 1, 2, 3))
      assert(fs.forall(_.frameBytes.nonEmpty))
    }
    // only video-kind rows produce frames
    val videoIds = media.filter(_.kind == "video").collect().map(_.id).toSet
    assert(perVideo.keySet.subsetOf(videoIds))
  }

  test("byteStats matches a hand check") {
    import spark.implicits._
    val one = Multimodal.byteStats(spark, sf0001).where($"doc_id" === 0).head()
    val text = Tables.documents(spark, sf0001).where($"doc_id" === 0)
      .head().getString(1)
    assert(one.getInt(1) === text.getBytes("UTF-8").length)
    assert(one.getInt(2) === text.head.toInt)
    assert(one.getLong(3) === text.map(_.toLong).sum)
  }

  test("resizeNearest: exact index math on a known plane; resize maps image rows only") {
    // 2x2 plane [[1,2],[3,4]] -> 1x1 takes the top-left; 4x4 upsample
    // replicates each source pixel into a 2x2 block
    val p = Array(1f, 2f, 3f, 4f)
    assert(Multimodal.resizeNearest(p, 2, 2, 1, 1).toSeq === Seq(1f))
    assert(Multimodal.resizeNearest(p, 2, 2, 4, 4).toSeq === Seq(
      1f, 1f, 2f, 2f,  1f, 1f, 2f, 2f,  3f, 3f, 4f, 4f,  3f, 3f, 4f, 4f))
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val rs = Multimodal.resize(media, 8, 8)
    val n = rs.count()
    assert(n > 0 && n <= media.filter(_.kind == "image").count())
    val one = rs.head()
    assert(one.pixels.length === 64 && one.pixels.forall(v => v >= 0f && v <= 1f))
  }

  test("perceptual hash: deterministic, one code per non-empty payload") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001)
    val ph = Multimodal.perceptualHash(docs)
    assert(ph.count() === docs.where(col("text") =!= "").count())
    assert(ph.select("phash").distinct().count() > 100,
      "share-normalized codes should spread (length clustering would collapse them)")
    assert(ph.exceptAll(Multimodal.perceptualHash(docs)).count() === 0)
  }

  test("phash pairs: banded path equals the brute-force pair oracle") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ph = Multimodal.perceptualHash(Tables.documents(spark, sf0001))
    val banded = Multimodal.phashPairs(ph, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val brute = graft.operators.Dedup.simhashPairsBrute(
      ph.select(col("doc_id"), col("phash").as("simhash")), maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded === brute)
    assert(banded.nonEmpty)
    banded.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 3) }
  }

  test("an identical payload pair lands at hamming 0 and survives the banding") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the same exact payload content here"),
      (2L, "the same exact payload content here"),
      (3L, "something utterly different with zzz qqq xxx digits 123456789"),
      (4L, "yet another unrelated payload AAAA BBBB CCCC dddd eeee ffff")
    ).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.perceptualHash(docs), maxHamming = 0)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
  }

  test("solid-gray JPEG frames at quality 1.0 survive the codec exactly " +
    "(the q280 oracle's exactness premise, checked at EVERY 8-bit level)") {
    for (g <- 0 until 256) {
      val avi = Multimodal.synthAviGray(_ => g, 1, 8, 8)
      val Some(frames) = Multimodal.decodeVideo(avi)
      assert(frames.length === 1)
      val (w, h, plane) = frames.head
      assert(w === 8 && h === 8)
      plane.foreach(v => assert(v === g / 255f,
        s"gray $g decoded to ${v * 255}"))
    }
  }

  test("real video decode: a synthesized MJPEG-style AVI round-trips " +
    "through decodeVideo + extractVideoFeatures; undecodable payloads " +
    "fall back") {
    import spark.implicits._
    val avi = Multimodal.synthAviGray(f => 40 * f + 20, 3, 32, 24)
    // container-level parse: 3 frames in stream order, right dims, exact
    // solid planes
    val Some(frames) = Multimodal.decodeVideo(avi)
    assert(frames.length === 3)
    frames.zipWithIndex.foreach { case ((w, h, plane), f) =>
      assert(w === 32 && h === 24)
      assert(plane.forall(_ === (40 * f + 20) / 255f))
    }
    // non-AVI payloads refuse at the container gate
    assert(Multimodal.decodeVideo(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.decodeVideo("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // corrupt size fields (unsigned 32-bit overflow / cursor-reversing
    // values) terminate the parse instead of spinning the executor
    val crafted = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1) ++ "AVI LIST".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1) ++ "movi00dc".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1) ++ Array.fill(32)(0.toByte)
    assert(Multimodal.decodeVideo(crafted).isEmpty)
    // a truncated copy of a VALID avi must also terminate (any result is
    // acceptable; the assertion is that the call returns at all)
    Multimodal.decodeVideo(avi.take(avi.length / 2))
    // Dataset path: one row per decoded frame with checksum -1 and the
    // analytic mean luminance; the garbage row falls back to ONE stand-in
    // row keeping its byte sum
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi, 32, 24, 0),
      Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3, 4), 0, 0, 0))
    val feats = Multimodal.extractVideoFeatures(rows.toDS())
      .collect().sortBy(r => (r.id, r.frameNo))
    assert(feats.count(_.id == 1L) === 3)
    feats.filter(_.id == 1L).foreach { r =>
      assert(r.checksum === -1L && r.width === 32 && r.height === 24)
      assert(math.round(r.meanLum * 255).toInt === 40 * r.frameNo + 20)
    }
    val fb = feats.filter(_.id == 2L)
    assert(fb.length === 1 && fb.head.frameNo === -1 && fb.head.checksum === 10L)
  }
}
