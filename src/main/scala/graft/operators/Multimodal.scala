package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `BINARY` columns with typed metadata; decode / feature-extraction runs as
  * a partition-local batch transform ([[Dataset.mapPartitions]] — the Scala
  * analogue of `mapInPandas` batch UDFs).
  *
  * Two decode paths share one dataflow: [[decodeImage]] is a REAL image
  * decoder (`javax.imageio` — PNG/BMP/GIF/JPEG, in the JVM itself, no
  * external codec), used by [[extractImageFeatures]]; [[fakeDecode]] is the
  * deterministic byte-level stand-in kept for byte-exact oracles and for
  * audio/video payloads (whose codecs are genuinely absent here). Schema,
  * batching, partitioning, and the feature contract are identical on both
  * paths.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (FIXTURES.md §C style). */
  case class MediaRow(
      id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sampleRate: Int)

  case class MediaFeatures(
      id: Long,
      kind: String,
      nBytes: Int,
      checksum: Long,
      features: Array[Float])

  val FeatureDim = 16

  /** Deterministic fake decoder: 16-bin byte histogram, L1-normalized.
    * Replace with a real codec (JNI/ffmpeg/javax.imageio) in production —
    * the call site, batching, and output contract stay identical.
    */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** REAL image decode via `javax.imageio`: bytes → `(width, height,
    * row-major grayscale plane in [0,1])`, grayscale = (r+g+b)/3 per pixel.
    * Returns None for payloads no registered reader accepts — the caller
    * decides fallback policy. Runs inside the same partition-local map as
    * the stand-in (decoders are executor-local; payloads never shuffle).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val plane = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3f
            plane(y * w + x) = lum / 255f
            x += 1
          }
          y += 1
        }
        Some((w, h, plane))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AU/AIFF PCM — in the
    * JVM itself, no external codec): bytes → `(sampleRate, mono samples in
    * [−1,1])`, channels averaged. Accepts the common PCM forms (8-bit
    * unsigned, 16-bit signed, either endianness); anything else returns
    * None and the caller decides fallback policy — the same total-operator
    * contract as [[decodeImage]]. Runs inside the partition-local map;
    * payloads never shuffle.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Float, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        val bits = fmt.getSampleSizeInBits
        val ok = (bits == 8 && enc == PCM_UNSIGNED) ||
          (bits == 8 && enc == PCM_SIGNED) || (bits == 16 && enc == PCM_SIGNED)
        if (!ok) None
        else {
          val bytes = in.readAllBytes()
          val ch = math.max(fmt.getChannels, 1)
          val sampleBytes = bits / 8
          val frameBytes = sampleBytes * ch
          val nFrames = bytes.length / frameBytes
          val out = new Array[Float](nFrames)
          val big = fmt.isBigEndian
          var f = 0
          while (f < nFrames) {
            var acc = 0f
            var c = 0
            while (c < ch) {
              val off = f * frameBytes + c * sampleBytes
              val v =
                if (bits == 8) {
                  if (enc == PCM_UNSIGNED) ((bytes(off) & 0xff) - 128) / 128f
                  else bytes(off) / 128f
                } else {
                  val lo = bytes(off + (if (big) 1 else 0)) & 0xff
                  val hi = bytes(off + (if (big) 0 else 1)).toInt
                  ((hi << 8) | lo).toShort / 32768f
                }
              acc += v
              c += 1
            }
            out(f) = acc / ch
            f += 1
          }
          Some((fmt.getSampleRate, out))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** `nSeg`-segment RMS energy profile of a mono sample buffer — the
    * classic fixed-width audio descriptor (what a loudness/VAD gate or a
    * cheap audio-dedup key reads). Deterministic segment boundaries
    * (`floor(len · s / nSeg)`), each at least one sample wide.
    */
  def rmsProfile(samples: Array[Float], nSeg: Int): Array[Float] = {
    require(nSeg > 0 && samples.nonEmpty, "need samples and nSeg > 0")
    val out = new Array[Float](nSeg)
    var s = 0
    while (s < nSeg) {
      val lo = (samples.length.toLong * s / nSeg).toInt
      val hi = math.min(
        math.max((samples.length.toLong * (s + 1) / nSeg).toInt, lo + 1),
        samples.length)
      var acc = 0.0
      var i = lo
      while (i < hi) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(s) = math.sqrt(acc / math.max(hi - lo, 1)).toFloat
      s += 1
    }
    out
  }

  /** Audio-path feature extraction with the REAL decoder
    * ([[decodeAudio]]): decode to mono samples, emit the
    * [[FeatureDim]]-segment [[rmsProfile]] (same feature contract as the
    * image path). Payloads no audio reader accepts fall back to the
    * deterministic byte-histogram stand-in, so the operator is total over
    * mixed/dirty corpora — fallback share observable via `checksum` (real
    * decodes carry `-1`, the fallback keeps the byte sum). Partition-local
    * map, no shuffle — the 100 TB posture of [[extractFeatures]] unchanged.
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeAudio(r.payload) match {
          case Some((_, samples)) if samples.nonEmpty =>
            MediaFeatures(r.id, r.kind, r.payload.length, -1L,
              rmsProfile(samples, FeatureDim))
          case _ =>
            var sum = 0L
            var i = 0
            while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
            MediaFeatures(r.id, r.kind, r.payload.length, sum,
              fakeDecode(r.payload))
        }
      }
    }
  }

  /** Deterministic square-wave WAV synthesizer (16-bit signed mono PCM,
    * little-endian, written through the SAME `javax.sound.sampled`
    * container API [[decodeAudio]] reads): `nSamples` samples in `nSeg`
    * equal segments, segment `s` alternating `±ampPerSeg(s)` — zero DC,
    * constant per-segment magnitude, so the decoded [[rmsProfile]] is
    * analytically `ampPerSeg(s)/32768` EXACTLY (dyadic values: quantize,
    * square, average over a power-of-two segment and sqrt are all exact
    * IEEE ops). The synthetic-audio fixture generator a pipeline test rig
    * needs, and the oracle anchor for the real-decode path.
    */
  def synthWavSquare(ampPerSeg: Int => Int, nSamples: Int, nSeg: Int,
      rate: Float): Array[Byte] = {
    require(nSamples % nSeg == 0, "segments must divide samples")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val amp = ampPerSeg(i * nSeg / nSamples)
      require(amp >= 0 && amp < 32768, s"amp $amp out of 16-bit range")
      val v: Short = (if (i % 2 == 0) amp else -amp).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Image-path feature extraction with the REAL decoder: decode the payload
    * (`javax.imageio`), nearest-neighbor resize the grayscale plane to 4×4,
    * and emit the 16 pixels as the feature vector (same `FeatureDim`
    * contract as [[fakeDecode]]). Payloads that no image reader accepts fall
    * back to the deterministic byte-histogram stand-in, so the operator is
    * total over mixed/dirty corpora — the fallback share is observable via
    * `checksum` (real decodes carry `-1`, the fallback keeps the byte sum).
    * Partition-local map, no shuffle — the 100 TB posture of
    * [[extractFeatures]] unchanged.
    */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case Some((w, h, plane)) =>
            MediaFeatures(r.id, r.kind, r.payload.length, -1L,
              resizeNearest(plane, w, h, 4, 4))
          case None =>
            var sum = 0L
            var i = 0
            while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
            MediaFeatures(r.id, r.kind, r.payload.length, sum,
              fakeDecode(r.payload))
        }
      }
    }
  }

  /** Partition-local feature extraction: one pass per partition, no shuffle;
    * at 100 TB this is the map stage right after a binary-file scan
    * (payloads never leave their executor).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.id, r.kind, r.payload.length, sum, fakeDecode(r.payload))
      }
    }
  }

  /** Nearest-neighbor resize of a row-major grayscale buffer — the missing
    * middle stage of the decode → resize → featurize image path. Pure
    * per-element index math (`src = floor(dst · srcDim / dstDim)`), the
    * deterministic resize every preprocessing pipeline starts from; swap in
    * a real interpolating kernel without touching the dataflow.
    */
  def resizeNearest(
      pixels: Array[Float], w: Int, h: Int, ow: Int, oh: Int): Array[Float] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0, "dimensions must be positive")
    val out = new Array[Float](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        out(y * ow + x) = pixels(sy * w + (x.toLong * w / ow).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  case class Resized(id: Long, width: Int, height: Int, pixels: Array[Float])

  /** Decode-and-resize for image-kind payloads: the payload is interpreted
    * as a row-major `height × width` grayscale byte plane (truncated/padded
    * to fit — the honest stand-in matching [[fakeDecode]]'s contract), then
    * nearest-neighbor resampled to `ow × oh`. Partition-local map — payloads
    * never shuffle; at 100 TB this is the second map stage over the
    * binary-file scan, between decode and feature extraction.
    */
  def resize(media: Dataset[MediaRow], ow: Int, oh: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "image" && r.width > 0 && r.height > 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val plane = new Array[Float](r.width * r.height)
          var i = 0
          while (i < plane.length) {
            plane(i) = if (i < r.payload.length) (r.payload(i) & 0xff) / 255f else 0f
            i += 1
          }
          Resized(r.id, ow, oh, resizeNearest(plane, r.width, r.height, ow, oh))
        }
      }
  }

  /** REAL video decode: parse a RIFF/AVI container (the MJPEG-in-AVI
    * layout — `RIFF('AVI ' … LIST('movi' 00dc/00db…))`), hand each frame
    * chunk to [[decodeImage]] (`javax.imageio` reads the JPEG frames of a
    * real MJPEG file and the lossless frames [[synthAviGray]] writes —
    * no external codec). Returns the decoded frames in stream order, or
    * None when the payload is not a RIFF/AVI or contains no decodable
    * frame — the caller decides fallback policy, the same total-operator
    * contract as [[decodeImage]]/[[decodeAudio]]. Cross-codec AVIs (e.g.
    * H.264-in-AVI, which no pure-JVM decoder reads) land on None and flow
    * through the byte-histogram stand-in. Runs inside the partition-local
    * map; payloads never shuffle.
    */
  def decodeVideo(payload: Array[Byte]): Option[Seq[(Int, Int, Array[Float])]] = {
    def fourcc(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    try {
      if (payload.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Float])]
      // walk top-level chunks; descend into LIST('movi') and decode its
      // '##db'/'##dc' members (chunk sizes pad to even per RIFF)
      // size fields are UNSIGNED 32-bit; a corrupt/crafted value above
      // Int.MaxValue (or any size walking the cursor backwards) must end
      // the parse, not spin it — a dirty corpus payload must never hang an
      // executor. Both walks therefore refuse non-positive advances.
      var off = 12
      var ok = true
      while (ok && off + 8 <= payload.length) {
        val id = fourcc(off)
        val sz = u32(off + 4)
        if (sz < 0 || sz > Int.MaxValue - 12) ok = false
        else {
          if (id == "LIST" && off + 12 <= payload.length &&
            fourcc(off + 8) == "movi") {
            var p = off + 12
            val end = math.min(off + 8 + sz.toInt, payload.length)
            var okc = true
            while (okc && p + 8 <= end) {
              val cid = fourcc(p)
              val csz = u32(p + 4)
              if (csz < 0 || csz > Int.MaxValue - 12) okc = false
              else {
                if (cid.endsWith("db") || cid.endsWith("dc")) {
                  val lo = p + 8
                  val hi = math.min(lo.toLong + csz, payload.length.toLong).toInt
                  if (hi > lo)
                    decodeImage(java.util.Arrays.copyOfRange(payload, lo, hi))
                      .foreach(frames += _)
                }
                p += 8 + csz.toInt + (csz.toInt & 1)
              }
            }
          }
          off += 8 + sz.toInt + (sz.toInt & 1)
        }
      }
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case _: Exception => None }
  }

  /** Deterministic MJPEG-style AVI synthesizer: `nFrames` solid-gray
    * `w × h` frames (frame `f` at gray level `grayPerFrame(f)`), each
    * encoded by the JVM's own image writer and wrapped in a spec-shaped
    * RIFF/AVI container (`hdrl` with avih/strh/strf, then `movi` with one
    * `00dc` chunk per frame). Solid-gray frames survive the lossy encode
    * EXACTLY (a uniform block's DCT is DC-only, RGB→YCbCr is identity on
    * gray, so decode returns the input level bit-for-bit — asserted in
    * MultimodalSpec), which makes the decoded per-frame mean luminance
    * analytically `gray/255` — the oracle anchor for [[decodeVideo]], the
    * way [[synthWavSquare]] anchors [[decodeAudio]].
    */
  def synthAviGray(grayPerFrame: Int => Int, nFrames: Int, w: Int,
      h: Int): Array[Byte] = {
    require(nFrames > 0 && w > 0 && h > 0, "need frames and positive dims")
    val jpegs = (0 until nFrames).map { f =>
      val g = grayPerFrame(f)
      require(g >= 0 && g < 256, s"gray $g out of byte range")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f) // quant tables of 1 → DC-only exactness
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      wr.dispose(); ios.close()
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc(id) ++ u32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32(body.length + 4L) ++ fourcc(typ) ++ body
    // avih: usec/frame (25 fps), flags 0, total frames, 1 stream, dims
    val avih = chunk("avih", u32(40000) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(nFrames.toLong) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(w.toLong) ++
      u32(h.toLong) ++ Array.fill(16)(0.toByte))
    // strh: video stream, MJPG, rate 25/1, length = nFrames
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
      u32(0) ++ u16(0) ++ u16(0) ++ u32(0) ++ u32(1) ++ u32(25) ++ u32(0) ++
      u32(nFrames.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u16(0) ++ u16(0) ++ u16(w) ++ u16(h))
    // strf: BITMAPINFOHEADER with biCompression = MJPG
    val strf = chunk("strf", u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++
      u16(1) ++ u16(24) ++ fourcc("MJPG") ++ u32(w.toLong * h * 3) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    out.write(fourcc("RIFF")); out.write(u32(body.length.toLong)); out.write(body)
    out.toByteArray
  }

  /** Video-path feature extraction with the REAL decoder ([[decodeVideo]]):
    * one media row in → one row per decoded frame out (`flatMap` — the
    * dataflow [[sampleFrames]] stubs), each with the frame's mean luminance.
    * Payloads no AVI/frame reader accepts fall back to ONE stand-in row
    * (`frame_no = -1`, byte-histogram mean) so the operator stays total over
    * mixed/dirty corpora — real decodes observable via `checksum = -1`, the
    * fallback keeps the byte sum. Partition-local, payloads never shuffle.
    */
  case class VideoFrameFeatures(id: Long, frameNo: Int, width: Int,
      height: Int, nBytes: Int, checksum: Long, meanLum: Float)

  def extractVideoFeatures(
      media: Dataset[MediaRow]): Dataset[VideoFrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeVideo(r.payload) match {
          case Some(frames) =>
            frames.zipWithIndex.map { case ((w, h, plane), f) =>
              var acc = 0.0
              var i = 0
              while (i < plane.length) { acc += plane(i); i += 1 }
              VideoFrameFeatures(r.id, f, w, h, r.payload.length, -1L,
                (acc / math.max(plane.length, 1)).toFloat)
            }
          case None =>
            var sum = 0L
            var i = 0
            while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
            val hist = fakeDecode(r.payload)
            Seq(VideoFrameFeatures(r.id, -1, 0, 0, r.payload.length, sum,
              hist.sum / math.max(hist.length, 1)))
        }
      }
    }
  }

  /** Frame sampling for video-kind payloads: deterministic stride over the
    * payload (a real impl strides over decoded frames; same dataflow shape:
    * one row in → `nFrames` rows out via flatMap).
    */
  case class Frame(id: Long, frameNo: Int, frameBytes: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = r.payload.length
      if (n == 0) Seq.empty
      else (0 until nFrames).map { f =>
        val start = (n.toLong * f / nFrames).toInt
        val end = (n.toLong * (f + 1) / nFrames).toInt
        Frame(r.id, f, r.payload.slice(start, math.max(end, start + 1)))
      }
    }
  }

  /** Build a media table from the documents fixture (text bytes as the
    * opaque payload) — deterministic, so feature outputs are oracle-able.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 64).cast("int").as("width"),
        (col("n_chars") % 48).cast("int").as("height"),
        lit(16000).as("sampleRate"))
      .as[MediaRow]
  }

  /** Perceptual hash over a payload's content histogram — the media-dedup
    * primitive (pHash/aHash family): bin the payload's units into a 64-bin
    * histogram, set bit `d` when the payload's SHARE of bin `d` exceeds the
    * corpus-wide share, and near-dup by Hamming distance over the packed
    * codes ([[phashPairs]]). A real image pipeline bins DCT coefficients or
    * pixel blocks; this stand-in bins character codepoints (the same unit
    * [[fakeDecode]]/[[byteStats]] use — deterministic and oracle-able), and
    * the whole downstream dataflow (code packing, pigeonhole banding, skew
    * guard, exact verify) is the production path unchanged.
    *
    * Share-vs-share, not count-vs-count: raw-count thresholds cluster by
    * payload LENGTH (a long payload is above the corpus mean in every bin,
    * a short one below — measured: ~2k hamming-0 collisions on the 500-doc
    * fixture vs 6 with shares). The test is cross-multiplied integer math —
    * `hist_d · L > len · H_d` with `H_d` the corpus count of bin `d` and
    * `L` the corpus total — so every bit is engine-exact, no division.
    *
    * Scale posture: histogram + length are per-row columnar; the corpus
    * stats are one 64-row hash agg folded to a broadcast row; the code is a
    * per-row projection. Payload content never shuffles — only the 8-byte
    * code enters the pair join.
    *
    * Output `(idCol, phash BIGINT)`; empty payloads are dropped (no signal).
    */
  def perceptualHash(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // one-pass codepoint histogram (see CodepointHistExpr: the
    // substr-per-character + filter-per-bin column form was O(len²) per doc)
    val he = org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.CodepointHistExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col(textCol)), 64))
    val hist = docs
      .where(length(col(textCol)) > 0)
      .select(col(idCol), he.as("_h"))
      .select(col(idCol), element_at(col("_h"), 65).as("_ld"),
        slice(col("_h"), 1, 64).as("_sv"))
    val stats = hist
      .select(col("_ld"), posexplode(col("_sv")).as(Seq("dim", "_v")))
      .groupBy(col("dim"))
      .agg(sum(col("_v")).as("_s"), sum(col("_ld")).as("_l"))
      .agg(max(col("_l")).as("_lc"),
        array_sort(collect_list(struct(col("dim"), col("_s")))).as("_hh"))
      .select(col("_lc"), transform(col("_hh"), s => s.getField("_s")).as("_hs"))
    val code = (0 until 64).map { d =>
      val above = col("_sv").getItem(d) * col("_lc") >
        col("_ld") * element_at(col("_hs"), d + 1)
      when(above, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)
    hist.crossJoin(broadcast(stats))
      .select(col(idCol), code.as("phash"))
  }

  /** Near-dup pairs over [[perceptualHash]] codes: `(a, b, hamming)`,
    * hamming ≤ `maxHamming` — delegates to [[Dedup.simhashPairs]]'s
    * pigeonhole banding + stop-bucket skew guard (one equi-join on
    * `(band, band_value)`, never an all-pairs crossJoin).
    */
  def phashPairs(ph: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      ph.select(col("doc_id"), col("phash").as("simhash")), maxHamming)

  /** SQL-parity feature view used by the oracle query: byte stats computable
    * on both engines (n_bytes, first byte, integer checksum).
    */
  def byteStats(spark: SparkSession, dir: String): DataFrame = {
    // Σ codepoints from the same one-pass histogram expression (slot 66);
    // the aggregate-over-substr form re-walked the string per character
    val he = org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.CodepointHistExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(col("text")), 64))
    graft.Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
      ascii(substring(col("text"), 1, 1)).as("first_byte"),
      element_at(he, 66).as("checksum"))
  }
}
