package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload with typed metadata — the multimodal column model:
  * binary payloads travel as parquet `binary` columns; decode/feature-extract
  * runs per-partition so decoder setup cost amortizes across a partition's
  * rows (the cluster-scale shape for image/audio/video feature extraction).
  */
final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int, feature_mean: Double)

object Multimodal {

  /** STUB for codec-library formats (JPEG/MP4/Opus…) that this environment
    * cannot decode: a deterministic fake derived from the payload bytes, kept
    * so the generic any-format plumbing (typed Dataset, binary column,
    * mapPartitions batch shape, schema) stays tested end-to-end. Formats the
    * JVM CAN decode natively are NOT stubbed — see the real PNG (ImageIO)
    * and RIFF/WAV PCM16 codecs below, exercised oracle-exactly by
    * q108/q109.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val n = payload.length
    (16 + n % 64, 16 + (n * 7) % 64, 1 + n % 8, (n % 1000) / 997.0)
  }

  /** Per-partition decode → typed features. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one decoder per partition, not per row
      it.map { r =>
        val (w, h, f, m) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, f, m)
      }
    }
  }

  /** documents.text re-encoded as an opaque binary payload — the stand-in for
    * an image/audio bytes column in the driver's testdata.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id"), lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload")).as[MediaRecord]
  }

  // --------------------------------------------------------------------------
  // REAL codecs (no stub): PNG via the JDK's pure-Java ImageIO, WAV (RIFF
  // PCM16) via a hand-rolled chunk parser. The testdata carries no media
  // files, so the gates SYNTHESIZE genuine PNG/WAV bytes from deterministic
  // per-doc pixel/sample formulas, push them through the binary-column
  // pipeline, and DECODE them for real — the DuckDB oracle recomputes the
  // expected features analytically from the same formulas, so any decode
  // error breaks the hash match.

  /** Encode a width×height gray image (r=g=b=v) as real PNG bytes. */
  def encodePngGray(width: Int, height: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = v(x, y) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode an image payload (PNG/BMP/GIF — whatever ImageIO handles) to
    * (width, height, sum of per-pixel mean-channel luminance). The sum stays
    * integral for gray images, so feature math downstream is exact. */
  def imageFeatures(payload: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, sum)
  }

  /** Perceptual average-hash (aHash) of an image payload: the image's 8×8
    * block-mean grid thresholded against the global mean, packed as two
    * 32-bit halves (lo = positions 0–31, hi = 32–63 at pos = cy·8+cx —
    * split so an all-ones hash never needs bit 63, which a replaying SQL
    * engine raises on where Java silently wraps). Pixel (x, y) belongs to
    * cell (min(x·8/w, 7), min(y·8/h, 7)); the threshold is the EXACT
    * integer cross-multiplication cellSum·nPixels > totalSum·cellPixels —
    * no float means, so an oracle replays every bit. Byte-level dedup
    * (md5 of the payload) misses a re-encoded or single-pixel-perturbed
    * copy; the block means shrug those off, which is the whole point of
    * perceptual image dedup. Gray level = red channel (callers encode
    * r=g=b). */
  def aHash64(payload: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    val cs = Array.ofDim[Long](64)
    val cn = Array.ofDim[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val cx = math.min(x * 8 / w, 7)
        val v = (img.getRGB(x, y) >> 16) & 0xFF
        val c = cy * 8 + cx
        cs(c) += v; cn(c) += 1; total += v
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var lo = 0L; var hi = 0L
    var c = 0
    while (c < 64) {
      if (cs(c) * n > total * cn(c)) {
        if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
      }
      c += 1
    }
    (lo, hi)
  }

  /** Nearest-neighbor resize of an image payload, re-encoded as PNG. */
  def resizeNearest(payload: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val out = new java.awt.image.BufferedImage(
      newW, newH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < newH) {
      var x = 0
      while (x < newW) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / newW, y * img.getHeight / newH))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Trivial frame container for video-shaped payloads: int32 frame count,
    * then length-prefixed PNG frames. The point of the layout: frame COUNT
    * is a header read and frame SAMPLING decodes only the selected frames —
    * the decode-only-what-you-sample pattern that makes video feature
    * extraction tractable at corpus scale. */
  def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 4 + frames.map(4 + _.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Header-only frame count — no frame bytes are touched. */
  def frameCount(payload: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(payload).getInt

  /** Every `every`-th frame (0, every, 2·every, …), decoding nothing else;
    * skipped frames are skipped by length prefix. */
  def sampleFrames(payload: Array[Byte], every: Int): Seq[Array[Byte]] = {
    require(every >= 1, "sampling stride must be >= 1")
    val buf = java.nio.ByteBuffer.wrap(payload)
    val n = buf.getInt
    (0 until n).flatMap { i =>
      val len = buf.getInt
      if (i % every == 0) {
        val bytes = new Array[Byte](len); buf.get(bytes); Some(bytes)
      } else {
        buf.position(buf.position() + len); None
      }
    }
  }

  /** Encode mono PCM16 samples as a real RIFF/WAVE file. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE payload by walking its chunks: returns (sampleRate,
    * nSamples, sum of squared sample values) for mono PCM16. The squared sum
    * stays integral, so RMS/duration math downstream is exact. */
  /** Audio energy fingerprint of a RIFF/WAV PCM16 payload: the stream cut
    * into `frameLen`-sample frames (the trailing partial frame included),
    * bit f = 1 iff frame f's energy density strictly exceeds the whole
    * clip's — compared as the EXACT integer cross-multiplication
    * frameEnergy·nSamples > totalEnergy·frameSamples, so a replaying SQL
    * engine reproduces every bit. Returns (nFrames, fingerprint with bit
    * f at position f). A re-encoded or slightly-perturbed copy keeps its
    * frame-energy profile while its WAV BYTES differ — the audio face of
    * perceptual dedup (q226), sibling of [[aHash64]]. Capped at 63 frames
    * (clip fingerprinting is per-window at scale; callers chunk longer
    * audio first). */
  def audioFingerprint(payload: Array[Byte], frameLen: Int = 64): (Int, Long) = {
    require(frameLen >= 1, "frameLen >= 1")
    val samples = wavSamples(payload)
    val n = samples.length
    require(n >= 1, "empty audio payload")
    val nFrames = (n + frameLen - 1) / frameLen
    require(nFrames <= 63, s"fingerprint capped at 63 frames, got $nFrames")
    val fe = Array.ofDim[Long](nFrames)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = samples(i).toLong
      fe(i / frameLen) += v * v
      total += v * v
      i += 1
    }
    var fp = 0L
    var f = 0
    while (f < nFrames) {
      val fs = math.min(frameLen, n - f * frameLen).toLong
      if (fe(f) * n > total * fs) fp |= 1L << f
      f += 1
    }
    (nFrames, fp)
  }

  /** Advance past the rest of a RIFF chunk, honoring word alignment:
    * chunks are padded to even length, so an odd-`len` chunk (a LIST/INFO
    * metadata blob, say) carries one pad byte that is NOT counted in
    * `len`. Skipping exactly `len` would desynchronize the walk on the
    * next tag read. `consumed` = bytes of the chunk body already read. */
  private def skipChunkRest(buf: java.nio.ByteBuffer, len: Int,
                            consumed: Int): Unit = {
    val rest = (len - consumed) + (len & 1)
    buf.position(math.min(buf.position() + math.max(rest, 0), buf.limit()))
  }

  /** Decode the PCM16 sample array of a mono RIFF/WAV payload. */
  def wavSamples(payload: Array[Byte]): Array[Short] = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF payload")
    buf.getInt
    require(tag4() == "WAVE", "not a WAVE payload")
    var out: Array[Short] = null
    var sawFmt = false
    while (buf.remaining() >= 8 && (out == null || !sawFmt)) {
      val id = tag4()
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          require(fmt == 1 && ch == 1, "only mono PCM supported")
          buf.getInt; buf.getInt; buf.getShort
          require(buf.getShort == 16, "only 16-bit PCM supported")
          skipChunkRest(buf, len, consumed = 16)
          sawFmt = true
        case "data" =>
          out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort; i += 1 }
          skipChunkRest(buf, len, consumed = out.length * 2)
        case _ => skipChunkRest(buf, len, consumed = 0)
      }
    }
    require(out != null, "no data chunk")
    out
  }

  def wavFeatures(payload: Array[Byte]): (Int, Int, Long) = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF payload")
    buf.getInt // riff size
    require(tag4() == "WAVE", "not a WAVE payload")
    var sampleRate = -1
    var nSamples = -1
    var sumSq = -1L
    while (buf.remaining() >= 8 && (sampleRate < 0 || nSamples < 0)) {
      val id = tag4()
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          require(fmt == 1 && ch == 1, "only mono PCM supported")
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          require(buf.getShort == 16, "only 16-bit PCM supported")
          skipChunkRest(buf, len, consumed = 16)
        case "data" =>
          nSamples = len / 2
          sumSq = 0L
          var i = 0
          while (i < nSamples) { val s = buf.getShort.toLong; sumSq += s * s; i += 1 }
          skipChunkRest(buf, len, consumed = nSamples * 2)
        case _ => skipChunkRest(buf, len, consumed = 0)
      }
    }
    require(sampleRate > 0 && nSamples >= 0, "missing fmt/data chunk")
    (sampleRate, nSamples, sumSq)
  }
}
