package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north-star): image/audio/
  * video as opaque `binary` columns with typed metadata. The codec
  * paths are real: [[ImageCodec]] PNG and baseline JPEG via JDK
  * `javax.imageio` (+ [[resizeGrayNearest]]), [[WavCodec]] RIFF/WAV
  * PCM16, and [[AviCodec]] AVI carrying either uncompressed DIB frames
  * or MJPEG (one JDK-decoded JPEG per frame chunk) — each with exact
  * pixel/sample/frame feature extraction. Only H.264 (no ffmpeg in
  * this container) remains stubbed ([[StubCodec.decode]]), with the
  * exact signature a real decoder (JNI or a Python worker) would plug
  * into.
  */
object Multimodal {

  /** Media metadata carried next to the payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Wrap a string column as a media payload: (bytes, meta). This is the
    * ingestion shape for any binary modality. */
  def asMedia(df: DataFrame, id: String, payload: String,
      mediaType: String): DataFrame =
    df.select(col(id),
      col(payload).cast("binary").as("bytes"),
      struct(
        lit(mediaType).as("media_type"),
        length(col(payload).cast("binary")).cast("long").as("n_bytes"),
        md5(col(payload).cast("binary")).as("checksum")).as("meta"))

  /** Fixed-size frame sampling: split the payload into `frameBytes`
    * chunks and keep every `stride`-th — the video-keyframe access
    * pattern, as pure column ops (no data movement). */
  def sampleFrames(bytes: org.apache.spark.sql.Column, frameBytes: Int,
      stride: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(length(bytes).cast("double") / frameBytes).cast("int")
    filter(
      transform(sequence(lit(0), nFrames - 1),
        i => struct(i.as("frame_no"),
          bytes.substr(i * frameBytes + 1, lit(frameBytes)).as("frame"))),
      f => pmod(f.getField("frame_no"), lit(stride)) === 0)
  }

  /** REAL image codec over `javax.imageio` (JDK-built-in; PNG is
    * lossless 8-bit so gray pixels round-trip bit-exactly). Grayscale
    * keeps the math closed-form for oracles while the decode path —
    * container format, IDAT inflate, raster conversion — is the real
    * thing a production pipeline runs. */
  object ImageCodec {
    // ImageIO defaults to a DISK-backed stream cache: every encode/decode
    // creates+deletes a temp file, which dominates runtime for small
    // payloads (measured ~4x on 500 tiny PNGs). In-memory streams only.
    javax.imageio.ImageIO.setUseCache(false)

    private def grayImage(w: Int, h: Int,
        px: Array[Byte]): java.awt.image.BufferedImage = {
      require(px.length == w * h, s"expected ${w * h} pixels, got ${px.length}")
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      img
    }

    def encodeGrayPng(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(grayImage(w, h, px), "png", bos)
      bos.toByteArray
    }

    /** Encode gray pixels as baseline JPEG via the JDK's own codec.
      *
      * At `quality = 1.0f` the scaled quantization tables degenerate to
      * all-ones, so any frame whose 8×8 blocks are each SOLID (DC-only:
      * every AC coefficient is exactly zero) round-trips bit-exactly —
      * the property the MJPEG correctness leg (q73) builds on, pinned
      * by spec. General frames are lossy, as JPEG is. */
    def encodeGrayJpeg(w: Int, h: Int, px: Array[Byte],
        quality: Float = 1.0f): Array[Byte] = {
      val img = grayImage(w, h, px)
      val bos = new java.io.ByteArrayOutputStream()
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        wr.setOutput(ios)
        val p = wr.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { wr.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG) to 8-bit
      * gray samples in row-major order. Non-gray inputs are converted
      * through a gray raster (the standard luminance path). */
    def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val gray =
        if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
        else {
          val g = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gr = g.createGraphics()
          try gr.drawImage(img, 0, 0, null) finally gr.dispose()
          g
        }
      val px = new Array[Int](w * h)
      gray.getRaster.getSamples(0, 0, w, h, 0, px)
      (w, h, px)
    }
  }

  /** Nearest-neighbor grayscale resize: out(x, y) = in(x·w/ow, y·h/oh)
    * with integer floor division — fully closed-form, so a resized
    * image's features replay in SQL integer math (the q67 oracle). */
  def resizeGrayNearest(w: Int, h: Int, px: Array[Int],
      ow: Int, oh: Int): Array[Int] = {
    require(px.length == w * h, s"expected ${w * h} pixels, got ${px.length}")
    require(ow > 0 && oh > 0, s"target dims must be positive ($ow x $oh)")
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        out(y * ow + x) = px(sy * w + x * w / ow)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize every media payload to `ow`×`oh` through the REAL codec:
    * decode → nearest-neighbor resample → re-encode PNG. Pure per-row
    * map (no shuffle); output is a media frame again, so resize chains
    * with [[decodeImageFeatures]]/[[sampleFrames]] — the standard
    * image-normalization step of a multimodal training pipeline. */
  def resizeImages(media: DataFrame, id: String, ow: Int,
      oh: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("bytes", BinaryType)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGray(r.getAs[Array[Byte]](bytesIdx))
        val res = resizeGrayNearest(w, h, px, ow, oh)
        Row(r.get(idIdx),
          ImageCodec.encodeGrayPng(ow, oh, res.map(_.toByte)))
      }
    }(Encoders.row(outSchema))
  }

  /** Real pixel features from the real decoder: width/height, mean
    * pixel, and an order-sensitive checksum Σ px(k)·(k+1) mod 1e9+7 —
    * any decode bug (wrong raster order, off-by-one, lossy transcode)
    * changes the checksum. mapPartitions keeps the codec-per-task batch
    * shape; rows stream, never materialized. */
  def decodeImageFeatures(media: DataFrame, id: String): DataFrame = {
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_px", DoubleType),
      StructField("px_checksum", LongType)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGray(r.getAs[Array[Byte]](bytesIdx))
        var sum = 0L
        var chk = 0L
        var k = 0
        while (k < px.length) {
          sum += px(k)
          chk += px(k).toLong * (k + 1)
          k += 1
        }
        Row(r.get(idIdx), w, h, sum.toDouble / (w * h), chk % 1000000007L)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio codec: RIFF/WAVE with 16-bit little-endian PCM — the
    * container needs no external library, and the decode path walks
    * chunks like a production parser (fmt/data located by id, unknown
    * chunks skipped), not a fixed 44-byte offset assumption. Lossless,
    * so samples round-trip bit-exactly and features stay closed-form
    * for the oracle. */
  object WavCodec {
    def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)            // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Decode a PCM16 mono WAV: (sampleRate, samples). Chunk-walking:
      * fmt and data are found wherever they sit (a LIST or fact chunk
      * in between — common in real files — is skipped, odd sizes padded
      * per RIFF). */
    def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag4() == "RIFF", "not a RIFF container")
      bb.getInt // riff size
      require(tag4() == "WAVE", "not a WAVE file")
      var sampleRate = -1
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
        val id = tag4()
        val size = bb.getInt
        id match {
          case "fmt " =>
            val fmt = bb.getShort
            val ch = bb.getShort
            require(fmt == 1 && ch == 1,
              s"only PCM mono supported (fmt=$fmt channels=$ch)")
            sampleRate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            val bits = bb.getShort
            require(bits == 16, s"only 16-bit PCM supported (bits=$bits)")
            bb.position(bb.position() + (size - 16 + (size & 1)))
          case "data" =>
            // like every other branch, leave the cursor at the PADDED
            // chunk end — an odd-sized data chunk before fmt would
            // otherwise misalign the rest of the walk by 1-2 bytes
            val end = bb.position() + size + (size & 1)
            val n = size / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = bb.getShort; i += 1 }
            samples = out
            bb.position(end)
          case _ => // LIST, fact, ... — skip with RIFF odd-size padding
            bb.position(bb.position() + size + (size & 1))
        }
      }
      require(sampleRate > 0 && samples != null, "missing fmt or data chunk")
      (sampleRate, samples)
    }
  }

  /** Real audio features from the real WAV decoder: sample count, mean
    * amplitude, RMS, zero crossings (sign changes over s >= 0), and the
    * same order-sensitive Σ s(k)·(k+1) checksum discipline as the image
    * leg — a wrong sample order, endianness, or chunk offset changes it. */
  def decodeAudioFeatures(media: DataFrame, id: String): DataFrame = {
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("mean_amp", DoubleType),
      StructField("rms", DoubleType),
      StructField("zero_crossings", LongType),
      StructField("amp_checksum", LongType)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, s) = WavCodec.decodePcm16(r.getAs[Array[Byte]](bytesIdx))
        var sum = 0L; var sq = 0L; var zc = 0L; var chk = 0L
        var k = 0
        while (k < s.length) {
          val v = s(k).toLong
          sum += v
          sq += v * v
          chk += v * (k + 1)
          if (k > 0 && (s(k) >= 0) != (s(k - 1) >= 0)) zc += 1
          k += 1
        }
        val n = s.length
        // a 0-byte data chunk is a VALID WAV: zero features, not NaN
        Row(r.get(idIdx), rate, n.toLong,
          if (n == 0) 0.0 else sum.toDouble / n,
          if (n == 0) 0.0 else math.sqrt(sq.toDouble / n), zc,
          ((chk % 1000000007L) + 1000000007L) % 1000000007L)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL video container: AVI (RIFF) with two REAL codecs —
    * uncompressed 8-bit DIB frames ('00db', lossless) and MJPEG frames
    * ('00dc', each frame a baseline JPEG through the JDK's own codec,
    * [[ImageCodec.encodeGrayJpeg]]). Genuine wire format either way:
    * RIFF lists, avih/strh/strf headers, BITMAPINFOHEADER (+ gray
    * palette for DIB), per-frame chunks. The DIB parser honors the two
    * classic gotchas — rows stored BOTTOM-UP and padded to 4 bytes —
    * and the MJPEG path keeps oracle-exact pixels by construction when
    * frames are DC-only (solid 8×8 blocks at quality 1.0; see
    * encodeGrayJpeg). Only H.264 remains out — no ffmpeg in this
    * container; [[StubCodec]] marks where such a decoder plugs in. */
  object AviCodec {
    /** biCompression for MJPEG streams: 'MJPG' as a little-endian int. */
    val MJPG: Int = 0x47504A4D
    private def fourcc(bb: java.nio.ByteBuffer, s: String): Unit =
      { bb.put(s.getBytes("US-ASCII")); () }
    private def rowBytes(w: Int): Int = (w + 3) & ~3

    /** Encode gray frames (`w`×`h` row-major, top-down) as a minimal
      * but structurally complete AVI. */
    def encodeGrayAvi(w: Int, h: Int, fps: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h),
        s"every frame must be ${w * h} gray pixels")
      val rb = rowBytes(w)
      val frameSize = rb * h
      val moviSize = 4 + frames.length * (8 + frameSize)
      val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40 + 1024))
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fourcc(bb, "RIFF"); bb.putInt(riffSize); fourcc(bb, "AVI ")
      fourcc(bb, "LIST"); bb.putInt(hdrlSize); fourcc(bb, "hdrl")
      fourcc(bb, "avih"); bb.putInt(56)
      bb.putInt(1000000 / fps).putInt(frameSize * fps).putInt(0)
        .putInt(0) // no flags: AVIF_HASINDEX must stay off (no idx1 here)
        .putInt(frames.length).putInt(0).putInt(1).putInt(frameSize)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc(bb, "LIST"); bb.putInt(4 + (8 + 56) + (8 + 40 + 1024))
      fourcc(bb, "strl")
      fourcc(bb, "strh"); bb.putInt(56)
      fourcc(bb, "vids"); fourcc(bb, "DIB ")
      bb.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps) // scale/rate
        .putInt(0).putInt(frames.length).putInt(frameSize).putInt(-1)
        .putInt(0)
        .putShort(0).putShort(0).putShort(0).putShort(0) // rcFrame
      fourcc(bb, "strf"); bb.putInt(40 + 1024)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
        .putInt(0) // BI_RGB: uncompressed
        .putInt(frameSize).putInt(0).putInt(0).putInt(256).putInt(256)
      var i = 0
      while (i < 256) { // gray RGBQUAD palette
        bb.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
      }
      fourcc(bb, "LIST"); bb.putInt(moviSize); fourcc(bb, "movi")
      frames.foreach { f =>
        fourcc(bb, "00db"); bb.putInt(frameSize)
        var y = 0
        while (y < h) { // DIB rows are bottom-up, padded to 4 bytes
          val src = (h - 1 - y) * w
          bb.put(f, src, w)
          var p = w
          while (p < rb) { bb.put(0.toByte); p += 1 }
          y += 1
        }
      }
      bb.array()
    }

    /** Encode gray frames (`w`×`h` row-major, top-down) as an MJPEG
      * AVI: same container skeleton as [[encodeGrayAvi]], but the
      * stream is fccHandler/biCompression 'MJPG' and each '00dc' chunk
      * is one whole baseline JPEG (the MJPEG wire convention — every
      * frame an independent keyframe, which is also why the format
      * splits cleanly across Spark rows with no inter-frame state). */
    def encodeGrayMjpegAvi(w: Int, h: Int, fps: Int,
        frames: Seq[Array[Byte]], quality: Float = 1.0f): Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h),
        s"every frame must be ${w * h} gray pixels")
      val jpegs = frames.map(f => ImageCodec.encodeGrayJpeg(w, h, f, quality))
      val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
      val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val maxFrame = jpegs.map(_.length).max
      val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fourcc(bb, "RIFF"); bb.putInt(riffSize); fourcc(bb, "AVI ")
      fourcc(bb, "LIST"); bb.putInt(hdrlSize); fourcc(bb, "hdrl")
      fourcc(bb, "avih"); bb.putInt(56)
      bb.putInt(1000000 / fps).putInt(maxFrame * fps).putInt(0)
        .putInt(0) // no AVIF_HASINDEX: no idx1 chunk here
        .putInt(jpegs.length).putInt(0).putInt(1).putInt(maxFrame)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc(bb, "LIST"); bb.putInt(4 + (8 + 56) + (8 + 40))
      fourcc(bb, "strl")
      fourcc(bb, "strh"); bb.putInt(56)
      fourcc(bb, "vids"); fourcc(bb, "MJPG")
      bb.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(fps) // scale/rate
        .putInt(0).putInt(jpegs.length).putInt(maxFrame).putInt(-1)
        .putInt(0)
        .putShort(0).putShort(0).putShort(0).putShort(0) // rcFrame
      fourcc(bb, "strf"); bb.putInt(40)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
        .putInt(MJPG)
        .putInt(maxFrame).putInt(0).putInt(0).putInt(0).putInt(0)
      fourcc(bb, "LIST"); bb.putInt(moviSize); fourcc(bb, "movi")
      jpegs.foreach { j =>
        fourcc(bb, "00dc"); bb.putInt(j.length)
        bb.put(j)
        if ((j.length & 1) == 1) bb.put(0.toByte) // RIFF odd-size pad
      }
      require(!bb.hasRemaining, // every declared byte written
        s"AVI size bookkeeping drifted: ${bb.remaining()} bytes unwritten")
      bb.array()
    }

    /** Decode to (w, h, frames) with frames as top-down row-major gray
      * samples — BOTH stream codecs: uncompressed DIB (biCompression 0)
      * and MJPEG (biCompression 'MJPG', frames decoded per chunk through
      * the JDK JPEG reader). Chunk-walking like [[WavCodec]]: headers
      * located by id, unknown chunks (idx1, JUNK, INFO lists) skipped. */
    def decodeGrayFrames(bytes: Array[Byte])
        : (Int, Int, Seq[Array[Int]]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag4() == "RIFF", "not a RIFF container")
      bb.getInt
      require(tag4() == "AVI ", "not an AVI file")
      var w = -1; var h = -1; var comp = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = tag4()
          val size = bb.getInt
          val next = bb.position() + size + (size & 1)
          id match {
            case "LIST" =>
              tag4() // hdrl / strl / movi / INFO — recurse into all
              walk(bb.position() + size - 4)
            case "strf" =>
              bb.getInt // biSize
              w = bb.getInt; h = bb.getInt
              bb.getShort
              val bits = bb.getShort
              comp = bb.getInt
              require(comp == MJPG || (bits == 8 && comp == 0),
                s"only uncompressed 8-bit DIB or MJPG supported " +
                  s"(bits=$bits comp=$comp)")
            case "00db" | "00dc" =>
              require(w > 0 && h > 0, "frame chunk before strf header")
              if (comp == MJPG) {
                // one whole baseline JPEG per chunk (MJPEG convention)
                val (fw, fh, px) = ImageCodec.decodeGray(
                  java.util.Arrays.copyOfRange(bytes, bb.position(),
                    bb.position() + size))
                require(fw == w && fh == h,
                  s"MJPEG frame ${fw}x$fh disagrees with strf ${w}x$h")
                frames += px
              } else {
                val rb = rowBytes(w)
                val base = bb.position()
                val px = new Array[Int](w * h)
                var y = 0
                while (y < h) { // un-flip bottom-up rows, drop padding
                  val rowOff = base + (h - 1 - y) * rb
                  var x = 0
                  while (x < w) {
                    px(y * w + x) = bytes(rowOff + x) & 0xff; x += 1
                  }
                  y += 1
                }
                frames += px
              }
            case _ => // avih, strh, idx1, JUNK, ...
          }
          bb.position(next)
        }
      }
      walk(bytes.length)
      require(w > 0 && frames.nonEmpty, "missing strf or frame chunks")
      (w, h, frames.toSeq)
    }
  }

  /** Average-hash (aHash) image fingerprints — the standard perceptual
    * dedup key of large image pipelines: decode (REAL codec), resize to
    * `grid`×`grid` via the exact nearest-neighbor map, then one bit per
    * cell set iff the cell exceeds the image mean. All integer
    * arithmetic (`px·grid² > Σpx` instead of a floating mean), so the
    * hash replays in closed form for the SQL oracle on planted images.
    * Emitted as a grid²-char bit STRING rather than an int64: bit 63
    * would make the key sign-wrap differently across engines' shift
    * semantics, while the string is exact everywhere and groups
    * identically.
    *
    * `grid` sizes the key: 8 (64 bits) is the classic aHash; 16
    * (256 bits) is the corpus-scale variant — with banded Hamming
    * joins, a 64-bit key gives each band only 16 bits of space, and
    * past ~10⁵ images the buckets saturate and candidate volume goes
    * superlinear (measured ×562 candidates for ×100 corpus at the
    * replica — the same failure class as SimHash-16-bit bands, q28).
    * 256-bit keys give 64-bit bands: occupancy stays low at any
    * realistic corpus.
    *
    * Per-row map, no shuffle; dedup is then a groupBy on the hash (or a
    * banded Hamming join for near-dups, same machinery as SimHash). */
  def imageAHash(media: DataFrame, id: String, grid: Int = 8): DataFrame = {
    require(grid > 0 && grid * grid <= 4096, s"grid=$grid")
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("ahash", StringType)))
    val cells = grid * grid
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGray(r.getAs[Array[Byte]](bytesIdx))
        val pg = resizeGrayNearest(w, h, px, grid, grid)
        var sum = 0
        var i = 0
        while (i < cells) { sum += pg(i); i += 1 }
        val bits = new java.lang.StringBuilder(cells)
        i = 0
        while (i < cells) {
          bits.append(if (pg(i) * cells > sum) '1' else '0'); i += 1
        }
        Row(r.get(idIdx), bits.toString)
      }
    }(Encoders.row(outSchema))
  }

  /** Near-duplicate image PAIRS by banded Hamming over [[imageAHash]]
    * bit strings — the LSH step of perceptual image dedup: the 64-bit
    * hash splits into `bands` contiguous substrings, images sharing any
    * band meet in an equi-join, and the exact Hamming distance verifies.
    * Pigeonhole guarantee: a pair within `maxHamming < bands` differing
    * bits has at least one untouched band, so candidate recall is exact
    * (the same argument as SimHash banding).
    *
    * Scale shape: the only shuffle is the band equi-join (candidates,
    * never all pairs); the Hamming verify is per-candidate column work
    * bounded by bucket occupancy. Output: (id1 < id2, hamming),
    * distinct.
    */
  def aHashNearDupPairs(hashes: DataFrame, id: String, hash: String,
      bands: Int = 4, maxHamming: Int = 3, hashBits: Int = 64): DataFrame = {
    require(bands > 0 && hashBits % bands == 0,
      s"bands must divide hashBits=$hashBits (got $bands)")
    require(maxHamming < bands,
      s"recall is exact only for maxHamming < bands ($maxHamming/$bands)")
    // contract: hashBits-char bit strings ([[imageAHash]]'s output). A
    // shorter hash would make the tail bands all-empty-string and the
    // equi-join silently quadratic; the verify kernel re-checks per row
    // (loudly, before any quadratic work completes) since plan-time
    // cannot.
    val bl = hashBits / bands
    val banded = hashes.select(col(id).as("doc_id"), col(hash).as("h"))
      .select(col("doc_id"), col("h"),
        explode(array((0 until bands).map(b => struct(
          lit(b).as("bi"),
          substring(col("h"), b * bl + 1, bl).as("bv"))): _*)).as("b"))
      .select(col("doc_id"), col("h"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = banded.select(col("bi"), col("bv"),
      col("doc_id").as("id1"), col("h").as("h1"))
    val b = banded.select(col("bi"), col("bv"),
      col("doc_id").as("id2"), col("h").as("h2"))
    val spark = hashes.sparkSession
    import spark.implicits._
    // Hamming verify as a typed kernel: identical-image groups make the
    // candidate set quadratic in group size, and an interpreted
    // zip_with per candidate measured ~5 s at sf0.1 — the same hot-path
    // split as the dedup kernels (the banding-recall spec pins outputs).
    // The verify runs STREAMING off the join before any dedup: a pair
    // sharing m bands is verified m times (≤4×, early-exit char
    // compares), but deduping candidates first would instead push the
    // whole quadratic candidate set — both 64-char hashes per row —
    // through a full exchange (tried in round 7: 4.8 s → 26.4 s at the
    // 100× replica, reverted). Only survivors reach the final distinct.
    a.join(b, Seq("bi", "bv")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("h1"), col("h2"))
      .as[(Long, Long, String, String)]
      .mapPartitions(_.flatMap { case (id1, id2, h1, h2) =>
        require(h1.length == hashBits && h2.length == hashBits,
          s"aHashNearDupPairs needs $hashBits-char bit strings (got " +
            s"${h1.length}/${h2.length})")
        var d = 0
        var i = 0
        while (i < hashBits && d <= maxHamming) {
          if (h1.charAt(i) != h2.charAt(i)) d += 1
          i += 1
        }
        if (d <= maxHamming) Some((id1, id2, d.toLong)) else None
      })
      .toDF("id1", "id2", "hamming")
      .distinct()
  }

  /** Frame-sampled features from the real AVI decoder: every `stride`-th
    * frame's mean pixel and order checksum — one output row per KEPT
    * frame (the keyframe-extraction shape of a video pipeline), still a
    * per-row flatMap with no shuffle. */
  def videoFrameFeatures(media: DataFrame, id: String,
      stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive (got $stride)")
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_px", DoubleType),
      StructField("px_checksum", LongType)))
    media.flatMap { r =>
      val (w, h, frames) = AviCodec.decodeGrayFrames(
        r.getAs[Array[Byte]](bytesIdx))
      frames.iterator.zipWithIndex.collect {
        case (px, f) if f % stride == 0 =>
          var sum = 0L; var chk = 0L; var k = 0
          while (k < px.length) {
            sum += px(k); chk += px(k).toLong * (k + 1); k += 1
          }
          Row(r.get(idIdx), f, w, h,
            sum.toDouble / (w * h), chk % 1000000007L)
      }.toSeq
    }(Encoders.row(outSchema))
  }

  /** STUB decoder — deterministic fake features standing in for the one
    * codec this container cannot host: H.264 (needs ffmpeg/JNI; the
    * PNG/JPEG/WAV/DIB/MJPEG paths above are all real). Signature and
    * batching are production-shaped: one call per partition iterator
    * (so a real implementation can amortize codec init per task), rows
    * streamed, never materialized. */
  object StubCodec {
    /** ??? in spirit: a real build would JNI into a codec here. The fake
      * "embedding" is the first `dim` bytes scaled to [0,1) — enough to
      * drive downstream similarity plumbing in tests. */
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = if (i < bytes.length) (bytes(i) & 0xff) / 256.0f else 0.0f
        i += 1
      }
      out
    }
  }

  /** Decode media rows to feature vectors via the stub codec:
    * mapPartitions keeps the codec-per-task shape of a real pipeline. */
  def decodeFeatures(media: DataFrame, id: String, dim: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    media.mapPartitions { rows =>
      // real impl: init codec once per partition here
      rows.map { r =>
        Row(r.get(idIdx),
          StubCodec.decode(r.getAs[Array[Byte]](bytesIdx), dim).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
