package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.C12): media as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch operators.
  *
  * `MediaCodec` decodes REAL images — PNG/JPEG/GIF/BMP bytes go through
  * `javax.imageio` (in the JDK, so zero extra deps even in this offline
  * container) and yield true width/height/channels. Blobs that carry no
  * image magic (the synthetic UTF-8 stand-ins in the test corpus) fall
  * back to a clearly-marked deterministic STUB, so pipelines stay
  * testable end-to-end without media fixtures. The Spark shape is the
  * real pattern a production codec plugs into: binary columns, a typed
  * `Dataset` boundary, a `mapPartitions` batch loop (amortizing
  * per-batch codec init exactly like a Pandas-UDF batch would), and
  * frame-level column operators.
  */
object Media {

  /** Typed metadata a decoder emits per media blob. */
  final case class MediaMeta(width: Long, height: Long, channels: Long, nBytes: Long)

  /** Image codec: real `javax.imageio` decode for bytes that carry a
    * known image magic, deterministic STUB fallback for synthetic
    * blobs (formulas arbitrary but fixed). */
  object MediaCodec {
    /** Cheap magic-number gate so the millions of non-image blobs in a
      * mixed corpus never pay ImageIO's reader-lookup cost. */
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte) ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) || // JPEG SOI
        (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) ||
        (b(0) == 'B'.toByte && b(1) == 'M'.toByte))

    private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!looksLikeImage(bytes)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      // NonFatal, not just IOException: the JDK's BMP/GIF readers throw
      // IllegalArgument/ArrayIndexOutOfBounds on malformed headers — any
      // corrupt magic-bearing blob must land in the stub path, never
      // fail the partition task
      catch { case scala.util.control.NonFatal(_) => None }

    def decode(bytes: Array[Byte]): MediaMeta = readImage(bytes) match {
      case Some(img) =>
        MediaMeta(img.getWidth.toLong, img.getHeight.toLong,
          img.getColorModel.getNumComponents.toLong, bytes.length.toLong)
      case None => // STUB: deterministic fake for non-image blobs
        val n = bytes.length.toLong
        MediaMeta(width = 16L + n % 113L, height = 16L + (n * 7L) % 97L,
          channels = 3L, nBytes = n)
    }

    /** Resize to a w×h×3 RGB buffer. Real images: `"nearest"`
      * (default) samples the decoded raster by pure integer index math;
      * `"bilinear"` — the standard preprocessing-stack filter — blends
      * the 2×2 neighborhood with Q16 FIXED-POINT weights (half-pixel
      * center mapping, edge-clamped), so it is exactly as
      * deterministic as nearest: every weight and product is an
      * integer, no float crosses the result (golden-pixel
      * spec-pinned); `"area"` — the PIL/torchvision `antialias=True`
      * downscale default — averages each destination cell's FULL
      * source footprint with exact rational coverage weights (bilinear
      * reads only a 2×2 neighborhood, so at large downscale factors it
      * aliases: most source pixels never touch the output). Every area
      * weight is an integer overlap in 1/w (resp. 1/h) source-pixel
      * units, the pixel is ONE rational `Σ p·wx·wy / (sw·sh)` rounded
      * half-up — the bilinear Q16 discipline tightened to exactness.
      * All paths are pure JVM loops — no AWT Graphics, headless-safe.
      * Non-image blobs: STUB stride-sample of the byte stream under
      * ANY method (a fake raster has no geometry to filter) — same
      * fixed-size output contract throughout. dHash/pHash stay on
      * nearest: their cross-engine oracles mirror that sampling
      * term-for-term. */
    def resize(bytes: Array[Byte], w: Int, h: Int,
               method: String = "nearest"): Array[Byte] = {
      require(method == "nearest" || method == "bilinear" || method == "area",
        s"resize method must be 'nearest', 'bilinear' or 'area', got '$method'")
      val out = new Array[Byte](w * h * 3)
      readImage(bytes) match {
        case Some(img) if method == "area" =>
          val sw = img.getWidth; val sh = img.getHeight
          // dest cell (x, y) covers source [x·sw/w, (x+1)·sw/w) ×
          // [y·sh/h, (y+1)·sh/h); in 1/w (resp. 1/h) source-pixel
          // units every overlap is an integer and Σwx·Σwy = sw·sh
          val den = sw.toLong * sh.toLong
          var y = 0
          while (y < h) {
            val top = y.toLong * sh; val bot = (y + 1).toLong * sh
            val j0 = (top / h).toInt; val j1 = ((bot - 1) / h).toInt
            var x = 0
            while (x < w) {
              val lef = x.toLong * sw; val rig = (x + 1).toLong * sw
              val i0 = (lef / w).toInt; val i1 = ((rig - 1) / w).toInt
              var sr = 0L; var sg = 0L; var sb = 0L
              var j = j0
              while (j <= j1) {
                val wy = math.min(bot, (j + 1).toLong * h) -
                  math.max(top, j.toLong * h)
                var i = i0
                while (i <= i1) {
                  val wx = math.min(rig, (i + 1).toLong * w) -
                    math.max(lef, i.toLong * w)
                  val p = img.getRGB(i, j)
                  val wgt = wx * wy
                  sr += ((p >> 16) & 0xff) * wgt
                  sg += ((p >> 8) & 0xff) * wgt
                  sb += (p & 0xff) * wgt
                  i += 1
                }
                j += 1
              }
              val o = (y * w + x) * 3
              // half-up: (2·sum + den) / (2·den), all exact longs
              out(o) = (((sr << 1) + den) / (den << 1)).toByte
              out(o + 1) = (((sg << 1) + den) / (den << 1)).toByte
              out(o + 2) = (((sb << 1) + den) / (den << 1)).toByte
              x += 1
            }
            y += 1
          }
        case Some(img) if method == "bilinear" =>
          val sw = img.getWidth; val sh = img.getHeight
          // half-pixel centers in Q16: src = (dst + 0.5)·s/d − 0.5,
          // clamped to the raster — align-corners=false, the
          // torchvision/PIL default geometry
          def coordQ(i: Int, dst: Int, src: Int): Long = {
            val q = ((2L * i + 1) * src << 16) / (2L * dst) - (1L << 15)
            math.max(0L, math.min(q, (src - 1).toLong << 16))
          }
          var y = 0
          while (y < h) {
            val syQ = coordQ(y, h, sh)
            val y0 = (syQ >> 16).toInt
            val fy = syQ & 0xffffL
            val y1 = math.min(y0 + 1, sh - 1)
            var x = 0
            while (x < w) {
              val sxQ = coordQ(x, w, sw)
              val x0 = (sxQ >> 16).toInt
              val fx = sxQ & 0xffffL
              val x1 = math.min(x0 + 1, sw - 1)
              val p00 = img.getRGB(x0, y0); val p10 = img.getRGB(x1, y0)
              val p01 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
              val o = (y * w + x) * 3
              var c = 0
              while (c < 3) {
                val sh8 = 16 - 8 * c
                val top = ((p00 >> sh8) & 0xff) * (65536L - fx) +
                  ((p10 >> sh8) & 0xff) * fx
                val bot = ((p01 >> sh8) & 0xff) * (65536L - fx) +
                  ((p11 >> sh8) & 0xff) * fx
                out(o + c) =
                  ((top * (65536L - fy) + bot * fy + (1L << 31)) >> 32).toByte
                c += 1
              }
              x += 1
            }
            y += 1
          }
        case Some(img) =>
          var y = 0
          while (y < h) {
            val sy = (y.toLong * img.getHeight / h).toInt
            var x = 0
            while (x < w) {
              val sx = (x.toLong * img.getWidth / w).toInt
              val rgb = img.getRGB(sx, sy)
              val o = (y * w + x) * 3
              out(o) = ((rgb >> 16) & 0xff).toByte
              out(o + 1) = ((rgb >> 8) & 0xff).toByte
              out(o + 2) = (rgb & 0xff).toByte
              x += 1
            }
            y += 1
          }
        case None if bytes.nonEmpty =>
          var i = 0
          while (i < out.length) {
            out(i) = bytes(((i.toLong * bytes.length) / out.length).toInt)
            i += 1
          }
        case None => ()
      }
      out
    }

    /** Author a genuine RGB PNG whose pixel (x, y) is the pinned
      * channel formula `R = floorMod(seed·31 + x·7 + y·13, 256)`,
      * `G = floorMod(seed·17 + x·11 + y·3, 256)`,
      * `B = floorMod(seed·23 + x·5 + y·19, 256)` — the image twin of
      * [[MediaCodecWav.authorPcm16]]: the `qmm_png_decode` driver
      * gate writes real PNG bytes through the real `ImageIO` encoder,
      * decodes them back through the real parse, and the oracle
      * replays this formula — PNG is lossless 8-bit truecolor, so the
      * round-trip must be bit-exact. */
    def authorPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      require(w >= 1 && h >= 1, s"dims must be >= 1, got ${w}x$h")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = java.lang.Math.floorMod(seed * 31L + x * 7L + y * 13L, 256L).toInt
          val g = java.lang.Math.floorMod(seed * 17L + x * 11L + y * 3L, 256L).toInt
          val b = java.lang.Math.floorMod(seed * 23L + x * 5L + y * 19L, 256L).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 64-bit difference hash over the 9×8 [[resize]] raster: bit
      * `y*8 + x` set when gray(x+1, y) > gray(x, y), gray = integer
      * mean of the RGB bytes. Same contract for real and stub
      * rasters. */
    def dHash64(bytes: Array[Byte]): Long = {
      val px = resize(bytes, 9, 8)
      var h = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val l = (y * 9 + x) * 3
          val gl = ((px(l) & 0xff) + (px(l + 1) & 0xff) + (px(l + 2) & 0xff)) / 3
          val gr = ((px(l + 3) & 0xff) + (px(l + 4) & 0xff) + (px(l + 5) & 0xff)) / 3
          if (gr > gl) h |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      h
    }
  }

  /** pHash DCT basis in 1e6 fixed-point:
    * `cosT(u)(x) = trunc(cos(π(2x+1)u/64)·1e6)`. A FIXED constant
    * table (truncated once, here, at class-load from constant
    * arguments), shared verbatim with the DuckDB oracle as literals —
    * so the spectral hash needs NO cross-engine libm agreement at
    * all: every DCT coefficient is an exact integer sum of
    * gray·cosT·cosT products. */
  private[graft] val PhashCosMicro: Array[Array[Long]] =
    Array.tabulate(32, 32)((u, x) =>
      (math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 1e6).toLong)

  object MediaCodecPhash {
    /** 63-bit perceptual DCT hash over the 32×32 [[MediaCodec.resize]]
      * raster (the classic pHash recipe): gray = integer mean of RGB;
      * 2-D DCT restricted to the top-left 8×8 frequency block; each of
      * the 63 AC coefficients sets bit `u·8+v−1` when it exceeds the
      * AC MEDIAN (the 32nd smallest of 63 — exact integer, no
      * interpolation). dHash reads local gradients; pHash reads global
      * spectral structure — the canonical complementary pair for
      * image near-dup. Pure integer arithmetic end to end
      * (gray ≤ 255, cos terms 1e6-scaled: |coef| ≤ 255·1e12·1024 ≈
      * 2.6e17 < 2^63). */
    def pHash64(bytes: Array[Byte]): Long = {
      val px = MediaCodec.resize(bytes, 32, 32)
      val g = new Array[Long](1024)
      var i = 0
      while (i < 1024) {
        val o = i * 3
        g(i) = ((px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)) / 3
        i += 1
      }
      val coef = new Array[Long](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0L
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              s += g(y * 32 + x) * PhashCosMicro(u)(x) * PhashCosMicro(v)(y)
              x += 1
            }
            y += 1
          }
          coef(u * 8 + v) = s
          v += 1
        }
        u += 1
      }
      val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
      java.util.Arrays.sort(ac)
      val med = ac(31)
      var h = 0L
      var b = 1
      while (b < 64) {
        if (coef(b) > med) h |= 1L << (b - 1)
        b += 1
      }
      h
    }
  }

  /** [[dHash]]'s spectral sibling: 63-bit perceptual DCT hash per
    * blob ([[MediaCodecPhash.pHash64]]). Same scale contract — blobs
    * hash in place, only `(media_id, 8-byte sig)` ever leaves the
    * partition; NULL blob → NULL hash. */
  def pHash(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mid, bytes) =>
          (mid, if (bytes == null) Option.empty[Long]
                else Some(MediaCodecPhash.pHash64(bytes)))
        }
      }
      .toDF("media_id", "phash")
  }

  /** Spectral near-duplicate image pairs (C51b): pHash signatures fed
    * to the shared pigeonhole Hamming pairer, exactly [[dHashPairs]]'
    * plan shape — one (chunk, value) equi-join shuffle over 8-byte
    * sigs, image bytes never move. */
  def pHashPairs(df: DataFrame, id: Column, blob: Column,
                 maxDist: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = pHash(df, id, blob)
      .filter(col("phash").isNotNull)
      .select(col("media_id").as("doc_id"), col("phash").as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Dedup.hammingPairs64(sigs, maxDist, maxBucket)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }

  /** Typed metadata the WAV decoder emits per audio blob. */
  final case class WavMeta(sampleRate: Long, channels: Long, bitDepth: Long,
                           nFrames: Long, durationMicros: Long, nBytes: Long)

  /** WAV/PCM audio codec — the one audio container the JVM decodes
    * natively (`javax.sound.sampled`, the imageio precedent): real
    * header parse + PCM payload for RIFF/WAVE blobs, deterministic
    * STUB for everything else (this corpus's synthetic blobs carry no
    * real audio), and corrupt magic-bearing bytes fall back to the
    * stub exactly like images do — a malformed header must land in
    * the stub path, never fail the partition task. */
  object MediaCodecWav {
    /** Cheap magic gate (RIFF....WAVE) so non-audio blobs in a mixed
      * corpus never pay the audio-system reader lookup. */
    private def looksLikeWav(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 &&
        b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
        b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
        b(10) == 'V'.toByte && b(11) == 'E'.toByte

    private def open(bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
      if (!looksLikeWav(bytes)) None
      else try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** STUB meta for non-WAV blobs, deterministic from the byte length
      * alone — formulas arbitrary but FIXED and integer-exact, so the
      * registered oracle replays them in SQL (the image-stub
      * discipline). sample_rate ≥ 8000 by construction: the duration
      * division can never hit zero. */
    private[graft] def stubMeta(n: Long): WavMeta = {
      val channels = 1L + n % 2L
      val bitDepth = 8L * (1L + n % 3L)
      val sampleRate = 8000L + (n * 3L) % 40001L
      val nFrames = n / (channels * (bitDepth / 8L))
      WavMeta(sampleRate, channels, bitDepth, nFrames,
        nFrames * 1000000L / sampleRate, n)
    }

    /** Decode sample_rate / channels / bit_depth / frame count /
      * duration. Duration is exact integer µs: frames·10⁶/rate (WAV
      * stores the rate as a u32 — it IS an integer). */
    def decode(bytes: Array[Byte]): WavMeta = open(bytes) match {
      case Some(in) =>
        try {
          val f = in.getFormat
          val rate = math.round(f.getSampleRate.toDouble)
          val nFrames = math.max(0L, in.getFrameLength)
          WavMeta(rate, f.getChannels.toLong, f.getSampleSizeInBits.toLong,
            nFrames, if (rate > 0) nFrames * 1000000L / rate else 0L,
            bytes.length.toLong)
        } finally in.close()
      case None => stubMeta(bytes.length.toLong)
    }

    /** PCM payload + frame size — the data the stride-sample contract
      * operates on. Real WAVs: the decoded stream's bytes (header
      * stripped) under the format's own frame size (channels ×
      * bytes-per-sample); stub blobs: the raw bytes under the stub
      * meta's frame size. */
    def pcm(bytes: Array[Byte]): (Array[Byte], Int) = open(bytes) match {
      case Some(in) =>
        try (in.readAllBytes(), math.max(1, in.getFormat.getFrameSize))
        finally in.close()
      case None =>
        val m = stubMeta(bytes.length.toLong)
        (bytes, (m.channels * (m.bitDepth / 8L)).toInt)
    }

    /** Author a mono 16-bit 8 kHz PCM WAV whose sample i is
      * `floorMod(seed·31 + i·17, 65536) − 32768` — the deterministic
      * corpus synthesizer behind the real-decode driver gate
      * (`qmm_wav_features`): the registered query authors GENUINE
      * RIFF bytes through `AudioSystem.write`, pushes them back
      * through the real `javax.sound.sampled` parse, and the oracle
      * replays this formula in SQL — so the gate proves the decoder
      * recovers the authored samples bit-exactly, not merely that a
      * stub formula replays. */
    def authorPcm16(seed: Long, nSamples: Int): Array[Byte] = {
      require(nSamples >= 0, s"nSamples must be >= 0, got $nSamples")
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val s = java.lang.Math.floorMod(seed * 31L + i * 17L, 65536L) - 32768L
        data(2 * i) = (s & 0xffL).toByte
        data(2 * i + 1) = ((s >> 8) & 0xffL).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      try javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      finally ais.close()
      bos.toByteArray
    }

    /** Decoded integer sample stream: real WAVs read the decoded
      * payload under the format's OWN depth/endianness/signedness
      * (16-bit exact; 8-bit PCM is unsigned by the WAV spec →
      * centered to −128..127; wider depths sign-extend); stub blobs
      * read their raw bytes as centered unsigned 8-bit. Channels stay
      * interleaved — window features treat the sample stream, which
      * for fixed window sizes is per-frame-aligned when the window is
      * a channel multiple. */
    def samples(bytes: Array[Byte]): Array[Int] = open(bytes) match {
      case Some(in) =>
        try {
          val f = in.getFormat
          val payload = in.readAllBytes()
          val bps = math.max(1, f.getSampleSizeInBits / 8)
          val n = payload.length / bps
          val signed = f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val out = new Array[Int](n)
          val bits = bps * 8
          var i = 0
          while (i < n) {
            var v = 0L
            if (f.isBigEndian) {
              var j = 0
              while (j < bps) { v = (v << 8) | (payload(i * bps + j) & 0xffL); j += 1 }
            } else {
              var j = bps - 1
              while (j >= 0) { v = (v << 8) | (payload(i * bps + j) & 0xffL); j -= 1 }
            }
            out(i) =
              if (signed) ((v << (64 - bits)) >> (64 - bits)).toInt
              else (v - (1L << (bits - 1))).toInt
            i += 1
          }
          out
        } finally in.close()
      case None =>
        val out = new Array[Int](bytes.length)
        var i = 0
        while (i < out.length) { out(i) = (bytes(i) & 0xff) - 128; i += 1 }
        out
    }
  }

  /** Attach a binary media column derived from a text column (the test
    * corpus carries no real media; UTF-8 bytes stand in for a blob). */
  def withFakeBlob(df: DataFrame, text: Column): DataFrame =
    df.withColumn("media", encode(text, "UTF-8"))

  /** Decode via the per-partition batch path: the typed Dataset boundary
    * and partition-at-a-time loop are the real pattern (codec init once
    * per partition, rows streamed through it). */
  def decodeMeta(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize here, once per partition
        it.map { case (mid, bytes) =>
          // NULL blob ("no media") → NULL metadata, same contract as
          // resize/byteHistogram
          if (bytes == null)
            (mid, Option.empty[Long], Option.empty[Long], Option.empty[Long], Option.empty[Long])
          else {
            val m = MediaCodec.decode(bytes)
            (mid, Some(m.width), Some(m.height), Some(m.channels), Some(m.nBytes))
          }
        }
      }
      .toDF("media_id", "width", "height", "channels", "n_bytes")
  }

  /** Decode WAV/PCM audio metadata via the per-partition codec
    * boundary — [[decodeMeta]]'s audio twin, same seam, same NULL
    * contract (NULL blob = "no media" → NULL metadata). Real RIFF/WAVE
    * blobs parse through `javax.sound.sampled`; everything else takes
    * the deterministic stub (the registered query's oracle replays the
    * stub formulas; the real-parse path is golden-pinned in WavSpec on
    * an in-memory-authored WAV). */
  def decodeWavMeta(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mid, bytes) =>
          if (bytes == null)
            (mid, Option.empty[Long], Option.empty[Long], Option.empty[Long],
              Option.empty[Long], Option.empty[Long], Option.empty[Long])
          else {
            val m = MediaCodecWav.decode(bytes)
            (mid, Some(m.sampleRate), Some(m.channels), Some(m.bitDepth),
              Some(m.nFrames), Some(m.durationMicros), Some(m.nBytes))
          }
        }
      }
      .toDF("media_id", "sample_rate", "channels", "bit_depth",
        "n_frames", "duration_us", "n_bytes")
  }

  /** Every `stride`-th TYPED PCM frame of each audio blob — the
    * [[sampleFrames]] contract (keep frame indexes ≡ 0 mod stride, a
    * short trailing frame survives) applied to the DECODER's frame
    * grid (frame = channels × bytes-per-sample, header stripped)
    * instead of a caller-guessed byte count; stub blobs sample the raw
    * bytes on the stub meta's grid, so the column-op
    * `sampleFrames(frames(blob, fb), stride)` over the same payload is
    * the law WavSpec pins. NULL blob → NULL, empty payload → empty
    * array (the [[frames]] contract). */
  def wavFrames(df: DataFrame, id: Column, blob: Column,
                stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mid, bytes) =>
          if (bytes == null) (mid, null: Array[Array[Byte]])
          else {
            val (payload, fb) = MediaCodecWav.pcm(bytes)
            val n = (payload.length + fb - 1) / fb // ceil: short tail kept
            val out = Array.newBuilder[Array[Byte]]
            var i = 0
            while (i < n) {
              out += java.util.Arrays.copyOfRange(
                payload, i * fb, math.min((i + 1) * fb, payload.length))
              i += stride
            }
            (mid, out.result())
          }
        }
      }
      .toDF("media_id", "pcm_frames")
  }

  /** Attach a GENUINE authored WAV blob per row (the audio twin of
    * [[withFakeBlob]], one rung more real): `nSamples` 16-bit mono
    * samples under [[MediaCodecWav.authorPcm16]]'s pinned formula,
    * written through the real `AudioSystem` encoder at the codec
    * boundary. Rows carry real RIFF bytes, so everything downstream
    * takes the REAL parse path — the feed the `qmm_wav_features`
    * driver gate decodes back. */
  def withAuthoredWav(df: DataFrame, id: Column, nSamples: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), nSamples.cast("int").as("ns"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        it.map { case (mid, ns) => (mid, MediaCodecWav.authorPcm16(mid, ns)) }
      }
      .toDF("media_id", "media")
  }

  /** Attach a GENUINE authored PNG blob per row — [[withAuthoredWav]]'s
    * image sibling, under [[MediaCodec.authorPng]]'s pinned pixel
    * formula. Rows carry real PNG bytes, so every downstream decode
    * takes the REAL `ImageIO` parse — the feed for the
    * `qmm_png_decode` driver gate. */
  def withAuthoredPng(df: DataFrame, id: Column,
                      w: Column, h: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"),
        w.cast("int").as("w"), h.cast("int").as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (mid, pw, ph) => (mid, MediaCodec.authorPng(mid, pw, ph)) }
      }
      .toDF("media_id", "media")
  }

  /** Decoded PCM sample stream per blob via the per-partition codec
    * boundary — `(media_id, samples array<int>)` under
    * [[MediaCodecWav.samples]]'s depth/endianness/signedness rules.
    * NULL blob ("no media") → NULL array, the [[decodeMeta]]
    * contract. The array column is the handoff point to the
    * DECLARATIVE feature ops ([[pcmWindowFeatures]]): decode is the
    * only thing that needs the imperative seam. */
  def wavSamples(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mid, bytes) =>
          (mid, if (bytes == null) null else MediaCodecWav.samples(bytes))
        }
      }
      .toDF("media_id", "samples")
  }

  /** Per-window integer PCM features over a decoded sample array —
    * `array<struct<win_idx, n_samples, energy, peak, zcr>>`, pure
    * column ops (codegen'd higher-order functions, no codec, no UDF):
    * window w covers samples [w·W, w·W+W) (the last window may be
    * short), `energy` = Σ s², `peak` = max |s|, `zcr` counts sign
    * flips between CONSECUTIVE samples INSIDE the window (no
    * cross-window pair; a zero sample never flips). All arithmetic is
    * 64-bit integer exact — the registered oracle replays it
    * verbatim. NULL samples → NULL; empty → empty array. */
  def pcmWindowFeatures(samples: Column, window: Int): Column = {
    require(window >= 1, s"window must be >= 1, got $window")
    // ceil division in pure int math; the greatest(…,1) guard keeps
    // sequence() ascending for empty arrays — the bogus single window
    // it creates is filtered by its n_samples == 0
    val nw = greatest(
      floor((size(samples) + lit(window - 1)) / lit(window)).cast("int"), lit(1))
    // NULL samples ("no media") → NULL features: without the explicit
    // guard, greatest() IGNORES the null window count and a bogus
    // empty-array result forms — absence of media is not zero windows
    when(samples.isNull, lit(null)).otherwise(filter(
      transform(sequence(lit(0), nw - lit(1)), w => {
        val sl = slice(samples, w * window + 1, lit(window))
        struct(
          w.cast("long").as("win_idx"),
          size(sl).cast("long").as("n_samples"),
          aggregate(sl, lit(0L), (acc, x) =>
            acc + x.cast("long") * x.cast("long")).as("energy"),
          aggregate(sl, lit(0L), (acc, x) =>
            greatest(acc, abs(x.cast("long")))).as("peak"),
          when(size(sl) >= 2,
            aggregate(sequence(lit(2), size(sl)), lit(0L), (acc, j) =>
              acc + when(element_at(sl, j - 1).cast("long") *
                  element_at(sl, j).cast("long") < 0, lit(1L))
                .otherwise(lit(0L))))
            .otherwise(lit(0L)).as("zcr"))
      }),
      s => s.getField("n_samples") > 0))
  }

  /** Resize every blob to w×h×3 bytes via the per-partition codec
    * boundary (same seam as [[decodeMeta]]); `method` is
    * [[MediaCodec.resize]]'s `"nearest"` (default), `"bilinear"` or
    * `"area"`. */
  def resize(df: DataFrame, id: Column, blob: Column, w: Int, h: Int,
             method: String = "nearest"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // NULL blob ("no media") propagates as NULL, same contract as frames()
        it.map { case (mid, bytes) =>
          (mid, if (bytes == null) null else MediaCodec.resize(bytes, w, h, method))
        }
      }
      .toDF("media_id", "resized")
  }

  /** Aspect-ratio bucketing (SURVEY.md §2.C143) — the batching step
    * every image/video training pipeline runs between decode and the
    * dataloader (the SDXL / NovelAI recipe): padding a 9:16 portrait
    * into a square batch wastes ~44% of the pixels AND teaches the
    * model letterboxing, so images are snapped to the nearest ratio
    * in a fixed ladder and batches form WITHIN a bucket. Input is a
    * [[decodeMeta]]-shaped frame (`media_id`, `width`, `height`);
    * output adds `bucket` ("num:den"), the deterministic within-bucket
    * `pos`, and `batch_idx` (`(pos-1) div batchSize` — the last batch
    * per bucket may be short). Rows with NULL/zero dims drop (no media
    * ⇒ no aspect ratio — the decodeMeta NULL contract).
    *
    * Exactness: nearest-ratio is an ALL-INTEGER argmin — comparing
    * |w/h − n_i/d_i| across buckets multiplies through by h·lcm(d):
    * key_i = |w·d_i − n_i·h| · (lcm/d_i), exact longs, ties to the
    * earlier ladder entry — no float ratio ever forms. Within-bucket
    * order is the packShards discipline: FNV(salt:id) compared
    * UNSIGNED via the top-8-bit range split, so batch membership is
    * reproducible on any cluster and any partitioning.
    *
    * Scale shape: bucket assignment is a pure codegen map; the
    * within-bucket positions use per-(bucket, range) partitioned
    * windows (256-way parallel per bucket — never one task per
    * bucket), and the only cross-range state is the
    * ≤ |ladder|·256-row offsets frame, broadcast back. */
  def arBuckets(meta: DataFrame,
                ladder: Seq[(Int, Int)] = Seq((1, 1), (4, 3), (3, 4), (16, 9),
                  (9, 16), (3, 2), (2, 3)),
                batchSize: Int = 8,
                salt: String = "arb"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    require(ladder.nonEmpty && ladder.forall { case (n, d) => n >= 1 && d >= 1 },
      s"ladder ratios must be positive, got $ladder")
    graft.GraftExtensions.ensureRegistered(meta.sparkSession)
    import org.apache.spark.sql.expressions.Window
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmDen = ladder.map(_._2.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    def key(bn: Int, bd: Int): Column =
      abs(w * lit(bd.toLong) - lit(bn.toLong) * h) * lit(lcmDen / bd)
    val (n0, d0) = ladder.head
    val best = ladder.tail.foldLeft(
        struct(key(n0, d0).as("k"), lit(s"$n0:$d0").as("b"))) {
      case (acc, (bn, bd)) =>
        // strict < keeps the EARLIER ladder entry on ties
        when(key(bn, bd) < acc.getField("k"),
          struct(key(bn, bd).as("k"), lit(s"$bn:$bd").as("b"))).otherwise(acc)
    }
    val rows = meta
      .filter(col("width").isNotNull && col("height").isNotNull &&
        col("width") > 0 && col("height") > 0)
      .select(col("media_id"), w.as("width"), h.as("height"),
        best.getField("b").as("bucket"))
      .withColumn("h",
        call_function("fnv1a64", concat(lit(salt + ":"), col("media_id").cast("string"))))
      .withColumn("rng", shiftrightunsigned(col("h"), 56).cast("long"))
    val inRange = Window.partitionBy(col("bucket"), col("rng"))
      .orderBy(col("h"), col("media_id"))
    val local = rows.withColumn("local_pos", row_number().over(inRange).cast("long"))
    val totals = rows.groupBy(col("bucket"), col("rng")).agg(count(lit(1)).as("r_rows"))
    val off = Window.partitionBy(col("bucket")).orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("pos_off", coalesce(sum(col("r_rows")).over(off), lit(0L)))
      .select(col("bucket").as("ob"), col("rng").as("orng"), col("pos_off"))
    local.join(broadcast(offsets),
        col("bucket") === col("ob") && col("rng") === col("orng"))
      .select(col("media_id"), col("width"), col("height"), col("bucket"),
        (col("pos_off") + col("local_pos")).as("pos"))
      .withColumn("batch_idx", expr(s"(pos - 1) div ${batchSize}L"))
  }

  /** Feature extraction — a REAL computation, not a stub: the
    * L1-normalized 256-bin byte histogram of each blob as
    * `array<float>`, shaped exactly like an embedding column so it
    * feeds the similarity operators (Similarity.bruteTopK/lshTopK,
    * Dedup.embeddingCosinePairs*) directly. Runs in the same
    * partition-batch loop a learned feature extractor would. */
  def byteHistogram(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // NULL blob ("no media") propagates as NULL, same contract as frames()
        it.map { case (mid, bytes) =>
          if (bytes == null) (mid, null)
          else {
            val counts = new Array[Float](256)
            var i = 0
            while (i < bytes.length) { counts(bytes(i) & 0xff) += 1f; i += 1 }
            if (bytes.length > 0) {
              var j = 0
              while (j < 256) { counts(j) /= bytes.length; j += 1 }
            }
            (mid, counts)
          }
        }
      }
      .toDF("media_id", "features")
  }

  /** 64-bit difference hash (dHash) of a blob — the standard
    * perceptual image fingerprint: resize to a 9×8 raster (via
    * [[MediaCodec.resize]]'s nearest-neighbor sampling — real decode
    * for real images, the deterministic stride stub for synthetic
    * blobs), integer-average each pixel to gray, and set bit
    * `y*8 + x` when the right neighbor is brighter. Visually-similar
    * images (recompressed, lightly cropped, resized) land within a
    * few bits of each other, so near-dup detection is a Hamming
    * problem — exactly the machinery SimHash already has. Pure
    * integer arithmetic end to end: deterministic across JVMs and
    * partitionings. */
  def dHash(df: DataFrame, id: Column, blob: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // NULL blob ("no media") propagates as NULL, same contract as frames()
        it.map { case (mid, bytes) =>
          (mid, if (bytes == null) Option.empty[Long]
                else Some(MediaCodec.dHash64(bytes)))
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Perceptual near-duplicate image pairs (C51): dHash signatures
    * fed to the shared pigeonhole Hamming pairer
    * ([[graft.operators.Dedup.hammingPairs64]]) — blobs leave their
    * partition as `(media_id, 8-byte sig)`, candidates come from one
    * (chunk, chunk-value) equi-join shuffle, and image bytes never
    * move. NULL blobs are skipped (no media ⇒ no pair). */
  def dHashPairs(df: DataFrame, id: Column, blob: Column,
                 maxDist: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = dHash(df, id, blob)
      .filter(col("dhash").isNotNull)
      .select(col("media_id").as("doc_id"), col("dhash").as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Dedup.hammingPairs64(sigs, maxDist, maxBucket)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }

  /** Fixed-size frame split of a blob (video-style), as an array of
    * binary frames — pure column ops, no codec needed. NULL blob ("no
    * media") passes through as NULL — distinct from a zero-byte blob,
    * which is an empty frame array. */
  def frames(blob: Column, frameBytes: Int): Column = {
    val n = ceil(length(blob).cast("double") / frameBytes).cast("int")
    // empty blob: sequence(1, 0) would run DESCENDING [1, 0] and emit two
    // bogus frames — guard to an empty array instead
    when(blob.isNull, lit(null).cast("array<binary>"))
      .when(length(blob) > 0,
        transform(sequence(lit(1), n),
          i => substring(blob, (i - lit(1)) * frameBytes + 1, lit(frameBytes))))
      .otherwise(typedLit(Array.empty[Array[Byte]]))
  }

  /** Every `stride`-th frame (frame-sampling for video pipelines). */
  def sampleFrames(framesCol: Column, stride: Int): Column =
    filter(framesCol, (_, i) => i % stride === 0)
}
