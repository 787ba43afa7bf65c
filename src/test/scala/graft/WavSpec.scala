package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** C159 WAV/PCM: the REAL `javax.sound.sampled` parse is golden-pinned
  * on an in-memory-authored WAV (the driver gate `qmm_wav_meta` covers
  * only the stub path — the synthetic corpus carries no real audio),
  * corrupt magic-bearing bytes fall back like images, and the typed
  * frame sampler obeys the SAME stride contract as the column-op
  * `sampleFrames(frames(...))` chain.
  */
class WavSpec extends AnyFunSuite {
  import SparkTest._

  /** Author a PCM WAV entirely in memory: `nFrames` frames of
    * 16-bit/2-channel little-endian PCM with a deterministic ramp. */
  private def makeWav(rate: Float, channels: Int, bits: Int,
                      nFrames: Int): (Array[Byte], Array[Byte]) = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, bits, channels,
      true, false)
    val data = Array.tabulate(nFrames * fmt.getFrameSize)(i => (i * 31 % 251).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, data)
  }

  test("decode: real WAV header parses exactly; corrupt falls back to the stub") {
    val (wav, data) = makeWav(rate = 16000f, channels = 2, bits = 16,
      nFrames = 1000)
    val m = Media.MediaCodecWav.decode(wav)
    assert(m == Media.WavMeta(sampleRate = 16000L, channels = 2L,
      bitDepth = 16L, nFrames = 1000L,
      durationMicros = 1000L * 1000000L / 16000L, nBytes = wav.length.toLong),
      s"got $m")
    // PCM payload round-trips byte-for-byte, frame size from the format
    val (pcm, fb) = Media.MediaCodecWav.pcm(wav)
    assert(fb == 4 && pcm.toSeq == data.toSeq)
    // a mono 8-bit WAV exercises the other header shape
    val (wav8, _) = makeWav(rate = 8000f, channels = 1, bits = 8, nFrames = 80)
    val m8 = Media.MediaCodecWav.decode(wav8)
    assert((m8.sampleRate, m8.channels, m8.bitDepth, m8.nFrames,
      m8.durationMicros) == ((8000L, 1L, 8L, 80L, 10000L)))
    // corrupt bytes that still carry the RIFF/WAVE magic must land in
    // the stub path (the image-codec discipline), never throw
    val corrupt = wav.take(20)
    assert(Media.MediaCodecWav.decode(corrupt) ==
      Media.MediaCodecWav.stubMeta(20L))
    // non-WAV bytes take the stub; the stub is pure in the byte length
    val fake = "hello wav".getBytes("UTF-8")
    val s = Media.MediaCodecWav.decode(fake)
    assert(s == Media.MediaCodecWav.stubMeta(fake.length.toLong))
    assert(s.sampleRate >= 8000L && s.durationMicros >= 0L)
  }

  test("decodeWavMeta frame: real + stub + NULL rows through one codec boundary") {
    import spark.implicits._
    val (wav, _) = makeWav(rate = 44100f, channels = 1, bits = 16,
      nFrames = 441)
    val stubBytes = "synthetic-blob".getBytes("UTF-8")
    val rows = Seq((1L, wav), (2L, stubBytes), (3L, wav.take(16)),
      (4L, null: Array[Byte])).toDF("doc_id", "media")
    val got = Media.decodeWavMeta(rows, col("doc_id"), col("media"))
      .orderBy("media_id").collect()
    // real parse
    assert(got(0).getLong(1) == 44100L && got(0).getLong(2) == 1L &&
      got(0).getLong(3) == 16L && got(0).getLong(4) == 441L &&
      got(0).getLong(5) == 441L * 1000000L / 44100L)
    // stub rows replay the stub formulas
    val st = Media.MediaCodecWav.stubMeta(stubBytes.length.toLong)
    assert(got(1).getLong(1) == st.sampleRate &&
      got(1).getLong(4) == st.nFrames && got(1).getLong(5) == st.durationMicros)
    assert(got(2).getLong(1) == Media.MediaCodecWav.stubMeta(16L).sampleRate)
    // NULL blob = "no media" → NULL metadata, the decodeMeta contract
    assert((1 to 6).forall(got(3).isNullAt))
  }

  test("wavFrames: typed PCM sampling equals the column-op stride contract") {
    import spark.implicits._
    val (wav, data) = makeWav(rate = 16000f, channels = 2, bits = 16,
      nFrames = 25)
    val stubBytes = Array.tabulate(37)(i => (i * 7).toByte) // 37 % fb != 0: short tail
    val stride = 3
    val rows = Seq((1L, wav), (2L, stubBytes), (3L, null: Array[Byte]))
      .toDF("doc_id", "media")
    val got = Media.wavFrames(rows, col("doc_id"), col("media"), stride)
      .orderBy("media_id").collect()
    def framesOf(r: org.apache.spark.sql.Row) =
      r.getSeq[Array[Byte]](1).map(_.toSeq)
    // real WAV: every stride-th 4-byte frame of the PCM payload
    val expectReal = data.grouped(4).toSeq.zipWithIndex
      .collect { case (f, i) if i % stride == 0 => f.toSeq }
    assert(framesOf(got(0)) == expectReal && expectReal.size == 9)
    // stub blob: SAME law as sampleFrames(frames(blob, fb), stride) on
    // the stub meta's frame grid — short trailing frame included
    val fb = Media.MediaCodecWav.pcm(stubBytes)._2
    val viaColumns = rows.filter(col("doc_id") === 2L)
      .select(Media.sampleFrames(
        Media.frames(col("media"), fb), stride).as("f"))
      .head().getSeq[Array[Byte]](0).map(_.toSeq)
    assert(framesOf(got(1)) == viaColumns && viaColumns.nonEmpty)
    // NULL blob → NULL
    assert(got(2).isNullAt(1))
  }

  /** The authored-sample formula, in plain Scala — what the oracle
    * replays in SQL and the REAL decode must recover bit-exactly. */
  private def formulaSamples(seed: Long, n: Int): Seq[Int] =
    (0 until n).map(i =>
      (java.lang.Math.floorMod(seed * 31L + i * 17L, 65536L) - 32768L).toInt)

  test("authorPcm16 → samples: the real decoder recovers the authored " +
      "stream bit-exactly; depth/signedness rules hold") {
    // round-trip across seeds and ragged lengths, incl. the 0-sample WAV
    for ((seed, n) <- Seq((0L, 0), (1L, 1), (7L, 64), (12345L, 129), (999999L, 193))) {
      val wav = Media.MediaCodecWav.authorPcm16(seed, n)
      assert(Media.MediaCodecWav.decode(wav).bitDepth == 16L)
      assert(Media.MediaCodecWav.samples(wav).toSeq == formulaSamples(seed, n),
        s"seed=$seed n=$n")
    }
    // 8-bit real WAV: unsigned PCM by the spec → centered to -128..127
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val raw8 = Array[Byte](0, 1, 127.toByte, 128.toByte, 255.toByte)
    val ais8 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw8), fmt8, raw8.length.toLong)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais8,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    assert(Media.MediaCodecWav.samples(bos8.toByteArray).toSeq ==
      Seq(-128, -127, -1, 0, 127))
    // stub path: non-WAV bytes read as centered unsigned 8-bit
    assert(Media.MediaCodecWav.samples(Array[Byte](0, 128.toByte, 255.toByte))
      .toSeq == Seq(-128, 0, 127))
  }

  test("pcmWindowFeatures: window math is integer-exact, zcr stays " +
      "inside the window, ragged tail and NULL/empty contracts hold") {
    val spark2 = spark
    import spark2.implicits._
    // 5 samples, window 3 → windows [3, -4, 0] and [2, -1]:
    //   energy 9+16+0=25 / 4+1=5; peak 4 / 2
    //   zcr window0: (3,-4) flips, (-4,0) zero never flips → 1
    //   zcr window1: (2,-1) flips → 1; the (0,2) CROSS-window pair must NOT count
    val df = Seq(
        (1L, Some(Seq(3, -4, 0, 2, -1))),
        (2L, Some(Seq.empty[Int])),
        (3L, Option.empty[Seq[Int]]))
      .toDF("media_id", "samples")
    val rows = df.select(col("media_id"),
        Media.pcmWindowFeatures(col("samples"), 3).as("w"))
      .orderBy("media_id").collect()
    val w1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(w1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))) ==
      Seq((0L, 3L, 25L, 4L, 1L), (1L, 2L, 5L, 2L, 1L)))
    assert(rows(1).getSeq[Any](1).isEmpty)   // empty samples → no windows
    assert(rows(2).isNullAt(1))              // NULL samples → NULL
    // single-sample window: zcr 0 by construction (no pair exists)
    val one = Seq((1L, Seq(-7))).toDF("media_id", "samples")
      .select(Media.pcmWindowFeatures(col("samples"), 4).as("w"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(one.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))) == Seq((1L, 49L, 7L, 0L)))
  }

  test("withAuthoredWav → wavSamples → pcmWindowFeatures: the full " +
      "driver-gate chain equals the formula computed directly") {
    val spark2 = spark
    import spark2.implicits._
    val ids = Seq(0L, 5L, 41L, 128L)
    val docs = ids.toDF("doc_id")
    val wavs = Media.withAuthoredWav(docs, col("doc_id"),
      lit(64L) + pmod(col("doc_id"), lit(129L)))
    val got = Media.wavSamples(wavs, col("media_id"), col("media"))
      .orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for (id <- ids) {
      val n = (64L + id % 129L).toInt
      assert(got(id) == formulaSamples(id, n), s"id=$id")
    }
    // and the registered feature query's own chain at one row: window
    // sums recomputed naively over the formula
    val feats = Media.wavSamples(wavs, col("media_id"), col("media"))
      .filter(col("media_id") === 41L)
      .select(explode(Media.pcmWindowFeatures(col("samples"), 32)).as("f"))
      .select(col("f.win_idx"), col("f.n_samples"), col("f.energy"),
        col("f.peak"), col("f.zcr"))
      .orderBy("win_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val s41 = formulaSamples(41L, (64L + 41L % 129L).toInt)
    val expect = s41.grouped(32).toSeq.zipWithIndex.map { case (w, wi) =>
      (wi.toLong, w.size.toLong,
        w.map(x => x.toLong * x).sum,
        w.map(x => math.abs(x.toLong)).max,
        w.sliding(2).count(p => p.size == 2 && p(0).toLong * p(1) < 0).toLong)
    }
    assert(feats.toSeq == expect)
  }
}
