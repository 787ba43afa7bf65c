package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.C12): media as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch operators.
  *
  * The container has no image/audio codecs, so `MediaCodec.decode` is a
  * STUB — a clearly-marked deterministic fake deriving metadata from the
  * byte stream. Everything around it is the real Spark shape a production
  * codec would plug into: binary columns, a typed `Dataset` boundary, a
  * `mapPartitions` batch loop (amortizing per-batch codec init exactly
  * like a Pandas-UDF batch would), and frame-level column operators.
  */
object Media {

  /** Typed metadata a decoder emits per media blob. */
  final case class MediaMeta(width: Long, height: Long, channels: Long, nBytes: Long)

  /** STUB CODEC — deterministic fake standing in for a real image
    * decoder; formulas are arbitrary but fixed, so pipelines are
    * testable end-to-end. A real deployment swaps `decode`/`resize`
    * only. */
  object MediaCodec {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(width = 16L + n % 113L, height = 16L + (n * 7L) % 97L,
        channels = 3L, nBytes = n)
    }

    /** STUB resize — nearest-neighbor stride-sample of the byte stream
      * into a w×h×3 buffer (a real codec decodes, interpolates, and
      * re-encodes; the Spark-side contract — fixed-size output derived
      * per blob inside the partition batch loop — is identical). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h * 3)
      if (bytes.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = bytes(((i.toLong * bytes.length) / out.length).toInt)
          i += 1
        }
      }
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
          val m = MediaCodec.decode(bytes)
          (mid, m.width, m.height, m.channels, m.nBytes)
        }
      }
      .toDF("media_id", "width", "height", "channels", "n_bytes")
  }

  /** Resize every blob to w×h×3 bytes via the per-partition codec
    * boundary (same seam as [[decodeMeta]]). */
  def resize(df: DataFrame, id: Column, blob: Column, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), blob.as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // NULL blob ("no media") propagates as NULL, same contract as frames()
        it.map { case (mid, bytes) =>
          (mid, if (bytes == null) null else MediaCodec.resize(bytes, w, h))
        }
      }
      .toDF("media_id", "resized")
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
