package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: opaque `binary` content columns + typed metadata structs, with
  * decode / feature-extraction / resize / frame-sampling stages.
  *
  * Decode comes in three tiers:
  *   - REAL, codec-free native parsers — [[decodeWav]] (RIFF/PCM16),
  *     [[decodeBmp]] (uncompressed 24-bit BMP) and [[decodePng]] (zlib
  *     inflate + full filter reconstruction), validated against
  *     hand-computed signals;
  *   - REAL compressed-image decode via the JDK's built-in ImageIO
  *     readers ([[decodeImage]]: JPEG/PNG/GIF/TIFF/BMP/WBMP — java.desktop
  *     ships the codecs, no external library);
  *   - REAL feature vectors via [[mediaEmbed]]: WAV → windowed RMS
  *     energy contour; images → chunked luminance profile; only
  *     compressed AUDIO/VIDEO sample decode (MP3/H.264) still requires
  *     codec libraries this environment lacks, so those payloads fall to
  *     a deterministic byte-derived stub lane (and [[sampleFrames]]
  *     remains the byte-range stub for codec-less video). The Spark-side
  *     plumbing is real in every lane: binary columns survive
  *     shuffles/spills, metadata travels as a struct, features come out
  *     as `array<float>` ready for [[Ann]], and batch shape follows
  *     `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** Pack a string payload as (content: binary, meta: struct) — the shape a
    * real ingestion job produces from raw media files
    * (`spark.read.format("binaryFile")` yields the same content column). */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
           format: String = "raw"): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(format).as("format"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        xxhash64(col(payloadCol)).as("checksum")).as("meta"))

  /** STUB decode → fixed-dim float features. Deterministic in the content
    * bytes (seeded per dimension via xxhash64), so tests are exact. A real
    * implementation replaces the hash with a codec + model forward pass;
    * signature and plan shape are identical. Kept for TEXT payload
    * embedding (s21/e2e3's deterministic corpus embeddings); media
    * columns should use [[mediaEmbed]], which decodes for real. */
  def fakeEmbed(content: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(100000L)) / lit(50000.0) - lit(1.0))
        .cast("float"))

  /** REAL decode → fixed-dim float features
    * ([[graft.expressions.MediaEmbed]]): WAV payloads yield a windowed
    * RMS energy contour, image payloads (PNG/BMP/JPEG/GIF via ImageIO) a
    * chunked luminance-layout profile; only codec-less formats (MP3
    * samples, H.264) fall back to the documented deterministic hash lane.
    * Value-checked against synthesis ground truth in the mm1b gate. */
  def mediaEmbed(content: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.MediaEmbed(expression(content), dim))
  }

  /** STUB frame sampling: split the payload into `n` byte-range "frames"
    * (a real video decoder emits one row per sampled frame the same way). */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val frameLen = greatest((col("meta.n_bytes") / n).cast("int"), lit(1))
    df.select(col("media_id"), col("meta"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("content"), (i * frameLen + 1).cast("int"), lit(1024)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
      .where(length(col("frame")) > 0)
  }

  /** STUB resize: truncate/pad the payload to `targetBytes` (a real image
    * resize changes dimensions; the plumbing — a codegen'd projection over
    * binary — is the same). */
  def resize(content: Column, targetBytes: Int): Column =
    substring(content, 1, targetBytes)

  /** Full featurization pipeline: pack → decode-to-features
    * ([[mediaEmbed]]: real decode for WAV + every ImageIO-readable image
    * format, deterministic hash lane only for codec-less payloads); the
    * output (media_id, meta, features) feeds [[Ann]] directly. */
  def featurize(df: DataFrame, idCol: String, payloadCol: String,
                dim: Int = 16): DataFrame =
    pack(df, idCol, payloadCol)
      .select(col("media_id"), col("meta"),
        mediaEmbed(col("content"), dim).as("features"))

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** REAL audio decode for RIFF/WAVE 16-bit PCM (no codec library needed):
    * struct(sample_rate, n_channels, n_samples, duration_s, rms, peak),
    * null for malformed/unsupported payloads — the silence/clipping
    * filter stats of an audio-corpus pipeline. One native pass
    * ([[graft.expressions.WavFeatures]]); compressed formats stay behind
    * the documented stubs. */
  def decodeWav(content: Column): Column =
    column(graft.expressions.WavFeatures(expression(content)))

  /** REAL image decode for uncompressed 24-bit BMP: struct(width, height,
    * mean_r, mean_g, mean_b), null for malformed/unsupported — dimension
    * and brightness profiling without a codec
    * ([[graft.expressions.BmpFeatures]]). */
  def decodeBmp(content: Column): Column =
    column(graft.expressions.BmpFeatures(expression(content)))

  /** REAL image decode for PNG (8-bit grey/RGB/grey-alpha/RGBA,
    * non-interlaced): struct(width, height, channels, mean_r, mean_g,
    * mean_b), null for malformed/unsupported. PNG's only compression is
    * zlib DEFLATE — `java.util.zip.Inflater` ships in the JDK — so this is
    * a full codec-free decode including all five scanline filters
    * ([[graft.expressions.PngFeatures]]). */
  def decodePng(content: Column): Column =
    column(graft.expressions.PngFeatures(expression(content)))

  /** REAL compressed-image decode via the JDK's built-in ImageIO readers
    * (JPEG/PNG/GIF/TIFF/BMP/WBMP): struct(width, height, format, mean_r,
    * mean_g, mean_b), null for unreadable payloads; header-level bomb
    * guard before any pixel decode ([[graft.expressions.ImageFeatures]]). */
  def decodeImage(content: Column): Column =
    column(graft.expressions.ImageFeatures(expression(content)))

  /** REAL frame sampling from animated GIFs (`n` evenly-spaced frames
    * decoded + profiled via the JDK's multi-image reader) — the actual
    * video-frame-extraction shape; [[sampleFrames]] remains the
    * byte-range stub for formats whose codecs the environment lacks
    * ([[graft.expressions.GifFrames]]). */
  def sampleGifFrames(content: Column, n: Int): Column =
    column(graft.expressions.GifFrames(expression(content), n))

  /** REAL MPEG-audio (MP3) container analysis — a frame-header walk, no
    * codec: struct(version, layer, sample_rate, n_channels, n_frames,
    * duration_s, bitrate_kbps, vbr), null for payloads with no
    * trustworthy frame sequence. Duration / bitrate / channel-mode are
    * exactly what an audio-corpus filter needs (too-short clips,
    * low-bitrate junk) and are fully self-described by the frame headers;
    * PCM decode of the compressed payload stays behind the documented
    * stubs ([[graft.expressions.Mp3Features]]). */
  def decodeMp3(content: Column): Column =
    column(graft.expressions.Mp3Features(expression(content)))
}
