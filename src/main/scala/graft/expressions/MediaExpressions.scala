package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL media decoders for the container formats that need no codec
  * library — pure header + sample parsing on the executor, one pass over
  * the binary content (no copy-out, no JNI):
  *
  *   - [[WavFeatures]]: RIFF/WAVE with 16-bit PCM — sample rate, channel
  *     count, sample count, duration, RMS energy, peak amplitude. These
  *     are the audio-quality features a corpus filter runs (silence /
  *     clipping detection) before any model touches the data.
  *   - [[BmpFeatures]]: uncompressed 24-bit BMP — dimensions plus per-
  *     channel mean intensity (normalized), the cheap brightness stats an
  *     image-corpus profiler wants.
  *
  * Malformed or unsupported payloads yield NULL (the engine's drop-bad-
  * rows policy) rather than throwing — a corrupt file must never kill a
  * 100 TB scan. Compressed formats (JPEG/MP3/H.264) still require real
  * codecs and remain behind the documented [[graft.operators.Multimodal]]
  * stubs.
  */
object MediaBytes {
  def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
  def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
}

/** binary → struct(sample_rate, n_channels, n_samples, duration_s, rms,
  * peak) for RIFF/WAVE 16-bit PCM; null otherwise. */
case class WavFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import MediaBytes._

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_s", DoubleType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && (rate == 0 || dataOff < 0)) {
      val id = tag(b, off)
      val sz = u32(b, off + 4).toInt
      // corrupt chunk length (negative after truncation) would walk the
      // cursor backwards into an infinite loop — bail to null instead
      if (sz < 0) return null
      if (id == "fmt " && off + 8 + 16 <= b.length) {
        val audioFormat = u16(b, off + 8)
        channels = u16(b, off + 10)
        rate = u32(b, off + 12).toInt
        bits = u16(b, off + 22)
        if (audioFormat != 1) return null // PCM only
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(sz, b.length - dataOff)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate <= 0 || channels <= 0 || bits != 16 || dataOff < 0 || dataLen < 2)
      return null
    val n = dataLen / 2
    var i = 0
    var sumSq = 0.0
    var peak = 0.0
    while (i < n) {
      val s = ((b(dataOff + 2 * i) & 0xff) |
        (b(dataOff + 2 * i + 1) << 8)).toShort / 32768.0
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    val frames = n / channels
    InternalRow(rate, channels, frames.toLong,
      frames.toDouble / rate, math.sqrt(sumSq / n), peak)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** binary → struct(width, height, mean_r, mean_g, mean_b) for
  * uncompressed 24-bit BMP (BITMAPINFOHEADER); null otherwise. Means are
  * normalized to [0, 1]. */
case class BmpFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import MediaBytes._

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val pixOff = u32(b, 10).toInt
    val width = i32(b, 18)
    val heightRaw = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = u32(b, 30)
    // dimension sanity bound: a forged header with width ~2^30 would
    // overflow the int stride math into negative offsets and throw from
    // a task — cap far above any real bitmap and return null instead
    if (width <= 0 || heightRaw == 0 || bpp != 24 || compression != 0L ||
        width > (1 << 20) || math.abs(heightRaw) > (1 << 20))
      return null
    val height = math.abs(heightRaw) // negative = top-down row order
    val stride = ((width * 3 + 3) / 4) * 4
    if (pixOff < 54 || pixOff + stride.toLong * height > b.length) return null
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var y = 0
    while (y < height) {
      val row = pixOff + y * stride
      var x = 0
      while (x < width) {
        val p = row + x * 3 // BGR byte order
        sb += (b(p) & 0xff); sg += (b(p + 1) & 0xff); sr += (b(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toDouble * height * 255.0
    InternalRow(width, height, sr / n, sg / n, sb / n)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
