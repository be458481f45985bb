package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Mp3Features: bit-exact frame-header analysis against hand-built MPEG
  * audio streams (every expected value below is computed from the ISO
  * 11172-3 frame-length/size formulas by hand, not by the code under
  * test). */
class Mp3Spec extends SparkSuite {
  import spark.implicits._

  /** Hand-rolled frame: independent of the Ml.mp3 fixture synthesizer so
    * the two can't share a bug. */
  private def frame(brIdx: Int, srIdx: Int, pad: Boolean, mono: Boolean,
                    versionBits: Int = 3, layerBits: Int = 1): Array[Byte] = {
    val kbpsV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val kbpsV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    val rates = versionBits match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    }
    val kbps = (if (versionBits == 3) kbpsV1L3 else kbpsV2L3)(brIdx)
    val spf = if (versionBits == 3) 1152 else 576
    val len = spf / 8 * (kbps * 1000) / rates(srIdx) + (if (pad) 1 else 0)
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = (0xe0 | (versionBits << 3) | (layerBits << 1) | 1).toByte
    b(2) = ((brIdx << 4) | (srIdx << 2) | (if (pad) 2 else 0)).toByte
    b(3) = (if (mono) 0xc0 else 0x00).toByte
    b
  }

  private def analyze(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("c")
      .select(Multimodal.decodeMp3(col("c")).as("m")).select("m.*")
      .collect()(0)

  test("CBR MPEG1 layer III stereo: frames, duration, bitrate") {
    // 5 frames, 128 kbps (idx 9), 44100 Hz (idx 0), no padding
    val bytes = Array.fill(5)(frame(9, 0, pad = false, mono = false))
      .reduce(_ ++ _)
    val r = analyze(bytes)
    assert(r.getString(0) == "MPEG1")
    assert(r.getInt(1) == 3)               // layer III
    assert(r.getInt(2) == 44100)
    assert(r.getInt(3) == 2)
    assert(r.getLong(4) == 5L)
    // 5 * 1152 / 44100 = 0.13061224489795917
    assert(math.abs(r.getDouble(5) - 5.0 * 1152 / 44100) < 1e-12)
    assert(r.getDouble(6) == 128.0)
    assert(!r.getBoolean(7))
  }

  test("frame length formula: 144*br/sr truncation + padding byte") {
    // 128 kbps @ 44100: 144*128000/44100 = 417.95 -> 417; padded -> 418
    assert(frame(9, 0, pad = false, mono = false).length == 417)
    assert(frame(9, 0, pad = true, mono = false).length == 418)
    val bytes = frame(9, 0, pad = true, mono = false) ++
      frame(9, 0, pad = false, mono = false)
    assert(analyze(bytes).getLong(4) == 2L)
  }

  test("VBR stream: mean bitrate + vbr flag") {
    // alternating 160 (idx 10) / 96 (idx 7) kbps -> mean 128
    val bytes = (0 until 6).map(f =>
      frame(if (f % 2 == 0) 10 else 7, 0, pad = false, mono = true))
      .reduce(_ ++ _)
    val r = analyze(bytes)
    assert(r.getInt(3) == 1)               // mono
    assert(r.getLong(4) == 6L)
    assert(r.getDouble(6) == 128.0)
    assert(r.getBoolean(7))
  }

  test("MPEG2 layer III: 576 samples/frame, low-rate bitrate table") {
    // version bits 10, 24 kbps (idx 3 of the v2 table), 22050 Hz:
    // len = 72*24000/22050 = 78.36 -> 78
    val f = frame(3, 0, pad = false, mono = true, versionBits = 2)
    assert(f.length == 78)
    val r = analyze(f ++ f ++ f)
    assert(r.getString(0) == "MPEG2")
    assert(r.getInt(2) == 22050)
    assert(r.getLong(4) == 3L)
    assert(math.abs(r.getDouble(5) - 3.0 * 576 / 22050) < 1e-12)
  }

  test("ID3v2 prefix skipped via syncsafe size; ID3v1 trailer stops walk") {
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, 1, 3) ++ new Array[Byte](131) // syncsafe 131
    val tag = "TAG".getBytes ++ new Array[Byte](125)
    val audio = Array.fill(4)(frame(9, 0, pad = false, mono = false))
      .reduce(_ ++ _)
    val r = analyze(id3 ++ audio ++ tag)
    assert(r.getLong(4) == 4L)
    assert(r.getDouble(6) == 128.0)
  }

  test("false sync in garbage is rejected; corrupt payloads are null") {
    val df = Seq(
      Tuple1("plain text payload".getBytes),
      Tuple1(Array[Byte](0xff.toByte, 0xfb.toByte, 0x94.toByte, 0x00)),
      // single full frame NOT at EOF and with no valid successor: the
      // 0xFF,0xFB bytes recur mid-payload but nothing corroborates
      Tuple1(frame(9, 0, pad = false, mono = false) ++ "garbage".getBytes ++
        Array[Byte](0xff.toByte, 0xfb.toByte)),
      Tuple1(Array.emptyByteArray)
    ).toDF("c").select(Multimodal.decodeMp3(col("c")).as("m"))
    assert(df.where(col("m").isNotNull).count() == 0)
  }

  test("single frame ending exactly at EOF is trusted") {
    val r = analyze(frame(9, 0, pad = false, mono = false))
    assert(r.getLong(4) == 1L)
  }

  test("truncated final frame is dropped, prefix kept") {
    val full = Array.fill(3)(frame(9, 0, pad = false, mono = false))
      .reduce(_ ++ _)
    val r = analyze(full ++ frame(9, 0, pad = false, mono = false).take(100))
    assert(r.getLong(4) == 3L)
  }

  test("free-format and reserved codes yield null") {
    val free = frame(9, 0, pad = false, mono = false)
    free(2) = (0 << 4).toByte                      // bitrate idx 0 = free
    val badSr = frame(9, 0, pad = false, mono = false)
    badSr(2) = ((9 << 4) | (3 << 2)).toByte        // samplerate idx 3
    val df = Seq(Tuple1(free), Tuple1(badSr)).toDF("c")
      .select(Multimodal.decodeMp3(col("c")).as("m"))
    assert(df.where(col("m").isNotNull).count() == 0)
  }

  test("mm7 gate query: every stream analyzed, corrupt row null-columned") {
    val rows = graft.SparkEntry.queries("mm7_mp3_headers")(
      spark, "/root/testdata/sf0.001")
    assert(rows.count() == 49)
    val good = rows.where(col("version").isNotNull)
    assert(good.count() == 48)
    // spot-pin one CBR stream end-to-end: id 1 -> 21 frames @ idx 2
    // (40 kbps), 48000 Hz (srIdx 1), stereo, no id3/trailer
    val r1 = rows.where(col("media_id") === 1).collect()(0)
    assert(r1.getAs[Long]("n_frames") == 21L)
    assert(r1.getAs[Long]("sample_rate") == 48000L)
    assert(r1.getAs[Long]("n_channels") == 2L)
    assert(r1.getAs[Double]("bitrate_kbps") == 40.0)
    assert(!r1.getAs[Boolean]("vbr"))
  }
}
