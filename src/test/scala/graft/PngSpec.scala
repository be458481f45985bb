package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** PNG decode goldens. The filter-reconstruction tests use HAND-CRAFTED
  * byte streams — zlib stored (uncompressed) deflate blocks, so every
  * filtered byte is written literally in the test and the expected pixels
  * are hand-computed from the PNG spec's reconstruction formulas. That
  * keeps the decoder honest: no shared encoder whose forward-filter bug
  * could cancel a decoder inverse-filter bug. */
class PngSpec extends SparkSuite {
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    be32(data.length) ++ tb ++ data ++ be32(crc.getValue)
  }

  private def ihdr(w: Int, h: Int, colorType: Int): Array[Byte] =
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))

  /** zlib stream holding `raw` in a single STORED deflate block — byte-
    * exact, no compressor in the loop. */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    val len = raw.length
    Array(0x78.toByte, 0x01.toByte, 0x01.toByte,
      (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      (~len & 0xff).toByte, ((~len >> 8) & 0xff).toByte) ++
      raw ++ be32(adler.getValue)
  }

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def png(w: Int, h: Int, colorType: Int,
                  filtered: Array[Byte]): Array[Byte] =
    pngSig ++ ihdr(w, h, colorType) ++
      chunk("IDAT", zlibStored(filtered)) ++ chunk("IEND", Array.emptyByteArray)

  private def decode(bytes: Array[Byte]) = Seq(Tuple1(bytes)).toDF("c")
    .select(Multimodal.decodePng(col("c")).as("p")).select("p.*")

  test("Sub and Up filters reconstruct hand-computed pixels (with wraparound)") {
    // 2x2 RGB. Row 0 filter 1 (Sub): [10,20,30, 5,5,5] →
    // (10,20,30), (15,25,35). Row 1 filter 2 (Up): [1,2,3, 250,0,0] →
    // (11,22,33), ((15+250)&255, 25, 35) = (9,25,35).
    val filtered = Array[Int](1, 10, 20, 30, 5, 5, 5,
                              2, 1, 2, 3, 250, 0, 0).map(_.toByte)
    val r = decode(png(2, 2, 2, filtered)).collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 2, 3)))
    assert(r.getDouble(3) == (10 + 15 + 11 + 9) / (4 * 255.0))
    assert(r.getDouble(4) == (20 + 25 + 22 + 25) / (4 * 255.0))
    assert(r.getDouble(5) == (30 + 35 + 33 + 35) / (4 * 255.0))
  }

  test("Average and Paeth filters reconstruct hand-computed pixels") {
    // 2x2 RGB. Row 0 filter 3 (Average): [100,50,60, 28,29,30] →
    // (100,50,60), (28+⌊100/2⌋, 29+⌊50/2⌋, 30+⌊60/2⌋) = (78,54,60).
    // Row 1 filter 4 (Paeth): [1,2,3, 4,5,6] → first pixel predicts up
    // (a=c=0): (101,52,63); second predicts per-byte (b,b,a) = (78,54,63)
    // → (82,59,69) — worked by hand from the predictor.
    val filtered = Array[Int](3, 100, 50, 60, 28, 29, 30,
                              4, 1, 2, 3, 4, 5, 6).map(_.toByte)
    val r = decode(png(2, 2, 2, filtered)).collect().head
    assert(r.getDouble(3) == (100 + 78 + 101 + 82) / (4 * 255.0))
    assert(r.getDouble(4) == (50 + 54 + 52 + 59) / (4 * 255.0))
    assert(r.getDouble(5) == (60 + 60 + 63 + 69) / (4 * 255.0))
  }

  test("greyscale reports its mean on all channels; RGBA ignores alpha") {
    // 2x1 grey (colorType 0), filter 0: pixels 100, 200
    val grey = decode(png(2, 1, 0, Array[Int](0, 100, 200).map(_.toByte)))
      .collect().head
    assert(grey.getInt(2) == 1)
    val gm = (100 + 200) / (2 * 255.0)
    assert(grey.getDouble(3) == gm && grey.getDouble(4) == gm &&
      grey.getDouble(5) == gm)
    // 1x1 RGBA (colorType 6): pixel (10, 20, 30, alpha 0) — alpha must not
    // touch the means
    val rgba = decode(png(1, 1, 6, Array[Int](0, 10, 20, 30, 0).map(_.toByte)))
      .collect().head
    assert(rgba.getInt(2) == 4)
    assert(rgba.getDouble(3) == 10 / 255.0)
    assert(rgba.getDouble(4) == 20 / 255.0)
    assert(rgba.getDouble(5) == 30 / 255.0)
  }

  test("really-deflated stream round-trips (Deflater-compressed IDAT)") {
    // all-filter-0 4x3 RGB with a real compressor in the loop — exercises
    // the multi-call Inflater path rather than stored blocks
    val w = 4; val h = 3
    val filtered = new java.io.ByteArrayOutputStream()
    val expected = Array.ofDim[Int](3)
    (0 until h).foreach { y =>
      filtered.write(0)
      (0 until w).foreach { x =>
        val px = Seq(x * 40 + y, x + y * 50, 255 - x * 10)
        px.zipWithIndex.foreach { case (v, i) =>
          filtered.write(v); expected(i) += v
        }
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(filtered.toByteArray); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val bytes = pngSig ++ ihdr(w, h, 2) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val r = decode(bytes).collect().head
    assert((r.getInt(0), r.getInt(1)) == ((4, 3)))
    assert(r.getDouble(3) == expected(0) / (w * h * 255.0))
    assert(r.getDouble(4) == expected(1) / (w * h * 255.0))
    assert(r.getDouble(5) == expected(2) / (w * h * 255.0))
  }

  test("malformed, palette, interlaced, and bomb-header payloads yield null") {
    val bad = Seq(
      "not a png at all".getBytes,
      pngSig ++ ihdr(2, 2, 3) ++ chunk("IEND", Array.emptyByteArray), // palette
      pngSig,                                                          // no IHDR
      // forged 2^30 x 2^30 header — must be rejected by the bomb guard,
      // not die allocating
      pngSig ++ chunk("IHDR", be32(1L << 30) ++ be32(1L << 30) ++
        Array[Byte](8, 2, 0, 0, 0)),
      // truncated IDAT (stored block promises 14 bytes, delivers 3)
      png(2, 2, 2, Array[Int](1, 10, 20).map(_.toByte))
    )
    bad.foreach { b =>
      val r = Seq(Tuple1(b)).toDF("c")
        .select(Multimodal.decodePng(col("c")).as("p")).collect().head
      assert(r.isNullAt(0), s"expected null for ${b.length}-byte payload")
    }
  }

  test("png_features callable from SQL; mm4 gate query decodes all 64 images") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT png_features(CAST('junk' AS BINARY)) AS p").collect().head
    assert(row.isNullAt(0))
    val got = SparkEntry.queries("mm4_png_decode")(spark, "/root/testdata/sf0.001")
    val rows = got.collect()
    assert(rows.length == 65)
    assert(rows.count(_.isNullAt(1)) == 1)   // only the corrupt payload
    // spot-check one image against the synthesis formula: means are the
    // average of ((i*7 + x*13 + y*29) % 256, ...) over the 8x6 grid, i=1
    val i = 1
    val exp = (0 until 8).flatMap(x => (0 until 6).map(y =>
      ((i * 7 + x * 13 + y * 29) % 256,
       (i * 11 + x * 3 + y * 17) % 256,
       (i * 5 + x * 23 + y * 7) % 256)))
    val n = 8 * 6 * 255.0
    // Spark's round() is HALF_UP — mirror it exactly
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(4) == r6(exp.map(_._1).sum / n))
    assert(r1.getDouble(5) == r6(exp.map(_._2).sum / n))
    assert(r1.getDouble(6) == r6(exp.map(_._3).sum / n))
  }
}
