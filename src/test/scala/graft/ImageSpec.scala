package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** ImageIO-backed decode (JPEG and friends). Exact goldens come from
  * lossless containers: a BMP decoded by ImageFeatures must match the
  * hand-written BmpFeatures decoder bit-for-bit, and a PNG must match the
  * codec-free PngFeatures path. JPEG is lossy, so its round-trip is
  * asserted within a tolerance on solid-color blocks (which 4:2:0
  * chroma-subsampled JPEG preserves almost exactly). */
class ImageSpec extends SparkSuite {
  import spark.implicits._

  private def encode(fmt: String, w: Int, h: Int)(
      px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, px(x, y))))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def decode(bytes: Array[Byte]) = Seq(Tuple1(bytes)).toDF("c")
    .select(Multimodal.decodeImage(col("c")).as("p")).select("p.*")
    .collect().head

  test("lossless cross-check: ImageIO BMP decode equals the native BmpFeatures") {
    val bytes = encode("bmp", 5, 3)((x, y) => ((x * 40) << 16) | ((y * 70) << 8) | 33)
    val viaImageIo = decode(bytes)
    val viaNative = Seq(Tuple1(bytes)).toDF("c")
      .select(Multimodal.decodeBmp(col("c")).as("p")).select("p.*")
      .collect().head
    assert(viaImageIo.getInt(0) == viaNative.getInt(0))      // width
    assert(viaImageIo.getInt(1) == viaNative.getInt(1))      // height
    assert(viaImageIo.getString(2) == "bmp")
    // means: ImageIO struct has format at idx 2, native has means at 2..4
    assert(viaImageIo.getDouble(3) == viaNative.getDouble(2))
    assert(viaImageIo.getDouble(4) == viaNative.getDouble(3))
    assert(viaImageIo.getDouble(5) == viaNative.getDouble(4))
  }

  test("lossless cross-check: ImageIO PNG decode equals the codec-free PngFeatures") {
    val bytes = encode("png", 4, 4)((x, y) => (x * 60 << 16) | (y * 50 << 8) | 128)
    val viaImageIo = decode(bytes)
    val viaNative = Seq(Tuple1(bytes)).toDF("c")
      .select(Multimodal.decodePng(col("c")).as("p")).select("p.*")
      .collect().head
    assert(viaImageIo.getString(2) == "png")
    assert(viaImageIo.getDouble(3) == viaNative.getDouble(3))
    assert(viaImageIo.getDouble(4) == viaNative.getDouble(4))
    assert(viaImageIo.getDouble(5) == viaNative.getDouble(5))
  }

  test("JPEG: solid color round-trips within lossy tolerance; format reported") {
    val bytes = encode("jpg", 16, 16)((_, _) => (100 << 16) | (150 << 8) | 200)
    val r = decode(bytes)
    assert((r.getInt(0), r.getInt(1)) == ((16, 16)))
    assert(Set("jpeg", "jpg").contains(r.getString(2)))
    assert(math.abs(r.getDouble(3) - 100 / 255.0) < 3 / 255.0, r.getDouble(3))
    assert(math.abs(r.getDouble(4) - 150 / 255.0) < 3 / 255.0, r.getDouble(4))
    assert(math.abs(r.getDouble(5) - 200 / 255.0) < 3 / 255.0, r.getDouble(5))
  }

  test("unreadable and bomb-header payloads yield null before any decode") {
    val junk = Seq(Tuple1("definitely not an image".getBytes)).toDF("c")
      .select(Multimodal.decodeImage(col("c")).as("p")).collect().head
    assert(junk.isNullAt(0))
    // forged BMP header claiming 2^20 x 2^20: the header guard must reject
    // it without allocating a raster
    val bomb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bomb.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bomb.putInt(40).putInt(1 << 20).putInt(1 << 20).putShort(1)
      .putShort(24).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val r = Seq(Tuple1(bomb.array())).toDF("c")
      .select(Multimodal.decodeImage(col("c")).as("p")).collect().head
    assert(r.isNullAt(0))
  }

  test("image_features callable from SQL; mm5 gate decodes 64 JPEGs + 1 null") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT image_features(CAST('junk' AS BINARY)) AS p").collect().head
    assert(row.isNullAt(0))
    val rows = SparkEntry.queries("mm5_image_decode")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 65)
    assert(rows.count(_.isNullAt(1)) == 1)
    assert(rows.filter(!_.isNullAt(1)).forall(r =>
      r.getLong(1) == 16L && r.getLong(2) == 16L))
  }
}

/** Multi-frame GIF sampling: frame selection arithmetic, per-frame
  * palette-exact colors, and null paths. */
class GifSpec extends SparkSuite {
  import spark.implicits._

  private def gif(colors: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, rgb)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    out.toByteArray
  }

  test("samples evenly-spaced frames with exact solid colors") {
    // 4 frames (red, green, blue, white), sample 2 → frames 0 and 2
    val bytes = gif(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    val got = Seq(Tuple1(bytes)).toDF("c")
      .select(explode(graft.operators.Multimodal
        .sampleGifFrames(col("c"), 2)).as("f"))
      .select("f.frame_no", "f.width", "f.mean_r", "f.mean_g", "f.mean_b")
      .as[(Int, Int, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0, 2))
    assert(got.forall(_._2 == 4))
    assert(got(0) == ((0, 4, 1.0, 0.0, 0.0)))   // frame 0: pure red
    assert(got(1) == ((2, 4, 0.0, 0.0, 1.0)))   // frame 2: pure blue
  }

  test("n larger than frame count returns every frame; junk returns null") {
    val bytes = gif(Seq(0x000000, 0xffffff))
    val frames = Seq(Tuple1(bytes)).toDF("c")
      .select(explode(graft.operators.Multimodal
        .sampleGifFrames(col("c"), 10)).as("f"))
      .select("f.frame_no").as[Int].collect().toSeq
    assert(frames == Seq(0, 1))
    val junk = Seq(Tuple1("nope".getBytes)).toDF("c")
      .select(graft.operators.Multimodal.sampleGifFrames(col("c"), 2).as("f"))
      .collect().head
    assert(junk.isNullAt(0))
    // a PNG is readable but not a GIF — must be null, not misprofiled
    val png = {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
    }
    val notGif = Seq(Tuple1(png)).toDF("c")
      .select(graft.operators.Multimodal.sampleGifFrames(col("c"), 2).as("f"))
      .collect().head
    assert(notGif.isNullAt(0))
  }

  test("gif_frames SQL form + mm6 gate: 32 GIFs x 2 frames + 1 null row") {
    GraftExtensions.register(spark)
    val rows = SparkEntry.queries("mm6_gif_frames")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 32 * 2 + 1)
    assert(rows.count(_.isNullAt(1)) == 1)
    val viaSql = spark.sql(
      "SELECT gif_frames(CAST('x' AS BINARY), 2) AS f").collect().head
    assert(viaSql.isNullAt(0))
  }
}
