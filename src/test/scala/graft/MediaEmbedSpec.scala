package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Pins for [[graft.expressions.MediaEmbed]]'s lane dispatch and the
  * codec-less fallback lane (the decoded WAV/BMP/PNG lanes are
  * hash-matched against synthesis ground truth by the mm1b gate; the
  * fallback's FNV remix chain is not SQL-replayable cheaply, so its
  * determinism contract lives here). */
class MediaEmbedSpec extends SparkSuite {
  import spark.implicits._

  private def embed(payload: Array[Byte], dim: Int = 8): Array[Float] =
    Seq(Tuple1(payload)).toDF("content")
      .select(Multimodal.mediaEmbed(col("content"), dim).as("f"))
      .head().getSeq[Float](0).toArray

  test("fallback lane: deterministic, in [-1, 1), replays the FNV remix") {
    val payload = "not decodable media".getBytes("UTF-8")
    val f1 = embed(payload)
    val f2 = embed(payload)
    assert(f1.sameElements(f2), "same bytes must embed identically")
    assert(f1.forall(v => v >= -1f && v < 1f))
    // replay the documented derivation: FNV-1a-64 over bytes, per-dim remix
    var h = 0xcbf29ce484222325L
    payload.foreach(b => h = (h ^ (b & 0xff)) * 0x100000001b3L)
    val expected = Array.tabulate(8) { k =>
      val m = (h ^ k.toLong) * 0x100000001b3L
      val mod = ((m % 100000L) + 100000L) % 100000L
      (mod / 50000.0 - 1.0).toFloat
    }
    assert(f1.sameElements(expected), "fallback must be the documented FNV lane")
  }

  test("dispatch: WAV payloads take the audio lane (window RMS), not the hash") {
    // flat 400-sample square wave, amp 3270 => every window RMS = 3270/32768
    val n = 400
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(2 * n)
    (0 until n).foreach(j => bb.putShort(if (j % 2 == 0) 3270 else -3270))
    val f = embed(bb.array())
    val want = (3270.0 / 32768.0).toFloat
    assert(f.forall(_ == want), s"got ${f.toSeq}, want all $want")
  }

  test("dispatch: image payloads take the luminance lane, bottom-up BMP upright") {
    // 8x8 BMP, grey = 17*y per IMAGE row; dim 8 => chunk k is row k
    val bmp = graft.queries.Ml.bmp24(8, 8)((_, y) => 17 * y)
    val f = embed(bmp)
    val want = Array.tabulate(8)(k => ((17.0 * k * 3) / 765.0).toFloat)
    assert(f.sameElements(want),
      s"got ${f.toSeq}, want ${want.toSeq} — a flipped raster means the " +
        "decoder ignored BMP bottom-up storage")
  }

  test("corrupt truncated WAV header falls back instead of throwing") {
    val junk = "RIFFxxxxWAVE".getBytes("UTF-8") // too short for any chunk walk
    val f = embed(junk)
    assert(f.length == 8) // fallback lane still yields a full vector
  }
}
