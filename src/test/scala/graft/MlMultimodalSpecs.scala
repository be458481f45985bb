package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Sketch accuracy, multimodal plumbing determinism, and ML query sanity. */
class ApproxSpec extends SparkSuite {
  import spark.implicits._

  test("A13b: HLL approx distinct within 5% of exact on events") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"))
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"))
    val joined = exact.join(approx, "event_type")
      .select(col("exact").cast("double"), col("approx").cast("double"))
      .as[(Double, Double)].collect()
    joined.foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.05, s"exact=$e approx=$a")
    }
  }

  test("A20: HLL sketches MERGE consistently — shard-union equals one pass, near exact") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = ev.select(countDistinct(col("user_id"))).as[Long].head()
    val onePass = ev.select(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id))")).as[Double].head()
    // shard by event-id parity, sketch each shard, union the sketches:
    // the incremental path must agree with the single-pass sketch
    val sharded = ev.withColumn("shard", col("event_id") % 2)
      .groupBy("shard").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .select(expr("hll_sketch_estimate(hll_union_agg(sk))")).as[Double].head()
    assert(math.abs(sharded - onePass) / onePass < 0.01,
      s"union-of-shards=$sharded one-pass=$onePass must agree")
    assert(math.abs(onePass - exact) / exact < 0.05,
      s"exact=$exact sketch=$onePass")
  }

  test("T7b: approx percentiles within 5% of exact on document lengths") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.9)").as("e"))
    val approx = docs.groupBy("lang")
      .agg(expr("approx_percentile(n_chars, 0.9)").cast("double").as("a"))
    exact.join(approx, "lang").select(col("e"), col("a"))
      .as[(Double, Double)].collect()
      .foreach { case (e, a) =>
        assert(math.abs(a - e) / math.max(e, 1.0) < 0.05, s"exact=$e approx=$a")
      }
  }
}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "some fake image payload bytes here"),
    (2L, "another payload, rather longer than the first one by a fair margin"),
    (3L, "x")
  ).toDF("id", "payload")

  test("pack: binary content + metadata struct with byte-accurate length") {
    val packed = Multimodal.pack(media, "id", "payload")
    val byId = packed.select(col("media_id"), col("meta.n_bytes"))
      .as[(Long, Long)].collect().toMap
    assert(byId(1L) == "some fake image payload bytes here".getBytes("UTF-8").length)
    assert(byId(3L) == 1L)
    // content survives as raw bytes
    val back = packed.select(col("media_id"), col("content").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(back(2L).startsWith("another payload"))
  }

  test("featurize: deterministic fixed-dim features, ANN-compatible") {
    val f1 = Multimodal.featurize(media, "id", "payload", dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.featurize(media, "id", "payload", dim = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2)                       // stub decode is deterministic
    assert(f1.values.forall(_.size == 8))
    assert(f1.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
    assert(f1(1L) != f1(2L))               // content-sensitive
  }

  test("frame sampling: n byte-range frames per media item, none empty") {
    val packed = Multimodal.pack(media, "id", "payload")
    val frames = Multimodal.sampleFrames(packed, n = 4)
      .select("media_id", "frame_no").as[(Long, Int)].collect()
    assert(frames.count(_._1 == 1L) == 4)
    assert(frames.filter(_._1 == 3L).nonEmpty)  // 1-byte payload still yields frames
  }

  /** Minimal valid WAV: 16-bit PCM mono, `samples` as raw amplitudes. */
  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Minimal 24-bit BMP from row-major (r,g,b) pixels, bottom-up rows. */
  private def bmpBytes(w: Int, h: Int,
                       px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    (h - 1 to 0 by -1).foreach { y =>   // bottom-up row order
      (0 until w).foreach { x =>
        val (r, g, b) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until stride).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  test("decodeWav: REAL decode — square wave has rms == peak == amplitude") {
    // 1000 samples of a ±8192 square wave at 8 kHz: rms = peak = 0.25
    val square = Array.tabulate[Short](1000)(i =>
      if (i % 2 == 0) 8192 else -8192)
    val silent = Array.fill[Short](500)(0)
    val rows = Seq(
      (1L, wavBytes(8000, square)),
      (2L, wavBytes(16000, silent)),
      (3L, "not a wav at all".getBytes)).toDF("id", "content")
    val got = rows.select(col("id"), Multimodal.decodeWav(col("content")).as("w"))
      .select(col("id"), col("w.sample_rate"), col("w.n_samples"),
        col("w.duration_s"), col("w.rms"), col("w.peak"))
      .as[(Long, Option[Int], Option[Long], Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val (_, rate, n, dur, rms, peak) = got(1L)
    assert(rate.contains(8000) && n.contains(1000L))
    assert(math.abs(dur.get - 0.125) < 1e-12)
    assert(math.abs(rms.get - 0.25) < 1e-9 && math.abs(peak.get - 0.25) < 1e-9)
    assert(got(2L)._5.contains(0.0))               // silence: rms 0
    assert(got(3L)._2.isEmpty)                     // malformed → null struct
  }

  test("decodeWav: float32 and unsigned-8-bit variants decode with exact signals") {
    // IEEE float (format 3, 32-bit): amplitudes ±0.5 → rms = peak = 0.5
    def floatWav(vals: Array[Float]): Array[Byte] = {
      val dataLen = vals.length * 4
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(3).putShort(1).putInt(8000).putInt(8000 * 4)
        .putShort(4).putShort(32)
      bb.put("data".getBytes).putInt(dataLen)
      vals.foreach(bb.putFloat)
      bb.array()
    }
    // 8-bit PCM (unsigned, biased at 128): 192 → +0.5, 64 → -0.5
    def u8Wav(vals: Array[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + vals.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + vals.length).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(vals.length)
      vals.foreach(v => bb.put(v.toByte))
      bb.array()
    }
    val rows = Seq(
      (1L, floatWav(Array.tabulate(200)(i => if (i % 2 == 0) 0.5f else -0.5f))),
      (2L, u8Wav(Array.tabulate(100)(i => if (i % 2 == 0) 192 else 64)))
    ).toDF("id", "content")
    val got = rows.select(col("id"), Multimodal.decodeWav(col("content")).as("w"))
      .select(col("id"), col("w.n_samples"), col("w.rms"), col("w.peak"))
      .as[(Long, Option[Long], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2.contains(200L))
    assert(math.abs(got(1L)._3.get - 0.5) < 1e-9 &&
      math.abs(got(1L)._4.get - 0.5) < 1e-9)
    assert(got(2L)._2.contains(100L))
    assert(math.abs(got(2L)._3.get - 0.5) < 1e-9 &&
      math.abs(got(2L)._4.get - 0.5) < 1e-9)
  }

  test("decodeBmp: REAL decode — dimensions and channel means, padded rows") {
    // 3x2 image: left column pure red, rest black → mean_r = 2/6
    val img = bmpBytes(3, 2, (x, _) => if (x == 0) (255, 0, 0) else (0, 0, 0))
    val rows = Seq((1L, img), (2L, Array[Byte](1, 2, 3))).toDF("id", "content")
    val got = rows.select(col("id"), Multimodal.decodeBmp(col("content")).as("b"))
      .select(col("id"), col("b.width"), col("b.height"),
        col("b.mean_r"), col("b.mean_g"), col("b.mean_b"))
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val (_, w, h, mr, mg, mb) = got(1L)
    assert(w.contains(3) && h.contains(2))
    assert(math.abs(mr.get - 2.0 / 6.0) < 1e-12)
    assert(mg.contains(0.0) && mb.contains(0.0))
    assert(got(2L)._2.isEmpty)                     // malformed → null struct
  }

  test("media decode fuzz: arbitrary and truncated bytes yield null, never throw") {
    val rnd = new scala.util.Random(42)
    // random garbage, valid-magic-then-garbage, and truncations of a real
    // file — a corrupt payload must never kill a 100 TB scan
    val realWav = wavBytes(8000, Array.fill[Short](100)(123))
    val cases: Seq[Array[Byte]] =
      (1 to 30).map(i => Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt.toByte)) ++
      Seq("RIFF....WAVE".getBytes, "BM".getBytes,
        realWav.take(20), realWav.take(43),
        bmpBytes(2, 2, (_, _) => (1, 2, 3)).take(40))
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
    val out = df.select(
        Multimodal.decodeWav(col("content")).as("w"),
        Multimodal.decodeBmp(col("content")).as("b"))
      .collect()   // must not throw
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }
}
