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
}
