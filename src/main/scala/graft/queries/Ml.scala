package graft.queries

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Spark-ML and multimodal surface (SURVEY §2.4 A12/A8; north-star ALS
  * collaborative filtering; multimodal binary-column plumbing). These have
  * no SQL oracle (model internals / engine hashing) — declared rows-only,
  * with behavior asserted in ScalaTest. */
object Ml {

  val queries: Seq[Q] = Seq(

    // A12/A8: k-means over the embedding table + cluster-size histogram
    // with top-cluster selection (guessLike_u_like.py:78-79,170).
    Q.rowsOnly("ml1_kmeans_cluster_sizes") { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), array_to_vector(col("embedding")).as("vec"))
      val model = new KMeans().setK(5).setSeed(42L)
        .setFeaturesCol("vec").setPredictionCol("cluster")
        .fit(emb)
      model.transform(emb)
        .groupBy("cluster").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("cluster").asc)
    },

    // North-star MLlib path: implicit-feedback ALS over the purchase graph
    // (customer x part via lineitem), top-5 recommendations for the 2,000
    // most active customers. The gate query keeps the full ALS surface but
    // at gate-sized cost (rank 4, 3 iterations — the reference semantics
    // constrain neither, and the driver bench runs this cold); the
    // recommendation list is emitted as the comma-joined KV value shape
    // (F6) so the driver's row checker can sort scalar cells.
    Q.rowsOnly("ml2_als_recommend") { (s, d) =>
      val interactions = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(count(lit(1)).cast("double").as("rating"))
      val fitted = graft.model.Collaborative.fit(interactions,
        rank = 4, maxIter = 3)
      val activeUsers = interactions
        .groupBy("user").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user").asc).limit(2000)
      graft.model.Collaborative.recommendForUsers(fitted, activeUsers, k = 5)
        .select(col("user"),
          array_join(transform(col("items"), i => i.cast("string")), ",")
            .as("items"))
        .orderBy("user")
    },

    // Multimodal plumbing: pack text payloads as binary + metadata,
    // stub-decode to fixed-dim features, validate batch shape. The byte
    // length and checksum plumbing is real; the embed kernel is the
    // documented deterministic stub.
    Q.rowsOnly("mm1_binary_featurize") { (s, d) =>
      Multimodal.featurize(Tables.documents(s, d), "doc_id", "text", dim = 16)
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          round(graft.functions.VectorFunctions.norm2(col("features")), 6).as("feat_norm"))
        .orderBy("media_id")
    },

    // Multimodal frame sampling: one row per byte-range "frame" per media
    // item (the plan shape of video frame extraction).
    Q.rowsOnly("mm2_frame_sample") { (s, d) =>
      val packed = Multimodal.pack(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(packed, n = 4)
        .select(col("media_id"), col("frame_no").cast("long"),
          length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy("media_id", "frame_no")
    },
  )
}
