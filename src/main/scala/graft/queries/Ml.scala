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

    // A12 value-checked complement of ml1: ONE Lloyd assignment step
    // against FIXED centroids drawn from the table itself (vec_id
    // 0/100/200/300) — the part of k-means that actually runs over 100 TB
    // (the fit samples; the assignment scans). dist² is computed as
    // (v·v − 2 v·c) + c·c with the native VectorDot kernel — index-order
    // double accumulation, so DuckDB's list_dot_product replays it
    // bit-for-bit and the argmin (tie → smaller centroid id) is exactly
    // checkable. Plan: broadcast 4 centroid rows × scan, one |k|-sized
    // final agg — no corpus shuffle until the 4-row count.
    Q("ml1b_kmeans_assign",
      """WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        |           FROM embeddings WHERE vec_id IN (0, 100, 200, 300)),
        |sc AS (SELECT e.vec_id, c.cid,
        |         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
        |           - 2.0 * list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
        |           + list_dot_product(c.cvec, c.cvec) AS dist2
        |       FROM embeddings e CROSS JOIN c),
        |a AS (SELECT vec_id, cid,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        |      FROM sc)
        |SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n
        |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cluster""".stripMargin) { (s, d) =>
      import graft.functions.VectorFunctions.dot
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cents = emb.where(col("vec_id").isin(0L, 100L, 200L, 300L))
        .select(col("vec_id").as("cid"), col("v").as("cvec"))
      val scored = emb.crossJoin(broadcast(cents))
        .withColumn("dist2",
          dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("cvec"))
            + dot(col("cvec"), col("cvec")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("dist2").asc, col("cid").asc)
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("cid").as("cluster"))
        .agg(count(lit(1)).as("n"))
        .orderBy("cluster")
    },

    // North-star MLlib path: implicit-feedback ALS over the purchase graph
    // (customer x part via lineitem), top-5 recommendations for the 2,000
    // most active customers. The gate query keeps the full ALS surface but
    // at gate-sized cost (rank 4, 3 iterations — the reference semantics
    // constrain neither, and the driver bench runs this cold); the
    // recommendation list is emitted as the comma-joined KV value shape
    // (F6) so the driver's row checker can sort scalar cells.
    Q.rowsOnly("ml2_als_recommend") { (s, d) =>
      import s.implicits._
      // the interaction matrix feeds BOTH the fit and the active-user
      // ranking — cache it once for the two passes, and release it before
      // returning: the user list is collected (bounded by limit(2000), the
      // same capped-collect pattern as rank/Blend) so the returned plan
      // reads only the fitted factors plus a 2,000-row local relation,
      // never the interaction pipeline
      val interactions = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(count(lit(1)).cast("double").as("rating"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      interactions.count()   // materialize before the two dependent passes
      val fitted = graft.model.Collaborative.fit(interactions,
        rank = 4, maxIter = 3)
      val activeUsers = interactions
        .groupBy("user").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user").asc).limit(2000)
        .select("user").as[Long].collect()
      interactions.unpersist()
      graft.model.Collaborative.recommendForUsers(fitted,
          activeUsers.toSeq.toDF("user"), k = 5)
        .select(col("user"),
          array_join(transform(col("items"), i => i.cast("string")), ",")
            .as("items"))
        .orderBy("user")
    },

    // ml2's value-checked sibling (the ml1b/ml4b fixed-model playbook):
    // the ALS SERVING surface — recommendForUserSubset's blocked factor
    // cross-product top-k — run over PINNED rank-4 factor matrices built
    // from the customer/part keys, so the oracle can replay every dot
    // product. The factors are constructed for float-exactness AND
    // tie-freedom: coarse components live on a 1/8 grid (products on
    // 1/64), and the item's component 0 adds i/2^18 against a constant
    // user component of 1.0 — every partial sum is (m·2^12 + i)/2^18 with
    // |m·2^12 + i| < 2^20, exactly representable in float32, so MLlib's
    // sdot equals DuckDB's double arithmetic bit-for-bit; coarse score
    // gaps (≥ 1/64) dominate the id term (< 2^-10), so ranks are unique
    // and the float/double orderings provably agree. What ml2 leaves
    // rows-only is ONLY the fit's numerics; the serving path — the part
    // that runs per-request at scale — is hash-matched here.
    Q("ml2b_als_fixed_factors",
      """WITH users AS (SELECT c_custkey AS u FROM customer WHERE c_custkey <= 100),
        |items AS (SELECT p_partkey AS i FROM part WHERE p_partkey <= 200),
        |js AS (SELECT * FROM (VALUES (1), (2), (3)) t(j)),
        |scores AS (
        |  SELECT u, i,
        |    i / 262144.0 +
        |    SUM((((u * 31 + j * 17) % 17) - 8) / 8.0
        |        * (((i * 13 + j * 7) % 17) - 8) / 8.0) AS sc
        |  FROM users CROSS JOIN items CROSS JOIN js
        |  GROUP BY u, i),
        |ranked AS (
        |  SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY sc DESC, i) AS rnk
        |  FROM scores)
        |SELECT u AS user_id,
        |  string_agg(CAST(i AS VARCHAR), ',' ORDER BY rnk) AS items
        |FROM ranked WHERE rnk <= 5
        |GROUP BY u
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      def comp(id: org.apache.spark.sql.Column, m: Int, jm: Int, j: Int) =
        ((id * m + j * jm) % 17 - 8).cast("double") / 8.0
      val userF = Tables.customer(s, d)
        .where(col("c_custkey") <= 100)
        .select(col("c_custkey").as("id"),
          array(lit(1.0) +: (1 to 3).map(j => comp(col("c_custkey"), 31, 17, j)): _*)
            .as("features"))
      val itemF = Tables.part(s, d)
        .where(col("p_partkey") <= 200)
        .select(col("p_partkey").as("id"),
          array(col("p_partkey").cast("double") / 262144.0 +:
            (1 to 3).map(j => comp(col("p_partkey"), 13, 7, j)): _*)
            .as("features"))
      val fitted = graft.model.Collaborative.fromFactors(4, userF, itemF)
      graft.model.Collaborative.recommendForUsers(fitted,
          userF.select(col("id").as("user")), k = 5)
        .select(col("user").as("user_id"),
          array_join(transform(col("items"), i => i.cast("string")), ",")
            .as("items"))
        .orderBy("user_id")
    },

    // The ALS FIT-STEP value check ml2 could not give (round-10 item 7):
    // one normal-equations half-step — fixed item factors → closed-form
    // user factors, Collaborative.solveUserFactors, the fold-in operator
    // of the offline-refit/online-serve split. Rank 2 so the oracle can
    // replay the SolveSpd Cholesky literally (l00 → l10 → l11 → forward →
    // back substitution, each CTE one kernel statement in the SAME
    // floating-point operation order). Item factors live on a 1/8 grid
    // (products 1/64, ratings integer counts), so every accumulated sum
    // is an exact dyadic rational identical in both engines regardless of
    // summation order, and the solve — the same IEEE expression over the
    // same exact inputs — matches bit-for-bit before rounding. λ = 0.5
    // with MLlib's explicit-feedback λ·n scaling (the convention
    // CollaborativeSpec pins against model.userFactors). The rank-4 form
    // is spec-gated: MLlib agreement + independent residual check.
    Q("ml2c_als_half_step",
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS i, CAST(count(*) AS DOUBLE) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_custkey <= 100 AND l_partkey <= 200
        |  GROUP BY 1, 2),
        |f AS (SELECT u, i, r, 1.0 AS y0,
        |    CAST(((i * 13 + 7) % 17) - 8 AS DOUBLE) / 8.0 AS y1 FROM inter),
        |s AS (SELECT u, CAST(count(*) AS DOUBLE) AS n,
        |    sum(y0 * y0) AS a00, sum(y0 * y1) AS a01, sum(y1 * y1) AS a11,
        |    sum(r * y0) AS b0, sum(r * y1) AS b1
        |  FROM f GROUP BY u),
        |c1 AS (SELECT *, sqrt(a00 + n * 0.5) AS l00 FROM s),
        |c2 AS (SELECT *, a01 / l00 AS l10 FROM c1),
        |c3 AS (SELECT *, sqrt((a11 + n * 0.5) - l10 * l10) AS l11 FROM c2),
        |c4 AS (SELECT *, b0 / l00 AS fy0 FROM c3),
        |c5 AS (SELECT *, (b1 - l10 * fy0) / l11 AS fy1 FROM c4),
        |c6 AS (SELECT *, fy1 / l11 AS x1 FROM c5),
        |c7 AS (SELECT *, (fy0 - l10 * x1) / l00 AS x0 FROM c6)
        |SELECT u AS user_id, round(x0, 6) AS f0, round(x1, 6) AS f1
        |FROM c7 ORDER BY user_id""".stripMargin) { (s, d) =>
      val inter = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .where(col("o_custkey") <= 100 && col("l_partkey") <= 200)
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(count(lit(1)).cast("double").as("rating"))
      val itemF = Tables.part(s, d).where(col("p_partkey") <= 200)
        .select(col("p_partkey").as("id"),
          array(lit(1.0),
            ((col("p_partkey") * 13 + 7) % 17 - 8).cast("double") / 8.0)
            .as("features"))
      graft.model.Collaborative.solveUserFactors(inter, itemF,
          rank = 2, regParam = 0.5)
        .select(col("id").as("user_id"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"))
        .orderBy("user_id")
    },

    // MMR diversification over ANN candidates: top-10 cosine neighbors per
    // query re-ranked for diversity (λ = 0.7), picking 5. The greedy is
    // per-query local over the bounded candidate list; scores are exact
    // doubles with a deterministic tie-break. The oracle UNROLLS the five
    // greedy steps as CTEs (the g1-pagerank playbook): pick_i = argmax of
    // 0.7·rel − (1.0−0.7)·max(cosine to picked_{i−1}), ties to the
    // smaller item — note (1.0 − 0.7) spelled as the SUBTRACTION in SQL
    // too, because 0.3 the literal is not 1.0−0.7 the double. Every
    // pick and every mmr score is value-checked, not just row-counted.
    Q("ml3_mmr_diversify", {
      def cos(x: String, y: String) =
        s"""list_dot_product(CAST($x.embedding AS DOUBLE[]), CAST($y.embedding AS DOUBLE[]))
           |      / (sqrt(list_dot_product(CAST($x.embedding AS DOUBLE[]), CAST($x.embedding AS DOUBLE[])))
           |         * sqrt(list_dot_product(CAST($y.embedding AS DOUBLE[]), CAST($y.embedding AS DOUBLE[]))))""".stripMargin
      val steps = (2 to 5).map { i =>
        s"""s$i AS (SELECT c.query_id, c.item, c.rel, max(s.cs) AS ms
           |  FROM cands c
           |  JOIN sims s ON s.query_id = c.query_id AND s.a = c.item
           |  JOIN picked${i - 1} p ON p.query_id = s.query_id AND p.item = s.b
           |  WHERE NOT EXISTS (SELECT 1 FROM picked${i - 1} x
           |                    WHERE x.query_id = c.query_id AND x.item = c.item)
           |  GROUP BY c.query_id, c.item, c.rel),
           |p$i AS (SELECT query_id, item, rel, mmr FROM (
           |  SELECT query_id, item, rel, 0.7 * rel - (1.0 - 0.7) * ms AS mmr,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY 0.7 * rel - (1.0 - 0.7) * ms DESC, item) AS rn
           |  FROM s$i) WHERE rn = 1),
           |picked$i AS (SELECT query_id, item FROM picked${i - 1}
           |             UNION ALL SELECT query_id, item FROM p$i)""".stripMargin
      }.mkString(",\n")
      val finals = (1 to 5).map(i =>
        s"SELECT query_id AS query, item, CAST($i AS BIGINT) AS rank, round(mmr, 6) AS mmr FROM p$i")
        .mkString("\nUNION ALL\n")
      s"""WITH cands AS (
         |  SELECT query_id, item, rel FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS item,
         |      ${cos("a", "b")} AS rel,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY round(${cos("a", "b")}, 6) DESC, b.vec_id) AS rnk
         |    FROM embeddings a, embeddings b
         |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id)
         |  WHERE rnk <= 10),
         |sims AS (
         |  SELECT c1.query_id, c1.item AS a, c2.item AS b, ${cos("ea", "eb")} AS cs
         |  FROM cands c1 JOIN cands c2 ON c1.query_id = c2.query_id AND c1.item != c2.item
         |  JOIN embeddings ea ON ea.vec_id = c1.item
         |  JOIN embeddings eb ON eb.vec_id = c2.item),
         |p1 AS (SELECT query_id, item, rel, 0.7 * rel - (1.0 - 0.7) * 0.0 AS mmr FROM (
         |  SELECT query_id, item, rel, row_number() OVER (PARTITION BY query_id
         |    ORDER BY 0.7 * rel - (1.0 - 0.7) * 0.0 DESC, item) AS rn FROM cands) WHERE rn = 1),
         |picked1 AS (SELECT query_id, item FROM p1),
         |$steps
         |$finals
         |ORDER BY query, rank""".stripMargin
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cands = graft.operators.Ann.bruteForceTopK(
          emb.where(col("vec_id") < 20), emb, "vec_id", "embedding", k = 10)
        .join(emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("vec")), "neighbor_id")
      graft.rank.Diversify.mmrPerQuery(cands, "query_id", "neighbor_id",
          "cosine", "vec", k = 5, lambda = 0.7)
        .select(col("query"), col("item"), col("rank").cast("long"),
          round(col("mmr"), 6).as("mmr"))
        .orderBy("query", "rank")
    },

    // Learned document classifier (the fastText-style "train a model on
    // cheap signals, score the corpus" step): logistic regression over
    // native-expression marker-ratio features. The synthetic corpus's
    // lang column is metadata over a uniform token soup (unlearnable), so
    // the demonstrated loop is DISTILLATION of a deterministic text rule
    // — the same plumbing a real weak-label fit uses. Output: confusion
    // matrix. Rows-only (iterative L-BFGS fit); featurization exactness,
    // separation, and decision stability in QualityClassifierSpec.
    Q.rowsOnly("ml4_quality_classifier") { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("label",
          when(element_at(
            graft.model.QualityClassifier.features(col("text")), 1) >= 0.08,
            1.0).otherwise(0.0))
      val model = graft.model.QualityClassifier.fit(docs, "text", "label")
      graft.model.QualityClassifier.score(model, docs, "text")
        .groupBy(col("label"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    },

    // ml4's value-checked complement: the SCORING projection with FIXED
    // coefficients (the fit is ml4's rows-only half; scoring is what runs
    // over 100 TB). Decision = margin ≥ 0 (≡ sigmoid ≥ 0.5), so no
    // transcendental leaves the plan and DuckDB replays the feature
    // extraction (token ratios + alpha ratio) and the ordered
    // coefficient fold in exact double arithmetic.
    Q("ml4b_classifier_margin",
      """WITH f AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks,
        |    CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','is','in','that'))) AS DOUBLE)
        |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS f1,
        |    CAST(len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','en','un'))) AS DOUBLE)
        |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS f2,
        |    CAST(len(list_filter(toks, t -> t IN ('le','la','de','et','les','des','un','une'))) AS DOUBLE)
        |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS f3,
        |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','von','mit','den'))) AS DOUBLE)
        |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS f4,
        |    alpha AS f5
        |  FROM f),
        |m AS (SELECT doc_id,
        |        -0.05 + f1 * 3.0 + f2 * -1.5 + f3 * -1.5 + f4 * -1.5 + f5 * 0.8 AS margin
        |      FROM r)
        |SELECT doc_id, round(margin, 6) AS margin,
        |  CAST(CASE WHEN margin >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      val wts = Seq(3.0, -1.5, -1.5, -1.5, 0.8)
      val f = graft.model.QualityClassifier.features(col("text"))
      val margin = wts.zipWithIndex.foldLeft(lit(-0.05)) {
        case (acc, (wi, i)) => acc + element_at(f, i + 1) * lit(wi)
      }
      Tables.documents(s, d).select(col("doc_id"),
          round(margin, 6).as("margin"),
          when(margin >= 0, 1L).otherwise(0L).as("pred"))
        .orderBy("doc_id")
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

    // mm1's VALUE-CHECKED sibling (r7 verdict item: mm1's embed used to
    // be a hash stub even though the repo owns real decoders). mediaEmbed
    // against synthesis ground truth, one row per (media, dimension):
    //  - ids 1-32: WAV square waves whose amplitude STEPS per 25-sample
    //    window — feature k is window k's RMS = amp_k/32768 exactly
    //    (identical |s| per window; power-of-two division, exact-square
    //    sqrt — the mm3 IEEE-exactness argument per window);
    //  - ids 33-64: 16×16 bottom-up BMPs with one grey level per IMAGE
    //    row — chunk k of the row-major decoded raster IS row k, so
    //    feature k = grey(k)/255 and a decoder that ignored BMP's
    //    bottom-up storage fails the gate;
    //  - ids 65-96: 16×16 greyscale-in-RGB PNGs, one level per row, same
    //    per-row formula (lossless DEFLATE ⇒ exact).
    // Both engines replay the float32 rounding (CAST AS REAL) before the
    // round-6 compare. The codec-less fallback lane is pinned separately
    // in MediaEmbedSpec (not SQL-replayable without the FNV remix chain).
    Q("mm1b_media_embed",
      """WITH wavf AS (
        |  SELECT CAST(i AS BIGINT) AS media_id, CAST(k AS BIGINT) AS k,
        |    round(CAST(CAST(((i * 13 + k * 7) % 64 + 1) * 327 / 32768.0
        |      AS REAL) AS DOUBLE), 6) AS feat
        |  FROM range(1, 33) t(i) CROSS JOIN range(16) kk(k)),
        |bmpf AS (
        |  SELECT CAST(i AS BIGINT) AS media_id, CAST(k AS BIGINT) AS k,
        |    round(CAST(CAST(((i * 7 + k * 19) % 256) / 255.0
        |      AS REAL) AS DOUBLE), 6) AS feat
        |  FROM range(33, 65) t(i) CROSS JOIN range(16) kk(k)),
        |pngf AS (
        |  SELECT CAST(i AS BIGINT) AS media_id, CAST(k AS BIGINT) AS k,
        |    round(CAST(CAST(((i * 11 + k * 23) % 256) / 255.0
        |      AS REAL) AS DOUBLE), 6) AS feat
        |  FROM range(65, 97) t(i) CROSS JOIN range(16) kk(k))
        |SELECT media_id, k, feat FROM wavf
        |UNION ALL SELECT media_id, k, feat FROM bmpf
        |UNION ALL SELECT media_id, k, feat FROM pngf
        |ORDER BY media_id, k""".stripMargin) { (s, d) =>
      import s.implicits._
      def wavSteps(amps: IndexedSeq[Short]): Array[Byte] = {
        val n = amps.length * 25
        val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
          .putInt(8000).putInt(16000).putShort(2).putShort(16)
        bb.put("data".getBytes).putInt(2 * n)
        (0 until n).foreach { j =>
          val a = amps(j / 25)
          bb.putShort(if (j % 2 == 0) a else (-a).toShort)
        }
        bb.array()
      }
      val wavs = (1 to 32).map { i =>
        (i.toLong, wavSteps(Array.tabulate[Short](16)(k =>
          (((i * 13 + k * 7) % 64 + 1) * 327).toShort)))
      }
      val bmps = (33 to 64).map { i =>
        (i.toLong, Ml.bmp24(16, 16)((_, y) => (i * 7 + y * 19) % 256))
      }
      val pngs = (65 to 96).map { i =>
        (i.toLong, Ml.pngRgb(16, 16) { (_, y) =>
          val g = ((i * 11 + y * 23) % 256).toLong; (g, g, g)
        })
      }
      (wavs ++ bmps ++ pngs).toDF("media_id", "content")
        .select(col("media_id"),
          posexplode(Multimodal.mediaEmbed(col("content"), 16)))
        .select(col("media_id"), col("pos").cast("long").as("k"),
          round(col("col").cast("double"), 6).as("feat"))
        .orderBy("media_id", "k")
    },

    // Multimodal frame sampling: one row per byte-range "frame" per media
    // item (the plan shape of video frame extraction). Value-checked: the
    // emitted columns are byte-range LENGTHS, so the oracle replays the
    // frame geometry arithmetically — frame_len = trunc(n/4) (Spark's
    // double-divide + int cast truncates; DuckDB's plain CAST rounds),
    // frame k spans min(1024, n − k·fl) bytes, empty frames filtered.
    Q("mm2_frame_sample",
      """WITH m AS (SELECT doc_id AS media_id,
        |             octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT media_id, n,
        |        greatest(CAST(trunc(n / 4) AS INTEGER), 1) AS fl FROM m),
        |fr AS (SELECT media_id, CAST(k AS BIGINT) AS frame_no,
        |         CAST(least(1024, n - k * fl) AS BIGINT) AS frame_bytes
        |       FROM f CROSS JOIN range(4) t(k)
        |       WHERE n - k * fl > 0)
        |SELECT media_id, frame_no, frame_bytes FROM fr
        |ORDER BY media_id, frame_no""".stripMargin) { (s, d) =>
      val packed = Multimodal.pack(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(packed, n = 4)
        .select(col("media_id"), col("frame_no").cast("long"),
          length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy("media_id", "frame_no")
    },

    // REAL audio decode (RIFF/PCM16, no codec library): deterministic
    // square-wave tones synthesized per doc id — amplitude i/100 ⇒
    // rms == peak == i/100 exactly, a decode correctness check the
    // rows-only gate can at least row-count and the spec verifies
    // bit-exactly. Input synthesis is driver-side by necessity (the
    // testdata ships no media files); decode itself is the native
    // executor-side WavFeatures expression.
    // VALUE-CHECKED against the synthesis ground truth: the inputs are
    // engine-built square waves with closed-form stats (amp = i·327 of
    // full scale ⇒ rms == peak == i·327/32768 EXACTLY — power-of-two
    // division, 15-bit squares, and an exact-square sqrt are all
    // IEEE-exact), so the oracle computes what a correct decoder MUST
    // emit from doc-id arithmetic alone; the corrupt row must be null.
    Q("mm3_wav_decode",
      """WITH ok AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |    8000 AS sample_rate, CAST(400 AS BIGINT) AS n_samples,
        |    round((i * 327) / 32768.0, 6) AS rms,
        |    round((i * 327) / 32768.0, 6) AS peak
        |  FROM range(1, 65) t(i))
        |SELECT * FROM ok
        |UNION ALL
        |SELECT 65, NULL, NULL, NULL, NULL
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      import s.implicits._
      def wav(amp: Short): Array[Byte] = {
        val samples = Array.tabulate[Short](400)(j =>
          if (j % 2 == 0) amp else (-amp).toShort)
        val bb = java.nio.ByteBuffer.allocate(44 + 800)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + 800).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
          .putInt(8000).putInt(16000).putShort(2).putShort(16)
        bb.put("data".getBytes).putInt(800)
        samples.foreach(bb.putShort)
        bb.array()
      }
      val tones = (1 to 64).map(i => (i.toLong, wav((i * 327).toShort))) :+
        (65L, "corrupt payload".getBytes)
      tones.toDF("media_id", "content")
        .select(col("media_id"), Multimodal.decodeWav(col("content")).as("w"))
        .select(col("media_id"), col("w.sample_rate").as("sample_rate"),
          col("w.n_samples").as("n_samples"),
          round(col("w.rms"), 6).as("rms"), round(col("w.peak"), 6).as("peak"))
        .orderBy("media_id")
    },

    // REAL image decode for PNG (zlib inflate + per-scanline filter
    // reconstruction, no codec library): deterministic 8x6 RGB images
    // synthesized per id with every filter type (row y encoded with
    // filter y % 5) so the decode exercises None/Sub/Up/Average/Paeth in
    // one pass. Pixel (x,y) of image i is ((i*7+x*13+y*29)%256, ...), so
    // the channel means are exactly recomputable — PngSpec pins them
    // bit-exactly; this gate row-counts and regression-tracks the values.
    // VALUE-CHECKED against the synthesis ground truth: pixel (x,y) of
    // image i is a pure mod-256 formula, so per-channel sums (integer,
    // order-free, exact in doubles) and the single /12240.0 normalization
    // are recomputable without touching a byte — a correct DEFLATE +
    // five-filter reconstruction MUST reproduce them; the non-PNG row
    // must be null.
    Q("mm4_png_decode",
      """WITH px AS (
        |  SELECT CAST(i.i AS BIGINT) AS media_id, x.x, y.y
        |  FROM range(1, 65) i(i) CROSS JOIN range(8) x(x) CROSS JOIN range(6) y(y)),
        |sums AS (SELECT media_id,
        |    sum((media_id * 7 + x * 13 + y * 29) % 256) AS sr,
        |    sum((media_id * 11 + x * 3 + y * 17) % 256) AS sg,
        |    sum((media_id * 5 + x * 23 + y * 7) % 256) AS sb
        |  FROM px GROUP BY media_id),
        |ok AS (SELECT media_id, CAST(8 AS BIGINT) AS width,
        |    CAST(6 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
        |    round(CAST(sr AS DOUBLE) / (8.0 * 6 * 255.0), 6) AS mean_r,
        |    round(CAST(sg AS DOUBLE) / (8.0 * 6 * 255.0), 6) AS mean_g,
        |    round(CAST(sb AS DOUBLE) / (8.0 * 6 * 255.0), 6) AS mean_b
        |  FROM sums)
        |SELECT * FROM ok
        |UNION ALL
        |SELECT 65, NULL, NULL, NULL, NULL, NULL, NULL
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val imgs = (1 to 64).map(i => (i.toLong, Ml.pngRgb(8, 6) { (x, y) =>
        ((i * 7 + x * 13 + y * 29) % 256,
         (i * 11 + x * 3 + y * 17) % 256,
         (i * 5 + x * 23 + y * 7) % 256)
      })) :+ (65L, "not a png".getBytes)
      imgs.toDF("media_id", "content")
        .select(col("media_id"), Multimodal.decodePng(col("content")).as("p"))
        .select(col("media_id"), col("p.width").cast("long").as("width"),
          col("p.height").cast("long").as("height"),
          col("p.channels").cast("long").as("channels"),
          round(col("p.mean_r"), 6).as("mean_r"),
          round(col("p.mean_g"), 6).as("mean_g"),
          round(col("p.mean_b"), 6).as("mean_b"))
        .orderBy("media_id")
    },

    // REAL JPEG decode via the JDK's built-in ImageIO codecs: 16x16
    // solid-color JPEGs synthesized per id (solid blocks survive lossy
    // 4:2:0 JPEG essentially intact), decoded by the ImageFeatures
    // expression — dims, container format, channel means. Deterministic
    // (same encoder, same input ⇒ same bytes); decode correctness is
    // pinned bit-exactly against lossless formats in ImageSpec.
    Q.rowsOnly("mm5_image_decode") { (s, d) =>
      import s.implicits._
      def jpeg(r: Int, g: Int, b: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        (0 until 16).foreach(y => (0 until 16).foreach(x =>
          img.setRGB(x, y, rgb)))
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", out)
        out.toByteArray
      }
      val imgs = (1 to 64).map(i =>
        (i.toLong, jpeg((i * 37) % 256, (i * 59) % 256, (i * 83) % 256))) :+
        (65L, "not an image".getBytes)
      imgs.toDF("media_id", "content")
        .select(col("media_id"), Multimodal.decodeImage(col("content")).as("p"))
        .select(col("media_id"), col("p.width").cast("long").as("width"),
          col("p.height").cast("long").as("height"), col("p.format"),
          round(col("p.mean_r"), 6).as("mean_r"),
          round(col("p.mean_g"), 6).as("mean_g"),
          round(col("p.mean_b"), 6).as("mean_b"))
        .orderBy("media_id")
    },

    // REAL animated-GIF frame sampling: 4-frame solid-color GIFs per id,
    // 2 evenly-spaced frames decoded + profiled — the actual video-frame-
    // extraction shape (mm2's byte-range form remains the stub for
    // codec-less formats). Palette-exact solid colors → deterministic
    // means; GifSpec (in ImageSpec.scala) pins per-frame values.
    // VALUE-CHECKED against the synthesis ground truth: solid-color
    // frames mean the decoded per-channel mean equals the palette color
    // exactly (64·c / 16320.0 and c / 255.0 round the same real number,
    // so the doubles are identical); n=2 of 4 frames samples indices
    // {0, 2}; the non-GIF row must surface as one null row
    // (explode_outer contract).
    Q("mm6_gif_frames",
      """WITH f AS (SELECT CAST(i AS BIGINT) AS media_id,
        |    CAST(fr AS BIGINT) AS frame_no
        |  FROM range(1, 33) t(i) CROSS JOIN (VALUES (0), (2)) v(fr)),
        |ok AS (SELECT media_id, frame_no, CAST(8 AS BIGINT) AS width,
        |    round(((media_id * 29 + frame_no * 61) % 256) / 255.0, 6) AS mean_r,
        |    round(((media_id * 47 + frame_no * 13) % 256) / 255.0, 6) AS mean_g,
        |    round(((media_id * 7 + frame_no * 31) % 256) / 255.0, 6) AS mean_b
        |  FROM f)
        |SELECT * FROM ok
        |UNION ALL
        |SELECT 33, NULL, NULL, NULL, NULL, NULL
        |ORDER BY media_id, frame_no""".stripMargin) { (s, d) =>
      import s.implicits._
      val gifs = (1 to 32).map { i =>
        val cols = (0 until 4).map(f => (((i * 29 + f * 61) % 256) << 16) |
          (((i * 47 + f * 13) % 256) << 8) | ((i * 7 + f * 31) % 256))
        (i.toLong, Ml.animatedGif(cols))
      } :+ (33L, "not a gif".getBytes)
      gifs.toDF("media_id", "content")
        .select(col("media_id"),
          explode_outer(Multimodal.sampleGifFrames(col("content"), 2)).as("f"))
        .select(col("media_id"), col("f.frame_no").cast("long").as("frame_no"),
          col("f.width").cast("long").as("width"),
          round(col("f.mean_r"), 6).as("mean_r"),
          round(col("f.mean_g"), 6).as("mean_g"),
          round(col("f.mean_b"), 6).as("mean_b"))
        .orderBy("media_id", "frame_no")
    },

    // REAL MPEG-audio analysis (frame-header walk, no codec): MPEG1
    // Layer III streams synthesized per id — CBR and VBR bitrate
    // patterns, mono/stereo modes, ID3v2 prefixes and ID3v1 trailers —
    // so the walk exercises syncsafe skip, padding arithmetic, VBR
    // detection and trailer stop in one gate. duration = n_frames *
    // 1152 / sample_rate exactly; Mp3Spec pins every value bit-exactly,
    // this gate row-counts and regression-tracks them.
    // VALUE-CHECKED against the synthesis ground truth: every output is a
    // pure function of the frame parameters the fixture encodes (ISO
    // 11172-3 table B.2 inlined as VALUES; duration = n·1152/rate; mean
    // bitrate = exact integer kbps sum over frames; VBR iff the index
    // sequence mixes) — a spec-correct header walk MUST reproduce them,
    // ID3v2 skip, padding slots, and TAG trailer included. Non-MPEG row
    // must be null.
    Q("mm7_mp3_headers",
      """WITH kb AS (SELECT * FROM (VALUES (1, 32), (2, 40), (3, 48), (4, 56),
        |    (5, 64), (6, 80), (7, 96), (8, 112), (9, 128), (10, 160),
        |    (11, 192), (12, 224), (13, 256), (14, 320)) t(idx, kbps)),
        |ids AS (SELECT CAST(i AS BIGINT) AS media_id,
        |    20 + i % 8 AS n, i % 3 AS sr_idx,
        |    CASE WHEN i % 2 = 0 THEN 1 ELSE 2 END AS n_channels,
        |    i % 5 = 0 AS is_vbr, 1 + i % 14 AS cbr_idx
        |  FROM range(1, 49) t(i)),
        |r AS (SELECT media_id, n, n_channels, is_vbr,
        |    CASE sr_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS rate,
        |    CASE WHEN is_vbr
        |         THEN CAST(((n + 1) // 2) * 128 + (n // 2) * 192 AS DOUBLE) / n
        |         ELSE CAST((SELECT kbps FROM kb WHERE idx = cbr_idx) AS DOUBLE)
        |    END AS bitrate
        |  FROM ids),
        |ok AS (SELECT media_id, 'MPEG1' AS version, CAST(3 AS BIGINT) AS layer,
        |    CAST(rate AS BIGINT) AS sample_rate,
        |    CAST(n_channels AS BIGINT) AS n_channels,
        |    CAST(n AS BIGINT) AS n_frames,
        |    round(n * 1152.0 / rate, 6) AS duration_s,
        |    round(bitrate, 3) AS bitrate_kbps,
        |    is_vbr AS vbr
        |  FROM r)
        |SELECT * FROM ok
        |UNION ALL
        |SELECT 49, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val streams = (1 to 48).map { i =>
        val n = 20 + i % 8
        val brs =                       // bitrate index per frame
          if (i % 5 == 0) Seq.tabulate(n)(f => if (f % 2 == 0) 9 else 11)
          else Seq.fill(n)(1 + i % 14)
        (i.toLong, Ml.mp3(brs, srIdx = i % 3, mono = i % 2 == 0,
          id3 = i % 3 == 0, trailer = i % 4 == 0))
      } :+ (49L, "not an mpeg stream".getBytes)
      streams.toDF("media_id", "content")
        .select(col("media_id"), Multimodal.decodeMp3(col("content")).as("m"))
        .select(col("media_id"), col("m.version").as("version"),
          col("m.layer").cast("long").as("layer"),
          col("m.sample_rate").cast("long").as("sample_rate"),
          col("m.n_channels").cast("long").as("n_channels"),
          col("m.n_frames").as("n_frames"),
          round(col("m.duration_s"), 6).as("duration_s"),
          round(col("m.bitrate_kbps"), 3).as("bitrate_kbps"),
          col("m.vbr").as("vbr"))
        .orderBy("media_id")
    },

    // ML5: equi-depth quantile binning (feature discretization, the
    // QuantileDiscretizer shape done relationally): per-stratum quartile
    // breakpoints (exact percentile — swap approx_percentile at 100 TB,
    // the t7/t7b pairing), broadcast back, bucket = 1 + Σ(x > bᵢ).
    // Breakpoints are rounded to 4 decimals in BOTH engines BEFORE the
    // compare so interpolation ulps can't flip a boundary row's bucket.
    Q("ml5_quantile_binning",
      """WITH b AS (SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.25), 4) AS q1,
        |    round(quantile_cont(l_extendedprice, 0.50), 4) AS q2,
        |    round(quantile_cont(l_extendedprice, 0.75), 4) AS q3
        |  FROM lineitem GROUP BY l_returnflag),
        |f AS (SELECT l.l_returnflag AS l_returnflag,
        |    CAST(1 + CAST(l_extendedprice > q1 AS INT)
        |           + CAST(l_extendedprice > q2 AS INT)
        |           + CAST(l_extendedprice > q3 AS INT) AS BIGINT) AS bucket,
        |    l_extendedprice
        |  FROM lineitem l JOIN b USING (l_returnflag))
        |SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM f GROUP BY l_returnflag, bucket
        |ORDER BY l_returnflag, bucket""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      val breaks = li.groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.25)"), 4).as("q1"),
          round(expr("percentile(l_extendedprice, 0.50)"), 4).as("q2"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("q3"))
      li.join(broadcast(breaks), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (lit(1) +
            (col("l_extendedprice") > col("q1")).cast("int") +
            (col("l_extendedprice") > col("q2")).cast("int") +
            (col("l_extendedprice") > col("q3")).cast("int"))
            .cast("long").as("bucket"),
          col("l_extendedprice"))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("lo"),
          round(max(col("l_extendedprice")), 2).as("hi"))
        .orderBy("l_returnflag", "bucket")
    },
  )

  /** Minimal MPEG1-Layer-III stream synthesizer for the mm7 fixture:
    * valid 4-byte frame headers + zeroed payloads (a header walk reads
    * nothing else), optional ID3v2 prefix (syncsafe size) and ID3v1
    * "TAG" trailer. `brIdxs` gives the bitrate index per frame (same
    * index every frame = CBR, mixed = VBR). Driver-side by necessity —
    * the testdata ships no media files (same pattern as mm3's WAV
    * synthesis). */
  private[queries] def mp3(brIdxs: Seq[Int], srIdx: Int, mono: Boolean,
                           id3: Boolean, trailer: Boolean): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val rate = Array(44100, 48000, 32000)(srIdx)
    val out = new java.io.ByteArrayOutputStream()
    if (id3) { // 10-byte header + 100-byte body, syncsafe length
      out.write("ID3".getBytes); out.write(4); out.write(0); out.write(0)
      out.write(0); out.write(0); out.write(0); out.write(100)
      out.write(new Array[Byte](100))
    }
    brIdxs.zipWithIndex.foreach { case (br, f) =>
      val padding = f % 3 == 2 // exercise the +1-byte slot arithmetic
      val len = 144 * (kbps(br) * 1000) / rate + (if (padding) 1 else 0)
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // sync|MPEG1|layer III|no CRC
      frame(2) = ((br << 4) | (srIdx << 2) |
        (if (padding) 2 else 0)).toByte
      frame(3) = (if (mono) 0xc0 else 0x00).toByte
      out.write(frame)
    }
    if (trailer) { out.write("TAG".getBytes); out.write(new Array[Byte](125)) }
    out.toByteArray
  }

  /** Minimal 24-bit bottom-up BMP encoder for the mm1b fixture:
    * `grey(x, y)` gives the pixel value (all three channels) in IMAGE
    * coordinates (top-down); rows are stored bottom-up per the BMP spec,
    * so a decoder that ignores row order produces a vertically-flipped
    * raster — which mm1b's per-row feature formula catches. */
  private[graft] def bmp24(w: Int, h: Int)(grey: (Int, Int) => Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var sy = 0
    while (sy < h) {
      val y = h - 1 - sy           // stored bottom-up
      var x = 0
      while (x < w) {
        val g = (grey(x, y) & 0xff).toByte
        bb.put(g).put(g).put(g)    // BGR
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      sy += 1
    }
    bb.array()
  }

  /** Minimal animated-GIF encoder for the mm6 fixture: solid-color
    * frames through the JDK's sequence writer. */
  private[queries] def animatedGif(colors: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, rgb)))
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Minimal deterministic PNG encoder for the mm4 fixture: 8-bit RGB,
    * row y stored with filter type y % 5 (forward-filtered per the spec),
    * zlib via `Deflater`, CRCs via `java.util.zip.CRC32`. Driver-side by
    * necessity — the testdata ships no media files (same pattern as mm3's
    * WAV synthesis). */
  private[queries] def pngRgb(w: Int, h: Int)(
      px: (Int, Int) => (Long, Long, Long)): Array[Byte] = {
    val raw = Array.tabulate(h) { y =>
      val row = new Array[Byte](w * 3)
      (0 until w).foreach { x =>
        val (r, g, b) = px(x, y)
        row(x * 3) = r.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = b.toByte
      }
      row
    }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val filtered = new java.io.ByteArrayOutputStream()
    (0 until h).foreach { y =>
      val ft = y % 5
      filtered.write(ft)
      (0 until w * 3).foreach { i =>
        val cur = raw(y)(i) & 0xff
        val left = if (i >= 3) raw(y)(i - 3) & 0xff else 0
        val up = if (y > 0) raw(y - 1)(i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) raw(y - 1)(i - 3) & 0xff else 0
        val out = ft match {
          case 0 => cur
          case 1 => (cur - left) & 0xff
          case 2 => (cur - up) & 0xff
          case 3 => (cur - ((left + up) >> 1)) & 0xff
          case 4 => (cur - paeth(left, up, ul)) & 0xff
        }
        filtered.write(out)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
