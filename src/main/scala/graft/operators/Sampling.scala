package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting/sampling for training pipelines.
  *
  * `sample(fraction)` is row-count random and changes membership on every
  * partitioning change; training splits need the OPPOSITE: membership
  * that is a pure function of the document id (stable across runs,
  * clusters, and re-partitions, and join-free to reproduce anywhere).
  * Standard technique: bucket the id hash into [0, 100) and assign
  * buckets to splits by cumulative fraction.
  */
object Sampling {

  /** Adds a `split` column: id-hash bucket assigned by cumulative
    * fractions (e.g. Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).
    * Fractions must sum to ~1; every row lands in exactly one split. */
  def hashSplit(df: DataFrame, idCol: String, seed: Long,
                fractions: Seq[(String, Double)]): DataFrame =
    hashSplitBy(df, pmod(xxhash64(col(idCol), lit(seed)), lit(10000L)),
      fractions)

  /** [[hashSplit]] with a caller-supplied bucket column in [0, 10000) —
    * lets the hash be swapped (e.g. the DuckDB-recomputable FNV-1a-64 of
    * the `s11b` gate) without touching the assignment rule. */
  def hashSplitBy(df: DataFrame, bucket: org.apache.spark.sql.Column,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1 (got $fractions)")
    // cumulative upper bounds in buckets-of-1/10000 (rounding to the last
    // split keeps the cover exhaustive)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.round(c * 10000).toInt)
    val expr = fractions.map(_._1).zip(bounds).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, (name, hi)) =>
        when(bucket < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Deterministic per-stratum downsampling: a row survives iff its
    * id-hash bucket falls under its stratum's keep-fraction. Same
    * membership properties as [[hashSplit]] — a pure function of
    * (id, seed), stable across runs, clusters and repartitions — and a
    * pure projection+filter over the scan: no shuffle, no sampling state.
    * Strata absent from `fractions` keep `defaultFraction` of their rows. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       seed: Long, fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame =
    stratifiedSampleBy(df, pmod(xxhash64(col(idCol), lit(seed)), lit(10000L)),
      stratumCol, fractions, defaultFraction)

  /** [[stratifiedSample]] with a caller-supplied bucket column in
    * [0, 10000) — lets the hash be swapped (e.g. the DuckDB-recomputable
    * FNV-1a-64 of the `s13b` gate) without touching the keep rule. */
  def stratifiedSampleBy(df: DataFrame, bucket: org.apache.spark.sql.Column,
                         stratumCol: String, fractions: Map[String, Double],
                         defaultFraction: Double = 1.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0, 1] (got $fractions, default $defaultFraction)")
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.where(bucket < frac * lit(10000.0))
  }

  /** Token-budget cut: per stratum, take rows in `orderCol` order until the
    * cumulative `tokensCol` reaches that stratum's budget (the row that
    * crosses the boundary is included, so every non-empty budget yields at
    * least one row). Real training mixes are specified in TOKENS, not doc
    * counts — this is the "fill each source's token quota" step.
    *
    * One window shuffle keyed on the stratum; with `orderCol =
    * xxhash64(id)` the prefix is a uniform sample, with a curation score it
    * is best-first. Per-stratum ordering serializes WITHIN a stratum (a
    * prefix cut is inherently sequential in the order) but strata fill in
    * parallel — at 100 TB budgets are per-source, so the window's partition
    * count is the source count; shard hot sources upstream if one source
    * alone exceeds executor-sort scale. Strata without a budget are
    * dropped. */
  def tokenBudget(df: DataFrame, stratumCol: String, orderCol: String,
                  tokensCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      s"budgets must be positive (got $budgets)")
    val budget = budgets.foldLeft(lit(null).cast("long")) { case (acc, (k, b)) =>
      when(col(stratumCol) === k, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__budget", budget)
      .where(col("__budget").isNotNull)
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      // keep while the PREVIOUS cumulative total was under budget: the
      // boundary-crossing row is in, everything after is out
      .where(col("__cum") - col(tokensCol) < col("__budget"))
      .drop("__budget", "__cum")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    * Spirakis A-Res): each row gets key = u^(1/w) with u ∈ (0,1) derived
    * from the id hash, and the k largest keys are the sample — inclusion
    * probability rises with `weightCol` (quality-weighted data mixing:
    * sample the corpus toward high-scoring documents without ever sorting
    * by score outright, which would take only the top slice).
    *
    * Same determinism contract as every sampler here: u is a pure function
    * of (id, seed), so membership is reproducible anywhere. Plan shape is
    * a projection + global top-k — `TakeOrderedAndProject` (per-partition
    * heaps, single reduce of k rows), no global sort, no sampling state.
    * Zero/negative weights never survive while any positive-weight row
    * remains (their key is 0). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     seed: Long, k: Int): DataFrame = {
    // u in (0, 1) STRICTLY open: (bucket + 0.5) / 2^52 over a 52-bit hash
    // slice. 52 bits ≈ double mantissa resolution, so weight-independent
    // key collisions (which would tie-break toward ascending id and bias
    // the sample tail toward low ids in large corpora) are negligible;
    // the half-step offset keeps u < 1 so the key never saturates at 1.0
    // regardless of weight, and u > 0 so ln(u) is finite.
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 52)) + 0.5) /
      lit((1L << 52).toDouble)
    weightedSampleBy(df, u, idCol, weightCol, k)
  }

  /** [[weightedSample]] with a caller-supplied u ∈ (0, 1) — lets the hash
    * be swapped (e.g. the DuckDB-replayable FNV-1a-64 of the `s14b` gate)
    * without touching the A-Res selection rule. */
  def weightedSampleBy(df: DataFrame, u: org.apache.spark.sql.Column,
                       idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val key = when(col(weightCol) > 0.0,
      exp(log(u) / col(weightCol))).otherwise(lit(0.0))
    df.withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }

  /** Domain mixing: downsample strata so the output approaches the target
    * composition (e.g. 60% web / 30% books / 10% code) at the LARGEST
    * feasible size — the binding stratum (the one whose availability runs
    * out first at the target ratio) is kept whole and every other stratum
    * is hash-downsampled pro rata. One count() action over the strata
    * (#domains rows to the driver — bounded), then a pure filter; strata
    * not named in `targets` are dropped. Bucket granularity is 1/10000, so
    * achieved proportions track targets to ~0.01% of each stratum. */
  def domainMix(df: DataFrame, stratumCol: String, idCol: String, seed: Long,
                targets: Map[String, Double]): DataFrame =
    domainMixBy(df, pmod(xxhash64(col(idCol), lit(seed)), lit(10000L)),
      stratumCol, targets)

  /** [[domainMix]] with a caller-supplied bucket column in [0, 10000) —
    * lets the hash be swapped (e.g. the DuckDB-recomputable FNV-1a-64 of
    * the `s13b` gate) without touching the mixing rule. */
  def domainMixBy(df: DataFrame, bucket: org.apache.spark.sql.Column,
                  stratumCol: String,
                  targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"targets must be positive (got $targets)")
    val z = targets.values.sum
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    targets.keys.foreach(k => require(counts.contains(k),
      s"target stratum '$k' absent from the data (have ${counts.keys.toSeq.sorted})"))
    // largest total T with composition `targets`: the binding stratum s*
    // has n_{s*} = T * t_{s*}, every other stratum keeps T * t_s <= n_s
    val total = targets.map { case (k, t) => counts(k) * z / t }.min
    val fracs = targets.map { case (k, t) =>
      k -> math.min(1.0, total * (t / z) / counts(k))
    }
    stratifiedSampleBy(df, bucket, stratumCol, fracs, defaultFraction = 0.0)
  }

  /** Temperature-scaled source rebalancing (the multilingual/multi-source
    * mixing rule of T5/mT5-style training mixes): downsample so the output
    * composition is proportional to n_s^alpha instead of n_s — alpha = 1
    * keeps the natural mix, alpha = 0 equalizes all sources. The largest
    * output with that composition keeps fraction
    *
    *   f_s = (n_min / n_s)^(1 - alpha)
    *
    * of stratum s (the normalizer cancels: the binding stratum is always
    * the smallest, which is kept whole). Fully in-plan — one stratum-count
    * aggregate, a broadcast global min, a broadcast fraction join, then
    * the same pure hash filter as [[stratifiedSample]]: no driver action,
    * no shuffle of the data rows, scan-speed at any corpus size. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        seed: Long, alpha: Double): DataFrame =
    temperatureSampleBy(df,
      pmod(xxhash64(col(idCol), lit(seed)), lit(10000L)), stratumCol, alpha)

  /** [[temperatureSample]] with a caller-supplied bucket column in
    * [0, 10000) — lets the hash be swapped (e.g. the DuckDB-recomputable
    * FNV-1a-64 of the `s18` gate) without touching the keep rule. */
  def temperatureSampleBy(df: DataFrame, bucket: org.apache.spark.sql.Column,
                          stratumCol: String, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1] (got $alpha)")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val fracs = counts.crossJoin(broadcast(nmin))
      .select(col(stratumCol),
        pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1.0 - alpha)).as("__f"))
    df.join(broadcast(fracs), Seq(stratumCol))
      .where(bucket < col("__f") * lit(10000.0))
      .drop("__f")
  }

  /** Exact-count stratified sample: exactly min(k, |stratum|) rows per
    * stratum, membership a pure function of (id, seed) — the "n examples
    * per class" cut (balanced eval sets, per-domain probes) that the
    * fraction form can't give when stratum sizes are unknown or skewed.
    *
    * Plan shape: one window keyed on the strata — `row_number` under a
    * `<= k` filter plans WindowGroupLimit (Spark >= 3.5): a bounded
    * per-key heap on the map side, then <= k rows per stratum through the
    * shuffle. Never a global sort; per-stratum cost O(n log k). */
  def stratifiedFixedK(df: DataFrame, strataCols: Seq[String], idCol: String,
                       seed: Long, k: Int): DataFrame =
    stratifiedFixedKBy(df,
      pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 52)),
      strataCols, idCol, k)

  /** [[stratifiedFixedK]] with a caller-supplied rank key — lets the hash
    * be swapped (e.g. the DuckDB-recomputable FNV-1a-64 of the `s20`
    * gate) without touching the selection rule. Ties on the key break by
    * ascending id, so membership is total-ordered and deterministic. */
  def stratifiedFixedKBy(df: DataFrame, rankKey: org.apache.spark.sql.Column,
                         strataCols: Seq[String], idCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    TopK.topKPerKey(df, strataCols, Seq(rankKey.asc, col(idCol).asc), k)
      .drop("rank")
  }

  /** Fractional-EPOCH upsampling — the mixture-weights step of a
    * pretraining recipe ("2.5 epochs of wiki, 0.25 of web"): each row of
    * stratum s is emitted floor(w_s) times plus one more for the
    * deterministic hash-selected (w_s - floor(w_s)) fraction of ids —
    * so the expected multiplicity is w_s quantized to the 1/10000 bucket
    * grid (the fractional threshold is rounded half-up to the nearest
    * bucket, so a non-representable weight like 1.1 admits exactly 1000
    * buckets, never 1001), membership of the fractional copy is a pure
    * (id, seed) function (stable across runs and partitionings), and
    * w < 1 degrades to plain downsampling.
    * Strata absent from `weights` pass through at 1.0; weight 0 drops.
    *
    * Pure projection + generator explode — ZERO shuffle; output fan-out
    * is Σ w_s·|s| rows, each carrying a 0-based `copy` index (distinct
    * training-order keys per replica — feed [[shuffleShard]] next so
    * copies of one document land in different shards). */
  def epochUpsample(df: DataFrame, stratumCol: String, idCol: String,
                    weights: Map[String, Double], seed: Long): DataFrame =
    epochUpsampleBy(df, pmod(xxhash64(col(idCol), lit(seed)), lit(10000L)),
      stratumCol, weights)

  /** [[epochUpsample]] with a caller-supplied bucket column in
    * [0, 10000) — the s24 FNV-replay hook (s18's pattern). */
  def epochUpsampleBy(df: DataFrame, bucket: org.apache.spark.sql.Column,
                      stratumCol: String,
                      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 100.0),
      "epoch weights must be in [0, 100]")
    val w = weights.foldLeft(lit(1.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    // threshold rounded half-up to the nearest bucket: the raw double
    // product admits a stray 1e-13 tail on non-representable weights
    // (1.1 → 1000.0000000000009, one extra bucket); rounding pins the
    // fractional copy to EXACTLY round(frac·10000) buckets, so the
    // multiplicity is w_s correct to the 1/10000 bucket grid (ADVICE r6)
    val thresh = floor((w - floor(w)) * 10000.0 + 0.5)
    val n = (floor(w) +
      when(bucket < thresh, 1L).otherwise(0L)).cast("long")
    df.withColumn("__n", n)
      .withColumn("copy",
        explode(when(col("__n") >= 1L, sequence(lit(0L), col("__n") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__n")
  }

  /** Deterministic global shuffle + sharding — the "shuffle the corpus
    * before training" step every pretraining run needs: an order that is
    * (a) decorrelated from ingest order (a corpus written source-by-source
    * must not train source-by-source), (b) reproducible from the ids
    * alone (re-running the job, or re-materializing one lost shard,
    * yields byte-identical shard files), and (c) balanced across
    * `nShards` output shards. shard = hash(id, "shard") mod nShards;
    * within-shard position ranks by an INDEPENDENT hash(id, "order") —
    * two different salts, so shard routing and intra-shard order share no
    * structure.
    *
    * Plan shape: exactly ONE shuffle — the window partition on the shard
    * id (row_number per shard; nShards should be >= the cluster's write
    * parallelism). No global sort, no driver involvement; `sortBy`-free
    * writes can partition the output directly on `shard`. Ties cannot
    * occur (id is unique per caller contract; the hash tie breaks by id
    * anyway). Output: input columns + (shard, pos). */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    shuffleShardBy(df,
      xxhash64(col(idCol), lit("shard")), xxhash64(col(idCol), lit("order")),
      idCol, nShards)

  /** [[shuffleShard]] with caller-supplied hash columns — lets the hashes
    * be swapped (e.g. the DuckDB-recomputable FNV-1a-64 of the `s22`
    * gate) without touching the routing/order rule. */
  def shuffleShardBy(df: DataFrame, shardHash: org.apache.spark.sql.Column,
                     orderHash: org.apache.spark.sql.Column,
                     idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val w = Window.partitionBy("shard").orderBy(col("__oh"), col(idCol))
    df.withColumn("shard", pmod(shardHash, lit(nShards.toLong)))
      .withColumn("__oh", orderHash)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__oh")
  }
}
