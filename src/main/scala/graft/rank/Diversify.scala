package graft.rank

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) re-ranking: greedily pick items that
  * are relevant to the query but dissimilar to what is already picked —
  * the diversity control the reference's recommender lacks (its similar-
  * book lists are pure relevance order plus a random hot backfill,
  * simility_books.py:90-94; near-duplicate titles then cluster at the top,
  * which is exactly what its title-dedup step works around and what MMR
  * solves in general).
  *
  * Scale shape: MMR is inherently sequential PER QUERY, so it runs as a
  * per-key local greedy over each query's BOUNDED candidate list (the
  * top-N an ANN/similarity stage already produced) via `mapGroups` — state
  * is O(maxCandidates · dim) per key, queries parallelize across the
  * cluster, and nothing global is ever materialized. The bound is enforced,
  * not assumed: a group larger than `maxCandidates` fails fast rather than
  * silently buffering an unbounded candidate set.
  */
object Diversify {

  // public: Dataset encoder codegen instantiates these from generated code
  final case class Cand(q: Long, item: Long, rel: Double, vec: Array[Float])
  final case class Picked(q: Long, item: Long, rank: Int, mmr: Double)

  /** Select up to `k` items per query from `candidates` — columns
    * (`queryCol`: long, `itemCol`: long, `relCol`: double, `vecCol`:
    * array<float>) — maximizing
    * `lambda * rel − (1 − lambda) * max(cosine to already-picked)`.
    * Ties break by (score desc, item asc); the first pick is the most
    * relevant item. Returns (query, item, rank, mmr) with rank 1-based in
    * pick order. */
  def mmrPerQuery(candidates: DataFrame, queryCol: String, itemCol: String,
                  relCol: String, vecCol: String, k: Int, lambda: Double,
                  maxCandidates: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1] (got $lambda)")
    implicit val ce: Encoder[Cand] = Encoders.product[Cand]
    implicit val pe: Encoder[Picked] = Encoders.product[Picked]
    implicit val le: Encoder[Long] = Encoders.scalaLong
    candidates
      .select(col(queryCol).cast("long").as("q"),
        col(itemCol).cast("long").as("item"),
        col(relCol).cast("double").as("rel"), col(vecCol).as("vec"))
      .as[Cand]
      .groupByKey(_.q)
      .flatMapGroups { (q: Long, it: Iterator[Cand]) =>
        val cands = it.take(maxCandidates + 1).toArray
        require(cands.length <= maxCandidates,
          s"query $q has more than $maxCandidates candidates — cap the " +
            "candidate stage (top-N) before diversifying")
        val picked = scala.collection.mutable.ArrayBuffer.empty[Cand]
        val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
        val out = scala.collection.mutable.ArrayBuffer.empty[Picked]
        while (picked.length < k && remaining.nonEmpty) {
          var bestIdx = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < remaining.length) {
            val c = remaining(i)
            val maxSim =
              if (picked.isEmpty) 0.0
              else picked.map(p => cosine(c.vec, p.vec)).max
            val score = lambda * c.rel - (1.0 - lambda) * maxSim
            if (score > bestScore ||
              (score == bestScore && bestIdx >= 0 &&
                c.item < remaining(bestIdx).item)) {
              bestScore = score
              bestIdx = i
            }
            i += 1
          }
          val chosen = remaining.remove(bestIdx)
          picked += chosen
          out += Picked(q, chosen.item, picked.length, bestScore)
        }
        out.iterator
      }
      .toDF("query", "item", "rank", "mmr")
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
