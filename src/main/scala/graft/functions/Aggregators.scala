package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — SURVEY §2.9 bucket 4, the Dataset-native custom
  * aggregation surface (the other three buckets — built-ins, Spark ML,
  * custom Expressions — are covered across the query inventory).
  *
  * [[TopKByScore]] is the one with a real scale story: per-key top-k as a
  * SINGLE-PASS object aggregation whose buffer is k-BOUNDED. Where the
  * window form (`row_number over (partition by … order by …)`) shuffles
  * every row of every key (WindowGroupLimit trims map-side only since
  * Spark 3.5 — this Aggregator expresses the same bound for
  * `KeyValueGroupedDataset` users), the typed form's partial aggregation
  * carries at most k items per key per map task into the shuffle, so
  * shuffle volume is O(keys · k) regardless of fan-in. Determinism: the
  * ordering (score desc, id asc) is total because ids are unique, so
  * merge order cannot change the result — the property that lets the
  * a28 gate hash-match a window-form SQL oracle exactly.
  */
object Aggregators {

  /** One scored item; `id` must be unique within a key for a total order. */
  final case class Scored(id: Long, score: Double)

  /** Keep the k highest-scoring items (ties to the smaller id), as a
    * typed single-pass aggregation with k-bounded partial buffers. */
  final class TopKByScore(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k >= 1, s"k must be >= 1 (got $k)")

    private def trim(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)

    override def zero: Seq[Scored] = Nil
    // reduce keeps the buffer bounded at every step — the partial
    // (map-side) aggregation never holds more than k items per key
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      trim(a +: b)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      trim(b1 ++ b2)
    override def finish(r: Seq[Scored]): Seq[Scored] = trim(r)

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
