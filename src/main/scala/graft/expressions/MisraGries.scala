package graft.expressions

import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate — the
  * mergeable frequent-items summary (Misra/Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12). `k` counters give the
  * deterministic guarantee: every item with true frequency f has an
  * estimate in [f - n/(k+1), f], so any item with f > n/(k+1) is
  * guaranteed present. This is the bounded-memory corpus-vocabulary audit
  * at 100 TB: k counters per partition, partial aggregation on the map
  * side, one short merged summary per group — where an exact top-N
  * (t9's explode → shuffle-by-term) shuffles |distinct terms| rows.
  *
  * When k exceeds the number of distinct items, NO eviction ever fires
  * and the sketch IS exact term counting — that mode hash-matches a plain
  * COUNT oracle (the t16 gate); eviction-mode semantics are pinned
  * deterministically in MisraGriesSpec on single-partition streams.
  *
  * Estimates (and at the margin, membership) of NON-guaranteed items
  * depend on merge order, which Spark does not fix across runs — callers
  * must threshold on the guarantee (est > n/(k+1)), not enumerate tails.
  *
  * Returns array<struct<item string, est long>> sorted (est desc, item). */
case class MisraGriesTopK(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20),
    s"k must be in [1, 2^20] (got $k): the sketch IS the memory bound")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1
        case None =>
          if (buf.size < k) buf(item) = 1L
          else {
            // classic MG eviction: decrement every counter, drop zeros —
            // equivalent to ignoring one occurrence of each of k+1
            // distinct items (the source of the n/(k+1) bound)
            val dead = mutable.ArrayBuffer.empty[String]
            buf.mapValuesInPlace((_, c) => c - 1)
            buf.foreach { case (i, c) => if (c <= 0) dead += i }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) => buf(i) = buf.getOrElse(i, 0L) + c }
    if (buf.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // count from everything, keep positives — at most k survive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - sub)
      buf.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MisraGriesTopK =
    copy(child = c)
}
