package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLICATION: tokenize text with a LEARNED merge
  * table (the `merges.txt` of a GPT-2-family tokenizer: ordered pairs,
  * earlier = higher priority). This is the real subword segmentation the
  * `subwordCount` heuristic approximates — the merge loop per word is the
  * classic greedy: repeatedly merge the adjacent pair with the lowest
  * merge rank until none remains.
  *
  * Spark-first placement: the merge table rides the EXPRESSION (embedded
  * in the plan like [[Segment]]'s dictionary — serialized once per task,
  * not per row), the per-word loop is primitive Scala over index arrays
  * (CodegenFallback, same policy as the sketch kernels), and words are
  * whitespace-split then BPE'd independently, so the expression
  * parallelizes like any other projection. Output is the token strings —
  * counting/ids compose downstream.
  *
  * Determinism: rank ties cannot exist (ranks are distinct by
  * construction); the leftmost lowest-rank pair merges first, matching the
  * reference BPE algorithm.
  */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // earlier-wins on duplicate pairs: toMap keeps the LAST value per key,
  // which would invert the documented "earlier = higher priority" order if
  // a merge table repeats a pair — reverse before toMap so the first
  // occurrence's (lower) rank survives.
  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.reverse.toMap

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && text.charAt(start).isWhitespace) start += 1
      var end = start
      while (end < n && !text.charAt(end).isWhitespace) end += 1
      if (end > start) {
        bpeWord(text.substring(start, end)).foreach { t =>
          out += UTF8String.fromString(t)
        }
      }
      start = end
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Greedy merge loop over one word: O(len^2) worst case on the word
    * length — words are short, the merge table lookup is O(1). */
  private def bpeWord(word: String): Seq[String] = {
    var parts = word.map(_.toString).toBuffer
    var done = parts.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        rank.get((parts(i), parts(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = i
          case _ =>
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
        parts.remove(bestIdx + 1)
        if (parts.length < 2) done = true
      }
    }
    parts.toSeq
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
