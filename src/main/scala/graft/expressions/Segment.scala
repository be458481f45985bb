package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F9: CJK word segmentation (SURVEY §2.7 F9) — the reference declares a
  * jieba-based segmenter in every script but never calls it from main()
  * (simility_books.py:11-15, guessLike_u_like.py:20-24); it is a dormant
  * capability the engine exposes properly.
  *
  * Implementation: dictionary-based forward-maximum-matching (FMM) over a
  * caller-supplied word list (longest match wins, single CJK char
  * fallback), written from the published algorithm — no external segmenter
  * library. Non-CJK runs (latin/digits) are emitted as whole tokens split
  * on transitions. The reference's P8 filters (len >= 2, not all digits)
  * are available separately via `TextFunctions.filterTokens`.
  *
  * `cutAll = true` switches to FULL mode — the reference's dormant jieba
  * call is `cut_all=True` (simility_books.py:12, guessLike_u_like.py:21),
  * which emits ALL overlapping dictionary words: at every CJK position,
  * every dictionary word starting there (ascending length) is emitted,
  * and a position emits its single character only when no multi-char word
  * starts there AND no previously emitted word covers it (jieba
  * `__cut_all` parity). Full mode is the recall-oriented indexing form
  * (every word a query might use appears); FMM remains the default
  * analysis form (one segmentation per span).
  *
  * Two dictionary carriers share the kernel:
  *   - [[Segment]] embeds the word list in the expression — right for
  *     small lexicons and the SQL-registered form;
  *   - [[SegmentDict]] holds a `Broadcast` handle, so a corpus-scale
  *     lexicon (jieba's full dictionary is ~350k entries) ships to each
  *     executor ONCE via the torrent broadcast path instead of riding
  *     inside every serialized task — the form a real CJK corpus needs.
  */
abstract class SegmentBase extends UnaryExpression with CodegenFallback {

  /** Dictionary view used by eval; concrete classes make this lazy so it
    * is (re)built at most once per deserialized instance per executor. */
  protected def words: Set[String]
  protected def maxWordLen: Int
  /** false = FMM (one segmentation); true = jieba-full-mode overlap. */
  protected def cutAll: Boolean

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // code-point based so supplementary-plane ideographs (CJK Ext-B+,
  // surrogate pairs) are classified and matched correctly
  private def isCjk(cp: Int): Boolean =
    Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val cw = Character.charCount(cp)
      if (Character.isWhitespace(cp)) {
        i += cw
      } else if (isCjk(cp)) {
        if (!cutAll) {
          // FMM: longest dictionary word starting at i, else the single
          // code point (`matched` counts chars, so a surrogate pair
          // advances by 2)
          var l = math.min(maxWordLen, n - i)
          var matched = cw
          var found = false
          while (l >= 2 && !found) {
            if (words.contains(s.substring(i, i + l))) { matched = l; found = true }
            l -= 1
          }
          out += UTF8String.fromString(s.substring(i, i + matched))
          i += matched
        } else {
          // FULL mode over the maximal CJK run (jieba __cut_all parity):
          // every dictionary word starting at each position, ascending
          // length; a bare character only when nothing multi-char starts
          // there and no emitted word covers it (`oldJ` = furthest
          // emitted end, exclusive)
          var end = i
          while (end < n && isCjk(s.codePointAt(end)))
            end += Character.charCount(s.codePointAt(end))
          var k = i
          var oldJ = i
          while (k < end) {
            val kcw = Character.charCount(s.codePointAt(k))
            var emitted = false
            var l = 2
            val maxL = math.min(maxWordLen, end - k)
            while (l <= maxL) {
              if (words.contains(s.substring(k, k + l))) {
                out += UTF8String.fromString(s.substring(k, k + l))
                emitted = true
                if (k + l > oldJ) oldJ = k + l
              }
              l += 1
            }
            if (!emitted && k >= oldJ) {
              out += UTF8String.fromString(s.substring(k, k + kcw))
              oldJ = k + kcw
            }
            k += kcw
          }
          i = end
        }
      } else {
        // non-CJK run: consume until whitespace or CJK
        val start = i
        var done = false
        while (i < n && !done) {
          val c = s.codePointAt(i)
          if (Character.isWhitespace(c) || isCjk(c)) done = true
          else i += Character.charCount(c)
        }
        out += UTF8String.fromString(s.substring(start, i))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Plan-embedded dictionary (small lexicons, SQL registration). */
case class Segment(child: Expression, dict: Seq[String],
                   cutAll: Boolean = false) extends SegmentBase {
  @transient protected lazy val words: Set[String] = dict.toSet
  @transient protected lazy val maxWordLen: Int =
    if (dict.isEmpty) 1 else dict.map(_.length).max

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Broadcast dictionary: the expression serializes only the broadcast
  * handle; each executor materializes the word set once from the broadcast
  * blocks (fetched once per JVM), so task size is independent of lexicon
  * size. */
case class SegmentDict(child: Expression, dictBc: Broadcast[Array[String]],
                       cutAll: Boolean = false)
    extends SegmentBase {
  @transient protected lazy val words: Set[String] = dictBc.value.toSet
  @transient protected lazy val maxWordLen: Int = {
    val d = dictBc.value
    if (d.isEmpty) 1 else d.iterator.map(_.length).max
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
