package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → visible text in ONE pass — the extraction step of a web-corpus
  * pipeline (the reference scrapes book/article pages and strips markup
  * with chained regex replaces, 图书美文信息抓取.ipynb cell-4 /
  * SURVEY §2 F16-F17; this is the same semantics as a native scan-speed
  * kernel instead of a regex cascade that re-walks the string once per
  * pattern).
  *
  * Rules (HTML5-shaped, deliberately small and EXACTLY replayable by a
  * regex oracle on well-formed input):
  *   - `<!-- ... -->` comments removed (contents may include `>`)
  *   - `<script ...>...</script>` and `<style ...>...</style>` removed
  *     WITH their contents (case-insensitive)
  *   - any other `<X...>` where X is a letter, `/`, `!` or `?` removed to
  *     the closing `>`; a bare `<` not starting a tag is literal text
  *     (the HTML5 tokenizer rule)
  *   - named entities `&amp; &lt; &gt; &quot; &apos; &#39; &nbsp;`
  *     decoded (`&nbsp;` to a regular space); anything else after `&` —
  *     including numeric references beyond `&#39;` — is literal text
  *   - every removed construct becomes one space, then whitespace runs
  *     collapse to single spaces and the ends are trimmed (`a<br>b` →
  *     `a b`, never `ab`)
  *
  * Malformed tails (an unterminated tag/comment/script) drop the rest of
  * the string — never throw; a corrupt page must not kill a 100 TB scan.
  * NULL in → NULL out. */
case class HtmlText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(HtmlText.extract(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HtmlText {
  private val entities: Array[(String, Char)] = Array(
    ("amp;", '&'), ("lt;", '<'), ("gt;", '>'), ("quot;", '"'),
    ("apos;", '\''), ("#39;", '\''), ("nbsp;", ' '))

  /** True if `s` matches `word` (ASCII case-insensitive) at `p` AND the
    * match ends at a tag-name boundary (whitespace, '>', '/' or EOF) —
    * so `<scripted>` is a plain tag, not a script block. */
  private def tagAt(s: String, p: Int, word: String): Boolean = {
    if (p + word.length > s.length) return false
    var i = 0
    while (i < word.length) {
      val c = s.charAt(p + i)
      if ((c | 0x20) != word.charAt(i)) return false
      i += 1
    }
    val e = p + word.length
    e == s.length || s.charAt(e) == '>' || s.charAt(e) == '/' ||
      Character.isWhitespace(s.charAt(e))
  }

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var lastSpace = true // leading whitespace never emits
    def space(): Unit = if (!lastSpace) { out.append(' '); lastSpace = true }
    def emit(c: Char): Unit =
      if (Character.isWhitespace(c)) space()
      else { out.append(c); lastSpace = false }
    // index just past the '>' that closes "</word" (case-insensitive) at
    // or after p; -1 when the string ends first (malformed tail)
    def closingEnd(p0: Int, word: String): Int = {
      var i = p0
      while (i + 2 + word.length <= n) {
        if (html.charAt(i) == '<' && html.charAt(i + 1) == '/' &&
            tagAt(html, i + 2, word)) {
          var j = i + 2 + word.length
          while (j < n && html.charAt(j) != '>') j += 1
          return if (j < n) j + 1 else -1
        }
        i += 1
      }
      -1
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          if (e < 0) { i = n } else { space(); i = e + 3 }
        } else if (tagAt(html, i + 1, "script")) {
          val e = closingEnd(i + 1, "script")
          if (e < 0) { i = n } else { space(); i = e }
        } else if (tagAt(html, i + 1, "style")) {
          val e = closingEnd(i + 1, "style")
          if (e < 0) { i = n } else { space(); i = e }
        } else if (i + 1 < n && {
          val c1 = html.charAt(i + 1)
          (c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z') ||
            c1 == '/' || c1 == '!' || c1 == '?'
        }) {
          var j = i + 1
          while (j < n && html.charAt(j) != '>') j += 1
          if (j >= n) { i = n } else { space(); i = j + 1 }
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        var hit = -1
        var k = 0
        while (hit < 0 && k < entities.length) {
          if (html.startsWith(entities(k)._1, i + 1)) hit = k
          k += 1
        }
        if (hit >= 0) { emit(entities(hit)._2); i += 1 + entities(hit)._1.length }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    // drop one trailing space (emit never leaves more than one)
    val len = out.length
    if (len > 0 && out.charAt(len - 1) == ' ') out.setLength(len - 1)
    out.toString
  }
}
