package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Email pseudonymization — the privacy step REDACTION (t10) cannot do:
  * every address is replaced by a deterministic surrogate
  * `user_<fnv1a64(email) mod 100000>@redacted.example`, so the same
  * address maps to the same surrogate EVERYWHERE in the corpus.
  * Referential structure (who-talked-to-whom, account linkage across
  * documents) survives; the identifier itself does not. That consistency
  * is what joins, dedup, and per-user aggregation downstream of a privacy
  * pass require — a blanket `[EMAIL]` token destroys it.
  *
  * One native pass per row (regex walk + FNV per match); the FNV
  * derivation is what lets the t28 oracle rebuild every surrogate in SQL
  * ([[graft.queries.Q.fnvSql]]) and hash-match the rewritten text.
  * Scale: a pure scan-speed projection — zero shuffle, no dictionary to
  * build or broadcast (the surrogate IS a function of the match).
  */
case class PseudonymizeEmails(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pseudonymize_emails"

  @transient private lazy val re =
    java.util.regex.Pattern.compile(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = re.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    while (m.find()) {
      val h = Fnv.hash64(m.group())
      val mod = ((h % 100000L) + 100000L) % 100000L
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(
          s"user_$mod@redacted.example"))
    }
    m.appendTail(sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
