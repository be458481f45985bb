package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Email pseudonymization — the privacy step REDACTION (t10) cannot do:
  * every address is replaced by a deterministic surrogate
  * `user_<unsigned64(fnv1a64(key || email))>@redacted.example`, so the
  * same address maps to the same surrogate EVERYWHERE in the corpus.
  * Referential structure (who-talked-to-whom, account linkage across
  * documents) survives; the identifier itself does not. That consistency
  * is what joins, dedup, and per-user aggregation downstream of a privacy
  * pass require — a blanket `[EMAIL]` token destroys it.
  *
  * Two properties the naive form (unkeyed, mod-1e5) lacks, both required
  * at corpus scale (r7 advice):
  *  - **Full 64-bit surrogate space.** A 1e5 space birthday-collides at
  *    ~370 distinct addresses (≈50%), silently merging identities and
  *    breaking the referential-integrity contract. The full unsigned
  *    64-bit value pushes the 50% collision point past 5e9 addresses.
  *  - **Keyed derivation.** The surrogate is FNV-1a-64 over
  *    `key || email`; without the key, surrogates cannot be re-derived
  *    by dictionary-hashing candidate addresses. Callers supply a secret
  *    per corpus; the gate fixture uses a known key so the DuckDB oracle
  *    can replay every surrogate ([[graft.queries.Q.fnvSql]]) and
  *    hash-match the rewritten text.
  *
  * One native pass per row (regex walk + FNV per match). Scale: a pure
  * scan-speed projection — zero shuffle, no dictionary to build or
  * broadcast (the surrogate IS a function of the match).
  */
case class PseudonymizeEmails(child: Expression, key: String = "")
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
      val h = Fnv.hash64(key + m.group())
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(
          s"user_${java.lang.Long.toUnsignedString(h)}@redacted.example"))
    }
    m.appendTail(sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
