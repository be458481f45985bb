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
  *    `key || email`. NOTE: keyed FNV is an obfuscation step, NOT a PRF —
  *    FNV-1a is step-wise invertible mod 2^64, so one known
  *    (email, surrogate) pair lets an attacker strip the email suffix and
  *    recover the post-key hash state, after which candidate addresses
  *    can be forward-hashed without the key (r8 advice). This variant
  *    exists ONLY as the SQL-replayable gate fixture: the DuckDB oracle
  *    replays every surrogate ([[graft.queries.Q.fnvSql]]) and
  *    hash-matches the rewritten text, which requires an oracle-
  *    expressible hash. The production privacy lane is
  *    [[PseudonymizeEmailsHmac]], a real PRF.
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

  // The key must never surface in explain() output, the Spark UI SQL tab,
  // or event logs — Expression's default toString/flatArguments prints
  // every productIterator arg in cleartext (r9 advice). Redact everywhere
  // a plan string can reach.
  override def flatArguments: Iterator[Any] = Iterator(child, "[redacted]")
  override def toString: String = s"$prettyName($child, [redacted])"
  override def sql: String = s"$prettyName(${child.sql}, '[redacted]')"

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

/** Production email pseudonymization: surrogate =
  * `user_<unsigned64(HMAC-SHA256(key, email)[0..8])>@redacted.example`.
  *
  * Same contract as [[PseudonymizeEmails]] (deterministic, corpus-wide
  * consistent, full 64-bit surrogate space) but derived with a real PRF:
  * without the key, a known (email, surrogate) pair reveals nothing about
  * any other address — HMAC-SHA256 is not invertible the way keyed FNV is
  * (r8 advice). The key is REQUIRED non-empty: an unkeyed surrogate is
  * trivially dictionary-invertible and this lane refuses to produce one.
  *
  * Not DuckDB-replayable (the oracle has no HMAC), so this lane is gated
  * by specs (consistency, key separation, known-answer test vector), not
  * by a hash-matched query; the FNV fixture keeps the query-level gate.
  *
  * Perf: one javax.crypto Mac per partition-thread (thread-local — Mac is
  * not thread-safe), ~1 µs per match; still a zero-shuffle projection.
  */
case class PseudonymizeEmailsHmac(child: Expression, key: String)
    extends UnaryExpression with CodegenFallback {
  require(key.nonEmpty,
    "pseudonymize_emails_hmac requires a non-empty key: an unkeyed " +
      "surrogate is dictionary-invertible (use PseudonymizeEmails only " +
      "for oracle fixtures)")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pseudonymize_emails_hmac"

  // The HMAC key is a SECRET: Expression's default toString/flatArguments
  // prints all productIterator args, so without these overrides the key
  // appears in cleartext in explain(), the Spark UI SQL tab, and event
  // logs — which would undermine the PRF's whole point (r9 advice).
  override def flatArguments: Iterator[Any] = Iterator(child, "[redacted]")
  override def toString: String = s"$prettyName($child, [redacted])"
  override def sql: String = s"$prettyName(${child.sql}, '[redacted]')"

  @transient private lazy val re =
    java.util.regex.Pattern.compile(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")

  // Mac instances are stateful and not thread-safe; one per executor thread.
  @transient private lazy val macs =
    new ThreadLocal[javax.crypto.Mac] {
      override def initialValue(): javax.crypto.Mac = {
        val m = javax.crypto.Mac.getInstance("HmacSHA256")
        m.init(new javax.crypto.spec.SecretKeySpec(
          key.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          "HmacSHA256"))
        m
      }
    }

  private def surrogate(email: String): Long = {
    val mac = macs.get()
    mac.reset()
    val d = mac.doFinal(
      email.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // big-endian first 8 bytes of the 32-byte tag
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = re.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    while (m.find()) {
      val h = surrogate(m.group())
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
