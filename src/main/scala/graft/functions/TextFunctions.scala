package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (SURVEY §2.7 F1-F8, F13-F15) plus the text-analysis
  * surface a training-data pipeline needs (language-ID heuristic, quality
  * scoring, token counting, document fingerprinting).
  *
  * Everything here is built from `org.apache.spark.sql.functions` so it stays
  * inside whole-stage codegen — no UDFs in the hot path.
  */
object TextFunctions {

  /** F8: whitespace tokenization (reference `re.split(r'\s+', doc)` —
    * simility_books.py:53, guessLike_u_like.py:87). Leading/trailing
    * whitespace is trimmed first so no empty edge tokens appear. */
  def tokenize(c: Column): Column = split(trim(c), "\\s+")

  /** F2: whitespace squeeze (`replace('  ',' ')` + strip —
    * guessLike_u_like.py:67). */
  def squeezeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** P8: token filters — keep tokens with length >= 2 that are not
    * all-digits (simility_books.py:11-15; declared in every reference script
    * though dormant in main()). */
  def filterTokens(tokens: Column): Column =
    filter(tokens, t => length(t) >= 2 && !(t rlike "^[0-9]+$"))

  /** F7: title normalization used to deduplicate editions of the same book
    * (simility_books.py:74-76,81-87): lowercase, truncate at the first
    * bracket/space/digit/edition marker, then strip remaining punctuation.
    * The character classes are preserved exactly (incl. CJK fullwidth
    * brackets and the 第/精 edition markers). */
  def normalizeTitle(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(c), "[（）【】/ () 0-9，第:精].*", ""),
      "[.·・《》-]", "")

  /** F3: split a comma-separated multi-value string (reference author lists,
    * simility_books.py:17-20) after removing interior spaces. */
  def splitCsvField(c: Column): Column =
    split(regexp_replace(c, "\\s+", ""), ",")

  /** F6/F15: id list -> comma-joined string under a prefixed key, the
    * reference's Redis value/key shape (`'b_similar:%s' % id`,
    * simility_books.py:93-94). */
  def kvKey(prefix: String, id: Column): Column =
    concat(lit(prefix), lit(":"), id.cast("string"))
  def joinIds(ids: Column): Column =
    array_join(transform(ids, _.cast("string")), ",")

  // ---- training-data text analysis ------------------------------------

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** BPE-ish subword count estimate: counts word-piece segments — runs of
    * letters, runs of digits, and single punctuation marks — approximating
    * byte-pair tokenizer granularity without a vocab. RE2-safe pattern (no
    * lookarounds) so the DuckDB oracle can run it verbatim. */
  val subwordPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(subwordPattern), lit(0)))

  /** Quality score in [0,1]: blends mean-word-length sanity, alpha ratio and
    * stopword presence — the standard cheap heuristics a pretraining
    * pipeline applies before expensive model-based filtering. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** [[qualityScore]] before output rounding — the form to AGGREGATE over
    * (mean-of-rounded diverges from rounded-mean). */
  def qualityScoreRaw(text: Column): Column = {
    val toks = tokenize(text)
    val nTok = size(toks).cast("double")
    val meanLen = length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nTok, lit(1.0))
    val alphaRatio = (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val stopRatio = size(filter(toks, t => t.isin(stopWords: _*))).cast("double") /
      greatest(nTok, lit(1.0))
    val lenOk = when(meanLen >= 3 && meanLen <= 10, lit(1.0)).otherwise(lit(0.0))
    (lenOk + alphaRatio + least(stopRatio * 4, lit(1.0))) / 3.0
  }

  private val stopWords = Seq("the", "a", "an", "of", "to", "in", "and",
    "is", "on", "for", "with", "that", "as", "it", "at", "by")

  /** Language-ID heuristic: scores text against per-language marker-token
    * sets (n-gram/stopword evidence) and picks the argmax, falling back to
    * script detection for CJK. Deterministic and SQL-expressible. */
  def langIdHeuristic(text: Column): Column = {
    val toks = tokenize(lower(text))
    def hits(words: Seq[String]) =
      size(filter(toks, t => t.isin(words: _*)))
    val en = hits(Seq("the", "a", "of", "and", "to", "is", "in", "that"))
    val es = hits(Seq("el", "la", "de", "que", "y", "los", "en", "un"))
    val fr = hits(Seq("le", "la", "de", "et", "les", "des", "un", "une"))
    when(text rlike "[\\u4e00-\\u9fff]", lit("zh"))
      .when(es > en && es >= fr, lit("es"))
      .when(fr > en && fr > es, lit("fr"))
      .otherwise(lit("en"))
  }

  /** Document fingerprint: order-sensitive rolling hash over tokens
    * (polynomial accumulation mod 1e9+7 — small enough that `acc*31 + h`
    * never overflows int64), for cheap exact-duplicate detection robust to
    * whitespace differences. Built from `aggregate` so it is a single
    * codegen'd pass, and expressible in ANSI SQL for the oracle. */
  val fingerprintMod = 1000000007L
  def fingerprint(text: Column): Column =
    aggregate(
      tokenize(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(hashToken(t), lit(fingerprintMod)), lit(fingerprintMod)))

  /** F9: CJK segmentation via dictionary FMM (see
    * [[graft.expressions.Segment]]); `dict` defaults to a compact bundled
    * lexicon. The reference declares this capability but never invokes it
    * (simility_books.py:11-15) — here it is a first-class function. */
  /** F16/F17 at native scan speed: HTML → visible text in ONE pass (tag
    * strip incl. script/style/comment blocks, the six ubiquitous named
    * entities decoded, whitespace collapsed) — the extraction the
    * reference runs as a chained-regex cascade over scraped pages
    * (图书美文信息抓取.ipynb cell-4), here a single-walk native kernel
    * that never re-scans the string ([[graft.expressions.HtmlText]]). */
  def htmlText(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.HtmlText(expression(c)))
  }

  /** Jaro-Winkler similarity (typo-tolerant, prefix-weighted fuzzy
    * comparator) — DuckDB-equivalent semantics, so oracle-checkable;
    * the graded form of the reference's exact normalized-title match
    * ([[graft.expressions.JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.JaroWinkler(expression(a), expression(b)))
  }

  /** Accent folding (NFD + combining-mark removal, DuckDB
    * `strip_accents`-equivalent) — search/match-key normalization
    * ([[graft.expressions.AccentFold]]). */
  def accentFold(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.AccentFold(expression(c)))
  }

  def segment(text: Column, dict: Seq[String] = defaultCjkDict,
              cutAll: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.Segment(expression(text), dict, cutAll))
  }

  /** F9 at corpus scale: same FMM segmentation with the dictionary shipped
    * via `SparkContext.broadcast` — the lexicon reaches each executor once
    * (torrent blocks), not inside every serialized task, so a jieba-sized
    * dictionary (~350k entries) costs megabytes per JVM instead of
    * megabytes per task. Use this form whenever the dictionary is bigger
    * than a few hundred words. */
  def segmentBroadcast(text: Column, dict: Seq[String],
                       cutAll: Boolean = false)
                      (implicit spark: org.apache.spark.sql.SparkSession): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bc = spark.sparkContext.broadcast(dict.toArray)
    column(graft.expressions.SegmentDict(expression(text), bc, cutAll))
  }

  /** Named broadcast dictionaries, so `spark.sql` users can reach the
    * corpus-scale segmenter: register once on the driver, then reference
    * by name — `cjk_segment_dict(text, 'name')`. The SQL builder resolves
    * the name at PLAN time to the broadcast handle, so the query ships
    * only the handle (same task-size property as [[segmentBroadcast]]).
    * Keyed per JVM: on a cluster, registration and planning both happen on
    * the driver. */
  object SegmentDicts {
    private val dicts = new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.broadcast.Broadcast[Array[String]]]()

    def register(spark: org.apache.spark.sql.SparkSession, name: String,
                 words: Seq[String]): Unit =
      dicts.put(name, spark.sparkContext.broadcast(words.toArray))

    /** Release the broadcast blocks and forget the name. */
    def unregister(name: String): Unit = {
      val bc = dicts.remove(name)
      if (bc != null) bc.unpersist()
    }

    def get(name: String): org.apache.spark.broadcast.Broadcast[Array[String]] = {
      val bc = dicts.get(name)
      require(bc != null,
        s"no segmentation dictionary registered as '$name' — call " +
          "TextFunctions.SegmentDicts.register(spark, name, words) first")
      bc
    }
  }

  /** Unicode NFC normalization ([[graft.expressions.NfcNormalize]]):
    * canonical composition so decomposed accent sequences collapse to one
    * representation before hashing/dedup/tokenization. */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.NfcNormalize(expression(text)))
  }

  /** Code-point Shannon entropy (nats,
    * [[graft.expressions.CharEntropy]]): the cheap non-linguistic-content
    * screen — base64/hex blobs score high, padding/repetition low, natural
    * text in a narrow band. */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.CharEntropy(expression(text)))
  }

  /** Corpus text cleaning: NFC normalize, then strip C0 control characters
    * (keeping tab/newline/CR — they carry document structure). The regex is
    * RE2-compatible so the identical pattern runs in the DuckDB oracle. */
  val controlCharsRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  def cleanText(text: Column): Column =
    regexp_replace(nfc(text), controlCharsRe, "")

  /** PII redaction for training corpora: emails, URLs, IPv4 addresses and
    * long digit runs (phones/ids) replaced by typed placeholders. Applied
    * in containment order — URL first (it can embed emails, IPs and
    * digits), then email, then IP, then digit runs — and the placeholders
    * contain no digits or '@', so one rule's output can't re-trigger
    * another. Patterns are RE2-compatible (no lookarounds/backrefs): the
    * SAME strings run under Java regex here and RE2 in the DuckDB oracle.
    * A codegen'd `regexp_replace` chain — one projection, no UDF. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^ \\t\\r\\n]+"
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val longDigitsRe = "[0-9]{7,}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, urlRe, "<URL>"),
          emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      longDigitsRe, "<NUM>")

  /** Consistent email pseudonymization — same address ⇒ same surrogate
    * corpus-wide, so referential structure survives the privacy pass
    * ([[graft.expressions.PseudonymizeEmails]]; contrast [[redactPii]],
    * which collapses every address to one token). ORACLE FIXTURE lane:
    * keyed FNV is DuckDB-replayable but invertible from one known pair —
    * production pipelines use [[pseudonymizeEmailsSecure]]. */
  def pseudonymizeEmails(text: Column, key: String = ""): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.PseudonymizeEmails(expression(text), key))
  }

  /** Production pseudonymization lane: HMAC-SHA256-derived surrogates
    * (a real PRF — one known (email, surrogate) pair reveals nothing
    * about other addresses), non-empty key required. Same consistency
    * contract as [[pseudonymizeEmails]]; not oracle-replayable, gated by
    * PseudonymizeSpec instead. */
  def pseudonymizeEmailsSecure(text: Column, key: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.expressions.PseudonymizeEmailsHmac(expression(text), key))
  }

  /** Pre-redaction PII hit counts (audit surface: find documents worth
    * redacting, measure PII density per source). */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(urlRe)).as("n_url"),
      regexp_count(text, lit(emailRe)).as("n_email"),
      regexp_count(text, lit(ipv4Re)).as("n_ip"))

  /** Compact CJK lexicon for the bundled segmenter (book-domain words the
    * fixtures and reference data use; production callers pass their own). */
  val defaultCjkDict: Seq[String] = Seq(
    "科幻", "小说", "文学", "经典", "历史", "哲学", "推理", "悬疑",
    "三体", "活着", "围城", "百年孤独", "战争", "和平", "战争与和平",
    "黑暗", "森林", "黑暗森林", "小王子", "图书", "推荐", "系统",
    "中文", "文本", "测试", "数据", "分析", "用户", "收藏")

  /** A deterministic token hash both Spark and ANSI SQL can compute:
    * sum over characters of codepoint * position (1-based). Weak as a hash
    * but adequate for fingerprint composition and fully portable. */
  def hashToken(t: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(t)),
        i => ascii(t.substr(i, lit(1))).cast("long") * i.cast("long")),
      lit(0L), (acc, x) => acc + x)
}
