package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions._
import graft.functions.TextFunctions

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get the same kernels
  * the Column API exposes:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT vector_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (SURVEY §4.3: no custom planner rules are required for PARITY — the
  * parity surface is function registration. One optimizer rule is
  * injected as a pure OPTIMIZATION: [[graft.plans.LevenshteinLengthPrune]]
  * prepends the pigeonhole length prune to Levenshtein threshold
  * predicates; it never changes results.)
  */
object GraftExtensions {
  /** Register the same functions on an already-created session (the
    * `withExtensions` path only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.graftbridge.ColumnBridge.registry(spark)
    new GraftExtensions().functions.foreach { case (ident, fi, builder) =>
      reg.registerFunction(ident, fi, builder)
    }
    // optimizer rules can't be injected post-construction; the
    // experimental hook is the documented live-session path (idempotent —
    // the rule itself is also a fixpoint)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinLengthPrune)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.LevenshteinLengthPrune
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private[graft] def functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - double-accumulated dense dot product"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    (FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "vector_cosine(a, b) - one-pass cosine similarity"),
      (es: Seq[Expression]) => VectorCosine(es(0), es(1))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash signature"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingleHashes, k) - k-perm MinHash"),
      (es: Seq[Expression]) => MinHashSignature(es.head,
        es(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - distinct char n-gram xxhash64s"),
      (es: Seq[Expression]) => ShingleHashes(es.head,
        es(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("cjk_segment"),
      info("cjk_segment",
        "cjk_segment(text[, cutAll]) - dictionary CJK segmentation: FMM by default, jieba-full-mode overlap with cutAll=true"),
      (es: Seq[Expression]) => Segment(es.head, TextFunctions.defaultCjkDict,
        cutAll = es.lift(1).exists(_.eval() == true))),
    (FunctionIdentifier("cjk_segment_dict"),
      info("cjk_segment_dict",
        "cjk_segment_dict(text, dictName[, cutAll]) - FMM (or full-mode with cutAll=true) segmentation with a broadcast dictionary pre-registered via TextFunctions.SegmentDicts.register"),
      (es: Seq[Expression]) => {
        val name = Option(es(1).eval())
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
          .getOrElse(throw new IllegalArgumentException(
            "cjk_segment_dict: dictName must be a non-null string literal"))
        SegmentDict(es.head, TextFunctions.SegmentDicts.get(name),
          cutAll = es.lift(2).exists(_.eval() == true))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode canonical composition (NFC)"),
      (es: Seq[Expression]) => NfcNormalize(es.head)),
    (FunctionIdentifier("char_entropy"),
      info("char_entropy", "char_entropy(text) - code-point Shannon entropy in nats (blob/repetition screen)"),
      (es: Seq[Expression]) => CharEntropy(es.head)),
    (FunctionIdentifier("intersection_size"),
      info("intersection_size", "intersection_size(a, b) - |A ∩ B| without materializing it"),
      (es: Seq[Expression]) => IntersectionSize(es(0), es(1))),
    (FunctionIdentifier("int8_quantize"),
      info("int8_quantize", "int8_quantize(vec) - symmetric per-vector int8 quantization to binary"),
      (es: Seq[Expression]) => Int8Quantize(es.head)),
    (FunctionIdentifier("int8_cosine"),
      info("int8_cosine", "int8_cosine(qa, qb) - cosine over int8-quantized vectors"),
      (es: Seq[Expression]) => Int8Cosine(es(0), es(1))),
    (FunctionIdentifier("wav_features"),
      info("wav_features", "wav_features(bin) - RIFF/PCM16 decode: rate, channels, samples, duration, rms, peak"),
      (es: Seq[Expression]) => WavFeatures(es.head)),
    (FunctionIdentifier("mp3_features"),
      info("mp3_features", "mp3_features(bin) - MPEG-audio frame-header walk: version, layer, rate, channels, frames, duration, bitrate, vbr"),
      (es: Seq[Expression]) => Mp3Features(es.head)),
    (FunctionIdentifier("html_text"),
      info("html_text", "html_text(s) - one-pass HTML to visible text: tag/script/style/comment strip, named entities, whitespace collapse"),
      (es: Seq[Expression]) => HtmlText(es.head)),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity, DuckDB-equivalent semantics (0.7 boost threshold, prefix cap 4)"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    (FunctionIdentifier("accent_fold"),
      info("accent_fold", "accent_fold(s) - NFD + combining-mark removal (DuckDB strip_accents-equivalent)"),
      (es: Seq[Expression]) => AccentFold(es.head)),
    (FunctionIdentifier("bmp_features"),
      info("bmp_features", "bmp_features(bin) - uncompressed 24-bit BMP decode: dims + channel means"),
      (es: Seq[Expression]) => BmpFeatures(es.head)),
    (FunctionIdentifier("png_features"),
      info("png_features", "png_features(bin) - codec-free PNG decode (zlib inflate + filter reconstruction): dims, channels, channel means"),
      (es: Seq[Expression]) => PngFeatures(es.head)),
    (FunctionIdentifier("image_features"),
      info("image_features", "image_features(bin) - JDK ImageIO decode (JPEG/PNG/GIF/TIFF/BMP): dims, format, channel means"),
      (es: Seq[Expression]) => ImageFeatures(es.head)),
    (FunctionIdentifier("gif_frames"),
      info("gif_frames",
        "gif_frames(bin, n) - sample n evenly-spaced frames from an animated GIF: array<struct<frame_no,dims,channel means>>"),
      (es: Seq[Expression]) => {
        if (!es(1).foldable ||
            es(1).dataType != org.apache.spark.sql.types.IntegerType)
          throw new IllegalArgumentException(
            s"gif_frames: n must be an integer LITERAL (got ${es(1).sql})")
        GifFrames(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("mg_topk"),
      info("mg_topk",
        "mg_topk(item, k) - Misra-Gries heavy-hitters aggregate: k-counter mergeable sketch, array<struct<item,est>> sorted by est desc"),
      (es: Seq[Expression]) => {
        if (!es(1).foldable ||
            es(1).dataType != org.apache.spark.sql.types.IntegerType)
          throw new IllegalArgumentException(
            s"mg_topk: k must be an integer LITERAL (got ${es(1).sql})")
        MisraGriesTopK(es(0), es(1).eval().asInstanceOf[Int])
      }),
    (FunctionIdentifier("zorder2"),
      info("zorder2", "zorder2(a, b) - 2-D Morton interleave of bucket ranks for multi-column layout"),
      (es: Seq[Expression]) => ZOrder2(es(0), es(1))),
    (FunctionIdentifier("bpe_tokenize"),
      info("bpe_tokenize",
        "bpe_tokenize(text, merges) - BPE with a literal merge table: 'l o|lo w|e r' (rank order, space-separated pairs, |-separated)"),
      (es: Seq[Expression]) => {
        // guard BEFORE eval: a non-foldable second argument (a column
        // reference) or a non-string literal would otherwise surface as an
        // unresolved-expression / ClassCastException instead of this error
        if (!es(1).foldable ||
            es(1).dataType != org.apache.spark.sql.types.StringType)
          throw new IllegalArgumentException(
            "bpe_tokenize: merges must be a non-null string LITERAL " +
              s"(got ${es(1).sql})")
        val spec = Option(es(1).eval())
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
          .getOrElse(throw new IllegalArgumentException(
            "bpe_tokenize: merges must be a non-null string literal"))
        val merges = spec.split('|').toSeq.filter(_.nonEmpty).map { p =>
          val parts = p.split(' ')
          require(parts.length == 2,
            s"bpe_tokenize: each merge must be 'left right' (got '$p')")
          (parts(0), parts(1))
        }
        BpeTokenize(es.head, merges)
      }),
    (FunctionIdentifier("sparse_random_project"),
      info("sparse_random_project",
        "sparse_random_project(vec, outDim, seed) - seeded Achlioptas ±1/0 JL projection to outDim doubles"),
      (es: Seq[Expression]) => SparseRandomProject(
        org.apache.spark.sql.catalyst.expressions.Cast(es.head,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        es(1).eval().asInstanceOf[Int],
        es(2).eval() match {
          case l: Long => l
          case i: Int  => i.toLong
          case other => throw new IllegalArgumentException(
            s"sparse_random_project: seed must be an integer literal (got $other)")
        })))

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthPrune)
  }
}
